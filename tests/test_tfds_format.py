"""TFDS-format RLDS ingestion: synthetic TFDS-style shards -> episodes ->
native conversion -> full training pipeline."""

import io
import os

import numpy as np
import pytest

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import LIBERO

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


def _jpeg(rng, size):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((rng.random((size, size, 3)) * 255).astype(np.uint8)).save(
        buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def tfds_root(tmp_path_factory):
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    size = TINY_DINOV2.image_size
    # TFDS layout: <root>/<name>/<version>/<name>-train.tfrecord-00000-of-00001
    # in the RAW LIBERO layout: image, wrist_image, 8-dim `state`, and
    # gripper actions in -1 (open) .. +1 (close) — the standardization
    # transform (oxe/transforms.py libero_dataset_transform) creates
    # EEF_state/gripper_state and clips+inverts the gripper at conversion.
    root = tmp_path_factory.mktemp("tfds")
    ds_dir = root / "libero_spatial_no_noops" / "1.0.0"
    ds_dir.mkdir(parents=True)
    path = str(ds_dir / "libero_spatial_no_noops-train.tfrecord-00000-of-00001")
    with tf.io.TFRecordWriter(path) as w:
        for e in range(3):
            t = 10
            feats = {
                "steps/observation/image": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[_jpeg(rng, size) for _ in range(t)])),
                "steps/observation/wrist_image": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[_jpeg(rng, size) for _ in range(t)])),
                "steps/observation/state": tf.train.Feature(
                    float_list=tf.train.FloatList(
                        value=rng.standard_normal(t * 8).astype(np.float32))),
                "steps/action": tf.train.Feature(
                    float_list=tf.train.FloatList(
                        value=np.concatenate([
                            rng.uniform(-1, 1, (t, 6)),
                            np.where(rng.random((t, 1)) > 0.5, 1.0, -1.0),
                        ], axis=1).astype(np.float32).reshape(-1))),
                "steps/language_instruction": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[f"task {e}".encode()] * t)),
            }
            w.write(tf.train.Example(
                features=tf.train.Features(feature=feats)).SerializeToString())
    return str(root)


def test_iterate_tfds_episodes(tfds_root):
    from openvla_oft_tpu.data.rlds.tfds_format import iterate_tfds_episodes

    eps = list(iterate_tfds_episodes(tfds_root, "libero_spatial_no_noops",
                                     LIBERO, keep_raw_state=True))
    assert len(eps) == 3
    ep = eps[0]
    assert ep["action"].shape == (10, 7)
    assert len(ep["observation"]["image"]) == 10        # raw key names
    assert len(ep["observation"]["wrist_image"]) == 10
    assert ep["observation"]["state"].shape == (10, 8)  # raw 8-dim state
    assert ep["language_instruction"] == b"task 0"


def test_convert_and_train_pipeline(tfds_root, tmp_path):
    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator
    from openvla_oft_tpu.data.rlds.tfds_format import convert_tfds_to_native
    from openvla_oft_tpu.processing.action_tokenizer import ActionTokenizer
    from openvla_oft_tpu.processing.processor import PrismaticProcessor

    out = tmp_path / "native" / "libero_spatial_no_noops"
    n = convert_tfds_to_native(tfds_root, "libero_spatial_no_noops", LIBERO,
                               str(out))
    assert n == 3
    # conversion standardized the actions: gripper clipped to [0,1]+inverted
    import json
    with open(out / "native_format.json") as f:
        marker = json.load(f)
    assert marker == {"standardized": True,
                      "transform": "libero_dataset_transform"}
    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    it, stats = make_rlds_iterator(str(tmp_path / "native"),
                                   "libero_spatial_no_noops", transform,
                                   LIBERO, shuffle_buffer_size=10,
                                   image_aug=False, num_images=2)
    # gripper stats span [0, 1]: the transform ran exactly once (at
    # conversion; the pipeline honored the marker and did not re-apply it)
    st = stats["libero_spatial_no_noops"]["action"]
    assert st["min"][-1] == 0.0 and st["max"][-1] == 1.0
    ex = next(it)
    assert ex["pixel_values"].shape[0] == 2
    assert ex["actions"].shape == (LIBERO.num_actions_chunk, LIBERO.action_dim)
    assert ex["proprio"].shape == (LIBERO.proprio_dim,)
