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


def _episode_feats(tf, feats_dict):
    f = {}
    for k, v in feats_dict.items():
        if isinstance(v[0], bytes):
            f[k] = tf.train.Feature(bytes_list=tf.train.BytesList(value=v))
        elif isinstance(v[0], (int, np.integer)):
            f[k] = tf.train.Feature(int64_list=tf.train.Int64List(value=v))
        else:
            f[k] = tf.train.Feature(float_list=tf.train.FloatList(value=v))
    return tf.train.Example(
        features=tf.train.Features(feature=f)).SerializeToString()


def _write_shard(tf, root, name, records):
    ds_dir = root / name / "1.0.0"
    ds_dir.mkdir(parents=True)
    path = str(ds_dir / f"{name}-train.tfrecord-00000-of-00001")
    with tf.io.TFRecordWriter(path) as w:
        for rec in records:
            w.write(rec)


def test_rt1_family_dict_action_ingestion(tmp_path):
    """RT-X-core layout: dict actions (steps/action/<subkey>) + per-step
    natural_language_instruction ingest end-to-end through conversion with
    the registry transform applied (round-2 review: the flat-action parse
    could not feed rt1/kuka/... transforms at all)."""
    tf = pytest.importorskip("tensorflow")
    from openvla_oft_tpu.data.rlds.tfds_format import (
        convert_tfds_to_native, iterate_tfds_episodes)

    rng = np.random.default_rng(0)
    t = 10
    # close at step 1, open at step 4 (input +1=closing)
    rel_grip = [0.0, 1.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rec = _episode_feats(tf, {
        "steps/observation/image": [_jpeg(rng, 28) for _ in range(t)],
        "steps/observation/base_pose_tool_reached": list(
            rng.standard_normal(t * 7).astype(np.float32)),
        "steps/observation/gripper_closed": list(
            np.zeros(t, np.float32)),
        "steps/observation/natural_language_instruction":
            [b"pick coke can"] * t,
        "steps/action/world_vector": list(
            rng.uniform(-1, 1, t * 3).astype(np.float32)),
        "steps/action/rotation_delta": list(
            rng.uniform(-1, 1, t * 3).astype(np.float32)),
        "steps/action/gripper_closedness_action": list(
            np.asarray(rel_grip, np.float32)),
    })
    _write_shard(tf, tmp_path, "fractal20220817_data", [rec])

    eps = list(iterate_tfds_episodes(str(tmp_path), "fractal20220817_data",
                                     LIBERO, keep_raw_state=True))
    assert isinstance(eps[0]["action"], dict)
    assert eps[0]["action"]["world_vector"].shape == (t, 3)

    native_root = tmp_path / "native_root"
    out = native_root / "fractal20220817_data"
    n = convert_tfds_to_native(str(tmp_path), "fractal20220817_data", LIBERO,
                               str(out))
    assert n == 1
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator
    frames = []
    it, stats = make_rlds_iterator(
        str(native_root), "fractal20220817_data",
        lambda b: frames.append(b) or b, LIBERO, shuffle_buffer_size=4,
        image_aug=False, num_images=1)
    next(it)
    # rel2abs applied with reference direction: open(1) before the close
    g = stats["fractal20220817_data"]["action"]
    assert g["min"][-1] == 0.0 and g["max"][-1] == 1.0


def test_language_table_codepoint_ingestion(tmp_path):
    """language_table stores instructions as padded unicode codepoints in an
    int observation feature; the transform decodes them to text."""
    tf = pytest.importorskip("tensorflow")
    from openvla_oft_tpu.data.rlds.tfds_format import (
        convert_tfds_to_native, iterate_tfds_episodes)

    rng = np.random.default_rng(0)
    t, pad = 10, 16
    text = "push the block"
    codes = [ord(c) for c in text] + [0] * (pad - len(text))
    rec = _episode_feats(tf, {
        "steps/observation/rgb": [_jpeg(rng, 28) for _ in range(t)],
        "steps/observation/effector_translation": list(
            rng.standard_normal(t * 2).astype(np.float32)),
        "steps/observation/instruction": codes * t,
        "steps/action": list(rng.uniform(-1, 1, t * 2).astype(np.float32)),
    })
    _write_shard(tf, tmp_path, "language_table", [rec])
    native_root = tmp_path / "native_root"
    out = native_root / "language_table"
    n = convert_tfds_to_native(str(tmp_path), "language_table", LIBERO,
                               str(out))
    assert n == 1
    # read back through the pipeline: instruction decoded, action padded to 7
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator
    frames = []
    it, _ = make_rlds_iterator(
        str(native_root), "language_table",
        lambda b: frames.append(b) or b, LIBERO, shuffle_buffer_size=4,
        image_aug=False, num_images=1)
    next(it)
    lang = frames[0]["task"]["language_instruction"]
    lang = lang.decode() if isinstance(lang, bytes) else str(lang)
    assert lang == text
    assert np.asarray(frames[0]["action"]).shape[-1] == 7


def test_kuka_compressed_state_ingestion(tmp_path):
    """kuka's proprio is ZLIB-compressed float32 blobs in string features;
    the transform decompresses them (reference transforms.py:138-147)."""
    tf = pytest.importorskip("tensorflow")
    import zlib

    from openvla_oft_tpu.data.rlds.tfds_format import convert_tfds_to_native

    rng = np.random.default_rng(0)
    t = 5
    pose_blobs = [zlib.compress(
        rng.standard_normal(7).astype(np.float32).tobytes())
        for _ in range(t)]
    grip_blobs = [zlib.compress(np.asarray([i % 2], np.float32).tobytes())
                  for i in range(t)]
    rec = _episode_feats(tf, {
        "steps/observation/image": [_jpeg(rng, 28) for _ in range(t)],
        "steps/observation/clip_function_input/base_pose_tool_reached":
            pose_blobs,
        "steps/observation/gripper_closed": grip_blobs,
        "steps/observation/natural_language_instruction": [b"grasp"] * t,
        "steps/action/world_vector": list(
            rng.uniform(-1, 1, t * 3).astype(np.float32)),
        "steps/action/rotation_delta": list(
            rng.uniform(-1, 1, t * 3).astype(np.float32)),
        "steps/action/gripper_closedness_action": list(
            np.zeros(t, np.float32)),
    })
    _write_shard(tf, tmp_path, "kuka", [rec])
    out = tmp_path / "native"
    n = convert_tfds_to_native(str(tmp_path), "kuka", LIBERO, str(out))
    assert n == 1


def test_droid_action_dict_ingestion(tmp_path):
    """droid stores velocities under steps/action_dict/*; the base-frame
    transform consumes them."""
    tf = pytest.importorskip("tensorflow")
    from openvla_oft_tpu.data.rlds.tfds_format import convert_tfds_to_native

    rng = np.random.default_rng(0)
    t = 5
    rec = _episode_feats(tf, {
        "steps/observation/exterior_image_1_left":
            [_jpeg(rng, 28) for _ in range(t)],
        "steps/observation/exterior_image_2_left":
            [_jpeg(rng, 28) for _ in range(t)],
        "steps/observation/wrist_image_left":
            [_jpeg(rng, 28) for _ in range(t)],
        "steps/observation/cartesian_position": list(
            rng.standard_normal(t * 6).astype(np.float32)),
        "steps/observation/gripper_position": list(
            rng.random(t).astype(np.float32)),
        "steps/action_dict/cartesian_velocity": list(
            rng.uniform(-1, 1, t * 6).astype(np.float32)),
        "steps/action_dict/gripper_position": list(
            rng.random(t).astype(np.float32)),
        "steps/language_instruction": [b"wipe the table"] * t,
    })
    _write_shard(tf, tmp_path, "droid", [rec])
    out = tmp_path / "native"
    n = convert_tfds_to_native(str(tmp_path), "droid", LIBERO, str(out))
    assert n == 1
