"""RLDS tf.data pipeline end-to-end on synthetic episode tfrecords."""

import io

import numpy as np
import pytest

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import IGNORE_INDEX, LIBERO
from openvla_oft_tpu.processing.action_tokenizer import ActionTokenizer
from openvla_oft_tpu.processing.processor import PrismaticProcessor

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


def _jpeg(rng, size):
    from PIL import Image

    buf = io.BytesIO()
    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def rlds_root(tmp_path_factory):
    pytest.importorskip("tensorflow")
    from openvla_oft_tpu.data.rlds.pipeline import write_episode_tfrecords

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("rlds")
    size = TINY_DINOV2.image_size
    episodes = []
    for e in range(6):
        t = 12 + e
        episodes.append({
            "images": [_jpeg(rng, size) for _ in range(t)],
            "actions": rng.uniform(-2, 2, (t, LIBERO.action_dim)),
            "proprio": rng.standard_normal((t, LIBERO.proprio_dim)),
            "language_instruction": f"move the block {e}",
        })
    write_episode_tfrecords(str(root / "libero_synth"), episodes)
    return str(root)


def test_rlds_iterator_end_to_end(rlds_root):
    from openvla_oft_tpu.data.collator import (
        PaddedCollatorForActionPrediction, batch_iterator)
    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    it, stats = make_rlds_iterator(rlds_root, "libero_synth", transform, LIBERO,
                                   shuffle_buffer_size=50, image_aug=True)
    assert "libero_synth" in stats
    st = stats["libero_synth"]
    assert len(st["action"]["q99"]) == LIBERO.action_dim
    # statistics sidecar written next to the data
    import os
    assert os.path.exists(os.path.join(rlds_root, "libero_synth",
                                       "dataset_statistics.json"))

    ex = next(it)
    chunk = LIBERO.chunk_len
    assert ex["actions"].shape == (LIBERO.num_actions_chunk, LIBERO.action_dim)
    assert np.abs(ex["actions"]).max() <= 1.0 + 1e-6  # normalized
    assert (ex["labels"] != IGNORE_INDEX).sum() == chunk + 1
    assert ex["pixel_values"].shape[0] == 1

    coll = PaddedCollatorForActionPrediction()
    batch = next(batch_iterator(it, 3, coll))
    assert batch["input_ids"].shape[0] == 3
    assert batch["proprio"].shape == (3, LIBERO.proprio_dim)


def test_interleaved_mixture(rlds_root):
    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds.pipeline import (
        make_interleaved_iterator, write_episode_tfrecords)

    rng = np.random.default_rng(1)
    size = TINY_DINOV2.image_size
    episodes = [{
        "images": [_jpeg(rng, size) for _ in range(10)],
        "actions": rng.uniform(-1, 1, (10, LIBERO.action_dim)),
        "proprio": rng.standard_normal((10, LIBERO.proprio_dim)),
        "language_instruction": "second dataset task",
    }]
    import os
    write_episode_tfrecords(os.path.join(rlds_root, "second_synth"), episodes)

    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    it, stats = make_interleaved_iterator(
        rlds_root, ["libero_synth", "second_synth"], [0.5, 0.5], transform,
        LIBERO, shuffle_buffer_size=20)
    assert set(stats) == {"libero_synth", "second_synth"}
    seen = set()
    for _ in range(30):
        ex = next(it)
        seen.add(ex["dataset_name"])
    assert seen == {"libero_synth", "second_synth"}


def test_standardize_fn_applies(rlds_root):
    """NumPy OXE standardization transforms run via the eager episode path."""
    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds.oxe import libero_dataset_transform
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    it, stats = make_rlds_iterator(rlds_root, "libero_synth", transform,
                                   LIBERO, shuffle_buffer_size=20,
                                   image_aug=False,
                                   standardize_fn=libero_dataset_transform)
    ex = next(it)
    assert ex["actions"].shape == (LIBERO.num_actions_chunk, LIBERO.action_dim)
    assert np.isfinite(ex["actions"]).all()
    # gripper dim was clipped to [0,1] then inverted by the transform before
    # normalization; the normalized result stays in [-1, 1]
    assert np.abs(ex["actions"]).max() <= 1.0 + 1e-6


def test_two_image_pipeline(rlds_root, tmp_path_factory):
    """Primary + wrist images flow through to (2, n_backbones, H, W, 3)."""
    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds.pipeline import (
        make_rlds_iterator, write_episode_tfrecords)

    rng = np.random.default_rng(5)
    size = TINY_DINOV2.image_size
    root = str(tmp_path_factory.mktemp("rlds2"))
    episodes = [{
        "images": [_jpeg(rng, size) for _ in range(10)],
        "wrist_images": [_jpeg(rng, size) for _ in range(10)],
        "actions": rng.uniform(-1, 1, (10, LIBERO.action_dim)),
        "proprio": rng.standard_normal((10, LIBERO.proprio_dim)),
        "language_instruction": "two camera task",
    }]
    import os
    write_episode_tfrecords(os.path.join(root, "two_cam"), episodes)

    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    it, _ = make_rlds_iterator(root, "two_cam", transform, LIBERO,
                               shuffle_buffer_size=10, image_aug=True,
                               num_images=2)
    ex = next(it)
    assert ex["pixel_values"].shape[0] == 2  # primary + wrist


def test_multi_process_file_sharding(tmp_path, monkeypatch):
    """Each JAX process reads a disjoint file shard (multi-host feeding)."""
    import os

    import jax

    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds import pipeline as pl

    rng = np.random.default_rng(9)
    size = TINY_DINOV2.image_size
    ds_dir = str(tmp_path / "sharded_ds")
    os.makedirs(ds_dir, exist_ok=True)
    # two distinct single-episode shard FILES with distinct instructions
    for i, task in enumerate(["alpha task", "bravo task"]):
        eps = [{
            "images": [_jpeg(rng, size) for _ in range(10)],
            "actions": rng.uniform(-1, 1, (10, LIBERO.action_dim)),
            "proprio": rng.standard_normal((10, LIBERO.proprio_dim)),
            "language_instruction": task,
        }]
        staging = str(tmp_path / f"stage{i}")
        paths = pl.write_episode_tfrecords(staging, eps, shard_size=1)
        os.rename(paths[0], os.path.join(ds_dir, f"episodes-{i:05d}.tfrecord"))

    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    streams = {}
    for idx in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda i=idx: i)
        it, _ = pl.make_rlds_iterator(str(tmp_path), "sharded_ds", transform,
                                      LIBERO, shuffle_buffer_size=5,
                                      image_aug=False, train=False)
        streams[idx] = {tuple(ex["input_ids"].tolist()) for ex in it}
    # the two processes saw disjoint episode streams
    assert streams[0] and streams[1]
    assert streams[0].isdisjoint(streams[1])
