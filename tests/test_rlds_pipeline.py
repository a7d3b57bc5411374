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


def _solid_jpeg(color, size):
    from PIL import Image

    buf = io.BytesIO()
    arr = np.broadcast_to(np.asarray(color, np.uint8), (size, size, 3)).copy()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


@pytest.fixture(scope="module")
def raw_libero_root(tmp_path_factory):
    """Synthetic *raw* LIBERO-format dataset: gripper actions in -1 (open) ..
    +1 (close), 8-dim raw `state`, primary + wrist cameras."""
    pytest.importorskip("tensorflow")
    from openvla_oft_tpu.data.rlds.pipeline import write_episode_tfrecords

    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("raw_libero")
    size = TINY_DINOV2.image_size
    episodes = []
    for e in range(3):
        t = 14
        actions = rng.uniform(-0.5, 0.5, (t, LIBERO.action_dim))
        actions[:, -1] = np.where(np.arange(t) % 2 == 0, -1.0, 1.0)  # raw grip
        episodes.append({
            "images": [_solid_jpeg((200, 40, 90), size) for _ in range(t)],
            "wrist_images": [_solid_jpeg((30, 160, 220), size)
                             for _ in range(t)],
            "actions": actions,
            "proprio": rng.standard_normal((t, 8)),
            "language_instruction": f"raw libero task {e}",
        })
    write_episode_tfrecords(str(root / "libero_spatial_no_noops"), episodes)
    return str(root)


def test_raw_libero_auto_standardize_and_wrist_aug(raw_libero_root):
    """The full VERDICT-r1 data-path contract on raw LIBERO-format data:
    standardize_fn auto-wires from the OXE registry (gripper clip+invert),
    stats are computed post-transform, wrist images are augmented with a
    per-image seed offset, and uniform goal relabeling attaches a goal."""
    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)

    # peek at raw frames instead of tokenized examples
    raw_frames = []
    it, stats = make_rlds_iterator(
        raw_libero_root, "libero_spatial_no_noops",
        lambda b: raw_frames.append(b) or b, LIBERO,
        shuffle_buffer_size=10, image_aug=True, num_images=2, seed=3,
        goal_relabeling_strategy="uniform")
    for _ in range(6):
        next(it)

    # 1. gripper standardized: stats span [0, 1] (clip+invert), not [-1, 1]
    st = stats["libero_spatial_no_noops"]["action"]
    assert st["min"][-1] == 0.0 and st["max"][-1] == 1.0, st
    assert st.get("transform") is None  # marker lives at the top level
    assert stats["libero_spatial_no_noops"]["transform"] == \
        "libero_dataset_transform"

    # 2. wrist rides through the standardize path (round-1 KeyError fixed)
    # and is augmented: solid-color wrist should deviate from its raw color
    wrist = raw_frames[0]["observation"]["image_wrist"]
    raw_color = np.asarray((30, 160, 220), np.float64)
    deviation = np.abs(wrist.astype(np.float64) - raw_color).mean()
    assert deviation > 2.0, deviation  # color jitter moved it
    # ... differently from the primary (per-image seed offset)
    primary = raw_frames[0]["observation"]["image_primary"]
    prim_dev = np.abs(primary.astype(np.float64)
                      - np.asarray((200, 40, 90))).mean()
    assert prim_dev > 2.0, prim_dev

    # 3. uniform goal relabeling attached an encoded goal frame
    goal = raw_frames[0]["task"]["image_primary"]
    assert isinstance(goal, bytes) and goal[:2] == b"\xff\xd8"  # JPEG magic

    # 4. the absolute gripper dim is exempt from normalization
    # (stats["action"]["mask"], reference rlds/dataset.py:229-235): frames
    # carry gripper in {0,1}, not Q99-mapped to {-1,+1}
    assert st.get("mask") == [True] * 6 + [False], st.get("mask")
    for f in raw_frames:
        grip = np.asarray(f["action"])[..., -1]
        assert np.isin(grip, (0.0, 1.0)).all(), grip

    # eval stream leaves images untouched (JPEG round-trip tolerance only)
    eval_frames = []
    it2, _ = make_rlds_iterator(
        raw_libero_root, "libero_spatial_no_noops",
        lambda b: eval_frames.append(b) or b, LIBERO,
        shuffle_buffer_size=10, image_aug=False, train=False, num_images=2)
    next(it2)
    wr = eval_frames[0]["observation"]["image_wrist"].astype(np.float64)
    assert np.abs(wr - raw_color).mean() < 2.0


def test_stale_stats_recomputed_on_transform_change(raw_libero_root):
    """A dataset_statistics.json computed without the standardization
    transform must not silently mis-normalize transformed actions."""
    import json
    import os

    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

    stats_path = os.path.join(raw_libero_root, "libero_spatial_no_noops",
                              "dataset_statistics.json")
    with open(stats_path) as f:
        good = json.load(f)
    stale = dict(good)
    stale.pop("transform", None)  # pretend raw-era stats
    stale["action"] = dict(stale["action"], min=[-9.0] * 7, max=[9.0] * 7)
    with open(stats_path, "w") as f:
        json.dump(stale, f)

    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    _, stats = make_rlds_iterator(raw_libero_root, "libero_spatial_no_noops",
                                  transform, LIBERO, shuffle_buffer_size=5,
                                  image_aug=False, num_images=2)
    st = stats["libero_spatial_no_noops"]
    assert st["transform"] == "libero_dataset_transform"
    assert st["action"]["max"][-1] == 1.0  # recomputed, not the stale 9.0


def test_task_augmentation_modality_dropout(raw_libero_root):
    """keep-image-or-language dropout: with prob 1.0 every frame keeps
    exactly one conditioning modality (reference task_augmentation.py)."""
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

    frames = []
    it, _ = make_rlds_iterator(
        raw_libero_root, "libero_spatial_no_noops",
        lambda b: frames.append(b) or b, LIBERO, shuffle_buffer_size=10,
        image_aug=False, num_images=2, task_augment_prob=1.0, seed=11,
        goal_relabeling_strategy="uniform")
    for _ in range(12):
        next(it)
    saw_lang_only = saw_goal_only = 0
    for f in frames:
        lang = f["task"]["language_instruction"]
        goal = f["task"]["image_primary"]
        if len(lang) == 0 and len(goal) > 0:
            saw_goal_only += 1
        elif len(goal) == 0 and len(lang) > 0:
            saw_lang_only += 1
        else:
            raise AssertionError("frame kept/dropped both modalities")
    assert saw_lang_only and saw_goal_only


@pytest.mark.slow
def test_train_step_on_raw_libero_stream(raw_libero_root):
    """One optimizer step end-to-end from raw LIBERO-format tfrecords through
    auto-standardization, the batch transform, and the jitted train step."""
    import jax
    import jax.numpy as jnp

    from openvla_oft_tpu.data.collator import (
        PaddedCollatorForActionPrediction, batch_iterator)
    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator
    from openvla_oft_tpu.policy import init_openvla_params
    from openvla_oft_tpu.training.lora import init_lora
    from openvla_oft_tpu.training.train_step import (
        TrainConfig, create_train_state, make_optimizer, train_step)

    cfg2 = OpenVLAConfig(vision_backbone_id="tiny-dual",
                         llm_backbone_id="tiny-llama", num_images_in_input=2)
    proc = PrismaticProcessor(cfg2)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    it, _ = make_rlds_iterator(raw_libero_root, "libero_spatial_no_noops",
                               transform, LIBERO, shuffle_buffer_size=10,
                               image_aug=True, num_images=2)
    batch = next(batch_iterator(it, 2, PaddedCollatorForActionPrediction()))
    batch = {k: v for k, v in batch.items() if k != "dataset_name"}

    full = init_openvla_params(jax.random.PRNGKey(0), cfg2, LIBERO,
                               dtype=jnp.float32, head="l1")
    base = {k: full[k] for k in ("llm", "vision_backbone", "projector")}
    trainables = {"lora": init_lora(jax.random.PRNGKey(1), base, rank=4),
                  "action_head": full["action_head"],
                  "proprio_projector": full["proprio_projector"]}
    tc = TrainConfig(objective="l1", learning_rate=1e-3, lora_rank=4,
                     lora_alpha=4.0, use_proprio=True)
    tx = make_optimizer(tc)
    st = create_train_state(base, trainables, tc, jax.random.PRNGKey(2))
    st2, metrics = train_step(st, batch, cfg2, LIBERO, tc, tx=tx)
    assert np.isfinite(float(metrics["loss"]))
    assert int(st2.step) == 1


def test_interleaved_single_graph_mixture_throughput(tmp_path_factory):
    """The mixture path is ONE tf.data graph (sample_from_datasets): weighted
    ratios hold and throughput at LIBERO 224px shapes sustains a saturated
    train step (batch 8 at ~1 step/s needs ~8 frames/s; demand 30)."""
    import os
    import time

    from openvla_oft_tpu.data.rlds.pipeline import (
        make_interleaved_iterator, write_episode_tfrecords)

    rng = np.random.default_rng(3)
    root = str(tmp_path_factory.mktemp("mix224"))
    for name in ("mix_a", "mix_b"):
        eps = [{"images": [_jpeg(rng, 224) for _ in range(16)],
                "actions": rng.uniform(-1, 1, (16, LIBERO.action_dim)),
                "proprio": rng.standard_normal((16, LIBERO.proprio_dim)),
                "language_instruction": f"task {name}"} for _ in range(3)]
        write_episode_tfrecords(os.path.join(root, name), eps)

    it, stats = make_interleaved_iterator(
        root, ["mix_a", "mix_b"], [0.75, 0.25], lambda b: b, LIBERO,
        shuffle_buffer_size=64, image_aug=True, seed=0)
    assert set(stats) == {"mix_a", "mix_b"}
    next(it)  # build + warm the graph
    t0 = time.time()
    n = 96
    names = [next(it)["dataset_name"] for _ in range(n)]
    rate = n / (time.time() - t0)
    assert rate > 30, f"{rate:.1f} frames/s"
    frac_a = names.count("mix_a") / n
    assert 0.5 < frac_a < 0.95, frac_a  # weighted sampling, not round-robin


def test_interleaved_balance_weights(tmp_path_factory):
    """balance_weights multiplies weights by transition counts (reference
    dataset.py:508-513): a 4x bigger dataset dominates equal base weights."""
    import os

    from openvla_oft_tpu.data.rlds.pipeline import (
        make_interleaved_iterator, write_episode_tfrecords)

    rng = np.random.default_rng(4)
    size = TINY_DINOV2.image_size
    root = str(tmp_path_factory.mktemp("bal"))
    for name, n_ep in (("big_ds", 8), ("small_ds", 2)):
        eps = [{"images": [_jpeg(rng, size) for _ in range(10)],
                "actions": rng.uniform(-1, 1, (10, LIBERO.action_dim)),
                "proprio": rng.standard_normal((10, LIBERO.proprio_dim)),
                "language_instruction": f"task {name}"} for _ in range(n_ep)]
        write_episode_tfrecords(os.path.join(root, name), eps)

    it, stats = make_interleaved_iterator(
        root, ["big_ds", "small_ds"], [1.0, 1.0], lambda b: b, LIBERO,
        shuffle_buffer_size=32, image_aug=False, seed=1,
        balance_weights=True)
    assert stats["big_ds"]["num_transitions"] == 80
    names = [next(it)["dataset_name"] for _ in range(80)]
    frac_big = names.count("big_ds") / len(names)
    assert frac_big > 0.6, frac_big


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
