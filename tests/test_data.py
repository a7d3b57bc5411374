"""Data pipeline tests: chunking semantics, normalization rules, batch
transform token/label contract, collator bucketing."""

import numpy as np
import pytest

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import (
    IGNORE_INDEX,
    LIBERO,
    STOP_INDEX,
    NormalizationType,
)
from openvla_oft_tpu.data.collator import PaddedCollatorForActionPrediction, batch_iterator
from openvla_oft_tpu.data.datasets import DummyDataset, RLDSBatchTransform
from openvla_oft_tpu.data.transforms import (
    binarize_gripper_actions,
    chunk_actions,
    compute_dataset_statistics,
    load_dataset_statistics,
    normalize,
    save_dataset_statistics,
)
from openvla_oft_tpu.processing.action_tokenizer import ActionTokenizer
from openvla_oft_tpu.processing.processor import PrismaticProcessor

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


def test_chunk_actions_caps_at_trajectory_end():
    t, d, future = 10, 3, 4
    actions = np.arange(t)[:, None].repeat(d, 1).astype(np.float32)
    chunks = chunk_actions(actions, window_size=1, future_action_window_size=future)
    assert chunks.shape == (t - future, 1 + future, d)
    # first frame: [0, 1, 2, 3, 4]
    np.testing.assert_array_equal(chunks[0, :, 0], [0, 1, 2, 3, 4])
    # last effective frame (5): [5, 6, 7, 8, 9]; frame 5+4=9 == last
    np.testing.assert_array_equal(chunks[-1, :, 0], [5, 6, 7, 8, 9])


def test_normalize_bounds_q99_and_degenerate_dims():
    stats = {"min": [0.0, 0.0, 5.0], "max": [10.0, 10.0, 5.0],
             "q01": [1.0, 1.0, 5.0], "q99": [9.0, 9.0, 5.0],
             "mask": [True, False, True]}
    x = np.asarray([[5.0, 5.0, 5.0]])
    out = normalize(x, stats, NormalizationType.BOUNDS_Q99)
    assert abs(out[0, 0] - 0.0) < 1e-6          # (5-1)/(8)*2-1 = 0
    assert out[0, 1] == 5.0                     # masked dim passes through
    assert out[0, 2] == 0.0                     # degenerate dim -> 0
    out2 = normalize(np.asarray([[100.0, 0, 5]]), stats, NormalizationType.BOUNDS)
    assert out2[0, 0] == 1.0                    # clipped


def test_binarize_gripper():
    a = np.asarray([1.0, 0.97, 0.5, 0.02, 0.01, 0.6, 1.0])
    out = binarize_gripper_actions(a)
    np.testing.assert_array_equal(out, [1, 1, 0, 0, 0, 1, 1])


def test_statistics_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    actions = rng.uniform(-2, 2, (500, 7))
    stats = {"dummy_dataset": compute_dataset_statistics(actions,
                                                         rng.random((500, 8)))}
    path = save_dataset_statistics(stats, str(tmp_path))
    loaded = load_dataset_statistics(path)
    assert loaded["dummy_dataset"]["action"]["q99"] == \
        stats["dummy_dataset"]["action"]["q99"]
    assert loaded["dummy_dataset"]["num_transitions"] == 500


def test_batch_transform_and_collator():
    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    ds = DummyDataset(transform, image_size=TINY_DINOV2.image_size,
                      num_samples=4, num_images=2)
    examples = list(ds)
    ex = examples[0]
    chunk = LIBERO.chunk_len
    # labels: exactly chunk_len + 1 supervised tokens, rest IGNORE
    supervised = (ex["labels"] != IGNORE_INDEX).sum()
    assert supervised == chunk + 1
    assert ex["labels"][-1] == STOP_INDEX
    assert (ex["input_ids"][-1 - chunk:-1] > 31743).all()
    assert ex["pixel_values"].shape[0] == 2  # primary + wrist
    assert ex["proprio"].shape == (LIBERO.proprio_dim,)
    # round-trip: action ids decode back to the (quantized) actions
    at = ActionTokenizer()
    decoded = at.decode_token_ids_to_actions(
        ex["input_ids"][-1 - chunk:-1]).reshape(LIBERO.num_actions_chunk,
                                                LIBERO.action_dim)
    assert np.abs(decoded - ex["actions"]).max() <= (2 / 255) / 2 + 1e-9

    coll = PaddedCollatorForActionPrediction()
    batches = list(batch_iterator(ds, 2, coll))
    assert len(batches) == 2
    b0 = batches[0]
    assert b0["input_ids"].shape[1] % 8 == 0
    assert b0["pixel_values"].shape[:3] == (2, 2, 2)
    assert (b0["attention_mask"].sum(1) > 0).all()
    # labels padded with IGNORE
    assert (b0["labels"][b0["attention_mask"] == 0] == IGNORE_INDEX).all()


def test_oxe_registry_and_kwargs():
    from openvla_oft_tpu.data.rlds.oxe import (
        OXE_DATASET_CONFIGS,
        OXE_NAMED_MIXTURES,
        ActionEncoding,
        StateEncoding,
        get_oxe_dataset_kwargs_and_weights,
        make_oxe_dataset_kwargs,
    )

    # key reference entries present
    for name in ("libero_spatial_no_noops", "aloha_scoop_x_into_bowl",
                 "bridge_orig", "ur5e_pick_place", "fractal20220817_data"):
        assert name in OXE_DATASET_CONFIGS, name

    kw = make_oxe_dataset_kwargs("libero_spatial_no_noops", "/data",
                                 load_camera_views=("primary", "wrist"))
    # EEF_POS: 6 relative arm dims + absolute gripper (materialize.py:36-45)
    assert kw["absolute_action_mask"] == [False] * 6 + [True]
    assert kw["action_normalization_mask"] == [True] * 6 + [False]
    assert kw["image_obs_keys"]["wrist"] == "wrist_image"
    assert kw["standardize_fn"] is not None
    # default view set filters to primary only (materialize.py:48-57)
    kw_p = make_oxe_dataset_kwargs("libero_spatial_no_noops", "/data")
    assert set(kw_p["image_obs_keys"]) == {"primary"}

    aloha = OXE_DATASET_CONFIGS["aloha_scoop_x_into_bowl"]
    assert aloha.action_encoding == ActionEncoding.JOINT_POS_BIMANUAL
    assert aloha.state_encoding == StateEncoding.JOINT_BIMANUAL
    kw2 = make_oxe_dataset_kwargs("aloha_scoop_x_into_bowl", "/data")
    # bimanual joint actions are fully absolute + normalized
    # (reference materialize.py:42-44)
    assert kw2["absolute_action_mask"] == [True] * 14
    assert kw2["action_normalization_mask"] == [True] * 14

    kwargs, weights = get_oxe_dataset_kwargs_and_weights("/data", "rtx")
    assert len(kwargs) == len(weights) == 10
    assert "bridge" in OXE_NAMED_MIXTURES


def test_npz_dataset_tf_free(tmp_path):
    """TF-free episode store mirrors the tf.data pipeline semantics."""
    import io

    from PIL import Image

    from openvla_oft_tpu.data.npz_dataset import (
        make_npz_iterator,
        write_npz_episodes,
    )

    rng = np.random.default_rng(0)
    size = TINY_DINOV2.image_size

    def jpeg():
        buf = io.BytesIO()
        Image.fromarray((rng.random((size, size, 3)) * 255
                         ).astype(np.uint8)).save(buf, format="JPEG")
        return buf.getvalue()

    episodes = [{
        "images": [jpeg() for _ in range(12)],
        "wrist_images": [jpeg() for _ in range(12)],
        "actions": rng.uniform(-2, 2, (12, LIBERO.action_dim)),
        "proprio": rng.standard_normal((12, LIBERO.proprio_dim)),
        "language_instruction": f"npz task {e}",
    } for e in range(3)]
    ds_dir = tmp_path / "npz_root" / "libero_npz"
    write_npz_episodes(str(ds_dir), episodes)

    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO)
    it, stats = make_npz_iterator(str(tmp_path / "npz_root"), "libero_npz",
                                  transform, LIBERO, shuffle_buffer_size=10,
                                  num_images=2)
    assert "libero_npz" in stats
    ex = next(it)
    assert ex["actions"].shape == (LIBERO.num_actions_chunk, LIBERO.action_dim)
    assert np.abs(ex["actions"]).max() <= 1.0 + 1e-6
    assert ex["pixel_values"].shape[0] == 2
    assert (ex["labels"] != IGNORE_INDEX).sum() == LIBERO.chunk_len + 1
    # eval mode terminates after one pass: 3 eps x (12-7) eff frames = 15
    it_eval, _ = make_npz_iterator(str(tmp_path / "npz_root"), "libero_npz",
                                   transform, LIBERO, train=False)
    assert len(list(it_eval)) == 15


def test_predict_stop_token_false_masks_only_stop():
    """predict_stop_token=False must re-mask ONLY the final STOP label
    (reference datasets.py:74-77) — the round-2 review caught the old form
    supervising STOP while masking the FIRST action token."""
    proc = PrismaticProcessor(CFG)
    transform = RLDSBatchTransform(proc, ActionTokenizer(), LIBERO,
                                   predict_stop_token=False)
    ds = DummyDataset(transform, image_size=TINY_DINOV2.image_size,
                      num_samples=1, num_images=1)
    ex = next(iter(ds))
    chunk = LIBERO.chunk_len
    supervised = ex["labels"] != IGNORE_INDEX
    assert supervised.sum() == chunk                 # all action tokens
    assert ex["labels"][-1] == IGNORE_INDEX          # STOP masked
    # every supervised label is an action token (> ACTION_TOKEN_BEGIN_IDX)
    assert (ex["labels"][supervised] > 31743).all()


def test_length_grouped_batcher_flush_keeps_examples():
    """Buffer flush must never silently drop examples: when the fullest pool
    holds < batch_size items it flushes as a short batch (round-2 review:
    the old flush removed the items and yielded nothing)."""
    from openvla_oft_tpu.data.batching import LengthGroupedBatcher

    def examples():
        # round-robin over three length classes so no pool ever reaches
        # batch_size before the buffer cap trips
        lengths = [60, 90, 120]
        for i in range(60):
            yield {"input_ids": [0] * lengths[i % 3]}

    batcher = LengthGroupedBatcher(batch_size=32, buckets=(64, 96, 128),
                                   buffer_batches=2)
    out = list(batcher(examples()))
    total = sum(len(exs) for _, exs in out)
    assert total == 60, total  # nothing dropped
    for bucket, exs in out:
        assert all(len(e["input_ids"]) <= bucket for e in exs)
