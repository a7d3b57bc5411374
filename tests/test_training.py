"""LoRA train-step tests: loss decreases, LoRA targets match, and the full
sharded step runs on an 8-device dp×fsdp×tp CPU mesh."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import (
    ACTION_TOKEN_BEGIN_IDX,
    EMPTY_TOKEN_ID,
    IGNORE_INDEX,
    LIBERO,
    STOP_INDEX,
)
from openvla_oft_tpu.parallel.mesh import make_mesh
from openvla_oft_tpu.parallel.sharding import param_shardings, shard_params
from openvla_oft_tpu.policy import init_openvla_params
from openvla_oft_tpu.training.lora import apply_lora, init_lora
from openvla_oft_tpu.training.train_step import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_optimizer,
    train_step,
)

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


def _batch(b=2, s=72):
    rng = np.random.default_rng(0)
    chunk = LIBERO.chunk_len
    h = TINY_DINOV2.image_size
    input_ids = np.zeros((b, s), np.int32)
    labels = np.full((b, s), IGNORE_INDEX, np.int32)
    attn = np.zeros((b, s), np.int32)
    for i, plen in enumerate([7, 9]):
        seq = ([1] + list(rng.integers(10, 1000, plen - 2)) + [EMPTY_TOKEN_ID]
               + list(rng.integers(ACTION_TOKEN_BEGIN_IDX + 1,
                                   ACTION_TOKEN_BEGIN_IDX + 257, chunk))
               + [STOP_INDEX])
        input_ids[i, :len(seq)] = seq
        attn[i, :len(seq)] = 1
        labels[i, plen:len(seq)] = seq[plen:]
    return {
        "input_ids": jnp.asarray(input_ids),
        "attention_mask": jnp.asarray(attn),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(rng.random((b, 1, 2, h, h, 3)), jnp.float32),
        "actions": jnp.asarray(rng.uniform(-1, 1, (b, LIBERO.num_actions_chunk,
                                                   LIBERO.action_dim)), jnp.float32),
        "proprio": jnp.asarray(rng.random((b, LIBERO.proprio_dim)), jnp.float32),
    }


def _setup(objective="l1"):
    key = jax.random.PRNGKey(0)
    head = {"l1": "l1", "diffusion": "diffusion", "discrete": None}[objective]
    full = init_openvla_params(key, CFG, LIBERO, dtype=jnp.float32, head=head,
                               with_lm_head=(objective == "discrete"))
    base = {k: full[k] for k in ("llm", "vision_backbone", "projector")}
    trainables = {"lora": init_lora(jax.random.PRNGKey(1), base, rank=4)}
    if "proprio_projector" in full:
        trainables["proprio_projector"] = full["proprio_projector"]
    if "action_head" in full:
        trainables["action_head"] = full["action_head"]
    if "noisy_action_projector" in full:
        trainables["noisy_action_projector"] = full["noisy_action_projector"]
    cfg = TrainConfig(objective=objective, learning_rate=1e-3, lora_rank=4,
                      lora_alpha=4.0)
    state = create_train_state(base, trainables, cfg, jax.random.PRNGKey(2))
    return state, cfg


def test_lora_identity_at_init():
    """B=0 at init -> merged params equal base params exactly."""
    key = jax.random.PRNGKey(0)
    base = {"llm": init_openvla_params(key, CFG, LIBERO, dtype=jnp.float32,
                                       head=None)["llm"]}
    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    merged = apply_lora(base, lora, rank=4, alpha=4.0)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), base, merged)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    # LoRA covered the LLM linears: 7 sites per stack group
    assert set(lora["llm"]["layers"]["attn"].keys()) == {"wq", "wk", "wv", "wo"}
    assert set(lora["llm"]["layers"]["mlp"].keys()) == {"gate", "up", "down"}
    # A is rank-major (L, r, in) — peft lora_A convention; the (in, r) layout
    # lane-pads r=32 -> 128 in TPU HBM tiles, +1.65 GiB across fp32 A + Adam
    # m/v at 7B (training/lora.py::init_lora). Pin it so it can't flip back.
    wq = lora["llm"]["layers"]["attn"]["wq"]
    L, d = CFG.llm.num_layers, CFG.llm.hidden_size
    assert wq["a"].shape == (L, 4, d), wq["a"].shape
    assert wq["b"].shape == (L, 4, d), wq["b"].shape


def test_lora_layout_migration_merge_equivalence():
    """Pre-rank-major checkpoints stored A as (..., in, r); merging must
    transpose them on the fly and produce bit-identical results to the
    current layout (training/lora.py::migrate_lora_layout)."""
    from openvla_oft_tpu.training.lora import (merge_lora_into_params,
                                               migrate_lora_layout)

    key = jax.random.PRNGKey(0)
    base = {"llm": init_openvla_params(key, CFG, LIBERO, dtype=jnp.float32,
                                       head=None)["llm"]}
    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    # give B nonzero values so the merge actually changes weights
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim else x, lora)
    old_layout = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.swapaxes(x, -1, -2)
        if str(p[-1].key) == "a" else x, lora)
    merged_new = merge_lora_into_params(base, lora, rank=4, alpha=4.0)
    merged_old = merge_lora_into_params(base, old_layout, rank=4, alpha=4.0)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), merged_new, merged_old)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    # migration is a no-op on current-layout trees (idempotent)
    again = migrate_lora_layout(lora, 4)
    same = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), lora, again)
    assert max(jax.tree_util.tree_leaves(same)) == 0.0


def test_checkpoint_prune_ignores_orbax_tmp_dirs(tmp_path):
    """latest-only pruning must key on numeric step dirs: a stale
    '*.orbax-checkpoint-tmp*' dir from a hard kill sorts lexicographically
    ABOVE every real step and must not cause the newest real checkpoint to
    be deleted (training/checkpoint.py::prune_old_steps)."""
    import os

    from openvla_oft_tpu.training.checkpoint import prune_old_steps

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    for d in ("000100", "000200",
              "000300.orbax-checkpoint-tmp-1699999999"):
        (ckpt_dir / d).mkdir()
        (ckpt_dir / d / "data").write_text("x")
    prune_old_steps(str(ckpt_dir))
    kept = sorted(os.listdir(ckpt_dir))
    assert "000200" in kept, "newest real checkpoint must survive"
    assert "000100" not in kept, "older real checkpoint should be pruned"


@pytest.mark.slow
@pytest.mark.parametrize("objective", ["l1", "discrete", "diffusion"])
def test_loss_decreases(objective):
    state, cfg = _setup(objective)
    batch = _batch()
    step = jax.jit(lambda s, b: train_step(s, b, CFG, LIBERO, cfg))
    fixed_rng = state.rng
    losses = []
    for _ in range(8):
        if objective == "diffusion":
            # freeze the sampled noise/timesteps so the objective is
            # deterministic and the descent check is meaningful
            state = TrainState(state.base_params, state.trainables,
                               state.opt_state, state.step, fixed_rng)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sharded_train_step_8dev_mesh():
    """Full train step under dp=2, fsdp=2, tp=2 on the virtual CPU mesh."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    state, cfg = _setup("l1")

    with mesh:
        sharded_base = shard_params(state.base_params, mesh)
        sharded_train = shard_params(state.trainables, mesh)
        tstate = create_train_state(sharded_base, sharded_train, cfg,
                                    jax.random.PRNGKey(2))
        batch = _batch(b=4)
        batch = {k: jax.device_put(v, NamedSharding(mesh, P(("dp", "fsdp"))))
                 for k, v in batch.items()}
        step = jax.jit(lambda s, b: train_step(s, b, CFG, LIBERO, cfg))
        new_state, metrics = step(tstate, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params changed
        delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                               - b.astype(jnp.float32)))),
            tstate.trainables, new_state.trainables)
        assert max(jax.tree_util.tree_leaves(delta)) > 0

    # sharding specs actually split the big LLM kernels
    from openvla_oft_tpu.parallel.sharding import param_pspecs
    specs = param_pspecs(state.base_params, mesh)
    wq_spec = specs["llm"]["layers"]["attn"]["wq"]["kernel"]
    assert wq_spec == P(None, "fsdp", "tp")


def test_inject_lora_matches_merge():
    """Merge-free evaluation == merged evaluation (same math, no W' copy)."""
    import jax.numpy as jnp
    from openvla_oft_tpu.ops.layers import linear
    from openvla_oft_tpu.training.lora import apply_lora, init_lora, inject_lora

    key = jax.random.PRNGKey(0)
    base = {"llm": {"layers": {"attn": {"wq": {
        "kernel": jax.random.normal(key, (2, 32, 48)) * 0.1}}}}}
    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    lora = jax.tree_util.tree_map(lambda a: a + 0.05, lora)  # nonzero B
    merged = apply_lora(base, lora, rank=4, alpha=8.0)
    injected = inject_lora(base, lora, rank=4, alpha=8.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 32))
    for layer in range(2):
        node_m = jax.tree_util.tree_map(lambda a: a[layer],
                                        merged["llm"]["layers"]["attn"]["wq"])
        node_i = jax.tree_util.tree_map(lambda a: a[layer],
                                        injected["llm"]["layers"]["attn"]["wq"])
        np.testing.assert_allclose(np.asarray(linear(node_i, x)),
                                   np.asarray(linear(node_m, x)),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_train_last_layer_stage_freezes_early_layers(tmp_path):
    """vla-last-layer-train must update ONLY (embed, layers[-1], lm_head) —
    reference last_layer_finetune_modules (llm/llama2.py:101-102) — leaving
    every earlier stacked layer slice and the projector bit-identical.
    (Round-2 review: the old stage table trained the projector and froze the
    modules the reference trains.)"""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from openvla_oft_tpu.training.checkpoint import restore_checkpoint
    from vla_scripts.train import TrainConfig, train

    out = train(TrainConfig(
        vla_id="tiny", stage="vla-last-layer-train",
        pretrained_checkpoint="random:tiny", data_root_dir=Path("dummy"),
        dataset_name="libero_dummy", batch_size=2, max_steps=2,
        save_interval=2, run_root_dir=tmp_path, learning_rate=1e-2))
    assert out["final_step"] == 2
    restored = restore_checkpoint(str(Path(out["run_dir"]) / "ckpt"), 2)
    tr = restored["trainables"]
    assert set(tr) == {"llm_last_layer"}
    # compare against a fresh init with the same seed: the last slice moved
    import jax
    import jax.numpy as jnp

    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.policy import init_openvla_params
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import (
        OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP)

    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama")
    init = init_openvla_params(jax.random.PRNGKey(7), cfg, LIBERO,
                               dtype=jnp.bfloat16, head=None,
                               with_lm_head=True)
    moved = np.abs(
        np.asarray(tr["llm_last_layer"]["layers"]["attn"]["wq"]["kernel"],
                   np.float32)
        - np.asarray(init["llm"]["layers"]["attn"]["wq"]["kernel"][-1],
                     np.float32)).max()
    assert moved > 0, "last-layer slice did not train"


@pytest.mark.parametrize("policy", ["dots", "none"])
def test_remat_policy_matches_full_recompute(policy):
    """remat_policy changes memory/compute scheduling only — grads and loss
    must match the default full-recompute policy bit-for-bit on CPU."""
    from openvla_oft_tpu.training.train_step import loss_and_metrics

    state, cfg = _setup("l1")
    batch = _batch()
    rng = jax.random.PRNGKey(3)

    def grads_for(c):
        return jax.value_and_grad(loss_and_metrics, has_aux=True)(
            state.trainables, state.base_params, batch, CFG, LIBERO, c, rng)

    (loss_ref, _), g_ref = grads_for(cfg)
    c2 = dataclasses.replace(cfg, remat_policy=policy)
    (loss2, _), g2 = grads_for(c2)
    # "dots" runs the identical primal program (only residual saving differs)
    # -> bitwise grads. "none" compiles a different schedule, re-rounding
    # bf16 intermediates: elementwise comparison is whack-a-mole, so assert
    # per-leaf relative L2 agreement instead (a semantic bug — wrong mask,
    # skipped layer — moves whole leaves, not ULPs).
    np.testing.assert_allclose(float(loss_ref), float(loss2),
                               rtol=1e-4, atol=1e-6)
    if policy == "dots":
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
            g_ref, g2)
    else:
        def rel_l2(a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = max(np.linalg.norm(a), 1e-12)
            assert np.linalg.norm(a - b) / denom < 1e-2
        jax.tree_util.tree_map(rel_l2, g_ref, g2)


def test_remat_policy_unknown_name_raises():
    from openvla_oft_tpu.models.llama import resolve_remat_policy

    with pytest.raises(ValueError, match="remat policy"):
        resolve_remat_policy("everything")
    assert resolve_remat_policy(None) is None
    assert resolve_remat_policy("all") is None
    assert resolve_remat_policy("dots") is not None


@pytest.mark.parametrize("threshold,expect_flash", [(10_000, False), (16, True)])
def test_training_auto_flash_dispatch(monkeypatch, threshold, expect_flash):
    """use_flash="auto" in the TRAINING forward resolves against
    FLASH_SEQ_THRESHOLD from the static multimodal length — and the chosen
    path survives jax.grad (the reference trains with flash-attn,
    reference SETUP.md:20-24; our crossover is measured, docs/PERFORMANCE.md
    "Flash-attention kernel: formal status")."""
    import openvla_oft_tpu.models.prismatic as Pm
    import openvla_oft_tpu.ops.attention as A
    from openvla_oft_tpu.training.train_step import loss_and_metrics

    monkeypatch.setattr(A, "FLASH_SEQ_THRESHOLD", threshold)
    seen = {}
    orig = Pm._run_llm

    def spy(*args, **kw):
        seen["use_flash"] = kw.get("use_flash")
        return orig(*args, **kw)

    monkeypatch.setattr(Pm, "_run_llm", spy)

    state, cfg = _setup("l1")
    batch = _batch()
    (loss, _), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(
        state.trainables, state.base_params, batch, CFG, LIBERO, cfg,
        jax.random.PRNGKey(0), use_flash="auto")
    assert seen["use_flash"] is expect_flash
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g, np.float32))) for g in flat)
