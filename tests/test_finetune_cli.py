"""Finetune CLI integration: resume-from-checkpoint, gradient accumulation,
and eval-harness module importability."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_finetune_resume(tmp_path):
    """Train 2 steps -> save; resume continues from the saved step."""
    from vla_scripts.finetune import FinetuneConfig, finetune

    base = dict(vla_path="random:tiny", data_root_dir=Path("dummy"),
                dataset_name="libero_dummy", batch_size=2, save_freq=2,
                use_proprio=True, run_root_dir=tmp_path,
                use_flash_attention=False, wandb_log_freq=100,
                merge_lora_during_training=False)
    out1 = finetune(FinetuneConfig(**base, max_steps=2))
    assert out1["final_step"] == 2

    out2 = finetune(FinetuneConfig(**base, max_steps=4, resume=True,
                                   run_id_override=Path(out1["run_dir"]).name))
    assert out2["final_step"] == 4
    ckpts = sorted((Path(out1["run_dir"]) / "ckpt").iterdir())
    assert [c.name for c in ckpts] == ["000002", "000004"]


@pytest.mark.slow
def test_grad_accumulation_matches_larger_batch():
    """optax.MultiSteps: k micro-steps of batch b ~ one step of batch k*b."""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import (
        OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP)
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.policy import init_openvla_params
    from openvla_oft_tpu.training.lora import init_lora
    from openvla_oft_tpu.training.train_step import (
        TrainConfig, create_train_state, make_optimizer, train_step)
    from tests.test_training import _batch

    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama")

    full = init_openvla_params(jax.random.PRNGKey(0), cfg, LIBERO,
                               dtype=jnp.float32, head="l1")
    base = {k: full[k] for k in ("llm", "vision_backbone", "projector")}
    trainables = {"lora": init_lora(jax.random.PRNGKey(1), base, rank=4),
                  "action_head": full["action_head"],
                  "proprio_projector": full["proprio_projector"]}

    batch = _batch(b=2)
    half_a = {k: v[:1] for k, v in batch.items()}
    half_b = {k: v[1:] for k, v in batch.items()}

    # two micro-steps with accumulation
    tc_acc = TrainConfig(objective="l1", learning_rate=1e-3, lora_rank=4,
                         lora_alpha=4.0, grad_accumulation_steps=2)
    tx = make_optimizer(tc_acc)
    st = create_train_state(base, trainables, tc_acc, jax.random.PRNGKey(2))
    st, _ = train_step(st, half_a, cfg, LIBERO, tc_acc, tx=tx)
    mid = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        st.trainables, trainables)
    assert max(jax.tree_util.tree_leaves(mid)) == 0.0  # no update yet
    st, _ = train_step(st, half_b, cfg, LIBERO, tc_acc, tx=tx)

    # one full-batch step without accumulation
    tc_full = dataclasses.replace(tc_acc, grad_accumulation_steps=1)
    tx2 = make_optimizer(tc_full)
    st2 = create_train_state(base, trainables, tc_full, jax.random.PRNGKey(2))
    st2, _ = train_step(st2, batch, cfg, LIBERO, tc_full, tx=tx2)

    # MultiSteps averages micro-grads, so results agree closely (not exactly:
    # per-micro-batch loss means weight examples slightly differently)
    a = np.asarray(st.trainables["action_head"]["model"]["fc_out"]["kernel"])
    b = np.asarray(st2.trainables["action_head"]["model"]["fc_out"]["kernel"])
    assert np.abs(a - b).max() < 5e-4, np.abs(a - b).max()
    delta = np.abs(a - np.asarray(
        trainables["action_head"]["model"]["fc_out"]["kernel"])).max()
    assert delta > 0  # accumulation step actually updated


def test_eval_harnesses_importable():
    """Robot-eval modules import without their sim/robot dependencies."""
    import experiments.robot.aloha.run_aloha_eval as aloha
    import experiments.robot.bridge.run_bridgev2_eval as bridge
    import experiments.robot.libero.run_libero_eval as libero
    import experiments.robot.robosuite.run_robosuite_eval as robosuite

    assert aloha.STEP_DURATION_IN_SEC == 1.0 / 25.0
    assert libero.TASK_MAX_STEPS["libero_10"] == 520
    assert hasattr(bridge, "eval_bridge")
    assert hasattr(robosuite, "eval_robosuite")
    # gated deps raise cleanly
    with pytest.raises(ImportError):
        from experiments.robot.aloha.aloha_utils import make_real_env

        make_real_env()


@pytest.mark.slow
def test_finetune_quantize_base(tmp_path):
    """QLoRA path end-to-end: --quantize_base trains with an int8 frozen base
    and produces finite, decreasing-ish loss (the straight-through backward
    must feed LoRA gradients)."""
    from vla_scripts.finetune import FinetuneConfig, finetune

    out = finetune(FinetuneConfig(
        vla_path="random:tiny", data_root_dir=Path("dummy"),
        dataset_name="libero_dummy", batch_size=2, max_steps=3,
        save_freq=100, use_proprio=True, run_root_dir=tmp_path,
        use_flash_attention=False, wandb_log_freq=100,
        merge_lora_during_training=False,
        quantize_base=True, quantize_base_min_dim=1))
    assert out["final_step"] == 3
    import json

    metrics_files = list(Path(out["run_dir"]).glob("*.jsonl"))
    assert metrics_files, "no metrics log written"
    rows = [json.loads(line) for line in
            metrics_files[0].read_text().splitlines() if line.strip()]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


@pytest.mark.slow
def test_finetune_quantize_base_int4(tmp_path):
    """--quantize_base_bits 4: packed-int4 frozen base (max HBM headroom for
    b>=2 single-chip runs) trains with finite loss, combined with the dots
    remat policy it is meant to buy room for."""
    import json

    from vla_scripts.finetune import FinetuneConfig, finetune

    out = finetune(FinetuneConfig(
        vla_path="random:tiny", data_root_dir=Path("dummy"),
        dataset_name="libero_dummy", batch_size=2, max_steps=2,
        save_freq=100, use_proprio=True, run_root_dir=tmp_path,
        use_flash_attention=False, wandb_log_freq=100,
        merge_lora_during_training=False,
        quantize_base=True, quantize_base_min_dim=1, quantize_base_bits=4,
        remat_policy="dots"))
    assert out["final_step"] == 2
    metrics_files = list(Path(out["run_dir"]).glob("*.jsonl"))
    rows = [json.loads(line) for line in
            metrics_files[0].read_text().splitlines() if line.strip()]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


def test_lr_warmup_matches_reference_formula():
    """Warmup ramps 10%->100% (reference finetune.py:1094-1096), never 0."""
    from openvla_oft_tpu.training.train_step import TrainConfig, lr_schedule

    fn = lr_schedule(TrainConfig(learning_rate=5e-4, warmup_steps=1000))
    np.testing.assert_allclose(float(fn(0)), 5e-4 * (0.1 + 0.9 * 1 / 1000),
                               rtol=1e-6)
    np.testing.assert_allclose(float(fn(499)), 5e-4 * (0.1 + 0.9 * 0.5),
                               rtol=1e-6)
    np.testing.assert_allclose(float(fn(2000)), 5e-4, rtol=1e-6)


@pytest.mark.slow
def test_grad_accum_counts_optimizer_steps(tmp_path):
    """max_steps counts OPTIMIZER steps (reference log_step semantics): with
    G=2 and max_steps=2 the loop must consume 4 micro-batches, and the saved
    checkpoint is numbered by gradient step."""
    from vla_scripts.finetune import FinetuneConfig, finetune

    out = finetune(FinetuneConfig(
        vla_path="random:tiny", data_root_dir=Path("dummy"),
        dataset_name="libero_dummy", batch_size=2, max_steps=2,
        grad_accumulation_steps=2, save_freq=2, use_proprio=True,
        run_root_dir=tmp_path, use_flash_attention=False,
        wandb_log_freq=100, merge_lora_during_training=False))
    # state.step counts micro-steps: 2 optimizer steps * G=2
    assert out["final_step"] == 4
    ckpts = sorted((Path(out["run_dir"]) / "ckpt").iterdir())
    assert [c.name for c in ckpts] == ["000002"]  # gradient-step numbering
    # per-module .pt files live in the reference's sibling chkpt dir
    chkpt_dir = Path(str(out["run_dir"]) + "--2_chkpt")
    assert chkpt_dir.is_dir()
    assert (chkpt_dir / "action_head--2_checkpoint.pt").exists()
    assert (chkpt_dir / "dataset_statistics.json").exists()


@pytest.mark.slow
def test_finetune_diffusion_with_sampling_metric(tmp_path):
    """Diffusion objective end-to-end incl. the periodic reverse-diffusion
    sampling metric (reference run_diffusion_sampling)."""
    import json

    from vla_scripts.finetune import FinetuneConfig, finetune

    out = finetune(FinetuneConfig(
        vla_path="random:tiny", data_root_dir=Path("dummy"),
        dataset_name="libero_dummy", batch_size=2, max_steps=2,
        use_l1_regression=False, use_diffusion=True, num_diffusion_steps=4,
        diffusion_sample_freq=1, save_freq=100, use_proprio=True,
        run_root_dir=tmp_path, use_flash_attention=False, wandb_log_freq=1,
        merge_lora_during_training=False))
    assert out["final_step"] == 2
    logs = list(Path(out["run_dir"]).glob("*.jsonl"))
    rows = [json.loads(line) for line in logs[0].read_text().splitlines()]
    keys = set().union(*[r.keys() for r in rows])
    assert "sampled_actions_l1_loss" in keys, keys


def test_shell_launcher_flags_match_configs():
    """Every --flag in the vla_scripts/*.sh launchers must be a real config
    field (reference launchers pass positionals straight into finetune.py;
    a renamed dataclass field would break them silently)."""
    import dataclasses
    import re

    from vla_scripts.finetune import FinetuneConfig
    from vla_scripts.merge_lora_weights_and_save import MergeConfig

    root = Path(__file__).resolve().parent.parent / "vla_scripts"
    fields = {
        "finetune.sh": {f.name for f in dataclasses.fields(FinetuneConfig)},
        "merge_lora_weights_and_save.sh":
            {f.name for f in dataclasses.fields(MergeConfig)},
    }
    for sh, names in fields.items():
        text = re.sub(r"#.*", "", (root / sh).read_text())
        # only whitespace-anchored flags: `--x` inside run-id-note strings
        # like "parallel_dec--8_acts_chunk" are data, not flags
        for flag in re.findall(r"(?<=\s)--([a-z0-9_]+)", text):
            assert flag in names, f"{sh} passes unknown flag --{flag}"
    # variant launchers delegate to finetune.sh; check they stay wrappers
    for sh in ("finetune_libero.sh", "finetune_abs_pose.sh"):
        text = re.sub(r"#.*", "", (root / sh).read_text())
        assert "finetune.sh" in text, f"{sh} should delegate"
        assert not re.findall(r"(?<=\s)--[a-z0-9_]+", text), \
            f"{sh} should delegate, not duplicate flags"
