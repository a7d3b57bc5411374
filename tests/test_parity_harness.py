"""validate_parity <-> record_reference_outputs npz interop.

Without real reference weights the harness is smoke-tested against this
repo's own exports: a tiny checkpoint is exported in HF layout, the expected
stage outputs are computed through the same public functions, written in the
RECORDER's npz schema (channel-stacked pixels, flat prompt ids — the exact
keys `vla_scripts/record_reference_outputs.py` dumps on the reference side),
and `validate()` must reproduce them stage for stage.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import LIBERO
from openvla_oft_tpu.policy import OpenVLAPolicy, init_openvla_params
from openvla_oft_tpu.utils.hf_import import (
    export_openvla_checkpoint,
    load_openvla_checkpoint,
)

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama",
                    num_images_in_input=2)
STATS = {"libero_spatial": {"action": {
    "q01": [-1.0] * 7, "q99": [1.0] * 7, "min": [-1.0] * 7, "max": [1.0] * 7,
    "mask": [True] * 6 + [False]}}}


def test_validate_parity_consumes_recorder_npz(tmp_path, monkeypatch):
    monkeypatch.setenv("OPENVLA_ALLOW_FAKE_TOKENIZER", "1")
    from examples.quickstart import load_observation
    from experiments.robot.openvla_utils import _try_tokenizer
    from openvla_oft_tpu.models.prismatic import prepare_prompt_ids
    from openvla_oft_tpu.models.projector import vision_projector
    from openvla_oft_tpu.models.vision_backbone import vision_backbone_forward
    from openvla_oft_tpu.processing.image_processing import (
        prepare_images_for_policy)
    from openvla_oft_tpu.processing.processor import to_channel_stacked
    from vla_scripts.validate_parity import ParityConfig, validate

    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head=None)
    base = {k: params[k] for k in ("llm", "vision_backbone", "projector")}
    ckpt = export_openvla_checkpoint(CFG, base, str(tmp_path / "libero_ckpt"),
                                     norm_stats=STATS)

    # Expected stage outputs through the same public surface validate() uses,
    # stored in the recorder's schema.
    model_cfg, loaded, norm_stats = load_openvla_checkpoint(ckpt, dtype=jnp.bfloat16)
    obs = load_observation(None)
    task = obs.pop("task_description")
    tokenizer = _try_tokenizer(ckpt)
    ids, mask = prepare_prompt_ids(tokenizer, task, bucket=64)
    pixels = prepare_images_for_policy(
        [obs["full_image"], obs["wrist_image"]], model_cfg, center_crop=True)
    feats = np.asarray(vision_backbone_forward(
        loaded["vision_backbone"], model_cfg,
        jnp.asarray(pixels)[None].astype(jnp.bfloat16)), np.float32)
    proj = np.asarray(vision_projector(loaded["projector"],
                                       jnp.asarray(feats)), np.float32)
    policy = OpenVLAPolicy(cfg=model_cfg, platform=LIBERO, params=loaded,
                           norm_stats=norm_stats, head="discrete",
                           tokenizer=tokenizer)
    actions = policy.predict_action(pixels, task, unnorm_key="libero_spatial")

    npz = tmp_path / "reference_outputs.npz"
    np.savez(
        npz,
        prompt_ids=ids[mask.astype(bool)].astype(np.int32),
        pixels_channel_stacked=to_channel_stacked(
            np.asarray(pixels, np.float32)[None]),
        vit_features=feats,
        projected_patches=proj,
        actions=np.asarray(actions, np.float32),
    )

    ok = validate(ParityConfig(checkpoint=ckpt, reference_outputs=str(npz),
                               num_images_in_input=2, use_proprio=False,
                               unnorm_key="libero_spatial"))
    assert ok, "stage-by-stage parity vs recorder-format npz failed"


def test_validate_parity_fails_on_mismatch(tmp_path, monkeypatch):
    """A corrupted reference stage must FAIL, not silently pass."""
    monkeypatch.setenv("OPENVLA_ALLOW_FAKE_TOKENIZER", "1")
    from vla_scripts.validate_parity import ParityConfig, validate

    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head=None)
    base = {k: params[k] for k in ("llm", "vision_backbone", "projector")}
    ckpt = export_openvla_checkpoint(CFG, base, str(tmp_path / "libero_ckpt"),
                                     norm_stats=STATS)

    model_cfg, loaded, _ = load_openvla_checkpoint(ckpt, dtype=jnp.bfloat16)
    from openvla_oft_tpu.models.vision_backbone import vision_backbone_forward
    size = model_cfg.vision_configs[0].image_size
    feats = np.asarray(vision_backbone_forward(
        loaded["vision_backbone"], model_cfg,
        jnp.zeros((1, 2, 2, size, size, 3), jnp.bfloat16)), np.float32)
    npz = tmp_path / "bad.npz"
    np.savez(npz, vit_features=feats + 1.0)  # deliberately wrong
    ok = validate(ParityConfig(checkpoint=ckpt, reference_outputs=str(npz),
                               num_images_in_input=2, use_proprio=False,
                               unnorm_key="libero_spatial"))
    assert not ok


def test_validate_parity_l1_head_with_pt_modules(tmp_path, monkeypatch):
    """Round-3 review regression: stage 5 must load the per-module
    action_head / proprio_projector .pt files (OFT release layout), pick the
    L1 head, normalize proprio via the eval API, and PASS against an npz
    recorded through the same get_vla_action program — the old code ran
    head='discrete' with raw proprio and KeyError'd on proprio_projector."""
    from types import SimpleNamespace

    monkeypatch.setenv("OPENVLA_ALLOW_FAKE_TOKENIZER", "1")
    from examples.quickstart import load_observation
    from experiments.robot.openvla_utils import _try_tokenizer, get_vla_action
    from openvla_oft_tpu.models.action_heads import init_l1_head
    from openvla_oft_tpu.models.projector import init_proprio_projector
    from openvla_oft_tpu.training.checkpoint import export_module_pt
    from vla_scripts.validate_parity import ParityConfig, validate

    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head=None)
    base = {k: params[k] for k in ("llm", "vision_backbone", "projector")}
    stats = {"libero_spatial": {
        "action": STATS["libero_spatial"]["action"],
        "proprio": {"q01": [-1.0] * 8, "q99": [1.0] * 8,
                    "min": [-1.0] * 8, "max": [1.0] * 8},
    }}
    ckpt = export_openvla_checkpoint(CFG, base, str(tmp_path / "oft_ckpt"),
                                     norm_stats=stats)
    llm_dim = TINY_LLAMA.hidden_size
    head = init_l1_head(jax.random.PRNGKey(3), LIBERO, llm_dim=llm_dim,
                        hidden_dim=32)
    pproj = init_proprio_projector(jax.random.PRNGKey(4),
                                   proprio_dim=LIBERO.proprio_dim,
                                   llm_dim=llm_dim)
    export_module_pt(head, "action_head", ckpt, 1000)
    export_module_pt(pproj, "proprio_projector", ckpt, 1000)

    # Expected actions through the same eval-API program the harness runs.
    model_cfg, loaded, norm_stats = load_openvla_checkpoint(
        ckpt, dtype=jnp.bfloat16)
    obs = load_observation(None)
    task = obs.pop("task_description")
    policy = OpenVLAPolicy(cfg=model_cfg, platform=LIBERO, params=loaded,
                           norm_stats=norm_stats, head="l1",
                           tokenizer=_try_tokenizer(ckpt))
    eval_cfg = SimpleNamespace(num_images_in_input=2, use_proprio=True,
                               center_crop=True, unnorm_key="libero_spatial",
                               device_preprocess=False)
    actions = get_vla_action(eval_cfg, policy, None, dict(obs), task,
                             action_head=head, proprio_projector=pproj)

    npz = tmp_path / "ref.npz"
    np.savez(npz, actions=np.asarray(actions, np.float32))
    ok = validate(ParityConfig(checkpoint=ckpt, reference_outputs=str(npz),
                               num_images_in_input=2, use_proprio=True,
                               unnorm_key="libero_spatial"))
    assert ok, "L1 .pt-module stage-5 parity failed"
