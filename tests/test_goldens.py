"""Golden-activation regression tests.

SURVEY.md §4 calls for per-module goldens; real reference checkpoints are
unavailable in this zero-egress environment, so these pin OUR OWN outputs at
fixed seeds to `tests/goldens/*.npz`. Any future refactor that changes
numerics (layer order, mask semantics, porting layout) trips these before it
can silently break checkpoint parity. Regenerate intentionally with
`REGEN_GOLDENS=1 pytest tests/test_goldens.py`.
"""

import os
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import EMPTY_TOKEN_ID, LIBERO

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")

GOLDEN_DIR = Path(__file__).parent / "goldens"
REGEN = os.environ.get("REGEN_GOLDENS") == "1"


def _check(name: str, value: np.ndarray, atol=2e-5):
    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / f"{name}.npz"
    value = np.asarray(value, np.float32)
    if REGEN or not path.exists():
        np.savez_compressed(path, value=value)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to verify")
        return
    stored = np.load(path)["value"]
    np.testing.assert_allclose(value, stored, atol=atol, rtol=1e-4,
                               err_msg=f"golden drift in {name}")


def test_golden_llama_forward():
    from openvla_oft_tpu.models.llama import init_llama_params, llama_model

    params = init_llama_params(jax.random.PRNGKey(11), TINY_LLAMA,
                               dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(12), (1, 9, TINY_LLAMA.hidden_size))
    bidir = jnp.zeros((1, 9), bool).at[:, 5:8].set(True)
    out = llama_model(params, TINY_LLAMA, x, bidir_mask=bidir)
    _check("llama_bidir_forward", out[:, -4:, :8])


def test_golden_vit_features():
    from openvla_oft_tpu.models.vit import init_vit_params, vit_featurize

    params = init_vit_params(jax.random.PRNGKey(21), TINY_DINOV2,
                             dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(22),
                           (1, TINY_DINOV2.image_size, TINY_DINOV2.image_size, 3))
    out = vit_featurize(params, TINY_DINOV2, x)
    _check("dinov2_tap_features", out[:, :3, :8])


def test_golden_predict_action_hidden():
    from openvla_oft_tpu.models.prismatic import predict_action_hidden
    from openvla_oft_tpu.policy import init_openvla_params

    params = init_openvla_params(jax.random.PRNGKey(31), CFG, LIBERO,
                                 dtype=jnp.float32, head="l1")
    h = TINY_DINOV2.image_size
    pixels = jax.random.uniform(jax.random.PRNGKey(32), (1, 1, 2, h, h, 3))
    ids = np.zeros((1, 12), np.int32)
    ids[0, 3] = 1
    ids[0, 4:11] = [100, 200, 300, 400, 500, 600, 700]
    ids[0, 11] = EMPTY_TOKEN_ID
    mask = np.zeros((1, 12), np.int32)
    mask[0, 3:] = 1
    proprio = jax.random.uniform(jax.random.PRNGKey(33),
                                 (1, LIBERO.proprio_dim))
    out = predict_action_hidden(params, CFG, LIBERO,
                                input_ids=jnp.asarray(ids),
                                prompt_mask=jnp.asarray(mask), pixels=pixels,
                                proprio=proprio)
    _check("predict_action_hidden", out.actions_hidden[:, :4, :8])


def test_golden_ddim_trajectory():
    from openvla_oft_tpu.ops.ddim import DDIMScheduler

    sched = DDIMScheduler(num_train_timesteps=100)
    x = jax.random.normal(jax.random.PRNGKey(41), (1, 4, 3))
    for t in sched.timesteps(10):
        eps = 0.1 * x  # deterministic pseudo-model
        x = sched.step(eps, jnp.asarray(t), x, num_inference_steps=10)
    _check("ddim_trajectory", x)
