"""gelu_erf_fast: exhaustive bf16 enumeration + model-level equivalence.

The serving fast path (ops/layers.py::gelu_erf_fast) replaces XLA's erf-based
exact GELU with x*sigmoid(poly(x)) — derivation in vla_scripts/fit_fast_gelu.py.
These tests pin the accuracy contract quoted in its docstring:
  1. enumerating ALL finite bf16 inputs, outputs match the fp64-rounded
     golden except ~0.3% boundary-straddling values, each off by exactly
     1 bf16 ulp in |x| <= 5, and only negligible-magnitude values beyond;
  2. swapping it into the DINOv2 backbone + projector changes bf16 outputs
     by at most 1-2 ulp on a tiny fraction of elements (same order as two
     correct fp32 erf implementations differ).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_oft_tpu.ops.layers import gelu, gelu_erf_fast


def _to_bf16_bits(a: np.ndarray) -> np.ndarray:
    u = np.asarray(a, np.float32).view(np.uint32)
    return ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(np.uint16)


def _all_finite_bf16() -> np.ndarray:
    u = np.arange(0x10000, dtype=np.uint32)
    f = (u << 16).view(np.float32)
    return f[np.isfinite(f)]


def _golden_gelu_f64(x: np.ndarray) -> np.ndarray:
    from scipy import special

    x = np.asarray(x, np.float64)
    return x * 0.5 * (1.0 + special.erf(x / np.sqrt(2.0)))


def test_enumerate_all_bf16_inputs():
    scipy = pytest.importorskip("scipy")  # noqa: F841  (golden needs erf)
    x32 = _all_finite_bf16()
    golden = _to_bf16_bits(_golden_gelu_f64(x32)).astype(np.int64)

    out = jax.jit(gelu_erf_fast)(jnp.asarray(x32).astype(jnp.bfloat16))
    fast = np.asarray(out).view(np.uint16).astype(np.int64)

    diff = np.abs(golden - fast)
    x = x32.astype(np.float64)

    # Denormal inputs/outputs are flushed to zero by the TPU (and XLA CPU) —
    # XLA's own erf-GELU does the same, so they are excluded from the ulp
    # contract and pinned separately below.
    MIN_NORMAL = 1.1754944e-38
    gold_val = _golden_gelu_f64(x)
    normal_io = ((np.abs(x) >= MIN_NORMAL) | (x == 0.0)) & \
                ((np.abs(gold_val) >= MIN_NORMAL) | (gold_val == 0.0))
    core = (np.abs(x) <= 5.0) & normal_io
    n_core = int((diff[core] > 0).sum())
    assert n_core <= 1000, f"{n_core} mismatches in |x|<=5"
    assert int(diff[core].max()) <= 1, "must be <=1 bf16 ulp in |x|<=5"

    denorm = (np.abs(x) <= 5.0) & ~normal_io
    out_denorm = np.asarray(out)[denorm].astype(np.float32)
    # flushed-to-zero or the ~x/2 value itself; never larger than the input
    assert np.abs(out_denorm).max() <= np.abs(x[denorm]).max()

    mid = (np.abs(x) > 5.0) & (np.abs(x) <= 9.0)
    bad_mid = mid & (diff > 0)
    if bad_mid.any():
        # all disagreements there are on negligible-magnitude outputs
        assert np.abs(_golden_gelu_f64(x[bad_mid])).max() < 2e-6

    tail = np.abs(x) > 9.0
    bad_tail = tail & (diff > 0)
    if bad_tail.any():
        assert (x[bad_tail] < 0).all()  # positive tail is exact (gelu(x)=x)
        assert np.abs(_golden_gelu_f64(x[bad_tail])).max() < 2e-18

    # NaN propagates
    assert np.isnan(np.asarray(gelu_erf_fast(jnp.asarray(np.nan, jnp.bfloat16)),
                               np.float32))


def test_matches_xla_erf_gelu_on_bf16_grid():
    """Against XLA's own erf-GELU (not fp64): sub-ulp equivalent in the core
    range; in the x < -4 tail the FAST form is the more accurate one (the
    x*(1+erf)/2 form catastrophically cancels), so only assert the core."""
    x32 = _all_finite_bf16()
    core = np.abs(x32) <= 4.0
    xb = jnp.asarray(x32[core]).astype(jnp.bfloat16)
    ref = np.asarray(jax.jit(gelu)(xb)).view(np.uint16).astype(np.int64)
    fast = np.asarray(jax.jit(gelu_erf_fast)(xb)).view(np.uint16).astype(np.int64)
    diff = np.abs(ref - fast)
    assert int(diff.max()) <= 1
    assert float((diff > 0).mean()) < 0.05


def test_backbone_outputs_sub_ulp():
    """Full tiny-ViT + projector forward: fast vs exact GELU outputs agree to
    <= 2 bf16 ulp relative on every element (random weights, bf16)."""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.projector import init_vision_projector, vision_projector
    from openvla_oft_tpu.models.vision_backbone import (
        init_vision_backbone, vision_backbone_forward)

    C._VISION_REGISTRY.setdefault("tiny-dual", (C.TINY_DINOV2, C.TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", C.TINY_LLAMA)
    cfg = C.OpenVLAConfig(vision_backbone_id="tiny-dual",
                          llm_backbone_id="tiny-llama", num_images_in_input=1)
    assert cfg.vision_configs[0].act == "gelu"  # the swap must exercise dino

    key = jax.random.PRNGKey(0)
    vb = init_vision_backbone(key, cfg, dtype=jnp.bfloat16)
    proj = init_vision_projector(jax.random.PRNGKey(1), cfg.vision_dim,
                                 64, dtype=jnp.bfloat16)
    hw = cfg.vision_configs[0].image_size
    pixels = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 2, hw, hw, 3),
                               jnp.bfloat16)

    def fwd(fast):
        c = dataclasses.replace(cfg, fast_gelu=fast)
        feats = vision_backbone_forward(vb, c, pixels)
        return vision_projector(proj, feats, fast_gelu=fast)

    exact = np.asarray(fwd(False), np.float32)
    fast = np.asarray(fwd(True), np.float32)
    scale = np.abs(exact).max()
    # 2 bf16 ulps at tensor scale (ulp ~ 2^-8 relative)
    assert np.abs(exact - fast).max() <= 2 * 2.0 ** -8 * scale
    _ = LIBERO  # platform import kept for parity with other tests


def test_serving_program_contains_no_erf():
    """HLO regression guard for the 2.0x bf16 headline: the default serving
    program (bf16 params, serve_action_chunk fast_gelu default) must lower
    with ZERO chlo.erf/erfc ops — every erf-GELU (DINOv2 MLPs + projector)
    goes through the logistic fast form. A reappearing erfc means a code
    path lost the fast_gelu plumbing (~1 ms regression on the real chip)."""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.policy import init_openvla_params, serve_action_chunk

    C._VISION_REGISTRY.setdefault("tiny-dual", (C.TINY_DINOV2, C.TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", C.TINY_LLAMA)
    cfg = C.OpenVLAConfig(vision_backbone_id="tiny-dual",
                          llm_backbone_id="tiny-llama")
    params = init_openvla_params(jax.random.PRNGKey(0), cfg, LIBERO,
                                 dtype=jnp.bfloat16, head="l1",
                                 head_dtype=jnp.bfloat16)
    size = cfg.vision_configs[0].image_size
    frames = jnp.zeros((1, 1, size + 12, size + 12, 3), jnp.uint8)
    ids = jnp.zeros((1, 16), jnp.int32).at[0, -5:].set(
        jnp.asarray([1, 2, 3, 4, 29871]))
    mask = jnp.zeros((1, 16), jnp.int32).at[0, -5:].set(1)
    ad = LIBERO.action_dim

    def f(params, frames, ids, mask):
        return serve_action_chunk(
            params, cfg, LIBERO, frames_u8=frames, input_ids=ids,
            prompt_mask=mask, proprio=None,
            action_low=jnp.full((ad,), -1.0), action_high=jnp.full((ad,), 1.0),
            action_mask=jnp.ones((ad,), bool), use_flash=False,
            resize_size=size)

    txt = jax.jit(f).lower(params, frames, ids, mask).as_text()
    assert txt.count("chlo.erf") == 0, "erf reappeared in the serving program"

    # and the exact-erf escape hatch still produces them
    def f_exact(params, frames, ids, mask):
        return serve_action_chunk(
            params, cfg, LIBERO, frames_u8=frames, input_ids=ids,
            prompt_mask=mask, proprio=None,
            action_low=jnp.full((ad,), -1.0), action_high=jnp.full((ad,), 1.0),
            action_mask=jnp.ones((ad,), bool), use_flash=False,
            resize_size=size, fast_gelu=False)

    txt = jax.jit(f_exact).lower(params, frames, ids, mask).as_text()
    assert txt.count("chlo.erf") > 0
