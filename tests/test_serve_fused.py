"""`serve_action_chunk` (one-jit serving path: uint8 frames -> unnormalized
actions) must match the staged host pipeline exactly: resize -> crop ->
normalize/stack -> predict_action_hidden -> L1 head -> unnormalize_actions."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import LIBERO, NormalizationType
from openvla_oft_tpu.models.action_heads import l1_head_predict
from openvla_oft_tpu.models.prismatic import (
    predict_action_hidden,
    unnormalize_actions,
)
from openvla_oft_tpu.policy import init_openvla_params, serve_action_chunk
from openvla_oft_tpu.processing.image_processing import (
    center_crop_resize,
    make_device_transform,
    resize_lanczos3,
)

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


def test_serve_action_chunk_matches_staged_pipeline(rng):
    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head="l1")
    size = TINY_DINOV2.image_size
    h0 = size + 12  # raw camera frames larger than the model resolution
    frames = (rng.random((1, 1, h0, h0, 3)) * 255).astype(np.uint8)
    proprio_raw = rng.random((1, LIBERO.proprio_dim)).astype(np.float32) * 3 - 1

    bucket = 16
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    real = [1] + list(rng.integers(10, 1000, 8)) + [29871]
    ids[0, bucket - len(real):] = real
    mask[0, bucket - len(real):] = 1

    low = np.linspace(-0.9, -0.2, LIBERO.action_dim).astype(np.float32)
    high = np.linspace(0.2, 0.9, LIBERO.action_dim).astype(np.float32)
    amask = np.asarray([True] * (LIBERO.action_dim - 1) + [False])
    p_low = np.full((LIBERO.proprio_dim,), -1.5, np.float32)
    p_high = np.full((LIBERO.proprio_dim,), 2.5, np.float32)

    fused = np.asarray(serve_action_chunk(
        params, CFG, LIBERO, frames_u8=jnp.asarray(frames),
        input_ids=jnp.asarray(ids), prompt_mask=jnp.asarray(mask),
        proprio=jnp.asarray(proprio_raw),
        action_low=jnp.asarray(low), action_high=jnp.asarray(high),
        action_mask=jnp.asarray(amask),
        proprio_low=jnp.asarray(p_low), proprio_high=jnp.asarray(p_high),
        use_flash=False, resize_size=size))

    # staged host path
    img = np.asarray(resize_lanczos3(jnp.asarray(frames[0, 0]), size))
    img = np.asarray(center_crop_resize(jnp.asarray(img), 0.9))
    pixels = np.asarray(make_device_transform(CFG)(jnp.asarray(img[None])))
    p_clip = np.clip(proprio_raw, p_low, p_high)
    p_norm = 2.0 * (p_clip - p_low) / (p_high - p_low + 1e-8) - 1.0
    out = predict_action_hidden(
        params, CFG, LIBERO, input_ids=jnp.asarray(ids),
        prompt_mask=jnp.asarray(mask), pixels=jnp.asarray(pixels)[None],
        proprio=jnp.asarray(p_norm), use_flash=False)
    norm = np.asarray(l1_head_predict(
        params["action_head"], out.actions_hidden.astype(jnp.float32), LIBERO))
    staged = unnormalize_actions(
        norm, {"min": low, "max": high, "mask": amask},
        NormalizationType.BOUNDS)

    assert fused.shape == (1, LIBERO.num_actions_chunk, LIBERO.action_dim)
    np.testing.assert_allclose(fused, staged, rtol=1e-5, atol=1e-5)
    # the masked dim passes through un-unnormalized
    np.testing.assert_allclose(fused[..., -1], norm[..., -1], atol=1e-6)


def test_serve_degenerate_proprio_matches_staged(rng):
    """Degenerate-dim zeroing must follow the staged normalizer's rule
    (data/transforms.normalize): judged by min==max when full stats exist —
    a dim with q01==q99 but min!=max is NOT zeroed (it saturates to ±1),
    while a truly constant dim (min==max) maps to 0."""
    from openvla_oft_tpu.data.transforms import normalize

    params = init_openvla_params(jax.random.PRNGKey(1), CFG, LIBERO,
                                 dtype=jnp.float32, head="l1")
    size = TINY_DINOV2.image_size
    frames = (rng.random((1, 1, size + 12, size + 12, 3)) * 255
              ).astype(np.uint8)
    pd = LIBERO.proprio_dim
    proprio_raw = (rng.random((1, pd)).astype(np.float32) * 3 - 1)
    proprio_raw[0, 0] = 0.9   # above its collapsed q01==q99 bound
    proprio_raw[0, 1] = 0.3   # value at a truly constant dim

    q01 = np.linspace(-1.0, -0.5, pd).astype(np.float32)
    q99 = np.linspace(0.5, 1.0, pd).astype(np.float32)
    pmin = q01 - 0.5
    pmax = q99 + 0.5
    q01[0] = q99[0] = 0.5        # percentile-degenerate, min!=max
    pmin[1] = pmax[1] = q01[1] = q99[1] = 0.3   # truly constant dim

    bucket = 16
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, -3:] = [1, 42, 29871]
    mask[0, -3:] = 1
    low = np.full((LIBERO.action_dim,), -0.8, np.float32)
    high = np.full((LIBERO.action_dim,), 0.8, np.float32)
    amask = np.ones((LIBERO.action_dim,), bool)

    fused = np.asarray(serve_action_chunk(
        params, CFG, LIBERO, frames_u8=jnp.asarray(frames),
        input_ids=jnp.asarray(ids), prompt_mask=jnp.asarray(mask),
        proprio=jnp.asarray(proprio_raw),
        action_low=jnp.asarray(low), action_high=jnp.asarray(high),
        action_mask=jnp.asarray(amask),
        proprio_low=jnp.asarray(q01), proprio_high=jnp.asarray(q99),
        proprio_zero=jnp.asarray(pmin == pmax),
        use_flash=False, resize_size=size))

    # staged oracle: transforms.normalize (min==max rule) + reference clip
    p_meta = {"q01": q01, "q99": q99, "min": pmin, "max": pmax}
    p_norm = np.clip(normalize(proprio_raw, p_meta,
                               NormalizationType.BOUNDS_Q99), -1.0, 1.0)
    assert p_norm[0, 0] == 1.0 and p_norm[0, 1] == 0.0  # the rule, pinned
    img = np.asarray(resize_lanczos3(jnp.asarray(frames[0, 0]), size))
    img = np.asarray(center_crop_resize(jnp.asarray(img), 0.9))
    pixels = np.asarray(make_device_transform(CFG)(jnp.asarray(img[None])))
    out = predict_action_hidden(
        params, CFG, LIBERO, input_ids=jnp.asarray(ids),
        prompt_mask=jnp.asarray(mask), pixels=jnp.asarray(pixels)[None],
        proprio=jnp.asarray(p_norm), use_flash=False)
    norm = np.asarray(l1_head_predict(
        params["action_head"], out.actions_hidden.astype(jnp.float32), LIBERO))
    staged = unnormalize_actions(
        norm, {"min": low, "max": high, "mask": amask},
        NormalizationType.BOUNDS)
    np.testing.assert_allclose(fused, staged, rtol=1e-5, atol=1e-5)


def test_predict_action_from_frames_policy_api(rng):
    """OpenVLAPolicy.predict_action_from_frames drives serve_action_chunk
    with stats pulled from norm_stats (bounds for LIBERO-like q99 platforms
    come from q01/q99)."""
    from openvla_oft_tpu.policy import OpenVLAPolicy

    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head="l1")
    size = TINY_DINOV2.image_size
    frames = (rng.random((1, size + 8, size + 8, 3)) * 255).astype(np.uint8)
    proprio = rng.random(LIBERO.proprio_dim).astype(np.float32)
    d = LIBERO.action_dim
    stats = {"libero_spatial": {
        "action": {"q01": [-0.8] * d, "q99": [0.8] * d,
                   "min": [-1.0] * d, "max": [1.0] * d,
                   "mask": [True] * (d - 1) + [False]},
        "proprio": {"q01": [-1.0] * LIBERO.proprio_dim,
                    "q99": [1.0] * LIBERO.proprio_dim},
    }}
    pol = OpenVLAPolicy(cfg=CFG, platform=LIBERO, params=params,
                        norm_stats=stats, head="l1", prompt_bucket=16)
    a = pol.predict_action_from_frames(frames, "wipe the table",
                                       proprio=proprio,
                                       unnorm_key="libero_spatial")
    assert a.shape == (LIBERO.num_actions_chunk, LIBERO.action_dim)
    assert np.isfinite(a).all()
    # last dim is masked out of unnormalization -> stays in [-1, 1]-ish raw
    # range; unmasked dims live inside the q01/q99 bounds by construction
    q01, q99 = -0.8, 0.8
    assert a[..., :-1].min() >= q01 - 1e-5 and a[..., :-1].max() <= q99 + 1e-5
