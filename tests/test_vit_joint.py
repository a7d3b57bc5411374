"""Parity for the joint padded ViT-pair program (models/vit_joint.py): the
G=2 batched execution with width/head_dim/token/depth padding must equal the
sequential folded per-backbone path. Exercises every padding mechanism on a
heterogeneous tiny pair: widths 48 vs 32, head_dims 12 vs 8 (softmax-scale
fold), prefix 5 vs 0 tokens (M padding + key masking), LayerScale vs none,
gelu vs gelu_tanh, and unequal depths (identity-layer padding)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvla_oft_tpu.config import TINY_DINOV2, TINY_SIGLIP, OpenVLAConfig
from openvla_oft_tpu.models.vit import (
    fuse_vit_inference_weights,
    init_vit_params,
    vit_featurize,
)
from openvla_oft_tpu.models.vit_joint import (
    build_joint_vit_pair,
    vit_pair_featurize_joint,
)

NAMES = ("featurizer", "fused_featurizer")


def _make_pair(cfgs, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    params = {}
    for name, cfg, k in zip(NAMES, cfgs, ks):
        p = init_vit_params(k, cfg, dtype=jnp.float32)
        # random affines/LayerScale so the folds are non-trivial
        noise = jax.random.split(k, 8)
        lay = p["layers"]
        L, d = cfg.depth, cfg.width
        lay["norm1"]["scale"] = 1.0 + 0.1 * jax.random.normal(noise[0], (L, d))
        lay["norm1"]["bias"] = 0.1 * jax.random.normal(noise[1], (L, d))
        lay["norm2"]["scale"] = 1.0 + 0.1 * jax.random.normal(noise[2], (L, d))
        lay["norm2"]["bias"] = 0.1 * jax.random.normal(noise[3], (L, d))
        if "ls1" in lay:
            lay["ls1"]["scale_factor"] = 0.5 + 0.1 * jax.random.normal(
                noise[4], (L, d))
            lay["ls2"]["scale_factor"] = 0.5 + 0.1 * jax.random.normal(
                noise[5], (L, d))
        params[name] = fuse_vit_inference_weights(p)
    return params


def _check_pair(cfgs, seed=0):
    params = _make_pair(cfgs, seed)
    joint = build_joint_vit_pair(params, cfgs, NAMES)
    rng = np.random.default_rng(seed)
    imgs = [jnp.asarray(rng.normal(0, 1, (2, c.image_size, c.image_size, 3)),
                        jnp.float32) for c in cfgs]
    want = [vit_featurize(params[name], cfg, im)
            for name, cfg, im in zip(NAMES, cfgs, imgs)]
    got = vit_pair_featurize_joint(joint, cfgs, imgs)
    for w, g in zip(want, got):
        assert w.shape == g.shape
        np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                   rtol=2e-5, atol=2e-5)


def test_joint_equal_depth_pair():
    _check_pair((TINY_DINOV2, TINY_SIGLIP))


def test_joint_unequal_depth_pair():
    # Depth 3 vs 5: the shallower backbone gets identity padding layers.
    cfgs = (TINY_DINOV2, dataclasses.replace(TINY_SIGLIP, depth=5))
    _check_pair(cfgs, seed=1)


def test_joint_rejects_unfolded():
    cfgs = (TINY_DINOV2, TINY_SIGLIP)
    raw = {name: init_vit_params(k, cfg, dtype=jnp.float32)
           for name, cfg, k in zip(
               NAMES, cfgs, jax.random.split(jax.random.PRNGKey(0), 2))}
    with pytest.raises(ValueError, match="folded"):
        build_joint_vit_pair(raw, cfgs, NAMES)


def test_joint_scale_fold_unbiased_in_bf16():
    """The sqrt(hdj/hd) softmax-scale fold must be computed in f32 and
    rounded ONCE per element: casting the scalar to bf16 first would bias
    every attention logit of the smaller-head backbone systematically."""
    cfgs = (TINY_DINOV2, TINY_SIGLIP)
    assert TINY_SIGLIP.head_dim < TINY_DINOV2.head_dim  # fold is non-trivial
    params = {}
    for name, cfg, k in zip(NAMES, cfgs,
                            jax.random.split(jax.random.PRNGKey(3), 2)):
        params[name] = fuse_vit_inference_weights(
            init_vit_params(k, cfg, dtype=jnp.bfloat16))
    joint = build_joint_vit_pair(params, cfgs, NAMES)

    g = 1  # the smaller-head group
    cfg = cfgs[g]
    nh, hd = cfg.num_heads, cfg.head_dim
    hdj = max(c.head_dim for c in cfgs)
    lj = joint["layers"]["qkv_k"].shape[0]
    n_run = cfg.depth - 1
    got = joint["layers"]["qkv_k"][:, g].reshape(lj, -1, 3, nh, hdj)
    got_q = np.asarray(got[:n_run, :cfg.width, 0, :, :hd])

    orig = params[NAMES[g]]["layers"]["attn"]["qkv"]["kernel"][:n_run]
    orig = orig.reshape(n_run, cfg.width, 3, nh, hd)[:, :, 0]
    adj = (hdj / hd) ** 0.5
    want = np.asarray((orig.astype(jnp.float32) * adj).astype(jnp.bfloat16))
    np.testing.assert_array_equal(got_q, want)


def test_joint_film_rejected():
    """A joint tree + FiLM is a config error, not a silent KeyError fallthrough
    (the per-backbone fallback cannot run on a joint tree)."""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.models.vision_backbone import (
        init_film,
        vision_backbone_forward,
    )

    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", C.TINY_LLAMA)
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama", use_film=True)
    params = _make_pair(cfg.vision_configs, seed=4)
    with_joint = {"joint": build_joint_vit_pair(params, cfg.vision_configs)}
    film = init_film(jax.random.PRNGKey(5), cfg)
    h = TINY_DINOV2.image_size
    pixels = jnp.zeros((1, 1, 2, h, h, 3), jnp.float32)
    lang = jnp.zeros((1, cfg.llm_dim), jnp.float32)
    with pytest.raises(ValueError, match="FiLM"):
        vision_backbone_forward(with_joint, cfg, pixels,
                                film_params=film, language_embedding=lang)


def test_joint_through_vision_backbone_forward():
    """vision_backbone_forward dispatches to the joint program when a
    'joint' entry is present and produces the same concatenated features as
    the sequential path."""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.models.vision_backbone import vision_backbone_forward

    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", C.TINY_LLAMA)
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama", num_images_in_input=2)
    params = _make_pair(cfg.vision_configs, seed=2)
    h = TINY_DINOV2.image_size
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(rng.normal(0, 1, (1, 2, 2, h, h, 3)), jnp.float32)

    want = vision_backbone_forward(params, cfg, pixels)
    with_joint = {**params,
                  "joint": build_joint_vit_pair(params, cfg.vision_configs)}
    got = vision_backbone_forward(with_joint, cfg, pixels)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=2e-5, atol=2e-5)


def test_joint_int8_matches_per_backbone_int8():
    """int8 serving through the joint program preserves the per-backbone
    int8 path's quantization exactly where it is deterministic, and its
    quality where it is not:

    1. the int8 weight GRIDS are bit-identical (per-out-channel absmax is
       invariant to zero row padding, and the sqrt(hdj/hd) q-column scaling
       multiplies absmax and weights equally — same integers, scaled scale);
    2. end-to-end error vs the FLOAT reference is the same magnitude as the
       per-backbone int8 error (outputs are not bit-equal: the two layouts
       standardize in different fp orders, so per-token activation round()
       occasionally lands on the other side of a .5 boundary)."""
    from openvla_oft_tpu.models.vit_joint import quantize_joint_vit
    from openvla_oft_tpu.ops.quant import quantize_tree

    cfgs = (TINY_DINOV2, TINY_SIGLIP)
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    unfolded = {}
    for name, cfg, k in zip(NAMES, cfgs, ks):
        p = init_vit_params(k, cfg, dtype=jnp.float32)
        lay = p["layers"]
        noise = jax.random.split(k, 4)
        L, d = cfg.depth, cfg.width
        lay["norm1"]["scale"] = 1.0 + 0.1 * jax.random.normal(noise[0], (L, d))
        lay["norm1"]["bias"] = 0.1 * jax.random.normal(noise[1], (L, d))
        lay["norm2"]["scale"] = 1.0 + 0.1 * jax.random.normal(noise[2], (L, d))
        lay["norm2"]["bias"] = 0.1 * jax.random.normal(noise[3], (L, d))
        unfolded[name] = fuse_vit_inference_weights(p, fold_norms=False)

    joint = quantize_joint_vit(build_joint_vit_pair(unfolded, cfgs, NAMES))
    per_backbone = {name: quantize_tree(unfolded[name], min_dim=8)
                    for name in NAMES}

    # (1) exact grid equality, group 0 (no dim padding on the tiny dino).
    cfg0 = cfgs[0]
    n_run = cfg0.depth - 1
    nh, hd = cfg0.num_heads, cfg0.head_dim
    hdj = max(c.head_dim for c in cfgs)
    dj = max(c.width for c in cfgs)
    jq = np.asarray(joint["layers"]["qkv_k"][:, 0])
    pq = np.asarray(
        per_backbone[NAMES[0]]["layers"]["attn"]["qkv"]["kernel"][:n_run])
    pqr = np.pad(pq.reshape(n_run, cfg0.width, 3, nh, hd),
                 ((0, jq.shape[0] - n_run), (0, dj - cfg0.width), (0, 0),
                  (0, 0), (0, hdj - hd))).reshape(jq.shape)
    np.testing.assert_array_equal(jq, pqr)

    # (2) quantization-quality parity vs the float reference.
    folded = {n: fuse_vit_inference_weights(unfolded[n], fold_norms=True)
              for n in NAMES}
    rng = np.random.default_rng(3)
    imgs = [jnp.asarray(rng.normal(0, 1, (2, c.image_size, c.image_size, 3)),
                        jnp.float32) for c in cfgs]
    ref = [vit_featurize(folded[name], cfg, im)
           for name, cfg, im in zip(NAMES, cfgs, imgs)]
    pb = [vit_featurize(per_backbone[name], cfg, im)
          for name, cfg, im in zip(NAMES, cfgs, imgs)]
    got = vit_pair_featurize_joint(joint, cfgs, imgs)
    for r, p_, g in zip(ref, pb, got):
        assert r.shape == g.shape
        err_pb = float(jnp.abs(p_ - r).mean())
        err_joint = float(jnp.abs(g - r).mean())
        assert err_joint < 2.0 * err_pb + 1e-4, (err_joint, err_pb)
