"""Vision Transformer featurizer (SigLIP so400m/14 + DINOv2 ViT-L/14-reg4).

TPU-native re-implementation of the timm ViTs the reference drives through
`PrismaticVisionBackbone` (`prismatic/extern/hf/modeling_prismatic.py:67-227`):

  - patch embedding as patchify+matmul (identical math to the stride-14 conv,
    but lands directly on the MXU as one large matmul),
  - optional class + register tokens (DINOv2-reg4) with timm `no_embed_class`
    position-embedding semantics (pos embed on patch tokens only),
  - pre-norm blocks with optional LayerScale (the reference renames timm's
    `gamma` to `scale_factor` for HF compat, modeling_prismatic.py:53-63 — we
    just call it `scale_factor` in the param tree so ported checkpoints map 1:1),
  - the OpenVLA feature tap: output of the *second-to-last* block, prefix
    tokens stripped, no final norm (modeling_prismatic.py:135-137) — we skip
    the last block entirely since its output is never used,
  - optional FiLM conditioning (x := x*(1+gamma)+beta between the attention and
    MLP residual branches, gamma/beta = Linear(mean language embedding) —
    reference `prismatic/models/film_vit_wrapper.py:69-75`).

Layers are stacked (leading depth axis) and run under `lax.scan`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from openvla_oft_tpu.config import ViTConfig
from openvla_oft_tpu.ops.attention import attention
from openvla_oft_tpu.ops.layers import (
    gelu,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    quick_gelu,
)

Params = Dict[str, Any]


def init_vit_params(key, cfg: ViTConfig, dtype=jnp.bfloat16) -> Params:
    d, L = cfg.width, cfg.depth
    ks = jax.random.split(key, 12)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in ** -0.5).astype(dtype)

    patch_dim = cfg.patch_size * cfg.patch_size * 3
    p: Params = {
        "patch_embed": {"kernel": w(ks[0], (patch_dim, d), patch_dim),
                        "bias": jnp.zeros((d,), dtype)},
        "pos_embed": w(ks[1], (cfg.num_patches if cfg.pos_embed_patches_only
                               else cfg.num_patches + cfg.num_prefix_tokens, d), d),
        "layers": {
            "norm1": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "norm2": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "attn": {
                "qkv": {"kernel": w(ks[2], (L, d, 3 * d), d),
                        "bias": jnp.zeros((L, 3 * d), dtype)},
                "proj": {"kernel": w(ks[3], (L, d, d), d),
                         "bias": jnp.zeros((L, d), dtype)},
            },
            "mlp": {
                "fc1": {"kernel": w(ks[4], (L, d, cfg.mlp_dim), d),
                        "bias": jnp.zeros((L, cfg.mlp_dim), dtype)},
                "fc2": {"kernel": w(ks[5], (L, cfg.mlp_dim, d), cfg.mlp_dim),
                        "bias": jnp.zeros((L, d), dtype)},
            },
        },
    }
    if cfg.num_cls_tokens:
        p["cls_token"] = jnp.zeros((cfg.num_cls_tokens, d), dtype)
    if cfg.num_reg_tokens:
        p["reg_token"] = jnp.zeros((cfg.num_reg_tokens, d), dtype)
    if cfg.use_pre_norm:
        p["norm_pre"] = init_layer_norm(d, dtype)
    if cfg.use_layer_scale:
        p["layers"]["ls1"] = {"scale_factor": 1e-5 * jnp.ones((L, d), dtype)}
        p["layers"]["ls2"] = {"scale_factor": 1e-5 * jnp.ones((L, d), dtype)}
    return p


def init_film_params(key, cfg: ViTConfig, llm_dim: int, dtype=jnp.float32) -> Params:
    """Per-block FiLM scale/shift projectors (film_vit_wrapper.py:53-55)."""
    k1, k2 = jax.random.split(key)
    L, d = cfg.depth, cfg.width
    return {
        "scale": {"kernel": (jax.random.normal(k1, (L, llm_dim, d)) * llm_dim ** -0.5
                             ).astype(dtype), "bias": jnp.zeros((L, d), dtype)},
        "shift": {"kernel": (jax.random.normal(k2, (L, llm_dim, d)) * llm_dim ** -0.5
                             ).astype(dtype), "bias": jnp.zeros((L, d), dtype)},
    }


def fuse_vit_inference_weights(params: Params,
                               fold_norms: bool = True) -> Params:
    """Serving-path epilogue folding (numerics-exact up to fp reassociation):

      - LayerNorm affine folds into the FOLLOWING matmul:
        (z*s+b) @ W = z @ (diag(s) W) + b W  -> norm1 into qkv, norm2 into fc1;
        the norm keeps only the (data-dependent) standardization.
      - LayerScale folds into the PRECEDING matmul's output channels:
        (x W + b) * ls = x (W diag(ls)) + b*ls  -> ls1 into proj, ls2 into fc2.

    Round-2 profiling put the ViT pair at 35-40% MFU with the gap attributed
    to elementwise/normalization epilogues (docs/PERFORMANCE.md) — each fold
    deletes whole VPU passes over the activations instead of hoping XLA
    hides them. Apply at load time, before any quantization; training keeps
    unfused weights (the folds change gradient paths).

    Pass fold_norms=False when the result will be int8 per-output-channel
    quantized: the LN fold scales kernel ROWS (input channels), which can
    inflate per-column absmax and coarsen the quantization grid. The
    LayerScale fold scales OUTPUT columns — per-column quant scales absorb it
    exactly — so it is applied regardless.
    """
    layers = dict(params["layers"])
    f32 = jnp.float32

    def fold_into_following(norm, lin):
        s = norm["scale"].astype(f32)[..., None]        # (L, d, 1)
        k = lin["kernel"].astype(f32)
        new = {"kernel": (k * s).astype(lin["kernel"].dtype)}
        b = jnp.einsum("ld,ldo->lo", norm["bias"].astype(f32), k)
        if "bias" in lin:
            b = b + lin["bias"].astype(f32)
        new["bias"] = b.astype(lin.get("bias", lin["kernel"]).dtype)
        return new

    def fold_into_preceding(lin, ls):
        g = ls["scale_factor"].astype(f32)              # (L, d)
        k = lin["kernel"].astype(f32) * g[:, None, :]
        new = {"kernel": k.astype(lin["kernel"].dtype)}
        if "bias" in lin:
            new["bias"] = (lin["bias"].astype(f32) * g).astype(lin["bias"].dtype)
        return new

    attn = dict(layers["attn"])
    mlp = dict(layers["mlp"])
    if fold_norms:
        attn["qkv"] = fold_into_following(layers["norm1"], attn["qkv"])
        mlp["fc1"] = fold_into_following(layers["norm2"], mlp["fc1"])
        layers["norm1"], layers["norm2"] = {}, {}       # standardize-only
    if "ls1" in layers:
        attn["proj"] = fold_into_preceding(attn["proj"], layers.pop("ls1"))
    if "ls2" in layers:
        mlp["fc2"] = fold_into_preceding(mlp["fc2"], layers.pop("ls2"))
    layers["attn"], layers["mlp"] = attn, mlp
    return {**params, "layers": layers}


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, N, patch*patch*3), row-major patch grid.

    Flatten order within a patch is (dy, dx, c) — `port_timm_patch_embed` in
    utils/weights.py permutes the torch conv kernel to match. Trailing pixels
    beyond a patch multiple are cropped (timm's stride-`patch` conv floors,
    e.g. SigLIP-384: 27x27 patches from 384px).
    """
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    images = images[:, :gh * patch, :gw * patch]
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, c)
    return x.reshape(b, gh * gw, patch * patch * c)


def _use_fused_ln_matmul(norm_p: Params, lin_p: Params) -> bool:
    """Pallas LN+matmul (ops/vit_fused.py) — OPT-IN via OPENVLA_VIT_FUSED=1.

    Measured round 3 (v5e, ViT pair at M=522): the kernel loses to XLA even
    with the affine fold and tuned blocks (dino 5.3 vs 5.0 ms, siglip 7.1 vs
    5.7 ms) — XLA's own epilogue scheduling at these shapes beats the
    hand-pipelined version (docs/PERFORMANCE.md negative results). Kept as a
    tested variant for larger-M regimes. Requires affine-folded norms
    (fuse_vit_inference_weights) + plain unquantized kernels + a real TPU."""
    import os

    if os.environ.get("OPENVLA_VIT_FUSED", "0") != "1":
        return False
    if "scale" in norm_p or "kernel_q4" in lin_p:
        return False
    k = lin_p.get("kernel")
    if k is None or k.dtype == jnp.int8 or "lora_a" in lin_p:
        return False
    return jax.devices()[0].platform == "tpu"


def _ln_linear(norm_p: Params, lin_p: Params, x: jnp.ndarray,
               act_name: Optional[str] = None) -> jnp.ndarray:
    """LayerNorm -> linear (-> activation), taking the fused Pallas path when
    the serving weight layout allows (ops/vit_fused.py), else XLA ops."""
    if _use_fused_ln_matmul(norm_p, lin_p):
        from openvla_oft_tpu.ops.vit_fused import ln_matmul

        # The Pallas kernel carries its own in-kernel erf; the logistic
        # fast form only exists as an XLA epilogue.
        kernel_act = "gelu" if act_name == "gelu_erf_fast" else act_name
        return ln_matmul(x, lin_p["kernel"], lin_p.get("bias"), act=kernel_act)
    y = linear(lin_p, layer_norm(norm_p, x))
    if act_name is None:
        return y
    if act_name == "quick_gelu":
        return quick_gelu(y)
    if act_name == "gelu_tanh":
        from openvla_oft_tpu.ops.layers import gelu_tanh

        return gelu_tanh(y)
    if act_name == "gelu_erf_fast":
        from openvla_oft_tpu.ops.layers import gelu_erf_fast

        return gelu_erf_fast(y)
    return gelu(y)


def _vit_block(
    p: Params,
    cfg: ViTConfig,
    x: jnp.ndarray,
    film: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """One pre-norm ViT block; `film` = (gamma, beta) stacked (2, B, D) or None."""
    b, s, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    qkv = _ln_linear(p["norm1"], p["attn"]["qkv"], x).reshape(b, s, 3, nh, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    o = attention(q, k, v).reshape(b, s, d)
    # Tag for the "attn_out" remat policy, matching llama._block — without
    # this the policy silently degenerates to full recompute for the ViT.
    o = checkpoint_name(o, "attn_out")
    o = linear(p["attn"]["proj"], o)
    if "ls1" in p:
        o = o * p["ls1"]["scale_factor"]
    x = x + o

    if film is not None:
        gamma, beta = film[0], film[1]
        x = x * (1.0 + gamma[:, None, :]) + beta[:, None, :]

    m = _ln_linear(p["norm2"], p["mlp"]["fc1"], x, act_name=cfg.act)
    m = linear(p["mlp"]["fc2"], m)
    if "ls2" in p:
        m = m * p["ls2"]["scale_factor"]
    return x + m


def vit_frontend(params: Params, cfg: ViTConfig,
                 images: jnp.ndarray) -> jnp.ndarray:
    """Patch embed + position embed + prefix tokens (+ optional pre-norm):
    (B, H, W, 3) normalized pixels -> (B, num_prefix+num_patches, width).
    Shared by the per-backbone path and the joint-pair path (vit_joint.py)."""
    b = images.shape[0]
    x = linear(params["patch_embed"], patchify(images, cfg.patch_size))

    if cfg.pos_embed_patches_only:
        x = x + params["pos_embed"].astype(x.dtype)
        prefix = []
        if "cls_token" in params:
            prefix.append(jnp.broadcast_to(params["cls_token"][None],
                                           (b,) + params["cls_token"].shape))
        if "reg_token" in params:
            prefix.append(jnp.broadcast_to(params["reg_token"][None],
                                           (b,) + params["reg_token"].shape))
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1).astype(x.dtype)
    else:
        prefix = []
        if "cls_token" in params:
            prefix.append(jnp.broadcast_to(params["cls_token"][None],
                                           (b,) + params["cls_token"].shape))
        if "reg_token" in params:
            prefix.append(jnp.broadcast_to(params["reg_token"][None],
                                           (b,) + params["reg_token"].shape))
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1)
        x = x + params["pos_embed"].astype(x.dtype)

    if cfg.use_pre_norm:
        x = layer_norm(params["norm_pre"], x)
    return x


def vit_featurize(
    params: Params,
    cfg: ViTConfig,
    images: jnp.ndarray,
    film_params: Optional[Params] = None,
    language_embedding: Optional[jnp.ndarray] = None,
    unroll: int = 1,
    remat: bool = False,
    remat_policy: Optional[str] = None,
) -> jnp.ndarray:
    """(B, H, W, 3) normalized pixels -> (B, num_patches, width) features.

    Returns the *second-to-last* block's patch tokens (prefix stripped, no
    final norm) — the OpenVLA tap. With `film_params` + `language_embedding`
    (B, llm_dim), applies FiLM modulation in every block.

    remat: checkpoint each scanned block like the Llama body (llama_model).
    Training gradients flow through the ViT (LoRA targets its kernels), so
    without this every block's attention probs + MLP intermediates stay live
    for the backward — measured ~3.5 GB of HLO temps at batch 2 LIBERO
    geometry, the difference between fitting and OOMing one v5e chip.
    """
    b = images.shape[0]
    x = vit_frontend(params, cfg, images)

    # Precompute per-block FiLM (gamma, beta): (L, 2, B, width).
    film_all = None
    if film_params is not None and language_embedding is not None:
        le = language_embedding.astype(jnp.float32)
        gammas = jnp.einsum("bd,lde->lbe", le, film_params["scale"]["kernel"]) \
            + film_params["scale"]["bias"][:, None, :]
        betas = jnp.einsum("bd,lde->lbe", le, film_params["shift"]["kernel"]) \
            + film_params["shift"]["bias"][:, None, :]
        film_all = jnp.stack([gammas, betas], axis=1).astype(x.dtype)  # (L,2,B,D)

    # Run blocks 0 .. depth-2 (the last block's output is never used).
    n_run = cfg.depth - 1
    layers = jax.tree_util.tree_map(lambda a: a[:n_run], params["layers"])

    if film_all is None:
        def body(carry, lp):
            return _vit_block(lp, cfg, carry, None), None
        xs = layers
    else:
        def body(carry, inputs):
            lp, f = inputs
            return _vit_block(lp, cfg, carry, f), None
        xs = (layers, film_all[:n_run])

    if remat and remat_policy != "none":
        from openvla_oft_tpu.models.llama import resolve_remat_policy

        body = jax.checkpoint(body, prevent_cse=False,
                              policy=resolve_remat_policy(remat_policy))
    x, _ = jax.lax.scan(body, x, xs, unroll=unroll)

    return x[:, cfg.num_prefix_tokens:]
