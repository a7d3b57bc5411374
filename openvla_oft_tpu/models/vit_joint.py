"""Joint padded execution of the SigLIP+DINOv2 featurizer pair.

The reference runs its two timm backbones back-to-back per forward
(`prismatic/extern/hf/modeling_prismatic.py:186-227`); the round-2/3 TPU
profile shows why that shape is slow here: each backbone's GEMMs are
M-starved (M = 2 images x ~261 tokens = ~522 rows) and the pair sustains only
~55% MFU even fully unrolled, while a G=2 *batched* GEMM at the same shapes
runs ~7x faster than the two sequential GEMMs (vla_scripts/exp_vit_ablation.py).

This module rebuilds the pair as ONE batched-GEMM program over a group axis
G=2, padding every dimension up to the larger backbone:

  - width 1024 -> 1152 and mlp 4096 -> 4304 with zero rows/cols: the padded
    residual-stream dims stay exactly 0 through every block (all kernel
    columns/bias entries writing them are 0), so no masking is needed there;
  - head_dim 64 -> 72 with zero q/k/v slots: zero dims add nothing to q.k and
    the softmax scale difference (1/sqrt(64) vs the joint kernel's
    1/sqrt(72)) is folded into the q projection columns at build time;
  - tokens 256 -> 261 zero rows, masked out of attention as keys;
  - depth 23 -> 26 with all-zero "identity" layers: a zero-weight pre-norm
    block is exactly the identity (attention of q=k=0 over zero vs is 0, MLP
    of zero weights is 0, both residual adds are +0), so the shorter
    backbone's tap (output of its own layer 23) passes through unchanged;
  - per-group LayerNorm *standardization* (the affine is already folded into
    the following matmul by `fuse_vit_inference_weights`) uses each group's
    true width as the divisor and masks padded dims out of the variance, so
    the statistics are exactly the unpadded ones.

Build from float trees through `fuse_vit_inference_weights` (pre-quantized
or LoRA-carrying trees are rejected) — this is a serving-path layout:
  - bf16 serving: fold_norms=True trees (no affine keys in the joint tree);
  - int8 serving: fold_norms=False trees (LN affines stacked per group and
    applied after the grouped standardization), then `quantize_joint_vit` —
    the kernels and quantization grids are then IDENTICAL to the
    per-backbone int8 path, so the calibration evidence transfers.
Numerics match the sequential pair to fp-reassociation tolerance;
tests/test_vit_joint.py pins parity on a heterogeneous tiny pair (bf16 and
int8).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from openvla_oft_tpu.config import ViTConfig
from openvla_oft_tpu.models.vit import vit_frontend
from openvla_oft_tpu.ops.attention import attention
from openvla_oft_tpu.ops.layers import gelu, gelu_erf_fast, gelu_tanh, quick_gelu

Params = Dict[str, Any]

_ACTS = {"gelu": gelu, "gelu_tanh": gelu_tanh, "quick_gelu": quick_gelu,
         "gelu_erf_fast": gelu_erf_fast}


def _pad_to(a: jnp.ndarray, axis: int, target: int) -> jnp.ndarray:
    if a.shape[axis] == target:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, target - a.shape[axis])
    return jnp.pad(a, pad)


def build_joint_vit_pair(
    params_by_name: Dict[str, Params],
    cfgs: Sequence[ViTConfig],
    names: Sequence[str] = ("featurizer", "fused_featurizer"),
) -> Params:
    """Stack two FOLDED per-backbone ViT param trees into one joint tree.

    Returns {"front": [per-group front-end params], "layers": {...}} where
    every layer leaf has shape (Lj, G, ...) padded to the joint dims. The
    per-group front-ends (patch embed, pos embed, cls/reg tokens) are kept
    unpadded — they're <2% of the runtime and their semantics differ per
    group (timm no_embed_class vs standard).
    """
    assert len(names) == 2 and len(cfgs) == 2, "joint path is a pair design"
    nh = cfgs[0].num_heads
    assert all(c.num_heads == nh for c in cfgs), \
        "joint pair requires equal head counts"
    hdj = max(c.head_dim for c in cfgs)
    dj = max(c.width for c in cfgs)
    mlpj = max(c.mlp_dim for c in cfgs)
    lj = max(c.depth - 1 for c in cfgs)

    fronts: List[Params] = []
    stacked: Dict[str, List[jnp.ndarray]] = {
        "qkv_k": [], "qkv_b": [], "proj_k": [], "proj_b": [],
        "fc1_k": [], "fc1_b": [], "fc2_k": [], "fc2_b": []}
    # Norm affines stay UNFOLDED on the int8 serving path (folding scales
    # kernel rows and coarsens per-output-channel quant grids —
    # docs/QUANTIZATION.md); when present they are stacked and applied after
    # the grouped standardization. Both groups must agree (folded vs not).
    with_affine = ["scale" in params_by_name[n]["layers"]["norm1"]
                   for n in names]
    assert with_affine[0] == with_affine[1], \
        "joint pair needs both groups folded or both unfolded"
    affine: Dict[str, List[jnp.ndarray]] = {
        "n1_g": [], "n1_b": [], "n2_g": [], "n2_b": []}

    for name, cfg in zip(names, cfgs):
        p = params_by_name[name]
        lay = p["layers"]
        if "ls1" in lay or "ls2" in lay:
            raise ValueError("build_joint_vit_pair requires folded "
                             "LayerScale (fuse_vit_inference_weights first; "
                             "its LS fold is quantization-exact)")
        for sub in (lay["attn"]["qkv"], lay["attn"]["proj"],
                    lay["mlp"]["fc1"], lay["mlp"]["fc2"]):
            if "kernel" not in sub or sub["kernel"].dtype == jnp.int8 \
                    or any("lora" in k for k in sub):
                raise ValueError("joint pair is a bf16/fp32 serving layout "
                                 "(no quantized or LoRA-carrying kernels)")
        fronts.append({k: v for k, v in p.items() if k != "layers"})

        d, hd, mlp = cfg.width, cfg.head_dim, cfg.mlp_dim
        # Only blocks [0, depth-1) run (the tap never reads the last block,
        # same as vit_featurize); slice before padding.
        n_run = cfg.depth - 1
        f32 = jnp.float32

        # qkv: (L, d, 3d) -> per-head slots (L, d, 3, nh, hd) so each head's
        # dims land in the first `hd` of its padded `hdj` slot; the joint
        # attention divides by sqrt(hdj), so scale q columns by
        # sqrt(hdj/hd) to restore this group's 1/sqrt(hd).
        qk = lay["attn"]["qkv"]["kernel"][:n_run]
        qb = lay["attn"]["qkv"]["bias"][:n_run]
        qk = qk.reshape(n_run, d, 3, nh, hd)
        qb = qb.reshape(n_run, 3, nh, hd)
        if hd != hdj:
            # Scale in f32 and round ONCE per element: casting the scalar
            # sqrt(hdj/hd) to bf16 first (e.g. 1.060660 -> 1.0625) would bias
            # every attention logit by the same +0.17% instead of unbiased
            # per-element rounding.
            adj = (hdj / hd) ** 0.5
            qk = qk.at[:, :, 0].set(
                (qk[:, :, 0].astype(f32) * adj).astype(qk.dtype))
            qb = qb.at[:, 0].set(
                (qb[:, 0].astype(f32) * adj).astype(qb.dtype))
            qk = _pad_to(qk, 4, hdj)
            qb = _pad_to(qb, 3, hdj)
        qk = _pad_to(_pad_to(qk, 1, dj), 0, lj).reshape(lj, dj, 3 * nh * hdj)
        qb = _pad_to(qb, 0, lj).reshape(lj, 3 * nh * hdj)

        # proj: (L, d, d) input side is (nh, hd) flattened -> pad per head.
        pk = lay["attn"]["proj"]["kernel"][:n_run].reshape(n_run, nh, hd, d)
        pk = _pad_to(_pad_to(_pad_to(pk, 2, hdj), 3, dj), 0, lj)
        pk = pk.reshape(lj, nh * hdj, dj)
        pb = _pad_to(_pad_to(lay["attn"]["proj"]["bias"][:n_run], 1, dj),
                     0, lj)

        f1k = _pad_to(_pad_to(_pad_to(
            lay["mlp"]["fc1"]["kernel"][:n_run], 1, dj), 2, mlpj), 0, lj)
        f1b = _pad_to(_pad_to(lay["mlp"]["fc1"]["bias"][:n_run], 1, mlpj),
                      0, lj)
        f2k = _pad_to(_pad_to(_pad_to(
            lay["mlp"]["fc2"]["kernel"][:n_run], 1, mlpj), 2, dj), 0, lj)
        f2b = _pad_to(_pad_to(lay["mlp"]["fc2"]["bias"][:n_run], 1, dj),
                      0, lj)

        for key, val in (("qkv_k", qk), ("qkv_b", qb), ("proj_k", pk),
                         ("proj_b", pb), ("fc1_k", f1k), ("fc1_b", f1b),
                         ("fc2_k", f2k), ("fc2_b", f2b)):
            stacked[key].append(val)

        if with_affine[0]:
            # Zero padding everywhere: padded feature dims AND identity
            # layers get gamma=beta=0, so the affine output is exactly 0
            # there — h=0 through zero kernels keeps the identity argument.
            for key, src, sub in (("n1_g", "norm1", "scale"),
                                  ("n1_b", "norm1", "bias"),
                                  ("n2_g", "norm2", "scale"),
                                  ("n2_b", "norm2", "bias")):
                v = lay[src][sub][:n_run]
                affine[key].append(_pad_to(_pad_to(v, 1, dj), 0, lj))

    layers = {k: jnp.stack(v, axis=1) for k, v in stacked.items()}  # (Lj,G,..)
    if with_affine[0]:
        layers.update({k: jnp.stack(v, axis=1) for k, v in affine.items()})
    return {"front": fronts, "layers": layers}


def quantize_joint_vit(joint: Params) -> Params:
    """int8-quantize the four joint kernel stacks (per layer, group, and
    output channel — `ops/quant.py::quantize_weight` semantics over the
    (Lj, G, d_in, d_out) leaves). Zero-padded columns quantize to zeros with
    scale 0, preserving the padding invariants. Biases/affines stay float.

    Build the joint tree from `fuse_vit_inference_weights(fold_norms=False)`
    outputs so the quantization grids match the per-backbone int8 path
    (LN affines unfolded, LayerScale folded)."""
    from openvla_oft_tpu.ops.quant import quantize_weight

    layers = dict(joint["layers"])
    for key in ("qkv_k", "proj_k", "fc1_k", "fc2_k"):
        q = quantize_weight(layers[key])
        layers[key] = q["kernel"]
        layers[key[:-2] + "_s"] = q["scale_w"]
    return {"front": joint["front"], "layers": layers}


def _int8_einsum_g(h: jnp.ndarray, kq: jnp.ndarray,
                   sw: jnp.ndarray) -> jnp.ndarray:
    """Grouped int8 MXU matmul: h (G, M, d) float, kq (G, d, o) int8,
    sw (G, o) f32 -> (G, M, o) f32. Dynamic per-token activation quant,
    int8 x int8 -> int32 dot with G as a batch dim, rank-1 scale dequant
    (same math as ops/quant.py::_int8_matmul; serving-only, no vjp)."""
    hf = h.astype(jnp.float32)
    sx = jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0
    qx = jnp.clip(jnp.round(hf / jnp.maximum(sx, 1e-12)), -127, 127
                  ).astype(jnp.int8)
    acc = jax.lax.dot_general(qx, kq, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw[:, None, :]


def _standardize_grouped(x: jnp.ndarray, vd: jnp.ndarray, dmask: jnp.ndarray,
                         eps: float = 1e-6) -> jnp.ndarray:
    """Per-group LayerNorm standardization over a zero-padded feature axis.

    x: (G, M, Dj) with padded dims exactly 0; vd: (G, 1, 1) true widths;
    dmask: (G, 1, Dj) 1.0 on valid dims. Padded entries of the result are
    masked back to exactly 0 — they only ever multiply zero kernel rows in
    bf16, but the int8 path's per-token absmax must not see them."""
    xf = x.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / vd
    cent = (xf - mean) * dmask
    var = jnp.sum(cent * cent, axis=-1, keepdims=True) / vd
    return (cent * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def vit_pair_featurize_joint(
    joint: Params,
    cfgs: Sequence[ViTConfig],
    images_by_group: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, ...]:
    """Run both backbones as one G=2 batched program.

    images_by_group[g]: (B, H, W, 3) pixels normalized for backbone g.
    Returns one (B, num_patches, width_g) feature tap per group (the
    second-to-last-block patch tokens, same contract as `vit_featurize`).
    """
    g_n = len(cfgs)
    nh = cfgs[0].num_heads
    hdj = max(c.head_dim for c in cfgs)
    dj = max(c.width for c in cfgs)
    lj = max(c.depth - 1 for c in cfgs)

    fronts = [vit_frontend(joint["front"][g], cfgs[g], images_by_group[g])
              for g in range(g_n)]
    b = fronts[0].shape[0]
    m_g = [f.shape[1] for f in fronts]
    mj = max(m_g)
    x = jnp.stack([_pad_to(_pad_to(f, 1, mj), 2, dj) for f in fronts])
    x = x.reshape(g_n, b * mj, dj)

    vd = jnp.asarray([c.width for c in cfgs], jnp.float32)[:, None, None]
    dmask = (jnp.arange(dj)[None, None, :]
             < jnp.asarray([c.width for c in cfgs])[:, None, None]
             ).astype(jnp.float32)
    key_mask = None
    if min(m_g) != mj:
        kv = jnp.arange(mj)[None, :] < jnp.asarray(m_g)[:, None]  # (G, Mj)
        key_mask = jnp.broadcast_to(kv[:, None, None, None, :],
                                    (g_n, b, 1, 1, mj)
                                    ).reshape(g_n * b, 1, 1, mj)

    acts = [c.act for c in cfgs]

    def body(x, lp):
        int8 = lp["qkv_k"].dtype == jnp.int8

        def mm(h, key, bias):
            if int8:
                y = _int8_einsum_g(h, lp[key], lp[key[:-2] + "_s"]) \
                    + bias.astype(jnp.float32)[:, None]
                return y.astype(x.dtype)   # bias in f32, like int8_linear
            return jnp.einsum("gmd,gdo->gmo", h, lp[key]) + bias[:, None]

        def norm(z, which):
            h = _standardize_grouped(z, vd, dmask)
            if f"{which}_g" in lp:   # unfolded-affine (int8 serving) layout
                h = h * lp[f"{which}_g"][:, None] + lp[f"{which}_b"][:, None]
            return h

        qkv = mm(norm(x, "n1"), "qkv_k", lp["qkv_b"])
        qkv = qkv.reshape(g_n, b, mj, 3, nh, hdj)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        q = q.reshape(g_n * b, mj, nh, hdj)
        k = k.reshape(g_n * b, mj, nh, hdj)
        v = v.reshape(g_n * b, mj, nh, hdj)
        o = attention(q, k, v, mask=key_mask)
        o = o.reshape(g_n, b * mj, nh * hdj)
        x = x + mm(o, "proj_k", lp["proj_b"])
        mlp = mm(norm(x, "n2"), "fc1_k", lp["fc1_b"])
        if acts[0] == acts[1]:
            mlp = _ACTS[acts[0]](mlp)
        else:
            mlp = jnp.concatenate(
                [_ACTS[a](mlp[g:g + 1]) for g, a in enumerate(acts)], axis=0)
        return x + mm(mlp, "fc2_k", lp["fc2_b"]), None

    # Fully unrolled: the scanned form costs ~55% extra latency at serving
    # shapes (vla_scripts/exp_vit_ablation.py; same finding as the
    # per-backbone path, models/vision_backbone.py).
    x, _ = jax.lax.scan(body, x, joint["layers"], unroll=lj)

    x = x.reshape(g_n, b, mj, dj)
    outs = []
    for g, cfg in enumerate(cfgs):
        pre = cfg.num_prefix_tokens
        outs.append(x[g, :, pre:pre + cfg.num_patches, :cfg.width])
    return tuple(outs)
