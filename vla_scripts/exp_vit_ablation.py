"""ViT latency ablation (round 3): localize the 35-40% MFU gap.

The serving-path ViT pair (DINOv2-L + SigLIP so400m at 224px, 2 images)
measures ~10.7 ms vs a ~5.2 ms pure-matmul bound (docs/PERFORMANCE.md).
This script toggles one suspect at a time on the REAL folded serving
weights (zeros — latency only) so the next optimization targets the part
that actually costs. Suspects: LN standardization, attention math,
GELU, scan-boundary fusion (unroll), M-starvation (batch scaling),
and the batched-GEMM joint-pair idea.

Usage: python vla_scripts/exp_vit_ablation.py [--k 30]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


from vla_scripts.bench_timing import measure


def _measure(fn, args, k, label):
    ms, _ = measure(fn, args, k)
    print(f"{label:44s} {ms:8.2f} ms", flush=True)
    return ms


def _ablated_featurize(params, cfg, images, *, ln=True, attn=True, act=True,
                       unroll=1):
    """vit_featurize with per-stage toggles (folded weights: norms are
    standardize-only, LayerScale already folded into proj/fc2)."""
    from openvla_oft_tpu.models.vit import patchify
    from openvla_oft_tpu.ops.layers import gelu, gelu_tanh, layer_norm, linear

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
    if not cfg.pos_embed_patches_only:
        x = x + params["pos_embed"].astype(x.dtype)

    nh, hd = cfg.num_heads, cfg.head_dim
    d = cfg.width

    def block(p, x):
        s = x.shape[1]
        h = layer_norm(p["norm1"], x) if ln else x
        qkv = linear(p["attn"]["qkv"], h).reshape(b, s, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if attn:
            from openvla_oft_tpu.ops.attention import attention
            o = attention(q, k, v).reshape(b, s, d)
        else:
            o = v.reshape(b, s, d)
        x = x + linear(p["attn"]["proj"], o)
        h = layer_norm(p["norm2"], x) if ln else x
        m = linear(p["mlp"]["fc1"], h)
        if act:
            m = gelu_tanh(m) if cfg.act == "gelu_tanh" else gelu(m)
        return x + linear(p["mlp"]["fc2"], m)

    n_run = cfg.depth - 1
    layers = jax.tree_util.tree_map(lambda a: a[:n_run], params["layers"])
    x, _ = jax.lax.scan(lambda c, lp: (block(lp, c), None), x, layers,
                        unroll=unroll)
    return x[:, cfg.num_prefix_tokens:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=30)
    args = ap.parse_args()

    from __graft_entry__ import _cheap_params, _flagship_cfg
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.vit import vit_featurize

    cfg = _flagship_cfg()
    params = _cheap_params(cfg, LIBERO, modules=("vision_backbone",))
    rng = np.random.default_rng(0)

    names = ("featurizer", "fused_featurizer")
    for name, vcfg in zip(names, cfg.vision_configs):
        p = params["vision_backbone"][name]
        imgs = jnp.asarray(rng.normal(0, 1, (2, 224, 224, 3)), jnp.bfloat16)
        tag = f"{name[:4]} {vcfg.width}x{vcfg.depth - 1}"
        base = _measure(lambda pp, x, vc=vcfg: vit_featurize(pp, vc, x),
                        (p, imgs), args.k, f"{tag} BASE (scan u=1)")
        _measure(lambda pp, x, vc=vcfg: vit_featurize(pp, vc, x, unroll=4),
                 (p, imgs), args.k, f"{tag} unroll=4")
        _measure(lambda pp, x, vc=vcfg: vit_featurize(pp, vc, x,
                                                      unroll=vc.depth - 1),
                 (p, imgs), args.k, f"{tag} unroll=FULL")
        # Toggles at BOTH scan and the serving (fully-unrolled) baseline —
        # the stage that dominates can differ once XLA schedules across
        # block boundaries.
        for u, un in ((1, "scan"), (vcfg.depth - 1, "UNROLLED")):
            _measure(lambda pp, x, vc=vcfg, uu=u: _ablated_featurize(
                pp, vc, x, ln=False, unroll=uu),
                     (p, imgs), args.k, f"{tag} no-LN {un}")
            _measure(lambda pp, x, vc=vcfg, uu=u: _ablated_featurize(
                pp, vc, x, attn=False, unroll=uu),
                     (p, imgs), args.k, f"{tag} no-attn {un}")
            _measure(lambda pp, x, vc=vcfg, uu=u: _ablated_featurize(
                pp, vc, x, act=False, unroll=uu),
                     (p, imgs), args.k, f"{tag} no-GELU {un}")
            _measure(lambda pp, x, vc=vcfg, uu=u: _ablated_featurize(
                pp, vc, x, ln=False, attn=False, act=False, unroll=uu),
                     (p, imgs), args.k, f"{tag} matmul-only {un}")
        big = jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.bfloat16)
        b8 = _measure(lambda pp, x, vc=vcfg: vit_featurize(pp, vc, x),
                      (p, big), args.k, f"{tag} BASE batch=8")
        print(f"{tag}: batch8/batch2 ratio {b8 / base:.2f} "
              f"(4.00 = M-independent MFU)", flush=True)

    # Batched-GEMM joint-pair estimate: one (2, M, D)@(2, D, N) einsum vs two
    # sequential matmuls at the real per-model shapes.
    wj = jnp.zeros((2, 1152, 3456), jnp.bfloat16)
    xj = jnp.zeros((2, 528, 1152), jnp.bfloat16)
    _measure(lambda x, w: jnp.einsum("gmd,gdn->gmn", x, w), (xj, wj),
             args.k, "joint batched GEMM (2,528,1152)@(.,3456)")
    wa = jnp.zeros((1024, 3072), jnp.bfloat16)
    xa = jnp.zeros((522, 1024), jnp.bfloat16)
    wb = jnp.zeros((1152, 3456), jnp.bfloat16)
    xb = jnp.zeros((512, 1152), jnp.bfloat16)
    _measure(lambda xa, wa, xb, wb: (xa @ wa, xb @ wb), (xa, wa, xb, wb),
             args.k, "two sequential GEMMs (real shapes)")


if __name__ == "__main__":
    main()
