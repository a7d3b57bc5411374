"""Round-3 follow-up: where does the joint ViT-pair program spend its time?

The G=2 batched-GEMM joint program (models/vit_joint.py) bought only ~1.5 ms
full-bench (59.8 -> 58.3 ms) although the batched GEMM stack measures ~7x
faster than sequential GEMMs (exp_vit_ablation.py). This script brackets the
remaining joint-program cost by toggling one stage at a time at flagship
serving shapes: grouped-LN standardization, attention (+key masking),
GELU, and the front-ends. The winner dictates the next optimization.

Usage: JAX_PLATFORMS=axon python vla_scripts/exp_vit_joint_profile.py [--k 30]
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
    print(f"{label:52s} {ms:8.2f} ms", flush=True)
    return ms


def _joint_ablated(joint, cfgs, images_by_group, *, ln=True, attn=True,
                   act=True, front=True):
    """vit_pair_featurize_joint with per-stage toggles (same math when all
    toggles are on — mirrors models/vit_joint.py)."""
    from openvla_oft_tpu.models.vit import vit_frontend
    from openvla_oft_tpu.models.vit_joint import _pad_to, _standardize_grouped
    from openvla_oft_tpu.ops.attention import attention
    from openvla_oft_tpu.ops.layers import gelu, gelu_tanh, quick_gelu

    acts_map = {"gelu": gelu, "gelu_tanh": gelu_tanh, "quick_gelu": quick_gelu}
    g_n = len(cfgs)
    nh = cfgs[0].num_heads
    hdj = max(c.head_dim for c in cfgs)
    dj = max(c.width for c in cfgs)
    lj = max(c.depth - 1 for c in cfgs)

    if front:
        fronts = [vit_frontend(joint["front"][g], cfgs[g], images_by_group[g])
                  for g in range(g_n)]
    else:
        fronts = [jnp.zeros((images_by_group[g].shape[0],
                             cfgs[g].num_prefix_tokens + cfgs[g].num_patches,
                             cfgs[g].width), images_by_group[g].dtype)
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
        kv = jnp.arange(mj)[None, :] < jnp.asarray(m_g)[:, None]
        key_mask = jnp.broadcast_to(kv[:, None, None, None, :],
                                    (g_n, b, 1, 1, mj)
                                    ).reshape(g_n * b, 1, 1, mj)
    acts = [c.act for c in cfgs]

    def body(x, lp):
        h = _standardize_grouped(x, vd, dmask) if ln else x
        qkv = jnp.einsum("gmd,gdo->gmo", h, lp["qkv_k"]) + lp["qkv_b"][:, None]
        qkv = qkv.reshape(g_n, b, mj, 3, nh, hdj)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        if attn:
            q = q.reshape(g_n * b, mj, nh, hdj)
            k = k.reshape(g_n * b, mj, nh, hdj)
            v = v.reshape(g_n * b, mj, nh, hdj)
            o = attention(q, k, v, mask=key_mask)
            o = o.reshape(g_n, b * mj, nh * hdj)
        else:
            o = v.reshape(g_n, b * mj, nh * hdj)
        x = x + jnp.einsum("gmi,gio->gmo", o, lp["proj_k"]) \
            + lp["proj_b"][:, None]
        h = _standardize_grouped(x, vd, dmask) if ln else x
        mlp = jnp.einsum("gmd,gdo->gmo", h, lp["fc1_k"]) + lp["fc1_b"][:, None]
        if act:
            if acts[0] == acts[1]:
                mlp = acts_map[acts[0]](mlp)
            else:
                mlp = jnp.concatenate(
                    [acts_map[a](mlp[g:g + 1]) for g, a in enumerate(acts)],
                    axis=0)
        return x + jnp.einsum("gmd,gdo->gmo", mlp, lp["fc2_k"]) \
            + lp["fc2_b"][:, None], None

    x, _ = jax.lax.scan(body, x, joint["layers"], unroll=lj)
    x = x.reshape(g_n, b, mj, dj)
    return tuple(x[g, :, cfgs[g].num_prefix_tokens:
                   cfgs[g].num_prefix_tokens + cfgs[g].num_patches,
                   :cfgs[g].width] for g in range(g_n))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=30)
    args = ap.parse_args()

    from __graft_entry__ import _cheap_params, _flagship_cfg
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.vit_joint import vit_pair_featurize_joint
    from openvla_oft_tpu.models.vision_backbone import vision_backbone_forward

    cfg = _flagship_cfg()
    params = _cheap_params(cfg, LIBERO)           # joint layout (bf16)
    joint = params["vision_backbone"]["joint"]
    cfgs = cfg.vision_configs
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.normal(0, 1, (2, c.image_size, c.image_size, 3)),
                        jnp.bfloat16) for c in cfgs]

    full = _measure(lambda j, a, b_: vit_pair_featurize_joint(j, cfgs, [a, b_]),
                    (joint, *imgs), args.k, "joint FULL")
    _measure(lambda j, a, b_: _joint_ablated(j, cfgs, [a, b_]),
             (joint, *imgs), args.k, "joint ablation-harness FULL (sanity)")
    no_ln = _measure(lambda j, a, b_: _joint_ablated(j, cfgs, [a, b_], ln=False),
                     (joint, *imgs), args.k, "joint no-LN")
    no_at = _measure(lambda j, a, b_: _joint_ablated(j, cfgs, [a, b_],
                                                     attn=False),
                     (joint, *imgs), args.k, "joint no-attn")
    no_ac = _measure(lambda j, a, b_: _joint_ablated(j, cfgs, [a, b_],
                                                     act=False),
                     (joint, *imgs), args.k, "joint no-GELU")
    no_fr = _measure(lambda j, a, b_: _joint_ablated(j, cfgs, [a, b_],
                                                     front=False),
                     (joint, *imgs), args.k, "joint no-frontend")
    _measure(lambda j, a, b_: _joint_ablated(j, cfgs, [a, b_], ln=False,
                                             attn=False, act=False),
             (joint, *imgs), args.k, "joint matmul-only")

    # Sequential folded pair for reference (per-backbone layout).
    import os
    os.environ["OPENVLA_VIT_JOINT"] = "0"
    seq_params = _cheap_params(cfg, LIBERO)["vision_backbone"]
    os.environ.pop("OPENVLA_VIT_JOINT", None)
    h = cfgs[0].image_size
    pix = jnp.stack(imgs, axis=1).reshape(1, 2, 2, h, h, 3)

    def seq(p, px):
        return vision_backbone_forward(p, cfg, px, unroll="full")

    _measure(seq, (seq_params, pix), args.k, "sequential folded pair (ref)")

    print(f"\nderived: LN={full - no_ln:.2f} attn={full - no_at:.2f} "
          f"GELU={full - no_ac:.2f} frontend={full - no_fr:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
