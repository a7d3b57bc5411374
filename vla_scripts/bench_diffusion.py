"""Diffusion-head chunk latency on one TPU chip: prefix-KV vs full-prefill.

The reference's `_run_diffusion_prediction` (modeling_prismatic.py:793-877)
reruns a full Llama prefill per DDIM step. Round 2 compiled all 50 steps into
one `lax.scan` (2.57 s/chunk); round 3 additionally caches the static
[BOS][patches][proprio] prefix K/V once and scans only the
[t][prompt][actions][STOP] suffix rows (models/prismatic.py DiffusionPrefix).

Usage: python vla_scripts/bench_diffusion.py [--old] [--steps N]
"""

import argparse
import gc
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _params(cfg, platform, quant=None, static_scales=False):
    from openvla_oft_tpu.models.llama import fuse_inference_weights
    from openvla_oft_tpu.policy import init_openvla_params

    def build():
        params = init_openvla_params(jax.random.PRNGKey(0), cfg, platform,
                                     dtype=jnp.bfloat16, head="diffusion",
                                     with_lm_head=False,
                                     head_dtype=jnp.bfloat16)
        # norm folds only in full precision (docs/QUANTIZATION.md) — keep the
        # benched config identical to the serving one
        params["llm"] = fuse_inference_weights(params["llm"],
                                               fold_norms=quant is None)
        if quant in ("int8", "int4"):
            from openvla_oft_tpu.ops.quant import quantize_tree

            for mod in ("llm", "vision_backbone", "projector"):
                params[mod] = quantize_tree(params[mod], min_dim=1024,
                                            bits=4 if quant == "int4" else 8)
        if static_scales:
            # Placeholder scales: timing-equivalent to the calibrated attach
            # (ops/quant_calibrate.py::attach_static_act_scales) — flips every
            # int8 LLM matmul from per-token absmax quant to one fused
            # mul+round+clip pass.
            from openvla_oft_tpu.ops.quant_calibrate import (
                attach_placeholder_act_scales,
            )

            params["llm"] = attach_placeholder_act_scales(params["llm"])
        return params

    shapes = jax.eval_shape(build)
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", action="store_true",
                    help="full-prefill-per-step path (round-2 baseline)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--quant", default=None, choices=[None, "int8", "int4", "int4a8"])
    ap.add_argument("--static", action="store_true",
                    help="static int8 activation scales (placeholder values;"
                         " timing-equivalent to the calibrated attach)")
    ap.add_argument("--platform", default="libero",
                    choices=["libero", "aloha"])
    ap.add_argument("--film", default=None, choices=["on", "off"],
                    help="FiLM vision modulation. Default: on for aloha "
                         "(the cited OFT+ recipe trains with --use_film True,"
                         " ALOHA.md:66), off for libero.")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    if args.quant == "int4a8":
        # W4A8: same int4 packing, a8 fused kernels (ops/int4_matmul.py)
        import os as _os
        _os.environ["OPENVLA_INT4_A8"] = "1"
        args.quant = "int4"

    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import ALOHA, LIBERO
    from openvla_oft_tpu.policy import OpenVLAPolicy

    # ALOHA recipe: 3 camera views, 25x14 chunk, FiLM on (ALOHA.md:59-84,
    # OFT+ --use_film True); LIBERO: 2 views, no FiLM.
    platform = ALOHA if args.platform == "aloha" else LIBERO
    use_film = ((args.platform == "aloha") if args.film is None
                else args.film == "on")
    cfg = OpenVLAConfig(vision_backbone_id="dinosiglip-vit-so-224px",
                        llm_backbone_id="llama2-7b-pure",
                        num_images_in_input=3 if args.platform == "aloha" else 2,
                        use_film=use_film)
    params = _params(cfg, platform, quant=args.quant,
                     static_scales=args.static)
    policy = OpenVLAPolicy(cfg=cfg, platform=platform, params=params,
                           head="diffusion", prompt_bucket=48,
                           num_diffusion_steps=args.steps,
                           diffusion_prefix_kv=not args.old)

    bucket = 48
    ids = jnp.zeros((1, bucket), jnp.int32).at[0, -24:].set(
        jnp.concatenate([jnp.asarray([1]), jnp.full((22,), 100),
                         jnp.asarray([29871])]))
    mask = jnp.zeros((1, bucket), jnp.int32).at[0, -24:].set(1)
    pixels = jnp.zeros((1, cfg.num_images_in_input, 2, 224, 224, 3),
                       jnp.bfloat16)
    proprio = jnp.zeros((1, platform.proprio_dim), jnp.float32)
    key = jax.random.PRNGKey(0)

    def run():
        a, _ = policy._predict_jit(params, ids, mask, pixels, proprio,
                                   noise_key=key)
        return a

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    t0 = time.perf_counter()
    sync(run())
    print(f"# compile+1st: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    sync(run())
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(jnp.zeros(()))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    t0 = time.perf_counter()
    out = None
    for _ in range(args.k):
        out = run()
    sync(out)
    per_call = (time.perf_counter() - t0 - rtt) / args.k
    gc.collect()
    mode = ("full-prefill" if args.old else "prefix-kv") \
        + (f"+{args.quant}" if args.quant else "") \
        + ("+static" if args.static else "") \
        + ("+film" if use_film else "")
    print(f"diffusion[{mode}] steps={args.steps}: {per_call*1e3:.1f} ms/chunk "
          f"({per_call/args.steps*1e3:.2f} ms/step, rtt={rtt*1e3:.1f}ms)")


if __name__ == "__main__":
    main()
