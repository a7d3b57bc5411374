"""Autoregressive discrete-decode latency on one TPU chip — the base-OpenVLA
path (reference `prismatic/models/vlas/openvla.py:36-103`: HF `generate` of
ACTION_DIM greedy tokens), measured so the OFT parallel-decoding speedup can
be stated from our own numbers rather than the paper's A100 ratio
(arXiv 2502.19645 reports ~26x on A100; BASELINE.md).

Geometries:
  - base-OpenVLA single action: 1 image, greedy decode of 7 action tokens
  - chunked-AR strawman: same prefill, 56 tokens (what an 8x7 chunk would
    cost WITHOUT parallel decoding)
The comparison row is the OFT parallel-decode chunk from bench.py /
docs/PERFORMANCE.md (everything in one prefill).

Usage: python vla_scripts/bench_ar.py [--k 8]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _params(cfg, platform, quant=None):
    from openvla_oft_tpu.models.llama import fuse_inference_weights
    from openvla_oft_tpu.policy import init_openvla_params

    def build():
        params = init_openvla_params(jax.random.PRNGKey(0), cfg, platform,
                                     dtype=jnp.bfloat16, head=None,
                                     with_lm_head=True)
        # norm folds only in full precision (docs/QUANTIZATION.md)
        params["llm"] = fuse_inference_weights(params["llm"],
                                               fold_norms=quant is None)
        if quant in ("int8", "int4"):
            from openvla_oft_tpu.ops.quant import quantize_tree

            bits = 4 if quant == "int4" else 8
            # int4: LLM only — the per-token decode loop is the weight-
            # stream-bound part; vision/projector run once at prefill.
            mods = ("llm",) if quant == "int4" else (
                "llm", "vision_backbone", "projector")
            for mod in mods:
                params[mod] = quantize_tree(params[mod], min_dim=1024,
                                            bits=bits)
        return params

    shapes = jax.eval_shape(build)
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  shapes)


from vla_scripts.bench_timing import measure as _measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--quant", default=None, choices=[None, "int8", "int4", "int4a8"])
    args = ap.parse_args()
    if args.quant == "int4a8":
        # W4A8: same int4 packing, a8 fused kernels (ops/int4_matmul.py)
        import os as _os
        _os.environ["OPENVLA_INT4_A8"] = "1"
        args.quant = "int4"

    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.prismatic import predict_action_autoregressive

    # Base OpenVLA: single image, discrete tokens, one 7-D action per query.
    cfg = OpenVLAConfig(vision_backbone_id="dinosiglip-vit-so-224px",
                        llm_backbone_id="llama2-7b-pure",
                        num_images_in_input=1)
    platform = LIBERO
    params = _params(cfg, platform, quant=args.quant)

    bucket = 48
    ids = np.zeros((1, bucket), np.int32)
    ids[0, -24:] = [1] + [100] * 22 + [29871]
    mask = np.zeros((1, bucket), np.int32)
    mask[0, -24:] = 1
    pixels = jnp.zeros((1, 1, 2, 224, 224, 3), jnp.bfloat16)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    for label, n_new in (("base-openvla 1 action (7 tokens)", 7),
                         ("chunked-AR strawman 8x7 (56 tokens)", 56)):
        def fn(p, i, m, px, n=n_new):
            return predict_action_autoregressive(p, cfg, platform, i, m, px,
                                                 num_new_tokens=n)

        ms, comp = _measure(fn, (params, ids, mask, pixels), args.k)
        print(f"{label}[{args.quant or 'bf16'}]: {ms:.1f} ms "
              f"(compile {comp:.0f}s, {ms / n_new:.2f} ms/token)", flush=True)

    print("# compare: OFT parallel-decode 8x7 chunk (2 images) = one "
          "prefill; bf16 58.3 ms / int8 35.2 ms (docs/PERFORMANCE.md)",
          flush=True)


if __name__ == "__main__":
    main()
