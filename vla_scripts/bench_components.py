"""Component-level latency breakdown on one TPU chip (LIBERO geometry).

Times each serving-path stage as its own queued-execution measurement:
device preprocessing, each ViT backbone (folded and unfolded), projector,
Llama prefill, and the full fused `serve_action_chunk`. Guides the bf16
optimization work (docs/PERFORMANCE.md component split).

Usage: python vla_scripts/bench_components.py [--quant int8] [--k 20]
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
    return measure(fn, args, k, label=label)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default=None, choices=[None, "int8"])
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--skip_full", action="store_true")
    ap.add_argument("--flash", action="store_true",
                    help="also time the Pallas flash prefill at block_q 128/256")
    args = ap.parse_args()

    import os

    from __graft_entry__ import _cheap_params, _flagship_cfg, entry
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.llama import llama_model
    from openvla_oft_tpu.models.projector import vision_projector
    from openvla_oft_tpu.models.vit import vit_featurize
    from openvla_oft_tpu.models.vit_joint import (build_joint_vit_pair,
                                                  vit_pair_featurize_joint)
    from openvla_oft_tpu.processing.image_processing import device_preprocess

    import gc

    cfg = _flagship_cfg()
    platform = LIBERO
    rng = np.random.default_rng(0)

    frames = jnp.asarray(rng.integers(0, 255, (2, 256, 256, 3)), jnp.uint8)
    _measure(lambda f: device_preprocess(cfg, f), (frames,), args.k,
             "preprocess (2 frames 256->224)")

    # Phase 1 — vision only (the 13.5 GB LLM zeros must NOT be resident
    # while the joint pair builds its padded copy of the ViT stacks).
    # Per-backbone tree: the bf16 default builds the joint-pair tree, which
    # has no per-backbone entries.
    saved_joint = os.environ.get("OPENVLA_VIT_JOINT")
    os.environ["OPENVLA_VIT_JOINT"] = "0"
    vis = _cheap_params(cfg, platform, quant=args.quant,
                        modules=("vision_backbone",))
    if saved_joint is None:
        os.environ.pop("OPENVLA_VIT_JOINT")
    else:
        os.environ["OPENVLA_VIT_JOINT"] = saved_joint

    names = ("featurizer", "fused_featurizer")
    imgs = jnp.asarray(rng.normal(0, 1, (2, 224, 224, 3)), jnp.bfloat16)
    for name, vcfg in zip(names, cfg.vision_configs):
        for unroll, tag in ((1, "scan"), (vcfg.depth - 1, "unrolled")):
            _measure(lambda p, x, vc=vcfg, u=unroll:
                     vit_featurize(p, vc, x, unroll=u),
                     (vis["vision_backbone"][name], imgs), args.k,
                     f"vit {name} {tag} ({vcfg.width}x{vcfg.depth - 1})")
    if args.quant is None:
        # The bf16 serving default: both backbones as one G=2 batched program.
        joint = build_joint_vit_pair(vis["vision_backbone"],
                                     cfg.vision_configs)
        _measure(lambda j, x: vit_pair_featurize_joint(
                     j, cfg.vision_configs, [x, x]),
                 (joint, imgs), args.k, "vit JOINT pair (G=2 batched)")
        del joint
    del vis
    gc.collect()

    # Phase 2 — projector + LLM.
    params = _cheap_params(cfg, platform, quant=args.quant,
                           modules=("projector", "llm"))
    feats = jnp.asarray(rng.normal(0, 1, (1, 512, cfg.vision_dim)),
                        jnp.bfloat16)
    _measure(lambda p, f: vision_projector(p, f),
             (params["projector"], feats), args.k, "projector (512x2176)")

    s = 48 + 512 + 1 + platform.chunk_len + 1
    embeds = jnp.asarray(rng.normal(0, 1, (1, s, cfg.llm_dim)), jnp.bfloat16)
    bidir = jnp.zeros((1, s), bool).at[:, -(platform.chunk_len + 1):].set(True)
    _measure(lambda p, e: llama_model(p, cfg.llm, e, bidir_mask=bidir),
             (params["llm"], embeds), args.k, f"llama prefill (S={s})")
    _measure(lambda p, e: llama_model(
                 p, cfg.llm, e, bidir_mask=bidir,
                 out_window=(s - platform.chunk_len - 1, platform.chunk_len)),
             (params["llm"], embeds), args.k,
             f"llama prefill out_window (S={s})")
    if args.flash:
        for bq in (128, 256):
            os.environ["OPENVLA_FLASH_BLOCK_Q"] = str(bq)
            _measure(lambda p, e: llama_model(p, cfg.llm, e, bidir_mask=bidir,
                                              use_flash=True),
                     (params["llm"], embeds), args.k,
                     f"llama prefill FLASH bq={bq} (S={s})")
        os.environ.pop("OPENVLA_FLASH_BLOCK_Q", None)

    if not args.skip_full:
        # entry() builds its own param tree — free this one first or the two
        # 13.5 GB copies cannot coexist in HBM.
        del params, embeds, feats
        gc.collect()
        if args.quant:
            os.environ["OPENVLA_QUANT"] = args.quant
        fn, eargs = entry()
        _measure(fn, eargs, args.k, "FULL serve_action_chunk")


if __name__ == "__main__":
    main()
