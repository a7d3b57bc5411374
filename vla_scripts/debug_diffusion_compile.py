"""Isolate where the int8 diffusion program's TPU compile time goes.

The bf16 prefix-KV diffusion program compiles in ~48 s; the int8 variant ran
>20 min and died (round-3 log). This script AOT-lowers and compiles each unit
separately (prefix prefill / one suffix step / N-step scan) and prints wall
times, so the pathological unit is identifiable.

Usage: python vla_scripts/debug_diffusion_compile.py [--quant int8] [--steps 5]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int8", choices=["none", "int8"])
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from vla_scripts.bench_diffusion import _params
    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.action_heads import (
        diffusion_predict_noise, diffusion_scheduler, sinusoidal_time_encoding)
    from openvla_oft_tpu.models.prismatic import (
        build_diffusion_prefix, diffusion_suffix_step)

    cfg = OpenVLAConfig(vision_backbone_id="dinosiglip-vit-so-224px",
                        llm_backbone_id="llama2-7b-pure", num_images_in_input=2)
    platform = LIBERO
    params = _params(cfg, platform,
                     quant=None if args.quant == "none" else args.quant)
    bucket = 48
    ids = jnp.zeros((1, bucket), jnp.int32).at[0, -24:].set(
        jnp.concatenate([jnp.asarray([1]), jnp.full((22,), 100),
                         jnp.asarray([29871])]))
    mask = jnp.zeros((1, bucket), jnp.int32).at[0, -24:].set(1)
    pixels = jnp.zeros((1, 2, 2, 224, 224, 3), jnp.bfloat16)
    proprio = jnp.zeros((1, platform.proprio_dim), jnp.float32)

    def timed(label, fn, *a):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*a)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        print(f"{label:28s} lower {t1-t0:6.1f}s  compile {t2-t1:7.1f}s",
              flush=True)
        return compiled

    timed("prefix (ViT+prefill)", lambda p: build_diffusion_prefix(
        p, cfg, ids, mask, pixels, proprio), params)

    prefix = build_diffusion_prefix(params, cfg, ids, mask, pixels, proprio)
    x0 = jnp.zeros((1, platform.num_actions_chunk, platform.action_dim),
                   jnp.float32)
    t_emb = sinusoidal_time_encoding(jnp.asarray([7]), cfg.llm_dim)[:, None, :]
    timed("one suffix step", lambda p, pre, t, x: diffusion_suffix_step(
        p, cfg, platform, pre, t, x), params, prefix, t_emb, x0)

    sched = diffusion_scheduler(50)
    ts = jnp.asarray(sched.timesteps(args.steps))

    def loop(p, pre, x):
        def body(x_t, t):
            te = sinusoidal_time_encoding(
                jnp.broadcast_to(t[None], (1,)), cfg.llm_dim)[:, None, :]
            h = diffusion_suffix_step(p, cfg, platform, pre, te, x_t)
            eps = diffusion_predict_noise(p["action_head"],
                                          h.astype(jnp.float32), platform)
            return sched.step(eps, t, x_t, args.steps), None

        out, _ = jax.lax.scan(body, x, ts)
        return out

    timed(f"{args.steps}-step scan", loop, params, prefix, x0)


if __name__ == "__main__":
    main()
