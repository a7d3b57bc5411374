"""Round-3 experiment: why does QLoRA train-step MFU drop at batch 2?

Round-2 measurement (docs/PERFORMANCE.md): b=1 167 ms (~50% MFU) but
b=2 390 ms (~43%) — sub-linear scaling in the configuration that matters
for real single-chip runs. Suspects to localize:
  - remat scope: the checkpointed Llama body recomputes the forward in the
    backward; if XLA spills at b=2 the recompute collides with HBM pressure;
  - donated-buffer layout: the optimizer update aliasing;
  - per-token dynamic activation quant (ops/quant.py): linear in b, but its
    layout (reduce over the last axis) may fuse differently at b=2;
  - attention backward at S~609.

Measures the jitted `train_step` at b in {1, 2, 4} on the real chip and
(optionally, --trace) captures an XProf trace per batch size.

Usage: JAX_PLATFORMS=axon python vla_scripts/exp_qlora_scaling.py [--trace]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _build_state_shapes(cfg, platform, tcfg, bits=8):
    from openvla_oft_tpu.ops.quant import quantize_tree
    from openvla_oft_tpu.policy import init_openvla_params
    from openvla_oft_tpu.training.lora import init_lora
    from openvla_oft_tpu.training.train_step import create_train_state

    def build():
        full = init_openvla_params(jax.random.PRNGKey(0), cfg, platform,
                                   dtype=jnp.bfloat16, head="l1")
        base = {k: full[k] for k in ("llm", "vision_backbone", "projector")}
        trainables = {"lora": init_lora(jax.random.PRNGKey(1), base,
                                        rank=tcfg.lora_rank),
                      "action_head": full["action_head"],
                      "proprio_projector": full["proprio_projector"]}
        for k in base:
            base[k] = quantize_tree(base[k], min_dim=1024, bits=bits)
        return create_train_state(base, trainables, tcfg, jax.random.PRNGKey(2))

    shapes = jax.eval_shape(build)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _batch(b, s, cfg, platform):
    rng = np.random.default_rng(0)
    ids = np.full((b, s), 5, np.int32)
    ids[:, 0] = 1
    labels = np.full((b, s), -100, np.int32)
    labels[:, -(platform.chunk_len + 1):] = 31800
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(
            rng.normal(0, 1, (b, cfg.num_images_in_input, 2, 224, 224, 3)),
            jnp.bfloat16),
        "actions": jnp.asarray(
            rng.normal(0, 0.5, (b, platform.num_actions_chunk,
                                platform.action_dim)), jnp.float32),
        "proprio": jnp.asarray(rng.normal(0, 1, (b, platform.proprio_dim)),
                               jnp.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--remat", nargs="+", default=["all"],
                    choices=["all", "dots", "attn_out", "none"],
                    help="remat policies to sweep (train_step.TrainConfig)")
    ap.add_argument("--bits", type=int, default=8, choices=[8, 4],
                    help="frozen-base quantization (8=int8 MXU, 4=packed)")
    ap.add_argument("--platform", default="libero",
                    choices=["libero", "aloha"],
                    help="aloha = 3 cameras + FiLM, multimodal S≈1169 — the "
                         "geometry where the flash kernel should win")
    ap.add_argument("--flash", nargs="+", default=["false"],
                    choices=["auto", "true", "false"],
                    help="use_flash settings to sweep (VERDICT r4 #2: "
                         "measure fwd+bwd flash vs XLA at ALOHA geometry)")
    args = ap.parse_args()

    import dataclasses

    from __graft_entry__ import _flagship_cfg
    from openvla_oft_tpu.constants import ALOHA, LIBERO
    from openvla_oft_tpu.training.train_step import (TrainConfig,
                                                     make_optimizer,
                                                     train_step)

    cfg = _flagship_cfg()
    platform = LIBERO
    if args.platform == "aloha":
        platform = ALOHA
        cfg = dataclasses.replace(cfg, num_images_in_input=3, use_film=True)

    # Text bucket ≈ prompt(~26) + chunk*action_dim action placeholders +
    # stop, padded to a multiple of 8 (the real collator's layout):
    # LIBERO 26+56+1 -> 88; ALOHA 26+350+1 -> 384. Multimodal S =
    # bucket + 256*num_images + 1 proprio => LIBERO ≈601, ALOHA ≈1153
    # (the serving path's S≈618/1169 with its larger prompt bucket).
    s_text = 88 if args.platform == "libero" else 384

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))

    flash_settings = [{"true": True, "false": False}.get(f, "auto")
                      for f in args.flash]

    for policy in args.remat:
      for use_flash in flash_settings:
        tcfg = TrainConfig(objective="l1", lora_rank=32, lora_alpha=16.0,
                           learning_rate=5e-4, remat_policy=policy)
        tx = make_optimizer(tcfg)

        step = jax.jit(
            lambda st, bt: train_step(st, bt, cfg, platform, tcfg, tx=tx,
                                      use_flash=use_flash),
            donate_argnums=(0,))

        for b in args.batches:
            # step() DONATES the state, so it must be rebuilt per (policy, b)
            # — reusing one state across batch sizes would hit deleted
            # buffers on the second iteration and after any OOM.
            state = _build_state_shapes(cfg, platform, tcfg, bits=args.bits)
            batch = _batch(b, s_text, cfg, platform)
            t0 = time.perf_counter()
            try:
                st2, m = step(state, batch)
                sync(m)
            except Exception as e:  # OOM at this (policy, b) — report, move on
                print(f"remat={policy} bits={args.bits} flash={use_flash} "
                      f"b={b}: FAILED "
                      f"({type(e).__name__}: {str(e)[:400]}\n"
                      f"  ...tail: {str(e)[-1800:]})", flush=True)
                del batch, state
                continue
            compile_s = time.perf_counter() - t0
            # steady state: chain K steps, one final sync; subtract RTT
            st2, m = step(st2, batch)
            sync(m)
            rtts = []
            for _ in range(3):
                t0 = time.perf_counter()
                sync(jnp.zeros(()))
                rtts.append(time.perf_counter() - t0)
            rtt = float(np.median(rtts))
            t0 = time.perf_counter()
            for _ in range(args.k):
                st2, m = step(st2, batch)
            sync(m)
            ms = (time.perf_counter() - t0 - rtt) / args.k * 1e3
            # FLOP factor per policy: 'all' recomputes the forward in the
            # backward (fwd 2N + recompute 2N + dgrad 4N ~ 8N/token, the
            # round-2 convention); 'dots'/'none' skip the recompute (~6N).
            # ms/step is the decision metric; MFU is the sanity column.
            # 'attn_out' still recomputes the MLPs (~the FLOP bulk): call it 8.
            factor = 8 if policy in ("all", "attn_out") else 6
            n_par = 6.9e9
            # multimodal rows: text bucket + 256*num_images patches +
            # proprio token (training layout; LIBERO 577, ALOHA 833 —
            # labels/action positions live inside the text bucket)
            toks = b * (s_text + 256 * cfg.num_images_in_input + 1)
            mfu = factor * n_par * toks / (ms / 1e3) / 394e12
            print(f"remat={policy} bits={args.bits} flash={use_flash} "
                  f"b={b}: {ms:8.1f} ms/step  "
                  f"compile {compile_s:5.1f}s  tok/s {toks / (ms / 1e3):7.0f}  "
                  f"MFU~{mfu * 100:4.1f}%", flush=True)
            del st2, m, batch

            if args.trace:
                from openvla_oft_tpu.utils.profiling import trace

                batch = _batch(b, s_text, cfg, platform)
                stt = _build_state_shapes(cfg, platform, tcfg, bits=args.bits)
                with trace(f"/tmp/qlora_trace_{policy}_b{b}"):
                    stt, m = step(stt, batch)
                    sync(m)
                print(f"trace written to /tmp/qlora_trace_{policy}_b{b}",
                      flush=True)
                del stt, m, batch


if __name__ == "__main__":
    main()
