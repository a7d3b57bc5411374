"""Per-op attention shoot-out: XLA dense vs our Pallas kernel vs the
JAX-bundled TPU flash kernel, at the OFT serving geometries.

Round 2/3 concluded XLA fused attention wins below ~1k tokens against three
in-repo kernel variants (docs/PERFORMANCE.md "Flash-attention kernel: formal
status"). This experiment adds the independent comparison VERDICT #4 implies:
the heavily-tuned kernel that ships inside JAX itself
(`jax.experimental.pallas.ops.tpu.flash_attention`), fed the same
block-bidirectional OFT mask (reference contract:
prismatic/extern/hf/modeling_prismatic.py:374-437 — causal everywhere,
bidirectional inside the action-slot window) via its additive-bias input.

Per-op numbers only — 32 layers' worth of (B=1, H=32, D=128) self-attention
timed back-to-back so the per-layer cost is resolvable above the tunnel RTT.

Usage: python vla_scripts/exp_bundled_flash.py [--s 618 1169] [--k 30]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

B, H, D = 1, 32, 128
LAYERS = 32


def _mask_vectors(s: int, chunk_rows: int, prompt_valid: int, bucket: int):
    """LIBERO/ALOHA serving layout: [BOS][patches][left-pad prompt][proprio]
    [action window]. key_valid kills the prompt left-pad; the bidir window
    covers the trailing action rows."""
    key_valid = np.ones((B, s), bool)
    patches = s - bucket - 2 - chunk_rows
    key_valid[:, 1 + patches:1 + patches + (bucket - prompt_valid)] = False
    bidir = np.zeros((B, s), bool)
    bidir[:, s - chunk_rows:] = True
    return jnp.asarray(key_valid), jnp.asarray(bidir), (s - chunk_rows, chunk_rows)


def _dense_mask(key_valid, bidir, s):
    causal = np.tril(np.ones((s, s), bool))
    bd = np.asarray(bidir)[0]
    win = bd[:, None] & bd[None, :]
    m = (causal | win)[None, None] & np.asarray(key_valid)[:, None, None, :]
    return jnp.asarray(m)


from vla_scripts.bench_timing import measure


def _time(fn, args, k, label):
    ms, _ = measure(fn, args, k)
    print(f"{label}: {ms:.2f} ms ({ms / LAYERS * 1e3:.1f} us/layer)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, nargs="+", default=[618, 1169])
    ap.add_argument("--k", type=int, default=30)
    args = ap.parse_args()

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as jax_flash,
    )

    from openvla_oft_tpu.ops.attention import attention_xla
    from openvla_oft_tpu.ops.flash_attention import flash_attention as our_flash

    for s in args.s:
        chunk_rows = 56 if s == 618 else 350
        key_valid, bidir, bidir_block = _mask_vectors(
            s, chunk_rows, prompt_valid=24, bucket=48)
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, s, H, D), jnp.bfloat16)
        kk = jax.random.normal(key, (B, s, H, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, s, H, D), jnp.bfloat16)
        print(f"== S={s} (chunk_rows={chunk_rows}) ==", flush=True)

        dense = _dense_mask(key_valid, bidir, s)

        def xla_path(q, kk, v):
            o = q
            for _ in range(LAYERS):
                o = attention_xla(o, kk, v, mask=dense)
            return o

        _time(xla_path, (q, kk, v), args.k, "xla-dense")

        def ours(q, kk, v):
            o = q
            for _ in range(LAYERS):
                o = our_flash(o, kk, v, is_causal=True, key_valid=key_valid,
                              bidir_mask=bidir, block_q=128)
            return o

        _time(ours, (q, kk, v), args.k, "ours-pallas bq=128")

        # Bundled kernel: (B, H, S, D) layout, S padded to a block multiple,
        # mask carried as an additive fp32 bias (the kernel has no
        # block-bidirectional mode; segment_ids can't express it).
        s_pad = (s + 127) // 128 * 128
        pad = s_pad - s
        neg = jnp.where(jnp.pad(dense, ((0, 0), (0, 0), (0, pad), (0, pad)))[
            :, 0:1], 0.0, -1e9).astype(jnp.float32)
        neg = jnp.broadcast_to(neg, (B, H, s_pad, s_pad))
        bs = BlockSizes(block_q=128, block_k_major=128, block_k=128, block_b=1)

        def bundled(qt, kt, vt, ab):
            o = qt
            for _ in range(LAYERS):
                o = jax_flash(o, kt, vt, ab=ab, causal=False,
                              sm_scale=D ** -0.5, block_sizes=bs)
            return o

        qt = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
        kt = jnp.pad(kk, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
        vt = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
        try:
            _time(bundled, (qt, kt, vt, neg), args.k,
                  f"jax-bundled flash (ab bias, pad->{s_pad})")
        except Exception as e:
            print(f"jax-bundled flash: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

        # Layout-only ceiling: bundled kernel WITHOUT the bias stream and
        # without our transposes in the timed region (pre-transposed inputs,
        # causal-only mask — semantically wrong for OFT, but bounds what any
        # (B,H,S,D) kernel could give once masks/layout were free).
        def bundled_causal(qt, kt, vt):
            o = qt
            for _ in range(LAYERS):
                o = jax_flash(o, kt, vt, causal=True, sm_scale=D ** -0.5,
                              block_sizes=bs)
            return o

        try:
            _time(bundled_causal, (qt, kt, vt), args.k,
                  "jax-bundled flash (causal-only ceiling)")
        except Exception as e:
            print(f"jax-bundled causal: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
