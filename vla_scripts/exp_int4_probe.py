"""Probe WHERE the fused int4 kernel's time goes at decode shapes.

exp_int4_kernel.py showed the fused kernel at only ~25-37% of its halved DMA
floor (gate_up 0.15 ms vs 0.055 floor) — int4 wins per-matmul but nowhere
near the 2x the byte halving promises. Hypothesis: the per-tile VPU dequant
(int32 shifts + f32 scale muls + bf16 casts over every weight element)
outweighs the DMA saving — the kernel is VPU-bound, not HBM-bound.

Variants (timing-only probes marked WRONG-NUMBERS):
  fused        : ops/int4_matmul.py as shipped
  no-scale     : unpack but skip the group-scale multiply (WRONG-NUMBERS —
                 isolates the scale-mul + f32 cast cost)
  no-unpack    : w.astype(bf16) straight from packed bytes (WRONG-NUMBERS —
                 isolates ALL nibble-unpack cost; keeps DMA + MXU identical)
  group-dots   : CORRECT alternative — one MXU dot per scale group
                 (bk2 = whole block, gb small dots), scales applied to the
                 (bt, bn) OUTPUT instead of the (bk2, bn) weight tile:
                 gb*bt*bn VPU muls instead of ~7 ops x bk2*bn.
  stacked      : ops/int4_matmul.py stacked scalar-prefetch variant at L=32
                 (what the serving scan actually runs) per layer.
  int8 / bf16  : reference points.

Run: PYTHONPATH=/root/repo:/root/.axon_site python vla_scripts/exp_int4_probe.py
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vla_scripts.bench_timing import measure
from openvla_oft_tpu.ops.int4_matmul import (_pad_axis, int4_matmul_fused,
                                             int4_matmul_fused_a8,
                                             int4_matmul_fused_stacked)
from openvla_oft_tpu.ops.quant import (int8_linear, quantize_weight,
                                       quantize_weight_int4)

T = 112
SHAPES = [("qkv", 4096, 12288), ("gate_up", 4096, 22016),
          ("down", 11008, 4096)]


# === probe kernels (forward-only timing, no custom_vjp) =====================
def _kernel_probe(xe_ref, xo_ref, pk_ref, sc_ref, out_ref, *, g2: int,
                  mode: str):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dot_dtype = xe_ref.dtype
    if mode == "no-unpack":
        w8 = pk_ref[:]
        lo_f = w8.astype(dot_dtype)
        hi_f = w8.astype(dot_dtype)
        acc = jnp.dot(xe_ref[:], lo_f, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xo_ref[:], hi_f,
                            preferred_element_type=jnp.float32)
        out_ref[:] += acc
        return

    w = pk_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28)
    hi = jnp.right_shift(w, 4)
    bk2, bn = w.shape
    gb = bk2 // g2
    if mode == "no-scale":
        lo_f = lo.astype(dot_dtype)
        hi_f = hi.astype(dot_dtype)
        acc = jnp.dot(xe_ref[:], lo_f, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xo_ref[:], hi_f,
                            preferred_element_type=jnp.float32)
        out_ref[:] += acc
    elif mode == "group-dots":
        # one dot per scale group; scales hit the OUTPUT (bt, bn)
        sc = sc_ref[:]                                   # (gb, bn)
        lo_f = lo.astype(dot_dtype).reshape(gb, g2, bn)
        hi_f = hi.astype(dot_dtype).reshape(gb, g2, bn)
        bt = xe_ref.shape[0]
        acc = jnp.zeros((bt, bn), jnp.float32)
        for g in range(gb):
            part = jnp.dot(xe_ref[:, g * g2:(g + 1) * g2], lo_f[g],
                           preferred_element_type=jnp.float32)
            part = part + jnp.dot(xo_ref[:, g * g2:(g + 1) * g2], hi_f[g],
                                  preferred_element_type=jnp.float32)
            acc = acc + part * sc[g][None, :]
        out_ref[:] += acc
    else:
        raise ValueError(mode)


@functools.partial(jax.jit, static_argnames=("mode", "block_k2", "block_n"))
def _probe_call(x2, packed, scales, *, mode: str, block_k2=512, block_n=512):
    import math

    t, k_dim = x2.shape
    k2, n = packed.shape
    g_count = scales.shape[0]
    g2 = k2 // g_count
    unit = math.lcm(g2, 128)
    bk2 = max(unit, (min(block_k2, k2) // unit) * unit)
    bn = min(block_n, -(-n // 128) * 128)
    dot_dtype = jnp.bfloat16
    xe = _pad_axis(x2[:, 0::2].astype(dot_dtype), 1, bk2)
    xo = _pad_axis(x2[:, 1::2].astype(dot_dtype), 1, bk2)
    tp = max(16, -(-t // 16) * 16)
    bt = min(tp, 512)
    tp = -(-tp // bt) * bt
    xe = _pad_axis(xe, 0, tp)
    xo = _pad_axis(xo, 0, tp)
    pk = _pad_axis(_pad_axis(packed, 0, bk2), 1, bn)
    sc = _pad_axis(_pad_axis(scales, 0, bk2 // g2), 1, bn)
    k2p, np_ = pk.shape
    grid = (tp // bt, np_ // bn, k2p // bk2)
    gb = bk2 // g2
    out = pl.pallas_call(
        functools.partial(_kernel_probe, g2=g2, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk2), lambda ti, i, j: (ti, j)),
            pl.BlockSpec((bt, bk2), lambda ti, i, j: (ti, j)),
            pl.BlockSpec((bk2, bn), lambda ti, i, j: (j, i)),
            pl.BlockSpec((gb, bn), lambda ti, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda ti, i, j: (ti, i)),
        out_shape=jax.ShapeDtypeStruct((tp, np_), jnp.float32),
    )(xe, xo, pk, sc)
    return out[:t, :n]


def main() -> None:
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    totals: dict = {}
    for name, k_dim, n in SHAPES:
        w = jnp.asarray(rng.normal(size=(k_dim, n)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(T, k_dim)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        q8 = quantize_weight(w)
        q4 = quantize_weight_int4(w)
        del w
        floor = k_dim * n / 2 / 819e9 * 1e3
        print(f"== {name} ({k_dim}x{n}) T={T}  int4 DMA floor {floor:.3f} ms ==")
        variants = {
            "int8-dyn": ((lambda xx, kq, sw: int8_linear(
                {"kernel": kq, "scale_w": sw}, xx)),
                (x, q8["kernel"], q8["scale_w"])),
            "fused": ((lambda xx, kq, sw: int4_matmul_fused(xx, kq, sw)),
                      (x, q4["kernel_q4"], q4["scale_w4"])),
            "no-scale": ((lambda xx, kq, sw: _probe_call(
                xx, kq, sw, mode="no-scale")),
                (x, q4["kernel_q4"], q4["scale_w4"])),
            "no-unpack": ((lambda xx, kq, sw: _probe_call(
                xx, kq, sw, mode="no-unpack")),
                (x, q4["kernel_q4"], q4["scale_w4"])),
            "group-dots": ((lambda xx, kq, sw: _probe_call(
                xx, kq, sw, mode="group-dots")),
                (x, q4["kernel_q4"], q4["scale_w4"])),
            # W4A8 production kernel (int8 MXU dots, output group-scaling):
            # expected to clear the bf16-dot MXU floor that pins "fused".
            "a8-fused": ((lambda xx, kq, sw: int4_matmul_fused_a8(
                xx.astype(jnp.float32), kq, sw)),
                (x, q4["kernel_q4"], q4["scale_w4"])),
        }
        for vname, (fn, fargs) in variants.items():
            try:
                ms, _ = measure(fn, fargs, k=100, repeats=3,
                                label=f"{name}/{vname}")
                totals[vname] = totals.get(vname, 0.0) + ms
            except Exception as e:
                print(f"{name}/{vname} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")

    # correctness spot check for group-dots
    k_dim, n = 512, 256
    w = jnp.asarray(rng.normal(size=(k_dim, n)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.normal(size=(T, k_dim)), jnp.bfloat16)
    q4 = quantize_weight_int4(w)
    ref = np.asarray(int4_matmul_fused(x, q4["kernel_q4"], q4["scale_w4"]))
    got = np.asarray(_probe_call(x, q4["kernel_q4"], q4["scale_w4"],
                                 mode="group-dots"))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"group-dots correctness vs fused: rel-max-err {err:.2e}")

    # stacked variant at L=32 real shapes (layer 7, traced). Synthetic packed
    # bytes/scales (quantizing a real (32, K, N) fp32 stack would need 11 GB
    # of HBM transients; the kernel's timing only sees bytes).
    print("== stacked (L=32, the serving-scan path) per layer ==")
    for name, k_dim, n in SHAPES:
        group = 128
        kq = jnp.asarray(rng.integers(-128, 128, (32, k_dim // 2, n)),
                         jnp.int8)
        sw = jnp.asarray(rng.random((32, k_dim // group, n)) * 0.01,
                         jnp.float32)
        x = jnp.asarray(rng.normal(size=(T, k_dim)), jnp.bfloat16)
        ms, _ = measure(
            lambda xx, kqq, sww, li: int4_matmul_fused_stacked(
                xx, kqq, sww, li),
            (x, kq, sw, jnp.asarray(7)),
            k=100, repeats=3, label=f"{name}/stacked")
        del kq, sw
    print("\nper-layer totals (ms):",
          {k: round(v, 3) for k, v in totals.items()})


if __name__ == "__main__":
    main()
