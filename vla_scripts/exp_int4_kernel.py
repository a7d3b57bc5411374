"""Microbenchmark: int4 weight-streaming matmul variants at decode shapes.

The diffusion suffix loop / AR decode are HBM-bound on the per-step weight
stream (docs/PERFORMANCE.md roofline: int8 8.2 ms floor measured 12.5;
int4 halves the floor to ~4.1 ms but the XLA unpack path measured
258 ms/step). This experiment times one Llama-7B layer's worth of matmuls
(qkv fused 4096x(4096+2x1024... here plain 4096x12288 eq), gate_up
4096x22016, down 11008x4096) at suffix length T=112 across:

  int8-dyn   : ops/quant.py int8_linear (current serving headline)
  int4-xla   : ops/quant.py _int4_matmul_xla (unpack in XLA — known bad)
  int4-fused : ops/int4_matmul.py Pallas kernel
  bf16       : plain dot (reference dtype)

Run on the real chip:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:/root/.axon_site \
      python vla_scripts/exp_int4_kernel.py
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vla_scripts.bench_timing import measure

from openvla_oft_tpu.ops.quant import (_int4_matmul_xla, int8_linear,
                                       quantize_weight, quantize_weight_int4)
from openvla_oft_tpu.ops.int4_matmul import int4_matmul_fused

T = 112
SHAPES = [("qkv+o eq", 4096, 8192), ("gate_up", 4096, 22016),
          ("down", 11008, 4096)]


def main() -> None:
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    rows = {}
    for name, k_dim, n in SHAPES:
        w = jnp.asarray(rng.normal(size=(k_dim, n)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(T, k_dim)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        q8 = quantize_weight(w)
        q4 = quantize_weight_int4(w)
        wb = w.astype(jnp.bfloat16)
        # NOTE: a jnp.int4-dtype storage variant ("candidate A") was probed
        # and removed: passing an int4 array as a jit argument hits a fatal
        # device_put recursion in this JAX/PJRT stack, and lowering it as a
        # closure constant needs a device->host transfer the axon tunnel
        # reports UNIMPLEMENTED for. Packed-int8 bytes + the Pallas kernel
        # is the int4 storage story on TPU.

        # Weights are passed as explicit jit ARGUMENTS, never closure
        # captures: captured device arrays get lowered as MLIR constants,
        # which forces a device->host transfer that the axon tunnel cannot
        # do for jnp.int4 (UNIMPLEMENTED) and bloats every program.
        variants = {
            "bf16": ((lambda xx, ww: jnp.dot(
                xx, ww, preferred_element_type=jnp.float32)), (x, wb)),
            "int8-dyn": ((lambda xx, kq, sw: int8_linear(
                {"kernel": kq, "scale_w": sw}, xx)),
                (x, q8["kernel"], q8["scale_w"])),
            "int4-xla": ((lambda xx, kq, sw: _int4_matmul_xla(xx, kq, sw)),
                         (x, q4["kernel_q4"], q4["scale_w4"])),
            "int4-fused": ((lambda xx, kq, sw: int4_matmul_fused(xx, kq, sw)),
                           (x, q4["kernel_q4"], q4["scale_w4"])),
        }

        print(f"== {name}  ({k_dim} x {n}), T={T} ==")
        int4_bytes = k_dim * n // 2
        for vname, (fn, fargs) in variants.items():
            ms, _ = measure(fn, fargs, k=100, repeats=3,
                            label=f"{name}/{vname}")
            rows[(name, vname)] = ms
        print(f"   int4 DMA floor @819GB/s: "
              f"{int4_bytes / 819e9 * 1e3:.3f} ms")

    total_fused = sum(rows[(s, 'int4-fused')] for s, _, _ in SHAPES)
    total_int8 = sum(rows[(s, 'int8-dyn')] for s, _, _ in SHAPES)
    print(f"\nper-layer-ish totals: int4-fused {total_fused:.2f} ms "
          f"vs int8-dyn {total_int8:.2f} ms")


if __name__ == "__main__":
    main()
