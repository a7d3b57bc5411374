"""Shared device-timing harness for the vla_scripts benchmarks.

The axon tunnel's `block_until_ready` is a no-op and one host sync costs a
~26-30 ms RTT, so naive per-call timing would measure mostly tunnel. Method
(docs/PERFORMANCE.md "Measurement method"): queue k executions behind ONE
final host transfer and subtract the median measured RTT of an empty sync.
Per-dispatch overhead is ~0.03 ms (measured), so the amortized figure is
true device time. All latency scripts (bench_components, bench_ar,
exp_unroll, exp_vit_ablation, exp_vit_joint_profile, exp_bundled_flash)
share this one implementation so methodology fixes land everywhere at once.
"""

from __future__ import annotations

import gc
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    """Force one host round trip through the first leaf of `x`."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))


def measure(fn, args, k: int = 20, label: Optional[str] = None,
            rtt_samples: int = 5, repeats: int = 1) -> Tuple[float, float]:
    """JIT `fn`, run it twice warm, then time k queued executions minus the
    tunnel RTT. Returns (ms_per_call, compile_seconds); prints a
    `label  ...ms` line when `label` is given.

    `repeats` re-times the whole k-call loop that many times and keeps the
    MINIMUM — the right statistic against the tunnel's additive RTT jitter,
    which at sub-ms per-call figures can otherwise swing results 3-5x."""
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jfn(*args))
    compile_s = time.perf_counter() - t0
    sync(jfn(*args))  # second warm call: donation/layout settling
    rtts = []
    for _ in range(rtt_samples):
        t0 = time.perf_counter()
        sync(jnp.zeros(()))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    best = float("inf")
    for _ in range(max(1, repeats)):
        gc.collect()  # keep a GC pause out of the timed loop
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = jfn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / k * 1e3)
    ms = best
    if label is not None:
        print(f"{label:36s} {ms:8.2f} ms")
    return ms, compile_s
