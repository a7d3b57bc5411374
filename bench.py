"""Headline benchmark: OpenVLA-7B-OFT action-chunk generation on one TPU chip.

Metric (BASELINE.md): action chunks/sec/chip + p50 chunk latency for the
LIBERO quickstart geometry (2 images x 224x224 dual-backbone + proprio, L1
head, 8x7 action chunk) — the reference's `predict_action` hot path
(`vla-scripts/extern/verify_openvla.py:71-85` is the timing harness analog).

Baseline: the OpenVLA-OFT paper reports ~0.109 s per 8-action chunk on an
NVIDIA A100 (arXiv 2502.19645; the repo stores no numbers — BASELINE.md).
vs_baseline = baseline_latency / our_p50 (>1 means faster than A100).

Prints ONE JSON line to stdout.
"""

import json
import os
import sys
import time

import numpy as np

A100_CHUNK_LATENCY_S = 0.109


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn)

    def sync(x):
        # The axon tunnel's block_until_ready is a no-op; a host transfer is
        # the only true synchronization point (~26 ms RTT, measured).
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    import jax.numpy as jnp

    # Warmup / compile (first remote compile can take minutes). Also warm the
    # tiny sync program so the RTT measurement below has no compile in it.
    sync(jfn(*args))
    sync(jfn(*args))
    sync(jnp.zeros(()))

    # Measure the tunnel RTT with empty round trips, then amortize K queued
    # executions behind one final sync.
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(jnp.zeros(()))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    k = 20
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = jfn(*args)
    sync(out)
    total = time.perf_counter() - t0
    per_call = max(total - rtt, 1e-9) / k
    chunks_per_sec = 1.0 / per_call

    print(json.dumps({
        "metric": "action_chunk_latency",
        "value": round(per_call, 5),
        "unit": "s",
        "vs_baseline": round(A100_CHUNK_LATENCY_S / per_call, 3),
    }))
    print(f"# chunks/sec/chip={chunks_per_sec:.2f} total={total:.3f}s over k={k} "
          f"rtt={rtt*1e3:.1f}ms device={jax.devices()[0]}", file=sys.stderr)


if __name__ == "__main__":
    main()
