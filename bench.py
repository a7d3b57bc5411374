"""Headline benchmark: OpenVLA-7B-OFT action-chunk generation on one TPU chip.

Metric (BASELINE.md): action chunks/sec/chip + chunk latency for the LIBERO
quickstart geometry (2 images x 224x224 dual-backbone + proprio, L1 head,
8x7 action chunk) — the reference's `predict_action` hot path (the timing
harness analog of `vla-scripts/extern/verify_openvla.py:71-85`).

Baseline: the OpenVLA-OFT paper reports ~0.109 s per 8-action chunk on an
NVIDIA A100 (arXiv 2502.19645; the repo stores no numbers — BASELINE.md).
vs_baseline = baseline_latency / our_latency (>1 means faster than A100).

Prints ONE JSON line to stdout for the PERFORMANCE serving configuration:
int8 weights + dynamic per-token activations on the MXU, with fused
wqkv/gate_up projections. The accuracy evidence for serving int8 (stage-wise
drift + end-to-end action-L1 deltas vs the discrete-bin and train-loss
floors, plus the real-weights re-check runbook) is docs/QUANTIZATION.md; the
bf16 numerics-parity path is measured every run and reported on stderr
(OPENVLA_BENCH_BF16=1 makes it the headline instead).

Timing method: the axon tunnel's `block_until_ready` is a no-op and each
host sync costs ~26 ms RTT, so we queue K executions behind one final host
transfer and subtract the measured RTT.
"""

import gc
import json
import os
import sys
import time

import numpy as np

# Baseline denominator provenance (printed every run so the vs_baseline ratio
# is auditable): the OpenVLA-OFT paper (arXiv 2502.19645, Table 2 / §5.1
# "~26x faster action generation") reports 0.109 s per 8-action chunk for
# OFT (parallel decoding + L1 head, continuous actions) on an NVIDIA A100-40GB
# at LIBERO geometry. The reference REPO stores no numbers — its timing
# harness (`vla-scripts/extern/verify_openvla.py:71-85`) prints latencies but
# persists nothing, and BASELINE.md marks paper numbers "to be re-measured,
# never assumed". Until someone re-runs the reference on an A100, every
# vs_baseline below inherits this paper-sourced denominator; the measured
# TPU latencies (the `value` field) stand on their own either way.
A100_CHUNK_LATENCY_S = 0.109
A100_BASELINE_PROVENANCE = (
    "A100 denominator 0.109 s/chunk: OpenVLA-OFT paper (arXiv 2502.19645), "
    "A100-40GB, LIBERO geometry, parallel decoding + L1 head; paper-reported, "
    "not re-measured (reference repo stores no benchmark numbers)")
K = 20


def _measure(make_entry):
    import jax
    import jax.numpy as jnp

    fn, args = make_entry()
    jfn = jax.jit(fn)

    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))

    sync(jfn(*args))
    sync(jfn(*args))
    sync(jnp.zeros(()))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(jnp.zeros(()))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    t0 = time.perf_counter()
    out = None
    for _ in range(K):
        out = jfn(*args)
    sync(out)
    total = time.perf_counter() - t0
    per_call = max(total - rtt, 1e-9) / K
    del jfn, args, out
    gc.collect()
    return per_call, rtt


def _measure_with_retry(make_entry, attempts=3, wait_s=30.0):
    """The axon tunnel occasionally reports a transient RESOURCE_EXHAUSTED
    right after another TPU process exits (its server-side allocations clear
    a few seconds later). Retry before giving up so one stale allocation
    can't sink the whole benchmark."""
    for i in range(attempts):
        try:
            return _measure(make_entry)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or i == attempts - 1:
                raise
            print(f"# transient device OOM (attempt {i + 1}/{attempts}), "
                  f"retrying in {wait_s:.0f}s", file=sys.stderr)
            gc.collect()
            time.sleep(wait_s)


def main():
    import jax

    from __graft_entry__ import entry

    # Ad-hoc single-config measurement (e.g. OPENVLA_BENCH_QUANT=int8_vit for
    # the mixed int8-vision/bf16-LLM point). The driver never sets this; the
    # default two-config flow below is the contract.
    forced = os.environ.get("OPENVLA_BENCH_QUANT")
    if forced:
        # Only configs entry() actually implements — anything else would
        # silently measure an unquantized, joint-ViT-disabled model while
        # labeling the output with the forced name.
        valid = ("bf16", "int8", "int8_vit", "int4")
        if forced not in valid:
            sys.exit(f"OPENVLA_BENCH_QUANT={forced!r}: expected one of "
                     f"{valid} (bf16 = the headline full-precision config, "
                     f"joint ViT pair included)")
        if forced == "bf16":
            os.environ.pop("OPENVLA_QUANT", None)
        else:
            os.environ["OPENVLA_QUANT"] = forced
        print(f"# {A100_BASELINE_PROVENANCE}", file=sys.stderr)
        lat, rtt = _measure_with_retry(entry)
        print(f"# {forced}: {lat*1e3:.1f}ms {1/lat:.1f} chunks/s/chip "
              f"vs_baseline={A100_CHUNK_LATENCY_S/lat:.2f} rtt={rtt*1e3:.1f}ms",
              file=sys.stderr)
        print(json.dumps({"metric": "action_chunk_latency", "value": round(lat, 5),
                          "unit": "s",
                          "vs_baseline": round(A100_CHUNK_LATENCY_S / lat, 3)}))
        return

    print(f"# {A100_BASELINE_PROVENANCE}", file=sys.stderr)
    os.environ.pop("OPENVLA_QUANT", None)
    bf16_lat, rtt = _measure_with_retry(entry)
    print(f"# bf16: {bf16_lat*1e3:.1f}ms {1/bf16_lat:.1f} chunks/s/chip "
          f"vs_baseline={A100_CHUNK_LATENCY_S/bf16_lat:.2f} "
          f"rtt={rtt*1e3:.1f}ms device={jax.devices()[0]}", file=sys.stderr)

    headline = bf16_lat
    if os.environ.get("OPENVLA_BENCH_BF16") != "1":
        try:
            os.environ["OPENVLA_QUANT"] = "int8"
            int8_lat, _ = _measure_with_retry(entry)
            print(f"# int8: {int8_lat*1e3:.1f}ms {1/int8_lat:.1f} "
                  f"chunks/s/chip "
                  f"vs_baseline={A100_CHUNK_LATENCY_S/int8_lat:.2f}",
                  file=sys.stderr)
            headline = int8_lat
        except Exception as e:  # fall back to the bf16 headline
            print(f"# int8 measurement failed, bf16 headline: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)

    if os.environ.get("OPENVLA_BENCH_EXTRA") == "1":
        _extra_rows()

    print(json.dumps({
        "metric": "action_chunk_latency",
        "value": round(headline, 5),
        "unit": "s",
        "vs_baseline": round(A100_CHUNK_LATENCY_S / headline, 3),
    }))


def _extra_rows():
    """Opt-in (OPENVLA_BENCH_EXTRA=1) regression rows for the non-headline
    geometries docs/PERFORMANCE.md publishes: ALOHA serve (3 cams, FiLM,
    flash-auto) and the diffusion-head prefix-KV loop. Each row runs in its
    own subprocess so it gets the whole HBM and a clean compile cache; rows
    print to stderr — the stdout contract stays ONE JSON line."""
    import subprocess

    gc.collect()
    repo = os.path.dirname(os.path.abspath(__file__))

    def run(label, cmd, env_extra=None, pattern=None):
        env = dict(os.environ)
        env.pop("OPENVLA_BENCH_EXTRA", None)  # no recursion
        env.update(env_extra or {})
        try:
            r = subprocess.run(cmd, cwd=repo, env=env, capture_output=True,
                               text=True, timeout=2400)
            lines = [ln for ln in (r.stdout + r.stderr).splitlines()
                     if ln.strip() and (pattern is None or pattern in ln)]
            tail = lines[-1] if lines else f"exit={r.returncode}, no output"
            print(f"# extra[{label}]: {tail}", file=sys.stderr)
        except Exception as e:
            print(f"# extra[{label}] failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    py = sys.executable
    run("aloha_bf16", [py, "bench.py"],
        {"OPENVLA_BENCH_GEOMETRY": "aloha", "OPENVLA_BENCH_QUANT": "bf16"},
        pattern="# bf16:")
    run("aloha_int8", [py, "bench.py"],
        {"OPENVLA_BENCH_GEOMETRY": "aloha", "OPENVLA_BENCH_QUANT": "int8"},
        pattern="# int8:")
    run("diffusion_int8",
        [py, "vla_scripts/bench_diffusion.py", "--quant", "int8", "--k", "4"],
        pattern="diffusion[")
    run("diffusion_int4a8",
        [py, "vla_scripts/bench_diffusion.py", "--quant", "int4a8",
         "--k", "4"],
        pattern="diffusion[")


if __name__ == "__main__":
    main()
