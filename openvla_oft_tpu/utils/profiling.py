"""Profiling and step-timing utilities (SURVEY.md §5.1).

The reference has only ad-hoc wall-clock prints (verify_openvla.py:83-85,
metrics step-time deques); here tracing is first-class: `trace()` wraps a
region in a `jax.profiler` trace (viewable in TensorBoard/XProf/Perfetto),
`annotate()` names compiled regions, and `StepTimer` produces p50/p90 stats
with the axon-tunnel caveat handled (host-sync timing, amortized batches).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for compiled regions (shows up in XProf)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def host_sync(x) -> float:
    """True device synchronization via host transfer — `block_until_ready`
    is a no-op through the axon tunnel (see bench.py)."""
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


class StepTimer:
    """Wall-clock step statistics with percentile summary."""

    def __init__(self, window: int = 200):
        self.times: List[float] = []
        self.window = window
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self.times = self.times[-self.window:]
        self._t0 = None
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {"p50": float(np.percentile(arr, 50)),
                "p90": float(np.percentile(arr, 90)),
                "mean": float(arr.mean()),
                "steps_per_sec": float(1.0 / max(arr.mean(), 1e-9))}
