"""Double-buffered host->device prefetch.

The training loop's `jax.device_put(batch)` is synchronous on the host; this
loader assembles and transfers the next batches on a background thread while
the device executes the current step, hiding host latency (the role tf.data's
prefetch-to-device plays in the reference pipeline, rlds/dataset.py:585-589).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident batches.

    `sharding`: a jax Sharding applied to every array in the batch (e.g.
    NamedSharding(mesh, P(("dp", "fsdp")))). `depth` buffers are in flight.

    Multi-process: when the sharding spans >1 JAX process, each process's
    iterator yields its PROCESS-LOCAL slice of the global batch (the data
    pipeline shards episode files per process) and batches are assembled
    into global arrays via `jax.make_array_from_process_local_data` — the
    SPMD analog of the reference's one-DataLoader-per-DDP-rank feeding
    (reference finetune.py:796-798). Override with `process_local=False`
    if the iterator yields full global batches on every process.
    """

    def __init__(self, batches: Iterator, sharding=None, depth: int = 2,
                 drop_keys: tuple = ("dataset_name",),
                 process_local: Optional[bool] = None):
        self._source = batches
        self._sharding = sharding
        if process_local is None:
            try:
                process_local = sharding is not None and jax.process_count() > 1
            except Exception:
                process_local = False
        self._process_local = bool(process_local)
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._drop = set(drop_keys)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put that notices close(): returns False when stopping."""
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        try:
            for batch in self._source:
                if self._stop.is_set():
                    return
                batch = {k: v for k, v in batch.items() if k not in self._drop}
                if self._process_local:
                    batch = {k: jax.make_array_from_process_local_data(
                        self._sharding, np.asarray(v))
                        for k, v in batch.items()}
                elif self._sharding is not None:
                    batch = {k: jax.device_put(v, self._sharding)
                             for k, v in batch.items()}
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                if not self._put(batch):
                    return
        except BaseException as e:  # propagate into the consumer
            self._error = e
        finally:
            self._put(self._done)

    def close(self) -> None:
        """Stop the worker and release buffered device batches.

        Without this, a consumer that breaks early (preemption!) leaves the
        worker parked in queue.put() holding `depth` device-resident batches
        pinned in HBM exactly when the checkpoint save needs the memory."""
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item
