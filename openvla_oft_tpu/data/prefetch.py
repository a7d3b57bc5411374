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


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident batches.

    `sharding`: a jax Sharding applied to every array in the batch (e.g.
    NamedSharding(mesh, P(("dp", "fsdp")))). `depth` buffers are in flight.
    """

    def __init__(self, batches: Iterator, sharding=None, depth: int = 2,
                 drop_keys: tuple = ("dataset_name",)):
        self._source = batches
        self._sharding = sharding
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._drop = set(drop_keys)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._source:
                batch = {k: v for k, v in batch.items() if k not in self._drop}
                if self._sharding is not None:
                    batch = {k: jax.device_put(v, self._sharding)
                             for k, v in batch.items()}
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                self._queue.put(batch)
        except BaseException as e:  # propagate into the consumer
            self._error = e
        finally:
            self._queue.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item
