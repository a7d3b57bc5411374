"""Length-grouped batching (reference `prismatic/util/batching_utils.py:23-212`
`SplitModalitySampler`: groups examples by modality and length so padded
batches waste minimal compute).

TPU variant: XLA recompiles per padded bucket, so the sampler both groups by
length AND snaps each batch to a small set of fixed buckets — the best of the
reference's length-grouping with a bounded number of compiled programs.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np


class LengthGroupedBatcher:
    """Buffers examples, emits batches of similar sequence length.

    Each emitted batch is padded to the smallest bucket that fits; with
    `buckets=(64, 96, 128)` at most 3 train-step programs are compiled.
    """

    def __init__(self, batch_size: int, buckets: Sequence[int] = (64, 96, 128),
                 buffer_batches: int = 16, seed: int = 0):
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        self.buffer_size = batch_size * buffer_batches
        self.rng = np.random.default_rng(seed)

    def _bucket(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        raise ValueError(f"sequence length {length} exceeds largest bucket "
                         f"{self.buckets[-1]}")

    def __call__(self, dataset) -> Iterator[tuple]:
        """Yields (bucket_len, [examples]) groups."""
        pools: Dict[int, List] = {b: [] for b in self.buckets}
        n_buffered = 0
        for ex in dataset:
            b = self._bucket(len(ex["input_ids"]))
            pools[b].append(ex)
            n_buffered += 1
            if len(pools[b]) == self.batch_size:
                yield b, pools[b]
                n_buffered -= self.batch_size
                pools[b] = []
            elif n_buffered >= self.buffer_size:
                # flush the fullest pool to bound memory — as a SHORT batch
                # when it holds < batch_size items (the old code removed the
                # items but yielded nothing, silently dropping them and
                # leaving n_buffered permanently over the cap)
                fullest = max(pools, key=lambda k: len(pools[k]))
                take = pools[fullest]
                pools[fullest] = []
                n_buffered -= len(take)
                if take:
                    yield fullest, take
        # drain EVERYTHING at end of stream, short final batches included —
        # dropping the tail would silently lose examples on finite passes
        # (validation / conversion); the padded collator handles any size
        for b, pool in pools.items():
            while pool:
                yield b, pool[: self.batch_size]
                pool = pool[self.batch_size:]


def grouped_batch_iterator(dataset, batch_size: int, collator,
                           buckets: Sequence[int] = (64, 96, 128), seed: int = 0):
    """Length-grouped analog of `data.collator.batch_iterator`."""
    import dataclasses

    batcher = LengthGroupedBatcher(batch_size, buckets, seed=seed)
    for bucket_len, examples in batcher(dataset):
        c = dataclasses.replace(collator, max_length=bucket_len)
        yield c(examples)
