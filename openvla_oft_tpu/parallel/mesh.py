"""Device mesh construction for data/fsdp/tensor parallel execution.

TPU-native replacement of the reference's torch.distributed topology
(SURVEY.md §2.8): DDP -> the "dp" axis, FSDP hybrid shard -> the "fsdp" axis
(parameter + optimizer-state sharding, ZeRO analog), and — new relative to the
reference, which has no tensor parallelism — a "tp" axis that shards the 7B
Llama across ICI for inference and large-batch training.

Axis convention (in mesh order): ("dp", "fsdp", "tp"). Batches shard over
("dp", "fsdp"); parameters shard over ("fsdp", "tp"); collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXES = ("dp", "fsdp")


def make_mesh(dp: int = 1, fsdp: int = 1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = dp * fsdp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over (dp, fsdp)."""
    return NamedSharding(mesh, P(DATA_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
