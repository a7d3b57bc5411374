"""Path-based parameter sharding rules (GSPMD partition specs).

The functional param pytrees make sharding declarative: each rule matches a
"/"-joined param path and yields a PartitionSpec; any axis whose size does not
divide the mesh axis is demoted to replication (so the same rules serve the 7B
flagship and tiny test configs).

Megatron-style layout: column-parallel into attention/MLP (contract dim on
"fsdp", output heads/hidden on "tp"), row-parallel out of them — XLA inserts
the all-gathers/reduce-scatters over ICI. The reference has no TP at all
(SURVEY.md §2.8); its FSDP wrap policy maps to the "fsdp" axis here.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

# (path regex, spec). First match wins. Specs are written for the *trailing*
# dims; stacked-layer arrays get a leading None automatically (see below).
_RULES = [
    # Llama / ViT stacked layers — note leading layer axis handled generically.
    (r"layers/attn/(wq|wk|wv)/kernel$", ("fsdp", "tp")),
    # serving-fused layouts (models/llama.py::fuse_inference_weights) —
    # column-parallel like their unfused counterparts
    (r"layers/attn/wqkv/kernel$", ("fsdp", "tp")),
    (r"layers/mlp/gate_up/kernel$", ("fsdp", "tp")),
    (r"layers/attn/wo/kernel$", ("tp", "fsdp")),
    (r"layers/attn/qkv/kernel$", ("fsdp", "tp")),
    (r"layers/attn/proj/kernel$", ("tp", "fsdp")),
    (r"layers/mlp/(gate|up|fc1)/kernel$", ("fsdp", "tp")),
    (r"layers/mlp/(down|fc2)/kernel$", ("tp", "fsdp")),
    # Embedding + LM head.
    (r"embed/embedding$", ("fsdp", "tp")),
    (r"lm_head/kernel$", ("fsdp", "tp")),
    # Vision projector (fc1: 2176->8704, fc2: 8704->4096, fc3: 4096->4096).
    (r"projector/fc1/kernel$", ("fsdp", "tp")),
    (r"projector/fc2/kernel$", ("tp", "fsdp")),
    (r"projector/fc3/kernel$", ("fsdp", "tp")),
    # Action-head trunk: <1% of step FLOPs, and ReLU/LayerNorm/residual sit
    # between its square matmuls, so a Megatron column/row pairing cannot be
    # sustained — tp-sharding here forced GSPMD into an "involuntary full
    # rematerialization" reshard of the ReLU cotangent (round-1 dryrun log).
    # Keep activations batch-sharded; shard the kernels over fsdp only
    # (ZeRO-style memory scaling, one small all-gather per matmul).
    (r"fc_in/kernel$", ("fsdp", None)),
    (r"blocks/\d+/fc/kernel$", ("fsdp", None)),
    (r"fc_out/kernel$", ("fsdp", None)),
    # LoRA factors follow the base layer's output axis. A is rank-major
    # (r, in) — see training/lora.py::init_lora — so its shardable (input)
    # dim is the SECOND of the trailing pair.
    (r"lora/.*/(wq|wk|wv|gate|up|fc1|qkv)/a$", (None, "fsdp")),
    (r"lora/.*/(wq|wk|wv|gate|up|fc1|qkv)/b$", (None, "tp")),
    (r"lora/.*/(wo|down|fc2|proj)/a$", (None, "tp")),
    (r"lora/.*/(wo|down|fc2|proj)/b$", (None, "fsdp")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _fit_spec(spec_tail, shape, mesh: Mesh):
    """Assign the rule's trailing-dim spec to the actual array rank, demoting
    non-divisible dims to None. Leading (stacked-layer) dims replicate."""
    ndim = len(shape)
    tail = len(spec_tail)
    full = [None] * (ndim - tail) + list(spec_tail) if ndim >= tail else \
        list(spec_tail)[-ndim:]
    out = []
    for dim, ax in zip(shape, full):
        if ax is None:
            out.append(None)
            continue
        size = mesh.shape[ax]
        out.append(ax if dim % size == 0 and size > 1 else None)
    return P(*out)


def param_pspecs(params: Params, mesh: Mesh) -> Params:
    """PartitionSpec pytree matching `params` (replicate by default)."""

    def assign(path, leaf):
        ps = _path_str(path)
        # Packed-int4 kernels ("kernel_q4", shape (.., in/2, out)) shard like
        # the bf16/int8 kernel they replace — without this the 3.7 GB int4
        # base would silently replicate per device on fsdp/tp meshes, using
        # MORE HBM than int8. Their group scales ("scale_w4") stay replicated
        # like int8's "scale_w" (both are small).
        ps = re.sub(r"kernel_q4$", "kernel", ps)
        for pattern, spec in _RULES:
            if re.search(pattern, ps):
                return _fit_spec(spec, leaf.shape, mesh)
        return P()

    return jax.tree_util.tree_map_with_path(assign, params)


def param_shardings(params: Params, mesh: Mesh) -> Params:
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                                  param_pspecs(params, mesh))


def put_global(leaf, sharding: NamedSharding):
    """Place one host value under a (possibly multi-process) sharding.

    Single-process this is plain `device_put`. Multi-process, a committed
    host array -> global sharding is an illegal cross-host reshard in
    multi-controller JAX; but every process holds the SAME full host value
    (deterministic init / checkpoint load), so assemble the global array
    from process-local shard lookups instead — no communication."""
    if jax.process_count() == 1:
        return jax.device_put(leaf, sharding)
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        # already a global array: same device set, on-device reshard is legal
        return leaf if leaf.sharding == sharding \
            else jax.device_put(leaf, sharding)
    import numpy as np

    x = np.asarray(leaf)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Device-put `params` according to the rules (host -> sharded HBM)."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(put_global, params, shardings)
