"""LoRA as auxiliary parameter pytrees (reference: peft wrapping at
`vla-scripts/finetune.py:862-871` — r=32, alpha=min(r,16), gaussian init,
target_modules="all-linear").

Functional formulation: LoRA factors live in their own tree mirroring the
matched base kernels; the merged weight W + (alpha/r) * A @ B is materialized
*inside* jit each step, so the base stays frozen (no optimizer state for it)
and XLA fuses the merge with the consuming matmul's prologue. Under the fsdp
axis the merged copy is sharded like the base weight.

"all-linear" here = every Linear kernel of the LLM blocks, ViT blocks, and the
vision projector — matching peft's selection (which excludes the embedding and
the LM head).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# Kernels targeted by "all-linear" on the wrapped VLA.
DEFAULT_TARGETS = (
    r"llm/layers/attn/(wq|wk|wv|wo)/kernel$",
    r"llm/layers/mlp/(gate|up|down)/kernel$",
    r"vision_backbone/.*/layers/attn/(qkv|proj)/kernel$",
    r"vision_backbone/.*/layers/mlp/(fc1|fc2)/kernel$",
    r"projector/fc\d/kernel$",
)


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


def _matches(ps: str, targets) -> bool:
    return any(re.search(t, ps) for t in targets)


def init_lora(key, params: Params, rank: int = 32,
              targets: Tuple[str, ...] = DEFAULT_TARGETS,
              dtype=jnp.float32) -> Params:
    """Build {path: {"a", "b"}} factors for every matched kernel.

    Gaussian init (peft `init_lora_weights="gaussian"`): A ~ N(0, 1/r), B = 0.
    Kernels may carry a leading stacked-layer axis: (L, in, out) ->
    A (L, r, in), B (L, r, out).

    A is stored RANK-MAJOR — (r, in), peft's `lora_A.weight` convention —
    not (in, r): TPU HBM tiles the trailing two dims to (8, 128), so an
    (in, 32) minor dim pads 32->128 lanes (4x bytes). At 7B/r=32 the
    in-minor layout wastes 1.65 GiB across the fp32 A factors + Adam m/v —
    ~10% of a v5e chip — and showed up as 4x-expansion `remat_uncompressed`
    copies in OOM dumps. Rank-major puts the wide dim minor; B is already
    (r, out) and pads only sublanes (8-row, free at r=32).
    """
    leaves = []

    def visit(path, leaf):
        ps = _path_str(path)
        if _matches(ps, targets):
            leaves.append((ps, leaf.shape))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)

    lora: Params = {}
    keys = jax.random.split(key, max(len(leaves), 1))
    for (ps, shape), k in zip(leaves, keys):
        *lead, d_in, d_out = shape
        a = (jax.random.normal(k, (*lead, rank, d_in), jnp.float32) / rank).astype(dtype)
        b = jnp.zeros((*lead, rank, d_out), dtype)
        node = lora
        parts = ps.split("/")[:-1]  # drop "kernel"
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = {"a": a, "b": b}
    return lora


def apply_lora(params: Params, lora: Params, rank: int = 32,
               alpha: float = 16.0) -> Params:
    """Return params with W := W + (alpha/r) * A @ B at every LoRA site."""
    scale = alpha / rank

    def merge(base_node, lora_node):
        if isinstance(lora_node, dict) and set(lora_node) == {"a", "b"}:
            w = base_node["kernel"]
            a, b = lora_node["a"], lora_node["b"]
            delta = jnp.einsum("...ri,...ro->...io", a.astype(jnp.float32),
                               b.astype(jnp.float32)) * scale
            out = dict(base_node)
            out["kernel"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
            return out
        out = dict(base_node)
        for k, v in lora_node.items():
            out[k] = merge(base_node[k], v)
        return out

    merged = dict(params)
    for k, v in lora.items():
        merged[k] = merge(params[k], v)
    return merged


def inject_lora(params: Params, lora: Params, rank: int = 32,
                alpha: float = 16.0) -> Params:
    """Attach LoRA factors into the matched param dicts for *merge-free*
    evaluation: `linear()` computes y = xW + (x @ (A*scale)) @ B when a node
    carries "lora_a"/"lora_b". Unlike `apply_lora`, no full-size merged
    weight is materialized — on the 7B that saves a 14.8 GB HBM copy per
    training step (and is what makes single-chip LoRA training fit)."""
    scale = alpha / rank

    def attach(base_node, lora_node):
        if isinstance(lora_node, dict) and set(lora_node) == {"a", "b"}:
            out = dict(base_node)
            out["lora_a"] = lora_node["a"] * scale
            out["lora_b"] = lora_node["b"]
            return out
        out = dict(base_node)
        for k, v in lora_node.items():
            out[k] = attach(base_node[k], v)
        return out

    merged = dict(params)
    for k, v in lora.items():
        merged[k] = attach(params[k], v)
    return merged


def migrate_lora_layout(lora: Params, rank: int) -> Params:
    """Transpose pre-rank-major LoRA A factors (..., d_in, r) into the
    current (..., r, d_in) layout (flipped for TPU HBM lane tiling — see
    `init_lora`). Detection is unambiguous for every supported config: the
    old layout has `rank` on the trailing axis but not the second-to-last,
    and every targeted d_in (>=768) exceeds any supported rank. No-op on
    current-layout trees; safe to call unconditionally."""

    def walk(node):
        if isinstance(node, dict):
            if set(node) == {"a", "b"} and hasattr(node.get("a"), "shape"):
                a = node["a"]
                if (a.ndim >= 2 and a.shape[-1] == rank
                        and a.shape[-2] != rank):
                    return {"a": jnp.swapaxes(jnp.asarray(a), -1, -2),
                            "b": node["b"]}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, tuple):
            vals = [walk(v) for v in node]
            return type(node)(*vals) if hasattr(node, "_fields") \
                else tuple(vals)
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(lora)


def merge_lora_into_params(params: Params, lora: Params, rank: int = 32,
                           alpha: float = 16.0) -> Params:
    """Offline merge (reference `merge_lora_weights_and_save.py:33-73`).
    Accepts both the current rank-major A layout and pre-flip (in, r)
    checkpoints (migrated on the fly)."""
    return apply_lora(params, migrate_lora_layout(lora, rank), rank, alpha)
