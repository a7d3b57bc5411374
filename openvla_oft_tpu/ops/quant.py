"""Int8 quantized inference (the reference's `load_in_8bit` analog,
`openvla_utils.py:282-303` via bitsandbytes — here TPU-native).

Weight quantization is symmetric per-output-channel int8; activations
quantize dynamically per-token (symmetric, absmax). The matmul then runs
int8 x int8 -> int32 on the MXU — v5e executes int8 at twice the bf16 rate —
and dequantizes with the rank-1 outer product of scales, which XLA fuses into
the matmul epilogue:

    y[t, o] = (sum_k qx[t, k] * qw[k, o]) * sx[t] * sw[o]

`linear()` in ops/layers.py dispatches here whenever a param dict carries an
int8 kernel + "scale_w", so quantization is a pure param-tree transformation
(`quantize_tree`) — no model-code changes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(in, out) float -> {"kernel": int8 (in, out), "scale_w": f32 (out,)}."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # per out-channel
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -127, 127)
    return {"kernel": q.astype(jnp.int8), "scale_w": scale[..., 0, :]}


def int8_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-token activation quant + int8 MXU matmul + fused dequant.

    Supports stacked kernels (L, in, out) with scale_w (L, out).
    """
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0   # (..., T, 1)
    qx = jnp.clip(jnp.round(xf / jnp.maximum(sx, 1e-12)), -127, 127
                  ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qx, p["kernel"],
        dimension_numbers=(((qx.ndim - 1,), (p["kernel"].ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * p["scale_w"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_tree(params: Params, min_dim: int = 1024) -> Params:
    """Quantize every 'kernel' leaf whose contraction dim >= min_dim.

    Norm scales, biases, embeddings, and small projections stay high
    precision (standard weight-only-quant practice).
    """

    def visit(node):
        if isinstance(node, dict):
            if "kernel" in node and isinstance(node["kernel"], jnp.ndarray) \
                    and node["kernel"].ndim >= 2 \
                    and node["kernel"].dtype != jnp.int8 \
                    and node["kernel"].shape[-2] >= min_dim:
                q = quantize_weight(node["kernel"])
                out = dict(node)
                out["kernel"] = q["kernel"]
                out["scale_w"] = q["scale_w"]
                return out
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)
