"""Rotary position embeddings (RoPE), matching HF Llama's half-rotation layout.

HF Llama applies `rotate_half`: for head dim D, the first D/2 channels pair
with the last D/2 (x1, x2) -> (x1*cos - x2*sin, x2*cos + x1*sin), with
inv_freq = theta ** (-2i/D). We reproduce that exactly so ported weights give
bit-comparable results (fp32 sin/cos, applied in fp32, cast back).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_sin_cos(positions: jnp.ndarray, head_dim: int, theta: float) -> tuple:
    """positions: (..., S) int32 -> (sin, cos) of shape (..., S, head_dim)."""
    half = head_dim // 2
    freq_exponents = jnp.arange(half, dtype=jnp.float32) / half
    inv_freq = theta ** -freq_exponents  # (half,)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., S, half)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (..., S, D)
    return jnp.sin(angles), jnp.cos(angles)


def apply_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """x: (..., S, n_heads, head_dim); sin/cos: (..., S, head_dim)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    sin = sin[..., None, :]  # broadcast over heads
    cos = cos[..., None, :]
    out = x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
    return out.astype(x.dtype)
