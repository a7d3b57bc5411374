"""Pallas fused LayerNorm+matmul(+GELU) for the ViT serving path.

Round-3 profiling (docs/PERFORMANCE.md): with the LN affine / LayerScale
already folded into the weights (models/vit.py::fuse_vit_inference_weights),
the ViT pair still runs ~10 ms at ~35% MFU while a pure matmul chain at the
same shapes reaches 141 TF/s — the gap is the VPU-serialized epilogues
(LN standardization, GELU) that XLA schedules as separate fusions between
the MXU matmuls. This kernel folds them INTO the matmul's software pipeline:
each grid step standardizes its (BM, D) row block on the VPU while the MXU
consumes the previous block, and applies GELU to the (BM, BN) output tile
before the store.

  y[i, j] = act( LN0(x[i, :]) @ w[:, j] + b[j] )

where LN0 is standardization only (affine pre-folded into w/b). Used for the
qkv projection (act=None) and the MLP fc1 (act=gelu/gelu_tanh); attention and
the residual adds stay on XLA, which already handles them well.

Numerics: stats and accumulation in fp32, bf16 MXU inputs — identical policy
to ops/layers.py::layer_norm + linear (tests/test_vit_fused.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf for Pallas TPU (no erf primitive in the Mosaic lowering):
    Abramowitz-Stegun 7.1.26 rational approximation, |error| < 1.5e-7 —
    far below bf16 output precision and the fp32 parity tolerance."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, w_ref, b_ref, o_ref, *, eps, act):
    x = x_ref[...]                                   # (BM, D) storage dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    normed = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    acc = jax.lax.dot_general(normed, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    if act == "gelu":
        acc = acc * 0.5 * (1.0 + _erf(acc / 1.4142135623730951))
    elif act == "gelu_tanh":
        z = 0.7978845608028654 * (acc + 0.044715 * acc * acc * acc)
        t = 1.0 - 2.0 / (jnp.exp(2.0 * z) + 1.0)
        acc = 0.5 * acc * (1.0 + t)
    elif act == "quick_gelu":
        acc = acc * jax.nn.sigmoid(1.702 * acc)
    o_ref[...] = acc.astype(o_ref.dtype)


def ln_matmul(
    x: jnp.ndarray,              # (..., M, D)
    w: jnp.ndarray,              # (D, N)
    b: Optional[jnp.ndarray],    # (N,)
    act: Optional[str] = None,   # None | "gelu" | "gelu_tanh" | "quick_gelu"
    eps: float = 1e-6,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
) -> jnp.ndarray:
    """act(standardize(x) @ w + b) as one pipelined Pallas program.

    Default blocks minimize M padding (ViT serving M=522 pads to 528 with
    bm=176 vs 768 with bm=256 — +1% vs +47% wasted MXU rows); tune with
    OPENVLA_VIT_FUSED_BM / _BN."""
    import os

    if block_m is None:
        block_m = int(os.environ.get("OPENVLA_VIT_FUSED_BM", "176"))
    if block_n is None:
        block_n = int(os.environ.get("OPENVLA_VIT_FUSED_BN", "512"))
    orig_shape = x.shape
    d = x.shape[-1]
    n = w.shape[-1]
    m = 1
    for s in orig_shape[:-1]:
        m *= s
    x2 = x.reshape(m, d)
    if b is None:
        b = jnp.zeros((n,), x.dtype)

    bm = min(block_m, _round_up(m, 16))
    bn = min(block_n, _round_up(n, 128))
    m_pad, n_pad = _round_up(m, bm), _round_up(n, bn)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    w2 = jnp.pad(w, ((0, 0), (0, n_pad - n))) if n_pad != n else w
    b2 = jnp.pad(b, (0, n_pad - n)) if n_pad != n else b
    b2 = b2.reshape(1, n_pad)

    interpret = jax.devices()[0].platform not in ("tpu",)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x2, w2, b2)
    return out[:m, :n].reshape(*orig_shape[:-1], n)


def _round_up(v: int, mult: int) -> int:
    return ((v + mult - 1) // mult) * mult
