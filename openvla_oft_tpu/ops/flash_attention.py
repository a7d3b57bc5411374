"""Pallas TPU flash attention with the OFT block-bidirectional mask.

TPU-native replacement for the reference's `flash-attn==2.5.5` CUDA kernels +
the transformers fork's bidirectional action-token attention (SURVEY.md §2.9).

Design for the OFT regime (S ≈ 600–900 tokens, head_dim 128): each program
computes one (BQ, D) query block against the FULL key range for its
(batch, head) — at these lengths K/V and the fp32 score block fit comfortably
in VMEM, so a single-pass softmax beats an online-softmax loop. Masking is
built inside the kernel from 1D vectors (never materializing (S, S) in HBM):

    allow[i, j] = (j <= i  AND  key_valid[j])  OR  (bidir[i] AND bidir[j])

which expresses causal attention, left/right padding, and the bidirectional
action-chunk window in one rule. Fully-masked rows (query padding) emit zeros.

The wrapper pads S to a block multiple and flattens (B, H); grids are
(B, H, S_pad / BQ). GQA is supported by mapping head -> kv head in the
BlockSpec index map.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _allow_block(valid_ref, bidir_ref, qi, bq, t, causal):
    """The OFT mask rule for a (BQ, T) score block, built from 1D vectors."""
    rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
    # All 1D->2D reshapes happen on int32 (Mosaic restriction: minor-dim
    # insertion is unsupported for 1-bit vectors); comparisons come after.
    valid = valid_ref[0, 0:1, :] > 0                # (1, T) — this batch's row
    allow = jnp.broadcast_to(valid, (bq, t))
    if causal:
        allow = allow & (cols <= rows)
    bid = bidir_ref[0, 0:1, :] > 0                  # (1, T)
    q_bid = bidir_ref[0, 0, pl.ds(qi * bq, bq)].reshape(bq, 1) > 0  # (BQ, 1)
    return allow | (q_bid & bid & valid)


def _kernel(q_ref, k_ref, v_ref, valid_ref, bidir_ref, o_ref, lse_ref, *,
            scale, bq, causal):
    qi = pl.program_id(2)
    # Keep q/k/v in their storage dtype (bf16): the MXU runs bf16 inputs with
    # fp32 accumulation at full rate, while fp32 x fp32 matmuls run ~4x
    # slower — casting inputs up was the kernel's original bottleneck.
    q = q_ref[0, 0]                                # (BQ, D)
    k = k_ref[0, 0]                                # (T, D)
    v = v_ref[0, 0]                                # (T, D)
    t = k.shape[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BQ, T) fp32

    allow = _allow_block(valid_ref, bidir_ref, qi, bq, t, causal)

    scores = jnp.where(allow, scores, _NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)                        # fp32 softmax numerators
    p = jnp.where(allow, p, 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = o.astype(o_ref.dtype)
    # Log-sum-exp residual for the backward, lane-broadcast to the (BQ, 128)
    # tile so no 1D stores/transposes are needed (bwd reads lanes [0:1]).
    lse = m + jnp.log(jnp.maximum(l, 1e-30))       # (BQ, 1)
    lse_ref[0, 0] = jnp.broadcast_to(lse, (bq, 128))


def flash_attention(
    q: jnp.ndarray,                 # (B, S, H, D)
    k: jnp.ndarray,                 # (B, T, Hkv, D)
    v: jnp.ndarray,
    is_causal: bool = True,
    key_valid: Optional[jnp.ndarray] = None,   # (B, T) bool
    bidir_mask: Optional[jnp.ndarray] = None,  # (B, S) bool (S == T)
    bidir_block: Optional[Tuple[int, int]] = None,  # static (start, len)
    mask: Optional[jnp.ndarray] = None,  # unsupported here; use XLA path
    block_q: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention for self-attention (S == T). Returns (B, S, H, D).

    block_q: query-block rows per program (default 256; OPENVLA_FLASH_BLOCK_Q
    overrides for tuning — at S=618 a 256 block pads queries 618->768 (+24%)
    while 128 pads only to 640)."""
    assert mask is None, "explicit (S,S) masks use the XLA path"
    if block_q is None:
        import os

        block_q = int(os.environ.get("OPENVLA_FLASH_BLOCK_Q", "256"))
    b, s, h, d = q.shape
    t, hkv = k.shape[1], k.shape[2]
    assert s == t, "flash kernel is for self-attention prefill"

    if bidir_mask is None:
        bidir_mask = jnp.zeros((b, s), bool)
        if bidir_block is not None:
            w0, wl = bidir_block
            bidir_mask = bidir_mask.at[:, w0:w0 + wl].set(True)
    if key_valid is None:
        key_valid = jnp.ones((b, s), bool)

    bq = min(block_q, _round_up(s, 128))
    s_pad = _round_up(s, bq)
    if s_pad != s:
        pad = s_pad - s
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        key_valid = jnp.pad(key_valid, ((0, 0), (0, pad)))
        bidir_mask = jnp.pad(bidir_mask, ((0, 0), (0, pad)))

    qt = q.transpose(0, 2, 1, 3)       # (B, H, S, D)
    kt = k.transpose(0, 2, 1, 3)       # (B, Hkv, S, D)
    vt = v.transpose(0, 2, 1, 3)
    # Masks carried as (B, 8, S) int32: a (1, 8, S) block satisfies the TPU
    # (sublane, lane) tiling constraint while letting the grid's batch index
    # select the row statically.
    valid8 = jnp.broadcast_to(key_valid.astype(jnp.int32)[:, None, :], (b, 8, s_pad))
    bidir8 = jnp.broadcast_to(bidir_mask.astype(jnp.int32)[:, None, :], (b, 8, s_pad))

    out = _flash_core(is_causal, bq, qt, kt, vt, valid8, bidir8)

    out = out.transpose(0, 2, 1, 3)
    return out[:, :s]


def _fwd_pallas(causal, bq, qt, kt, vt, valid8, bidir8):
    """(o, lse) from the forward kernel; all arrays in (B, H, S_pad, D)."""
    b, h, s_pad, d = qt.shape
    hkv = kt.shape[1]
    rep = h // hkv
    kernel = functools.partial(_kernel, scale=d ** -0.5, bq=bq, causal=causal)
    # Interpreter mode off-TPU so the same code path is testable on CPU.
    interpret = jax.devices()[0].platform not in ("tpu",)
    return pl.pallas_call(
        kernel,
        grid=(b, h, s_pad // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi // rep, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi // rep, 0, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, 128), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, d), qt.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qt, kt, vt, valid8, bidir8)


# === Backward (training path) ===
# Standard flash-attention backward with recompute: residuals are (q, k, v,
# o, lse) — never the (S, S) probabilities. Two kernels: dq tiles over query
# blocks (disjoint writes), dk/dv tiles over key blocks (disjoint writes,
# per-QUERY-head; GQA reduces the rep groups outside). delta = rowsum(do*o)
# is computed in-kernel from the do/o blocks. The reference trains through
# flash-attn 2's CUDA backward (SETUP.md:20-24); this is its TPU analog.


def _kernel_dq(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, valid_ref,
               bidir_ref, dq_ref, *, scale, bq, causal):
    qi = pl.program_id(2)
    q = q_ref[0, 0]                                 # (BQ, D)
    k = k_ref[0, 0]                                 # (T, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]                               # (BQ, D)
    o = o_ref[0, 0]
    t = k.shape[0]

    allow = _allow_block(valid_ref, bidir_ref, qi, bq, t, causal)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(allow, s, _NEG_INF)
    lse = lse_ref[0, 0][:, 0:1]                     # (BQ, 1)
    p = jnp.where(allow, jnp.exp(s - lse), 0.0)     # (BQ, T) fp32
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BQ, T)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)          # (BQ, 1)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _kernel_dkv(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, valid_ref,
                bidir_ref, dk_ref, dv_ref, *, scale, bk, causal):
    ki = pl.program_id(2)
    q = q_ref[0, 0]                                 # (S, D) — full queries
    k = k_ref[0, 0]                                 # (BK, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]                               # (S, D)
    o = o_ref[0, 0]
    s_len = q.shape[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (s_len, bk), 0)
    cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (s_len, bk), 1)
    valid_c = valid_ref[0, 0, pl.ds(ki * bk, bk)].reshape(1, bk) > 0
    allow = jnp.broadcast_to(valid_c, (s_len, bk))
    if causal:
        allow = allow & (cols <= rows)
    bid_c = bidir_ref[0, 0, pl.ds(ki * bk, bk)].reshape(1, bk) > 0
    bid_r = bidir_ref[0, 0, :].reshape(s_len, 1) > 0
    allow = allow | (bid_r & bid_c & valid_c)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(allow, s, _NEG_INF)
    lse = lse_ref[0, 0][:, 0:1]                     # (S, 1)
    p = jnp.where(allow, jnp.exp(s - lse), 0.0)     # (S, BK) fp32
    # dv = p^T @ do
    dv = jax.lax.dot_general(p.astype(v.dtype), do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BK, D)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (S, BK)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)          # (S, 1)
    ds = p * (dp - delta) * scale                   # (S, BK)
    dk = jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BK, D)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flash_core(causal, bq, qt, kt, vt, valid8, bidir8):
    o, _ = _fwd_pallas(causal, bq, qt, kt, vt, valid8, bidir8)
    return o


def _flash_core_fwd(causal, bq, qt, kt, vt, valid8, bidir8):
    o, lse = _fwd_pallas(causal, bq, qt, kt, vt, valid8, bidir8)
    return o, (qt, kt, vt, valid8, bidir8, o, lse)


def _flash_core_bwd(causal, bq, res, g):
    import numpy as _np

    qt, kt, vt, valid8, bidir8, o, lse = res
    b, h, s_pad, d = qt.shape
    hkv = kt.shape[1]
    rep = h // hkv
    g = g.astype(qt.dtype)
    interpret = jax.devices()[0].platform not in ("tpu",)

    dq = pl.pallas_call(
        functools.partial(_kernel_dq, scale=d ** -0.5, bq=bq, causal=causal),
        grid=(b, h, s_pad // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi // rep, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi // rep, 0, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, 128), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), qt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qt, kt, vt, g, o, lse, valid8, bidir8)

    bk = bq
    dkh, dvh = pl.pallas_call(
        functools.partial(_kernel_dkv, scale=d ** -0.5, bk=bk, causal=causal),
        grid=(b, h, s_pad // bk),
        in_specs=[
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi // rep, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi // rep, ki, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, 128), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda bi, hi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda bi, hi, ki: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, d), qt.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, d), qt.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qt, kt, vt, g, o, lse, valid8, bidir8)

    # GQA: per-query-head dk/dv reduce over the rep group (fwd maps query
    # head hi -> kv head hi // rep, so groups are contiguous).
    dk = dkh.reshape(b, hkv, rep, s_pad, d).sum(axis=2).astype(kt.dtype)
    dv = dvh.reshape(b, hkv, rep, s_pad, d).sum(axis=2).astype(vt.dtype)
    # int32 mask inputs take float0 cotangents (JAX's convention for
    # non-differentiable integer primals).
    zero_v = _np.zeros(valid8.shape, dtype=jax.dtypes.float0)
    zero_b = _np.zeros(bidir8.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zero_v, zero_b


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# === All-heads-per-block variant ===
# Consumes q/k/v natively as (B, S, H, D) blocks — zero HBM transposes; the
# per-head attention runs as an unrolled loop over VMEM-resident slices. k/v
# blocks are indexed only by batch, so Pallas keeps them resident across the
# query-block grid dimension.
#
# Measured (v5e, 7B, S=618): 59.7 ms full-llama vs 50.6 ms XLA — the 32
# small per-head (128,128)x(128,640) matmuls underutilize the MXU pipeline,
# costing more than the avoided transposes. Kept as a tested variant for
# shapes with larger per-head work (docs/PERFORMANCE.md).
def _kernel_allheads(q_ref, k_ref, v_ref, valid_ref, bidir_ref, o_ref, *,
                     scale, bq, causal, num_heads, rep):
    qi = pl.program_id(1)
    t = k_ref.shape[1]

    rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
    valid = valid_ref[0, 0:1, :] > 0
    base_allow = jnp.broadcast_to(valid, (bq, t))
    if causal:
        base_allow = base_allow & (cols <= rows)
    bid = bidir_ref[0, 0:1, :] > 0
    q_bid = bidir_ref[0, 0, pl.ds(qi * bq, bq)].reshape(bq, 1) > 0
    allow = base_allow | (q_bid & bid & valid)

    for hi in range(num_heads):
        q = q_ref[0, :, hi, :]                              # (BQ, D) bf16
        k = k_ref[0, :, hi // rep, :]                       # (T, D)
        v = v_ref[0, :, hi // rep, :]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(allow, scores, _NEG_INF)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        p = jnp.where(allow, p, 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, hi, :] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention_allheads(
    q: jnp.ndarray,                 # (B, S, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    is_causal: bool = True,
    key_valid: Optional[jnp.ndarray] = None,
    bidir_mask: Optional[jnp.ndarray] = None,
    bidir_block: Optional[Tuple[int, int]] = None,
    block_q: int = 128,
) -> jnp.ndarray:
    b, s, h, d = q.shape
    hkv = k.shape[2]
    if bidir_mask is None:
        bidir_mask = jnp.zeros((b, s), bool)
        if bidir_block is not None:
            w0, wl = bidir_block
            bidir_mask = bidir_mask.at[:, w0:w0 + wl].set(True)
    if key_valid is None:
        key_valid = jnp.ones((b, s), bool)

    bq = min(block_q, _round_up(s, 128))
    s_pad = _round_up(s, bq)
    if s_pad != s:
        pad = s_pad - s
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        key_valid = jnp.pad(key_valid, ((0, 0), (0, pad)))
        bidir_mask = jnp.pad(bidir_mask, ((0, 0), (0, pad)))

    valid8 = jnp.broadcast_to(key_valid.astype(jnp.int32)[:, None, :],
                              (b, 8, s_pad))
    bidir8 = jnp.broadcast_to(bidir_mask.astype(jnp.int32)[:, None, :],
                              (b, 8, s_pad))
    kernel = functools.partial(_kernel_allheads, scale=d ** -0.5, bq=bq,
                               causal=is_causal, num_heads=h, rep=h // hkv)
    interpret = jax.devices()[0].platform not in ("tpu",)
    out = pl.pallas_call(
        kernel,
        grid=(b, s_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, h, d), lambda bi, qi: (bi, qi, 0, 0)),
            pl.BlockSpec((1, s_pad, hkv, d), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, s_pad, hkv, d), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 8, s_pad), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, h, d), lambda bi, qi: (bi, qi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, valid8, bidir8)
    return out[:, :s]


def flash_attention_tp(
    q: jnp.ndarray,                 # (B, S, H, D)
    k: jnp.ndarray,                 # (B, S, Hkv, D)
    v: jnp.ndarray,
    mesh,
    axis: str = "tp",
    is_causal: bool = True,
    key_valid: Optional[jnp.ndarray] = None,   # (B, S) bool
    bidir_mask: Optional[jnp.ndarray] = None,  # (B, S) bool
    bidir_block: Optional[Tuple[int, int]] = None,
    block_q: Optional[int] = None,
) -> jnp.ndarray:
    """Tensor-parallel flash attention: `shard_map` over the head axis.

    Heads are fully independent in attention, so each tp shard runs the
    Pallas kernel on its H/tp (and Hkv/tp) heads with the 1-D masks
    replicated — numerics identical to the single-shard kernel, zero
    collectives inside the op (the surrounding wqkv/wo matmuls carry the
    tp collectives, exactly like the XLA path under GSPMD). Use when the
    policy is tp-sharded at ALOHA-length geometry where the kernel wins
    (docs/PERFORMANCE.md "Flash-attention kernel: formal status"); GSPMD
    treats a bare pallas_call as opaque, so without this wrapper a
    tp-sharded model would gather the full head dim onto every shard.
    """
    from jax.sharding import PartitionSpec as P

    try:  # jax >= 0.4.35 exposes it at top level
        shard_map = jax.shard_map
        rep_kw = {"check_vma": False}
    except AttributeError:  # pragma: no cover - older jax
        # the experimental entry point spells the flag check_rep, not
        # check_vma — passing the wrong one is a TypeError
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}

    b, s, h, _ = q.shape
    hkv = k.shape[2]
    ntp = mesh.shape[axis]
    assert h % ntp == 0 and hkv % ntp == 0, (h, hkv, ntp)

    # Materialize the static window into the mask OUTSIDE the wrapper so the
    # inner call cannot rebuild it differently per shard.
    if bidir_mask is None:
        bidir_mask = jnp.zeros((b, s), bool)
        if bidir_block is not None:
            w0, wl = bidir_block
            bidir_mask = bidir_mask.at[:, w0:w0 + wl].set(True)
    if key_valid is None:
        key_valid = jnp.ones((b, s), bool)

    spec_h = P(None, None, axis, None)
    spec_m = P(None, None)

    def per_shard(q_, k_, v_, kv_, bd_):
        return flash_attention(q_, k_, v_, is_causal=is_causal, key_valid=kv_,
                               bidir_mask=bd_, block_q=block_q)

    fn = shard_map(per_shard, mesh=mesh,
                   in_specs=(spec_h, spec_h, spec_h, spec_m, spec_m),
                   out_specs=spec_h, **rep_kw)
    return fn(q, k, v, key_valid, bidir_mask)
