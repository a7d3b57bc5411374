"""Fused int4 dequant-matmul Pallas kernel (serving decode path).

Why this kernel exists: the diffusion suffix loop and AR decode are
HBM-bound on streaming the LLM weights once per step (docs/PERFORMANCE.md,
"Diffusion head" roofline). int8 weights floor at ~8.2 ms/step on one v5e;
int4 halves the stream (~4.1 ms floor) — but the XLA `int4_linear` path
(ops/quant.py) unpacks nibbles through stack+reshape at HBM precision and
measures 258 ms/step: the unpack round-trips full-size int8/f32 tensors
through HBM, destroying the very bandwidth the format saves.

This kernel keeps the packed bytes packed across the DMA and unpacks in
VMEM, tile by tile, overlapped with the MXU:

    HBM --(int4-packed DMA)--> VMEM --(VPU nibble unpack + group dequant)
        --> bf16 tile --(MXU)--> f32 accumulator

Packing layout (shared with ops/quant.py::quantize_weight_int4): byte row i
of `packed` holds weight rows 2i (low nibble) and 2i+1 (high nibble). The
wrapper therefore feeds the kernel x's even and odd feature columns as two
separate (T, K/2) operands — y = x_even @ W_even + x_odd @ W_odd — so the
kernel never relayouts along the contraction dim: two shifts, one cast, one
group-scale multiply, two MXU dots per tile.

Group scales: quantize_weight_int4 stores (G, N) with group g along the
original in-dim. In the even/odd split each scale row covers g/2 rows of
each half, so the same (G, N) array serves both halves with group g2 = g/2.

Reference analog: bitsandbytes 4-bit (`load_in_4bit`,
reference openvla_utils.py:282-303) runs fused dequant CUDA kernels; this is
the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xe_ref, xo_ref, pk_ref, sc_ref, out_ref, *, g2: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = pk_ref[:].astype(jnp.int32)                   # (bk2, bn)
    # Low nibble sign-extended: <<28 then arithmetic >>28; high nibble: the
    # int8->int32 cast already sign-extended bit 7, so >>4 is exact.
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28)
    hi = jnp.right_shift(w, 4)

    bk2, bn = w.shape
    gb = bk2 // g2
    sc = sc_ref[:]                                    # (gb, bn) f32
    # Dequantized tiles match the x operand dtype: bf16 on TPU (MXU);
    # f32 under interpret mode, whose CPU DotThunk can't mix bf16 -> f32.
    dot_dtype = xe_ref.dtype
    # Leading-dim split (bk2, bn) -> (gb, g2, bn) is layout-free (g2 is a
    # multiple of the sublane tile); the scale broadcast fuses on the VPU.
    lo_f = (lo.astype(jnp.float32).reshape(gb, g2, bn) * sc[:, None, :]
            ).reshape(bk2, bn).astype(dot_dtype)
    hi_f = (hi.astype(jnp.float32).reshape(gb, g2, bn) * sc[:, None, :]
            ).reshape(bk2, bn).astype(dot_dtype)

    acc = jnp.dot(xe_ref[:], lo_f, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xo_ref[:], hi_f, preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _pad_axis(a: jnp.ndarray, axis: int, to: int) -> jnp.ndarray:
    pad = (-a.shape[axis]) % to
    if not pad:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(jax.jit, static_argnames=("block_k2", "block_n",
                                             "interpret"))
def _int4_matmul_fused_2d(x2: jnp.ndarray, packed: jnp.ndarray,
                          scales: jnp.ndarray, *, block_k2: int,
                          block_n: int, interpret: bool) -> jnp.ndarray:
    t, k_dim = x2.shape
    k2, n = packed.shape
    g_count = scales.shape[0]
    g2 = k2 // g_count                                 # even/odd-half group
    assert g_count * g2 == k2, (scales.shape, packed.shape)

    # Block sizes: bk2 must hold whole scale groups (g2) AND satisfy both
    # roles it plays — lane dim of the bf16 x-blocks (x128) and sublane dim
    # of the int8 packed blocks (x32, subsumed by x128); bn is lanes (x128).
    import math

    unit = math.lcm(g2, 128)
    bk2 = max(unit, (min(block_k2, k2) // unit) * unit)
    bn = min(block_n, -(-n // 128) * 128)

    dot_dtype = jnp.float32 if interpret else jnp.bfloat16
    xe = _pad_axis(x2[:, 0::2].astype(dot_dtype), 1, bk2)
    xo = _pad_axis(x2[:, 1::2].astype(dot_dtype), 1, bk2)
    tp = max(16, -(-t // 16) * 16)                     # bf16 sublane tile
    bt = min(tp, 512)                                  # VMEM cap on big T
    tp = -(-tp // bt) * bt
    xe = _pad_axis(xe, 0, tp)
    xo = _pad_axis(xo, 0, tp)
    pk = _pad_axis(_pad_axis(packed, 0, bk2), 1, bn)   # zero nibbles -> 0
    sc = _pad_axis(_pad_axis(scales, 0, bk2 // g2), 1, bn)

    k2p, np_ = pk.shape
    grid = (tp // bt, np_ // bn, k2p // bk2)           # k innermost: accum
    gb = bk2 // g2

    out = pl.pallas_call(
        functools.partial(_kernel, g2=g2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk2), lambda ti, i, j: (ti, j)),
            pl.BlockSpec((bt, bk2), lambda ti, i, j: (ti, j)),
            pl.BlockSpec((bk2, bn), lambda ti, i, j: (j, i)),
            pl.BlockSpec((gb, bn), lambda ti, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda ti, i, j: (ti, i)),
        out_shape=jax.ShapeDtypeStruct((tp, np_), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * tp * k2p * np_,
            bytes_accessed=k2p * np_ + xe.size * 2 * 2 + tp * np_ * 4,
            transcendentals=0,
        ),
    )(xe, xo, pk, sc)
    return out[:t, :n]


@jax.custom_vjp
def int4_matmul_fused(x: jnp.ndarray, packed: jnp.ndarray,
                      scales: jnp.ndarray) -> jnp.ndarray:
    """y = x @ dequant(packed, scales) with the dequant fused in VMEM.

    x: (..., T, K) float; packed: (K/2, N) int8 (quantize_weight_int4
    layout); scales: (G, N) float, G = K // group. Returns (..., T, N) f32.
    Backward (training) differentiates through the dequantized weight in
    plain XLA — the kernel is a serving-path forward.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    interpret = jax.devices()[0].platform not in ("tpu",)
    out = _int4_matmul_fused_2d(x2, packed, scales.astype(jnp.float32),
                                block_k2=512, block_n=512,
                                interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def _fused_fwd(x, packed, scales):
    return (int4_matmul_fused(x, packed, scales),
            (packed, scales, jnp.zeros((0,), x.dtype)))


def _fused_bwd(res, g):
    packed, scales, x_proto = res
    from openvla_oft_tpu.ops.quant import _unpack_int4

    q = _unpack_int4(packed).astype(jnp.float32)       # (K, N)
    k_dim, n = q.shape
    groups = scales.shape[0]
    w = (q.reshape(groups, k_dim // groups, n)
         * scales.astype(jnp.float32)[:, None, :]).reshape(k_dim, n)
    gx = jax.lax.dot_general(
        g.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_proto.dtype)
    import numpy as _np

    return (gx, _np.zeros(packed.shape, jax.dtypes.float0),
            jnp.zeros_like(scales))


int4_matmul_fused.defvjp(_fused_fwd, _fused_bwd)


# === Stacked-weight variant (scan-resident decode layers) ====================
#
# Inside `lax.scan` over a stacked (L, K/2, N) weight, feeding the 2D kernel
# the per-layer slice forces XLA to MATERIALIZE that slice as a copy (custom
# calls can't fuse a dynamic-slice into their operands), so each step pays
# slice-read + copy-write + kernel-read = 3x the int4 bytes — measured
# 23.1 ms/step vs int8's 12.5 on v5e, despite the 2D kernel matching int8
# when handed an unstacked weight. This variant instead passes the WHOLE
# stacked buffer to `pallas_call` and prefetches the layer index as a
# scalar; the BlockSpec index map reads (layer, j, i) blocks straight out
# of the stacked HBM array. Zero copies: the weight stream is the true
# int4 footprint.


def _kernel_stacked(layer_ref, xe_ref, xo_ref, pk_ref, sc_ref, out_ref,
                    *, g2: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = pk_ref[0].astype(jnp.int32)                   # (bk2, bn)
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28)
    hi = jnp.right_shift(w, 4)

    bk2, bn = w.shape
    gb = bk2 // g2
    sc = sc_ref[0]                                    # (gb, bn) f32
    dot_dtype = xe_ref.dtype
    lo_f = (lo.astype(jnp.float32).reshape(gb, g2, bn) * sc[:, None, :]
            ).reshape(bk2, bn).astype(dot_dtype)
    hi_f = (hi.astype(jnp.float32).reshape(gb, g2, bn) * sc[:, None, :]
            ).reshape(bk2, bn).astype(dot_dtype)

    acc = jnp.dot(xe_ref[:], lo_f, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xo_ref[:], hi_f, preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _stacked_blocks(k2: int, n: int, g2: int):
    """Largest (bk2, bn) that divide (k2, n) without padding the stacked
    weight (padding would copy the whole (L, ...) buffer — the exact cost
    this kernel exists to avoid). Returns None when no legal tiling exists
    (caller falls back to slice + XLA dequant).

    TPU lowering requires every block's last two dims be (8, 128)-divisible
    or equal to the full array dims; the binding constraint is the scales
    block (1, gb, bn) with gb = bk2/g2, so bk2 must also make gb a multiple
    of 8 — or be the WHOLE k2 (then gb == G, the full dim, e.g. llama-7B's
    down projection where K2=5504 has no 8*g2-aligned divisor)."""
    import math

    unit = math.lcm(g2, 128)  # whole scale groups + int8 sublane/lane tiles
    if k2 % unit or n % 128 or g2 % 8:
        # g2 % 8: the kernel's (bk2,bn)->(gb,g2,bn) reshape is layout-free
        # only when g2 is a multiple of the f32 sublane tile (advisor r4).
        return None
    bns = [128 * m for m in range(min(n // 128, 8), 0, -1) if n % (128 * m) == 0]
    if not bns:
        return None
    bk2 = 0
    for mult in range(min(k2 // unit, 2048 // unit), 0, -1):
        cand = unit * mult
        if k2 % cand == 0 and (cand // g2) % 8 == 0:
            bk2 = cand
            break
    if bk2:
        # Prefer the largest bn whose resident set fits: fewer grid blocks
        # amortize per-block pipeline overhead, which dominates at decode
        # widths (measured: AR int4 15 ms/token vs the 3.7 ms DMA floor).
        bt = 128  # row-block cap in _int4_matmul_stacked_2d
        for bn in bns:
            vmem = 2 * (bk2 * bn + 2 * 2 * bt * bk2 + 4 * bt * bn)
            if vmem <= 10 * 1024 * 1024:
                return (bk2, bn)
        return (bk2, bns[-1])
    # Whole-K2 column: scales block covers the full G dim (e.g. llama-7B's
    # down projection, K2=5504 = 128*43 — no 8*g2-aligned divisor). The
    # resident set is the packed block PLUS the two bf16 x-half blocks and
    # the f32 accumulator, each double-buffered; budget all of them against
    # ~10 MB of the 16 MB scoped VMEM (measured: bn=512 at K2=5504 wanted
    # 18.6 MB on v5e and failed to compile).
    bt = 128  # row-block cap _int4_matmul_stacked_2d uses when bk2 > 2048
    for bn in bns:
        vmem = 2 * (k2 * bn + 2 * 2 * bt * k2 + 4 * bt * bn)
        if vmem <= 10 * 1024 * 1024:
            return (k2, bn)
    return None


def supports_stacked_fused(packed_shape, scales_shape) -> bool:
    """True when the (L, K/2, N) packing admits a no-padding tiling."""
    if len(packed_shape) != 3:
        return False
    _, k2, n = packed_shape
    g2 = k2 // scales_shape[-2]
    return _stacked_blocks(k2, n, g2) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_stacked_2d(x2: jnp.ndarray, packed: jnp.ndarray,
                            scales: jnp.ndarray, layer: jnp.ndarray,
                            *, interpret: bool) -> jnp.ndarray:
    t, k_dim = x2.shape
    _, k2, n = packed.shape
    g2 = k2 // scales.shape[-2]
    bk2, bn = _stacked_blocks(k2, n, g2)
    gb = bk2 // g2

    dot_dtype = jnp.float32 if interpret else jnp.bfloat16
    xe = _pad_axis(x2[:, 0::2].astype(dot_dtype), 1, bk2)
    xo = _pad_axis(x2[:, 1::2].astype(dot_dtype), 1, bk2)
    tp = max(16, -(-t // 16) * 16)
    # Row-block cap 128: decode widths are <=112 rows; keeping bt small is
    # what lets _stacked_blocks pick a LARGER bn (fewer grid blocks — the
    # per-block pipeline overhead dominates at these shapes).
    bt = min(tp, 128)
    tp = -(-tp // bt) * bt
    xe = _pad_axis(xe, 0, tp)
    xo = _pad_axis(xo, 0, tp)

    grid = (tp // bt, n // bn, k2 // bk2)              # k innermost: accum
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, g2=g2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, bk2), lambda ti, i, j, l: (ti, j)),
                pl.BlockSpec((bt, bk2), lambda ti, i, j, l: (ti, j)),
                pl.BlockSpec((1, bk2, bn), lambda ti, i, j, l: (l[0], j, i)),
                pl.BlockSpec((1, gb, bn), lambda ti, i, j, l: (l[0], j, i)),
            ],
            out_specs=pl.BlockSpec((bt, bn), lambda ti, i, j, l: (ti, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((tp, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * tp * k2 * n,
            bytes_accessed=k2 * n + xe.size * 2 * 2 + tp * n * 4,
            transcendentals=0,
        ),
    )(jnp.atleast_1d(layer).astype(jnp.int32), xe, xo, packed,
      scales.astype(jnp.float32))
    return out[:t, :n]


@jax.custom_vjp
def int4_matmul_fused_stacked(x: jnp.ndarray, packed: jnp.ndarray,
                              scales: jnp.ndarray,
                              layer: jnp.ndarray) -> jnp.ndarray:
    """y = x @ dequant(packed[layer], scales[layer]), layer a traced scalar.

    x: (..., T, K); packed: (L, K/2, N) int8; scales: (L, G, N); layer:
    scalar int32 (e.g. the index of a by-index layer scan — see
    models/llama.py). Blocks stream directly from the stacked HBM buffer
    via scalar-prefetch indexing; no per-layer slice is materialized.
    Caller must check `supports_stacked_fused` first."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    interpret = jax.devices()[0].platform not in ("tpu",)
    out = _int4_matmul_stacked_2d(x2, packed, scales, layer,
                                  interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def _stacked_fwd(x, packed, scales, layer):
    return (int4_matmul_fused_stacked(x, packed, scales, layer),
            (packed, scales, layer, jnp.zeros((0,), x.dtype)))


def _stacked_bwd(res, g):
    packed, scales, layer, x_proto = res
    from openvla_oft_tpu.ops.quant import _unpack_int4
    import numpy as _np

    q = _unpack_int4(packed[layer]).astype(jnp.float32)   # (K, N)
    k_dim, n = q.shape
    groups = scales.shape[-2]
    w = (q.reshape(groups, k_dim // groups, n)
         * scales[layer].astype(jnp.float32)[:, None, :]).reshape(k_dim, n)
    gx = jax.lax.dot_general(
        g.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_proto.dtype)
    return (gx, _np.zeros(packed.shape, jax.dtypes.float0),
            jnp.zeros_like(scales),
            _np.zeros(jnp.shape(layer), jax.dtypes.float0))


int4_matmul_fused_stacked.defvjp(_stacked_fwd, _stacked_bwd)


# === W4A8 variant: int8 MXU dots, group scales applied to the OUTPUT ========
#
# Roofline (round-5 probe, vla_scripts/exp_int4_probe.py): at decode width
# T≈112 the W4A16 kernel above is MXU-bound, not DMA-bound — its bf16 dots
# floor at 2·T·K·N / 197e12 (gate_up: 0.105 ms), ABOVE the halved int4 DMA
# floor (0.055 ms), so streaming half the bytes cannot show up end-to-end
# (measured: int4 diffusion 725 ms/chunk vs int8 623). The fix is to run
# the dots on the MXU's int8 path (394 TOPS on v5e, 2x the bf16 rate):
# quantize activations per-token to int8 (same dynamic absmax the int8 path
# uses), dot int8ximt8 -> int32 PER SCALE GROUP, and apply the group scale
# to the (bt, bn) OUTPUT partial — f32 weight tiles never exist. Numerics
# become W4A8 (vs W4A16 above): the same trade production int4 serving
# makes (bitsandbytes/AWQ W4A8 kernels; reference openvla_utils.py:282-303
# `load_in_4bit`). Opt in via OPENVLA_INT4_A8=1 (ops/quant.int4_linear).
#
# Group-dot layout: original K rows [g*group, (g+1)*group) of the weight
# live as packed rows [g*g2, (g+1)*g2) — low nibbles = even K, high = odd.
# Concatenating [xe_g | xo_g] column-wise and [lo_g ; hi_g] row-wise forms
# one K-depth = group (=128) int8 dot per group: full MXU depth, exact
# int32 accumulation, one VPU f32 mul-add per output element per group.


def _a8_group_accumulate(xe, xo, w32, sc, g2: int, out_shape):
    """Shared W4A8 block body: unpack nibbles to int8, one full-depth int8
    MXU dot per scale group, group scale applied to the int32 partial.

"""
    lo8 = jnp.right_shift(jnp.left_shift(w32, 28), 28).astype(jnp.int8)
    hi8 = jnp.right_shift(w32, 4).astype(jnp.int8)
    bk2, bn = w32.shape
    gb = bk2 // g2

    def group_partial(xe_g, xo_g, lo_g, hi_g, sc_g):
        xg = jnp.concatenate([xe_g, xo_g], axis=1)
        wg = jnp.concatenate([lo_g, hi_g], axis=0)
        part = jax.lax.dot_general(
            xg, wg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return part.astype(jnp.float32) * sc_g

    # Static unroll for ALL group counts: a fori_loop body needs
    # dynamic_slice, which Mosaic TC kernels do not lower (measured on the
    # chip: "Unimplemented primitive ... dynamic_slice"). The worst case —
    # the 7B down projection's whole-K2 column, 86 groups — compiles
    # (slowly) as an 86-way unroll; acceptable for an opt-in kernel.
    acc = jnp.zeros(out_shape, jnp.float32)
    for g in range(gb):
        rows = slice(g * g2, (g + 1) * g2)
        acc = acc + group_partial(xe[:, rows], xo[:, rows],
                                  lo8[rows], hi8[rows], sc[g][None, :])
    return acc


def _kernel_a8(xe_ref, xo_ref, pk_ref, sc_ref, out_ref, *, g2: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += _a8_group_accumulate(xe_ref[:], xo_ref[:],
                                       pk_ref[:].astype(jnp.int32),
                                       sc_ref[:], g2, out_ref.shape)


def _quantize_act_rows(x2: jnp.ndarray):
    """Per-token symmetric int8 (same scheme as quant._int8_matmul)."""
    xf = x2.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    q = jnp.clip(jnp.round(xf / jnp.maximum(sx, 1e-12)), -127, 127
                 ).astype(jnp.int8)
    return q, sx


@functools.partial(jax.jit, static_argnames=("block_k2", "block_n",
                                             "interpret"))
def _int4_matmul_a8_2d(x2: jnp.ndarray, packed: jnp.ndarray,
                       scales: jnp.ndarray, *, block_k2: int,
                       block_n: int, interpret: bool) -> jnp.ndarray:
    t, k_dim = x2.shape
    k2, n = packed.shape
    g2 = k2 // scales.shape[0]

    import math

    unit = math.lcm(g2, 128)
    bk2 = max(unit, (min(block_k2, k2) // unit) * unit)
    bn = min(block_n, -(-n // 128) * 128)

    x8, sx = _quantize_act_rows(x2)
    xe = _pad_axis(x8[:, 0::2], 1, bk2)
    xo = _pad_axis(x8[:, 1::2], 1, bk2)
    tp = max(32, -(-t // 32) * 32)                     # int8 sublane tile
    bt = min(tp, 512)
    tp = -(-tp // bt) * bt
    xe = _pad_axis(xe, 0, tp)
    xo = _pad_axis(xo, 0, tp)
    pk = _pad_axis(_pad_axis(packed, 0, bk2), 1, bn)
    sc = _pad_axis(_pad_axis(scales, 0, bk2 // g2), 1, bn)

    k2p, np_ = pk.shape
    grid = (tp // bt, np_ // bn, k2p // bk2)
    gb = bk2 // g2

    out = pl.pallas_call(
        functools.partial(_kernel_a8, g2=g2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk2), lambda ti, i, j: (ti, j)),
            pl.BlockSpec((bt, bk2), lambda ti, i, j: (ti, j)),
            pl.BlockSpec((bk2, bn), lambda ti, i, j: (j, i)),
            pl.BlockSpec((gb, bn), lambda ti, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda ti, i, j: (ti, i)),
        out_shape=jax.ShapeDtypeStruct((tp, np_), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * 2 * k2p * np_,
            bytes_accessed=k2p * np_ + xe.size * 2 + tp * np_ * 4,
            transcendentals=0,
        ),
    )(xe, xo, pk, sc)
    return out[:t, :n] * sx


@jax.custom_vjp
def int4_matmul_fused_a8(x: jnp.ndarray, packed: jnp.ndarray,
                         scales: jnp.ndarray) -> jnp.ndarray:
    """W4A8: y = q8(x) @ dequant-int8(packed) * scales, int8 MXU dots.

    Same operand contract as int4_matmul_fused; activations are
    per-token-absmax int8 (straight-through backward, like int8_linear)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    interpret = jax.devices()[0].platform not in ("tpu",)
    out = _int4_matmul_a8_2d(x2, packed, scales.astype(jnp.float32),
                             block_k2=512, block_n=512, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def _a8_fwd(x, packed, scales):
    return (int4_matmul_fused_a8(x, packed, scales),
            (packed, scales, jnp.zeros((0,), x.dtype)))


int4_matmul_fused_a8.defvjp(_a8_fwd, _fused_bwd)


def _kernel_stacked_a8(layer_ref, xe_ref, xo_ref, pk_ref, sc_ref, out_ref,
                       *, g2: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += _a8_group_accumulate(xe_ref[:], xo_ref[:],
                                       pk_ref[0].astype(jnp.int32),
                                       sc_ref[0], g2, out_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_stacked_a8_2d(x2: jnp.ndarray, packed: jnp.ndarray,
                               scales: jnp.ndarray, layer: jnp.ndarray,
                               *, interpret: bool) -> jnp.ndarray:
    t, k_dim = x2.shape
    _, k2, n = packed.shape
    g2 = k2 // scales.shape[-2]
    bk2, bn = _stacked_blocks(k2, n, g2)
    gb = bk2 // g2

    x8, sx = _quantize_act_rows(x2)
    xe = _pad_axis(x8[:, 0::2], 1, bk2)
    xo = _pad_axis(x8[:, 1::2], 1, bk2)
    tp = max(32, -(-t // 32) * 32)                     # int8 sublane tile
    bt = min(tp, 128)
    tp = -(-tp // bt) * bt
    xe = _pad_axis(xe, 0, tp)
    xo = _pad_axis(xo, 0, tp)

    grid = (tp // bt, n // bn, k2 // bk2)
    out = pl.pallas_call(
        functools.partial(_kernel_stacked_a8, g2=g2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, bk2), lambda ti, i, j, l: (ti, j)),
                pl.BlockSpec((bt, bk2), lambda ti, i, j, l: (ti, j)),
                pl.BlockSpec((1, bk2, bn), lambda ti, i, j, l: (l[0], j, i)),
                pl.BlockSpec((1, gb, bn), lambda ti, i, j, l: (l[0], j, i)),
            ],
            out_specs=pl.BlockSpec((bt, bn), lambda ti, i, j, l: (ti, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((tp, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * 2 * k2 * n,
            bytes_accessed=k2 * n + xe.size * 2 + tp * n * 4,
            transcendentals=0,
        ),
    )(jnp.atleast_1d(layer).astype(jnp.int32), xe, xo, packed,
      scales.astype(jnp.float32))
    return out[:t, :n] * sx


@jax.custom_vjp
def int4_matmul_fused_stacked_a8(x: jnp.ndarray, packed: jnp.ndarray,
                                 scales: jnp.ndarray,
                                 layer: jnp.ndarray) -> jnp.ndarray:
    """W4A8 stacked variant (scalar-prefetch layer indexing); see
    int4_matmul_fused_stacked / int4_matmul_fused_a8."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    interpret = jax.devices()[0].platform not in ("tpu",)
    out = _int4_matmul_stacked_a8_2d(x2, packed, scales, layer,
                                     interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def _stacked_a8_fwd(x, packed, scales, layer):
    return (int4_matmul_fused_stacked_a8(x, packed, scales, layer),
            (packed, scales, layer, jnp.zeros((0,), x.dtype)))


int4_matmul_fused_stacked_a8.defvjp(_stacked_a8_fwd, _stacked_bwd)
