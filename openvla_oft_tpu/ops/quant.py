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

# Subtrees never quantized: the output head's kernel is consumed directly by
# lm_logits (not via the quant-aware linear()), and bitsandbytes load_in_8bit
# (the reference analog) keeps the lm_head in high precision too.
_QUANT_EXCLUDE = frozenset({"lm_head"})


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(in, out) float -> {"kernel": int8 (in, out), "scale_w": f32 (out,)}."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # per out-channel
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -127, 127)
    return {"kernel": q.astype(jnp.int8), "scale_w": scale[..., 0, :]}


@jax.custom_vjp
def _int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                 scale_w: jnp.ndarray) -> jnp.ndarray:
    """Straight-through int8 matmul: int8 MXU forward; backward differentiates
    through the *dequantized* weight (QLoRA-style), so activation gradients
    flow through int8-frozen layers instead of hitting round()'s zero
    derivative. This is what makes single-chip 7B LoRA training fit in 16 GB
    (int8 base ~7.5 GB vs bf16 ~15 GB) while keeping useful gradients."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0   # (..., T, 1)
    qx = jnp.clip(jnp.round(xf / jnp.maximum(sx, 1e-12)), -127, 127
                  ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qx, kernel,
        dimension_numbers=(((qx.ndim - 1,), (kernel.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * scale_w.astype(jnp.float32)


def _int8_matmul_fwd(x, kernel, scale_w):
    # residuals must be jax types: carry x's dtype as a 0-size array
    return (_int8_matmul(x, kernel, scale_w),
            (kernel, scale_w, jnp.zeros((0,), x.dtype)))


def _int8_matmul_bwd(res, g):
    kernel, scale_w, x_proto = res
    x_dtype = x_proto.dtype
    # One layer's dequantized weight as a bf16 transient (90 MB on the 7B
    # MLP) — never the whole stacked tree. bf16 backward matmul with fp32
    # accumulation matches torch-autocast backward semantics.
    wdeq = kernel.astype(jnp.bfloat16) * scale_w[..., None, :].astype(jnp.bfloat16)
    gx = jax.lax.dot_general(
        g.astype(jnp.bfloat16), wdeq,
        dimension_numbers=(((g.ndim - 1,), (wdeq.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_dtype)
    # Frozen-base training: no weight/scale gradients (int kernels take
    # float0 cotangents; scale_w gets symbolic zeros).
    import numpy as _np

    return (gx,
            _np.zeros(kernel.shape, jax.dtypes.float0),
            jnp.zeros_like(scale_w))


_int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


@jax.custom_vjp
def _int8_matmul_static(x: jnp.ndarray, kernel: jnp.ndarray,
                        scale_w: jnp.ndarray,
                        scale_x: jnp.ndarray) -> jnp.ndarray:
    """Static-scale activation quant: `scale_x` is a calibrated per-layer
    scalar (shape () — or (L,) for a stacked (L, in, out) kernel), so
    quantizing x is one fused elementwise pass (mul+round+clip) — no
    per-token absmax reduction between the producer op and the matmul.
    This is the int8 serving mode's remaining-fat fix: the dynamic machinery
    (absmax reduce + scale + s8 cast per projection group) measured
    ~0.15 ms/layer ≈ 4.8 ms per LIBERO chunk (docs/PERFORMANCE.md).
    Activations beyond the calibrated range saturate at ±127 (standard
    static-quant semantics). Backward matches `_int8_matmul` (straight-through
    via the dequantized weight). Calibrate + attach via
    `ops/quant_calibrate.py::attach_static_act_scales`."""
    xf = x.astype(jnp.float32)
    sxf = scale_x.astype(jnp.float32)
    if sxf.ndim == 0 or kernel.ndim == 2:
        # Scalar scale (or a flat kernel): one quantized copy of x serves all
        # output layers — identical contraction to the dynamic path.
        inv = 1.0 / jnp.maximum(sxf.reshape(()), 1e-12)
        qx = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qx, kernel,
            dimension_numbers=(((qx.ndim - 1,), (kernel.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sxf * scale_w.astype(jnp.float32))
    # Per-layer (L,) scales with a stacked (L, in, out) kernel: x quantizes
    # differently per layer, so the contraction runs with L as a batch dim.
    # Output matches the dynamic path's (..., L, out) layout.
    assert sxf.shape == kernel.shape[:1], (sxf.shape, kernel.shape)
    inv = 1.0 / jnp.maximum(sxf, 1e-12)                       # (L,)
    qx = jnp.clip(jnp.round(xf[..., None, :] * inv[:, None]), -127, 127
                  ).astype(jnp.int8)                          # (..., L, in)
    acc = jax.lax.dot_general(
        qx, kernel,
        dimension_numbers=(((qx.ndim - 1,), (1,)), ((qx.ndim - 2,), (0,))),
        preferred_element_type=jnp.int32)                     # (L, ..., out)
    deq = acc.astype(jnp.float32) * (sxf[:, None]
                                     * scale_w.astype(jnp.float32))[
        (slice(None),) + (None,) * (acc.ndim - 2) + (slice(None),)]
    return jnp.moveaxis(deq, 0, -2)                           # (..., L, out)


def _int8_matmul_static_fwd(x, kernel, scale_w, scale_x):
    return (_int8_matmul_static(x, kernel, scale_w, scale_x),
            (kernel, scale_w, jnp.zeros((0,), x.dtype),
             jnp.zeros((0,) + scale_x.shape, scale_x.dtype)))


def _int8_matmul_static_bwd(res, g):
    kernel, scale_w, x_proto, sx_proto = res
    gx, gk, gs = _int8_matmul_bwd((kernel, scale_w, x_proto), g)
    # scale_x is calibration state, not a trained param: zero cotangent in
    # its own dtype (a hardcoded f32 zero trips custom_vjp's aval check the
    # moment scale_x is stored in bf16 like other small params).
    return (gx, gk, gs, jnp.zeros(sx_proto.shape[1:], sx_proto.dtype))


_int8_matmul_static.defvjp(_int8_matmul_static_fwd, _int8_matmul_static_bwd)


def int8_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Activation quant + int8 MXU matmul + fused dequant.

    Dynamic per-token activation scales by default; a calibrated per-layer
    "scale_x" in the param dict switches to the static path
    (`_int8_matmul_static` — attach via `attach_static_act_scales`).
    Supports stacked kernels (L, in, out) with scale_w (L, out).
    Differentiable wrt x (straight-through, see _int8_matmul) — the QLoRA
    training path backprops through int8-frozen bases.
    """
    if "scale_x" in p:
        y = _int8_matmul_static(x, p["kernel"], p["scale_w"], p["scale_x"])
    else:
        y = _int8_matmul(x, p["kernel"], p["scale_w"])
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# === Int4 weight-only (reference `load_in_4bit` analog) ===
# Group-wise symmetric 4-bit weights packed two-per-int8; dequantized to the
# activation dtype at use. Halves weight memory vs int8 (7B Llama: 3.7 GB);
# the dequant materializes only one layer's weights transiently, so the
# capacity win holds even though the matmul itself runs in bf16.
INT4_GROUP = 128


def _int4_group_for(d_in: int, group: int = INT4_GROUP) -> int:
    """Largest even divisor of d_in that is <= the requested group size.

    Real dims are rarely all 128-divisible (SigLIP so400m MLP d_in=4304 ->
    group 16); finer groups only improve accuracy at a little scale storage.
    Returns 0 when d_in is odd (unpackable two-per-int8 -> caller skips)."""
    if d_in % 2:
        return 0
    g = min(group, d_in)
    while g > 2 and (d_in % g or g % 2):
        g -= 1
    return g


def quantize_weight_int4(w: jnp.ndarray, group: int = INT4_GROUP) -> Dict[str, jnp.ndarray]:
    """(..., in, out) float -> packed {"kernel_q4": int8 (..., in/2, out),
    "scale_w4": f32 (..., in/group', out)} with group' adapted to divide
    d_in (see _int4_group_for). d_in must be even (packing)."""
    *lead, d_in, d_out = w.shape
    group = _int4_group_for(d_in, group)
    assert group, f"int4 packing needs even d_in, got {d_in}"
    wf = w.astype(jnp.float32).reshape(*lead, d_in // group, group, d_out)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = absmax / 7.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -7, 7
                 ).astype(jnp.int8)
    q = q.reshape(*lead, d_in, d_out)
    low, high = q[..., 0::2, :], q[..., 1::2, :]
    packed = ((high.astype(jnp.uint8) << 4) |
              (low.astype(jnp.uint8) & 0xF)).astype(jnp.int8)
    return {"kernel_q4": packed, "scale_w4": scale[..., 0, :].reshape(
        *lead, d_in // group, d_out)}


def _unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 (..., in/2, out) -> int8 (..., in, out), sign-extended nibbles."""
    low = jnp.left_shift(packed, 4)
    low = jnp.right_shift(low, 4)                        # sign-extend low nibble
    high = jnp.right_shift(packed, 4)                    # arithmetic shift
    *lead, half, d_out = packed.shape
    stacked = jnp.stack([low, high], axis=-2)            # (..., half, 2, out)
    return stacked.reshape(*lead, half * 2, d_out)


def int4_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ dequant(int4 weights) (+ bias).

    2D kernels (incl. per-layer slices inside the llama scan) take the fused
    Pallas path (ops/int4_matmul.py): packed bytes stay packed across the
    HBM->VMEM DMA and unpack on the VPU tile-by-tile, so the weight stream
    is half the int8 path's. The XLA fallback below unpacks the WHOLE weight
    at HBM precision first — measured 258 ms vs 12.5 ms int8 for one decode
    step on v5e (docs/PERFORMANCE.md roofline) — and remains for stacked
    (L, in/2, out) kernels mapped outside a scan and for large-row batches
    (>1024 rows, e.g. training prefill), where the matmul is MXU-bound and
    XLA's one-shot dequant amortizes better than per-row-block re-dequant.

    Gradient contract: int4 weights AND their group scales are frozen
    serving/QLoRA-base artifacts — only x receives a cotangent (the fused
    kernels' custom_vjp returns zeros for scales; the XLA path pins the same
    semantics via stop_gradient so dispatch shape never changes gradients).
    Quant-aware scale tuning would need a real scale cotangent in
    int4_matmul._fused_bwd/_stacked_bwd first.
    """
    import os as _os

    p = dict(p)
    p["scale_w4"] = jax.lax.stop_gradient(p["scale_w4"])
    # OPENVLA_INT4_A8=1 (trace-time) switches the fused kernels to W4A8:
    # per-token int8 activations + int8 MXU dots + group scales on the
    # OUTPUT (ops/int4_matmul.py "W4A8 variant" — the bf16-dot kernel is
    # MXU-bound at decode widths, so halved DMA alone cannot win). The XLA
    # fallback keeps W4A16 numerics; a8 accuracy is validated like int8's
    # (docs/QUANTIZATION.md).
    a8 = _os.environ.get("OPENVLA_INT4_A8", "0") == "1"
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if "layer_idx" in p and p["kernel_q4"].ndim == 3:
        # Scan-resident stacked weight + traced layer index (models/llama.py
        # `_index_layer`): stream blocks straight from the stacked HBM
        # buffer via scalar prefetch — never materialize the layer slice.
        from openvla_oft_tpu.ops.int4_matmul import (
            int4_matmul_fused_stacked, int4_matmul_fused_stacked_a8,
            supports_stacked_fused)

        if rows <= 1024 and supports_stacked_fused(p["kernel_q4"].shape,
                                                   p["scale_w4"].shape):
            fn = int4_matmul_fused_stacked_a8 if a8 else \
                int4_matmul_fused_stacked
            y = fn(x, p["kernel_q4"], p["scale_w4"], p["layer_idx"])
        else:
            y = _int4_matmul_xla(x, p["kernel_q4"][p["layer_idx"]],
                                 p["scale_w4"][p["layer_idx"]])
    elif (p["kernel_q4"].ndim == 2 and rows <= 1024
          and (p["kernel_q4"].shape[0] // p["scale_w4"].shape[0]) % 8 == 0):
        # g2 % 8 guard: the kernel's group reshape needs sublane-tiled
        # groups (see int4_matmul._stacked_blocks); awkward d_in values
        # (g2 < 8) fall back to the XLA dequant.
        from openvla_oft_tpu.ops.int4_matmul import (int4_matmul_fused,
                                                     int4_matmul_fused_a8)

        fn = int4_matmul_fused_a8 if a8 else int4_matmul_fused
        y = fn(x, p["kernel_q4"], p["scale_w4"])
    else:
        y = _int4_matmul_xla(x, p["kernel_q4"], p["scale_w4"])
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _int4_matmul_xla(x: jnp.ndarray, packed: jnp.ndarray,
                     scales: jnp.ndarray) -> jnp.ndarray:
    """Unpack-then-dot fallback: dequantizes the WHOLE weight first (round
    trips full-size tensors through HBM). Kept for stacked (L, in/2, out)
    kernels mapped outside a scan and MXU-bound large-row batches."""
    q = _unpack_int4(packed).astype(jnp.float32)
    *lead, d_in, d_out = q.shape
    groups = scales.shape[-2]
    w = (q.reshape(*lead, groups, d_in // groups, d_out)
         * scales[..., :, None, :]).reshape(*lead, d_in, d_out)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)


def quantize_tree_lowmem(params: Params, min_dim: int = 1024,
                         bits: int = 8) -> Params:
    """Quantize leaf by leaf, DONATING each source kernel.

    The plain `quantize_tree` under jit materializes fp32 intermediates for
    whole stacked (L, in, out) kernels — on a 16 GB chip the 7B tree cannot
    coexist with its quantized copy. Here each kernel is quantized as a
    per-layer `lax.map` (one layer of fp32 transient, ~200 MB) with the
    source buffer donated, so peak memory is original + one layer.

    bits=8 -> int8 MXU path; bits=4 -> packed group-wise int4, dequantized
    to the activation dtype at use (3.7 GB on the 7B — the extra HBM headroom
    the b>=2 QLoRA configurations need).

    CONSUMES `params`: the input tree's quantized kernels are invalidated.
    """
    import functools

    assert bits in (4, 8)
    qw = quantize_weight if bits == 8 else quantize_weight_int4

    @functools.partial(jax.jit, donate_argnums=0)
    def q_stacked(k):
        return jax.lax.map(qw, k)

    @functools.partial(jax.jit, donate_argnums=0)
    def q_flat(k):
        return qw(k)

    def visit(node, name=""):
        if isinstance(node, dict):
            if name in _QUANT_EXCLUDE:
                return node
            if "kernel" in node and isinstance(node["kernel"], jnp.ndarray) \
                    and node["kernel"].ndim >= 2 \
                    and node["kernel"].dtype != jnp.int8 \
                    and node["kernel"].shape[-2] >= min_dim \
                    and (bits == 8 or node["kernel"].shape[-2] % 2 == 0):
                k = node.pop("kernel")
                q = (q_stacked if k.ndim == 3 else q_flat)(k)
                if bits == 8:
                    node["kernel"] = q["kernel"]
                    node["scale_w"] = q["scale_w"]
                else:
                    node["kernel_q4"] = q["kernel_q4"]
                    node["scale_w4"] = q["scale_w4"]
                return node
            return {key: visit(v, key) for key, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def quantize_tree(params: Params, min_dim: int = 1024,
                  bits: int = 8) -> Params:
    """Quantize every 'kernel' leaf whose contraction dim >= min_dim.

    bits=8 -> int8 weights + dynamic int8 activations (MXU int8 path);
    bits=4 -> packed int4 weights, dequantized to bf16 at use (capacity).
    Norm scales, biases, embeddings, and small projections stay high
    precision (standard weight-only-quant practice).
    """
    assert bits in (4, 8)

    def visit(node, name=""):
        if isinstance(node, dict):
            if name in _QUANT_EXCLUDE:
                # lm_head stays high precision: lm_logits consumes the kernel
                # directly (not through the quant-aware linear()), and the
                # reference analog (bitsandbytes load_in_8bit) likewise skips
                # the output head.
                return node
            if "kernel" in node and isinstance(node["kernel"], jnp.ndarray) \
                    and node["kernel"].ndim >= 2 \
                    and node["kernel"].dtype != jnp.int8 \
                    and node["kernel"].shape[-2] >= min_dim \
                    and (bits == 8 or node["kernel"].shape[-2] % 2 == 0):
                out = dict(node)
                if bits == 8:
                    q = quantize_weight(node["kernel"])
                    out["kernel"] = q["kernel"]
                    out["scale_w"] = q["scale_w"]
                else:
                    q = quantize_weight_int4(node["kernel"])
                    del out["kernel"]
                    out["kernel_q4"] = q["kernel_q4"]
                    out["scale_w4"] = q["scale_w4"]
                return out
            return {k: visit(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)
