"""Fused int4 dequant-matmul Pallas kernel (ops/int4_matmul.py).

Parity target: `ops/quant.py::int4_linear` (the XLA unpack-then-matmul
path) — both dequantize the same `quantize_weight_int4` packing, so outputs
must agree to bf16-matmul tolerance. Reference analog: bitsandbytes 4-bit
fused dequant kernels (reference openvla_utils.py:282-303).

Runs in Pallas interpret mode on CPU (same numerics as the compiled TPU
kernel modulo accumulation order).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_oft_tpu.ops.int4_matmul import int4_matmul_fused
from openvla_oft_tpu.ops.quant import (int4_linear, quantize_weight_int4,
                                       _int4_group_for)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("t,k,n", [
    (112, 256, 384),      # decode-suffix-like, multi k-block after padding
    (5, 130, 64),         # odd T, k not lane-aligned (pad path), small n
    (16, 4304 % 512 + 256, 128),  # group' < 128 via _int4_group_for
    (600, 256, 128),      # T > 512: multi-row-block grid path
])
def test_fused_matches_xla_unpack(rng, t, k, n):
    k += k % 2
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    x = rng.normal(size=(t, k)).astype(np.float32)
    q = quantize_weight_int4(jnp.asarray(w))
    ref = np.asarray(int4_linear(q, jnp.asarray(x, jnp.bfloat16)))
    out = np.asarray(int4_matmul_fused(jnp.asarray(x, jnp.bfloat16),
                                       q["kernel_q4"], q["scale_w4"]))
    assert out.shape == (t, n)
    # ref is bf16-rounded output of a bf16 matmul; the kernel keeps f32
    # accumulators, so compare at bf16 resolution.
    np.testing.assert_allclose(out, ref.astype(np.float32), rtol=2e-2,
                               atol=2e-2 * np.abs(ref).max())


def test_fused_batch_dims(rng):
    w = rng.normal(size=(128, 64)).astype(np.float32) * 0.05
    x = rng.normal(size=(2, 3, 128)).astype(np.float32)
    q = quantize_weight_int4(jnp.asarray(w))
    out = np.asarray(int4_matmul_fused(jnp.asarray(x, jnp.bfloat16),
                                       q["kernel_q4"], q["scale_w4"]))
    flat = np.asarray(int4_matmul_fused(
        jnp.asarray(x.reshape(6, 128), jnp.bfloat16),
        q["kernel_q4"], q["scale_w4"]))
    assert out.shape == (2, 3, 64)
    np.testing.assert_array_equal(out.reshape(6, 64), flat)


def test_fused_grad_matches_dequant_path(rng):
    """custom_vjp backward == grad through the explicitly dequantized W."""
    w = rng.normal(size=(64, 32)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    q = quantize_weight_int4(jnp.asarray(w))
    groups = q["scale_w4"].shape[0]
    from openvla_oft_tpu.ops.quant import _unpack_int4

    wd = (_unpack_int4(q["kernel_q4"]).astype(jnp.float32)
          .reshape(groups, 64 // groups, 32)
          * q["scale_w4"][:, None, :]).reshape(64, 32)

    g_fused = jax.grad(lambda xx: jnp.sum(
        int4_matmul_fused(xx, q["kernel_q4"], q["scale_w4"]) ** 2))(x)
    g_ref = jax.grad(lambda xx: jnp.sum(
        jax.lax.dot_general(xx.astype(jnp.bfloat16), wd.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-2)


def test_linear_dispatch_thresholds(rng):
    """int4_linear: fused kernel for <=1024 rows, XLA dequant above —
    both produce the same numbers (they dequantize identical packings)."""
    w = rng.normal(size=(64, 32)).astype(np.float32) * 0.05
    q = quantize_weight_int4(jnp.asarray(w))
    x_small = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    x_big = jnp.asarray(rng.normal(size=(1030, 64)), jnp.float32)
    for x in (x_small, x_big):
        got = np.asarray(int4_linear(q, x))
        ref = np.asarray(int4_matmul_fused(x, q["kernel_q4"], q["scale_w4"]))
        np.testing.assert_allclose(got.astype(np.float32), ref, rtol=2e-2,
                                   atol=2e-2 * np.abs(ref).max() + 1e-6)


def test_stacked_matches_sliced_xla(rng):
    """Scalar-prefetch stacked kernel == XLA dequant of the layer slice,
    for every layer index, incl. under a lax.scan with a traced index."""
    from openvla_oft_tpu.ops.int4_matmul import (int4_matmul_fused_stacked,
                                                 supports_stacked_fused)
    from openvla_oft_tpu.ops.quant import _int4_matmul_xla

    L, k, n, t = 3, 512, 256, 7
    w = rng.normal(size=(L, k, n)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(t, k)), jnp.bfloat16)
    q = quantize_weight_int4(jnp.asarray(w))
    assert supports_stacked_fused(q["kernel_q4"].shape, q["scale_w4"].shape)

    refs = [np.asarray(_int4_matmul_xla(x, q["kernel_q4"][i],
                                        q["scale_w4"][i]))
            for i in range(L)]
    for i in range(L):
        out = np.asarray(int4_matmul_fused_stacked(
            x, q["kernel_q4"], q["scale_w4"], jnp.asarray(i)))
        np.testing.assert_allclose(out, refs[i], rtol=2e-2,
                                   atol=2e-2 * np.abs(refs[i]).max())

    def body(carry, i):
        y = int4_matmul_fused_stacked(x, q["kernel_q4"], q["scale_w4"], i)
        return carry + jnp.sum(y), y

    total, ys = jax.lax.scan(body, jnp.zeros(()), jnp.arange(L))
    for i in range(L):
        np.testing.assert_allclose(np.asarray(ys[i]), refs[i], rtol=2e-2,
                                   atol=2e-2 * np.abs(refs[i]).max())


def test_stacked_support_predicate():
    """Tilings that would require padding the stacked buffer are refused
    (padding = whole-tree copy, the cost the kernel exists to avoid)."""
    from openvla_oft_tpu.ops.int4_matmul import supports_stacked_fused

    # d_in=4304 (SigLIP so400m MLP): group'=16 -> g2=8, K2=2152 not a
    # multiple of lcm(8,128)=128 -> unsupported.
    assert not supports_stacked_fused((4, 2152, 128), (4, 269, 128))
    # 2D shape is not a stacked kernel.
    assert not supports_stacked_fused((256, 128), (2, 128))
    # Llama-7B decode shapes all tile cleanly.
    assert supports_stacked_fused((32, 2048, 12288), (32, 32, 12288))
    assert supports_stacked_fused((32, 2048, 22016), (32, 32, 22016))
    assert supports_stacked_fused((32, 5504, 4096), (32, 86, 4096))


def test_stacked_grad_matches_dequant(rng):
    """custom_vjp backward through the stacked kernel == grad through the
    explicitly dequantized layer slice."""
    from openvla_oft_tpu.ops.int4_matmul import int4_matmul_fused_stacked
    from openvla_oft_tpu.ops.quant import _unpack_int4

    L, k, n = 2, 256, 128
    w = rng.normal(size=(L, k, n)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(4, k)), jnp.float32)
    q = quantize_weight_int4(jnp.asarray(w))
    i = 1
    groups = q["scale_w4"].shape[-2]
    wd = (_unpack_int4(q["kernel_q4"][i]).astype(jnp.float32)
          .reshape(groups, k // groups, n)
          * q["scale_w4"][i][:, None, :]).reshape(k, n)
    g_fused = jax.grad(lambda xx: jnp.sum(int4_matmul_fused_stacked(
        xx, q["kernel_q4"], q["scale_w4"], jnp.asarray(i)) ** 2))(x)
    g_ref = jax.grad(lambda xx: jnp.sum(
        jax.lax.dot_general(xx.astype(jnp.bfloat16), wd.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-2)


def test_int4_suffix_forward_by_index_scan(rng):
    """llama_suffix_forward with int4 layers (by-index scan, stacked
    weights) == the sliced-scan formulation on the same quantized params."""
    from openvla_oft_tpu.config import LlamaConfig
    from openvla_oft_tpu.models import llama as llama_mod
    from openvla_oft_tpu.models.llama import (init_llama_params,
                                              llama_suffix_forward)
    from openvla_oft_tpu.ops.quant import quantize_tree

    cfg = LlamaConfig(vocab_size=128, hidden_size=512, intermediate_size=512,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      max_position_embeddings=128)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = dict(params)
    params["layers"] = quantize_tree(params["layers"], min_dim=512, bits=4)
    assert llama_mod._has_int4(params["layers"])

    b, s_pre, s_suf = 1, 3, 4
    suffix = jnp.asarray(rng.normal(size=(b, s_suf, 512)) * 0.02,
                         jnp.float32)
    pk = jnp.asarray(rng.normal(
        size=(2, b, s_pre, 4, cfg.head_dim)) * 0.02, jnp.float32)
    pv = jnp.asarray(rng.normal(
        size=(2, b, s_pre, 4, cfg.head_dim)) * 0.02, jnp.float32)
    pos = jnp.broadcast_to(s_pre + jnp.arange(s_suf), (b, s_suf))
    mask = jnp.ones((b, 1, s_suf, s_pre + s_suf), bool)

    out = llama_suffix_forward(params, cfg, suffix, pk, pv, pos, mask)

    # Force the legacy sliced-scan path on identical quantized params.
    orig = llama_mod._has_int4
    llama_mod._has_int4 = lambda layers: False
    try:
        ref = llama_suffix_forward(params, cfg, suffix, pk, pv, pos, mask)
    finally:
        llama_mod._has_int4 = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2,
                               atol=3e-2 * np.abs(np.asarray(ref)).max())


def test_group_adaptation_shapes():
    """d_in=4304 (SigLIP so400m MLP) adapts to group 16; kernel accepts it."""
    assert _int4_group_for(4304) == 16
    w = jnp.ones((4304, 8), jnp.float32)
    q = quantize_weight_int4(w)
    out = int4_matmul_fused(jnp.ones((2, 4304), jnp.bfloat16),
                            q["kernel_q4"], q["scale_w4"])
    assert out.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(out), 4304.0, rtol=2e-2)


def _tiny_int4_llama(rng):
    from openvla_oft_tpu.config import LlamaConfig
    from openvla_oft_tpu.models import llama as llama_mod
    from openvla_oft_tpu.models.llama import init_llama_params
    from openvla_oft_tpu.ops.quant import quantize_tree

    cfg = LlamaConfig(vocab_size=128, hidden_size=512, intermediate_size=512,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      max_position_embeddings=128)
    params = dict(init_llama_params(jax.random.PRNGKey(0), cfg,
                                    dtype=jnp.float32))
    params["layers"] = quantize_tree(params["layers"], min_dim=512, bits=4)
    assert llama_mod._has_int4(params["layers"])
    return cfg, params, llama_mod


def test_int4_prefill_by_index_scan_matches_sliced(rng):
    """llama_prefill with int4 layers (by-index scan) == sliced-scan path on
    the same quantized params (advisor r4: this branch had no parity test)."""
    from openvla_oft_tpu.models.llama import KVCache, llama_prefill

    cfg, params, llama_mod = _tiny_int4_llama(rng)
    b, s = 1, 6
    x = jnp.asarray(rng.normal(size=(b, s, 512)) * 0.02, jnp.float32)
    cache = KVCache.create(cfg, b, 16, dtype=jnp.float32)

    out, c_out = llama_prefill(params, cfg, x, cache)
    orig = llama_mod._has_int4
    llama_mod._has_int4 = lambda layers: False
    try:
        ref, c_ref = llama_prefill(params, cfg, x, cache)
    finally:
        llama_mod._has_int4 = orig
    tol = 3e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=tol,
                               atol=tol * np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(c_out.k), np.asarray(c_ref.k),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(c_out.v), np.asarray(c_ref.v),
                               rtol=tol, atol=tol)


def test_int4_decode_step_by_index_scan_matches_sliced(rng):
    """llama_decode_step int4 branch == sliced-scan path (advisor r4)."""
    from openvla_oft_tpu.models.llama import KVCache, llama_decode_step, \
        llama_prefill

    cfg, params, llama_mod = _tiny_int4_llama(rng)
    b = 1
    x = jnp.asarray(rng.normal(size=(b, 4, 512)) * 0.02, jnp.float32)
    cache = KVCache.create(cfg, b, 16, dtype=jnp.float32)
    _, cache = llama_prefill(params, cfg, x, cache)
    tok = jnp.asarray(rng.normal(size=(b, 1, 512)) * 0.02, jnp.float32)

    out, c_out = llama_decode_step(params, cfg, tok, cache)
    orig = llama_mod._has_int4
    llama_mod._has_int4 = lambda layers: False
    try:
        ref, c_ref = llama_decode_step(params, cfg, tok, cache)
    finally:
        llama_mod._has_int4 = orig
    tol = 3e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=tol,
                               atol=tol * np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(c_out.k), np.asarray(c_ref.k),
                               rtol=tol, atol=tol)


def test_index_layer_recurses_nested_dicts():
    """_index_layer must recurse into dict-valued entries living beside a
    packed kernel instead of indexing them as array leaves (advisor r4)."""
    from openvla_oft_tpu.models.llama import _index_layer

    L = 3
    layers = {
        "attn": {
            "wq": {
                "kernel_q4": jnp.zeros((L, 8, 16), jnp.int8),
                "scale_w4": jnp.zeros((L, 1, 16), jnp.float32),
                "extra": {"sub": jnp.arange(L * 2.0).reshape(L, 2)},
            },
        },
        "plain": {"kernel": jnp.arange(L * 4.0).reshape(L, 4)},
    }
    out = _index_layer(layers, jnp.asarray(1))
    assert out["attn"]["wq"]["kernel_q4"].shape == (L, 8, 16)  # stays stacked
    assert int(out["attn"]["wq"]["layer_idx"]) == 1
    np.testing.assert_array_equal(np.asarray(out["attn"]["wq"]["extra"]["sub"]),
                                  np.asarray([2.0, 3.0]))
    np.testing.assert_array_equal(np.asarray(out["plain"]["kernel"]),
                                  np.asarray([4.0, 5.0, 6.0, 7.0]))


# === W4A8 variant (int8 MXU dots, output group-scaling) =====================


def _w4a8_reference(x, q):
    """Reference W4A8 math in plain numpy: per-token int8 acts, exact int32
    per-group dots, f32 output scaling."""
    from openvla_oft_tpu.ops.quant import _unpack_int4

    xf = np.asarray(x, np.float32)
    sx = np.max(np.abs(xf), axis=-1, keepdims=True) / 127.0
    x8 = np.clip(np.round(xf / np.maximum(sx, 1e-12)), -127, 127
                 ).astype(np.int32)
    w4 = np.asarray(_unpack_int4(q["kernel_q4"]), np.int32)     # (K, N)
    sc = np.asarray(q["scale_w4"], np.float32)                  # (G, N)
    k, n = w4.shape
    g = sc.shape[0]
    # straightforward per-group loop (tiny shapes)
    out = np.zeros((x8.shape[0], n), np.float32)
    gsz = k // g
    for gi in range(g):
        rows = slice(gi * gsz, (gi + 1) * gsz)
        out += (x8[:, rows] @ w4[rows]).astype(np.float32) * sc[gi][None, :]
    return out * sx


@pytest.mark.parametrize("t,k,n", [
    (112, 256, 384),      # decode-suffix-like
    (5, 128, 128),        # minimal single block, odd T (int8 sublane pad)
    (600, 256, 128),      # multi-row-block grid
])
def test_a8_matches_reference_math(rng, t, k, n):
    from openvla_oft_tpu.ops.int4_matmul import int4_matmul_fused_a8

    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    x = rng.normal(size=(t, k)).astype(np.float32)
    q = quantize_weight_int4(jnp.asarray(w))
    ref = _w4a8_reference(x, q)
    out = np.asarray(int4_matmul_fused_a8(jnp.asarray(x),
                                          q["kernel_q4"], q["scale_w4"]))
    assert out.shape == (t, n)
    # int32 dots are exact; the only divergence is f32 association order.
    np.testing.assert_allclose(out, ref, rtol=1e-5,
                               atol=1e-5 * np.abs(ref).max())


def test_a8_close_to_w4a16(rng):
    """W4A8 adds ~1/127 relative activation noise on top of W4A16 — the
    outputs must stay close (this bounds the serving-accuracy delta)."""
    from openvla_oft_tpu.ops.int4_matmul import (int4_matmul_fused,
                                                 int4_matmul_fused_a8)

    w = rng.normal(size=(512, 256)).astype(np.float32) * 0.05
    x = rng.normal(size=(64, 512)).astype(np.float32)
    q = quantize_weight_int4(jnp.asarray(w))
    a16 = np.asarray(int4_matmul_fused(jnp.asarray(x, jnp.bfloat16),
                                       q["kernel_q4"], q["scale_w4"]))
    a8 = np.asarray(int4_matmul_fused_a8(jnp.asarray(x),
                                         q["kernel_q4"], q["scale_w4"]))
    denom = np.abs(a16).max()
    assert np.abs(a8 - a16).max() / denom < 3e-2


def test_a8_stacked_matches_2d(rng):
    from openvla_oft_tpu.ops.int4_matmul import (int4_matmul_fused_a8,
                                                 int4_matmul_fused_stacked_a8,
                                                 supports_stacked_fused)

    L, k, n = 3, 256, 128
    ws = rng.normal(size=(L, k, n)).astype(np.float32) * 0.05
    qs = [quantize_weight_int4(jnp.asarray(w)) for w in ws]
    packed = jnp.stack([q["kernel_q4"] for q in qs])
    scales = jnp.stack([q["scale_w4"] for q in qs])
    assert supports_stacked_fused(packed.shape, scales.shape)
    x = jnp.asarray(rng.normal(size=(7, k)), jnp.float32)
    for layer in range(L):
        out = np.asarray(int4_matmul_fused_stacked_a8(
            x, packed, scales, jnp.asarray(layer)))
        ref = np.asarray(int4_matmul_fused_a8(
            x, qs[layer]["kernel_q4"], qs[layer]["scale_w4"]))
        np.testing.assert_allclose(out, ref, rtol=1e-5,
                                   atol=1e-5 * np.abs(ref).max())


def test_a8_straight_through_grad(rng):
    """x cotangent flows through the dequantized weight (straight-through,
    same contract as the W4A16 kernel); packed/scales get zeros."""
    from openvla_oft_tpu.ops.int4_matmul import int4_matmul_fused_a8

    w = rng.normal(size=(128, 128)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    q = quantize_weight_int4(jnp.asarray(w))

    def loss(x):
        return jnp.sum(int4_matmul_fused_a8(x, q["kernel_q4"],
                                            q["scale_w4"]) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_a8_dispatch_env(rng, monkeypatch):
    """int4_linear routes to the a8 kernels iff OPENVLA_INT4_A8=1."""
    from openvla_oft_tpu.ops import quant as Q

    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    q = quantize_weight_int4(jnp.asarray(w))

    monkeypatch.setenv("OPENVLA_INT4_A8", "1")
    out_a8 = np.asarray(Q.int4_linear(q, x), np.float32)
    monkeypatch.setenv("OPENVLA_INT4_A8", "0")
    out_a16 = np.asarray(Q.int4_linear(q, x), np.float32)

    from openvla_oft_tpu.ops.int4_matmul import (int4_matmul_fused,
                                                 int4_matmul_fused_a8)
    ref_a8 = np.asarray(int4_matmul_fused_a8(x, q["kernel_q4"],
                                             q["scale_w4"]),
                        np.float32).astype(jnp.bfloat16).astype(np.float32)
    ref_a16 = np.asarray(int4_matmul_fused(x, q["kernel_q4"],
                                           q["scale_w4"]),
                         np.float32).astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(out_a8, ref_a8)
    np.testing.assert_array_equal(out_a16, ref_a16)


def test_a8_many_groups_unrolled(rng):
    """Large group counts (the 7B down projection's whole-K2 column has 86)
    stay on the static unroll — fori_loop bodies need dynamic_slice, which
    Mosaic TC kernels refuse to lower (measured on chip). Check a 16-group
    block against the reference math."""
    from openvla_oft_tpu.ops import int4_matmul as M

    k, n = 2048, 128         # group 128 -> g2=64 -> gb=16 in a 1024-block
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(8, k)), jnp.float32)
    q = quantize_weight_int4(jnp.asarray(w))
    out = np.asarray(M.int4_matmul_fused_a8(x, q["kernel_q4"],
                                            q["scale_w4"]))
    ref = _w4a8_reference(np.asarray(x), q)
    np.testing.assert_allclose(out, ref, rtol=1e-5,
                               atol=1e-5 * np.abs(ref).max())
