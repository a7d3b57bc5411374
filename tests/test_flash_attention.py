"""Pallas flash-attention kernel vs the XLA reference path (interpret mode on
CPU; the identical kernel runs compiled on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openvla_oft_tpu.ops.attention import attention, attention_xla
from openvla_oft_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b=2, s=70, h=4, d=128, hkv=None):
    hkv = hkv or h
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    return q, k, v


def _dense_from_1d(key_valid, bidir, s, causal=True):
    allow = key_valid[:, None, :] & jnp.ones((key_valid.shape[0], s, s), bool)
    if causal:
        allow = allow & jnp.tril(jnp.ones((s, s), bool))[None]
    if bidir is not None:
        allow = allow | (bidir[:, :, None] & bidir[:, None, :]
                         & key_valid[:, None, :])
    return allow[:, None]


def test_flash_causal_matches_xla(rng):
    q, k, v = _qkv(rng)
    out = flash_attention(q, k, v, is_causal=True)
    ref = attention_xla(q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_padding_and_window(rng):
    b, s = 2, 70
    q, k, v = _qkv(rng, b=b, s=s)
    key_valid = jnp.asarray(np.stack([
        np.r_[np.zeros(9), np.ones(s - 9)],
        np.r_[np.zeros(0), np.ones(s)]]).astype(bool))
    bidir = jnp.zeros((b, s), bool).at[:, 50:60].set(True)

    out = flash_attention(q, k, v, is_causal=True, key_valid=key_valid,
                          bidir_mask=bidir)
    ref = attention_xla(q, k, v, mask=_dense_from_1d(key_valid, bidir, s))
    valid_q = np.asarray(key_valid)
    np.testing.assert_allclose(np.asarray(out)[valid_q], np.asarray(ref)[valid_q],
                               rtol=2e-5, atol=2e-5)
    # the window must actually matter
    ref_nowin = attention_xla(q, k, v, mask=_dense_from_1d(key_valid, None, s))
    assert np.abs(np.asarray(out) - np.asarray(ref_nowin))[valid_q].max() > 1e-3


def test_flash_static_window_equals_mask_window(rng):
    q, k, v = _qkv(rng, s=64)
    out_block = flash_attention(q, k, v, is_causal=True, bidir_block=(40, 12))
    bidir = jnp.zeros((2, 64), bool).at[:, 40:52].set(True)
    out_mask = flash_attention(q, k, v, is_causal=True, bidir_mask=bidir)
    np.testing.assert_allclose(np.asarray(out_block), np.asarray(out_mask),
                               rtol=1e-6, atol=1e-6)


def test_flash_gqa(rng):
    q, k, v = _qkv(rng, h=8, hkv=2)
    out = flash_attention(q, k, v, is_causal=True)
    ref = attention_xla(q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_attention_dispatch_1d_masks_consistent(rng):
    """attention(use_flash=False) with 1D masks equals flash path."""
    b, s = 2, 40
    q, k, v = _qkv(rng, b=b, s=s, d=128)
    key_valid = jnp.ones((b, s), bool).at[0, :5].set(False)
    bidir = jnp.zeros((b, s), bool).at[:, 30:38].set(True)
    xla = attention(q, k, v, is_causal=True, key_valid=key_valid,
                    bidir_mask=bidir, use_flash=False)
    fla = attention(q, k, v, is_causal=True, key_valid=key_valid,
                    bidir_mask=bidir, use_flash=True)
    sel = np.asarray(key_valid)
    np.testing.assert_allclose(np.asarray(fla)[sel], np.asarray(xla)[sel],
                               rtol=2e-5, atol=2e-5)


def test_flash_allheads_matches_xla(rng):
    """All-heads-per-block kernel variant (no HBM transposes)."""
    from openvla_oft_tpu.ops.flash_attention import flash_attention_allheads

    b, s = 2, 70
    q, k, v = _qkv(rng, b=b, s=s)
    key_valid = jnp.ones((b, s), bool).at[0, :9].set(False)
    bidir = jnp.zeros((b, s), bool).at[:, 50:60].set(True)
    out = flash_attention_allheads(q, k, v, is_causal=True,
                                   key_valid=key_valid, bidir_mask=bidir)
    ref = attention_xla(q, k, v, mask=_dense_from_1d(key_valid, bidir, s))
    sel = np.asarray(key_valid)
    np.testing.assert_allclose(np.asarray(out)[sel], np.asarray(ref)[sel],
                               rtol=2e-5, atol=2e-5)


def test_flash_allheads_gqa(rng):
    from openvla_oft_tpu.ops.flash_attention import flash_attention_allheads

    q, k, v = _qkv(rng, h=8, hkv=2)
    out = flash_attention_allheads(q, k, v, is_causal=True)
    ref = attention_xla(q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_tp_matches_single_shard(rng):
    """shard_map tp wrapper: head-sharded kernel == unsharded kernel == XLA
    dense path (heads are independent; masks replicate)."""
    from openvla_oft_tpu.ops.flash_attention import flash_attention_tp
    from openvla_oft_tpu.parallel.mesh import make_mesh

    q, k, v = _qkv(rng, b=2, s=70, h=4, d=128)
    key_valid = jnp.ones((2, 70), bool).at[:, 60:].set(False)
    bidir = jnp.zeros((2, 70), bool).at[:, 40:52].set(True)

    mesh = make_mesh(dp=1, fsdp=1, tp=2)
    out_tp = flash_attention_tp(q, k, v, mesh, is_causal=True,
                                key_valid=key_valid, bidir_mask=bidir)
    out_one = flash_attention(q, k, v, is_causal=True, key_valid=key_valid,
                              bidir_mask=bidir)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_one),
                               rtol=1e-5, atol=1e-5)
    ref = attention_xla(q, k, v,
                        mask=_dense_from_1d(key_valid, bidir, 70))
    np.testing.assert_allclose(np.asarray(out_tp)[:, :60],
                               np.asarray(ref)[:, :60], rtol=1e-4, atol=1e-4)


def test_flash_attention_tp_static_window_and_gqa(rng):
    """bidir_block is materialized outside the shard_map (per-shard rebuild
    would be identical, but the contract is one mask); GQA kv heads shard."""
    from openvla_oft_tpu.ops.flash_attention import flash_attention_tp
    from openvla_oft_tpu.parallel.mesh import make_mesh

    q, k, v = _qkv(rng, b=1, s=64, h=8, d=128, hkv=4)
    mesh = make_mesh(dp=1, fsdp=1, tp=4)
    out_tp = flash_attention_tp(q, k, v, mesh, is_causal=True,
                                bidir_block=(30, 10))
    out_one = flash_attention(q, k, v, is_causal=True, bidir_block=(30, 10))
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_one),
                               rtol=1e-5, atol=1e-5)


# === Backward (custom_vjp) — reference training runs through flash-attn's
# CUDA backward (SETUP.md:20-24); ours must match the XLA path's grads. ===
def _grad_pair(q, k, v, key_valid, bidir_block, s):
    def f_flash(q_, k_, v_):
        o = flash_attention(q_, k_, v_, is_causal=True, key_valid=key_valid,
                            bidir_block=bidir_block)
        return jnp.sum(jnp.square(o[:, :s]))

    def f_xla(q_, k_, v_):
        o = attention(q_, k_, v_, is_causal=True, use_flash=False,
                      key_valid=key_valid, bidir_block=bidir_block)
        return jnp.sum(jnp.square(o[:, :s]))

    return (jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v),
            jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v))


def _assert_grads_close(gf, gx, rtol=2e-3):
    for name, a, b in zip("qkv", gf, gx):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        assert rel < rtol, (name, rel)


def test_flash_backward_matches_xla_libero_geometry(rng):
    """LIBERO serving/training geometry: S=618 multimodal rows, left padding,
    action-chunk window, GQA."""
    b, s = 2, 618
    q, k, v = _qkv(rng, b=b, s=s, h=8, d=64, hkv=4)
    key_valid = jnp.asarray(rng.random((b, s)) > 0.1).at[:, -64:].set(True)
    gf, gx = _grad_pair(q, k, v, key_valid, (s - 60, 56), s)
    _assert_grads_close(gf, gx)


def test_flash_backward_matches_xla_aloha_geometry(rng):
    """ALOHA geometry: ~1k rows (3 cams), above FLASH_SEQ_THRESHOLD — the
    regime where training actually selects the kernel."""
    b, s = 1, 1000
    q, k, v = _qkv(rng, b=b, s=s, h=4, d=64)
    key_valid = jnp.ones((b, s), bool).at[:, :37].set(False)
    gf, gx = _grad_pair(q, k, v, key_valid, (s - 360, 352), s)
    _assert_grads_close(gf, gx)


def test_flash_backward_under_remat_and_mesh(rng):
    """jax.checkpoint over the kernel (the training configuration:
    remat_policy wraps the block) on the 8-device CPU mesh with dp sharding —
    the custom_vjp must compose with remat and GSPMD."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openvla_oft_tpu.parallel.mesh import make_mesh

    b, s = 4, 70
    q, k, v = _qkv(rng, b=b, s=s, h=4, d=64)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    shard = NamedSharding(mesh, P(("dp", "fsdp")))
    q, k, v = (jax.device_put(x, shard) for x in (q, k, v))

    @jax.jit
    def loss(q_, k_, v_):
        f = jax.checkpoint(lambda a, b_, c: flash_attention(
            a, b_, c, is_causal=True, bidir_block=(40, 12)))
        return jnp.sum(jnp.square(f(q_, k_, v_)))

    gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_xla(q_, k_, v_):
        o = attention(q_, k_, v_, is_causal=True, use_flash=False,
                      bidir_block=(40, 12))
        return jnp.sum(jnp.square(o))

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    _assert_grads_close(gf, gx)


# === split-KV two-block merge (diffusion suffix loop) =======================


class TestSplitKV:
    def _mk(self, rng, b=2, s=5, tp=7, h=4, hkv=None, d=8):
        hkv = hkv or h
        q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        pk = jnp.asarray(rng.normal(size=(b, tp, hkv, d)), jnp.float32)
        pv = jnp.asarray(rng.normal(size=(b, tp, hkv, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
        return q, pk, pv, k, v

    def _ref(self, q, pk, pv, k, v, mask):
        from openvla_oft_tpu.ops.attention import attention_xla

        keys = jnp.concatenate([pk, k], axis=1)
        vals = jnp.concatenate([pv, v], axis=1)
        return attention_xla(q, keys, vals, mask=mask)

    def test_matches_concat_no_mask(self):
        from openvla_oft_tpu.ops.attention import attention_split_kv

        rng = np.random.default_rng(3)
        q, pk, pv, k, v = self._mk(rng)
        out = attention_split_kv(q, pk, pv, k, v)
        ref = self._ref(q, pk, pv, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_concat_block_bidir_mask(self):
        """The real suffix mask: causal prompt + bidirectional chunk block,
        prefix fully visible (models/prismatic.py::diffusion_suffix_step)."""
        from openvla_oft_tpu.ops.attention import attention_split_kv

        rng = np.random.default_rng(4)
        b, s, tp = 2, 6, 9
        q, pk, pv, k, v = self._mk(rng, b=b, s=s, tp=tp)
        suf = np.tril(np.ones((s, s), bool))
        suf[:, 3:] = True          # bidirectional chunk block rows 3..
        suf[2, 0] = False          # arbitrary extra hole
        mask = np.concatenate([np.ones((s, tp), bool), suf], axis=1)
        mask = jnp.asarray(np.broadcast_to(mask, (b, 1, s, tp + s)))
        out = attention_split_kv(q, pk, pv, k, v,
                                 mask_pre=mask[..., :tp],
                                 mask_suf=mask[..., tp:])
        ref = self._ref(q, pk, pv, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_fully_masked_block(self):
        """Rows whose PREFIX block is fully masked must ignore it (the merge
        weight for a dead block is exactly 0, not exp(-inf - -inf))."""
        from openvla_oft_tpu.ops.attention import attention_split_kv

        rng = np.random.default_rng(5)
        b, s, tp = 1, 4, 6
        q, pk, pv, k, v = self._mk(rng, b=b, s=s, tp=tp)
        mask_pre = np.ones((b, 1, s, tp), bool)
        mask_pre[:, :, 1] = False          # row 1 sees no prefix
        mask_suf = np.ones((b, 1, s, s), bool)
        out = attention_split_kv(q, pk, pv, k, v,
                                 mask_pre=jnp.asarray(mask_pre),
                                 mask_suf=jnp.asarray(mask_suf))
        mask = jnp.asarray(np.concatenate([mask_pre,
                                           np.ones((b, 1, s, s), bool)],
                                          axis=-1))
        ref = self._ref(q, pk, pv, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_gqa(self):
        from openvla_oft_tpu.ops.attention import attention_split_kv

        rng = np.random.default_rng(6)
        q, pk, pv, k, v = self._mk(rng, h=4, hkv=2)
        out = attention_split_kv(q, pk, pv, k, v)
        ref = self._ref(q, jnp.repeat(pk, 2, 2), jnp.repeat(pv, 2, 2),
                        jnp.repeat(k, 2, 2), jnp.repeat(v, 2, 2), None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_suffix_forward_env_parity(self, monkeypatch):
        """llama_suffix_forward with OPENVLA_SPLIT_KV=1 == concat path."""
        from openvla_oft_tpu.config import LlamaConfig
        from openvla_oft_tpu.models.llama import (init_llama_params,
                                                  llama_suffix_forward)

        rng = np.random.default_rng(7)
        cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                          num_layers=2, num_heads=4, num_kv_heads=4,
                          max_position_embeddings=64)
        params = dict(init_llama_params(jax.random.PRNGKey(0), cfg,
                                        dtype=jnp.float32))
        b, s, tp = 1, 5, 8
        L, hkv, hd = 2, 4, 16
        x = jnp.asarray(rng.normal(size=(b, s, 64)) * 0.1, jnp.float32)
        pk = jnp.asarray(rng.normal(size=(L, b, tp, hkv, hd)) * 0.1,
                         jnp.float32)
        pv = jnp.asarray(rng.normal(size=(L, b, tp, hkv, hd)) * 0.1,
                         jnp.float32)
        pos = jnp.arange(tp, tp + s)[None].astype(jnp.int32)
        mask = jnp.ones((b, 1, s, tp + s), bool)
        ref = llama_suffix_forward(params, cfg, x, pk, pv, pos, mask)
        monkeypatch.setenv("OPENVLA_SPLIT_KV", "1")
        out = llama_suffix_forward(params, cfg, x, pk, pv, pos, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)
