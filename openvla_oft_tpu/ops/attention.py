"""Attention entry point: dispatches between the XLA reference path and the
Pallas TPU flash-attention kernel (ops/flash_attention.py).

The XLA path is the semantic reference: fp32 softmax, arbitrary boolean mask
(which is how the OFT block-bidirectional mask — causal prefix + fully-visible
action-chunk block — is expressed; see ops/masks.py and the reference's
transformers-fork contract at `modeling_prismatic.py:742`). XLA already fuses
the mask+softmax chain into the matmuls; the Pallas kernel additionally tiles
the whole thing through VMEM without materializing (S, S) scores in HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Measured crossover on TPU v5e (7B OFT): the Pallas flash kernel beats XLA
# fused attention above ~1k tokens (ALOHA geometry) and loses slightly below
# (LIBERO geometry, where q/k/v layout transposes dominate its win).
FLASH_SEQ_THRESHOLD = 1024


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
) -> jnp.ndarray:
    """Multi-head attention, fp32 softmax, optional GQA.

    q: (B, S, H, D); k/v: (B, T, Hkv, D); mask: broadcastable to (B, H, S, T)
    boolean, True = attend. Returns (B, S, H, D) in q.dtype.
    """
    b, s, h, d = q.shape
    t, hkv = k.shape[1], k.shape[2]
    if hkv != h:  # GQA: repeat kv heads
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    scale = d ** -0.5

    if mask is None and not is_causal:
        # Maskless bidirectional case (the ViT featurizers): collapse batch
        # and heads into ONE 3D batched-GEMM dim. At ViT serving shapes
        # (B*N=2, H=16, S=261, D=64) XLA schedules the (32, S, D) program
        # measurably better than the 4D bhst form — 0.35 ms off the LIBERO
        # serving chunk (same math: fp32 softmax, same contractions).
        qm = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        km = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        vm = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        logits = jnp.einsum("nsd,ntd->nst", qm, km,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("nst,ntd->nsd", probs.astype(vm.dtype), vm,
                       preferred_element_type=jnp.float32)
        return o.reshape(b, h, s, d).transpose(0, 2, 1, 3).astype(q.dtype)

    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale

    if is_causal:
        causal = jnp.tril(jnp.ones((s, t), dtype=bool), k=t - s)
        causal_mask = causal[None, None]
        mask = causal_mask if mask is None else (mask & causal_mask)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
    use_flash: bool = False,
    key_valid: Optional[jnp.ndarray] = None,   # (B, T) bool
    bidir_mask: Optional[jnp.ndarray] = None,  # (B, S) bool
    bidir_block: Optional[tuple] = None,       # static (start, len)
    tp_mesh=None,                              # Mesh with a "tp" axis
) -> jnp.ndarray:
    """Dispatch between the XLA path (arbitrary `mask`) and the Pallas flash
    kernel (masking expressed via the 1D `key_valid`/`bidir_mask` vectors —
    causal + padding + block-bidirectional, never materializing (S, S)).

    tp_mesh: when the surrounding program is tp-sharded and the flash path
    engages, route through `flash_attention_tp` (shard_map over heads) —
    GSPMD treats a bare pallas_call as opaque and would gather the full
    head dim onto every shard. Ignored on the XLA path (GSPMD partitions
    plain einsums fine) and when heads don't divide the tp axis.
    """
    if use_flash and mask is None:
        from openvla_oft_tpu.ops.flash_attention import (
            flash_attention,
            flash_attention_tp,
        )

        if tp_mesh is not None and tp_mesh.shape.get("tp", 1) > 1 \
                and q.shape[2] % tp_mesh.shape["tp"] == 0 \
                and k.shape[2] % tp_mesh.shape["tp"] == 0:
            return flash_attention_tp(q, k, v, tp_mesh, is_causal=is_causal,
                                      key_valid=key_valid,
                                      bidir_mask=bidir_mask,
                                      bidir_block=bidir_block)
        return flash_attention(q, k, v, is_causal=is_causal, key_valid=key_valid,
                               bidir_mask=bidir_mask, bidir_block=bidir_block)
    if bidir_mask is None and bidir_block is not None:
        # The dense path must honor the static window exactly like the flash
        # kernel does (it synthesizes the same 1-D mask) — dropping it here
        # would silently change semantics with the sequence-length-dependent
        # "auto" flash dispatch.
        w0, wl = bidir_block
        bidir_mask = jnp.zeros((q.shape[0], k.shape[1]), bool
                               ).at[:, w0:w0 + wl].set(True)
    if mask is None and (key_valid is not None or bidir_mask is not None):
        # Build the equivalent dense mask for the XLA path.
        b, s = q.shape[0], q.shape[1]
        t = k.shape[1]
        kv = key_valid if key_valid is not None else jnp.ones((b, t), bool)
        allow = kv[:, None, :] & jnp.ones((b, s, t), bool)
        if is_causal:
            allow = allow & jnp.tril(jnp.ones((s, t), bool), k=t - s)[None]
            is_causal = False
        if bidir_mask is not None:
            allow = allow | (bidir_mask[:, :, None] & bidir_mask[:, None, :]
                             & kv[:, None, :])
        mask = allow[:, None]
    return attention_xla(q, k, v, mask=mask, is_causal=is_causal)


def attention_split_kv(
    q: jnp.ndarray,           # (B, S, H, D)
    pk: jnp.ndarray,          # (B, Tp, Hkv, D) cached prefix keys
    pv: jnp.ndarray,          # (B, Tp, Hkv, D)
    k: jnp.ndarray,           # (B, Ss, Hkv, D) fresh suffix keys
    v: jnp.ndarray,           # (B, Ss, Hkv, D)
    mask_pre: Optional[jnp.ndarray] = None,   # bcast to (B, H, S, Tp)
    mask_suf: Optional[jnp.ndarray] = None,   # bcast to (B, H, S, Ss)
) -> jnp.ndarray:
    """Attention over [prefix-KV ++ suffix-KV] WITHOUT materializing the
    concatenated cache (two-block online-softmax merge).

    The diffusion suffix loop (models/llama.py::llama_suffix_forward) runs
    50 DDIM steps x 32 layers; concatenating (Tp+Ss)-row K/V per layer per
    step writes+rereads ~10 MB/layer of HBM that this merge never touches —
    a fixed per-step cost that grows in relative weight as the weight
    stream shrinks (bf16 -> int8 -> int4). Math: standard two-block
    flash-style merge — per-block max/sum-exp/weighted-V, then renormalize:
        m = max(m_p, m_s);  out = (o_p*e^(m_p-m) + o_s*e^(m_s-m)) /
                                  (s_p*e^(m_p-m) + s_s*e^(m_s-m))
    fp32 softmax exactly like attention_xla. Returns (B, S, H, D) q.dtype.
    """
    b, s, h, d = q.shape
    hkv = pk.shape[2]
    if hkv != h:
        rep = h // hkv
        pk = jnp.repeat(pk, rep, axis=2)
        pv = jnp.repeat(pv, rep, axis=2)
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = d ** -0.5

    def block(keys, vals, mask):
        logits = jnp.einsum("bshd,bthd->bhst", q, keys,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = jnp.where(mask, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)        # (B,H,S,1)
        # Fully-masked rows: exp(NEG_INF - NEG_INF) = 1 would pollute the
        # merge; pin max to 0 so the block contributes e^{m}=0 weight.
        dead = m <= _NEG_INF * 0.5
        m = jnp.where(dead, 0.0, m)
        p = jnp.exp(logits - m)
        p = jnp.where(dead, 0.0, p)
        ssum = jnp.sum(p, axis=-1)                         # (B,H,S)
        o = jnp.einsum("bhst,bthd->bhsd", p.astype(vals.dtype), vals,
                       preferred_element_type=jnp.float32)
        return m[..., 0], ssum, o, dead[..., 0]

    m_p, s_p, o_p, dead_p = block(pk, pv, mask_pre)
    m_s, s_s, o_s, dead_s = block(k, v, mask_suf)
    # A dead block must not win the max: replace its max with the live one.
    m_p = jnp.where(dead_p, m_s, m_p)
    m_s = jnp.where(dead_s, m_p, m_s)
    m = jnp.maximum(m_p, m_s)
    a_p = jnp.where(dead_p, 0.0, jnp.exp(m_p - m))
    a_s = jnp.where(dead_s, 0.0, jnp.exp(m_s - m))
    denom = s_p * a_p + s_s * a_s
    denom = jnp.maximum(denom, 1e-30)
    out = (o_p * a_p[..., None] + o_s * a_s[..., None]) / denom[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
