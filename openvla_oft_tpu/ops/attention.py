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
    bidir_block: Optional[tuple] = None,
) -> jnp.ndarray:
    """Dispatch to the Pallas flash kernel when requested and applicable.

    `bidir_block=(start, length)` describes a static action-chunk window for
    the fused block-bidirectional mask inside the kernel; when given with
    `use_flash`, `mask` must be None (padding handled upstream).
    """
    if use_flash:
        from openvla_oft_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, is_causal=is_causal, bidir_block=bidir_block,
                               mask=mask)
    return attention_xla(q, k, v, mask=mask, is_causal=is_causal)
