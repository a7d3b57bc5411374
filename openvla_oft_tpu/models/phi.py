"""Phi-2 decoder, TPU-native functional implementation.

Covers the reference's Phi LLM backbone (`prismatic/models/backbones/llm/
phi.py:19-25`, "phi-2-3b" -> HF `PhiForCausalLM`), used by the legacy
Prismatic pretraining path. Architecture (vs Llama):

  - *parallel* residual blocks: one LayerNorm feeds both attention and MLP,
    and the block output is `x + attn(ln(x)) + mlp(ln(x))`;
  - LayerNorm with bias everywhere (no RMSNorm), biased q/k/v/dense and
    fc1/fc2 projections, biased lm_head;
  - partial rotary embeddings: RoPE over only the first
    `rotary_dim = int(0.4 * head_dim)` dims of each head, rest pass through;
  - gelu_new (tanh-approx) MLP activation; no GQA.

Same TPU layout as `models/llama.py`: stacked per-layer arrays under one
`lax.scan`, masks built from 1D vectors, MXU-shaped matmuls. The parallel
block is a better fit for TPU than the sequential Llama block — XLA fuses
the attention and MLP input projections of a layer into one weight-stationary
group since both read the same normalized activations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from openvla_oft_tpu.config import PhiConfig
from openvla_oft_tpu.ops.attention import attention
from openvla_oft_tpu.ops.layers import gelu_tanh, layer_norm, linear
from openvla_oft_tpu.ops.masks import make_block_bidirectional_mask
from openvla_oft_tpu.ops.rotary import apply_rope, rope_sin_cos

Params = Dict[str, Any]


def init_phi_params(key, cfg: PhiConfig, dtype=jnp.bfloat16) -> Params:
    """Random init with stacked per-layer arrays (porting overwrites these)."""
    d, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    ks = jax.random.split(key, 8)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in ** -0.5).astype(dtype)

    def wb(k, d_in, d_out):
        return {"kernel": w(k, (L, d_in, d_out), d_in),
                "bias": jnp.zeros((L, d_out), dtype)}

    layers = {
        "attn": {
            "wq": wb(ks[0], d, d),
            "wk": wb(ks[1], d, d),
            "wv": wb(ks[2], d, d),
            "wo": wb(ks[3], d, d),
        },
        "mlp": {
            "fc1": wb(ks[4], d, inter),
            "fc2": wb(ks[5], inter, d),
        },
        "ln": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
    }
    return {
        "embed": {"embedding": w(ks[6], (cfg.vocab_size, d), d)},
        "layers": layers,
        "final_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "lm_head": {"kernel": w(ks[7], (d, cfg.vocab_size), d),
                    "bias": jnp.zeros((cfg.vocab_size,), dtype)},
    }


def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"]["embedding"], input_ids, axis=0)


def _apply_partial_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray,
                        rotary_dim: int) -> jnp.ndarray:
    """RoPE over the first `rotary_dim` dims of each head; rest untouched."""
    rot, keep = x[..., :rotary_dim], x[..., rotary_dim:]
    return jnp.concatenate([apply_rope(rot, sin, cos), keep], axis=-1)


def _block(p, cfg: PhiConfig, x, sin, cos, mask, is_causal):
    b, s, d = x.shape
    h, hd, rd = cfg.num_heads, cfg.head_dim, cfg.rotary_dim

    xa = layer_norm(p["ln"], x, cfg.layer_norm_eps)
    q = linear(p["attn"]["wq"], xa).reshape(b, s, h, hd)
    k = linear(p["attn"]["wk"], xa).reshape(b, s, h, hd)
    v = linear(p["attn"]["wv"], xa).reshape(b, s, h, hd)
    q = _apply_partial_rope(q, sin, cos, rd)
    k = _apply_partial_rope(k, sin, cos, rd)
    o = attention(q, k, v, mask=mask, is_causal=is_causal)
    attn_out = linear(p["attn"]["wo"], o.reshape(b, s, h * hd))
    mlp_out = linear(p["mlp"]["fc2"], gelu_tanh(linear(p["mlp"]["fc1"], xa)))
    return x + attn_out + mlp_out  # parallel residual


def phi_model(
    params: Params,
    cfg: PhiConfig,
    inputs_embeds: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray] = None,
    bidir_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    **_ignored,
) -> jnp.ndarray:
    """Decoder stack; returns post-final-LayerNorm hidden states (B, S, D).

    Mask arguments mirror `llama_model` (padding / OFT block-bidirectional /
    explicit 4D) so the VLM layer can dispatch on the config family.
    `**_ignored` deliberately swallows the llama-only serving knobs
    (`use_flash`, `bidir_block`, `out_window`, `tp_mesh`): Phi-2 is 2.7B with
    32×80 heads at S<1k, where the XLA fused attention + explicit 4D mask IS
    the design (docs/PERFORMANCE.md) — there is no Pallas/flash path here, so
    a tp-sharded Phi never routes through `flash_attention_tp`.
    """
    b, s, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    sin, cos = rope_sin_cos(positions, cfg.rotary_dim, cfg.rope_theta)

    is_causal = False
    if attn_mask is not None:
        mask = attn_mask
    elif bidir_mask is not None:
        pad = padding_mask if padding_mask is not None else jnp.ones((b, s), bool)
        mask = make_block_bidirectional_mask(pad, bidir_mask)[:, None]
    elif padding_mask is not None:
        mask = padding_mask[:, None, None, :]
        is_causal = True
    else:
        mask = None
        is_causal = True

    def body(carry, layer_params):
        return _block(layer_params, cfg, carry, sin, cos, mask, is_causal), None

    if remat and remat_policy != "none":
        from openvla_oft_tpu.models.llama import resolve_remat_policy

        body = jax.checkpoint(body, prevent_cse=False,
                              policy=resolve_remat_policy(remat_policy))
    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    return layer_norm(params["final_norm"], x, cfg.layer_norm_eps)


def lm_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Biased vocab projection (HF `PhiForCausalLM.lm_head` has bias)."""
    y = jnp.dot(hidden, params["lm_head"]["kernel"],
                preferred_element_type=jnp.float32)
    return y + params["lm_head"]["bias"].astype(jnp.float32)


# === KV-cache autoregressive path (legacy `generate` parity for Phi VLMs) ===
def phi_prefill(
    params: Params,
    cfg: PhiConfig,
    inputs_embeds: jnp.ndarray,
    cache,  # models.llama.KVCache (shape-compatible: kv heads == heads)
    positions: Optional[jnp.ndarray] = None,
    key_valid: Optional[jnp.ndarray] = None,
):
    """Causal prefill filling a `llama.KVCache`; returns (hidden, cache)."""
    from openvla_oft_tpu.models.llama import KVCache

    b, s, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    sin, cos = rope_sin_cos(positions, cfg.rotary_dim, cfg.rope_theta)
    h, hd, rd = cfg.num_heads, cfg.head_dim, cfg.rotary_dim
    if key_valid is None:
        key_valid = jnp.ones((b, s), bool)

    def body(carry, p):
        x = carry
        xa = layer_norm(p["ln"], x, cfg.layer_norm_eps)
        q = linear(p["attn"]["wq"], xa).reshape(b, s, h, hd)
        k = linear(p["attn"]["wk"], xa).reshape(b, s, h, hd)
        v = linear(p["attn"]["wv"], xa).reshape(b, s, h, hd)
        q = _apply_partial_rope(q, sin, cos, rd)
        k = _apply_partial_rope(k, sin, cos, rd)
        o = attention(q, k, v, is_causal=True, key_valid=key_valid)
        attn_out = linear(p["attn"]["wo"], o.reshape(b, s, h * hd))
        mlp_out = linear(p["mlp"]["fc2"], gelu_tanh(linear(p["mlp"]["fc1"], xa)))
        return x + attn_out + mlp_out, (k.astype(cache.k.dtype),
                                        v.astype(cache.v.dtype))

    x, (ks, vs) = jax.lax.scan(body, inputs_embeds, params["layers"])
    new_cache = KVCache(
        k=jax.lax.dynamic_update_slice(cache.k, ks, (0, 0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(cache.v, vs, (0, 0, 0, 0, 0)),
        index=jnp.asarray(s, jnp.int32),
        valid=jax.lax.dynamic_update_slice(cache.valid, key_valid, (0, 0)),
    )
    return layer_norm(params["final_norm"], x, cfg.layer_norm_eps), new_cache


def phi_decode_step(
    params: Params,
    cfg: PhiConfig,
    token_embed: jnp.ndarray,  # (B, 1, D)
    cache,
    positions: Optional[jnp.ndarray] = None,
):
    """One cached decode step; returns (post-norm hidden (B, 1, D), cache)."""
    from openvla_oft_tpu.models.llama import KVCache

    b = token_embed.shape[0]
    h, hd, rd = cfg.num_heads, cfg.head_dim, cfg.rotary_dim
    t_max = cache.k.shape[2]
    if positions is None:
        # real-key count per row (left-pad aware), like llama_decode_step
        positions = jnp.sum(cache.valid, axis=1, keepdims=True
                            ).astype(jnp.int32)
    sin, cos = rope_sin_cos(positions, cfg.rotary_dim, cfg.rope_theta)
    new_valid = cache.valid | (jnp.arange(t_max)[None, :] == cache.index)
    mask = new_valid[:, None, None, :]

    def body(carry, inputs):
        x = carry
        p, ck, cv = inputs
        xa = layer_norm(p["ln"], x, cfg.layer_norm_eps)
        q = linear(p["attn"]["wq"], xa).reshape(b, 1, h, hd)
        k = linear(p["attn"]["wk"], xa).reshape(b, 1, h, hd)
        v = linear(p["attn"]["wv"], xa).reshape(b, 1, h, hd)
        q = _apply_partial_rope(q, sin, cos, rd)
        k = _apply_partial_rope(k, sin, cos, rd)
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                          (0, cache.index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                          (0, cache.index, 0, 0))
        o = attention(q, ck, cv, mask=mask)
        attn_out = linear(p["attn"]["wo"], o.reshape(b, 1, h * hd))
        mlp_out = linear(p["mlp"]["fc2"], gelu_tanh(linear(p["mlp"]["fc1"], xa)))
        return x + attn_out + mlp_out, (ck, cv)

    x, (ks, vs) = jax.lax.scan(body, token_embed,
                               (params["layers"], cache.k, cache.v))
    new_cache = KVCache(k=ks, v=vs, index=cache.index + 1, valid=new_valid)
    return layer_norm(params["final_norm"], x, cfg.layer_norm_eps), new_cache
