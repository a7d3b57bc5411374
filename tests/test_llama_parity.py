"""Golden parity of the JAX Llama against HF transformers (random tiny weights).

The reference model core is HF Llama (via the transformers fork); these tests
port random HF weights into our stacked pytree and require near-bit agreement
in fp32, including the OFT block-bidirectional mask (expressed to HF as an
explicit 4D additive mask).
"""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

from openvla_oft_tpu.config import LlamaConfig
from openvla_oft_tpu.models.llama import (
    KVCache,
    embed_tokens,
    llama_decode_step,
    llama_model,
    llama_prefill,
    lm_logits,
)
from openvla_oft_tpu.utils.weights import dict_getter, port_hf_llama

TINY = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                   num_layers=2, num_heads=4, num_kv_heads=4,
                   max_position_embeddings=512, pad_token_id=0)


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers, num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads, rms_norm_eps=TINY.rms_norm_eps,
        rope_theta=TINY.rope_theta, attention_bias=False, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    params = {"llm": port_hf_llama(dict_getter(model.state_dict()), TINY)}
    return model, params


def _hf_hidden(model, embeds_t, attention_mask=None):
    with torch.no_grad():
        out = model.model(inputs_embeds=embeds_t, attention_mask=attention_mask)
    return out.last_hidden_state.numpy()


def test_causal_forward_matches_hf(hf_and_jax, rng):
    model, params = hf_and_jax
    x = rng.standard_normal((2, 9, TINY.hidden_size)).astype(np.float32)
    ours = llama_model(params["llm"], TINY, jnp.asarray(x))
    theirs = _hf_hidden(model, torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)


def test_logits_match_hf(hf_and_jax, rng):
    model, params = hf_and_jax
    ids = rng.integers(0, TINY.vocab_size, (1, 7))
    emb = embed_tokens(params["llm"], jnp.asarray(ids))
    ours = lm_logits(params["llm"], llama_model(params["llm"], TINY, emb))
    with torch.no_grad():
        theirs = model(input_ids=torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)


def test_padding_mask_matches_hf(hf_and_jax, rng):
    model, params = hf_and_jax
    x = rng.standard_normal((2, 8, TINY.hidden_size)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1]])
    ours = llama_model(params["llm"], TINY, jnp.asarray(x),
                       padding_mask=jnp.asarray(mask))
    theirs = _hf_hidden(model, torch.from_numpy(x), torch.from_numpy(mask))
    # Compare only non-pad positions.
    sel = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(ours)[sel], theirs[sel],
                               rtol=2e-5, atol=2e-5)


def test_block_bidirectional_matches_hf_4d_mask(hf_and_jax, rng):
    """OFT mask: causal prefix + bidirectional action block, vs HF 4D mask."""
    model, params = hf_and_jax
    b, s, chunk_start, chunk = 1, 12, 6, 4
    x = rng.standard_normal((b, s, TINY.hidden_size)).astype(np.float32)

    bidir = np.zeros((b, s), bool)
    bidir[:, chunk_start:chunk_start + chunk] = True
    ours = llama_model(params["llm"], TINY, jnp.asarray(x),
                       bidir_mask=jnp.asarray(bidir))

    causal = np.tril(np.ones((s, s), bool))
    allowed = causal | (bidir[0][:, None] & bidir[0][None, :])
    # HF additive 4D float mask: 0 = attend, -inf = blocked.
    neg = torch.finfo(torch.float32).min
    mask4d = torch.where(torch.from_numpy(allowed), 0.0, neg)[None, None]
    theirs = _hf_hidden(model, torch.from_numpy(x), mask4d)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)

    # Sanity: the bidirectional mask must actually change the result.
    plain = llama_model(params["llm"], TINY, jnp.asarray(x))
    assert np.abs(np.asarray(ours) - np.asarray(plain)).max() > 1e-4


def test_kv_cache_decode_matches_full_forward(hf_and_jax, rng):
    _, params = hf_and_jax
    ids = rng.integers(0, TINY.vocab_size, (1, 10))
    emb = embed_tokens(params["llm"], jnp.asarray(ids))
    full = llama_model(params["llm"], TINY, emb)

    cache = KVCache.create(TINY, 1, 16, dtype=jnp.float32)
    pre, cache = llama_prefill(params["llm"], TINY, emb[:, :6], cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :6]),
                               rtol=1e-5, atol=1e-5)
    outs = []
    for t in range(6, 10):
        h, cache = llama_decode_step(params["llm"], TINY, emb[:, t:t + 1], cache)
        outs.append(np.asarray(h)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full[:, 6:10]),
                               rtol=1e-5, atol=1e-5)


def test_gqa_mistral_style_matches_hf(rng):
    """GQA (Mistral backbone family): kv heads < heads, vs HF Mistral."""
    from transformers import MistralConfig as HFMistral
    from transformers import MistralForCausalLM

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=160,
                      num_layers=2, num_heads=8, num_kv_heads=2,
                      rope_theta=10000.0, max_position_embeddings=512)
    torch.manual_seed(1)
    hf = MistralForCausalLM(HFMistral(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, rope_theta=cfg.rope_theta,
        sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager")).eval()
    params = {"llm": port_hf_llama(dict_getter(hf.state_dict()), cfg)}
    x = rng.standard_normal((2, 11, cfg.hidden_size)).astype(np.float32)
    ours = llama_model(params["llm"], cfg, jnp.asarray(x))
    with torch.no_grad():
        theirs = hf.model(inputs_embeds=torch.from_numpy(x)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=3e-5, atol=3e-5)


def test_fused_inference_weights_parity():
    """wqkv/gate_up serving fusion is numerics-exact vs unfused weights on
    the full forward, the KV-cache prefill/decode, and — with fold_norms=False
    (concat-only) — bit-identical under int8 (per-out-channel scales are
    independent). Norm scales are randomized so the RMSNorm fold and the
    int8 invariant are both non-trivial (gamma=1 would make the fold an
    identity and hide regressions)."""
    import jax
    import jax.numpy as jnp

    from openvla_oft_tpu.config import TINY_LLAMA
    from openvla_oft_tpu.models.llama import (
        KVCache,
        fuse_inference_weights,
        init_llama_params,
        llama_decode_step,
        llama_model,
        llama_prefill,
    )
    from openvla_oft_tpu.ops.quant import quantize_tree

    p = init_llama_params(jax.random.PRNGKey(0), TINY_LLAMA, dtype=jnp.float32)
    L, d = TINY_LLAMA.num_layers, TINY_LLAMA.hidden_size
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    p["layers"]["attn_norm"]["scale"] = 1.0 + 0.3 * jax.random.normal(
        ks[0], (L, d), jnp.float32)
    p["layers"]["mlp_norm"]["scale"] = 1.0 + 0.3 * jax.random.normal(
        ks[1], (L, d), jnp.float32)
    pf = fuse_inference_weights(p)
    assert "wqkv" in pf["layers"]["attn"] and "gate_up" in pf["layers"]["mlp"]
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 10, TINY_LLAMA.hidden_size), jnp.float32)
    np.testing.assert_allclose(llama_model(p, TINY_LLAMA, x),
                               llama_model(pf, TINY_LLAMA, x), atol=1e-5)

    cache = KVCache.create(TINY_LLAMA, 2, 16, dtype=jnp.float32)
    h1, c1 = llama_prefill(p, TINY_LLAMA, x, cache)
    h2, c2 = llama_prefill(pf, TINY_LLAMA, x, cache)
    np.testing.assert_allclose(h1, h2, atol=1e-5)
    tok = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 1, TINY_LLAMA.hidden_size), jnp.float32)
    d1, _ = llama_decode_step(p, TINY_LLAMA, tok, c1)
    d2, _ = llama_decode_step(pf, TINY_LLAMA, tok, c2)
    np.testing.assert_allclose(d1, d2, atol=1e-5)

    # int8 invariant: concat-only fusion (fold_norms=False) quantizes each
    # output column independently, so the fused int8 model is BIT-identical
    # to the unfused one — this is what keeps the calibration evidence
    # describing the deployed model. (The fold_norms=True tree would NOT be:
    # gamma scales kernel rows, inflating per-column absmax.)
    pc = fuse_inference_weights(p, fold_norms=False)
    assert "scale" in pc["layers"]["attn_norm"], \
        "fold_norms=False must keep the RMSNorm scales"
    q_un = quantize_tree(p, min_dim=TINY_LLAMA.hidden_size)
    q_fu = quantize_tree(pc, min_dim=TINY_LLAMA.hidden_size)
    o_un = np.asarray(llama_model(q_un, TINY_LLAMA, x))
    o_fu = np.asarray(llama_model(q_fu, TINY_LLAMA, x))
    np.testing.assert_array_equal(o_un, o_fu)

    # LoRA-injected trees refuse to fuse (merge first)
    p_lora = {**p, "layers": {**p["layers"], "attn": {
        **p["layers"]["attn"],
        "wq": {**p["layers"]["attn"]["wq"],
               "lora_a": jnp.zeros((1,)), "lora_b": jnp.zeros((1,))}}}}
    with pytest.raises(ValueError, match="LoRA"):
        fuse_inference_weights(p_lora)
