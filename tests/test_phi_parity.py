"""Golden parity of the JAX Phi-2 against HF transformers (random tiny
weights), plus the Vicuna/Mistral/Phi prompt-builder format contracts
(reference `prismatic/models/backbones/llm/prompting/*.py`)."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

from openvla_oft_tpu.config import PhiConfig
from openvla_oft_tpu.models.phi import embed_tokens, lm_logits, phi_model
from openvla_oft_tpu.utils.weights import dict_getter, port_hf_phi

TINY = PhiConfig(vocab_size=96, hidden_size=40, intermediate_size=64,
                 num_layers=2, num_heads=4, partial_rotary_factor=0.4,
                 max_position_embeddings=512)


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import PhiConfig as HFConfig
    from transformers import PhiForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers, num_attention_heads=TINY.num_heads,
        partial_rotary_factor=TINY.partial_rotary_factor,
        layer_norm_eps=TINY.layer_norm_eps, rope_theta=TINY.rope_theta,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = PhiForCausalLM(hf_cfg).eval()
    params = port_hf_phi(dict_getter(model.state_dict()), TINY)
    return model, params


def test_rotary_dim():
    assert TINY.head_dim == 10 and TINY.rotary_dim == 4
    assert PhiConfig().rotary_dim == 32  # real Phi-2: 0.4 * 80


def test_causal_forward_matches_hf(hf_and_jax, rng):
    model, params = hf_and_jax
    x = rng.standard_normal((2, 9, TINY.hidden_size)).astype(np.float32)
    ours = phi_model(params, TINY, jnp.asarray(x))
    with torch.no_grad():
        theirs = model.model(inputs_embeds=torch.from_numpy(x)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_logits_match_hf_including_bias(hf_and_jax, rng):
    model, params = hf_and_jax
    ids = rng.integers(0, TINY.vocab_size, (1, 7))
    emb = embed_tokens(params, jnp.asarray(ids))
    ours = lm_logits(params, phi_model(params, TINY, emb))
    with torch.no_grad():
        theirs = model(input_ids=torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)


def test_padding_mask_matches_hf(hf_and_jax, rng):
    model, params = hf_and_jax
    x = rng.standard_normal((2, 8, TINY.hidden_size)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1]])
    ours = phi_model(params, TINY, jnp.asarray(x), padding_mask=jnp.asarray(mask))
    with torch.no_grad():
        theirs = model.model(inputs_embeds=torch.from_numpy(x),
                             attention_mask=torch.from_numpy(mask)).last_hidden_state
    sel = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(ours)[sel], theirs.numpy()[sel],
                               rtol=2e-5, atol=2e-5)


def test_kv_cache_decode_matches_full_forward(hf_and_jax, rng):
    from openvla_oft_tpu.models.llama import KVCache
    from openvla_oft_tpu.models.phi import phi_decode_step, phi_prefill

    _, params = hf_and_jax
    ids = rng.integers(0, TINY.vocab_size, (1, 10))
    emb = embed_tokens(params, jnp.asarray(ids))
    full = phi_model(params, TINY, emb)

    cache = KVCache.create(TINY, 1, 16, dtype=jnp.float32)
    pre, cache = phi_prefill(params, TINY, emb[:, :6], cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :6]),
                               rtol=1e-5, atol=1e-5)
    outs = []
    for t in range(6, 10):
        h, cache = phi_decode_step(params, TINY, emb[:, t:t + 1], cache)
        outs.append(np.asarray(h)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full[:, 6:10]),
                               rtol=1e-5, atol=1e-5)


def test_phi_registered_as_llm_backbone():
    from openvla_oft_tpu.config import _LLM_REGISTRY

    cfg = _LLM_REGISTRY["phi-2-3b"]
    assert cfg.hidden_size == 2560 and cfg.num_layers == 32
    assert cfg.num_kv_heads == cfg.num_heads == 32


@pytest.mark.slow
def test_phi_as_vla_backbone_cross_layout(rng):
    """Phi-2 as the VLA LLM: left-padded inference layout == training layout,
    and outputs are finite (equal_nan defaults would hide an all-NaN match)."""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_SIGLIP
    from openvla_oft_tpu.constants import (
        ACTION_TOKEN_BEGIN_IDX, EMPTY_TOKEN_ID, IGNORE_INDEX, LIBERO, STOP_INDEX)
    from openvla_oft_tpu.models.prismatic import (
        predict_action_hidden, prismatic_forward)
    from openvla_oft_tpu.policy import init_openvla_params
    import jax

    # vocab must exceed EMPTY_TOKEN_ID (29871): out-of-range ids hit
    # jnp.take's fill mode and poison the embeddings with NaN.
    tiny_phi = PhiConfig(vocab_size=32064, hidden_size=64,
                         intermediate_size=128, num_layers=2, num_heads=4)
    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY["tiny-phi-vla"] = tiny_phi
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-phi-vla", num_images_in_input=1)
    params = init_openvla_params(jax.random.PRNGKey(0), cfg, LIBERO,
                                 dtype=jnp.float32, head="l1")
    assert "ln" in params["llm"]["layers"]  # phi structure, not llama

    g = np.random.default_rng(3)
    prompt = np.array([1, 20, 30, 40, EMPTY_TOKEN_ID])
    action_ids = list(g.integers(ACTION_TOKEN_BEGIN_IDX + 1,
                                 ACTION_TOKEN_BEGIN_IDX + 257, LIBERO.chunk_len))
    full = np.array(list(prompt) + action_ids + [STOP_INDEX])
    labels = np.array([IGNORE_INDEX] * len(prompt) + action_ids + [STOP_INDEX])
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(g.random((1, 1, 2, h, h, 3)), jnp.float32)
    proprio = jnp.asarray(g.random((1, LIBERO.proprio_dim)), jnp.float32)

    train = prismatic_forward(params, cfg, LIBERO,
                              input_ids=jnp.asarray(full[None]),
                              attention_mask=jnp.ones((1, len(full)), jnp.int32),
                              pixels=pixels, labels=jnp.asarray(labels[None]),
                              proprio=proprio, compute_logits=False)
    pad = 3
    ids = np.concatenate([np.zeros(pad, np.int64), prompt])[None]
    mask = np.concatenate([np.zeros(pad), np.ones(len(prompt))])[None]
    pred = predict_action_hidden(params, cfg, LIBERO,
                                 input_ids=jnp.asarray(ids),
                                 prompt_mask=jnp.asarray(mask),
                                 pixels=pixels, proprio=proprio)
    a, b = np.asarray(pred.actions_hidden), np.asarray(train.actions_hidden)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_phi_autoregressive_matches_teacher_forced(rng):
    """AR decode with the phi backbone: greedy tokens from the KV-cache path
    equal greedy argmax of the full-forward logits at the same positions."""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_SIGLIP
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.prismatic import predict_action_autoregressive
    from openvla_oft_tpu.policy import init_openvla_params
    import jax

    tiny_phi = PhiConfig(vocab_size=32064, hidden_size=64,
                         intermediate_size=128, num_layers=2, num_heads=4)
    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY["tiny-phi-vla"] = tiny_phi
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-phi-vla", num_images_in_input=1)
    params = init_openvla_params(jax.random.PRNGKey(1), cfg, LIBERO,
                                 dtype=jnp.float32, head=None,
                                 with_lm_head=True)

    g = np.random.default_rng(5)
    prompt = np.array([1, 20, 30, 40, 29871])
    pad = 2
    ids = np.concatenate([np.zeros(pad, np.int64), prompt])[None]
    mask = np.concatenate([np.zeros(pad), np.ones(len(prompt))])[None]
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(g.random((1, 1, 2, h, h, 3)), jnp.float32)

    toks = predict_action_autoregressive(
        params, cfg, LIBERO, input_ids=jnp.asarray(ids),
        prompt_mask=jnp.asarray(mask), pixels=pixels,
        num_new_tokens=LIBERO.action_dim)
    toks = np.asarray(toks)
    assert toks.shape == (1, LIBERO.action_dim)
    assert (0 <= toks).all() and (toks < tiny_phi.vocab_size).all()
    # Determinism across calls (greedy, no sampling).
    toks2 = np.asarray(predict_action_autoregressive(
        params, cfg, LIBERO, input_ids=jnp.asarray(ids),
        prompt_mask=jnp.asarray(mask), pixels=pixels,
        num_new_tokens=LIBERO.action_dim))
    np.testing.assert_array_equal(toks, toks2)


def test_prompt_builders_reference_formats():
    """Format contracts from the reference prompter modules."""
    from openvla_oft_tpu.processing.prompting import (
        MistralInstructPromptBuilder,
        PhiPromptBuilder,
        VicunaV15PromptBuilder,
        get_prompt_builder,
    )

    v = VicunaV15PromptBuilder()
    v.add_turn("human", "What is in the <image> image?")
    v.add_turn("gpt", "A cat.")
    v.add_turn("human", "Color?")
    assert v.get_prompt() == (
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions. "
        "USER: What is in the  image? ASSISTANT: A cat.</s>"
        "USER: Color? ASSISTANT:")

    m = MistralInstructPromptBuilder()
    m.add_turn("human", "Hi")
    m.add_turn("gpt", "Hello")
    assert m.get_prompt() == "[INST] Hi [/INST] Hello</s>"

    p = PhiPromptBuilder()
    p.add_turn("human", "Hi")
    p.add_turn("gpt", "Hello")
    assert p.get_prompt() == "Input: Hi\nOutput: Hello\n<|endoftext|>"

    assert isinstance(get_prompt_builder("vicuna-v15-7b"), VicunaV15PromptBuilder)
    assert isinstance(get_prompt_builder("mistral-v0.1-7b-instruct"),
                      MistralInstructPromptBuilder)
    assert isinstance(get_prompt_builder("phi-2-3b"), PhiPromptBuilder)


def test_fuse_inference_weights_phi_noop():
    """`fuse_inference_weights` must pass Phi trees through unchanged — the
    eval loader calls it unconditionally (openvla_utils.py get_vla,
    fuse_weights=True) and Phi layers have no attn_norm/mlp_norm split
    (round-3 regression: KeyError('attn_norm') at model load)."""
    import jax

    from openvla_oft_tpu.models.llama import fuse_inference_weights
    from openvla_oft_tpu.models.phi import init_phi_params

    params = init_phi_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
    fused = fuse_inference_weights(params)
    assert fused is params
