"""Autoregressive discrete decode (base-OpenVLA path): KV-cached greedy loop
must match a no-cache greedy loop over the full multimodal forward."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import EMPTY_TOKEN_ID, LIBERO
from openvla_oft_tpu.models.llama import embed_tokens, llama_model, lm_logits
from openvla_oft_tpu.models.prismatic import predict_action_autoregressive
from openvla_oft_tpu.policy import init_openvla_params

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


def _greedy_reference(params, prompt_ids, pixels, n_new):
    """No-cache greedy loop: rebuild [BOS, patches, prompt_rest + generated]
    each step (the reference's effective computation through HF generate)."""
    from openvla_oft_tpu.models.projector import vision_projector
    from openvla_oft_tpu.models.vision_backbone import vision_backbone_forward

    dtype = params["llm"]["embed"]["embedding"].dtype
    feats = vision_backbone_forward(params["vision_backbone"], CFG, pixels)
    patches = vision_projector(params["projector"], feats).astype(dtype)
    ids = list(prompt_ids)
    out = []
    for _ in range(n_new):
        text = embed_tokens(params["llm"], jnp.asarray([ids])).astype(dtype)
        mm = jnp.concatenate([text[:, :1], patches, text[:, 1:]], axis=1)
        hidden = llama_model(params["llm"], CFG.llm, mm)
        logits = lm_logits(params["llm"], hidden[:, -1:])
        tok = int(jnp.argmax(logits[0, 0]))
        out.append(tok)
        ids.append(tok)
    return out


@pytest.mark.slow
def test_ar_decode_matches_no_cache_greedy():
    rng = np.random.default_rng(0)
    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head=None,
                                 with_lm_head=True, use_proprio=False)
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((1, 1, 2, h, h, 3)), jnp.float32)
    prompt = [1] + list(rng.integers(10, 1000, 5)) + [EMPTY_TOKEN_ID]

    ref = _greedy_reference(params, prompt, pixels, n_new=LIBERO.action_dim)

    for pad in (0, 4):
        bucket = len(prompt) + pad
        ids = np.zeros((1, bucket), np.int32)
        mask = np.zeros((1, bucket), np.int32)
        ids[0, pad:] = prompt
        mask[0, pad:] = 1
        tokens = predict_action_autoregressive(
            params, CFG, LIBERO, jnp.asarray(ids), jnp.asarray(mask), pixels,
            num_new_tokens=LIBERO.action_dim)
        assert list(np.asarray(tokens)[0]) == ref, (pad, tokens, ref)
