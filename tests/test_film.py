"""FiLM language-conditioned vision: modulation changes features, identity at
zero-init scale/shift, and the full predict path runs with FiLM enabled."""

import numpy as np
import jax
import jax.numpy as jnp

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import EMPTY_TOKEN_ID, LIBERO
from openvla_oft_tpu.models.prismatic import predict_action_hidden
from openvla_oft_tpu.models.vit import init_film_params, init_vit_params, vit_featurize
from openvla_oft_tpu.policy import init_openvla_params

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)


def test_film_zero_init_is_identity(rng):
    cfg = TINY_DINOV2
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    film = init_film_params(jax.random.PRNGKey(1), cfg, llm_dim=64)
    film = jax.tree_util.tree_map(jnp.zeros_like, film)  # gamma=beta=0
    x = jnp.asarray(rng.random((2, cfg.image_size, cfg.image_size, 3)),
                    jnp.float32)
    le = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    plain = vit_featurize(params, cfg, x)
    filmed = vit_featurize(params, cfg, x, film_params=film,
                           language_embedding=le)
    np.testing.assert_allclose(np.asarray(filmed), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)


def test_film_modulation_and_language_dependence(rng):
    cfg = TINY_DINOV2
    params = init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    film = init_film_params(jax.random.PRNGKey(1), cfg, llm_dim=64)
    x = jnp.asarray(rng.random((1, cfg.image_size, cfg.image_size, 3)),
                    jnp.float32)
    le1 = jnp.asarray(rng.standard_normal((1, 64)), jnp.float32)
    le2 = jnp.asarray(rng.standard_normal((1, 64)), jnp.float32)
    f1 = vit_featurize(params, cfg, x, film_params=film, language_embedding=le1)
    f2 = vit_featurize(params, cfg, x, film_params=film, language_embedding=le2)
    assert np.abs(np.asarray(f1) - np.asarray(f2)).max() > 1e-4


def test_predict_with_film_end_to_end(rng):
    mcfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                         llm_backbone_id="tiny-llama", use_film=True)
    params = init_openvla_params(jax.random.PRNGKey(0), mcfg, LIBERO,
                                 dtype=jnp.float32, head="l1")
    assert "film" in params
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((1, 1, 2, h, h, 3)), jnp.float32)
    ids = np.zeros((1, 10), np.int32)
    ids[0, 2:] = [1, 5, 6, 7, 8, 9, 10, EMPTY_TOKEN_ID]
    mask = np.zeros((1, 10), np.int32)
    mask[0, 2:] = 1
    out = predict_action_hidden(params, mcfg, LIBERO,
                                input_ids=jnp.asarray(ids),
                                prompt_mask=jnp.asarray(mask), pixels=pixels)
    assert out.actions_hidden.shape == (1, LIBERO.chunk_len, mcfg.llm_dim)
    assert np.isfinite(np.asarray(out.actions_hidden)).all()
