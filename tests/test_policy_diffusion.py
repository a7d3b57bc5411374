"""OpenVLAPolicy end-to-end for the diffusion head (scanned DDIM loop) and
LIBERO eval observation helpers."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import LIBERO
from openvla_oft_tpu.policy import OpenVLAPolicy, init_openvla_params

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


def test_diffusion_policy_end_to_end(rng):
    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head="diffusion")
    policy = OpenVLAPolicy(cfg=CFG, platform=LIBERO, params=params,
                           head="diffusion", prompt_bucket=24,
                           num_diffusion_steps_inference=5)
    h = TINY_DINOV2.image_size
    pixels = rng.random((1, 2, h, h, 3)).astype(np.float32)
    proprio = rng.random(LIBERO.proprio_dim).astype(np.float32)
    a1 = policy.predict_action(pixels, "shake the bottle", proprio=proprio)
    assert a1.shape == (LIBERO.num_actions_chunk, LIBERO.action_dim)
    assert np.isfinite(a1).all()
    # fresh starting noise each call -> different trajectories (no stats, so
    # outputs are the raw denoised actions)
    a2 = policy.predict_action(pixels, "shake the bottle", proprio=proprio)
    assert np.abs(a1 - a2).max() > 1e-6


def test_diffusion_prefix_kv_matches_full_prefill(rng):
    """The prefix-KV suffix path must reproduce the full-prefill numerics:
    (a) one step's actions_hidden vs predict_action_hidden, (b) the whole
    scanned DDIM trajectory with the same starting noise."""
    import jax.numpy as jnp
    from openvla_oft_tpu.models.action_heads import sinusoidal_time_encoding
    from openvla_oft_tpu.models.prismatic import (
        build_diffusion_prefix,
        diffusion_suffix_step,
        predict_action_hidden,
    )

    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head="diffusion")
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((1, 1, 2, h, h, 3)), jnp.float32)
    proprio = jnp.asarray(rng.random((1, LIBERO.proprio_dim)), jnp.float32)
    bucket = 24
    # left-padded prompt: 5 pads + BOS + 17 tokens + 29871
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    real = rng.integers(3, 100, size=18).tolist() + [29871]
    ids[0, bucket - len(real):] = real
    ids[0, bucket - len(real)] = 1  # BOS
    mask[0, bucket - len(real):] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    x_t = jnp.asarray(rng.standard_normal(
        (1, LIBERO.num_actions_chunk, LIBERO.action_dim)), jnp.float32)
    t_emb = sinusoidal_time_encoding(jnp.asarray([7]), CFG.llm_dim)[:, None, :]

    full = predict_action_hidden(params, CFG, LIBERO, input_ids=ids,
                                 prompt_mask=mask, pixels=pixels,
                                 proprio=proprio, noisy_actions=x_t,
                                 diffusion_t_emb=t_emb, use_flash=False)
    prefix = build_diffusion_prefix(params, CFG, ids, mask, pixels, proprio)
    fast = diffusion_suffix_step(params, CFG, LIBERO, prefix, t_emb, x_t)
    np.testing.assert_allclose(np.asarray(fast),
                               np.asarray(full.actions_hidden),
                               rtol=1e-4, atol=1e-4)

    # whole-loop parity with identical starting noise
    pol_kw = dict(cfg=CFG, platform=LIBERO, params=params, head="diffusion",
                  prompt_bucket=bucket, num_diffusion_steps_inference=4)
    fast_pol = OpenVLAPolicy(**pol_kw, diffusion_prefix_kv=True)
    slow_pol = OpenVLAPolicy(**pol_kw, diffusion_prefix_kv=False)
    key = jax.random.PRNGKey(3)
    a_fast, _ = fast_pol._predict_jit(params, ids, mask, pixels, proprio,
                                      noise_key=key)
    a_slow, _ = slow_pol._predict_jit(params, ids, mask, pixels, proprio,
                                      noise_key=key)
    np.testing.assert_allclose(np.asarray(a_fast), np.asarray(a_slow),
                               rtol=1e-4, atol=1e-4)


def test_diffusion_prefix_kv_aloha_geometry(rng):
    """Multi-image (3 cams) + ALOHA 25x14 chunk + no proprio: the prefix/
    suffix split must hold at every platform geometry, not just LIBERO."""
    import dataclasses as dc

    import jax.numpy as jnp
    from openvla_oft_tpu.constants import ALOHA
    from openvla_oft_tpu.models.action_heads import sinusoidal_time_encoding
    from openvla_oft_tpu.models.prismatic import (
        build_diffusion_prefix,
        diffusion_suffix_step,
        predict_action_hidden,
    )

    cfg = dc.replace(CFG, num_images_in_input=3)
    params = init_openvla_params(jax.random.PRNGKey(2), cfg, ALOHA,
                                 dtype=jnp.float32, head="diffusion",
                                 use_proprio=False)
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((1, 3, 2, h, h, 3)), jnp.float32)
    bucket = 16
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    real = [1] + list(rng.integers(3, 100, 9).tolist()) + [29871]
    ids[0, bucket - len(real):] = real
    mask[0, bucket - len(real):] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    x_t = jnp.asarray(rng.standard_normal(
        (1, ALOHA.num_actions_chunk, ALOHA.action_dim)), jnp.float32)
    t_emb = sinusoidal_time_encoding(jnp.asarray([42]), cfg.llm_dim)[:, None, :]

    full = predict_action_hidden(params, cfg, ALOHA, input_ids=ids,
                                 prompt_mask=mask, pixels=pixels,
                                 proprio=None, noisy_actions=x_t,
                                 diffusion_t_emb=t_emb, use_flash=False)
    prefix = build_diffusion_prefix(params, cfg, ids, mask, pixels, None)
    fast = diffusion_suffix_step(params, cfg, ALOHA, prefix, t_emb, x_t)
    assert fast.shape == (1, ALOHA.chunk_len, cfg.llm_dim)
    np.testing.assert_allclose(np.asarray(fast),
                               np.asarray(full.actions_hidden),
                               rtol=1e-4, atol=1e-4)


def test_diffusion_prefix_kv_with_film(rng):
    """FiLM + prefix-KV (the benched ALOHA OFT+ config): the language
    embedding FiLM feeds the ViT is prompt-only, hence loop-invariant — the
    FiLMed patch block must land in the cached prefix with exact numerics."""
    import dataclasses as dc

    import jax.numpy as jnp
    from openvla_oft_tpu.constants import ALOHA
    from openvla_oft_tpu.models.action_heads import sinusoidal_time_encoding
    from openvla_oft_tpu.models.prismatic import (
        build_diffusion_prefix,
        diffusion_suffix_step,
        predict_action_hidden,
    )

    cfg = dc.replace(CFG, num_images_in_input=3, use_film=True)
    params = init_openvla_params(jax.random.PRNGKey(5), cfg, ALOHA,
                                 dtype=jnp.float32, head="diffusion",
                                 use_proprio=False)
    assert "film" in params
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((1, 3, 2, h, h, 3)), jnp.float32)
    bucket = 16
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    real = [1] + list(rng.integers(3, 100, 9).tolist()) + [29871]
    ids[0, bucket - len(real):] = real
    mask[0, bucket - len(real):] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    x_t = jnp.asarray(rng.standard_normal(
        (1, ALOHA.num_actions_chunk, ALOHA.action_dim)), jnp.float32)
    t_emb = sinusoidal_time_encoding(jnp.asarray([11]), cfg.llm_dim)[:, None, :]

    full = predict_action_hidden(params, cfg, ALOHA, input_ids=ids,
                                 prompt_mask=mask, pixels=pixels,
                                 proprio=None, noisy_actions=x_t,
                                 diffusion_t_emb=t_emb, use_flash=False)
    prefix = build_diffusion_prefix(params, cfg, ids, mask, pixels, None)
    fast = diffusion_suffix_step(params, cfg, ALOHA, prefix, t_emb, x_t)
    np.testing.assert_allclose(np.asarray(fast),
                               np.asarray(full.actions_hidden),
                               rtol=1e-4, atol=1e-4)

    # whole scanned loop through the policy (what bench_diffusion
    # --platform aloha times), FiLM on, prefix-kv vs full prefill
    pol_kw = dict(cfg=cfg, platform=ALOHA, params=params, head="diffusion",
                  prompt_bucket=bucket, num_diffusion_steps_inference=3)
    fast_pol = OpenVLAPolicy(**pol_kw, diffusion_prefix_kv=True)
    slow_pol = OpenVLAPolicy(**pol_kw, diffusion_prefix_kv=False)
    key = jax.random.PRNGKey(9)
    a_fast, _ = fast_pol._predict_jit(params, ids, mask, pixels, None,
                                      noise_key=key)
    a_slow, _ = slow_pol._predict_jit(params, ids, mask, pixels, None,
                                      noise_key=key)
    np.testing.assert_allclose(np.asarray(a_fast), np.asarray(a_slow),
                               rtol=1e-4, atol=1e-4)


def test_libero_eval_helpers(rng):
    from experiments.robot.libero.libero_utils import quat2axisangle
    from experiments.robot.libero.run_libero_eval import (
        GenerateConfig,
        prepare_observation,
        process_action,
        validate_config,
    )

    # quat -> axis-angle: identity quaternion maps to zero rotation
    np.testing.assert_allclose(quat2axisangle(np.asarray([0, 0, 0, 1.0])),
                               np.zeros(3), atol=1e-9)
    # 90 deg about z
    q = np.asarray([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    aa = quat2axisangle(q)
    np.testing.assert_allclose(aa, [0, 0, np.pi / 2], atol=1e-6)

    obs = {
        "agentview_image": (rng.random((64, 64, 3)) * 255).astype(np.uint8),
        "robot0_eye_in_hand_image": (rng.random((64, 64, 3)) * 255
                                     ).astype(np.uint8),
        "robot0_eef_pos": np.zeros(3),
        "robot0_eef_quat": np.asarray([0, 0, 0, 1.0]),
        "robot0_gripper_qpos": np.asarray([0.02, -0.02]),
    }
    observation, img = prepare_observation(obs, 224)
    assert observation["state"].shape == (8,)
    assert observation["full_image"].shape == (64, 64, 3)
    # image was flipped upright
    np.testing.assert_array_equal(img, obs["agentview_image"][::-1, ::-1])

    a = process_action(np.asarray([0.1, 0, 0, 0, 0, 0, 0.9]), "openvla")
    assert a[-1] == -1.0  # [0,1] -> binarized +1 -> inverted

    cfg = GenerateConfig(pretrained_checkpoint="x--image_aug", center_crop=True)
    validate_config(cfg)
    with pytest.raises(AssertionError):
        validate_config(GenerateConfig(pretrained_checkpoint=""))
