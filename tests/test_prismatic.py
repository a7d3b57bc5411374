"""Prismatic core invariants: inference layout == training layout, bucket
invariance, action-mask semantics, DDIM exact-recovery."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import (
    ACTION_TOKEN_BEGIN_IDX,
    EMPTY_TOKEN_ID,
    IGNORE_INDEX,
    LIBERO,
    STOP_INDEX,
)
from openvla_oft_tpu.models.llama import init_llama_params
from openvla_oft_tpu.models.prismatic import (
    predict_action_hidden,
    prismatic_forward,
)
from openvla_oft_tpu.models.projector import (
    init_proprio_projector,
    init_vision_projector,
)
from openvla_oft_tpu.models.vision_backbone import init_vision_backbone
from openvla_oft_tpu.ops import masks as mask_ops

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)

CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama",
                    num_images_in_input=1)


@pytest.fixture(scope="module")
def params():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {
        "llm": init_llama_params(ks[0], CFG.llm, dtype=jnp.float32),
        "vision_backbone": init_vision_backbone(ks[1], CFG, dtype=jnp.float32),
        "projector": init_vision_projector(ks[2], CFG.vision_dim, CFG.llm_dim),
        "proprio_projector": init_proprio_projector(ks[3], LIBERO.proprio_dim,
                                                    CFG.llm_dim),
    }


def _make_example(prompt_len=6):
    """Token sequence as the reference builds it for prediction:
    [BOS, prompt..., 29871] + [chunk placeholders] + [STOP]."""
    rng = np.random.default_rng(3)
    chunk = LIBERO.chunk_len
    prompt = [1] + list(rng.integers(10, 1000, prompt_len - 2)) + [EMPTY_TOKEN_ID]
    action_ids = list(rng.integers(ACTION_TOKEN_BEGIN_IDX + 1,
                                   ACTION_TOKEN_BEGIN_IDX + 257, chunk))
    full_ids = prompt + action_ids + [STOP_INDEX]
    labels = [IGNORE_INDEX] * len(prompt) + action_ids + [STOP_INDEX]
    return np.array(prompt), np.array(full_ids), np.array(labels)


def _pixels(b=1):
    rng = np.random.default_rng(7)
    h = TINY_DINOV2.image_size
    return jnp.asarray(rng.random((b, 1, 2, h, h, 3)), jnp.float32)


@pytest.mark.slow
def test_inference_layout_matches_training_layout(params):
    """Left-padded logical-position inference == reference physical layout."""
    prompt, full_ids, labels = _make_example()
    pixels = _pixels()
    proprio = jnp.asarray(np.random.default_rng(5).random((1, LIBERO.proprio_dim)),
                          jnp.float32)

    train_out = prismatic_forward(
        params, CFG, LIBERO,
        input_ids=jnp.asarray(full_ids[None]),
        attention_mask=jnp.ones((1, len(full_ids)), jnp.int32),
        pixels=pixels, labels=jnp.asarray(labels[None]), proprio=proprio,
        compute_logits=False)

    for bucket in (len(prompt), len(prompt) + 5):
        pad = bucket - len(prompt)
        ids = np.concatenate([np.zeros(pad, np.int64), prompt])
        mask = np.concatenate([np.zeros(pad, np.int64), np.ones(len(prompt))])
        pred = predict_action_hidden(
            params, CFG, LIBERO,
            input_ids=jnp.asarray(ids[None]), prompt_mask=jnp.asarray(mask[None]),
            pixels=pixels, proprio=proprio)
        np.testing.assert_allclose(
            np.asarray(pred.actions_hidden), np.asarray(train_out.actions_hidden),
            rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_batched_mixed_prompt_lengths(params):
    """Two different prompt lengths in one batch match their solo runs."""
    pixels2 = jnp.concatenate([_pixels(), _pixels()], axis=0)
    bucket = 12
    rows = []
    for plen in (5, 9):
        prompt, _, _ = _make_example(plen)
        pad = bucket - len(prompt)
        rows.append((np.concatenate([np.zeros(pad, np.int64), prompt]),
                     np.concatenate([np.zeros(pad, np.int64), np.ones(len(prompt))])))
    ids = np.stack([r[0] for r in rows])
    mask = np.stack([r[1] for r in rows])
    batch = predict_action_hidden(params, CFG, LIBERO,
                                  input_ids=jnp.asarray(ids),
                                  prompt_mask=jnp.asarray(mask), pixels=pixels2)
    for b in range(2):
        solo = predict_action_hidden(
            params, CFG, LIBERO, input_ids=jnp.asarray(ids[b:b + 1]),
            prompt_mask=jnp.asarray(mask[b:b + 1]), pixels=_pixels())
        np.testing.assert_allclose(np.asarray(batch.actions_hidden[b]),
                                   np.asarray(solo.actions_hidden[0]),
                                   rtol=2e-4, atol=2e-4)


def test_action_masks_reference_semantics():
    """Cumsum-window mask semantics (train_utils.py:8-39) on a worked example."""
    ad = LIBERO.action_dim
    labels = np.full((1, 20), IGNORE_INDEX)
    token_vals = np.concatenate([
        np.full(2 * ad, ACTION_TOKEN_BEGIN_IDX + 5),  # 14 action tokens
        [STOP_INDEX]])
    labels[0, 4:4 + len(token_vals)] = token_vals
    cur = np.asarray(mask_ops.get_current_action_mask(jnp.asarray(labels), ad))
    nxt = np.asarray(mask_ops.get_next_actions_mask(jnp.asarray(labels), ad))
    assert cur[0, 4:4 + ad].all() and cur.sum() == ad
    assert nxt[0, 4 + ad:4 + 2 * ad].all() and nxt.sum() == ad
    # STOP token (id 2, not an action token) excluded from both.
    assert not cur[0, 4 + 2 * ad] and not nxt[0, 4 + 2 * ad]


def test_ddim_exact_recovery():
    """With the ideal epsilon-model, DDIM sampling recovers x0 exactly."""
    from openvla_oft_tpu.ops.ddim import DDIMScheduler

    sched = DDIMScheduler(num_train_timesteps=100)
    ac = sched.alphas_cumprod
    assert ac.shape == (100,) and np.all(np.diff(ac) < 0) and 0 < ac[-1] < ac[0] <= 1
    ts = sched.timesteps(50)
    assert ts[0] == 98 and ts[-1] == 0 and len(ts) == 50

    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 8, 7)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 8, 7)), jnp.float32)
    for t in ts:
        a_t = jnp.float32(ac[t])
        eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)  # ideal model
        x = sched.step(eps, jnp.asarray(t), x, num_inference_steps=50)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_add_noise_formula():
    from openvla_oft_tpu.ops.ddim import DDIMScheduler

    sched = DDIMScheduler(num_train_timesteps=100)
    x0 = jnp.ones((2, 3, 4))
    noise = 2 * jnp.ones((2, 3, 4))
    t = jnp.asarray([0, 50])
    out = np.asarray(sched.add_noise(x0, noise, t))
    ac = sched.alphas_cumprod
    for b, tt in enumerate([0, 50]):
        expect = np.sqrt(ac[tt]) * 1 + np.sqrt(1 - ac[tt]) * 2
        np.testing.assert_allclose(out[b], expect, rtol=1e-6)


@pytest.mark.slow
def test_aloha_platform_layout_equivalence(params):
    """ALOHA geometry (3 images, 25x14 chunk) through both layouts."""
    from openvla_oft_tpu.constants import ALOHA

    rng = np.random.default_rng(17)
    chunk = ALOHA.chunk_len
    prompt = [1] + list(rng.integers(10, 1000, 6)) + [EMPTY_TOKEN_ID]
    action_ids = list(rng.integers(ACTION_TOKEN_BEGIN_IDX + 1,
                                   ACTION_TOKEN_BEGIN_IDX + 257, chunk))
    full_ids = np.array(prompt + action_ids + [STOP_INDEX])
    labels = np.array([IGNORE_INDEX] * len(prompt) + action_ids + [STOP_INDEX])

    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((1, 3, 2, h, h, 3)), jnp.float32)
    proprio = jnp.asarray(rng.random((1, ALOHA.proprio_dim)), jnp.float32)

    # params fixture has a LIBERO proprio projector (8-dim); swap in 14-dim
    from openvla_oft_tpu.models.projector import init_proprio_projector

    p = dict(params)
    p["proprio_projector"] = init_proprio_projector(
        jax.random.PRNGKey(9), ALOHA.proprio_dim, CFG.llm_dim)

    cfg3 = __import__("dataclasses").replace(CFG, num_images_in_input=3)
    train_out = prismatic_forward(
        p, cfg3, ALOHA, input_ids=jnp.asarray(full_ids[None]),
        attention_mask=jnp.ones((1, len(full_ids)), jnp.int32),
        pixels=pixels, labels=jnp.asarray(labels[None]), proprio=proprio,
        compute_logits=False)
    assert train_out.actions_hidden.shape == (1, chunk, CFG.llm_dim)

    bucket = len(prompt) + 4
    pad = bucket - len(prompt)
    ids = np.concatenate([np.zeros(pad, np.int64), prompt])
    mask = np.concatenate([np.zeros(pad, np.int64), np.ones(len(prompt))])
    pred = predict_action_hidden(
        p, cfg3, ALOHA, input_ids=jnp.asarray(ids[None]),
        prompt_mask=jnp.asarray(mask[None]), pixels=pixels, proprio=proprio)
    np.testing.assert_allclose(np.asarray(pred.actions_hidden),
                               np.asarray(train_out.actions_hidden),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_stop_token_inside_bidirectional_window(params):
    """The fork's non-causal window includes the trailing STOP token — the
    reference appends it at inference because "it appears at train time" in
    bidirectional attention (modeling_prismatic.py:742). Contract: perturbing
    the STOP embedding row must change the action hidden states on BOTH the
    training forward and the inference prefill (under an actions-only window
    a trailing token is provably inert), while the gather still returns
    exactly chunk_len slots."""
    prompt, full_ids, labels = _make_example()
    pixels = _pixels()

    mutated = jax.tree_util.tree_map(lambda x: x, params)
    emb = mutated["llm"]["embed"]["embedding"]
    mutated["llm"] = dict(mutated["llm"])
    mutated["llm"]["embed"] = {
        "embedding": emb.at[STOP_INDEX].add(1.0)}

    def train_hidden(p):
        return np.asarray(prismatic_forward(
            p, CFG, LIBERO, input_ids=jnp.asarray(full_ids[None]),
            attention_mask=jnp.ones((1, len(full_ids)), jnp.int32),
            pixels=pixels, labels=jnp.asarray(labels[None]),
            compute_logits=False).actions_hidden)

    a, b_ = train_hidden(params), train_hidden(mutated)
    assert a.shape[1] == LIBERO.chunk_len
    assert np.abs(a - b_).max() > 1e-6, \
        "STOP embedding is inert in training attention window"

    def pred_hidden(p):
        return np.asarray(predict_action_hidden(
            p, CFG, LIBERO, input_ids=jnp.asarray(prompt[None]),
            prompt_mask=jnp.ones((1, len(prompt)), jnp.int32),
            pixels=pixels).actions_hidden)

    c, d = pred_hidden(params), pred_hidden(mutated)
    assert np.abs(c - d).max() > 1e-6, \
        "STOP embedding is inert in inference attention window"
