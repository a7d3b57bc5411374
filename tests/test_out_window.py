"""Parity for llama_model(out_window=...): the sliced final layer must equal
slicing the full-model output, across every mask-construction branch the
serving paths use (dense bidir, explicit attn_mask, padding-only causal,
maskless causal, fused wqkv). The serving win it guards: only the action-slot
rows of the last layer are ever read (models/prismatic.py
predict_action_hidden), so Q/attention/MLP for all other rows are skipped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvla_oft_tpu.config import LlamaConfig
from openvla_oft_tpu.models.llama import (
    fuse_inference_weights,
    init_llama_params,
    llama_model,
)

CFG = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_layers=3, num_heads=4, num_kv_heads=2)
B, S = 2, 24
W0, WL = 15, 6   # output window


@pytest.fixture(scope="module")
def setup():
    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, S, 64), jnp.float32)
    padding = jnp.ones((B, S), bool).at[1, :3].set(False)  # row 1 left-padded
    bidir = jnp.zeros((B, S), bool).at[:, 16:22].set(True)
    positions = jnp.maximum(
        jnp.arange(S)[None] - jnp.asarray([[0], [3]]), 0).astype(jnp.int32)
    return params, embeds, padding, bidir, positions


def _check(params, embeds, kw):
    full = llama_model(params, CFG, embeds, **kw)
    sliced = llama_model(params, CFG, embeds, out_window=(W0, WL), **kw)
    np.testing.assert_allclose(np.asarray(full[:, W0:W0 + WL]),
                               np.asarray(sliced), rtol=2e-5, atol=2e-5)


def test_dense_bidir_with_padding(setup):
    params, embeds, padding, bidir, positions = setup
    _check(params, embeds, dict(padding_mask=padding, bidir_mask=bidir,
                                positions=positions))


def test_bidir_block_static_window(setup):
    params, embeds, _, _, _ = setup
    _check(params, embeds, dict(bidir_block=(16, 6)))


def test_explicit_attn_mask(setup):
    params, embeds, padding, bidir, positions = setup
    from openvla_oft_tpu.ops.masks import make_block_bidirectional_mask

    mask = make_block_bidirectional_mask(padding, bidir)[:, None]
    _check(params, embeds, dict(attn_mask=mask, positions=positions))


def test_padding_only_causal(setup):
    params, embeds, padding, _, positions = setup
    _check(params, embeds, dict(padding_mask=padding, positions=positions))


def test_maskless_causal(setup):
    params, embeds, _, _, _ = setup
    _check(params, embeds, {})


def test_fused_wqkv(setup):
    params, embeds, padding, bidir, positions = setup
    fused = fuse_inference_weights(params)
    _check(fused, embeds, dict(padding_mask=padding, bidir_mask=bidir,
                               positions=positions))


def test_fused_int8_wqkv(setup):
    """The sliced last layer must column-slice scale_w along with the int8
    kernel (a raw kernel matmul would drop the per-channel scales)."""
    params, embeds, padding, bidir, positions = setup
    from openvla_oft_tpu.ops.quant import quantize_tree

    fused = fuse_inference_weights(params)
    fused = {**fused, "layers": quantize_tree(fused["layers"], min_dim=32)}
    _check(fused, embeds, dict(padding_mask=padding, bidir_mask=bidir,
                               positions=positions))


def test_predict_action_hidden_out_window_wiring():
    """End-to-end wiring: predict_action_hidden (Llama family -> out_window
    path) equals manually running the same program with the full-width LLM and
    slicing — the exact pre-round-3 semantics. (The stored golden
    tests/goldens/predict_action_hidden.npz also pins these numerics.)"""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import (OpenVLAConfig, TINY_DINOV2,
                                        TINY_LLAMA, TINY_SIGLIP)
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models import prismatic
    from openvla_oft_tpu.policy import init_openvla_params

    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama", num_images_in_input=2)
    params = init_openvla_params(jax.random.PRNGKey(0), cfg, LIBERO,
                                 dtype=jnp.float32, head="l1",
                                 head_dtype=jnp.float32)
    ids = jnp.zeros((1, 8), jnp.int32).at[0, 2:].set(
        jnp.asarray([1, 9, 9, 9, 9, 29871]))
    mask = jnp.zeros((1, 8), jnp.int32).at[0, 2:].set(1)
    h = TINY_DINOV2.image_size
    pixels = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, h, h, 3),
                               jnp.float32)
    pro = jnp.ones((1, LIBERO.proprio_dim), jnp.float32)

    out = prismatic.predict_action_hidden(params, cfg, LIBERO, input_ids=ids,
                                          prompt_mask=mask, pixels=pixels,
                                          proprio=pro, use_flash=False)

    # Oracle: the identical program with out_window disabled (full LLM run +
    # slice). `_run_llm` calls prismatic's module-level `llama_model` binding
    # (prismatic.py:49) — patch that name.
    real = prismatic.llama_model

    def full_then_slice(params_, cfg_, embeds_, **kw):
        win = kw.pop("out_window", None)
        hidden = real(params_, cfg_, embeds_, **kw)
        if win is None:
            return hidden
        return jax.lax.dynamic_slice_in_dim(hidden, win[0], win[1], axis=1)

    prismatic.llama_model = full_then_slice
    try:
        oracle = prismatic.predict_action_hidden(
            params, cfg, LIBERO, input_ids=ids, prompt_mask=mask,
            pixels=pixels, proprio=pro, use_flash=False)
    finally:
        prismatic.llama_model = real

    np.testing.assert_allclose(np.asarray(out.actions_hidden),
                               np.asarray(oracle.actions_hidden),
                               rtol=2e-5, atol=2e-5)
