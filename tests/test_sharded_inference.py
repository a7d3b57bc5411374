"""Sharded inference correctness: tp/fsdp-sharded predict equals the
single-device result (GSPMD must only change layout, never math)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import EMPTY_TOKEN_ID, LIBERO
from openvla_oft_tpu.models.prismatic import predict_action_hidden
from openvla_oft_tpu.parallel.mesh import make_mesh
from openvla_oft_tpu.parallel.sharding import param_pspecs, shard_params
from openvla_oft_tpu.policy import init_openvla_params

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


@pytest.mark.slow
def test_tp_fsdp_sharded_predict_matches_single_device(rng):
    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head="l1")
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((2, 1, 2, h, h, 3)), jnp.float32)
    ids = np.zeros((2, 12), np.int32)
    mask = np.zeros((2, 12), np.int32)
    for b, plen in enumerate([8, 11]):
        ids[b, 12 - plen] = 1
        ids[b, 12 - plen + 1:11] = rng.integers(5, 900, plen - 2)
        ids[b, 11] = EMPTY_TOKEN_ID
        mask[b, 12 - plen:] = 1

    def run(p, px, i, m):
        return predict_action_hidden(p, CFG, LIBERO, input_ids=i,
                                     prompt_mask=m, pixels=px).actions_hidden

    ref = np.asarray(run(params, pixels, jnp.asarray(ids), jnp.asarray(mask)))

    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    with mesh:
        sharded = shard_params(params, mesh)
        # tiny dims: verify at least some kernels actually got split
        specs = param_pspecs(params, mesh)
        any_split = any(s != P() for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P)))
        assert any_split
        data = NamedSharding(mesh, P(("dp", "fsdp")))
        out = jax.jit(run)(sharded,
                           jax.device_put(pixels, data),
                           jax.device_put(jnp.asarray(ids), data),
                           jax.device_put(jnp.asarray(mask), data))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_flash_kernel_under_tp_mesh(rng):
    """The Pallas kernel must at least run correctly under GSPMD sharding
    (efficiency of its partitioning is tracked separately)."""
    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head="l1")
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((2, 1, 2, h, h, 3)), jnp.float32)
    ids = np.zeros((2, 12), np.int32)
    mask = np.zeros((2, 12), np.int32)
    ids[:, 2] = 1
    ids[:, 3:12] = 7
    mask[:, 2:] = 1

    def run(p, px, i, m, flash):
        return predict_action_hidden(p, CFG, LIBERO, input_ids=i,
                                     prompt_mask=m, pixels=px,
                                     use_flash=flash).actions_hidden

    ref = np.asarray(run(params, pixels, jnp.asarray(ids), jnp.asarray(mask),
                         False))
    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    with mesh:
        sp = shard_params(params, mesh)
        data = NamedSharding(mesh, P(("dp", "fsdp")))
        out = jax.jit(lambda p, px, i, m: run(p, px, i, m, True))(
            sp, jax.device_put(pixels, data),
            jax.device_put(jnp.asarray(ids), data),
            jax.device_put(jnp.asarray(mask), data))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


def test_fused_weights_shard_over_tp():
    """fuse_inference_weights outputs (wqkv/gate_up) must match sharding
    rules — falling through to replication would silently blow up HBM and
    disable TP for ~2/3 of the 7B weights (round-2 review finding)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from openvla_oft_tpu.config import TINY_LLAMA
    from openvla_oft_tpu.models.llama import (
        fuse_inference_weights, init_llama_params)
    from openvla_oft_tpu.parallel.mesh import make_mesh
    from openvla_oft_tpu.parallel.sharding import param_pspecs

    params = {"llm": fuse_inference_weights(
        init_llama_params(jax.random.PRNGKey(0), TINY_LLAMA,
                          dtype=jnp.float32))}
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    specs = param_pspecs(params, mesh)
    attn = specs["llm"]["layers"]["attn"]
    mlp = specs["llm"]["layers"]["mlp"]
    assert attn["wqkv"]["kernel"] == P(None, "fsdp", "tp"), attn["wqkv"]
    assert mlp["gate_up"]["kernel"] == P(None, "fsdp", "tp"), mlp["gate_up"]
    assert attn["wo"]["kernel"] == P(None, "tp", "fsdp")


def test_flash_tp_mesh_shard_map_route_matches(rng):
    """predict_action_hidden(tp_mesh=mesh) routes the flash path through
    flash_attention_tp (shard_map over heads) — result must equal the
    unsharded flash path and the XLA dense path."""
    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head="l1")
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((2, 1, 2, h, h, 3)), jnp.float32)
    ids = np.zeros((2, 12), np.int32)
    mask = np.zeros((2, 12), np.int32)
    ids[:, 2] = 1
    ids[:, 3:12] = 7
    mask[:, 2:] = 1

    def run(p, px, i, m, flash, tp_mesh=None):
        return predict_action_hidden(p, CFG, LIBERO, input_ids=i,
                                     prompt_mask=m, pixels=px, use_flash=flash,
                                     tp_mesh=tp_mesh).actions_hidden

    ref = np.asarray(run(params, pixels, jnp.asarray(ids), jnp.asarray(mask),
                         False))
    mesh = make_mesh(dp=1, fsdp=2, tp=2)   # TINY_LLAMA has 4 heads -> tp=2
    with mesh:
        sp = shard_params(params, mesh)
        out = jax.jit(lambda p, px, i, m: run(p, px, i, m, True,
                                              tp_mesh=mesh))(
            sp, pixels, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)
