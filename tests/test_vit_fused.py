"""ops/vit_fused.ln_matmul parity vs layer_norm + linear + activation."""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from openvla_oft_tpu.ops.layers import gelu, gelu_tanh, layer_norm, linear, quick_gelu
from openvla_oft_tpu.ops.vit_fused import ln_matmul


def _ref(x, w, b, act):
    y = linear({"kernel": w, "bias": b}, layer_norm({}, x))
    return {None: lambda v: v, "gelu": gelu, "gelu_tanh": gelu_tanh,
            "quick_gelu": quick_gelu}[act](y)


def test_ln_matmul_parity_all_activations(rng):
    m, d, n = 37, 64, 96  # deliberately off the block sizes -> padding paths
    x = jnp.asarray(rng.normal(0, 1.5, (2, m, d)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (d, n)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)
    for act in (None, "gelu", "gelu_tanh", "quick_gelu"):
        got = np.asarray(ln_matmul(x, w, b, act=act, block_m=16, block_n=128))
        ref = np.asarray(_ref(x, w, b, act))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"act={act}")


def test_ln_matmul_no_bias_and_bf16(rng):
    x = jnp.asarray(rng.normal(0, 1, (48, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (128, 128)), jnp.bfloat16)
    got = np.asarray(ln_matmul(x, w, None, block_m=16).astype(jnp.float32))
    ref = np.asarray(linear({"kernel": w}, layer_norm({}, x)).astype(jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_vit_block_fused_gate_off_on_cpu(rng):
    """On CPU the gate must keep the XLA path (interpret kernels would slow
    tests); folded-weight featurize still runs and matches unfolded."""
    import jax

    from openvla_oft_tpu.config import TINY_SIGLIP
    from openvla_oft_tpu.models.vit import (
        _use_fused_ln_matmul,
        fuse_vit_inference_weights,
        init_vit_params,
        vit_featurize,
    )

    params = init_vit_params(jax.random.PRNGKey(0), TINY_SIGLIP,
                             dtype=jnp.float32)
    fused = fuse_vit_inference_weights(params)
    layers0 = jax.tree_util.tree_map(lambda a: a[0], fused["layers"])
    assert not _use_fused_ln_matmul(layers0["norm1"], layers0["attn"]["qkv"])
    imgs = jnp.asarray(rng.normal(0, 1, (1, TINY_SIGLIP.image_size,
                                         TINY_SIGLIP.image_size, 3)),
                       jnp.float32)
    ref = np.asarray(vit_featurize(params, TINY_SIGLIP, imgs))
    got = np.asarray(vit_featurize(fused, TINY_SIGLIP, imgs))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
