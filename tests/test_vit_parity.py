"""ViT featurizer parity vs HF transformers vision models (random tiny weights).

The reference's featurizers are timm ViTs (`modeling_prismatic.py:100-139`).
HF's `SiglipVisionModel` and `Dinov2WithRegistersModel` implement the same
block math (pre-LN, qkv attention, GELU MLP, LayerScale for DINOv2), so we port
our random params into them and require agreement at the second-to-last-layer
tap. Known representational differences handled in the mapping:
  - HF Dinov2 adds a position embedding to the CLS token (timm-reg4 /
    our config uses `no_embed_class`): we zero that row on the HF side.
  - HF stores q/k/v as separate Linears; ours is fused qkv.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from openvla_oft_tpu.config import ViTConfig
from openvla_oft_tpu.models.vit import init_vit_params, vit_featurize

TINY_SIGLIP = ViTConfig(width=32, depth=4, num_heads=4, mlp_dim=64,
                        patch_size=8, image_size=32, act="gelu_tanh")
TINY_DINO = ViTConfig(width=32, depth=4, num_heads=4, mlp_dim=128,
                      patch_size=8, image_size=32, num_cls_tokens=1,
                      num_reg_tokens=4, use_layer_scale=True,
                      pos_embed_patches_only=True)


def _np32(a):
    return np.asarray(a, dtype=np.float32)


def _set(t: torch.nn.Parameter, arr: np.ndarray):
    assert tuple(t.shape) == arr.shape, f"{tuple(t.shape)} vs {arr.shape}"
    with torch.no_grad():
        t.copy_(torch.from_numpy(np.ascontiguousarray(arr)))


def _unpatchify_kernel(kernel: np.ndarray, patch: int) -> np.ndarray:
    """our (p*p*3, D) matmul kernel -> conv weight (D, 3, p, p)."""
    d = kernel.shape[1]
    k = kernel.reshape(patch, patch, 3, d)
    return k.transpose(3, 2, 0, 1)


def _copy_block(hf_layer, lp, i, width, layerscale=False, siglip=False):
    qkv = _np32(lp["attn"]["qkv"]["kernel"][i])      # (D, 3D)
    qkv_b = _np32(lp["attn"]["qkv"]["bias"][i])
    q, k, v = np.split(qkv, 3, axis=1)
    qb, kb, vb = np.split(qkv_b, 3)
    if siglip:
        attn = hf_layer.self_attn
        ln1, ln2, mlp = hf_layer.layer_norm1, hf_layer.layer_norm2, hf_layer.mlp
        _set(attn.q_proj.weight, q.T), _set(attn.q_proj.bias, qb)
        _set(attn.k_proj.weight, k.T), _set(attn.k_proj.bias, kb)
        _set(attn.v_proj.weight, v.T), _set(attn.v_proj.bias, vb)
        _set(attn.out_proj.weight, _np32(lp["attn"]["proj"]["kernel"][i]).T)
        _set(attn.out_proj.bias, _np32(lp["attn"]["proj"]["bias"][i]))
    else:
        attn = hf_layer.attention
        ln1, ln2, mlp = hf_layer.norm1, hf_layer.norm2, hf_layer.mlp
        _set(attn.attention.query.weight, q.T), _set(attn.attention.query.bias, qb)
        _set(attn.attention.key.weight, k.T), _set(attn.attention.key.bias, kb)
        _set(attn.attention.value.weight, v.T), _set(attn.attention.value.bias, vb)
        _set(attn.output.dense.weight, _np32(lp["attn"]["proj"]["kernel"][i]).T)
        _set(attn.output.dense.bias, _np32(lp["attn"]["proj"]["bias"][i]))
    _set(ln1.weight, _np32(lp["norm1"]["scale"][i]))
    _set(ln1.bias, _np32(lp["norm1"]["bias"][i]))
    _set(ln2.weight, _np32(lp["norm2"]["scale"][i]))
    _set(ln2.bias, _np32(lp["norm2"]["bias"][i]))
    _set(mlp.fc1.weight, _np32(lp["mlp"]["fc1"]["kernel"][i]).T)
    _set(mlp.fc1.bias, _np32(lp["mlp"]["fc1"]["bias"][i]))
    _set(mlp.fc2.weight, _np32(lp["mlp"]["fc2"]["kernel"][i]).T)
    _set(mlp.fc2.bias, _np32(lp["mlp"]["fc2"]["bias"][i]))
    if layerscale:
        _set(hf_layer.layer_scale1.lambda1, _np32(lp["ls1"]["scale_factor"][i]))
        _set(hf_layer.layer_scale2.lambda1, _np32(lp["ls2"]["scale_factor"][i]))


def test_siglip_parity(rng):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg = TINY_SIGLIP
    import jax
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32),
        init_vit_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32))

    hf_cfg = SiglipVisionConfig(
        hidden_size=cfg.width, intermediate_size=cfg.mlp_dim,
        num_hidden_layers=cfg.depth, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        # HF SigLIP's default (and big_vision's): tanh-approximate GELU —
        # must match ViTConfig.act="gelu_tanh" on our side.
        hidden_act="gelu_pytorch_tanh", attn_implementation="eager")
    model = SiglipVisionModel(hf_cfg).eval()
    vm = model.vision_model
    _set(vm.embeddings.patch_embedding.weight,
         _unpatchify_kernel(_np32(params["patch_embed"]["kernel"]), cfg.patch_size))
    _set(vm.embeddings.patch_embedding.bias, _np32(params["patch_embed"]["bias"]))
    _set(vm.embeddings.position_embedding.weight, _np32(params["pos_embed"]))
    for i, layer in enumerate(vm.encoder.layers):
        _copy_block(layer, params["layers"], i, cfg.width, siglip=True)

    x = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = np.asarray(vit_featurize(params, cfg, jnp.asarray(x)))
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    theirs = out.hidden_states[cfg.depth - 1].numpy()  # after block depth-2
    np.testing.assert_allclose(ours, theirs, rtol=3e-5, atol=3e-5)


def test_dinov2_reg4_parity(rng):
    from transformers import (
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersModel,
    )

    cfg = TINY_DINO
    import jax
    key = jax.random.PRNGKey(2)
    params = init_vit_params(key, cfg, dtype=jnp.float32)
    # give cls/reg/ls nontrivial values
    params["cls_token"] = 0.1 * jax.random.normal(key, params["cls_token"].shape)
    params["reg_token"] = 0.1 * jax.random.normal(key, params["reg_token"].shape)

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=cfg.width, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, mlp_ratio=cfg.mlp_dim // cfg.width,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        num_register_tokens=cfg.num_reg_tokens, hidden_act="gelu",
        layerscale_value=1e-5, attn_implementation="eager")
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    emb = model.embeddings
    _set(emb.patch_embeddings.projection.weight,
         _unpatchify_kernel(_np32(params["patch_embed"]["kernel"]), cfg.patch_size))
    _set(emb.patch_embeddings.projection.bias, _np32(params["patch_embed"]["bias"]))
    _set(emb.cls_token, _np32(params["cls_token"])[None])
    _set(emb.register_tokens, _np32(params["reg_token"])[None])
    # HF pos embed covers [cls]+patches; timm no_embed_class has none on cls.
    pos = np.concatenate([np.zeros((1, 1, cfg.width), np.float32),
                          _np32(params["pos_embed"])[None]], axis=1)
    _set(emb.position_embeddings, pos)
    for i, layer in enumerate(model.encoder.layer):
        _copy_block(layer, params["layers"], i, cfg.width, layerscale=True)

    x = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = np.asarray(vit_featurize(params, cfg, jnp.asarray(x)))
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    theirs = out.hidden_states[cfg.depth - 1].numpy()[:, 1 + cfg.num_reg_tokens:]
    np.testing.assert_allclose(ours, theirs, rtol=3e-5, atol=3e-5)


def test_clip_parity(rng):
    """CLIP ViT (pre-norm + quick-GELU + cls token) vs HF CLIPVisionModel."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = ViTConfig(width=32, depth=4, num_heads=4, mlp_dim=64, patch_size=8,
                    image_size=32, num_cls_tokens=1, use_pre_norm=True,
                    act="quick_gelu")
    import jax
    params = init_vit_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    params["cls_token"] = 0.1 * jax.random.normal(jax.random.PRNGKey(4),
                                                  params["cls_token"].shape)
    # CLIP's patch conv has no bias
    params["patch_embed"]["bias"] = jnp.zeros_like(params["patch_embed"]["bias"])

    hf_cfg = CLIPVisionConfig(
        hidden_size=cfg.width, intermediate_size=cfg.mlp_dim,
        num_hidden_layers=cfg.depth, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_act="quick_gelu", attn_implementation="eager")
    model = CLIPVisionModel(hf_cfg).eval()
    vm = model.vision_model
    _set(vm.embeddings.patch_embedding.weight,
         _unpatchify_kernel(_np32(params["patch_embed"]["kernel"]),
                            cfg.patch_size))
    _set(vm.embeddings.class_embedding, _np32(params["cls_token"])[0])
    # HF pos embed covers [cls] + patches; ours likewise (no no_embed_class)
    _set(vm.embeddings.position_embedding.weight, _np32(params["pos_embed"]))
    _set(vm.pre_layrnorm.weight, _np32(params["norm_pre"]["scale"]))
    _set(vm.pre_layrnorm.bias, _np32(params["norm_pre"]["bias"]))
    for i, layer in enumerate(vm.encoder.layers):
        _copy_block(layer, params["layers"], i, cfg.width, siglip=True)

    x = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = np.asarray(vit_featurize(params, cfg, jnp.asarray(x)))
    import torch
    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    theirs = out.hidden_states[cfg.depth - 1].numpy()[:, 1:]  # strip cls
    # quick-GELU sigmoid differs slightly between torch and jax transcendental
    # implementations; tolerance reflects that
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_fuse_vit_inference_weights_exact():
    """LN-affine / LayerScale folding must be numerics-exact (fp32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openvla_oft_tpu.config import TINY_DINOV2, TINY_SIGLIP
    from openvla_oft_tpu.models.vit import (
        fuse_vit_inference_weights,
        init_vit_params,
        vit_featurize,
    )

    rng = np.random.default_rng(0)
    for i, cfg in enumerate((TINY_DINOV2, TINY_SIGLIP)):
        params = init_vit_params(jax.random.PRNGKey(i), cfg, dtype=jnp.float32)
        # non-trivial norm affines + LayerScale so the fold actually moves data
        L = cfg.depth
        for norm in ("norm1", "norm2"):
            params["layers"][norm]["scale"] = jnp.asarray(
                rng.uniform(0.5, 1.5, (L, cfg.width)), jnp.float32)
            params["layers"][norm]["bias"] = jnp.asarray(
                rng.normal(0, 0.1, (L, cfg.width)), jnp.float32)
        for ls in ("ls1", "ls2"):
            if ls in params["layers"]:
                params["layers"][ls]["scale_factor"] = jnp.asarray(
                    rng.uniform(0.5, 2.0, (L, cfg.width)), jnp.float32)
        imgs = jnp.asarray(rng.normal(0, 1, (2, cfg.image_size,
                                             cfg.image_size, 3)), jnp.float32)
        ref = np.asarray(vit_featurize(params, cfg, imgs))
        fused = fuse_vit_inference_weights(params)
        assert "scale" not in fused["layers"]["norm1"]
        assert "ls1" not in fused["layers"]
        got = np.asarray(vit_featurize(fused, cfg, imgs))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

        # fold_norms=False (int8 serving): LN affines stay (their fold scales
        # kernel ROWS, which would coarsen per-output-channel quant grids);
        # LayerScale still folds (output-column scaling, quantization-exact).
        part = fuse_vit_inference_weights(params, fold_norms=False)
        assert "scale" in part["layers"]["norm1"]
        assert "ls1" not in part["layers"] or "ls1" not in params["layers"]
        np.testing.assert_array_equal(
            np.asarray(part["layers"]["attn"]["qkv"]["kernel"]),
            np.asarray(params["layers"]["attn"]["qkv"]["kernel"]))
        got_part = np.asarray(vit_featurize(part, cfg, imgs))
        np.testing.assert_allclose(got_part, ref, rtol=2e-5, atol=2e-5)
