"""Fused dual vision backbone (DINOv2 primary + SigLIP fused).

Reference contract (`prismatic/extern/hf/modeling_prismatic.py:186-227`):
pixel inputs are *channel-stacked* — each image contributes 6 channels
(3 DINOv2-normalized + 3 SigLIP-normalized); with N images the input is
(B, 6N, H, W) torch-style. We carry pixels as (B, N, 2, H, W, 3) instead
(explicit image and backbone axes, NHWC for TPU) and provide converters.

Per image: features = concat([dino(img0), siglip(img1)], axis=-1) -> 2176-dim;
images concatenate along the patch axis. Both ViTs over all N images run as a
single batched call per backbone (batch = B*N) — one big MXU-friendly batch
instead of the reference's per-image Python loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from openvla_oft_tpu.config import OpenVLAConfig
from openvla_oft_tpu.models.vit import init_film_params, init_vit_params, vit_featurize

Params = Dict[str, Any]


def init_vision_backbone(key, cfg: OpenVLAConfig, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, len(cfg.vision_configs))
    names = _featurizer_names(cfg)
    return {name: init_vit_params(k, vcfg, dtype)
            for name, vcfg, k in zip(names, cfg.vision_configs, ks)}


def init_film(key, cfg: OpenVLAConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, len(cfg.vision_configs))
    names = _featurizer_names(cfg)
    return {name: init_film_params(k, vcfg, cfg.llm_dim, dtype)
            for name, vcfg, k in zip(names, cfg.vision_configs, ks)}


def _featurizer_names(cfg: OpenVLAConfig) -> Tuple[str, ...]:
    return ("featurizer", "fused_featurizer")[: len(cfg.vision_configs)]


def channel_stacked_to_nhwc(pixel_values: jnp.ndarray, num_images: int) -> jnp.ndarray:
    """(B, 6N, H, W) reference layout -> (B, N, 2, H, W, 3).

    Channel order within an image is [primary(3), fused(3)]
    (processing_prismatic.py:128-148).
    """
    b, c, h, w = pixel_values.shape
    n_back = c // (3 * num_images)
    x = pixel_values.reshape(b, num_images, n_back, 3, h, w)
    return x.transpose(0, 1, 2, 4, 5, 3)


def vision_backbone_forward(
    params: Params,
    cfg: OpenVLAConfig,
    pixels: jnp.ndarray,
    film_params: Optional[Params] = None,
    language_embedding: Optional[jnp.ndarray] = None,
    unroll: Any = 1,
    remat: bool = False,
    remat_policy: Optional[str] = None,
) -> jnp.ndarray:
    """pixels: (B, N, n_backbones, H, W, 3) normalized -> (B, N*256, vision_dim).

    unroll: `lax.scan` unroll over blocks; "full" = fully unrolled. Measured on
    v5e (vla_scripts/exp_vit_ablation.py): the scanned stacked-layer form costs
    ~55% extra latency at serving shapes (dino 4.9 -> 3.3 ms, siglip 5.3 ->
    3.3 ms fully unrolled — partial unroll is WORSE than either). Inference
    paths pass "full"; training keeps the scan (compile time, remat shape).
    """
    b, n, nb, h, w, _ = pixels.shape
    names = _featurizer_names(cfg)
    assert nb == len(names), f"expected {len(names)} backbone channel groups, got {nb}"

    vision_configs = cfg.vision_configs
    if cfg.fast_gelu:
        # Swap exact erf-GELU MLPs (DINOv2) for the sub-bf16-ulp logistic
        # form (ops/layers.py::gelu_erf_fast); tanh/quick variants are
        # already exp-based and stay as-is.
        import dataclasses

        vision_configs = tuple(
            dataclasses.replace(v, act="gelu_erf_fast") if v.act == "gelu"
            else v for v in vision_configs)

    if "joint" in params:
        # Serving layout: both backbones as ONE G=2 batched-GEMM program
        # (models/vit_joint.py) — built at load by `build_joint_vit_pair`
        # from the folded per-backbone weights. The per-backbone fallback
        # below cannot run on a joint tree (no 'featurizer' key), so an
        # unsupported combination is an error, not a silent fallthrough.
        if film_params is not None:
            raise ValueError(
                "joint ViT-pair layout does not support FiLM (per-block "
                "modulation breaks its zero-padding invariants); load with "
                "the per-backbone layout for use_film configs")
        if len(names) != 2:
            raise ValueError("joint ViT layout requires a dual-backbone config")
        from openvla_oft_tpu.models.vit_joint import vit_pair_featurize_joint

        imgs = [pixels[:, :, i].reshape(b * n, h, w, 3)
                for i in range(len(names))]
        outs = vit_pair_featurize_joint(params["joint"], vision_configs,
                                        imgs)
        return jnp.concatenate(
            [f.reshape(b, n * vcfg.num_patches, vcfg.width)
             for f, vcfg in zip(outs, vision_configs)], axis=-1)

    feats = []
    for i, (name, vcfg) in enumerate(zip(names, vision_configs)):
        imgs = pixels[:, :, i].reshape(b * n, h, w, 3)
        le = None
        fp = None
        if film_params is not None and language_embedding is not None:
            fp = film_params[name]
            le = jnp.repeat(language_embedding, n, axis=0)  # (B*N, llm_dim)
        u = vcfg.depth - 1 if unroll == "full" else unroll
        f = vit_featurize(params[name], vcfg, imgs, film_params=fp,
                          language_embedding=le, unroll=u, remat=remat,
                          remat_policy=remat_policy)  # (B*N, 256, width)
        feats.append(f.reshape(b, n * vcfg.num_patches, vcfg.width))
    # Concat [primary, fused] on the feature dim per image-patch position.
    if len(feats) == 1:
        return feats[0]
    # feats[i] is (B, N*256, width_i) with patches of image j contiguous; the
    # per-image patch counts agree, so feature-dim concat aligns patchwise.
    return jnp.concatenate(feats, axis=-1)
