"""Processing parity: JAX device preprocessing vs the TF ops the reference
uses, tokenizer contract, action tokenizer round trip."""

import numpy as np
import pytest

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.processing.action_tokenizer import ActionTokenizer
from openvla_oft_tpu.processing.image_processing import (
    center_crop_resize,
    resize_lanczos3,
)
from openvla_oft_tpu.processing.processor import (
    PrismaticProcessor,
    build_prompt,
    from_channel_stacked,
    to_channel_stacked,
)

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)


def test_lanczos_resize_matches_tf(rng):
    tf = pytest.importorskip("tensorflow")
    img = (rng.random((100, 130, 3)) * 255).astype(np.uint8)
    ours = np.asarray(resize_lanczos3(img, 64)).astype(np.int32)
    theirs = tf.cast(tf.clip_by_value(tf.round(tf.image.resize(
        tf.constant(img, tf.float32), (64, 64), method="lanczos3",
        antialias=True)), 0, 255), tf.uint8).numpy().astype(np.int32)
    # uint8 rounding at boundaries: allow off-by-one on a small fraction
    diff = np.abs(ours - theirs)
    assert (diff <= 1).mean() > 0.999 and diff.max() <= 2, \
        (diff.max(), (diff > 1).mean())


def test_center_crop_matches_tf_crop_and_resize(rng):
    tf = pytest.importorskip("tensorflow")
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    ours = np.asarray(center_crop_resize(img, 0.9)).astype(np.int32)

    crop_scale = 0.9
    batch = tf.constant(img, tf.float32)[None]
    new_side = np.sqrt(crop_scale)
    y1 = (1 - new_side) / 2
    boxes = [[y1, y1, y1 + new_side, y1 + new_side]]
    theirs = tf.image.crop_and_resize(batch, boxes, [0], (64, 64))
    theirs = tf.cast(tf.clip_by_value(tf.round(theirs[0]), 0, 255),
                     tf.int32).numpy()
    diff = np.abs(ours - theirs)
    assert (diff <= 1).mean() > 0.999 and diff.max() <= 2, \
        (diff.max(), (diff > 1).mean())


def test_processor_contract(rng):
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama", num_images_in_input=2)
    proc = PrismaticProcessor(cfg)
    h = 77
    imgs = [(rng.random((h, h, 3)) * 255).astype(np.uint8) for _ in range(2)]
    out = proc(build_prompt("Pick up the cup"), imgs)
    side = TINY_DINOV2.image_size
    assert out["pixel_values"].shape == (1, 2, 2, side, side, 3)
    assert out["input_ids"][0, 0] == 1  # BOS
    assert out["input_ids"][0, -1] == 29871  # trailing space token
    assert out["attention_mask"].all()
    # dino channels normalized with imagenet stats != siglip channels
    assert not np.allclose(out["pixel_values"][0, 0, 0],
                           out["pixel_values"][0, 0, 1])
    # channel-stacked interop round trip
    stacked = to_channel_stacked(out["pixel_values"])
    assert stacked.shape == (1, 12, side, side)
    back = from_channel_stacked(stacked, num_images=2)
    np.testing.assert_array_equal(back, out["pixel_values"])


def test_action_tokenizer_roundtrip(rng):
    at = ActionTokenizer()
    actions = rng.uniform(-1, 1, (8, 7))
    ids = at(actions)
    assert ids.min() > at.action_token_begin_idx
    assert ids.max() < 32000
    decoded = at.decode_token_ids_to_actions(ids)
    # quantization error bounded by bin half-width
    assert np.abs(decoded - actions).max() <= (2 / 255) / 2 + 1e-9
    # out-of-range clipping
    ids2 = at(np.asarray([-5.0, 5.0]))
    d2 = at.decode_token_ids_to_actions(ids2)
    assert d2[0] == at.bin_centers[0] and d2[1] == at.bin_centers[-1]


def test_device_transform_384px_and_clip_configs(rng):
    """New backbone configs flow through the device transform with correct
    shapes, incl. the floored 27x27 SigLIP-384 patch grid."""
    from openvla_oft_tpu.config import (
        CLIP_VIT_L_224,
        OpenVLAConfig,
        SIGLIP_SO400M_384,
    )
    from openvla_oft_tpu.models.vit import patchify
    import jax.numpy as jnp

    cfg384 = OpenVLAConfig(vision_backbone_id="dinosiglip-vit-so-384px")
    assert cfg384.vision_configs[1].num_patches == 27 * 27
    assert cfg384.num_patches_per_image == 27 * 27  # dino-384 also 27x27
    from openvla_oft_tpu.processing.image_processing import make_device_transform

    t = make_device_transform(cfg384)
    img = (rng.random((1, 100, 100, 3)) * 255).astype(np.uint8)
    out = np.asarray(t(img))
    assert out.shape == (1, 2, 384, 384, 3)

    # patchify floors the grid on non-divisible sizes
    x = jnp.zeros((1, 384, 384, 3))
    p = patchify(x, 14)
    assert p.shape == (1, 27 * 27, 14 * 14 * 3)

    cfg_clip = OpenVLAConfig(vision_backbone_id="clip-vit-l")
    assert cfg_clip.vision_configs[0] is CLIP_VIT_L_224
    assert not cfg_clip.use_fused_vision_backbone
    t2 = make_device_transform(cfg_clip)
    out2 = np.asarray(t2(img))
    assert out2.shape == (1, 1, 224, 224, 3)
