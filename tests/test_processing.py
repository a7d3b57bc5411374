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
    """EXACT parity with the reference center_crop_image pipeline
    (openvla_utils.py:592-622): convert_image_dtype to [0,1] ->
    crop_and_resize(0.9) -> clip -> convert_image_dtype(saturate=True),
    whose uint8 conversion is floor(v*255.5), not round()."""
    tf = pytest.importorskip("tensorflow")
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    ours = np.asarray(center_crop_resize(img, 0.9)).astype(np.int32)

    crop_scale = 0.9
    image = tf.image.convert_image_dtype(tf.constant(img), tf.float32)
    new_side = np.sqrt(crop_scale)
    y1 = (1 - new_side) / 2
    boxes = [[y1, y1, y1 + new_side, y1 + new_side]]
    out = tf.image.crop_and_resize(image[None], boxes, [0], (64, 64))[0]
    out = tf.clip_by_value(out, 0, 1)
    theirs = tf.image.convert_image_dtype(out, tf.uint8,
                                          saturate=True).numpy().astype(np.int32)
    # bit-exact up to fp32 evaluation order: our separable two-pass bilinear
    # vs TF's fused kernel can land a value ON the floor boundary — allow
    # <0.1% lone off-by-ones, nothing larger (round() vs floor(v*255.5)
    # differed on ~30% of pixels, which this threshold catches)
    diff = np.abs(ours - theirs)
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, \
        (diff.max(), (diff > 0).mean())


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


def test_letterbox_strategy_pads_to_square(rng):
    """letterbox: symmetric pad with fill = last backbone's mean*255 before
    the resize (reference processing_prismatic.py:23-29,113-119)."""
    from openvla_oft_tpu.processing.image_processing import make_device_transform

    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama",
                        image_resize_strategy="letterbox")
    size = cfg.vision_configs[0].image_size
    color = np.array([200, 40, 90], np.uint8)
    img = np.broadcast_to(color, (1, 40, 80, 3)).copy()
    out = np.asarray(make_device_transform(cfg)(img))
    assert out.shape == (1, 2, size, size, 3)
    fill01 = np.array([int(m * 255) for m in cfg.vision_configs[-1].mean],
                      np.float32) / 255.0
    for bi, v in enumerate(cfg.vision_configs):
        mean = np.asarray(v.mean, np.float32)
        std = np.asarray(v.std, np.float32)
        # top band (padded region, away from the blend edge) == fill
        np.testing.assert_allclose(out[0, bi, 1, size // 2],
                                   (fill01 - mean) / std, atol=1e-2)
        # center == image color
        np.testing.assert_allclose(out[0, bi, size // 2, size // 2],
                                   (color / 255.0 - mean) / std, atol=1e-2)
    # image occupies the middle half of the height (40/80 aspect)
    band = int(size * (40 / 80) / 2)  # half-height of the image band
    assert np.allclose(out[0, 0, size // 2 - band + 2, size // 2],
                       (color / 255.0 - np.asarray(cfg.vision_configs[0].mean))
                       / np.asarray(cfg.vision_configs[0].std), atol=2e-2)


def test_resize_crop_strategy_keeps_center(rng):
    """resize-crop: shorter side -> S, then center crop S — output must come
    from the center square only (processing_prismatic.py:120-121)."""
    from openvla_oft_tpu.processing.image_processing import make_device_transform

    cfg_rc = OpenVLAConfig(vision_backbone_id="tiny-dual",
                           llm_backbone_id="tiny-llama",
                           image_resize_strategy="resize-crop")
    cfg_naive = OpenVLAConfig(vision_backbone_id="tiny-dual",
                              llm_backbone_id="tiny-llama",
                              image_resize_strategy="resize-naive")
    size = cfg_rc.vision_configs[0].image_size
    # center 100x100 square white, the rest black (in a 100x200 image)
    img = np.zeros((1, 100, 200, 3), np.uint8)
    img[:, :, 50:150] = 255
    out_rc = np.asarray(make_device_transform(cfg_rc)(img))
    out_naive = np.asarray(make_device_transform(cfg_naive)(img))
    v = cfg_rc.vision_configs[0]
    white = (1.0 - np.asarray(v.mean)) / np.asarray(v.std)
    # resize-crop keeps only the white center square
    frac_white = np.isclose(out_rc[0, 0], white, atol=1e-2).all(-1).mean()
    # (blend at the crop border eats a ~1px frame at tiny test sizes)
    assert frac_white > 0.9, frac_white
    # resize-naive squashes the full (half-black) width in
    frac_white_naive = np.isclose(out_naive[0, 0], white,
                                  atol=1e-2).all(-1).mean()
    assert frac_white_naive < 0.6, frac_white_naive


def test_unknown_resize_strategy_raises():
    from openvla_oft_tpu.processing.image_processing import make_device_transform

    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama",
                        image_resize_strategy="bogus")
    with pytest.raises(ValueError, match="bogus"):
        make_device_transform(cfg)


def test_resize_crop_matches_pil_torchvision_semantics(rng):
    """Numeric parity of resize-crop vs PIL (what torchvision uses on PIL
    inputs): shorter-side resize with truncated long side + round-half-up
    center crop."""
    from PIL import Image

    from openvla_oft_tpu.processing.image_processing import make_device_transform

    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama",
                        image_resize_strategy="resize-crop")
    size = cfg.vision_configs[0].image_size
    # smooth image so kernel differences between PIL and jax bicubic stay tiny
    base = (rng.random((10, 13, 3)) * 255).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((130, 100), Image.BICUBIC))
    h, w = 100, 130
    nh, nw = size, int(size * w / h)
    ref = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC),
                     np.float32) / 255.0
    top = int(round((nh - size) / 2.0))
    left = int(round((nw - size) / 2.0))
    ref = ref[top:top + size, left:left + size]
    v = cfg.vision_configs[0]
    ref = (ref - np.asarray(v.mean)) / np.asarray(v.std)
    out = np.asarray(make_device_transform(cfg)(img[None]))[0, 0]
    assert np.abs(out - ref).mean() < 0.05, np.abs(out - ref).mean()


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
