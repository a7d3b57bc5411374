"""Image preprocessing: device-fused JAX path + host TF/PIL parity path.

The reference splits preprocessing across two stages:
  1. Eval-side conditioning (`experiments/robot/openvla_utils.py:516-622`):
     JPEG re-encode -> lanczos3 resize to 224 -> optional 0.9-area center crop
     via `tf.image.crop_and_resize` (matches RLDS training augmentation).
  2. Processor transform (`prismatic/extern/hf/processing_prismatic.py:128-148`):
     per-backbone Resize(bicubic, antialias) -> CenterCrop -> scale to [0,1] ->
     Normalize(mean/std) -> channel-stack [primary(3), fused(3)].

TPU-native default: everything after JPEG runs on device as one jitted
function (uint8 in, normalized stacked pixels out) — `jax.image.resize`
supports lanczos3/bicubic with antialiasing. The JPEG round trip (a
training-data artifact the repo warns matters, LIBERO.md:121) stays on host:
`jpeg_roundtrip` uses PIL when bit-parity with eval is wanted.
"""

from __future__ import annotations

import functools
import io
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openvla_oft_tpu.config import OpenVLAConfig, ViTConfig


def jpeg_roundtrip(image: np.ndarray, quality: int = 95) -> np.ndarray:
    """Host-side JPEG encode/decode (openvla_utils.py:516-539 artifact).

    Uses TF's libjpeg wrapper when available — the reference artifact comes
    from tf.image.encode_jpeg/tf.io.decode_image, and PIL's encoder differs
    in DCT/subsampling rounding (±1 pixel shifts that defeat the bit-parity
    purpose of the round trip). PIL is the fallback when TF is absent."""
    try:
        import tensorflow as tf

        enc = tf.io.encode_jpeg(tf.constant(image), quality=quality)
        return tf.io.decode_image(enc, expand_animations=False,
                                  dtype=tf.uint8).numpy()
    except ImportError:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(image).save(buf, format="JPEG", quality=quality)
        buf.seek(0)
        return np.asarray(Image.open(buf).convert("RGB"))


@functools.partial(jax.jit, static_argnames=("size",))
def resize_lanczos3(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """uint8 (H, W, 3) -> uint8 (size, size, 3), lanczos3 with antialiasing
    (parity target: tf.image.resize(..., method="lanczos3", antialias=True),
    the dlimp/eval resize at openvla_utils.py:516-539)."""
    x = jax.image.resize(image.astype(jnp.float32), (size, size, 3),
                         method="lanczos3", antialias=True)
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("crop_scale", "batched"))
def center_crop_resize(image: jnp.ndarray, crop_scale: float = 0.9,
                       batched: bool = False) -> jnp.ndarray:
    """Take the centered crop_scale-area crop and resize back to input size
    (reference `center_crop_image`, openvla_utils.py:542-622, which uses
    tf.image.crop_and_resize == bilinear sampling of the box)."""
    if not batched:
        image = image[None]
    b, h, w, c = image.shape
    sqrt_s = float(np.sqrt(crop_scale))
    # tf.crop_and_resize with normalized box [y1, x1, y2, x2] of side sqrt_s
    # centered: y1 = (1 - sqrt_s) / 2. Sample grid of h points over the box.
    y1 = (1.0 - sqrt_s) / 2.0
    # crop_and_resize samples at y1*(H-1) .. y2*(H-1) inclusive, h points.
    ys = jnp.linspace(y1 * (h - 1), (y1 + sqrt_s) * (h - 1), h)
    xs = jnp.linspace(y1 * (w - 1), (y1 + sqrt_s) * (w - 1), w)
    xf = image.astype(jnp.float32)

    def sample_axis(arr, coords, axis):
        i0 = jnp.floor(coords).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, arr.shape[axis] - 1)
        w1 = (coords - i0.astype(jnp.float32))
        a0 = jnp.take(arr, i0, axis=axis)
        a1 = jnp.take(arr, i1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = len(coords)
        w1 = w1.reshape(shape)
        return a0 * (1 - w1) + a1 * w1

    out = sample_axis(sample_axis(xf, ys, 1), xs, 2)
    # uint8 conversion matches the reference exactly: it goes through
    # tf.image.convert_image_dtype(..., saturate=True), which computes
    # floor(v * 255.5) on the [0,1] float image — NOT round(). In 0..255
    # space that is floor(out + out/510); round() differs by 1 LSB on ~1/3
    # of interpolated pixels (measured against TF).
    out = jnp.clip(jnp.floor(out + out / 510.0), 0, 255).astype(jnp.uint8)
    return out if batched else out[0]


def make_device_transform(cfg: OpenVLAConfig):
    """Jitted: uint8 (N, H, W, 3) -> (N, n_backbones, 224, 224, 3) normalized.

    Implements the processor transform fused on device, keyed off
    `cfg.image_resize_strategy` (reference `processing_prismatic.py:115-123`):
      - "resize-naive":  squash-resize to (S, S), bicubic+antialias
      - "resize-crop":   resize shorter side to S (aspect kept) -> CenterCrop S
      - "letterbox":     pad to square (fill = last backbone's mean * 255,
                         the reference per-idx loop overwrites the fill so the
                         last backbone wins, processing_prismatic.py:113-119)
                         -> resize shorter side to S -> CenterCrop S
    then [0,1] -> per-backbone mean/std normalize. Channel-group order is
    [primary, fused] matching `processing_prismatic.py:128-145`. Unknown
    strategies raise (the reference raises too, `:122-123`).
    """
    vcfgs: Sequence[ViTConfig] = cfg.vision_configs
    size = vcfgs[0].image_size
    strategy = getattr(cfg, "image_resize_strategy", "resize-naive")
    if strategy not in ("resize-naive", "resize-crop", "letterbox"):
        raise ValueError(
            f"image_resize_strategy {strategy!r} is not supported! expected "
            "'resize-naive', 'resize-crop', or 'letterbox' "
            "(reference processing_prismatic.py:116-123)")
    fill = jnp.asarray([int(m * 255) for m in vcfgs[-1].mean],
                       jnp.float32) / 255.0

    @jax.jit
    def transform(images_u8: jnp.ndarray) -> jnp.ndarray:
        n, h, w = images_u8.shape[:3]
        x = images_u8.astype(jnp.float32) / 255.0
        if strategy == "letterbox" and h != w:
            # Symmetric constant-border pad to (near-)square: torchvision
            # TVF.pad with int((max-d)/2) per side — an odd difference leaves
            # the long side 1px longer, exactly as the reference does.
            hp, vp = (max(h, w) - w) // 2, (max(h, w) - h) // 2
            canvas = jnp.broadcast_to(fill, (n, h + 2 * vp, w + 2 * hp, 3))
            x = jax.lax.dynamic_update_slice(canvas, x, (0, vp, hp, 0))
            h, w = h + 2 * vp, w + 2 * hp
        if h != size or w != size:
            if strategy == "resize-naive":
                nh = nw = size
            else:
                # torchvision Resize(int): shorter side -> S, long side
                # truncated proportionally (_compute_resized_output_size).
                nh, nw = ((size, int(size * w / h)) if h <= w else
                          (int(size * h / w), size))
            x = jax.image.resize(x, (n, nh, nw, 3), method="bicubic",
                                 antialias=True)
            x = jnp.clip(x, 0.0, 1.0)
            if (nh, nw) != (size, size):
                # torchvision center_crop: top = round((H - S) / 2)
                top = int(round((nh - size) / 2.0))
                left = int(round((nw - size) / 2.0))
                x = x[:, top:top + size, left:left + size, :]
        return normalize_and_stack(cfg, x)  # (N, n_backbones, H, W, 3)

    return transform


def normalize_and_stack(cfg: OpenVLAConfig, x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float (M, S, S, 3) -> (M, n_backbones, S, S, 3) per-backbone
    normalized, channel-group order [primary, fused]
    (processing_prismatic.py:128-145). Pure jnp — usable inside a larger jit."""
    outs = []
    for v in cfg.vision_configs:
        mean = jnp.asarray(v.mean, jnp.float32)
        std = jnp.asarray(v.std, jnp.float32)
        outs.append((x01 - mean) / std)
    return jnp.stack(outs, axis=1)


def device_preprocess(cfg: OpenVLAConfig, images_u8: jnp.ndarray,
                      resize_size: int = 224,
                      center_crop: bool = True) -> jnp.ndarray:
    """Fused eval-side preprocessing, batched, jit-inlinable: uint8 camera
    frames (M, H, W, 3) -> (M, n_backbones, S, S, 3) normalized pixels.

    Device analog of `prepare_images_for_vla` minus the host JPEG round trip
    (openvla_utils.py:678-708): lanczos3 resize -> optional 0.9-area center
    crop -> [0,1] -> per-backbone normalize -> backbone stack. The
    intermediate uint8 quantizations of the staged host path (round after
    resize, floor(v*255.5) after crop) are kept for bit-parity with
    `resize_lanczos3` + `center_crop_resize`.
    """
    m = images_u8.shape[0]
    x = jax.image.resize(images_u8.astype(jnp.float32),
                         (m, resize_size, resize_size, 3),
                         method="lanczos3", antialias=True)
    x = jnp.clip(jnp.round(x), 0, 255)
    if center_crop:
        x = center_crop_resize(x.astype(jnp.uint8), 0.9, batched=True)
    x01 = x.astype(jnp.float32) / 255.0
    return normalize_and_stack(cfg, x01)


def prepare_images_for_policy(
    images: Sequence[np.ndarray],
    cfg: OpenVLAConfig,
    center_crop: bool = True,
    use_jpeg_roundtrip: bool = True,
    resize_size: int = 224,
) -> np.ndarray:
    """Full eval-side pipeline (reference `prepare_images_for_vla`,
    openvla_utils.py:678-708): per image, JPEG round trip -> lanczos3 resize ->
    optional 0.9 center crop -> processor transform. Returns
    (N, n_backbones, 224, 224, 3) float32 normalized pixels."""
    conditioned = []
    for img in images:
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        if use_jpeg_roundtrip:
            img = jpeg_roundtrip(img)
        img = np.asarray(resize_lanczos3(jnp.asarray(img), resize_size))
        if center_crop:
            img = np.asarray(center_crop_resize(jnp.asarray(img), 0.9))
        conditioned.append(img)
    stack = jnp.asarray(np.stack(conditioned))
    return np.asarray(make_device_transform(cfg)(stack))
