"""ALOHA evaluation utilities (reference `experiments/robot/aloha/aloha_utils.py`).

Image extraction from the ALOHA observation dict and rollout-video helpers;
the real-robot env (ROS + interbotix) is imported only inside `make_real_env`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np


def get_aloha_image(obs: Any) -> np.ndarray:
    """High (third-person) camera frame."""
    return np.asarray(obs.observation["images"]["cam_high"])


def get_aloha_wrist_images(obs: Any) -> Tuple[np.ndarray, np.ndarray]:
    """Left + right wrist camera frames."""
    images = obs.observation["images"]
    return (np.asarray(images["cam_left_wrist"]),
            np.asarray(images["cam_right_wrist"]))


def resize_image_for_policy(img: np.ndarray, resize_size: int) -> np.ndarray:
    """JPEG round trip + lanczos3 resize — the training-matched conditioning
    (shared with openvla_utils; reference openvla_utils.py:516-539)."""
    from openvla_oft_tpu.processing.image_processing import (
        jpeg_roundtrip,
        resize_lanczos3,
    )
    import jax.numpy as jnp

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    return np.asarray(resize_lanczos3(jnp.asarray(jpeg_roundtrip(img)),
                                      resize_size))


def make_real_env(*args, **kwargs):
    """Construct the real ALOHA env (ROS + interbotix). Import-gated: the
    original ALOHA repo's `real_env.make_real_env` must be on sys.path
    (reference experiments/robot/aloha/real_env.py:18-165)."""
    try:
        from aloha.real_env import make_real_env as _make  # type: ignore
    except ImportError as e:
        raise ImportError(
            "The ALOHA real-robot environment requires the original ALOHA "
            "repo (ROS + interbotix) on sys.path; see ALOHA.md in the "
            "reference for setup.") from e
    return _make(*args, **kwargs)


def save_rollout_video(images, idx: int, success: bool, task_description: str,
                       suffix: str = "", rollout_dir: str = "./rollouts"):
    """MP4 writer mirroring the reference's aloha_utils helper."""
    os.makedirs(rollout_dir, exist_ok=True)
    tag = "success" if success else "failure"
    safe = "".join(c if c.isalnum() else "_" for c in task_description[:40])
    path = os.path.join(rollout_dir,
                        f"episode={idx}--{tag}--{safe}{suffix}.mp4")
    try:
        import imageio

        try:
            w = imageio.get_writer(path, fps=25)
        except Exception:
            # no ffmpeg backend — pure-python GIF fallback
            path = path[:-4] + ".gif"
            w = imageio.get_writer(path, duration=40)
        with w:
            for img in images:
                w.append_data(np.asarray(img))
    except ImportError:
        path = None
    return path
