"""LIBERO evaluation utilities (reference
`experiments/robot/libero/libero_utils.py:18-100`).

The LIBERO simulator package is an optional dependency; everything that
touches it is import-gated, while observation processing / video helpers work
standalone.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Tuple

import numpy as np


def get_libero_env(task: Any, model_family: str = "openvla",
                   resolution: int = 256):
    """Build the OffScreenRenderEnv for a LIBERO task (reference :18-26)."""
    from libero.libero import get_libero_path
    from libero.libero.envs import OffScreenRenderEnv

    task_description = task.language
    task_bddl_file = os.path.join(get_libero_path("bddl_files"),
                                  task.problem_folder, task.bddl_file)
    env_args = {"bddl_file_name": task_bddl_file, "camera_heights": resolution,
                "camera_widths": resolution}
    env = OffScreenRenderEnv(**env_args)
    env.seed(0)
    return env, task_description


def get_libero_dummy_action(model_family: str = "openvla"):
    """No-op action for the settle period (reference :29-31)."""
    return [0, 0, 0, 0, 0, 0, -1]


def get_libero_image(obs: Dict[str, Any]) -> np.ndarray:
    """Third-person camera image, flipped upright (reference :34-39)."""
    img = obs["agentview_image"]
    return img[::-1, ::-1]


def get_libero_wrist_image(obs: Dict[str, Any]) -> np.ndarray:
    """Wrist camera image, flipped upright (reference :42-47)."""
    img = obs["robot0_eye_in_hand_image"]
    return img[::-1, ::-1]


def quat2axisangle(quat: np.ndarray) -> np.ndarray:
    """Quaternion (x, y, z, w) -> axis-angle (reference :63-86, from
    robosuite transform_utils)."""
    quat = np.asarray(quat, np.float64)
    if quat[3] > 1.0:
        quat[3] = 1.0
    elif quat[3] < -1.0:
        quat[3] = -1.0
    den = np.sqrt(1.0 - quat[3] * quat[3])
    if math.isclose(den, 0.0):
        return np.zeros(3)
    return (quat[:3] * 2.0 * math.acos(quat[3])) / den


def save_rollout_video(rollout_images, idx, success, task_description,
                       log_file=None, rollout_dir: str = "./rollouts"):
    """Write an MP4 of one episode (reference :47-60); falls back to
    per-frame PNGs if imageio is unavailable."""
    os.makedirs(rollout_dir, exist_ok=True)
    tag = "success" if success else "failure"
    safe_task = "".join(c if c.isalnum() else "_" for c in task_description[:40])
    path = os.path.join(rollout_dir, f"episode={idx}--{tag}--{safe_task}.mp4")
    try:
        import imageio

        try:
            writer = imageio.get_writer(path, fps=30)
        except Exception:
            # no ffmpeg backend on this host — pure-python GIF fallback
            path = path[:-4] + ".gif"
            writer = imageio.get_writer(path, duration=33)
        with writer:
            for img in rollout_images:
                writer.append_data(img)
    except ImportError:
        from PIL import Image

        path = path.replace(".mp4", "")
        os.makedirs(path, exist_ok=True)
        for i, img in enumerate(rollout_images[:: max(len(rollout_images) // 20, 1)]):
            Image.fromarray(img).save(os.path.join(path, f"{i:04d}.png"))
    if log_file is not None:
        log_file.write(f"Saved rollout video at path {path}\n")
    return path
