"""UR5e robosuite evaluation utilities (fork-added reference
`experiments/robot/robosuite/robosuite_utils.py:99-286`).

Success predicates (reach / pick / place-in-bin / on-peg) are pure geometry
and implemented standalone; env construction needs robosuite + mujoco and the
fork's multi-task env package, and is import-gated.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def check_reach(threshold: float, obj_distance: np.ndarray,
                current_reach: bool) -> bool:
    """Reached when within `threshold` of the object (reference :168-172)."""
    return bool(current_reach or np.linalg.norm(obj_distance) < threshold)


def check_pick(threshold: float, obj_z: float, start_z: float, reached: bool,
               picked: bool) -> bool:
    """Picked when the object rose `threshold` above its start height after a
    reach (reference :163-166)."""
    return bool(picked or (reached and obj_z - start_z > threshold))


def check_bin(threshold: float, bin_pos: np.ndarray, obj_pos: np.ndarray,
              current_bin: bool) -> bool:
    """Placed when the object is inside the 16 cm bin footprint and within
    10 cm above the bin floor (reference :175-192)."""
    half = 0.16 / 2
    in_x = bin_pos[0] - half < obj_pos[0] < bin_pos[0] + half
    in_y = bin_pos[1] - half < obj_pos[1] < bin_pos[1] + half
    in_z = bin_pos[2] < obj_pos[2] < bin_pos[2] + 0.1
    return bool(current_bin or (in_x and in_y and in_z))


def check_peg(peg_pos: np.ndarray, obj_pos: np.ndarray,
              current_peg: bool) -> bool:
    """On-peg within 3 cm laterally and below the peg top (reference :195-207)."""
    res = (abs(obj_pos[0] - peg_pos[0]) < 0.03
           and abs(obj_pos[1] - peg_pos[1]) < 0.03
           and obj_pos[2] < 0.860 + 0.05)
    return bool(res or current_peg)


def prepare_observation(obs: Dict, resize_size: int = 224,
                        gripper_closed: float = 0.0) -> Dict:
    """Front + (horizontally flipped) eye-in-hand cameras + eef pose proprio
    (reference :209-286)."""
    from experiments.robot.aloha.aloha_utils import resize_image_for_policy

    img = np.asarray(obs["camera_front_image"])
    wrist = np.asarray(obs["eye_in_hand_image"])[:, ::-1]  # horizontal flip
    state = np.concatenate([np.asarray(obs["eef_pos"]),
                            np.asarray(obs["eef_quat"])[:2],
                            [gripper_closed]]) if "eef_pos" in obs else \
        np.asarray(obs.get("state", np.zeros(6)))
    return {
        "full_image": resize_image_for_policy(img, resize_size),
        "wrist_image": resize_image_for_policy(wrist, resize_size),
        "state": state,
    }


def build_env_context(env_name: str, controller_path: str, variation: int,
                      seed: int, gpu_id: int = -1):
    """Construct the UR5e pick-place env (reference :99-120). Requires
    robosuite + the fork's `multi_task_robosuite_env` package."""
    try:
        import robosuite  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "robosuite evaluation requires the robosuite + mujoco packages "
            "and the reference fork's multi_task_robosuite_env assets.") from e
    raise NotImplementedError(
        "Env assembly delegates to the fork's multi_task_robosuite_env "
        "package; install it and wire TASK_MAP here.")
