"""Generic robot-eval utilities — reference `experiments/robot/robot_utils.py`
(get_model :54, get_action :99, gripper conventions :149-199, seeding :38).
"""

from __future__ import annotations

import random
import sys
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from experiments.robot.openvla_utils import get_vla, get_vla_action

DATE_FORMAT = "%Y_%m_%d"
OPENVLA_IMAGE_SIZE = 224


def set_seed_everywhere(seed: int) -> None:
    """Reference robot_utils.py:38-51 (minus torch CUDA)."""
    np.random.seed(seed)
    random.seed(seed)


def get_model(cfg: Any, wrap_diffusion_policy_for_droid: bool = False):
    """Dispatch by model_family (reference robot_utils.py:54-74)."""
    if cfg.model_family == "openvla":
        return get_vla(cfg)
    raise ValueError(f"Unsupported model family: {cfg.model_family}")


def get_image_resize_size(cfg: Any) -> int:
    """Reference robot_utils.py:77-96."""
    if cfg.model_family == "openvla":
        return OPENVLA_IMAGE_SIZE
    raise ValueError(f"Unsupported model family: {cfg.model_family}")


def get_action(
    cfg: Any,
    model,
    obs: Dict[str, Any],
    task_label: str,
    processor: Optional[Any] = None,
    action_head=None,
    proprio_projector=None,
    noisy_action_projector=None,
    use_film: bool = False,
) -> Union[List[np.ndarray], np.ndarray]:
    """Reference robot_utils.py:99-147."""
    if cfg.model_family == "openvla":
        return get_vla_action(
            cfg=cfg, vla=model, processor=processor, obs=obs,
            task_label=task_label, action_head=action_head,
            proprio_projector=proprio_projector,
            noisy_action_projector=noisy_action_projector, use_film=use_film)
    raise ValueError(f"Unsupported model family: {cfg.model_family}")


def normalize_gripper_action(action: np.ndarray, binarize: bool = True) -> np.ndarray:
    """[0,1] -> [-1,+1] on the last dim (reference robot_utils.py:149-177)."""
    normalized = action.copy()
    normalized[..., -1] = 2 * (normalized[..., -1] - 0.0) / (1.0 - 0.0) - 1
    if binarize:
        normalized[..., -1] = np.sign(normalized[..., -1])
    return normalized


def invert_gripper_action(action: np.ndarray) -> np.ndarray:
    """Flip the gripper sign (reference robot_utils.py:180-199)."""
    inverted = action.copy()
    inverted[..., -1] *= -1.0
    return inverted
