"""Open-X Embodiment dataset registry: configs, standardization transforms,
and named mixtures.

Compact TPU-build counterpart of the reference's OXE registry
(`prismatic/vla/datasets/rlds/oxe/{configs,transforms,mixtures,materialize}.py`,
~2.2k LoC of dict literals): a data-driven table of the datasets the OFT
workflows actually train on (LIBERO suites, ALOHA, Bridge, UR5e, the RT-X
core set), with the same semantics — per-dataset observation-key mapping,
state/action encodings, a standardization transform registry keyed by dataset
name, and weighted named mixtures. Entries cite the reference lines they
mirror; additional OXE datasets register through `register_dataset`.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from openvla_oft_tpu.data.transforms import (
    binarize_gripper_actions,
    invert_gripper_actions,
    rel2abs_gripper_actions,
)


class StateEncoding(enum.IntEnum):
    """Proprio layouts (reference oxe/configs.py:33-40)."""

    NONE = -1
    POS_EULER = 1       # EEF XYZ + RPY + pad + gripper
    POS_QUAT = 2        # EEF XYZ + quat + gripper
    JOINT = 3           # 7 joints + gripper
    JOINT_BIMANUAL = 4  # 2x (6 joints + gripper)


class ActionEncoding(enum.IntEnum):
    """Action layouts (reference oxe/configs.py:43-50)."""

    EEF_POS = 1
    JOINT_POS = 2
    JOINT_POS_BIMANUAL = 3
    EEF_R6 = 4


@dataclasses.dataclass(frozen=True)
class OXEDatasetConfig:
    name: str
    image_obs_keys: Dict[str, Optional[str]]
    state_obs_keys: Sequence[Optional[str]]
    state_encoding: StateEncoding
    action_encoding: ActionEncoding
    depth_obs_keys: Dict[str, Optional[str]] = dataclasses.field(
        default_factory=lambda: {"primary": None, "secondary": None, "wrist": None})


OXE_DATASET_CONFIGS: Dict[str, OXEDatasetConfig] = {}
OXE_STANDARDIZATION_TRANSFORMS: Dict[str, Callable] = {}


def register_dataset(name: str, *, primary: Optional[str] = "image",
                     secondary: Optional[str] = None,
                     wrist: Optional[str] = None,
                     state_obs_keys: Sequence[Optional[str]] = (),
                     state_encoding: StateEncoding = StateEncoding.NONE,
                     action_encoding: ActionEncoding = ActionEncoding.EEF_POS,
                     transform: Optional[Callable] = None,
                     image_obs_keys: Optional[Dict[str, Optional[str]]] = None):
    cfg = OXEDatasetConfig(
        name=name,
        image_obs_keys=image_obs_keys if image_obs_keys is not None else
        {"primary": primary, "secondary": secondary, "wrist": wrist},
        state_obs_keys=tuple(state_obs_keys),
        state_encoding=state_encoding,
        action_encoding=action_encoding)
    OXE_DATASET_CONFIGS[name] = cfg
    if transform is not None:
        OXE_STANDARDIZATION_TRANSFORMS[name] = transform
    return cfg


# === Standardization transforms (NumPy; the tf.data pipeline maps them via
#     numpy_function or applies them host-side) ===
def libero_dataset_transform(traj: Dict) -> Dict:
    """LIBERO: gripper in [-1 open .. 1 close] -> clip [0,1], invert so
    +1 = open (reference oxe/transforms.py:833-848)."""
    action = np.asarray(traj["action"])
    grip = invert_gripper_actions(np.clip(action[:, -1:], 0, 1))
    traj["action"] = np.concatenate([action[:, :6], grip], axis=1)
    state = np.asarray(traj["observation"]["state"])
    traj["observation"]["EEF_state"] = state[:, :6]
    traj["observation"]["gripper_state"] = state[:, -2:]
    return traj


def aloha_dataset_transform(traj: Dict) -> Dict:
    """ALOHA datasets are already standardized (oxe/transforms.py:850-854)."""
    return traj


def bridge_dataset_transform(traj: Dict) -> Dict:
    """Bridge: relabel gripper to absolute binary open/close (reference
    bridge transform + data_utils gripper helpers)."""
    action = np.asarray(traj["action"])
    grip = binarize_gripper_actions(action[:, -1])
    traj["action"] = np.concatenate([action[:, :6], grip[:, None]], axis=1)
    return traj


def rt1_dataset_transform(traj: Dict) -> Dict:
    """RT-1 (fractal): gripper is relative -> absolute [0, 1]."""
    action = np.asarray(traj["action"])
    grip = rel2abs_gripper_actions(action[:, -1])
    traj["action"] = np.concatenate([action[:, :6], grip[:, None]], axis=1)
    return traj


def ur5e_dataset_transform(traj: Dict) -> Dict:
    """UR5e pick-place (fork-added datasets, oxe/configs.py:55-71)."""
    return traj


# === Registry entries ===
for _suite in ("libero_spatial_no_noops", "libero_object_no_noops",
               "libero_goal_no_noops", "libero_10_no_noops",
               "libero_4_task_suites_no_noops"):
    # reference oxe/configs.py:662-697
    register_dataset(_suite, primary="image", wrist="wrist_image",
                     state_obs_keys=["EEF_state", None, "gripper_state"],
                     state_encoding=StateEncoding.POS_EULER,
                     transform=libero_dataset_transform)

for _aloha in ("aloha1_fold_shorts_20_demos", "aloha1_fold_shirt_30_demos",
               "aloha1_scoop_X_into_bowl_45_demos",
               "aloha1_put_X_into_pot_300_demos",
               "aloha_scoop_x_into_bowl"):
    # reference oxe/configs.py:698-726
    register_dataset(_aloha, primary="cam_high",
                     image_obs_keys={"primary": "cam_high",
                                     "left_wrist": "cam_left_wrist",
                                     "right_wrist": "cam_right_wrist"},
                     state_obs_keys=["state"],
                     state_encoding=StateEncoding.JOINT_BIMANUAL,
                     action_encoding=ActionEncoding.JOINT_POS_BIMANUAL,
                     transform=aloha_dataset_transform)

for _ur5e in ("ur5e_pick_place", "ur5e_pick_place_abs_pose"):
    # reference oxe/configs.py:55-71 (fork-added)
    register_dataset(_ur5e,
                     image_obs_keys={"camera_front_image": "camera_front_image",
                                     "camera_gripper_image": "camera_gripper_image"},
                     state_obs_keys=["eef_pose"],
                     state_encoding=StateEncoding.POS_EULER,
                     transform=ur5e_dataset_transform)

register_dataset("bridge_orig", primary="image_0", secondary="image_1",
                 state_obs_keys=["EEF_state", None, "gripper_state"],
                 state_encoding=StateEncoding.POS_EULER,
                 transform=bridge_dataset_transform)
register_dataset("fractal20220817_data", primary="image",
                 state_obs_keys=["base_pose_tool_reached", "gripper_closed"],
                 state_encoding=StateEncoding.POS_QUAT,
                 transform=rt1_dataset_transform)
for _name in ("kuka", "taco_play", "jaco_play", "berkeley_cable_routing",
              "roboturk", "viola", "berkeley_autolab_ur5", "toto",
              "stanford_hydra_dataset_converted_externally_to_rlds",
              "austin_buds_dataset_converted_externally_to_rlds",
              "nyu_franka_play_dataset_converted_externally_to_rlds",
              "furniture_bench_dataset_converted_externally_to_rlds",
              "ucsd_kitchen_dataset_converted_externally_to_rlds",
              "austin_sailor_dataset_converted_externally_to_rlds",
              "austin_sirius_dataset_converted_externally_to_rlds",
              "dlr_edan_shared_control_converted_externally_to_rlds",
              "iamlab_cmu_pickup_insert_converted_externally_to_rlds",
              "utaustin_mutex", "berkeley_fanuc_manipulation",
              "cmu_stretch", "bc_z", "fmb_dataset", "dobbe", "droid"):
    register_dataset(_name, primary="image",
                     state_encoding=StateEncoding.NONE)


# === Named mixtures (reference oxe/mixtures.py:11-233) ===
OXE_NAMED_MIXTURES: Dict[str, List[Tuple[str, float]]] = {
    "bridge": [("bridge_orig", 1.0)],
    "ur5e_pick_place": [("ur5e_pick_place", 1.0)],
    "bridge_rt_1": [("bridge_orig", 1.0), ("fractal20220817_data", 1.0)],
    "libero_spatial_no_noops": [("libero_spatial_no_noops", 1.0)],
    "libero_object_no_noops": [("libero_object_no_noops", 1.0)],
    "libero_goal_no_noops": [("libero_goal_no_noops", 1.0)],
    "libero_10_no_noops": [("libero_10_no_noops", 1.0)],
    "libero_4_task_suites_no_noops": [("libero_4_task_suites_no_noops", 1.0)],
    "aloha_scoop_x_into_bowl": [("aloha_scoop_x_into_bowl", 1.0)],
    "rtx": [
        ("fractal20220817_data", 0.54087122203),
        ("kuka", 0.8341046294),
        ("bridge_orig", 1.0),
        ("taco_play", 2.0),
        ("jaco_play", 2.0),
        ("berkeley_cable_routing", 3.0),
        ("roboturk", 1.0),
        ("viola", 2.0),
        ("berkeley_autolab_ur5", 1.0),
        ("toto", 1.0),
    ],
}


def make_oxe_dataset_kwargs(name: str, data_root_dir: str) -> Dict:
    """Reference `make_oxe_dataset_kwargs` (oxe/materialize.py:21-79):
    resolve a dataset name to loading kwargs incl. the absolute-action mask
    (gripper dim is absolute; arm deltas are relative for EEF_POS)."""
    cfg = OXE_DATASET_CONFIGS[name]
    if cfg.action_encoding == ActionEncoding.EEF_POS:
        absolute_action_mask = [False] * 6 + [True]
        normalization_mask = [True] * 6 + [False]
    elif cfg.action_encoding == ActionEncoding.JOINT_POS:
        absolute_action_mask = [False] * 7 + [True]
        normalization_mask = [True] * 7 + [False]
    elif cfg.action_encoding == ActionEncoding.JOINT_POS_BIMANUAL:
        absolute_action_mask = ([False] * 6 + [True]) * 2
        normalization_mask = ([True] * 6 + [False]) * 2
    else:  # EEF_R6
        absolute_action_mask = [False] * 9 + [True]
        normalization_mask = [True] * 9 + [False]
    return {
        "name": name,
        "data_dir": data_root_dir,
        "image_obs_keys": cfg.image_obs_keys,
        "state_obs_keys": list(cfg.state_obs_keys),
        "absolute_action_mask": absolute_action_mask,
        "action_normalization_mask": normalization_mask,
        "standardize_fn": OXE_STANDARDIZATION_TRANSFORMS.get(name),
    }


def get_oxe_dataset_kwargs_and_weights(data_root_dir: str, mixture_name: str):
    """Reference `get_oxe_dataset_kwargs_and_weights` (oxe/materialize.py)."""
    mixture = OXE_NAMED_MIXTURES[mixture_name]
    kwargs, weights = [], []
    for name, weight in mixture:
        kwargs.append(make_oxe_dataset_kwargs(name, data_root_dir))
        weights.append(weight)
    return kwargs, weights
