"""Regenerate a LIBERO HDF5 dataset by replaying demonstrations
(reference `experiments/robot/libero/regenerate_libero_dataset.py`).

Produces the `*_no_noops` datasets the released OFT checkpoints were trained
on: replays each raw demo in the simulator at 256×256px, drops "no-op"
transitions (near-zero pose delta with unchanged gripper command), keeps only
successful replays, and records per-episode success/initial-state metainfo.
The downstream HDF5→RLDS conversion rotates images 180° (reference note:
LIBERO environments render upside-down on the recording platform).

The simulator stack (LIBERO benchmark + robosuite) is an external dependency
exactly as in the reference; imports are gated. `is_noop` and
`replay_episode`'s bookkeeping are pure and unit-tested sim-free
(tests/test_eval_api.py).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np

IMAGE_RESOLUTION = 256


def is_noop(action: np.ndarray, prev_action: Optional[np.ndarray] = None,
            threshold: float = 1e-4) -> bool:
    """A no-op action has (1) near-zero non-gripper dims and (2) a gripper
    command equal to the previous step's (so hold-still-while-grasping
    transitions are kept). First-step actions use criterion (1) only.
    Matches reference regenerate_libero_dataset.py:46-69."""
    if prev_action is None:
        return bool(np.linalg.norm(action[:-1]) < threshold)
    return bool(np.linalg.norm(action[:-1]) < threshold
                and action[-1] == prev_action[-1])


def filter_noop_actions(actions: np.ndarray) -> List[int]:
    """Indices of actions that survive the no-op filter, threading the
    previous *kept* action as the gripper reference (the reference compares
    against the last recorded action, not the last raw one)."""
    kept: List[int] = []
    prev = None
    for i, action in enumerate(np.asarray(actions)):
        if is_noop(action, prev):
            continue
        kept.append(i)
        prev = action
    return kept


def replay_episode(env, demo_data, dummy_action, quat2axisangle) -> Optional[Dict]:
    """Replay one demo through `env`, dropping no-ops; returns the recorded
    episode dict if the replay ends in success, else None."""
    orig_actions = demo_data["actions"][()]
    orig_states = demo_data["states"][()]

    env.reset()
    env.set_init_state(orig_states[0])
    obs = reward = done = info = None
    for _ in range(10):  # settle
        obs, reward, done, info = env.step(dummy_action)

    rec = {k: [] for k in ("states", "actions", "ee_states", "gripper_states",
                           "joint_states", "robot_states",
                           "agentview_images", "eye_in_hand_images")}
    for action in orig_actions:
        prev = rec["actions"][-1] if rec["actions"] else None
        if is_noop(action, prev):
            continue
        if not rec["states"]:
            rec["states"].append(orig_states[0])
            rec["robot_states"].append(demo_data["robot_states"][0])
        else:
            rec["states"].append(env.sim.get_state().flatten())
            rec["robot_states"].append(np.concatenate(
                [obs["robot0_gripper_qpos"], obs["robot0_eef_pos"],
                 obs["robot0_eef_quat"]]))
        rec["actions"].append(action)
        if "robot0_gripper_qpos" in obs:
            rec["gripper_states"].append(obs["robot0_gripper_qpos"])
        rec["joint_states"].append(obs["robot0_joint_pos"])
        rec["ee_states"].append(np.hstack(
            (obs["robot0_eef_pos"], quat2axisangle(obs["robot0_eef_quat"]))))
        rec["agentview_images"].append(obs["agentview_image"])
        rec["eye_in_hand_images"].append(obs["robot0_eye_in_hand_image"])
        obs, reward, done, info = env.step(np.asarray(action).tolist())

    if not done:
        return None
    n = len(rec["actions"])
    rec["dones"] = np.zeros(n, np.uint8)
    rec["dones"][-1] = 1
    rec["rewards"] = np.zeros(n, np.uint8)
    rec["rewards"][-1] = 1
    return rec


def _write_episode(grp, i: int, rec: Dict) -> None:
    ep = grp.create_group(f"demo_{i}")
    obs_grp = ep.create_group("obs")
    ee = np.stack(rec["ee_states"], axis=0)
    obs_grp.create_dataset("gripper_states",
                           data=np.stack(rec["gripper_states"], axis=0))
    obs_grp.create_dataset("joint_states",
                           data=np.stack(rec["joint_states"], axis=0))
    obs_grp.create_dataset("ee_states", data=ee)
    obs_grp.create_dataset("ee_pos", data=ee[:, :3])
    obs_grp.create_dataset("ee_ori", data=ee[:, 3:])
    obs_grp.create_dataset("agentview_rgb",
                           data=np.stack(rec["agentview_images"], axis=0))
    obs_grp.create_dataset("eye_in_hand_rgb",
                           data=np.stack(rec["eye_in_hand_images"], axis=0))
    ep.create_dataset("actions", data=np.asarray(rec["actions"]))
    ep.create_dataset("states", data=np.stack(rec["states"]))
    ep.create_dataset("robot_states",
                      data=np.stack(rec["robot_states"], axis=0))
    ep.create_dataset("rewards", data=rec["rewards"])
    ep.create_dataset("dones", data=rec["dones"])


def main(args) -> None:
    import h5py
    try:
        import robosuite.utils.transform_utils as T
        from libero.libero import benchmark
    except ImportError as e:
        raise ImportError(
            "Dataset regeneration needs the LIBERO benchmark + robosuite "
            "(external simulators, as in the reference setup). "
            f"Missing: {e}") from e
    from experiments.robot.libero.libero_utils import (
        get_libero_dummy_action, get_libero_env)

    os.makedirs(args.libero_target_dir, exist_ok=True)
    metainfo: Dict[str, Dict] = {}
    metainfo_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"{args.libero_task_suite}_metainfo.json")

    task_suite = benchmark.get_benchmark_dict()[args.libero_task_suite]()
    num_replays = num_success = 0
    for task_id in range(task_suite.n_tasks):
        task = task_suite.get_task(task_id)
        env, task_description = get_libero_env(task, "llava",
                                               resolution=IMAGE_RESOLUTION)
        orig_path = os.path.join(args.libero_raw_data_dir,
                                 f"{task.name}_demo.hdf5")
        with h5py.File(orig_path, "r") as orig, \
                h5py.File(os.path.join(args.libero_target_dir,
                                       f"{task.name}_demo.hdf5"), "w") as new:
            grp = new.create_group("data")
            orig_data = orig["data"]
            for i in range(len(orig_data.keys())):
                demo = orig_data[f"demo_{i}"]
                rec = replay_episode(env, demo,
                                     get_libero_dummy_action("llava"),
                                     T.quat2axisangle)
                num_replays += 1
                if rec is not None:
                    _write_episode(grp, i, rec)
                    num_success += 1
                key = task_description.replace(" ", "_")
                metainfo.setdefault(key, {})[f"demo_{i}"] = {
                    "success": rec is not None,
                    "initial_state": demo["states"][0].tolist(),
                }
                with open(metainfo_path, "w") as f:  # crash-safe overwrite
                    json.dump(metainfo, f, indent=2)
                print(f"replayed {num_replays}, successes {num_success} "
                      f"({num_success / num_replays * 100:.1f}%)")
    print(f"Regenerated dataset at {args.libero_target_dir}; "
          f"metainfo at {metainfo_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--libero_task_suite", required=True,
                   choices=["libero_spatial", "libero_object", "libero_goal",
                            "libero_10", "libero_90"])
    p.add_argument("--libero_raw_data_dir", required=True)
    p.add_argument("--libero_target_dir", required=True)
    main(p.parse_args())
