"""Hardware-interface modules: pure-logic tests (no ROS / interbotix /
widowx_envs needed — those import lazily inside constructors)."""

import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_aloha_modules_import_without_ros():
    import experiments.robot.aloha.constants  # noqa: F401
    import experiments.robot.aloha.real_env  # noqa: F401
    import experiments.robot.aloha.robot_utils  # noqa: F401


def test_aloha_gripper_conversions_roundtrip():
    from experiments.robot.aloha import constants as C

    for x in np.linspace(0, 1, 7):
        np.testing.assert_allclose(
            C.puppet_gripper_position_normalize(
                C.puppet_gripper_position_unnormalize(x)), x, atol=1e-12)
        np.testing.assert_allclose(
            C.master_gripper_joint_normalize(
                C.master_gripper_joint_unnormalize(x)), x, atol=1e-12)
    # master->puppet maps endpoints to endpoints
    np.testing.assert_allclose(
        C.master2puppet_position(C.MASTER_GRIPPER_POSITION_OPEN),
        C.PUPPET_GRIPPER_POSITION_OPEN, atol=1e-12)
    np.testing.assert_allclose(
        C.master2puppet_joint(C.MASTER_GRIPPER_JOINT_CLOSE),
        C.PUPPET_GRIPPER_JOINT_CLOSE, atol=1e-12)
    # pos<->joint round trip
    np.testing.assert_allclose(
        C.puppet_joint2pos(C.puppet_pos2joint(0.03)), 0.03, atol=1e-12)
    # reference-style aliases point at the same functions
    assert C.PUPPET_GRIPPER_POSITION_NORMALIZE_FN is \
        C.puppet_gripper_position_normalize


def test_aloha_interpolation_profile():
    from experiments.robot.aloha.robot_utils import interpolate_trajectory

    traj = interpolate_trajectory([[0.0, 0.0]], [[1.0, -2.0]], num_steps=5)
    assert traj.shape == (5, 1, 2)
    np.testing.assert_allclose(traj[0, 0], [0.0, 0.0])
    np.testing.assert_allclose(traj[-1, 0], [1.0, -2.0])
    np.testing.assert_allclose(np.diff(traj[:, 0, 0]), 0.25)


def test_aloha_split_action():
    from experiments.robot.aloha.real_env import split_action

    left, right = split_action(np.arange(14.0))
    np.testing.assert_array_equal(left, np.arange(7.0))
    np.testing.assert_array_equal(right, np.arange(7.0, 14.0))


def test_bridge_obs_conversions():
    from experiments.robot.bridge.widowx_env import (
        START_ROTATION, convert_obs, null_obs, start_transform)

    im = 8
    raw = {
        "image": (np.arange(3 * im * im, dtype=np.float64)
                  .reshape(3, im, im) / (3 * im * im)),
        "full_image": np.zeros((480, 640, 3), np.uint8),
        "state": np.arange(7, dtype=np.float64),
    }
    obs = convert_obs(raw, im)
    assert obs["image_primary"].shape == (im, im, 3)
    assert obs["image_primary"].dtype == np.uint8
    # 7-D bridge proprio (xyz+rpy+gripper) matching constants.BRIDGE and the
    # bridge OXE configs — see convert_obs's documented divergence from the
    # reference's stale 8-D Octo pad
    np.testing.assert_array_equal(obs["proprio"], [0, 1, 2, 3, 4, 5, 6])
    from openvla_oft_tpu.constants import BRIDGE

    assert obs["proprio"].shape[0] == BRIDGE.proprio_dim
    nu = null_obs(im)
    assert nu["image_primary"].shape == (im, im, 3)
    assert nu["proprio"].shape == (7,)

    t = start_transform([0.1, 0.2, 0.3])
    assert t.shape == (4, 4)
    np.testing.assert_allclose(t[:3, 3], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(t[:3, :3], START_ROTATION)
    np.testing.assert_allclose(t[3], [0, 0, 0, 1])
    # rotation block is orthonormal-ish (reference values are rounded)
    np.testing.assert_allclose(START_ROTATION @ START_ROTATION.T, np.eye(3),
                               atol=2e-3)


def test_bridge_state_to_eep():
    pytest.importorskip("pyquaternion")
    from experiments.robot.bridge.widowx_env import state_to_eep

    pose = state_to_eep([0.3, 0.0, 0.15], 0.0)
    assert pose.shape == (4, 4)
    np.testing.assert_allclose(pose[:3, 3], [0.3, 0.0, 0.15])
    np.testing.assert_allclose(pose[:3, :3] @ pose[:3, :3].T, np.eye(3),
                               atol=1e-9)


def test_robosuite_create_video(tmp_path):
    from experiments.robot.robosuite.create_video import render_rollout

    traj = [{"obs": {"task_description": "pick the red block",
                     "camera_front_image":
                         np.random.default_rng(0).integers(
                             0, 255, (64, 80, 3)).astype(np.uint8)}}
            for _ in range(4)]
    pkl_path = tmp_path / "traj000.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(traj, f)
    out = render_rollout(str(pkl_path), str(tmp_path))
    assert Path(out).exists() and Path(out).stat().st_size > 0


def test_robosuite_rotation_helpers_match_scipy():
    """quat2mat/mat2quat/euler2mat/mat2euler/quat2axisangle against scipy
    (robosuite conventions: xyzw quats, static-frame xyz euler)."""
    pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation

    from experiments.robot.robosuite.robosuite_utils import (
        euler2mat, mat2euler, mat2quat, quat2axisangle, quat2mat)

    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        r = Rotation.from_quat(q)  # scipy is xyzw too
        np.testing.assert_allclose(quat2mat(q), r.as_matrix(), atol=1e-10)
        # mat2quat up to sign
        q2 = mat2quat(r.as_matrix())
        np.testing.assert_allclose(np.abs(q2 @ q), 1.0, atol=1e-10)
        # euler static xyz == scipy lowercase 'xyz' extrinsic
        e = rng.uniform(-3, 3, 3)
        np.testing.assert_allclose(euler2mat(e),
                                   Rotation.from_euler("xyz", e).as_matrix(),
                                   atol=1e-10)
        m = Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()
        np.testing.assert_allclose(euler2mat(mat2euler(m)), m, atol=1e-9)
        # axis-angle
        aa = quat2axisangle(q if q[3] >= 0 else -q)
        np.testing.assert_allclose(aa, r.as_rotvec(), atol=1e-9)


def test_robosuite_action_world_conversion():
    """convert_action_to_world reproduces the reference step conversion
    (test/pick_place.py:95-115): delta position, negated-euler axis-angle,
    gripper binarized at 0.97."""
    from experiments.robot.robosuite.robosuite_utils import (
        convert_action_to_world, euler2mat, mat2quat, quat2axisangle)

    eef = np.array([0.1, -0.2, 0.9])
    action = np.array([0.02, -0.01, 0.03, 0.3, -0.2, 0.1, 0.99])
    world, closed = convert_action_to_world(action, eef)
    np.testing.assert_allclose(world[:3], eef + action[:3])
    np.testing.assert_allclose(
        world[3:6], quat2axisangle(mat2quat(euler2mat(-action[3:6]))))
    assert world[6] == 1.0 and closed == 1.0
    world2, closed2 = convert_action_to_world(
        np.array([0, 0, 0, 0, 0, 0, 0.5]), eef, abs_pose=True)
    np.testing.assert_allclose(world2[:3], [0, 0, 0])
    assert world2[6] == -1.0 and closed2 == 0.0


def test_robosuite_crop_and_obs_layout():
    from experiments.robot.robosuite.robosuite_utils import (
        TASK_CROP, crop_front_image, prepare_observation)

    img = np.random.default_rng(0).integers(0, 255, (200, 360, 3)).astype(
        np.uint8)
    out = crop_front_image(img, "pick_place", out_size=224)
    assert out.shape == (224, 224, 3)

    obs = {
        "camera_front_image": img[:100, :100],
        "eye_in_hand_image": img[:100, :100],
        "eef_pos": np.array([0.1, 0.2, 0.3]),
        "eef_quat": np.array([0.0, 0.0, 0.0, 1.0]),
        "joint_pos": np.zeros(6),
    }
    o = prepare_observation(obs, resize_size=64, gripper_closed=1.0)
    assert o["full_image"].shape == (64, 64, 3)
    assert o["eef_pose"].shape == (6,)
    np.testing.assert_allclose(o["eef_pose"][:3], [0.1, 0.2, 0.3])
    assert o["gripper_closed"] == 1.0
    assert o["state"].shape == (6,)


def test_robosuite_env_adapter_wiring():
    """`build_env_context` resolves tasks/controllers without robosuite
    installed (ImportError is raised only at the robosuite import, with an
    install pointer); with robosuite present the gated smoke below builds it."""
    import pytest

    from experiments.robot.robosuite.robosuite_utils import (
        OSC_POSE_CONTROLLER,
        ROBOSUITE_TASK_MAP,
        build_env_context,
    )

    # reference TASK_MAP parity (robosuite_utils.py:67-97)
    assert ROBOSUITE_TASK_MAP["pick_place"]["num_variations"] == 16
    assert ROBOSUITE_TASK_MAP["pick_place"]["agent-teacher"][0] == \
        "UR5e_PickPlaceDistractor"
    assert ROBOSUITE_TASK_MAP["pick_place"]["object_set"] == 2
    # reference osc_pose.json parity
    assert OSC_POSE_CONTROLLER["type"] == "OSC_POSE"
    assert OSC_POSE_CONTROLLER["kp"] == 150
    assert OSC_POSE_CONTROLLER["control_delta"] is True

    try:
        import robosuite  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="robosuite"):
            build_env_context("ur5e_pick_place", "", 0, 7)
        return
    # import-gated smoke: only runs where the sim stack is installed
    env = build_env_context("ur5e_pick_place", "", variation=0, seed=7)
    obs = env.reset()
    assert obs is not None
