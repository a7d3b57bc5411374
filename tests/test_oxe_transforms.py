"""OXE standardization-transform unit tests on synthetic raw trajectories.

For every magic-soup/RT-X/LIBERO/ALOHA/T-DROID/DROID registry member this
builds a synthetic trajectory in that dataset's *raw* layout, runs the
registered standardization transform, and checks the standardized contract:
  - action is (T', action_dim) float32 and finite,
  - every non-None state_obs_key from the config exists in the observation,
  - family-specific gripper/action semantics (clip+invert, rel2abs,
    binarize+relabel, 1-gripper) hold numerically.

Reference semantics: prismatic/vla/datasets/rlds/oxe/transforms.py:30-943 and
utils/droid_utils.py.
"""

import zlib

import numpy as np
import pytest

from openvla_oft_tpu.data.rlds.oxe import (
    OXE_DATASET_CONFIGS,
    OXE_STANDARDIZATION_TRANSFORMS,
    ActionEncoding,
)

T_ = 9  # trajectory length


def _rng(name):
    # crc32, not builtin hash(): str hash is salted per process, which made
    # the synthetic fixtures nondeterministic across runs (an intermittent
    # bridge-truncation failure traced to exactly this)
    return np.random.default_rng(zlib.crc32(name.encode()) % (2 ** 31))


def _dict_action(rng, grip_shape=(T_, 1), grip_key="gripper_closedness_action"):
    return {
        "world_vector": rng.uniform(-1, 1, (T_, 3)).astype(np.float32),
        "rotation_delta": rng.uniform(-1, 1, (T_, 3)).astype(np.float32),
        grip_key: rng.uniform(-1, 1, grip_shape).astype(np.float32),
    }


def _nl(rng):
    return np.asarray([b"pick the object"] * T_)


def _raw_traj(name):
    """Synthetic raw trajectory matching each dataset's on-disk layout."""
    rng = _rng(name)
    obs = {"natural_language_instruction": _nl(rng)}
    traj = {"observation": obs,
            "language_instruction": np.asarray([b"do the task"] * T_)}

    def arr(*shape):
        return rng.uniform(-1, 1, shape).astype(np.float32)

    if name in ("fractal20220817_data",):
        traj["action"] = _dict_action(rng)
        obs["base_pose_tool_reached"] = arr(T_, 7)
        obs["gripper_closed"] = arr(T_, 1)
    elif name == "kuka":
        traj["action"] = _dict_action(rng)
        obs["clip_function_input/base_pose_tool_reached"] = [
            zlib.compress(arr(7).tobytes()) for _ in range(T_)]
        obs["gripper_closed"] = [
            zlib.compress(arr(1).tobytes()) for _ in range(T_)]
    elif name == "bridge_oxe":
        # OXE-bucket Bridge: dict actions (transforms.py:37-64)
        traj["action"] = {"world_vector": arr(T_, 3),
                          "rotation_delta": arr(T_, 3),
                          "open_gripper": rng.integers(0, 2, (T_,))
                          .astype(bool)}
        obs["state"] = arr(T_, 7)
    elif name.startswith("bridge"):
        traj["action"] = arr(T_, 7)
        obs["state"] = arr(T_, 7)
    elif name == "taco_play":
        traj["action"] = {"rel_actions_world": arr(T_, 7)}
        obs["robot_obs"] = arr(T_, 15)
    elif name == "jaco_play":
        traj["action"] = {"world_vector": arr(T_, 3),
                          "gripper_closedness_action": arr(T_, 1)}
        obs["end_effector_cartesian_pos"] = arr(T_, 7)
    elif name == "berkeley_cable_routing":
        traj["action"] = _dict_action(rng)
        obs["robot_state"] = arr(T_, 7)
    elif name == "roboturk":
        traj["action"] = _dict_action(rng)
    elif name == "viola":
        traj["action"] = _dict_action(rng, grip_shape=(T_,))
        obs["joint_states"] = arr(T_, 7)
        obs["gripper_states"] = arr(T_, 1)
    elif name == "berkeley_autolab_ur5":
        traj["action"] = _dict_action(rng, grip_shape=(T_,))
        obs["robot_state"] = arr(T_, 15)
        obs["image_with_depth"] = arr(T_, 4, 4)
    elif name == "toto":
        traj["action"] = {"world_vector": arr(T_, 3),
                          "rotation_delta": arr(T_, 3),
                          "open_gripper": rng.integers(0, 2, (T_,))
                          .astype(bool)}
        obs["state"] = arr(T_, 7)
    elif name == "language_table":
        traj["action"] = arr(T_, 2)
        text = np.zeros((T_, 12), np.int32)
        text[:, :4] = [ord(c) for c in "push"]
        obs["instruction"] = text
        obs["effector_translation"] = arr(T_, 2)
    elif name == "stanford_hydra_dataset_converted_externally_to_rlds":
        traj["action"] = arr(T_, 7)
        obs["state"] = arr(T_, 13)
    elif name == "austin_buds_dataset_converted_externally_to_rlds":
        traj["action"] = arr(T_, 7)
        obs["state"] = arr(T_, 24)
    elif name == "nyu_franka_play_dataset_converted_externally_to_rlds":
        traj["action"] = arr(T_, 15)
        obs["state"] = arr(T_, 13)
        obs["depth"] = rng.integers(0, 255, (T_, 4, 4, 1)).astype(np.int32)
        obs["depth_additional_view"] = rng.integers(
            0, 255, (T_, 4, 4, 1)).astype(np.int32)
        obs["eef_state"] = None  # produced by the transform
    elif name == "furniture_bench_dataset_converted_externally_to_rlds":
        quat = rng.normal(size=(T_, 4))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        traj["action"] = np.concatenate(
            [arr(T_, 3), quat.astype(np.float32), arr(T_, 1)], axis=-1)
        obs["state"] = arr(T_, 16)
    elif name == "ucsd_kitchen_dataset_converted_externally_to_rlds":
        traj["action"] = arr(T_, 8)
        obs["state"] = arr(T_, 21)
    elif name in ("austin_sailor_dataset_converted_externally_to_rlds",
                  "austin_sirius_dataset_converted_externally_to_rlds"):
        traj["action"] = arr(T_, 7)
        obs["state"] = arr(T_, 8)
    elif name == "bc_z":
        traj["action"] = {
            "future/xyz_residual": arr(T_, 3),
            "future/axis_angle_residual": arr(T_, 3),
            "future/target_close": rng.integers(0, 2, (T_, 1))}
        obs["present/xyz"] = arr(T_, 3)
        obs["present/axis_angle"] = arr(T_, 3)
        obs["present/sensed_close"] = arr(T_, 1)
    elif name == "dlr_edan_shared_control_converted_externally_to_rlds":
        traj["action"] = arr(T_, 7)
        obs["state"] = arr(T_, 7)
    elif name == "iamlab_cmu_pickup_insert_converted_externally_to_rlds":
        quat = rng.normal(size=(T_, 4))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        traj["action"] = np.concatenate(
            [arr(T_, 3), quat.astype(np.float32), arr(T_, 1)], axis=-1)
        obs["state"] = arr(T_, 9)
    elif name == "utaustin_mutex":
        traj["action"] = arr(T_, 7)
        obs["state"] = arr(T_, 24)
    elif name == "berkeley_fanuc_manipulation":
        traj["action"] = arr(T_, 6)
        obs["state"] = arr(T_, 7)
    elif name == "cmu_stretch":
        traj["action"] = arr(T_, 8)
        obs["state"] = arr(T_, 4)
    elif name == "fmb_dataset":
        traj["action"] = arr(T_, 7)
        obs["eef_pose"] = arr(T_, 6)
        obs["state_gripper_pose"] = arr(T_)
    elif name == "dobbe":
        traj["action"] = arr(T_, 7)
        obs["state"] = arr(T_, 7)
    elif name == "droid" or name == "droid_wipe":
        traj["action_dict"] = {
            "cartesian_velocity": arr(T_, 6),
            "gripper_position": rng.uniform(0, 1, (T_, 1))
            .astype(np.float32)}
        traj["action"] = arr(T_, 7)
        obs["exterior_image_1_left"] = rng.integers(
            0, 255, (T_, 4, 4, 3)).astype(np.uint8)
        obs["exterior_image_2_left"] = rng.integers(
            0, 255, (T_, 4, 4, 3)).astype(np.uint8)
        obs["cartesian_position"] = arr(T_, 6)
        obs["gripper_position"] = rng.uniform(0, 1, (T_, 1)).astype(np.float32)
    elif name.startswith("tdroid"):
        traj["action"] = arr(T_, 7)
        obs["cartesian_position"] = arr(T_, 6)
        obs["gripper_position"] = arr(T_, 1)
    elif name.startswith("libero"):
        traj["action"] = arr(T_, 7)
        obs["state"] = arr(T_, 8)
    elif name.startswith("aloha"):
        traj["action"] = arr(T_, 14)
        obs["state"] = arr(T_, 14)
    elif name.startswith("ur5e_pick_place"):
        traj["action"] = arr(T_, 7)
        obs["eef_pose"] = arr(T_, 6)
        traj["traj_metadata"] = {
            "language_instruction": np.asarray([b"pick"] * T_)}
    else:
        return None
    return traj


COVERED = [n for n in OXE_DATASET_CONFIGS if _raw_traj(n) is not None]
_DIM = {ActionEncoding.EEF_POS: 7, ActionEncoding.JOINT_POS: 8,
        ActionEncoding.JOINT_POS_BIMANUAL: 14, ActionEncoding.EEF_R6: 10}


@pytest.mark.parametrize("name", COVERED)
def test_transform_standardizes(name):
    cfg = OXE_DATASET_CONFIGS[name]
    fn = OXE_STANDARDIZATION_TRANSFORMS[name]
    out = fn(_raw_traj(name))
    action = np.asarray(out["action"])
    assert action.ndim == 2 and action.shape[1] == _DIM[cfg.action_encoding], \
        (name, action.shape)
    assert action.dtype == np.float32 and np.isfinite(action).all(), name
    for key in cfg.state_obs_keys:
        if key is not None:
            assert key in out["observation"], (name, key)
            assert len(np.asarray(out["observation"][key])) == action.shape[0]


def test_coverage_spans_magic_soup_plus():
    """Every oxe_magic_soup_plus member has a transform AND a synthetic test."""
    from openvla_oft_tpu.data.rlds.oxe import OXE_NAMED_MIXTURES

    for dname, _ in OXE_NAMED_MIXTURES["oxe_magic_soup_plus"]:
        assert dname in OXE_STANDARDIZATION_TRANSFORMS, dname
        assert dname in COVERED, dname


def test_libero_gripper_clip_invert():
    traj = _raw_traj("libero_spatial_no_noops")
    raw = np.asarray(traj["action"]).copy()
    out = OXE_STANDARDIZATION_TRANSFORMS["libero_spatial_no_noops"](traj)
    np.testing.assert_allclose(
        out["action"][:, -1], 1.0 - np.clip(raw[:, -1], 0, 1), atol=1e-6)
    np.testing.assert_allclose(out["action"][:, :6], raw[:, :6], atol=1e-6)
    assert out["observation"]["gripper_state"].shape[1] == 2


def test_rt1_gripper_rel2abs_range():
    out = OXE_STANDARDIZATION_TRANSFORMS["fractal20220817_data"](
        _raw_traj("fractal20220817_data"))
    g = out["action"][:, -1]
    assert ((g >= 0) & (g <= 1)).all()


def test_rel2abs_gripper_direction_matches_reference():
    """Direction, not just range: the reference (data_utils.py:132-153) maps
    a close(+1)...open(-1) command stream to open=1/closed=0 state. A sign
    flip here silently inverts gripper semantics for the whole rt1 family
    (caught in round-2 review)."""
    from openvla_oft_tpu.data.transforms import rel2abs_gripper_actions

    # starts open (pre-first-intent), closes at t=2, opens at t=4
    rel = np.array([0.0, 0.0, 1.0, 0.0, -1.0])
    np.testing.assert_allclose(rel2abs_gripper_actions(rel),
                               [1.0, 1.0, 0.0, 0.0, 1.0])
    # no intents at all -> open for the whole trajectory
    np.testing.assert_allclose(rel2abs_gripper_actions(np.zeros(3)),
                               [1.0, 1.0, 1.0])
    # first intent is opening -> state before it was closed
    rel = np.array([0.0, -1.0, 0.0])
    np.testing.assert_allclose(rel2abs_gripper_actions(rel),
                               [0.0, 1.0, 1.0])


def test_bridge_truncation_and_relabel():
    traj = _raw_traj("bridge_orig")
    state = np.asarray(traj["observation"]["state"]).copy()
    out = OXE_STANDARDIZATION_TRANSFORMS["bridge_orig"](traj)
    # drops first step (all-zero action) and last step (relabel)
    assert out["action"].shape[0] == T_ - 2
    # arm action = reached-state delta of the truncated stream
    np.testing.assert_allclose(
        out["action"][:, :6], state[2:, :6] - state[1:-1, :6], atol=1e-6)
    # binarized gripper is 0/1
    assert set(np.unique(out["action"][:, -1])) <= {0.0, 1.0}


def test_droid_base_frame_actions():
    traj = _raw_traj("droid")
    vel = np.asarray(traj["action_dict"]["cartesian_velocity"]).copy()
    grip = np.asarray(traj["action_dict"]["gripper_position"]).copy()
    out = OXE_STANDARDIZATION_TRANSFORMS["droid"](traj)
    np.testing.assert_allclose(out["action"][:, :6], vel, atol=1e-6)
    np.testing.assert_allclose(out["action"][:, -1:], 1 - grip, atol=1e-6)
    assert out["observation"]["proprio"].shape == (T_, 7)


def test_droid_wrist_frame_r6_roundtrip():
    """R6 wrist-frame encoding: identity wrist pose keeps base-frame values;
    the R6 block is the first two rows of the delta rotation matrix."""
    from openvla_oft_tpu.data.rlds.oxe.droid_utils import (
        euler_to_rmat,
        rmat_to_euler,
        quat_to_euler,
        rotmat_to_rot6d,
        velocity_act_to_wrist_frame,
    )

    rng = np.random.default_rng(0)
    vel = rng.uniform(-0.5, 0.5, (5, 6))
    wrist_identity = np.zeros((5, 6))
    out = velocity_act_to_wrist_frame(vel, wrist_identity)
    assert out.shape == (5, 9)
    np.testing.assert_allclose(out[:, :3], vel[:, :3], atol=1e-6)
    np.testing.assert_allclose(
        out[:, 3:], rotmat_to_rot6d(euler_to_rmat(vel[:, 3:6])), atol=1e-6)

    # euler <-> rmat round trip
    e = rng.uniform(-1.0, 1.0, (7, 3))
    np.testing.assert_allclose(rmat_to_euler(euler_to_rmat(e)), e, atol=1e-8)
    # quaternion -> euler consistent with the rotation matrix
    half = e / 2  # build quaternion for a z-rotation only
    ez = np.stack([np.zeros(7), np.zeros(7), e[:, 2]], -1)
    quat = np.stack([np.zeros(7), np.zeros(7),
                     np.sin(half[:, 2]), np.cos(half[:, 2])], -1)
    np.testing.assert_allclose(quat_to_euler(quat), ez, atol=1e-8)


def test_zero_action_filter():
    from openvla_oft_tpu.data.rlds.oxe.droid_utils import (
        DROID_Q01,
        DROID_Q99,
        zero_action_filter,
    )

    norm_zero = 2 * (0 - DROID_Q01) / (DROID_Q99 - DROID_Q01 + 1e-8) - 1
    zeros = {"action": np.concatenate(
        [np.tile(norm_zero, (4, 1)), np.ones((4, 1))], axis=1)}
    assert not zero_action_filter(zeros)
    moving = {"action": np.ones((4, 7))}
    assert zero_action_filter(moving)


def test_every_mixture_member_resolves():
    """Every member of every named mixture resolves to a registry config, a
    standardization transform, and loadable dataset kwargs — with the two
    reference-parity exceptions that must KEEP raising (materialize.py:32-50):
    non-EEF/bimanual action encodings, and camera-view sets that lack the
    requested view."""
    from openvla_oft_tpu.data.rlds.oxe import (
        OXE_DATASET_CONFIGS,
        OXE_NAMED_MIXTURES,
        OXE_STANDARDIZATION_TRANSFORMS,
        make_oxe_dataset_kwargs,
    )

    assert len(OXE_NAMED_MIXTURES) >= 21  # full reference breadth
    members = {d for mix in OXE_NAMED_MIXTURES.values() for d, _ in mix}
    assert len(members) >= 50
    for name in sorted(members):
        assert name in OXE_DATASET_CONFIGS, f"no config for {name}"
        assert name in OXE_STANDARDIZATION_TRANSFORMS, f"no transform for {name}"
        cfg = OXE_DATASET_CONFIGS[name]
        encoding_ok = cfg.action_encoding.name in (
            "EEF_POS", "EEF_R6", "JOINT_POS_BIMANUAL")
        has_primary = cfg.image_obs_keys.get("primary") is not None or \
            "camera_front_image" in cfg.image_obs_keys
        views = ("camera_front_image",) if "camera_front_image" in \
            cfg.image_obs_keys else ("primary",)
        if encoding_ok and has_primary:
            kw = make_oxe_dataset_kwargs(name, "/data",
                                         load_camera_views=views)
            assert kw["standardize_fn"] is not None
            assert len(kw["absolute_action_mask"]) == \
                len(kw["action_normalization_mask"])
        else:
            with pytest.raises(ValueError):
                make_oxe_dataset_kwargs(name, "/data")
