"""Ingest TFDS-serialized RLDS datasets (the real OXE on-disk layout).

TFDS writes RLDS episodes as TFRecord shards
(`<name>-train.tfrecord-00000-of-000NN`) where each example flattens the
nested `steps` Sequence into keys like:

    steps/observation/<image_key> : bytes per step (encoded image)
    steps/observation/state       : floats (T * state_dim)
    steps/action                  : floats (T * action_dim)
    steps/language_instruction    : bytes per step

This module reads that layout directly on tf.data — no `tensorflow_datasets`
dependency — using the OXE registry (data/rlds/oxe.py) for per-dataset
observation-key mapping, exactly the role of the reference's
`make_dataset_from_rlds` obs-key remapping (rlds/dataset.py:40-170).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from openvla_oft_tpu.constants import PlatformSpec
from openvla_oft_tpu.data.rlds.oxe import OXE_DATASET_CONFIGS


def find_tfds_files(root: str, name: str, split: str = "train") -> List[str]:
    """Locate TFDS shard files under `<root>/<name>[/<version>]/`."""
    candidates = [
        os.path.join(root, name, f"*{split}.tfrecord*"),
        os.path.join(root, name, "*", f"*{split}.tfrecord*"),
        os.path.join(root, name, "*", "*", f"*{split}.tfrecord*"),
    ]
    for pattern in candidates:
        files = sorted(glob.glob(pattern))
        if files:
            return files
    return []


# raw float observation keys commonly holding proprio in OXE datasets —
# probed in addition to the registry's (post-standardization) state keys,
# because transforms *create* keys like EEF_state from these raw ones.
_RAW_STATE_CANDIDATES = (
    "state", "proprio", "robot_obs", "robot_state", "cartesian_position",
    "gripper_position", "eef_pose", "joint_state", "end_effector_cartesian_pos",
    "end_effector_pose", "tcp_pose",
)

# === Structured-feature plans ===
# The RT-X-core TFDS datasets store *dict* actions (steps/action/<subkey>)
# and per-step string/int observation features the standardization transforms
# consume; a flat steps/action float parse cannot feed them. Each plan lists
# exactly the features its registry transform reads (dtype names resolved to
# tf dtypes at parse time):
#   action:      steps/action/<k> -> traj["action"][k]  (dict action)
#   action_dict: steps/action_dict/<k> -> traj["action_dict"][k]  (droid)
#   obs_string:  per-step string observation features (language, ZLIB blobs)
#   obs_int:     per-step int observation features (language_table codepoints)
_WVRD = {"world_vector": "float32", "rotation_delta": "float32"}
_RT1_ACT = {**_WVRD, "gripper_closedness_action": "float32"}
_NLI = ["natural_language_instruction"]
_TFDS_FEATURE_PLANS: Dict[str, Dict] = {
    "fractal20220817_data": {"action": _RT1_ACT, "obs_string": _NLI},
    "kuka": {"action": _RT1_ACT, "obs_string": _NLI + [
        "clip_function_input/base_pose_tool_reached", "gripper_closed"]},
    "bridge_oxe": {"action": {**_WVRD, "open_gripper": "int64:scalar"},
                   "obs_string": _NLI},
    "taco_play": {"action": {"rel_actions_world": "float32"},
                  "obs_string": _NLI},
    "jaco_play": {"action": {"world_vector": "float32",
                             "gripper_closedness_action": "float32"},
                  "obs_string": _NLI},
    "berkeley_cable_routing": {"action": dict(_WVRD), "obs_string": _NLI},
    "roboturk": {"action": _RT1_ACT, "obs_string": _NLI},
    "nyu_door_opening_surprising_effectiveness": {"action": _RT1_ACT,
                                                  "obs_string": _NLI},
    "viola": {"action": {**_WVRD,
                         "gripper_closedness_action": "float32:scalar"},
              "obs_string": _NLI},
    "berkeley_autolab_ur5": {
        "action": {**_WVRD, "gripper_closedness_action": "float32:scalar"},
        "obs_string": _NLI},
    "toto": {"action": {**_WVRD, "open_gripper": "int64:scalar"},
             "obs_string": _NLI},
    "language_table": {"obs_int": ["instruction"]},
    "dlr_shared_control": {"obs_string": _NLI},
    "bc_z": {"action": {"future/xyz_residual": "float32",
                        "future/axis_angle_residual": "float32",
                        "future/target_close": "int64"},
             "obs_string": _NLI},
    "robo_net": {"obs_string": _NLI},
    "pusht": {"action": {**_WVRD,
                         "gripper_closedness_action": "float32:scalar"},
              "obs_string": _NLI},
    "rh20t": {"action": {"tcp_base": "float32",
                         "gripper": "float32:scalar"}},
    "droid": {"action_dict": {"cartesian_velocity": "float32",
                              "gripper_position": "float32"}},
    "droid_wipe": {"action_dict": {"cartesian_velocity": "float32",
                                   "gripper_position": "float32"}},
}

_TF_DTYPES = {"float32": "float32", "int64": "int64", "string": "string"}


def tfds_feature_keys(name: str) -> Dict[str, Optional[str]]:
    """Resolve TFDS flat keys from the OXE registry entry."""
    cfg = OXE_DATASET_CONFIGS.get(name)
    image_keys = dict(cfg.image_obs_keys) if cfg else {"primary": "image"}
    state_keys = [k for k in (cfg.state_obs_keys if cfg else ()) if k]
    return {"image_keys": image_keys, "state_keys": state_keys}


def parse_tfds_episode(record_bytes, name: str, platform: PlatformSpec,
                       keep_raw_state: bool = False):
    """Parse one TFDS RLDS episode record -> numpy episode dict (eager).

    With `keep_raw_state`, every present float observation key is kept
    separately (the layout standardization transforms consume); otherwise the
    registry state keys are concatenated into `proprio`.
    """
    import tensorflow as tf

    keys = tfds_feature_keys(name)
    plan = _TFDS_FEATURE_PLANS.get(name, {})
    non_float = set(plan.get("obs_string", [])) | set(plan.get("obs_int", []))
    float_keys = [k for k in keys["state_keys"] if k not in non_float]
    if keep_raw_state:
        float_keys += [k for k in _RAW_STATE_CANDIDATES
                       if k not in float_keys and k not in non_float]
    spec = {
        "steps/action": tf.io.VarLenFeature(tf.float32),
        "steps/language_instruction": tf.io.VarLenFeature(tf.string),
    }
    for alias, obs_key in keys["image_keys"].items():
        if obs_key:
            spec[f"steps/observation/{obs_key}"] = tf.io.VarLenFeature(tf.string)
    for sk in float_keys:
        spec[f"steps/observation/{sk}"] = tf.io.VarLenFeature(tf.float32)
    for sub, dt in plan.get("action", {}).items():
        spec[f"steps/action/{sub}"] = tf.io.VarLenFeature(
            getattr(tf, dt.split(":")[0]))
    for sub, dt in plan.get("action_dict", {}).items():
        spec[f"steps/action_dict/{sub}"] = \
            tf.io.VarLenFeature(getattr(tf, dt.split(":")[0]))
    for sk in plan.get("obs_string", []):
        spec[f"steps/observation/{sk}"] = tf.io.VarLenFeature(tf.string)
    for sk in plan.get("obs_int", []):
        spec[f"steps/observation/{sk}"] = tf.io.VarLenFeature(tf.int64)

    parsed = tf.io.parse_single_example(record_bytes, spec)
    out: Dict = {"observation": {}}
    actions = tf.sparse.to_dense(parsed["steps/action"]).numpy()
    t = None
    for alias, obs_key in keys["image_keys"].items():
        if not obs_key:
            continue
        imgs = tf.sparse.to_dense(
            parsed[f"steps/observation/{obs_key}"]).numpy()
        if len(imgs):
            # raw key names under keep_raw_state (standardization transforms
            # address raw keys, e.g. droid's exterior-image swap); aliased
            # names otherwise.
            key = obs_key if keep_raw_state else f"image_{alias}"
            out["observation"][key] = list(imgs)
            t = len(imgs)
    if t is None:
        raise ValueError(f"no image steps parsed for {name}")
    if plan.get("action"):
        # dict action (RT-X-core layout: steps/action/<subkey>); keys marked
        # ":scalar" are per-step scalars the transforms expect 1-D (they add
        # their own [:, None])
        act = {}
        for sub, dt in plan["action"].items():
            arr = tf.sparse.to_dense(parsed[f"steps/action/{sub}"]).numpy()
            act[sub] = arr.reshape(t) if dt.endswith(":scalar") \
                else arr.reshape(t, -1)
        out["action"] = act
    else:
        out["action"] = actions.reshape(t, -1)
    if plan.get("action_dict"):
        out["action_dict"] = {
            sub: tf.sparse.to_dense(
                parsed[f"steps/action_dict/{sub}"]).numpy().reshape(t, -1)
            for sub in plan["action_dict"]}
    for sk in plan.get("obs_string", []):
        arr = tf.sparse.to_dense(parsed[f"steps/observation/{sk}"],
                                 default_value=b"").numpy()
        if len(arr):
            out["observation"][sk] = arr
    for sk in plan.get("obs_int", []):
        arr = tf.sparse.to_dense(parsed[f"steps/observation/{sk}"]).numpy()
        if arr.size:
            out["observation"][sk] = arr.reshape(t, -1)
    lang = tf.sparse.to_dense(parsed["steps/language_instruction"]).numpy()
    out["language_instruction"] = lang[0] if len(lang) else b""
    if keep_raw_state:
        for sk in float_keys:
            arr = tf.sparse.to_dense(parsed[f"steps/observation/{sk}"]).numpy()
            if arr.size:
                out["observation"][sk] = arr.reshape(t, -1)
    else:
        states = []
        for sk in keys["state_keys"]:
            if sk in non_float:  # string/int features never join proprio raw
                continue
            arr = tf.sparse.to_dense(
                parsed[f"steps/observation/{sk}"]).numpy()
            if arr.size:
                states.append(arr.reshape(t, -1))
        if states:
            out["observation"]["proprio"] = np.concatenate(states, axis=1)
    return out


def iterate_tfds_episodes(root: str, name: str, platform: PlatformSpec,
                          split: str = "train",
                          shuffle_seed: Optional[int] = None,
                          repeat: bool = False,
                          keep_raw_state: bool = False) -> Iterator[Dict]:
    """Yield numpy episode dicts from a TFDS RLDS dataset dir."""
    import tensorflow as tf

    files = find_tfds_files(root, name, split)
    if not files:
        raise FileNotFoundError(
            f"no TFDS shards for {name!r} ({split}) under {root}")
    while True:
        order = list(files)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        ds = tf.data.TFRecordDataset(order)
        for rec in ds:
            yield parse_tfds_episode(rec, name, platform,
                                     keep_raw_state=keep_raw_state)
        if not repeat:
            return


def _assemble_proprio(obs: Dict, name: str, t: int) -> Optional[np.ndarray]:
    """Concatenate the registry's state_obs_keys into the proprio vector,
    zero-padding None entries (reference rlds/dataset.py obs remapping).

    Shared by the tfds conversion and the standardize path
    (pipeline._standardize_episode_np) — keep the single copy. Columns are
    sliced to `t` so truncating transforms (bridge relabel) stay aligned.
    Returns obs["proprio"] (or None) when a key is absent or no keys are
    registered."""
    cfg = OXE_DATASET_CONFIGS.get(name)
    if cfg is None or not cfg.state_obs_keys:
        return obs.get("proprio")
    cols = []
    for key in cfg.state_obs_keys:
        if key is None:
            cols.append(np.zeros((t, 1), np.float32))
        elif key in obs:
            cols.append(np.asarray(obs[key], np.float32)[:t].reshape(t, -1))
        else:
            # Registered state key absent after the transform: warn once per
            # (dataset, key) — a silent raw-proprio fallback would mask
            # transform/config key mismatches the reference raises on.
            # (Locally converted native episodes legitimately carry only the
            # pre-assembled proprio, which is why this is not a hard error.)
            if (name, key) not in _WARNED_PROPRIO_KEYS:
                _WARNED_PROPRIO_KEYS.add((name, key))
                import sys

                print(f"[rlds] {name}: state_obs_key {key!r} missing after "
                      f"standardization — falling back to the episode's raw "
                      f"proprio stream", file=sys.stderr)
            return obs.get("proprio")
    return np.concatenate(cols, axis=1)


_WARNED_PROPRIO_KEYS: set = set()


def _lang_str(lang) -> str:
    """Episode instruction as a str: transforms may leave a scalar bytes/str
    or a per-step array (e.g. language_table decodes per-step codepoints)."""
    if isinstance(lang, np.ndarray) and lang.ndim > 0:
        lang = lang[0] if len(lang) else b""
    if isinstance(lang, np.ndarray):
        lang = lang.item()
    return lang.decode() if isinstance(lang, bytes) else str(lang)


def convert_tfds_to_native(root: str, name: str, platform: PlatformSpec,
                           out_dir: str, split: str = "train",
                           max_episodes: Optional[int] = None,
                           standardize: bool = True) -> int:
    """One-time conversion: TFDS RLDS -> this repo's native episode format
    (data/rlds/pipeline.py), after which the full streaming pipeline
    (chunking, normalization, augmentation, interleave) applies.

    With `standardize` (default), the OXE registry transform for `name` runs
    during conversion — actions land on disk already standardized (LIBERO
    gripper clip+invert etc., reference materialize.py:74) and a
    `native_format.json` marker tells the pipeline not to re-apply it.
    """
    from openvla_oft_tpu.data.rlds.oxe import OXE_STANDARDIZATION_TRANSFORMS
    from openvla_oft_tpu.data.rlds.pipeline import write_episode_tfrecords

    fn = None
    if standardize:
        # loud, like the reference materialize: silently converting an
        # unregistered dataset raw would bake non-standard action semantics
        # onto disk
        if name not in OXE_STANDARDIZATION_TRANSFORMS:
            raise KeyError(
                f"no standardization transform registered for {name!r}; "
                f"pass standardize=False to convert raw intentionally")
        fn = OXE_STANDARDIZATION_TRANSFORMS[name]
    episodes = []
    n = 0
    for ep in iterate_tfds_episodes(root, name, platform, split,
                                    keep_raw_state=fn is not None):
        if fn is not None:
            ep = fn(ep)
            # raw image keys -> canonical aliases (post-transform, so e.g.
            # droid's exterior swap is reflected)
            cfg = OXE_DATASET_CONFIGS.get(name)
            obs = ep["observation"]
            for alias, obs_key in (cfg.image_obs_keys if cfg else {}).items():
                if obs_key and obs_key in obs:
                    obs[f"image_{alias}"] = obs.pop(obs_key)
        t = len(ep["action"])
        obs = ep["observation"]
        proprio = _assemble_proprio(obs, name, t)
        native = {
            "images": list(obs["image_primary"])[:t],
            "actions": np.asarray(ep["action"], np.float32),
            "proprio": np.asarray(
                proprio if proprio is not None else
                np.zeros((t, platform.proprio_dim)), np.float32)[:t],
            "language_instruction": _lang_str(ep["language_instruction"]),
        }
        if "image_wrist" in obs:
            native["wrist_images"] = list(obs["image_wrist"])[:t]
        episodes.append(native)
        n += 1
        if max_episodes and n >= max_episodes:
            break
    write_episode_tfrecords(out_dir, episodes)
    with open(os.path.join(out_dir, "native_format.json"), "w") as f:
        json.dump({"standardized": fn is not None,
                   "transform": getattr(fn, "__name__", None)}, f)
    return n
