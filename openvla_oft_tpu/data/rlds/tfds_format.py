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


def tfds_feature_keys(name: str) -> Dict[str, Optional[str]]:
    """Resolve TFDS flat keys from the OXE registry entry."""
    cfg = OXE_DATASET_CONFIGS.get(name)
    image_keys = dict(cfg.image_obs_keys) if cfg else {"primary": "image"}
    state_keys = [k for k in (cfg.state_obs_keys if cfg else ()) if k]
    return {"image_keys": image_keys, "state_keys": state_keys}


def parse_tfds_episode(record_bytes, name: str, platform: PlatformSpec):
    """Parse one TFDS RLDS episode record -> numpy episode dict (eager)."""
    import tensorflow as tf

    keys = tfds_feature_keys(name)
    spec = {
        "steps/action": tf.io.VarLenFeature(tf.float32),
        "steps/language_instruction": tf.io.VarLenFeature(tf.string),
    }
    for alias, obs_key in keys["image_keys"].items():
        if obs_key:
            spec[f"steps/observation/{obs_key}"] = tf.io.VarLenFeature(tf.string)
    for sk in keys["state_keys"]:
        spec[f"steps/observation/{sk}"] = tf.io.VarLenFeature(tf.float32)

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
            out["observation"][f"image_{alias}"] = list(imgs)
            t = len(imgs)
    if t is None:
        raise ValueError(f"no image steps parsed for {name}")
    out["action"] = actions.reshape(t, -1)
    lang = tf.sparse.to_dense(parsed["steps/language_instruction"]).numpy()
    out["language_instruction"] = lang[0] if len(lang) else b""
    states = []
    for sk in keys["state_keys"]:
        arr = tf.sparse.to_dense(parsed[f"steps/observation/{sk}"]).numpy()
        if arr.size:
            states.append(arr.reshape(t, -1))
    if states:
        out["observation"]["proprio"] = np.concatenate(states, axis=1)
    return out


def iterate_tfds_episodes(root: str, name: str, platform: PlatformSpec,
                          split: str = "train",
                          shuffle_seed: Optional[int] = None,
                          repeat: bool = False) -> Iterator[Dict]:
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
            yield parse_tfds_episode(rec, name, platform)
        if not repeat:
            return


def convert_tfds_to_native(root: str, name: str, platform: PlatformSpec,
                           out_dir: str, split: str = "train",
                           max_episodes: Optional[int] = None) -> int:
    """One-time conversion: TFDS RLDS -> this repo's native episode format
    (data/rlds/pipeline.py), after which the full streaming pipeline
    (chunking, normalization, augmentation, interleave) applies."""
    from openvla_oft_tpu.data.rlds.pipeline import write_episode_tfrecords

    episodes = []
    n = 0
    for ep in iterate_tfds_episodes(root, name, platform, split):
        native = {
            "images": ep["observation"]["image_primary"],
            "actions": ep["action"],
            "proprio": ep["observation"].get(
                "proprio", np.zeros((len(ep["action"]),
                                     platform.proprio_dim), np.float32)),
            "language_instruction":
                ep["language_instruction"].decode()
                if isinstance(ep["language_instruction"], bytes)
                else ep["language_instruction"],
        }
        if "image_wrist" in ep["observation"]:
            native["wrist_images"] = ep["observation"]["image_wrist"]
        episodes.append(native)
        n += 1
        if max_episodes and n >= max_episodes:
            break
    write_episode_tfrecords(out_dir, episodes)
    return n
