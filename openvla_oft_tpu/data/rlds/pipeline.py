"""RLDS trajectory pipeline on tf.data (host side, feeding the TPU loop).

TPU-native counterpart of `prismatic/vla/datasets/rlds/dataset.py:40-589`
(`make_dataset_from_rlds` -> `apply_trajectory_transforms` ->
`apply_frame_transforms` -> `make_interleaved_dataset`), built directly on
tf.data's C++ runtime without the tfds/dlimp dependencies:

  - episodes come from TFRecord shards (`<root>/<name>/*.tfrecord*`) holding
    one serialized episode per record (spec below) — `tensorflow_datasets`
    builders plug in via `episodes_from_tfds` when that package exists,
  - per-dataset standardization hooks mirror the OXE transform registry,
  - trajectory transforms: action chunking with floored/capped indices
    (traj_transforms.py:14-58), normalization (bounds/q99, masked and
    degenerate dims — data_utils.py:97-153),
  - frame transforms: JPEG decode, optional random_resized_crop(0.9) +
    color jitter augmentation (rlds/obs_transforms.py + datasets.py:159-173),
  - weighted interleave over multiple datasets + shuffle buffer.

Native episode record format (tf.train.Example):
  steps/observation/image_primary : bytes list (JPEG per step)
  steps/observation/wrist_image   : bytes list (optional)
  steps/observation/proprio       : float list (T * proprio_dim)
  steps/action                    : float list (T * action_dim)
  language_instruction            : bytes
"""

from __future__ import annotations

import glob
import os
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from openvla_oft_tpu.constants import NormalizationType, PlatformSpec
from openvla_oft_tpu.data.transforms import (
    compute_dataset_statistics,
    load_dataset_statistics,
    save_dataset_statistics,
)


def _tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")  # keep TF off accelerators
    return tf


def episode_feature_spec(action_dim: int, proprio_dim: int, has_wrist: bool):
    tf = _tf()
    spec = {
        "steps/observation/image_primary": tf.io.VarLenFeature(tf.string),
        "steps/action": tf.io.VarLenFeature(tf.float32),
        "steps/observation/proprio": tf.io.VarLenFeature(tf.float32),
        "language_instruction": tf.io.FixedLenFeature([], tf.string),
    }
    if has_wrist:
        spec["steps/observation/wrist_image"] = tf.io.VarLenFeature(tf.string)
    return spec


def write_episode_tfrecords(out_dir: str, episodes: List[Dict[str, Any]],
                            shard_size: int = 64) -> List[str]:
    """Write native-format episode shards (used by tests and converters)."""
    tf = _tf()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for si in range(0, len(episodes), shard_size):
        path = os.path.join(out_dir, f"episodes-{si // shard_size:05d}.tfrecord")
        with tf.io.TFRecordWriter(path) as w:
            for ep in episodes[si:si + shard_size]:
                feats = {
                    "steps/observation/image_primary": tf.train.Feature(
                        bytes_list=tf.train.BytesList(
                            value=ep["images"])),
                    "steps/action": tf.train.Feature(
                        float_list=tf.train.FloatList(
                            value=np.asarray(ep["actions"], np.float32)
                            .reshape(-1))),
                    "steps/observation/proprio": tf.train.Feature(
                        float_list=tf.train.FloatList(
                            value=np.asarray(ep.get("proprio", []), np.float32)
                            .reshape(-1))),
                    "language_instruction": tf.train.Feature(
                        bytes_list=tf.train.BytesList(
                            value=[ep["language_instruction"].encode()])),
                }
                if "wrist_images" in ep:
                    feats["steps/observation/wrist_image"] = tf.train.Feature(
                        bytes_list=tf.train.BytesList(value=ep["wrist_images"]))
                w.write(tf.train.Example(
                    features=tf.train.Features(feature=feats))
                    .SerializeToString())
        paths.append(path)
    return paths


def _parse_episode(record, platform: PlatformSpec, has_wrist: bool):
    tf = _tf()
    parsed = tf.io.parse_single_example(
        record, episode_feature_spec(platform.action_dim, platform.proprio_dim,
                                     has_wrist))
    images = tf.sparse.to_dense(parsed["steps/observation/image_primary"])
    actions = tf.reshape(tf.sparse.to_dense(parsed["steps/action"]),
                         [-1, platform.action_dim])
    proprio = tf.reshape(tf.sparse.to_dense(parsed["steps/observation/proprio"]),
                         [-1, platform.proprio_dim])
    ep = {"images": images, "actions": actions, "proprio": proprio,
          "language_instruction": parsed["language_instruction"]}
    if has_wrist:
        ep["wrist_images"] = tf.sparse.to_dense(
            parsed["steps/observation/wrist_image"])
    return ep


def _normalize_tf(x, metadata: Dict, norm_type: NormalizationType):
    tf = _tf()
    mask = tf.constant(np.asarray(
        metadata.get("mask", np.ones_like(metadata["min"], bool)), bool))
    if norm_type == NormalizationType.BOUNDS:
        low = tf.constant(metadata["min"], tf.float32)
        high = tf.constant(metadata["max"], tf.float32)
    else:
        low = tf.constant(metadata["q01"], tf.float32)
        high = tf.constant(metadata["q99"], tf.float32)
    out = tf.where(mask, tf.clip_by_value(
        2 * (x - low) / (high - low + 1e-8) - 1, -1, 1), x)
    zeros = tf.constant(np.asarray(metadata["min"]) == np.asarray(metadata["max"]))
    return tf.where(zeros, tf.zeros_like(out), out)


def _augment_image(img, seed):
    """random_resized_crop(scale=[0.9, 0.9], ratio=1) + color jitter
    (reference aug kwargs, datasets.py:159-173)."""
    tf = _tf()
    shape = tf.shape(img)
    h = tf.cast(shape[0], tf.float32)
    w = tf.cast(shape[1], tf.float32)
    ch = tf.cast(h * 0.94868, tf.int32)  # sqrt(0.9)
    cw = tf.cast(w * 0.94868, tf.int32)
    img = tf.image.stateless_random_crop(img, [ch, cw, 3], seed=seed)
    img = tf.image.resize(img, [shape[0], shape[1]], method="lanczos3",
                          antialias=True)
    img = tf.cast(tf.clip_by_value(tf.round(img), 0, 255), tf.uint8)
    s2 = tf.stack([seed[0] + 1, seed[1]])
    img = tf.image.stateless_random_brightness(img, 0.2, seed=s2)
    s3 = tf.stack([seed[0] + 2, seed[1]])
    img = tf.image.stateless_random_contrast(img, 0.8, 1.2, seed=s3)
    s4 = tf.stack([seed[0] + 3, seed[1]])
    img = tf.image.stateless_random_saturation(img, 0.8, 1.2, seed=s4)
    s5 = tf.stack([seed[0] + 4, seed[1]])
    img = tf.image.stateless_random_hue(img, 0.05, seed=s5)
    return img


def compute_stats_from_tfrecords(root: str, name: str, platform: PlatformSpec,
                                 max_episodes: int = 1000) -> Dict:
    tf = _tf()
    files = sorted(glob.glob(os.path.join(root, name, "*.tfrecord*")))
    assert files, f"no tfrecords under {os.path.join(root, name)}"
    ds = tf.data.TFRecordDataset(files)
    acts, props, n_ep = [], [], 0
    for rec in ds.take(max_episodes):
        ep = _parse_episode(rec, platform, has_wrist=False)
        acts.append(ep["actions"].numpy())
        if ep["proprio"].shape[0]:
            props.append(ep["proprio"].numpy())
        n_ep += 1
    actions = np.concatenate(acts)
    proprios = np.concatenate(props) if props else None
    return compute_dataset_statistics(actions, proprios, num_trajectories=n_ep)


def make_rlds_iterator(
    root: str,
    name: str,
    batch_transform,
    platform: PlatformSpec,
    shuffle_buffer_size: int = 10_000,
    image_aug: bool = True,
    train: bool = True,
    seed: int = 0,
    standardize_fn: Optional[Callable] = None,
    num_images: int = 1,
) -> Tuple[Iterator[Dict[str, np.ndarray]], Dict]:
    """Build the frame iterator + dataset statistics for one dataset.

    Yields numpy frame dicts through `batch_transform` (RLDSBatchTransform).
    """
    tf = _tf()
    stats_path = os.path.join(root, name, "dataset_statistics.json")
    if os.path.exists(stats_path):
        stats = load_dataset_statistics(stats_path)
    else:
        stats = compute_stats_from_tfrecords(root, name, platform)
        save_dataset_statistics(stats, os.path.join(root, name))
    norm_type = platform.norm_type
    future = platform.num_actions_chunk - 1

    files = sorted(glob.glob(os.path.join(root, name, "*.tfrecord*")))
    # Multi-host feeding: each JAX process reads a disjoint shard of episode
    # files (the reference runs one stream per GPU process; here streams
    # partition deterministically across TPU hosts — SURVEY.md §7).
    try:
        import jax

        n_proc, proc = jax.process_count(), jax.process_index()
    except Exception:
        n_proc, proc = 1, 0
    if n_proc > 1 and len(files) >= n_proc:
        files = files[proc::n_proc]
    ds = tf.data.TFRecordDataset(files, num_parallel_reads=tf.data.AUTOTUNE)
    if train:
        ds = ds.repeat().shuffle(min(64, max(len(files) * 4, 8)),
                                 seed=seed + proc)

    if standardize_fn is not None:
        # OXE standardization transforms are NumPy functions (data/rlds/oxe.py)
        # — they cannot trace inside the tf.data graph, so route each episode
        # through an eager py_function before the graph-mode frame transforms.
        def standardize_record(record):
            def eager(rec):
                ep = _parse_episode(rec, platform, has_wrist=False)
                ep_np = {"images": ep["images"].numpy(),
                         "actions": ep["actions"].numpy(),
                         "observation": {"proprio": ep["proprio"].numpy(),
                                         "state": ep["proprio"].numpy()},
                         "language_instruction":
                             ep["language_instruction"].numpy()}
                ep_np["action"] = ep_np["actions"]
                out = standardize_fn(ep_np)
                return (tf.constant(out["images"]),
                        tf.constant(np.asarray(out.get("action",
                                                       out["actions"]),
                                               np.float32)),
                        tf.constant(np.asarray(
                            out["observation"]["proprio"], np.float32)),
                        tf.constant(out["language_instruction"]))

            images, actions, proprio, lang = tf.py_function(
                eager, [record],
                [tf.string, tf.float32, tf.float32, tf.string])
            return {"images": images, "actions": actions, "proprio": proprio,
                    "language_instruction": lang}

        ds = ds.map(standardize_record)

    def to_frames(ep_or_record):
        if standardize_fn is not None:
            ep = ep_or_record
            ep["actions"].set_shape([None, platform.action_dim])
            ep["proprio"].set_shape([None, platform.proprio_dim])
        else:
            ep = _parse_episode(ep_or_record, platform,
                                has_wrist=(num_images > 1))
        actions = _normalize_tf(ep["actions"], stats["action"], norm_type)
        t = tf.shape(actions)[0]
        eff = t - future
        # chunk indices: current + future, capped at the last frame
        # (traj_transforms.py:41-44)
        idx = tf.range(eff)[:, None] + tf.range(future + 1)[None, :]
        idx = tf.minimum(idx, t - 1)
        chunks = tf.gather(actions, idx)               # (eff, chunk, dim)
        frames = {
            "image_primary": ep["images"][:eff],
            "action_chunk": chunks,
            "language_instruction": tf.repeat(ep["language_instruction"][None],
                                              eff),
        }
        if num_images > 1:
            frames["image_wrist"] = ep["wrist_images"][:eff]
        proprio = ep["proprio"]
        if stats.get("proprio"):
            proprio = _normalize_tf(proprio, stats["proprio"], norm_type)
        frames["proprio"] = proprio[:eff]
        return tf.data.Dataset.from_tensor_slices(frames)

    ds = ds.interleave(to_frames, cycle_length=4, num_parallel_calls=tf.data.AUTOTUNE)
    if train:
        ds = ds.shuffle(shuffle_buffer_size, seed=seed)

    def decode(frame):
        img = tf.io.decode_jpeg(frame["image_primary"], channels=3)
        if "image_wrist" in frame:
            # wrist camera: decode only — the reference augments only via the
            # shared seeded transform on non-padding images; wrist follows the
            # primary frame's crop at eval, raw at train (obs_transforms.py)
            frame["image_wrist"] = tf.io.decode_jpeg(frame["image_wrist"],
                                                     channels=3)
        if image_aug and train:
            seed_t = tf.stack([
                tf.strings.to_hash_bucket_fast(frame["language_instruction"],
                                               2 ** 30),
                tf.cast(tf.reduce_sum(tf.cast(
                    frame["action_chunk"] * 1e4, tf.int64)) % (2 ** 30),
                    tf.int64)])
            img = _augment_image(img, tf.cast(seed_t, tf.int32))
        frame["image_primary"] = img
        return frame

    ds = ds.map(decode, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.prefetch(tf.data.AUTOTUNE)

    def iterator():
        for frame in ds.as_numpy_iterator():
            rlds_batch = {
                "observation": {
                    "image_primary": frame["image_primary"],
                    **({"image_wrist": frame["image_wrist"]}
                       if "image_wrist" in frame else {}),
                    **({"proprio": frame["proprio"]} if "proprio" in frame
                       else {}),
                },
                "task": {"language_instruction": frame["language_instruction"]},
                "action": frame["action_chunk"],
                "dataset_name": name,
            }
            yield batch_transform(rlds_batch)

    return iterator(), {name: stats}


def make_interleaved_iterator(
    root: str,
    names: List[str],
    weights: List[float],
    batch_transform,
    platform: PlatformSpec,
    **kwargs,
) -> Tuple[Iterator[Dict[str, np.ndarray]], Dict]:
    """Weighted mixture over datasets (reference `make_interleaved_dataset`,
    rlds/dataset.py:458-589)."""
    its, all_stats = [], {}
    for name in names:
        it, stats = make_rlds_iterator(root, name, batch_transform, platform,
                                       **kwargs)
        its.append(it)
        all_stats.update(stats)
    w = np.asarray(weights, np.float64)
    w = w / w.sum()
    rng = np.random.default_rng(kwargs.get("seed", 0))

    def mixed():
        while True:
            yield next(its[rng.choice(len(its), p=w)])

    return mixed(), all_stats
