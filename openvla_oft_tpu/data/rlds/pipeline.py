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


def _standardize_episode_np(ep_np: Dict, name: str,
                            standardize_fn: Callable,
                            platform: PlatformSpec) -> Dict:
    """Apply an OXE standardization transform to a parsed native episode.

    Builds the RLDS trajectory layout the registry transforms expect
    (action + observation dict with the raw `state` key), applies the
    transform, and reassembles proprio from the registry's `state_obs_keys`
    (None keys pad a zero column — reference rlds/dataset.py obs remap).
    """
    t = len(ep_np["actions"])
    lang = ep_np["language_instruction"]
    # native episodes store one instruction per episode; transforms expect the
    # RLDS per-step layout (so e.g. bridge's first-step truncation slices it)
    lang_steps = np.asarray([lang] * t) if np.ndim(lang) == 0 else lang
    traj = {
        "action": np.asarray(ep_np["actions"], np.float32),
        # images ride through the transform so truncating transforms (bridge
        # drops the first and last steps) keep frames aligned with actions
        "observation": {"state": np.asarray(ep_np["proprio"], np.float32),
                        "proprio": np.asarray(ep_np["proprio"], np.float32),
                        "image_primary": np.asarray(ep_np["images"]),
                        **({"image_wrist": np.asarray(ep_np["wrist_images"])}
                           if "wrist_images" in ep_np else {})},
        "language_instruction": lang_steps,
    }
    out = standardize_fn(traj)
    actions = np.asarray(out["action"], np.float32)
    t_out = len(actions)  # transforms may truncate (bridge relabel)
    obs = out["observation"]
    from openvla_oft_tpu.data.rlds.tfds_format import _assemble_proprio

    proprio = _assemble_proprio(obs, name, t_out)
    if proprio is None:
        proprio = ep_np["proprio"]
    proprio = np.asarray(proprio, np.float32)[:t_out]
    out_lang = out.get("language_instruction", lang_steps)
    result = {
        "images": np.asarray(obs["image_primary"])[:t_out],
        "actions": actions,
        "proprio": proprio,
        # back to one instruction per episode for the native frame layout
        "language_instruction": out_lang[0] if np.ndim(out_lang) else out_lang,
    }
    if "image_wrist" in obs:
        result["wrist_images"] = np.asarray(obs["image_wrist"])[:t_out]
    return result


def _resolve_standardize_fn(root: str, name: str, standardize_fn):
    """Resolve the "auto" standardize sentinel against the OXE registry,
    skipping datasets already standardized at conversion time
    (tfds_format.convert_tfds_to_native writes a native_format.json marker)."""
    if standardize_fn != "auto":
        return standardize_fn
    marker = os.path.join(root, name, "native_format.json")
    if os.path.exists(marker):
        import json

        with open(marker) as f:
            if json.load(f).get("standardized"):
                return None
    from openvla_oft_tpu.data.rlds.oxe import OXE_STANDARDIZATION_TRANSFORMS

    return OXE_STANDARDIZATION_TRANSFORMS.get(name)


def compute_stats_from_tfrecords(root: str, name: str, platform: PlatformSpec,
                                 max_episodes: int = 1000,
                                 standardize_fn: Optional[Callable] = None,
                                 has_wrist: bool = False) -> Dict:
    """Normalization statistics over the *standardized* action/proprio stream
    (stats computed on raw actions would mis-normalize transformed ones)."""
    tf = _tf()
    files = sorted(glob.glob(os.path.join(root, name, "*.tfrecord*")))
    assert files, f"no tfrecords under {os.path.join(root, name)}"
    ds = tf.data.TFRecordDataset(files)
    acts, props, n_ep = [], [], 0
    for rec in ds.take(max_episodes):
        ep = _parse_episode(rec, platform, has_wrist=has_wrist)
        ep_np = {"images": ep["images"].numpy(),
                 "actions": ep["actions"].numpy(),
                 "proprio": ep["proprio"].numpy(),
                 "language_instruction": ep["language_instruction"].numpy()}
        if has_wrist:
            ep_np["wrist_images"] = ep["wrist_images"].numpy()
        if standardize_fn is not None:
            ep_np = _standardize_episode_np(ep_np, name, standardize_fn,
                                            platform)
        acts.append(np.asarray(ep_np["actions"]))
        if len(np.asarray(ep_np["proprio"])):
            props.append(np.asarray(ep_np["proprio"]))
        n_ep += 1
    actions = np.concatenate(acts)
    proprios = np.concatenate(props) if props else None
    stats = compute_dataset_statistics(actions, proprios,
                                       num_trajectories=n_ep)
    if standardize_fn is not None:
        stats["transform"] = getattr(standardize_fn, "__name__", "custom")
    # Exempt absolute action dims (the 0/1 gripper) from normalization —
    # reference rlds/dataset.py:229-235 stores the registry's
    # action_normalization_mask in stats["action"]["mask"]; without it the
    # binarized gripper would be Q99-mapped to {-1,+1}. Registered datasets
    # only (like the reference): unregistered local data may not follow the
    # encoding's gripper convention and normalizes fully.
    from openvla_oft_tpu.data.rlds.oxe.materialize import (
        dataset_action_normalization_mask)

    mask = dataset_action_normalization_mask(name)
    if mask is not None and len(mask) == len(stats["action"]["min"]):
        stats["action"]["mask"] = mask
    return stats


def _threads(n: Optional[int]):
    """None -> AUTOTUNE, else an explicit thread count (the reference's
    traj_transform_threads / traj_read_threads per-dataset budgeting,
    rlds/dataset.py:529-533)."""
    tf = _tf()
    return tf.data.AUTOTUNE if n is None else max(int(n), 1)


def _build_encoded_frame_dataset(
    root: str,
    name: str,
    platform: PlatformSpec,
    train: bool = True,
    seed: int = 0,
    standardize_fn="auto",
    num_images: int = 1,
    goal_relabeling_strategy: Optional[str] = None,
    read_parallelism: Optional[int] = None,      # TFRecord reader threads
    transform_parallelism: Optional[int] = None,  # episode->frames workers
    cycle_length: int = 4,                        # episodes interleaved
):
    """Per-dataset tf.data graph up to (and including) frame chunking, with
    images still JPEG-encoded — the shared building block for the single
    dataset iterator and the mixed `sample_from_datasets` graph. Shuffling
    encoded frames keeps the mixture shuffle buffer ~50x smaller in memory
    than the decoded frames the reference buffers (rlds/dataset.py:544)."""
    tf = _tf()
    standardize_fn = _resolve_standardize_fn(root, name, standardize_fn)
    fn_name = getattr(standardize_fn, "__name__", "custom") \
        if standardize_fn else None
    stats_path = os.path.join(root, name, "dataset_statistics.json")
    stats = None
    if os.path.exists(stats_path):
        stats = load_dataset_statistics(stats_path)
        if stats.get("transform") != fn_name:
            stats = None  # stale: computed under a different standardization
    if stats is None:
        stats = compute_stats_from_tfrecords(root, name, platform,
                                             standardize_fn=standardize_fn)
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
        print(f"[rlds] process {proc}/{n_proc} reads {len(files)} of the "
              f"episode shards for {name}")
    ds = tf.data.TFRecordDataset(files,
                                 num_parallel_reads=_threads(read_parallelism))
    if train:
        ds = ds.repeat().shuffle(min(64, max(len(files) * 4, 8)),
                                 seed=seed + proc)

    has_wrist = num_images > 1
    if standardize_fn is not None:
        # OXE standardization transforms are NumPy functions
        # (data/rlds/oxe/transforms.py) — they cannot trace inside the
        # tf.data graph, so route each episode through an eager py_function
        # before the graph-mode frame transforms. Wrist images ride along.
        def standardize_record(record):
            def eager(rec):
                ep = _parse_episode(rec, platform, has_wrist=has_wrist)
                ep_np = {k: v.numpy() for k, v in ep.items()}
                out = _standardize_episode_np(ep_np, name, standardize_fn,
                                              platform)
                rets = [tf.constant(out["images"]),
                        tf.constant(np.asarray(out["actions"], np.float32)),
                        tf.constant(np.asarray(out["proprio"], np.float32)),
                        tf.constant(out["language_instruction"])]
                if has_wrist:
                    rets.append(tf.constant(out["wrist_images"]))
                return rets

            sig = [tf.string, tf.float32, tf.float32, tf.string] + \
                ([tf.string] if has_wrist else [])
            parts = tf.py_function(eager, [record], sig)
            ep = {"images": parts[0], "actions": parts[1],
                  "proprio": parts[2], "language_instruction": parts[3]}
            if has_wrist:
                ep["wrist_images"] = parts[4]
            return ep

        ds = ds.map(standardize_record)

    def to_frames(ep_or_record):
        if standardize_fn is not None:
            ep = ep_or_record
            ep["actions"].set_shape([None, platform.action_dim])
            ep["proprio"].set_shape([None, platform.proprio_dim])
        else:
            ep = _parse_episode(ep_or_record, platform, has_wrist=has_wrist)
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
            "dataset_name": tf.fill([eff], name),
        }
        if has_wrist:
            frames["image_wrist"] = ep["wrist_images"][:eff]
        if goal_relabeling_strategy == "uniform":
            # hindsight goal: t' ~ Uniform[t, T) per frame (reference
            # goal_relabeling.py "uniform"); kept JPEG-encoded.
            u = tf.random.stateless_uniform(
                [eff], seed=tf.stack([
                    tf.constant(seed, tf.int64),
                    tf.strings.to_hash_bucket_fast(
                        ep["language_instruction"], 2 ** 30)]))
            lo = tf.range(eff)
            goal_idx = lo + tf.cast(
                u * tf.cast(t - lo, tf.float32), tf.int32)
            goal_idx = tf.minimum(goal_idx, t - 1)
            frames["goal_image"] = tf.gather(ep["images"], goal_idx)
        elif goal_relabeling_strategy is not None:
            raise ValueError(
                f"unknown goal_relabeling_strategy {goal_relabeling_strategy!r}")
        proprio = ep["proprio"]
        if stats.get("proprio"):
            proprio = _normalize_tf(proprio, stats["proprio"], norm_type)
        frames["proprio"] = proprio[:eff]
        return tf.data.Dataset.from_tensor_slices(frames)

    ds = ds.interleave(to_frames, cycle_length=cycle_length,
                       num_parallel_calls=_threads(transform_parallelism))
    return ds, stats


def _decode_and_augment(ds, image_aug: bool, train: bool,
                        task_augment_prob: float,
                        decode_parallelism: Optional[int] = None):
    """JPEG decode + seeded augmentation over a (possibly mixed) frame
    stream. Runs AFTER the shuffle buffer so the buffer holds encoded bytes."""
    tf = _tf()

    def decode(frame):
        # per-frame seed from language + action content (deterministic given
        # the episode), offset per image key so each camera augments
        # differently (reference obs_transforms.py:27-40 `seed + i`).
        seed_t = tf.cast(tf.stack([
            tf.strings.to_hash_bucket_fast(frame["language_instruction"],
                                           2 ** 30),
            tf.cast(tf.reduce_sum(tf.cast(
                frame["action_chunk"] * 1e4, tf.int64)) % (2 ** 30),
                tf.int64)]), tf.int32)
        img = tf.io.decode_jpeg(frame["image_primary"], channels=3)
        if image_aug and train:
            img = _augment_image(img, seed_t)
        frame["image_primary"] = img
        if "image_wrist" in frame:
            wrist = tf.io.decode_jpeg(frame["image_wrist"], channels=3)
            if image_aug and train:
                wrist = _augment_image(wrist, seed_t + tf.constant([16, 0]))
            frame["image_wrist"] = wrist
        if task_augment_prob > 0 and train and "goal_image" in frame:
            # modality dropout (reference task_augmentation.py
            # `delete_task_conditioning`): keep image-goal XOR language.
            u = tf.random.stateless_uniform([2], seed=seed_t + [32, 0])

            def drop_lang():
                return (tf.constant(b""), frame["goal_image"])

            def drop_goal():
                return (frame["language_instruction"], tf.constant(b""))

            lang, goal = tf.cond(
                u[0] < task_augment_prob,
                lambda: tf.cond(u[1] < 0.5, drop_lang, drop_goal),
                lambda: (frame["language_instruction"], frame["goal_image"]))
            frame["language_instruction"], frame["goal_image"] = lang, goal
        return frame

    ds = ds.map(decode, num_parallel_calls=_threads(decode_parallelism))
    return ds.prefetch(tf.data.AUTOTUNE)


def _wrap_frame_iterator(ds, batch_transform):
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
                "task": {"language_instruction": frame["language_instruction"],
                         **({"image_primary": frame["goal_image"]}
                            if "goal_image" in frame else {})},
                "action": frame["action_chunk"],
                "dataset_name": frame["dataset_name"].decode()
                if isinstance(frame["dataset_name"], bytes)
                else str(frame["dataset_name"]),
            }
            yield batch_transform(rlds_batch)

    return iterator()


def make_rlds_iterator(
    root: str,
    name: str,
    batch_transform,
    platform: PlatformSpec,
    shuffle_buffer_size: int = 10_000,
    image_aug: bool = True,
    train: bool = True,
    seed: int = 0,
    standardize_fn="auto",
    num_images: int = 1,
    goal_relabeling_strategy: Optional[str] = None,
    task_augment_prob: float = 0.0,
    read_parallelism: Optional[int] = None,
    transform_parallelism: Optional[int] = None,
    decode_parallelism: Optional[int] = None,
    cycle_length: int = 4,
) -> Tuple[Iterator[Dict[str, np.ndarray]], Dict]:
    """Build the frame iterator + dataset statistics for one dataset.

    Yields numpy frame dicts through `batch_transform` (RLDSBatchTransform).

    `standardize_fn="auto"` wires the OXE registry transform for `name`
    (reference `make_oxe_dataset_kwargs`, materialize.py:74) unless the data
    was already standardized at conversion time; pass None to disable.
    `goal_relabeling_strategy="uniform"` attaches a uniformly-sampled future
    frame as the goal (reference datasets.py:143 + goal_relabeling.py) — the
    goal image stays JPEG-encoded in the task dict. Documented divergence:
    the reference defaults to "uniform", but the OFT objectives never consume
    the goal, and buffering a second encoded frame per element roughly
    doubles shuffle-buffer memory — so the default here is None (opt in for
    goal-conditioned recipes; behavior is tested either way).
    `task_augment_prob` > 0 enables image-or-language modality dropout
    (reference task_augmentation.py), applied to goal-relabeled frames.
    """
    ds, stats = _build_encoded_frame_dataset(
        root, name, platform, train=train, seed=seed,
        standardize_fn=standardize_fn, num_images=num_images,
        goal_relabeling_strategy=goal_relabeling_strategy,
        read_parallelism=read_parallelism,
        transform_parallelism=transform_parallelism,
        cycle_length=cycle_length)
    if train:
        ds = ds.shuffle(shuffle_buffer_size, seed=seed)
    ds = _decode_and_augment(ds, image_aug, train, task_augment_prob,
                             decode_parallelism=decode_parallelism)
    return _wrap_frame_iterator(ds, batch_transform), {name: stats}


def make_interleaved_iterator(
    root: str,
    names: List[str],
    weights: List[float],
    batch_transform,
    platform: PlatformSpec,
    shuffle_buffer_size: int = 10_000,
    image_aug: bool = True,
    train: bool = True,
    seed: int = 0,
    balance_weights: bool = False,
    **kwargs,
) -> Tuple[Iterator[Dict[str, np.ndarray]], Dict]:
    """Weighted mixture over datasets as ONE tf.data graph (reference
    `make_interleaved_dataset`, rlds/dataset.py:458-589).

    Per-dataset frame graphs feed `tf.data.Dataset.sample_from_datasets`
    with parallel readers per member, then one shared shuffle buffer over
    *encoded* frames and one decode/augment stage. `balance_weights`
    multiplies each weight by the dataset's transition count (reference
    dataset.py:508-513). Thread budgeting: AUTOTUNE by default, with the
    reference's explicit per-stage budgets (data_utils.py:287-321) exposed
    as read_parallelism / transform_parallelism / decode_parallelism /
    cycle_length kwargs (forwarded per member dataset).

    Falls back to host-side weighted round-robin over separate graphs when
    member frame structures differ (e.g. mixing 1- and 2-camera datasets).
    """
    tf = _tf()
    task_augment_prob = kwargs.pop("task_augment_prob", 0.0)
    decode_parallelism = kwargs.pop("decode_parallelism", None)
    builders, all_stats = [], {}
    for i, name in enumerate(names):
        ds, stats = _build_encoded_frame_dataset(
            root, name, platform, train=train, seed=seed + i, **kwargs)
        builders.append(ds)
        all_stats[name] = stats

    w = np.asarray(weights, np.float64)
    if balance_weights:
        sizes = np.asarray([all_stats[n].get("num_transitions", 1)
                            for n in names], np.float64)
        w = w * sizes
    w = w / w.sum()

    specs = [ds.element_spec for ds in builders]
    if all(spec == specs[0] for spec in specs[1:]):
        mixed = tf.data.Dataset.sample_from_datasets(
            builders, weights=list(w), seed=seed,
            stop_on_empty_dataset=False)
        if train:
            mixed = mixed.shuffle(shuffle_buffer_size, seed=seed)
        mixed = _decode_and_augment(mixed, image_aug, train,
                                    task_augment_prob,
                                    decode_parallelism=decode_parallelism)
        return _wrap_frame_iterator(mixed, batch_transform), all_stats

    # structure mismatch: decode each member separately, mix on host
    its = []
    for ds in builders:
        if train:
            ds = ds.shuffle(max(shuffle_buffer_size // len(builders), 1),
                            seed=seed)
        ds = _decode_and_augment(ds, image_aug, train, task_augment_prob,
                                 decode_parallelism=decode_parallelism)
        its.append(_wrap_frame_iterator(ds, batch_transform))
    rng = np.random.default_rng(seed)

    def mixed_host():
        while True:
            yield next(its[rng.choice(len(its), p=w)])

    return mixed_host(), all_stats
