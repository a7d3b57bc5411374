"""Generate a synthetic-but-learnable RLDS dataset in the native episode
TFRecord format (`data/rlds/pipeline.py` spec).

Purpose: drive `vla_scripts/finetune.py` end-to-end through the REAL data
path (TFRecord shards -> tf.data episode pipeline -> frame chunking ->
augmentation -> collator -> DevicePrefetcher) with a dataset whose
action labels are a deterministic function of the observation, so the L1
loss has signal to descend on. This is the in-image stand-in for the
reference's LIBERO RLDS download (`/root/reference/LIBERO.md:60-68`) —
same episode structure (per-step third-person JPEG, 8-dim proprio, 7-dim
action, one instruction per episode), zero egress required.

Learnable structure: K tasks. Task k fixes
  - the language instruction (distinct object/colour words),
  - the image (solid task colour + a moving square whose position encodes
    the step phase, plus pixel noise),
  - the action trajectory: per-dim sinusoids with task-specific amplitude,
    phase and frequency, plus small iid noise (sigma=0.02),
  - proprio: the action integrated over time (cumsum), as on a real robot.
A frozen-random-backbone model can separate the tasks from either modality
(random projections preserve separability), so LoRA + the MLPResNet head
can drive chunk-L1 well below the inter-task spread.

Usage:
    python vla_scripts/make_synthetic_rlds.py \
        --out datasets/synth_rlds --name libero_synth_l1 \
        --episodes 48 --steps 64 --tasks 8 --image-size 256
"""

from __future__ import annotations

import argparse
import io
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OBJECTS = ["black bowl", "red block", "blue mug", "green plate",
           "yellow cup", "white box", "purple ball", "orange spoon"]
TARGETS = ["plate", "basket", "tray", "shelf", "drawer", "stove",
           "rack", "bin"]


def _encode_jpeg(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def _task_image(rng, k: int, t: int, T: int, size: int,
                n_tasks: int) -> np.ndarray:
    """Task-coloured background + a step-phase-encoding square + noise."""
    hue = np.array([(k * 97) % 256, (k * 57 + 60) % 256, (k * 31 + 120) % 256],
                   np.float32)
    img = np.broadcast_to(hue, (size, size, 3)).copy()
    # square sweeps across the image over the episode (phase observability
    # so per-step actions, not just the episode mean, are predictable)
    frac = t / max(T - 1, 1)
    cx = int((0.15 + 0.7 * frac) * size)
    cy = int((0.25 + 0.5 * (k / max(n_tasks - 1, 1))) * size)
    s = size // 8
    img[max(cy - s, 0):cy + s, max(cx - s, 0):cx + s] = 255.0 - hue
    img += rng.normal(0, 8.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _task_actions(rng, k: int, T: int, action_dim: int,
                  noise: float) -> np.ndarray:
    """Smooth per-task sinusoids in [-0.85, 0.85] + iid noise; the gripper
    dim (last) is a task-dependent binary schedule like real LIBERO data."""
    t = np.arange(T, dtype=np.float32)[:, None]
    dim = np.arange(action_dim, dtype=np.float32)[None, :]
    amp = 0.3 + 0.5 * ((k * 13 + dim * 7) % 8) / 8.0
    freq = 2 * np.pi * (1.0 + ((k * 5 + dim * 3) % 4)) / T
    phase = 2 * np.pi * ((k * 11 + dim * 17) % 16) / 16.0
    acts = (amp * np.sin(freq * t + phase)).astype(np.float32)
    acts[:, -1] = ((t[:, 0] / T + k / 8.0) % 1.0 > 0.5).astype(np.float32)
    acts[:, :-1] += rng.normal(0, noise, (T, action_dim - 1)).astype(np.float32)
    return acts


def generate(out: str, name: str, episodes: int, steps: int, tasks: int,
             image_size: int, action_dim: int = 7, proprio_dim: int = 8,
             noise: float = 0.02, seed: int = 0, wrist: bool = False,
             shard_size: int = 64) -> str:
    from openvla_oft_tpu.data.rlds.pipeline import write_episode_tfrecords

    rng = np.random.default_rng(seed)
    eps = []
    for e in range(episodes):
        k = e % tasks
        T = steps + int(rng.integers(0, 8))  # vary episode length a little
        acts = _task_actions(rng, k, T, action_dim, noise)
        proprio = np.zeros((T, proprio_dim), np.float32)
        proprio[:, :action_dim] = np.cumsum(acts, 0) * 0.05
        proprio[:, action_dim:] = acts[:, -1:]  # mirrored gripper state
        images = [_encode_jpeg(_task_image(rng, k, t, T, image_size, tasks))
                  for t in range(T)]
        ep = {
            "images": images,
            "actions": acts,
            "proprio": proprio,
            "language_instruction":
                f"pick up the {OBJECTS[k % len(OBJECTS)]} and place it on "
                f"the {TARGETS[k % len(TARGETS)]}",
        }
        if wrist:
            ep["wrist_images"] = [
                _encode_jpeg(_task_image(rng, (k + 3) % tasks, t, T,
                                         image_size, tasks))
                for t in range(T)]
        eps.append(ep)
    out_dir = str(Path(out) / name)
    write_episode_tfrecords(out_dir, eps, shard_size=shard_size)
    # mark as already-standardized so the pipeline's "auto" hook skips the
    # OXE registry even if the chosen name collides with a registered one
    import json

    with open(Path(out_dir) / "native_format.json", "w") as f:
        json.dump({"standardized": True, "synthetic": True,
                   "episodes": episodes, "tasks": tasks}, f)
    print(f"[make_synthetic_rlds] wrote {episodes} episodes "
          f"({tasks} tasks, ~{steps} steps, {image_size}px) -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/synth_rlds")
    ap.add_argument("--name", default="libero_synth_l1")
    ap.add_argument("--episodes", type=int, default=48)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--tasks", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--wrist", action="store_true")
    a = ap.parse_args()
    generate(a.out, a.name, a.episodes, a.steps, a.tasks, a.image_size,
             noise=a.noise, seed=a.seed, wrist=a.wrist)
