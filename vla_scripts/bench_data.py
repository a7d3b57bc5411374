"""Host data-pipeline throughput: can the RLDS input path feed the chip?

Synthesizes LIBERO-format episode tfrecords (224px JPEG frames, actions,
proprio), then measures the FULL training input path — tf.data decode +
lanczos/aug + RLDSBatchTransform (prompt build, action labels, wrist/proprio)
+ PaddedCollatorForActionPrediction — in frames/s and batches/s at the
fine-tune batch size.

Pass/fail context: the single-chip QLoRA recipe consumes batch 2 / 293 ms
(~7 frames/s) and the 8-chip recipe batch 8 x 8 / step; the pipeline must
sustain a healthy multiple of that per host (reference runs one tf.data
stream per GPU process; ours is per-host, data/rlds/pipeline.py:304-310).

Usage: python vla_scripts/bench_data.py [--episodes 24] [--batches 40]
       [--batch_size 8] [--num_images 2] [--no_aug] [--interleave]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _jpeg(rng, size):
    import tensorflow as tf

    img = rng.integers(0, 255, (size, size, 3), np.uint8)
    return tf.io.encode_jpeg(tf.convert_to_tensor(img)).numpy()


def _write(root: str, name: str, n_episodes: int, rng) -> None:
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.data.rlds.pipeline import write_episode_tfrecords

    episodes = []
    for e in range(n_episodes):
        t = 30 + (e % 7)
        episodes.append({
            "images": [_jpeg(rng, 224) for _ in range(t)],
            "wrist_images": [_jpeg(rng, 224) for _ in range(t)],
            "actions": rng.uniform(-1, 1, (t, LIBERO.action_dim)),
            "proprio": rng.standard_normal((t, LIBERO.proprio_dim)),
            "language_instruction": f"pick up the object and place it {e}",
        })
    write_episode_tfrecords(str(Path(root) / name), episodes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=24)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_images", type=int, default=2, choices=[1, 2, 3])
    ap.add_argument("--no_aug", action="store_true")
    ap.add_argument("--interleave", action="store_true",
                    help="two-dataset weighted mixture instead of one stream")
    ap.add_argument("--sweep", action="store_true",
                    help="frames/s curve over explicit thread budgets "
                         "(read/transform/decode parallelism 1,2,4,AUTOTUNE)")
    args = ap.parse_args()

    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.data.collator import (
        PaddedCollatorForActionPrediction,
        batch_iterator,
    )
    from openvla_oft_tpu.data.datasets import RLDSBatchTransform
    from openvla_oft_tpu.processing.action_tokenizer import ActionTokenizer
    from openvla_oft_tpu.processing.processor import PrismaticProcessor

    rng = np.random.default_rng(0)
    cfg = OpenVLAConfig(vision_backbone_id="dinosiglip-vit-so-224px",
                        llm_backbone_id="llama2-7b-pure",
                        num_images_in_input=args.num_images)
    platform = LIBERO

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        _write(root, "libero_synth_a", args.episodes, rng)
        names = ["libero_synth_a"]
        if args.interleave:
            _write(root, "libero_synth_b", args.episodes, rng)
            names.append("libero_synth_b")
        print(f"# wrote {args.episodes * len(names)} episodes in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        processor = PrismaticProcessor(cfg)
        transform = RLDSBatchTransform(processor, ActionTokenizer(), platform)

        collator_ = PaddedCollatorForActionPrediction(
            pad_token_id=cfg.pad_token_id)

        def measure(dataset) -> float:
            batches = batch_iterator(dataset, args.batch_size, collator_)
            next(batches)  # warmup: graph build + first shuffle fill
            t0 = time.perf_counter()
            n = 0
            for _ in range(args.batches):
                n += next(batches)["input_ids"].shape[0]
            return n / (time.perf_counter() - t0)

        if args.sweep:
            # The reference scales input by running one tf.data stream per
            # GPU process with fixed thread budgets (rlds data_utils.py:
            # 287-321); this sweep publishes the equivalent frames/s-per-
            # thread-budget curve on THIS host so multi-core extrapolation
            # is measured, not assumed (docs/PERFORMANCE.md).
            import os

            from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

            cores = os.cpu_count() or 1
            print(f"# sweep on a {cores}-core host, b={args.batch_size}, "
                  f"images={args.num_images}, aug={not args.no_aug}")
            for par in (1, 2, 4, None):
                dataset, _ = make_rlds_iterator(
                    root, names[0], transform, platform,
                    shuffle_buffer_size=2000, image_aug=not args.no_aug,
                    num_images=args.num_images,
                    read_parallelism=par, transform_parallelism=par,
                    decode_parallelism=par,
                    cycle_length=max(par or 4, 2))
                fps = measure(dataset)
                label = "AUTOTUNE" if par is None else str(par)
                print(f"pipeline[sweep par={label:>8}]: {fps:7.1f} frames/s "
                      f"({fps / cores:.1f} frames/s/core)", flush=True)
            return

        if args.interleave:
            from openvla_oft_tpu.data.rlds.pipeline import (
                make_interleaved_iterator,
            )

            dataset, _ = make_interleaved_iterator(
                root, names, [0.7, 0.3], transform, platform,
                shuffle_buffer_size=2000, image_aug=not args.no_aug,
                num_images=args.num_images)
        else:
            from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

            dataset, _ = make_rlds_iterator(
                root, names[0], transform, platform,
                shuffle_buffer_size=2000, image_aug=not args.no_aug,
                num_images=args.num_images)

        collator = PaddedCollatorForActionPrediction(
            pad_token_id=cfg.pad_token_id)
        batches = batch_iterator(dataset, args.batch_size, collator)

        next(batches)  # warmup: graph build + first shuffle fill
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.batches):
            b = next(batches)
            n += b["input_ids"].shape[0]
        dt = time.perf_counter() - t0
        mode = "interleaved" if args.interleave else "single"
        print(f"pipeline[{mode}, aug={not args.no_aug}, "
              f"images={args.num_images}]: {n / dt:7.1f} frames/s  "
              f"({args.batches / dt:.2f} batches/s at b={args.batch_size})",
              flush=True)


if __name__ == "__main__":
    main()
