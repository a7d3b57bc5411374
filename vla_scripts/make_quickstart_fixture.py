"""Generate `experiments/robot/libero/sample_libero_spatial_observation.pkl`.

The reference ships a recorded LIBERO-Spatial observation driving its README
quickstart (`/root/reference/README.md:55-69`,
`experiments/robot/libero/sample_libero_spatial_observation.pkl`). That pickle
cannot be redistributed from a zero-egress image, so this script synthesizes a
fixture with the SAME schema and geometry — third-person + wrist 256x256x3
uint8 frames (LIBERO's render size), an 8-dim proprio state, and the README's
task string — from the deterministic synthetic scene renderer the trainer
fixtures use. Re-running reproduces the committed bytes (seeded).

    python vla_scripts/make_quickstart_fixture.py
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "experiments" / "robot" / \
    "libero" / "sample_libero_spatial_observation.pkl"


def main() -> None:
    from vla_scripts.make_synthetic_rlds import _task_image

    rng = np.random.default_rng(7)
    obs = {
        "full_image": _task_image(rng, k=2, t=12, T=64, size=256, n_tasks=8),
        "wrist_image": _task_image(rng, k=5, t=12, T=64, size=256, n_tasks=8),
        "state": rng.uniform(-0.5, 0.5, 8).astype(np.float64),
        "task_description":
            "pick up the black bowl between the plate and the ramekin and "
            "place it on the plate",
    }
    with open(OUT, "wb") as f:
        pickle.dump(obs, f)
    print(f"wrote {OUT} ({OUT.stat().st_size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
