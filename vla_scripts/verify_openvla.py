"""Smoke-test + latency harness for a (converted) OpenVLA checkpoint
(reference `vla-scripts/extern/verify_openvla.py:30-89`: run predict_action
N times on a fixed observation, print per-call latency).

Works with a real checkpoint dir or `random:tiny` / `random:7b` weights.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class VerifyConfig:
    pretrained_checkpoint: str = "random:tiny"
    num_images_in_input: int = 2
    use_proprio: bool = True
    use_l1_regression: bool = True
    num_iterations: int = 20
    instruction: str = "place the bowl on the plate"
    quant: str = ""                      # "" | "int8"


def verify(cfg: VerifyConfig) -> dict:
    import jax.numpy as jnp

    from experiments.robot.openvla_utils import get_vla
    from openvla_oft_tpu.processing.image_processing import (
        prepare_images_for_policy)
    from openvla_oft_tpu.utils.profiling import StepTimer, host_sync

    vla = get_vla(cfg)
    if cfg.quant == "int8":
        from openvla_oft_tpu.ops.quant import quantize_tree

        vla.params["llm"] = quantize_tree(vla.params["llm"], min_dim=1024)

    rng = np.random.default_rng(0)
    images = [(rng.random((224, 224, 3)) * 255).astype(np.uint8)
              for _ in range(cfg.num_images_in_input)]
    pixels = prepare_images_for_policy(images, vla.cfg, center_crop=True)
    proprio = rng.random(vla.platform.proprio_dim).astype(np.float32) \
        if cfg.use_proprio else None

    timer = StepTimer()
    action = None
    for i in range(cfg.num_iterations):
        timer.start()
        action = vla.predict_action(pixels, cfg.instruction, proprio=proprio)
        timer.stop()
        if i == 0:
            print(f"first call (incl. compile): {timer.times[-1]:.2f}s")
            timer.times.clear()
    stats = timer.summary()
    print(f"action chunk shape: {np.asarray(action).shape}")
    print(f"finite: {np.isfinite(action).all()}")
    print("latency:", {k: round(v, 4) for k, v in stats.items()})
    assert np.isfinite(action).all()
    return stats


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    verify(parse_args(VerifyConfig))
