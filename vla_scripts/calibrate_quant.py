"""Quantization calibration CLI: measure int8/int4 accuracy vs bf16.

Produces the written accuracy evidence behind serving int8 by default
(docs/QUANTIZATION.md). Runs on any checkpoint dir or `random:<tiny|7b>`;
with real released weights this is the 5-minute pre-deployment check.

    python vla_scripts/calibrate_quant.py --vla_path random:7b --bits 8
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class CalibrateConfig:
    vla_path: str = "random:7b"
    bits: int = 8
    n_observations: int = 4
    min_dim: int = 1024
    robot_platform: str = "libero"
    out: str = ""                       # optional JSON output path
    seed: int = 0
    low_memory: bool = False            # donate bf16 kernels (7B on 16 GB)
    # comma-separated modules to quantize; int4 deployments quantize the
    # LLM only (vision stays bf16 — see __graft_entry__ int4 config)
    modules: str = "llm,vision_backbone,projector"
    weight_errors: bool = True          # per-layer weight-error pass


def main(cfg: CalibrateConfig) -> dict:
    import os

    import jax

    if os.environ.get("OPENVLA_FORCE_CPU", "0") == "1":
        # axon sitecustomize overrides JAX_PLATFORMS; pin host CPU via
        # jax.config (host-RAM calibration when the chip lacks 13.6 GB
        # free for the bf16 reference pass).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import get_platform
    from openvla_oft_tpu.ops.quant_calibrate import (
        calibrate, random_observations)
    from openvla_oft_tpu.policy import init_openvla_params

    platform = get_platform(cfg.robot_platform)
    if cfg.vla_path.startswith("random:"):
        size = cfg.vla_path.split(":", 1)[1]
        if size == "tiny":
            from openvla_oft_tpu.config import (
                TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP)

            C._VISION_REGISTRY.setdefault("tiny-dual",
                                          (TINY_DINOV2, TINY_SIGLIP))
            C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
            model_cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                                      llm_backbone_id="tiny-llama",
                                      num_images_in_input=2)
            min_dim = 1
        else:
            model_cfg = OpenVLAConfig(num_images_in_input=2)
            min_dim = cfg.min_dim
        params = init_openvla_params(jax.random.PRNGKey(cfg.seed), model_cfg,
                                     platform, dtype=jnp.bfloat16, head="l1",
                                     with_lm_head=False)
    else:
        from openvla_oft_tpu.utils.hf_import import load_openvla_checkpoint

        model_cfg, params, _ = load_openvla_checkpoint(cfg.vla_path,
                                                       dtype=jnp.bfloat16)
        from openvla_oft_tpu.policy import init_openvla_params as _init

        full = _init(jax.random.PRNGKey(0), model_cfg, platform,
                     dtype=jnp.bfloat16, head="l1", with_lm_head=False)
        full.update({k: params[k] for k in params})
        params = full
        min_dim = cfg.min_dim

    obs = random_observations(model_cfg, platform, n=cfg.n_observations,
                              seed=cfg.seed)
    report = calibrate(model_cfg, platform, params, obs, bits=cfg.bits,
                       min_dim=min_dim, low_memory=cfg.low_memory,
                       weight_errors=cfg.weight_errors,
                       quant_modules=tuple(
                           m.strip() for m in cfg.modules.split(",")
                           if m.strip()))
    text = json.dumps(report, indent=2)
    print(text)
    if cfg.out:
        Path(cfg.out).write_text(text)
    return report


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    main(parse_args(CalibrateConfig))
