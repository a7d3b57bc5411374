"""Checkpoint converters (reference `vla-scripts/extern/
convert_openvla_weights_to_hf.py:83-160` and the reverse).

  import:  reference HF checkpoint dir   -> Orbax pytree checkpoint
  export:  Orbax pytree checkpoint       -> reference HF safetensors dir

Both directions preserve `norm_stats` / `dataset_statistics.json`.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class ConvertConfig:
    direction: str = "import"     # "import" | "export"
    source: str = ""
    output: str = ""
    step: int = 0                 # Orbax step tag


def convert(cfg: ConvertConfig) -> str:
    from openvla_oft_tpu.training.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from openvla_oft_tpu.utils.hf_import import (
        export_openvla_checkpoint,
        load_openvla_checkpoint,
    )

    if cfg.direction == "import":
        import json, os

        model_cfg, params, norm_stats = load_openvla_checkpoint(cfg.source)
        path = save_checkpoint(cfg.output, cfg.step, {"params": params})
        # Orbax trees hold arrays only; architecture ids go in a JSON sidecar.
        os.makedirs(cfg.output, exist_ok=True)
        with open(os.path.join(cfg.output, "meta.json"), "w") as f:
            json.dump({"vision_backbone_id": model_cfg.vision_backbone_id,
                       "llm_backbone_id": model_cfg.llm_backbone_id}, f)
        print(f"[convert] imported HF checkpoint -> {path}")
        if norm_stats:
            with open(os.path.join(cfg.output, "dataset_statistics.json"),
                      "w") as f:
                json.dump(norm_stats, f)
        return path
    if cfg.direction == "export":
        import json, os

        from openvla_oft_tpu.config import OpenVLAConfig

        restored = restore_checkpoint(cfg.source, cfg.step)
        meta = {}
        meta_path = os.path.join(cfg.source, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        model_cfg = OpenVLAConfig(
            vision_backbone_id=str(meta.get("vision_backbone_id",
                                            "dinosiglip-vit-so-224px")),
            llm_backbone_id=str(meta.get("llm_backbone_id", "llama2-7b-pure")))
        stats_path = os.path.join(cfg.source, "dataset_statistics.json")
        norm_stats = None
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                norm_stats = json.load(f)
        out = export_openvla_checkpoint(model_cfg, restored["params"],
                                        cfg.output, norm_stats=norm_stats)
        print(f"[convert] exported -> {out}")
        return out
    raise ValueError(f"unknown direction {cfg.direction!r}")


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    convert(parse_args(ConvertConfig))
