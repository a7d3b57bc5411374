"""Merge trained LoRA factors into the base model and export a reference-format
checkpoint (reference `vla-scripts/merge_lora_weights_and_save.py:33-73`).

Input: a base HF-format checkpoint dir + an Orbax fine-tune checkpoint from
`vla_scripts/finetune.py` (trainables include the LoRA tree). Output: merged
safetensors checkpoint dir that `load_openvla_checkpoint`/`get_vla` consume.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class MergeConfig:
    base_checkpoint: str = ""        # HF-format base model dir
    finetune_run_dir: str = ""       # run dir holding ckpt/<step>
    step: Optional[int] = None       # default: latest
    output_dir: str = ""             # where to write the merged checkpoint
    lora_rank: int = 32


def merge(cfg: MergeConfig) -> str:
    import jax.numpy as jnp

    from openvla_oft_tpu.training.checkpoint import latest_step, restore_checkpoint
    from openvla_oft_tpu.training.lora import merge_lora_into_params
    from openvla_oft_tpu.utils.hf_import import (
        export_openvla_checkpoint,
        load_openvla_checkpoint,
    )
    import os

    model_cfg, base, norm_stats = load_openvla_checkpoint(cfg.base_checkpoint)
    ckpt_dir = os.path.join(cfg.finetune_run_dir, "ckpt")
    step = cfg.step if cfg.step is not None else latest_step(ckpt_dir)
    assert step is not None, f"no checkpoints in {ckpt_dir}"
    restored = restore_checkpoint(ckpt_dir, step)
    trainables = restored["trainables"]
    merged = merge_lora_into_params(
        base, trainables["lora"], rank=cfg.lora_rank,
        alpha=float(min(cfg.lora_rank, 16)))
    out = cfg.output_dir or os.path.join(cfg.finetune_run_dir,
                                         f"merged--{step}_chkpt")
    # extras_from keeps post-tap tensors (featurizer final norm, SigLIP
    # attn_pool) from the base checkpoint so the merged dir is key-complete
    export_openvla_checkpoint(model_cfg, merged, out, norm_stats=norm_stats,
                              extras_from=cfg.base_checkpoint)
    print(f"[merge] wrote merged checkpoint to {out}")
    return out


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    merge(parse_args(MergeConfig))
