"""Interactive generation REPL (reference `scripts/generate.py`).

Loads an OpenVLA checkpoint and answers prompts about an input image with
greedy KV-cached decoding — the eyeball-check harness for VLM text quality.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class GenerateConfig:
    model_path: str = "random:tiny"
    image_path: Optional[str] = None
    max_new_tokens: int = 64
    prompt_bucket: int = 64


def generate(cfg: GenerateConfig) -> None:
    import jax.numpy as jnp

    from experiments.robot.openvla_utils import get_vla
    from openvla_oft_tpu.models.prismatic import predict_action_autoregressive
    from openvla_oft_tpu.processing.image_processing import (
        prepare_images_for_policy)
    from openvla_oft_tpu.processing.prompting import get_prompt_builder

    class _Cfg:
        pretrained_checkpoint = cfg.model_path
        num_images_in_input = 1
        use_l1_regression = False
        use_diffusion = False
        use_film = False

    vla = get_vla(_Cfg())
    if cfg.image_path:
        from PIL import Image

        img = np.asarray(Image.open(cfg.image_path).convert("RGB"))
    else:
        img = (np.random.rand(224, 224, 3) * 255).astype(np.uint8)
    pixels = jnp.asarray(prepare_images_for_policy([img], vla.cfg,
                                                   center_crop=False))[None]

    print("Interactive generation REPL — Ctrl-D to exit.")
    while True:
        try:
            instruction = input(">>> ")
        except EOFError:
            break
        # Build the prompt with the checkpoint family's VLM prompt builder
        # (reference scripts/generate.py wraps the user message via the
        # prompt builder) — NOT the hardcoded VLA action prompt, so the REPL
        # actually asks the user's question.
        builder = get_prompt_builder(vla.cfg.llm_backbone_id)
        builder.add_turn("human", instruction)
        prompt = builder.get_prompt()
        tok = vla.tokenizer(prompt, add_special_tokens=True)
        raw = np.asarray(tok["input_ids"], np.int32)[: cfg.prompt_bucket]
        ids = np.zeros(cfg.prompt_bucket, np.int32)
        mask = np.zeros(cfg.prompt_bucket, np.int32)
        ids[-len(raw):] = raw   # left-pad into the static bucket
        mask[-len(raw):] = 1
        tokens = predict_action_autoregressive(
            vla.params, vla.cfg, vla.platform, jnp.asarray(ids)[None],
            jnp.asarray(mask)[None], pixels,
            num_new_tokens=cfg.max_new_tokens)
        print(vla.tokenizer.decode(np.asarray(tokens)[0]))


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    generate(parse_args(GenerateConfig))
