"""VLM pretraining datasets: LLaVA-style align / instruct-tune stages
(reference `prismatic/preprocessing/datasets/` + `prismatic/conf/datasets.py`).

Consumes the standard LLaVA JSON format (list of {id, image, conversations})
with an image root directory. Two stages match the reference's pretraining
recipe (`scripts/pretrain.py` align -> finetune):
  - "align":    only the projector trains; example = <image> caption
  - "finetune": multi-turn instruct data through the prompt builder
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from openvla_oft_tpu.constants import IGNORE_INDEX
from openvla_oft_tpu.processing.processor import PrismaticProcessor
from openvla_oft_tpu.processing.prompting import get_prompt_builder


@dataclasses.dataclass
class VLMPretrainDataset:
    json_path: str
    image_root: str
    processor: PrismaticProcessor
    stage: str = "finetune"              # "align" | "finetune"
    llm_backbone_id: str = "llama2-7b-pure"
    shuffle_seed: Optional[int] = 0

    def __post_init__(self):
        with open(self.json_path) as f:
            self.records: List[Dict] = json.load(f)

    def __len__(self) -> int:
        return len(self.records)

    def _load_image(self, rel_path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(os.path.join(self.image_root, rel_path)).convert("RGB")
        return np.asarray(img)

    def _example_from_record(self, rec: Dict) -> Optional[Dict]:
        convs = rec.get("conversations", [])
        if not convs:
            return None
        builder = get_prompt_builder(self.llm_backbone_id)
        if self.stage == "align":
            # caption-only: single gpt turn becomes "<caption></s>" after a
            # fixed captioning prompt (reference align-stage semantics)
            caption = convs[-1]["value"].replace("<image>", "").strip()
            builder.add_turn("human", "Provide a caption for this image.")
            supervised_start = len(builder.get_prompt())
            builder.add_turn("gpt", caption)
        else:
            for turn in convs:
                role = "human" if turn.get("from") in ("human", "user") else "gpt"
                builder.add_turn(role, turn["value"])
            supervised_start = None  # supervise every gpt turn (approx: tail)
        prompt = builder.get_prompt()

        tok = self.processor.tokenizer(prompt, add_special_tokens=True)
        ids = np.asarray(tok["input_ids"], np.int32)
        labels = ids.copy()
        if self.stage == "align" and supervised_start is not None:
            # mask everything before the answer text
            prefix_tok = self.processor.tokenizer(
                prompt[:supervised_start], add_special_tokens=True)
            labels[: len(prefix_tok["input_ids"])] = IGNORE_INDEX
        else:
            labels[:1] = IGNORE_INDEX  # at minimum never supervise BOS

        image = self._load_image(rec["image"]) if "image" in rec else None
        if image is None:
            return None
        pixels = np.asarray(self.processor._transform(image[None]))
        return {"input_ids": ids, "labels": labels, "pixel_values": pixels,
                "dataset_name": "llava"}

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.records))
        if self.shuffle_seed is not None:
            np.random.default_rng(self.shuffle_seed).shuffle(order)
        for idx in order:
            ex = self._example_from_record(self.records[idx])
            if ex is not None:
                yield ex
