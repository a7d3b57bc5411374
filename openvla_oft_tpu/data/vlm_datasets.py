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

# Named dataset variants (reference `prismatic/conf/datasets.py:35-113`
# DatasetRegistry): every variant shares the LAION-CC-SBU-558k align stage
# and differs only in the finetune-stage instruct mixture json.
_ALIGN = ("download/llava-laion-cc-sbu-558k/chat.json",
          "download/llava-laion-cc-sbu-558k/")
_INSTRUCT_DIR = "download/llava-v1.5-instruct/"
VLM_DATASET_REGISTRY: Dict[str, Dict[str, tuple]] = {
    "llava-v15": {
        "align": _ALIGN,
        "finetune": (_INSTRUCT_DIR + "llava_v1_5_mix665k.json",
                     _INSTRUCT_DIR)},
    "llava-multimodal": {  # no language-only ShareGPT co-training
        "align": _ALIGN,
        "finetune": (_INSTRUCT_DIR + "llava_v1_5_stripped625k.json",
                     _INSTRUCT_DIR)},
    "llava-lvis4v": {
        "align": _ALIGN,
        "finetune": (_INSTRUCT_DIR + "llava_v1_5_lvis4v_mix888k.json",
                     _INSTRUCT_DIR)},
    "llava-lrv": {
        "align": _ALIGN,
        "finetune": (_INSTRUCT_DIR + "llava_v1_5_lrv_mix1008k.json",
                     _INSTRUCT_DIR)},
    "llava-lvis4v-lrv": {
        "align": _ALIGN,
        "finetune": (_INSTRUCT_DIR + "llava_v1_5_lvis4v_lrv_mix1231k.json",
                     _INSTRUCT_DIR)},
}


def resolve_vlm_dataset(dataset_id: str, stage: str,
                        dataset_root_dir: str) -> tuple:
    """(json_path, image_root) for a named variant + stage, rooted at
    `dataset_root_dir` (reference DatasetConfig.*_stage_components)."""
    if dataset_id not in VLM_DATASET_REGISTRY:
        raise KeyError(f"unknown VLM dataset {dataset_id!r}; known: "
                       f"{sorted(VLM_DATASET_REGISTRY)}")
    rel_json, rel_images = VLM_DATASET_REGISTRY[dataset_id][stage]
    return (os.path.join(dataset_root_dir, rel_json),
            os.path.join(dataset_root_dir, rel_images))


@dataclasses.dataclass
class VLMPretrainDataset:
    json_path: str
    image_root: str
    processor: PrismaticProcessor
    stage: str = "finetune"              # "align" | "finetune"
    llm_backbone_id: str = "llama2-7b-pure"
    shuffle_seed: Optional[int] = 0
    max_length: Optional[int] = 2048     # reference: tokenizer.model_max_length

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
        tokenizer = self.processor.tokenizer
        if self.stage == "align":
            # Reference AlignDataset (datasets.py:49-85): the human prompt is
            # DISCARDED — the model predicts the caption directly from the
            # image: ids = tokenize("{caption}</s>"), labels mask only BOS.
            caption = convs[-1]["value"].replace("<image>", "").strip()
            tok = tokenizer(caption + "</s>", add_special_tokens=True)
            ids = np.asarray(tok["input_ids"], np.int32)
            labels = ids.copy()
            labels[:1] = IGNORE_INDEX
        else:
            # Reference FinetuneDataset (datasets.py:139-160): tokenize TURN
            # BY TURN; every even (human) turn is fully label-masked
            # ([CRITICAL] in the reference) and BOS is masked.
            builder = get_prompt_builder(self.llm_backbone_id)
            id_parts, label_parts = [], []
            for turn_idx, turn in enumerate(convs):
                role = "human" if turn.get("from") in ("human", "user") \
                    else "gpt"
                wrapped = builder.add_turn(role, turn["value"]).rstrip()
                turn_ids = tokenizer(
                    wrapped, add_special_tokens=(turn_idx == 0))["input_ids"]
                id_parts.extend(turn_ids)
                label_parts.extend(
                    [IGNORE_INDEX] * len(turn_ids) if turn_idx % 2 == 0
                    else list(turn_ids))
            ids = np.asarray(id_parts, np.int32)
            labels = np.asarray(label_parts, np.int32)
            labels[:1] = IGNORE_INDEX
        # truncation (reference: tokenizer.model_max_length)
        if self.max_length is not None:
            ids = ids[: self.max_length]
            labels = labels[: self.max_length]

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
