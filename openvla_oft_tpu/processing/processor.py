"""PrismaticProcessor equivalent: tokenizer + image transform -> model inputs.

Reference: `prismatic/extern/hf/processing_prismatic.py:175-252`. Returns the
same contract ({input_ids, attention_mask, pixel_values}) with pixel_values in
the TPU layout (N_images, n_backbones, H, W, 3); `to_channel_stacked` converts
to the reference's (6N, H, W) layout for interop.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import zlib

import numpy as np

from openvla_oft_tpu.config import OpenVLAConfig
from openvla_oft_tpu.constants import EMPTY_TOKEN_ID
from openvla_oft_tpu.processing.image_processing import make_device_transform

PROMPT_TEMPLATE = "In: What action should the robot take to {instruction}?\nOut: "


def build_prompt(instruction: str) -> str:
    """Reference prompt format (openvla_utils.py:753, PurePromptBuilder)."""
    return PROMPT_TEMPLATE.format(instruction=instruction.lower())


def load_tokenizer(path_or_dir: str):
    """Load the Llama-2 tokenizer from a checkpoint dir.

    Prefers the in-repo SentencePiece implementation over `tokenizer.model`
    (processing/sentencepiece.py — no transformers dependency on the serving
    path); falls back to HF AutoTokenizer for tokenizer.json-only dirs, or
    when OPENVLA_HF_TOKENIZER=1 forces the HF stack (e.g. while validating
    encode parity on a new checkpoint). Requires local files — zero egress."""
    if os.environ.get("OPENVLA_HF_TOKENIZER") != "1":
        from openvla_oft_tpu.processing.sentencepiece import load_sentencepiece

        sp = load_sentencepiece(path_or_dir)
        if sp is not None:
            return sp
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path_or_dir, local_files_only=True)


class FakeLlamaTokenizer:
    """Deterministic stand-in with the Llama-2 vocab contract (32000 tokens,
    BOS=1, EOS=2, 29871 = '▁') for tests and benchmarks without tokenizer
    assets. Hash-maps words into stable mid-vocab ids."""

    vocab_size = 32000
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 32000

    def __call__(self, text: Union[str, List[str]], add_special_tokens=True,
                 return_tensors=None, padding=False, truncation=None,
                 max_length=None):
        if isinstance(text, list):
            out = [self(t, add_special_tokens)["input_ids"] for t in text]
            return {"input_ids": out,
                    "attention_mask": [[1] * len(x) for x in out]}
        ids = [self.bos_token_id] if add_special_tokens else []
        for w in text.replace("\n", " \n ").split(" "):
            if not w:
                continue
            # crc32, NOT builtin hash(): str hash is salted per process
            # (PYTHONHASHSEED), which would make "deterministic" ids differ
            # across runs/hosts and break golden reproducibility
            ids.append(3 + (zlib.crc32(w.encode()) % 28000))
        if text.endswith(" "):
            ids.append(EMPTY_TOKEN_ID)
        return {"input_ids": ids, "attention_mask": [1] * len(ids)}

    def decode(self, ids, **kw):
        return " ".join(f"<{i}>" for i in np.atleast_1d(np.asarray(ids)))


def derive_prompt_bucket(tokenizer, instructions, multiple: int = 16,
                         headroom: int = 2) -> int:
    """Size the static prompt bucket from REAL tokenizations of a task
    corpus (e.g. a LIBERO suite's instructions): max prompt length (incl.
    BOS + the 29871 fixup) + headroom, rounded up to `multiple`.

    The serving path compiles one program per bucket
    (models/prismatic.py::prepare_prompt_ids auto-escalates but each new
    bucket costs a recompile); deriving the bucket from the corpus keeps
    every instruction on the primary compiled program."""
    longest = 0
    for ins in instructions:
        ids = tokenizer(build_prompt(ins), add_special_tokens=True)["input_ids"]
        n = len(ids) + (ids[-1] != EMPTY_TOKEN_ID)
        longest = max(longest, n)
    need = longest + headroom
    return -(-need // multiple) * multiple


class PrismaticProcessor:
    """Pairs the device image transform with a Llama tokenizer."""

    def __init__(self, cfg: OpenVLAConfig, tokenizer=None):
        self.cfg = cfg
        self.tokenizer = tokenizer if tokenizer is not None else FakeLlamaTokenizer()
        self._transform = make_device_transform(cfg)

    def __call__(self, text: Union[str, List[str]],
                 images: Union[np.ndarray, Sequence[np.ndarray]]) -> dict:
        """text: prompt(s); images: (H,W,3) uint8 or list of them (per text).

        Returns np arrays: input_ids (B, L), attention_mask (B, L) — always
        padded to the batch max — and pixel_values
        (B, N_img, n_backbones, H, W, 3).
        """
        texts = [text] if isinstance(text, str) else list(text)
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        imgs = np.stack([np.asarray(im, np.uint8) for im in images])
        assert len(imgs) % len(texts) == 0, "images must divide evenly over texts"
        n_per = len(imgs) // len(texts)
        pixels = np.asarray(self._transform(imgs))
        pixels = pixels.reshape(len(texts), n_per, *pixels.shape[1:])

        tok = self.tokenizer(texts, add_special_tokens=True)
        ids_list = tok["input_ids"]
        max_len = max(len(x) for x in ids_list)
        # stock Llama-2 tokenizers expose pad_token_id = None (no pad token
        # added); getattr's default never applies then
        pad_id = getattr(self.tokenizer, "pad_token_id", None)
        if pad_id is None:
            pad_id = 32000
        input_ids = np.full((len(texts), max_len), pad_id, np.int32)
        attn = np.zeros((len(texts), max_len), np.int32)
        for i, ids in enumerate(ids_list):
            input_ids[i, :len(ids)] = ids
            attn[i, :len(ids)] = 1
        return {"input_ids": input_ids, "attention_mask": attn,
                "pixel_values": pixels}


def to_channel_stacked(pixels: np.ndarray) -> np.ndarray:
    """(B, N, n_backbones, H, W, 3) -> reference (B, 3*n_backbones*N, H, W)."""
    b, n, nb, h, w, c = pixels.shape
    x = pixels.transpose(0, 1, 2, 5, 3, 4)  # (B, N, nb, 3, H, W)
    return x.reshape(b, n * nb * c, h, w)


def from_channel_stacked(pixels: np.ndarray, num_images: int) -> np.ndarray:
    """Reference (B, 6N, H, W) -> (B, N, n_backbones, H, W, 3)."""
    b, ctot, h, w = pixels.shape
    nb = ctot // (3 * num_images)
    x = pixels.reshape(b, num_images, nb, 3, h, w)
    return x.transpose(0, 1, 2, 4, 5, 3)
