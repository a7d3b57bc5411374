"""VLM pretraining dataset fetcher (reference `scripts/preprocess.py` +
`prismatic/preprocessing/download.py:32-105` DATASET_REGISTRY).

Downloads and extracts the LLaVA v1.5 pretraining artifacts (align-stage
LAION-CC-SBU-558k and finetune-stage instruct mixture image sets) into the
`download/` layout that `openvla_oft_tpu.data.vlm_datasets.resolve_vlm_dataset`
expects, then normalizes OCR-VQA images to JPG. stdlib-only (urllib +
zipfile); in a zero-egress environment downloads fail loudly and extraction /
conversion can still be run on pre-staged archives.

Run: `python vla_scripts/preprocess.py --dataset_id llava-v1.5-instruct`
"""

from __future__ import annotations

import dataclasses
import os
import sys
import zipfile
from pathlib import Path
from typing import Dict, List

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Public artifact locations (reference download.py DATASET_REGISTRY verbatim —
# these are dataset URLs, shared by every LLaVA v1.5 reproduction).
DATASET_ARTIFACTS: Dict[str, List[dict]] = {
    "llava-laion-cc-sbu-558k": [
        {"name": "chat.json", "extract": False, "do_rename": True,
         "url": "https://huggingface.co/datasets/liuhaotian/LLaVA-Pretrain/"
                "resolve/main/blip_laion_cc_sbu_558k.json"},
        {"name": "images", "extract": True, "do_rename": False,
         "url": "https://huggingface.co/datasets/liuhaotian/LLaVA-Pretrain/"
                "resolve/main/images.zip"},
    ],
    "llava-v1.5-instruct": [
        {"name": "llava_v1_5_mix665k.json", "extract": False,
         "do_rename": True,
         "url": "https://huggingface.co/datasets/liuhaotian/"
                "LLaVA-Instruct-150K/resolve/main/llava_v1_5_mix665k.json"},
        {"name": "coco/train2017", "extract": True, "do_rename": True,
         "url": "http://images.cocodataset.org/zips/train2017.zip"},
        {"name": "gqa/images", "extract": True, "do_rename": True,
         "url": "https://downloads.cs.stanford.edu/nlp/data/gqa/images.zip"},
        {"name": "ocr_vqa/images", "extract": True, "do_rename": True,
         "url": "https://huggingface.co/datasets/qnguyen3/ocr_vqa/"
                "resolve/main/ocr_vqa.zip"},
        {"name": "textvqa/train_images", "extract": True, "do_rename": True,
         "url": "https://dl.fbaipublicfiles.com/textvqa/images/"
                "train_val_images.zip"},
        {"name": "vg/VG_100K", "extract": True, "do_rename": True,
         "url": "https://cs.stanford.edu/people/rak248/VG_100K_2/images.zip"},
        {"name": "vg/VG_100K_2", "extract": True, "do_rename": True,
         "url": "https://cs.stanford.edu/people/rak248/VG_100K_2/"
                "images2.zip"},
    ],
}


@dataclasses.dataclass
class PreprocessConfig:
    dataset_id: str = "llava-v1.5-instruct"
    root_dir: Path = Path("data")


def _download(url: str, dest: Path) -> Path:
    """stdlib streaming download with a byte-count progress line."""
    import urllib.request

    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists():
        print(f"[preprocess] exists, skipping download: {dest}")
        return dest
    tmp = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as f:
        total = 0
        while chunk := resp.read(1 << 20):
            f.write(chunk)
            total += len(chunk)
            print(f"\r[preprocess] {dest.name}: {total / 1e6:.0f} MB",
                  end="", flush=True)
    print()
    tmp.rename(dest)
    return dest


def _extract(archive: Path, target_dir: Path) -> None:
    target_dir.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(archive) as z:
        z.extractall(target_dir)


def convert_to_jpg(image_dir: Path) -> int:
    """Normalize GIF/PNG images to RGB JPGs (reference download.py:107-129 —
    OCR-VQA ships mixed formats the training loader can't batch)."""
    from PIL import Image

    converted = 0
    for image_fn in sorted(Path(image_dir).iterdir()):
        jpg_fn = image_fn.parent / f"{image_fn.stem}.jpg"
        if image_fn.suffix in {".jpg", ".jpeg"} or jpg_fn.exists():
            continue
        if image_fn.suffix == ".gif":
            gif = Image.open(image_fn)
            gif.seek(0)
            gif.convert("RGB").save(jpg_fn)
            converted += 1
        elif image_fn.suffix == ".png":
            Image.open(image_fn).convert("RGB").save(jpg_fn)
            converted += 1
    return converted


def download_extract(dataset_id: str, root_dir: Path) -> Path:
    dl_dir = Path(root_dir) / "download" / dataset_id
    for comp in DATASET_ARTIFACTS[dataset_id]:
        name, url = comp["name"], comp["url"]
        if comp["extract"]:
            archive = _download(url, dl_dir / Path(url).name)
            out = dl_dir / name if comp["do_rename"] else dl_dir
            _extract(archive, out.parent if comp["do_rename"] else out)
            # zips unpack under their internal top-level dir; rename to the
            # canonical component name when they differ
            if comp["do_rename"]:
                with zipfile.ZipFile(archive) as z:
                    top = Path(z.namelist()[0]).parts[0]
                src = out.parent / top
                if src != out and src.exists() and not out.exists():
                    src.rename(out)
            archive.unlink()
        else:
            dest = dl_dir / name if comp["do_rename"] else dl_dir / Path(url).name
            _download(url, dest)
    return dl_dir


def preprocess(cfg: PreprocessConfig) -> Path:
    assert cfg.dataset_id in DATASET_ARTIFACTS, (
        f"unknown dataset {cfg.dataset_id!r}; known: "
        f"{sorted(DATASET_ARTIFACTS)}")
    print(f"[preprocess] downloading `{cfg.dataset_id}` to "
          f"{cfg.root_dir / 'download'}")
    dl_dir = download_extract(cfg.dataset_id, cfg.root_dir)
    if cfg.dataset_id == "llava-v1.5-instruct":
        n = convert_to_jpg(dl_dir / "ocr_vqa" / "images")
        print(f"[preprocess] converted {n} OCR-VQA images to jpg")
    return dl_dir


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    preprocess(parse_args(PreprocessConfig))
