"""Pretrained-model registry + `load`/`load_vla` API (reference
`prismatic/models/{registry,load}.py` — `available_models`, `load` :52,
`load_vla` :122, MODEL_REGISTRY of released VLMs/VLAs).

Zero-egress build: entries map model IDs to their architecture configs and
(HF hub) checkpoint identities; `load`/`load_vla` resolve LOCAL checkpoint
directories (a hub-download hook can be layered on where egress exists).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

from openvla_oft_tpu.config import OpenVLAConfig
from openvla_oft_tpu.constants import PlatformSpec, detect_robot_platform


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    model_id: str
    hub_repo: str
    description: str
    vision_backbone_id: str = "dinosiglip-vit-so-224px"
    llm_backbone_id: str = "llama2-7b-pure"
    is_vla: bool = False
    head: Optional[str] = None      # "l1" | "diffusion" | "discrete" (VLAs)
    platform: Optional[str] = None  # constants.PLATFORMS key


MODEL_REGISTRY: Dict[str, ModelEntry] = {}


def register_model(entry: ModelEntry) -> ModelEntry:
    MODEL_REGISTRY[entry.model_id] = entry
    return entry


# Released Prismatic VLMs the OpenVLA line builds on (reference registry.py)
# plus the OpenVLA / OpenVLA-OFT released checkpoints (LIBERO.md:41-45).
for _id, _repo, _desc, _vla, _head, _plat in [
    ("prism-dinosiglip-224px+7b", "TRI-ML/prismatic-vlms",
     "Prismatic VLM: DINOv2+SigLIP fused backbone, Llama-2-7B",
     False, None, None),
    ("prism-dinosiglip-224px+13b", "TRI-ML/prismatic-vlms",
     "Prismatic VLM, Llama-2-13B", False, None, None),
    ("openvla-7b", "openvla/openvla-7b",
     "Base OpenVLA 7B (discrete autoregressive actions)",
     True, "discrete", "bridge"),
    ("openvla-7b-oft-finetuned-libero-spatial",
     "moojink/openvla-7b-oft-finetuned-libero-spatial",
     "OFT LIBERO-Spatial: L1 head, 2 images, proprio", True, "l1", "libero"),
    ("openvla-7b-oft-finetuned-libero-object",
     "moojink/openvla-7b-oft-finetuned-libero-object",
     "OFT LIBERO-Object", True, "l1", "libero"),
    ("openvla-7b-oft-finetuned-libero-goal",
     "moojink/openvla-7b-oft-finetuned-libero-goal",
     "OFT LIBERO-Goal (50K-step checkpoint)", True, "l1", "libero"),
    ("openvla-7b-oft-finetuned-libero-10",
     "moojink/openvla-7b-oft-finetuned-libero-10",
     "OFT LIBERO-10", True, "l1", "libero"),
]:
    register_model(ModelEntry(_id, _repo, _desc, is_vla=_vla, head=_head,
                              platform=_plat))


def available_models() -> Tuple[str, ...]:
    """Reference `available_models` / `available_model_names`."""
    return tuple(sorted(MODEL_REGISTRY))


def get_model_description(model_id: str) -> str:
    return MODEL_REGISTRY[model_id].description


def _hub_download(repo_id: str, cache_dir: Optional[str]) -> Optional[str]:
    """HF-hub snapshot download hook (reference `openvla_utils.py:270-303` /
    `models/load.py:52-226` pull checkpoints from the hub).

    Returns the local snapshot dir, or None when the hub is unreachable /
    huggingface_hub is unavailable / downloads are disabled
    (OPENVLA_OFFLINE=1) — callers fall back to the local-dir error. Exercised
    in tests via a stubbed `huggingface_hub`; works unmodified the moment
    egress exists."""
    if os.environ.get("OPENVLA_OFFLINE") == "1":
        return None
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        return None
    try:
        return snapshot_download(repo_id=repo_id, cache_dir=cache_dir)
    except Exception as e:
        # surface the real cause (auth failure, disk full, missing repo) —
        # callers fall back to the local-dir error, which would otherwise
        # misreport every failure as "hub unreachable"
        import sys

        print(f"[registry] snapshot_download({repo_id!r}) failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return None


def _resolve_checkpoint_dir(model_id_or_path: str,
                            cache_dir: Optional[str]) -> str:
    if os.path.isdir(model_id_or_path):
        return model_id_or_path
    if cache_dir:
        candidate = os.path.join(cache_dir, model_id_or_path.split("/")[-1])
        if os.path.isdir(candidate):
            return candidate
    entry = MODEL_REGISTRY.get(model_id_or_path)
    # Hub hook: a registered id resolves through its hub repo; a bare
    # "org/name" string is treated as a repo id directly.
    repo = entry.hub_repo if entry else (
        model_id_or_path if model_id_or_path.count("/") == 1
        and not model_id_or_path.startswith((".", "/")) else None)
    if repo:
        local = _hub_download(repo, cache_dir)
        if local:
            return local
    hint = f" (hub repo: {entry.hub_repo})" if entry else ""
    raise FileNotFoundError(
        f"Checkpoint for {model_id_or_path!r} not found locally{hint} and "
        f"the HF hub is unreachable from this build — download the "
        f"checkpoint out-of-band and pass its directory (or set cache_dir).")


def load(model_id_or_path: str, cache_dir: Optional[str] = None,
         dtype=None):
    """Load a Prismatic VLM from a local checkpoint dir (reference
    load.py:52-121). Returns (OpenVLAConfig, params, norm_stats)."""
    from openvla_oft_tpu.utils.hf_import import load_openvla_checkpoint

    ckpt_dir = _resolve_checkpoint_dir(model_id_or_path, cache_dir)
    return load_openvla_checkpoint(ckpt_dir, dtype=dtype)


def load_vla(model_id_or_path: str, cache_dir: Optional[str] = None,
             platform: Optional[PlatformSpec] = None, dtype=None,
             head: Optional[str] = None):
    """Load an OpenVLA policy (reference load.py:122-226). Returns
    `OpenVLAPolicy` ready for `predict_action`.

    Registered ids carry their head/platform defaults (the base openvla-7b
    is a discrete autoregressive bridge-style policy, not an L1 OFT one);
    explicit arguments override."""
    from openvla_oft_tpu.constants import PLATFORMS
    from openvla_oft_tpu.policy import OpenVLAPolicy

    entry = MODEL_REGISTRY.get(model_id_or_path)
    if entry is not None and not entry.is_vla:
        raise ValueError(
            f"{model_id_or_path!r} is a Prismatic VLM, not a VLA — use "
            f"load() for (config, params, norm_stats)")
    cfg, params, norm_stats = load(model_id_or_path, cache_dir, dtype=dtype)
    if platform is None:
        platform = PLATFORMS[entry.platform] if entry and entry.platform \
            else detect_robot_platform(model_id_or_path)
    head = head or (entry.head if entry else None) or "l1"
    return OpenVLAPolicy(cfg=cfg, platform=platform, params=params,
                         norm_stats=norm_stats, head=head)
