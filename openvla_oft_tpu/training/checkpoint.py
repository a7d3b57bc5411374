"""Checkpointing: Orbax-sharded native format + reference-format interop.

Mirrors the reference's three checkpoint families (SURVEY.md §5.4):
  1. OFT fine-tune: per-module torch `.pt` files `{name}--{step}_checkpoint.pt`
     + LoRA adapter + `dataset_statistics.json` (finetune.py:584-675). We keep
     the per-module decomposition as Orbax sub-trees and import the reference
     `.pt` files directly (DDP "module." prefixes stripped).
  2. HF-hub format: config.json + model safetensors — imported by
     utils/hf_import.load_openvla_checkpoint.
  3. Native train state (params + optimizer + step) for resume.

Orbax writes sharded arrays directly from the device mesh (no host gather —
the TPU analog of the reference's FSDP rank0 full-state-dict save).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from openvla_oft_tpu.models.vision_backbone import _featurizer_names

Params = Dict[str, Any]


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


# One long-lived checkpointer: Orbax's StandardCheckpointer IS an
# AsyncCheckpointer — save() stages device arrays (a copy, ~ms) and commits
# on a background thread. Creating-and-closing one per save (the round-2
# code) forced every save synchronous via close()'s implicit wait.
_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = _ocp().StandardCheckpointer()
    return _CKPTR


def save_checkpoint(ckpt_dir: str, step: int, tree: Params,
                    block: bool = True) -> str:
    """Save a pytree checkpoint at `{ckpt_dir}/{step}` (sharded-array aware).

    block=False overlaps the write with subsequent train steps (the TPU
    analog of async FSDP saves; a 7B+optimizer state is ~30 GB of HBM->disk
    the loop need not stall on). Orbax sequences back-to-back saves
    internally; call `wait_for_checkpoints()` before process exit, reading
    the files, or pruning checkpoint directories.
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:06d}")
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def wait_for_checkpoints() -> None:
    """Block until every async `save_checkpoint(block=False)` has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, step: int,
                       template: Optional[Params] = None) -> Params:
    wait_for_checkpoints()  # the step being restored may still be in flight
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:06d}")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template) if template is not None \
            else ckptr.restore(path)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def prune_old_steps(ckpt_dir: str) -> None:
    """Delete every numeric step dir except the newest (save_latest_
    checkpoint_only). Keys on int(step), NOT lexicographic listdir order:
    a stale '<step>.orbax-checkpoint-tmp-*' dir left by a hard kill
    mid-commit would sort above every real step and survive while the real
    checkpoints got deleted. Callers must wait_for_checkpoints() first —
    never rmtree under an in-flight async write."""
    import shutil

    steps = sorted((d for d in os.listdir(ckpt_dir) if d.isdigit()), key=int)
    for d in steps[:-1]:
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


# === Reference per-module `.pt` interop ===
def load_module_pt(path: str) -> Dict[str, np.ndarray]:
    """Load a `{name}--{step}_checkpoint.pt` state dict, DDP prefix stripped
    (reference loading at openvla_utils.py:201-250)."""
    import torch

    from openvla_oft_tpu.utils.weights import strip_ddp_prefix

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return strip_ddp_prefix(sd)


def find_checkpoint_file(pretrained_dir: str, file_pattern: str) -> str:
    """Reference `find_checkpoint_file` (openvla_utils.py:436-460): exactly one
    file in the dir whose name contains `file_pattern`."""
    matches = [f for f in os.listdir(pretrained_dir) if file_pattern in f
               and os.path.isfile(os.path.join(pretrained_dir, f))]
    assert len(matches) == 1, \
        f"expected exactly 1 '{file_pattern}' checkpoint in {pretrained_dir}, " \
        f"found {len(matches)}"
    return os.path.join(pretrained_dir, matches[0])


def import_action_head_pt(path: str, head: str = "l1") -> Params:
    """Port an L1/diffusion action-head `.pt` into our pytree layout."""
    from openvla_oft_tpu.utils.weights import dict_getter, port_mlp_resnet

    sd = load_module_pt(path)
    get = dict_getter(sd)
    if head == "l1":
        return {"model": port_mlp_resnet(get, "model.")}
    return {"noise_predictor": port_mlp_resnet(get, "noise_predictor.mlp_resnet.")}


def import_projector_pt(path: str, kind: str = "proprio") -> Params:
    """Port proprio / noisy-action projector `.pt` files."""
    from openvla_oft_tpu.utils.weights import dict_getter, port_fc_mlp

    sd = load_module_pt(path)
    get = dict_getter(sd)
    return port_fc_mlp(get, ("fc1", "fc2"))


def import_film_vision_backbone_pt(path: str, cfg) -> tuple:
    """Port a reference `vision_backbone--{step}_checkpoint.pt` saved from
    `FiLMedPrismaticVisionBackbone` (openvla_utils.py:311-349 loads it):
    original timm params live under `vision_backbone.<featurizer>.blocks.{i}.
    block.*` and the FiLM projectors under `...blocks.{i}.{scale,shift}.*`.

    Returns (vision_backbone_params, film_params) in our pytree layout.
    cfg: OpenVLAConfig.
    """
    import numpy as _np_mod

    from openvla_oft_tpu.utils.weights import dict_getter, port_timm_vit

    sd = load_module_pt(path)
    get = dict_getter(sd)
    names = _featurizer_names(cfg)
    backbone: Params = {}
    film: Params = {}
    for name, vcfg in zip(names, cfg.vision_configs):
        prefix = f"vision_backbone.{name}."

        # Remap FiLM-wrapped block names back to plain timm names, resolving
        # peft-LoRA wrapping along the way: the reference applies
        # get_peft_model(target_modules="all-linear") BEFORE the FiLM wrap
        # (finetune.py:862-884), so real saved backbones name their linears
        # `<module>.base_layer.weight` with `lora_A/lora_B.default.weight`
        # factors — which must be MERGED (W + alpha/r * B@A), not dropped.
        def _resolve(cand: str, _np=_np_mod):
            try:
                return get(cand)
            except KeyError:
                pass
            if cand.endswith(".weight"):
                stem = cand[: -len(".weight")]
                w = _np.asarray(get(f"{stem}.base_layer.weight"), _np.float32)
                try:
                    a = _np.asarray(get(f"{stem}.lora_A.default.weight"),
                                    _np.float32)
                    b = _np.asarray(get(f"{stem}.lora_B.default.weight"),
                                    _np.float32)
                    r = a.shape[0]
                    # reference alpha convention: min(rank, 16) (finetune.py)
                    w = w + (min(r, 16) / r) * (b @ a)
                except KeyError:
                    pass
                return w
            if cand.endswith(".bias"):
                return get(f"{cand[: -len('.bias')]}.base_layer.bias")
            raise KeyError(cand)

        def film_get(key: str, _prefix=prefix):
            if key.startswith(_prefix + "blocks."):
                rest = key[len(_prefix + "blocks."):]
                idx, sub = rest.split(".", 1)
                try:
                    return _resolve(f"{_prefix}blocks.{idx}.block.{sub}")
                except KeyError:
                    pass  # plain (un-FiLM-wrapped) layout below
            return _resolve(key)

        backbone[name] = port_timm_vit(film_get, vcfg, prefix=prefix)
        L = vcfg.depth
        film[name] = {
            "scale": {
                "kernel": _np_mod.stack(
                    [_np_mod.asarray(get(f"{prefix}blocks.{i}.scale.weight")).T
                     for i in range(L)]).astype(_np_mod.float32),
                "bias": _np_mod.stack(
                    [_np_mod.asarray(get(f"{prefix}blocks.{i}.scale.bias"))
                     for i in range(L)]).astype(_np_mod.float32),
            },
            "shift": {
                "kernel": _np_mod.stack(
                    [_np_mod.asarray(get(f"{prefix}blocks.{i}.shift.weight")).T
                     for i in range(L)]).astype(_np_mod.float32),
                "bias": _np_mod.stack(
                    [_np_mod.asarray(get(f"{prefix}blocks.{i}.shift.bias"))
                     for i in range(L)]).astype(_np_mod.float32),
            },
        }
    return backbone, film


# === Reference per-module `.pt` EXPORT (inverse of the importers) ===
def _export_linear(sd: dict, name: str, p: Params) -> None:
    import torch

    sd[f"{name}.weight"] = torch.from_numpy(
        np.ascontiguousarray(np.asarray(p["kernel"], np.float32).T))
    if "bias" in p:
        sd[f"{name}.bias"] = torch.from_numpy(
            np.asarray(p["bias"], np.float32).copy())


def _export_layer_norm(sd: dict, name: str, p: Params) -> None:
    import torch

    sd[f"{name}.weight"] = torch.from_numpy(
        np.asarray(p["scale"], np.float32).copy())
    sd[f"{name}.bias"] = torch.from_numpy(
        np.asarray(p["bias"], np.float32).copy())


def _export_mlp_resnet(sd: dict, prefix: str, p: Params) -> None:
    _export_layer_norm(sd, prefix + "layer_norm1", p["ln_in"])
    _export_linear(sd, prefix + "fc1", p["fc_in"])
    for i, blk in enumerate(p["blocks"]):
        _export_layer_norm(sd, f"{prefix}mlp_resnet_blocks.{i}.ffn.0", blk["ln"])
        _export_linear(sd, f"{prefix}mlp_resnet_blocks.{i}.ffn.1", blk["fc"])
    _export_layer_norm(sd, prefix + "layer_norm2", p["ln_out"])
    _export_linear(sd, prefix + "fc2", p["fc_out"])


def export_film_vision_backbone_pt(backbone: Params, film: Params, cfg,
                                   run_dir: str, step: int) -> str:
    """Inverse of `import_film_vision_backbone_pt`: write the FiLMed vision
    backbone as a reference-format `vision_backbone--{step}_checkpoint.pt`."""
    import torch

    sd: dict = {}
    names = _featurizer_names(cfg)
    for name, vcfg in zip(names, cfg.vision_configs):
        vp = backbone[name]
        pre = f"vision_backbone.{name}."
        tensors: dict = {}
        k = np.asarray(vp["patch_embed"]["kernel"])
        d = k.shape[1]
        conv = k.reshape(vcfg.patch_size, vcfg.patch_size, 3, d).transpose(3, 2, 0, 1)
        tensors[pre + "patch_embed.proj.weight"] = conv
        tensors[pre + "patch_embed.proj.bias"] = np.asarray(vp["patch_embed"]["bias"])
        tensors[pre + "pos_embed"] = np.asarray(vp["pos_embed"])[None]
        if "cls_token" in vp:
            tensors[pre + "cls_token"] = np.asarray(vp["cls_token"])[None]
        if "reg_token" in vp:
            tensors[pre + "reg_token"] = np.asarray(vp["reg_token"])[None]
        lay = vp["layers"]
        fmt_map = {
            "blocks.{i}.block.norm1.weight": (lay["norm1"]["scale"], False),
            "blocks.{i}.block.norm1.bias": (lay["norm1"]["bias"], False),
            "blocks.{i}.block.norm2.weight": (lay["norm2"]["scale"], False),
            "blocks.{i}.block.norm2.bias": (lay["norm2"]["bias"], False),
            "blocks.{i}.block.attn.qkv.weight": (lay["attn"]["qkv"]["kernel"], True),
            "blocks.{i}.block.attn.qkv.bias": (lay["attn"]["qkv"]["bias"], False),
            "blocks.{i}.block.attn.proj.weight": (lay["attn"]["proj"]["kernel"], True),
            "blocks.{i}.block.attn.proj.bias": (lay["attn"]["proj"]["bias"], False),
            "blocks.{i}.block.mlp.fc1.weight": (lay["mlp"]["fc1"]["kernel"], True),
            "blocks.{i}.block.mlp.fc1.bias": (lay["mlp"]["fc1"]["bias"], False),
            "blocks.{i}.block.mlp.fc2.weight": (lay["mlp"]["fc2"]["kernel"], True),
            "blocks.{i}.block.mlp.fc2.bias": (lay["mlp"]["fc2"]["bias"], False),
        }
        if "ls1" in lay:
            fmt_map["blocks.{i}.block.ls1.scale_factor"] = (
                lay["ls1"]["scale_factor"], False)
            fmt_map["blocks.{i}.block.ls2.scale_factor"] = (
                lay["ls2"]["scale_factor"], False)
        for fmt, (arr, transpose) in fmt_map.items():
            arr = np.asarray(arr)
            for i in range(vcfg.depth):
                w = arr[i]
                tensors[pre + fmt.format(i=i)] = w.T if transpose else w
        fv = film[name]
        for i in range(vcfg.depth):
            tensors[f"{pre}blocks.{i}.scale.weight"] = np.asarray(
                fv["scale"]["kernel"][i]).T
            tensors[f"{pre}blocks.{i}.scale.bias"] = np.asarray(
                fv["scale"]["bias"][i])
            tensors[f"{pre}blocks.{i}.shift.weight"] = np.asarray(
                fv["shift"]["kernel"][i]).T
            tensors[f"{pre}blocks.{i}.shift.bias"] = np.asarray(
                fv["shift"]["bias"][i])
        for key, val in tensors.items():
            sd[key] = torch.from_numpy(
                np.ascontiguousarray(np.asarray(val, np.float32)))
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, f"vision_backbone--{step}_checkpoint.pt")
    torch.save(sd, path)
    return path


def export_module_pt(module_params: Params, module_name: str, run_dir: str,
                     step: int) -> str:
    """Write a reference-format `{name}--{step}_checkpoint.pt`
    (finetune.py:614-656 layout), loadable by the reference eval utils and by
    `import_action_head_pt`/`import_projector_pt`."""
    import torch

    sd: dict = {}
    if module_name == "action_head":
        if "model" in module_params:              # L1 head
            _export_mlp_resnet(sd, "model.", module_params["model"])
        else:                                      # diffusion head
            _export_mlp_resnet(sd, "noise_predictor.mlp_resnet.",
                               module_params["noise_predictor"])
    elif module_name in ("proprio_projector", "noisy_action_projector"):
        _export_linear(sd, "fc1", module_params["fc1"])
        _export_linear(sd, "fc2", module_params["fc2"])
    else:
        raise ValueError(f"unknown module {module_name!r}")
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, f"{module_name}--{step}_checkpoint.pt")
    torch.save(sd, path)
    return path
