"""Load/export full OpenVLA checkpoints in the reference HF format.

A reference checkpoint directory holds `config.json` (with `norm_stats`),
`model*.safetensors` shards with parameter names:
    vision_backbone.featurizer.*            (timm DINOv2, primary)
    vision_backbone.fused_featurizer.*      (timm SigLIP)
    projector.fc{1,2,3}.*
    language_model.model.* / language_model.lm_head.weight
plus `dataset_statistics.json` and tokenizer files. `load_openvla_checkpoint`
ports all of it into our pytree layout (this is the TPU analog of the
reference's `get_vla`, openvla_utils.py:253-377). `export_openvla_checkpoint`
writes the inverse (the converter-script analog,
vla-scripts/extern/convert_openvla_weights_to_hf.py).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from openvla_oft_tpu.config import OpenVLAConfig
from openvla_oft_tpu.models.vision_backbone import _featurizer_names
from openvla_oft_tpu.utils.weights import (
    port_fc_mlp,
    port_hf_llama,
    port_hf_phi,
    port_timm_vit,
)

Params = Dict[str, Any]


class _SafetensorsIndex:
    """Lazy reader over one or many safetensors shards."""

    def __init__(self, ckpt_dir: str):
        # torch framework: reference checkpoints are bf16, which numpy-framework
        # safetensors cannot represent; _np() converts bf16 -> fp32.
        from safetensors import safe_open

        self._handles = []
        self._index: Dict[str, int] = {}
        for i, path in enumerate(sorted(glob.glob(
                os.path.join(ckpt_dir, "*.safetensors")))):
            h = safe_open(path, framework="pt")
            self._handles.append(h)
            for name in h.keys():
                self._index[name] = i
        if not self._handles:
            raise FileNotFoundError(f"no *.safetensors in {ckpt_dir}")

    def __call__(self, name: str) -> np.ndarray:
        from openvla_oft_tpu.utils.weights import _np

        if name not in self._index:
            raise KeyError(name)
        return _np(self._handles[self._index[name]].get_tensor(name))

    def keys(self):
        return self._index.keys()


def load_openvla_checkpoint(
    ckpt_dir: str,
    dtype=None,
) -> Tuple[OpenVLAConfig, Params, Optional[dict]]:
    """Returns (config, params, norm_stats) from a reference checkpoint dir."""
    import jax.numpy as jnp

    dtype_np = np.float32
    cfg, norm_stats = OpenVLAConfig.from_json_file(
        os.path.join(ckpt_dir, "config.json"))
    get = _SafetensorsIndex(ckpt_dir)

    from openvla_oft_tpu.config import PhiConfig

    # dispatch the LLM porter by config family (Phi names its projections
    # self_attn.dense / has no post_attention_layernorm)
    port_llm = port_hf_phi if isinstance(cfg.llm, PhiConfig) else port_hf_llama
    params: Params = {
        "llm": port_llm(get, cfg.llm, prefix="language_model.",
                        dtype=dtype_np),
        "projector": port_fc_mlp(
            get, ("fc1", "fc2", "fc3") if cfg.use_fused_vision_backbone
            else ("fc1", "fc2"), prefix="projector.", dtype=dtype_np),
        "vision_backbone": {},
    }
    names = _featurizer_names(cfg)
    for name, vcfg in zip(names, cfg.vision_configs):
        params["vision_backbone"][name] = port_timm_vit(
            get, vcfg, prefix=f"vision_backbone.{name}.", dtype=dtype_np)

    if dtype is not None:
        import jax

        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).astype(dtype), params)

    stats_path = os.path.join(ckpt_dir, "dataset_statistics.json")
    if norm_stats is None and os.path.exists(stats_path):
        with open(stats_path) as f:
            norm_stats = json.load(f)
    return cfg, params, norm_stats


# === Export (inverse port) ===
def export_llama(params: Params, cfg, prefix: str = "language_model.") -> Dict[str, np.ndarray]:
    L = cfg.num_layers
    lay = params["layers"]
    out: Dict[str, np.ndarray] = {
        prefix + "model.embed_tokens.weight": np.asarray(params["embed"]["embedding"]),
        prefix + "model.norm.weight": np.asarray(params["final_norm"]["scale"]),
    }
    if "lm_head" in params:
        out[prefix + "lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"]["kernel"]).T)
    fmt_map = {
        "model.layers.{i}.self_attn.q_proj.weight": (lay["attn"]["wq"]["kernel"], True),
        "model.layers.{i}.self_attn.k_proj.weight": (lay["attn"]["wk"]["kernel"], True),
        "model.layers.{i}.self_attn.v_proj.weight": (lay["attn"]["wv"]["kernel"], True),
        "model.layers.{i}.self_attn.o_proj.weight": (lay["attn"]["wo"]["kernel"], True),
        "model.layers.{i}.mlp.gate_proj.weight": (lay["mlp"]["gate"]["kernel"], True),
        "model.layers.{i}.mlp.up_proj.weight": (lay["mlp"]["up"]["kernel"], True),
        "model.layers.{i}.mlp.down_proj.weight": (lay["mlp"]["down"]["kernel"], True),
        "model.layers.{i}.input_layernorm.weight": (lay["attn_norm"]["scale"], False),
        "model.layers.{i}.post_attention_layernorm.weight": (lay["mlp_norm"]["scale"], False),
    }
    for fmt, (arr, transpose) in fmt_map.items():
        arr = np.asarray(arr)
        for i in range(L):
            w = arr[i]
            out[prefix + fmt.format(i=i)] = np.ascontiguousarray(w.T if transpose else w)
    return out


def export_openvla_checkpoint(cfg: OpenVLAConfig, params: Params, out_dir: str,
                              norm_stats: Optional[dict] = None,
                              extras_from: Optional[str] = None) -> str:
    """Write a reference-format checkpoint dir (safetensors + config.json).

    `extras_from`: a source checkpoint dir whose tensors NOT produced by this
    exporter (the timm featurizers' final `norm.*`, SigLIP `attn_pool.*`,
    CLIP `norm_pre.*` — parameters after the second-to-last tap that our
    forward never touches) are copied through verbatim, so a reference ->
    TPU -> reference round trip is key-complete instead of silently dropping
    them."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    tensors = export_llama(params["llm"], cfg.llm)
    # vision + projector
    names = _featurizer_names(cfg)
    for name, vcfg in zip(names, cfg.vision_configs):
        vp = params["vision_backbone"][name]
        pre = f"vision_backbone.{name}."
        k = np.asarray(vp["patch_embed"]["kernel"])  # (p*p*3, D)
        d = k.shape[1]
        conv = k.reshape(vcfg.patch_size, vcfg.patch_size, 3, d).transpose(3, 2, 0, 1)
        tensors[pre + "patch_embed.proj.weight"] = np.ascontiguousarray(conv)
        tensors[pre + "patch_embed.proj.bias"] = np.asarray(vp["patch_embed"]["bias"])
        tensors[pre + "pos_embed"] = np.asarray(vp["pos_embed"])[None]
        if "cls_token" in vp:
            tensors[pre + "cls_token"] = np.asarray(vp["cls_token"])[None]
        if "reg_token" in vp:
            tensors[pre + "reg_token"] = np.asarray(vp["reg_token"])[None]
        if "norm_pre" in vp:
            tensors[pre + "norm_pre.weight"] = np.asarray(vp["norm_pre"]["scale"])
            tensors[pre + "norm_pre.bias"] = np.asarray(vp["norm_pre"]["bias"])
        lay = vp["layers"]
        fmt_map = {
            "blocks.{i}.norm1.weight": (lay["norm1"]["scale"], False),
            "blocks.{i}.norm1.bias": (lay["norm1"]["bias"], False),
            "blocks.{i}.norm2.weight": (lay["norm2"]["scale"], False),
            "blocks.{i}.norm2.bias": (lay["norm2"]["bias"], False),
            "blocks.{i}.attn.qkv.weight": (lay["attn"]["qkv"]["kernel"], True),
            "blocks.{i}.attn.qkv.bias": (lay["attn"]["qkv"]["bias"], False),
            "blocks.{i}.attn.proj.weight": (lay["attn"]["proj"]["kernel"], True),
            "blocks.{i}.attn.proj.bias": (lay["attn"]["proj"]["bias"], False),
            "blocks.{i}.mlp.fc1.weight": (lay["mlp"]["fc1"]["kernel"], True),
            "blocks.{i}.mlp.fc1.bias": (lay["mlp"]["fc1"]["bias"], False),
            "blocks.{i}.mlp.fc2.weight": (lay["mlp"]["fc2"]["kernel"], True),
            "blocks.{i}.mlp.fc2.bias": (lay["mlp"]["fc2"]["bias"], False),
        }
        if "ls1" in lay:
            fmt_map["blocks.{i}.ls1.scale_factor"] = (lay["ls1"]["scale_factor"], False)
            fmt_map["blocks.{i}.ls2.scale_factor"] = (lay["ls2"]["scale_factor"], False)
        for fmt, (arr, transpose) in fmt_map.items():
            arr = np.asarray(arr)
            for i in range(vcfg.depth):
                w = arr[i]
                tensors[pre + fmt.format(i=i)] = np.ascontiguousarray(
                    w.T if transpose else w)
    for fc, p in params["projector"].items():
        tensors[f"projector.{fc}.weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"]).T)
        tensors[f"projector.{fc}.bias"] = np.asarray(p["bias"])

    if extras_from is not None:
        src = _SafetensorsIndex(extras_from)
        for name in src.keys():
            if name not in tensors:
                tensors[name] = src(name)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              os.path.join(out_dir, "model.safetensors"))
    import dataclasses as _dc

    hf_cfg = {
        "model_type": "openvla",
        "vision_backbone_id": cfg.vision_backbone_id,
        "llm_backbone_id": cfg.llm_backbone_id,
        "image_resize_strategy": cfg.image_resize_strategy,
        "llm_max_length": cfg.llm_max_length,
        "pad_token_id": cfg.pad_token_id,
        "pad_to_multiple_of": cfg.pad_to_multiple_of,
        "n_action_bins": cfg.n_action_bins,
        "norm_stats": norm_stats or {},
        # Self-describing architecture payloads: loading this checkpoint in a
        # fresh process does not require the backbone ids to be pre-registered
        # (config.from_hf_config auto-registers from these).
        "tpu_vision_configs": [_dc.asdict(v) for v in cfg.vision_configs],
        "tpu_llm_config": _dc.asdict(cfg.llm),
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return out_dir
