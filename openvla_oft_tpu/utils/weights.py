"""Weight porting: reference checkpoints (HF safetensors / torch .pt) -> JAX pytrees.

Covers the three reference checkpoint families (SURVEY.md §5.4):
  1. HF-format OpenVLA checkpoints: `model*.safetensors` holding
     `vision_backbone.featurizer.*` (timm ViT), `projector.*`, and
     `language_model.model.*` (HF Llama) tensors,
  2. per-module fine-tune checkpoints `{name}--{step}_checkpoint.pt`
     (action heads / projectors, with DDP "module." prefixes —
     reference strips them at `vla-scripts/finetune.py:134-156`),
  3. `dataset_statistics.json` sidecars (loaded elsewhere).

Everything here is host-side NumPy; no torch required for safetensors.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Mapping

import numpy as np

from openvla_oft_tpu.config import LlamaConfig, OpenVLAConfig, ViTConfig

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (bf16 -> fp32 via torch)."""
    if isinstance(x, np.ndarray):
        return x
    try:
        import torch

        if isinstance(x, torch.Tensor):
            t = x.detach().cpu()
            if t.dtype == torch.bfloat16:
                t = t.float()
            return t.numpy()
    except ImportError:
        pass
    return np.asarray(x)


def strip_ddp_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove leading 'module.' from DDP-wrapped checkpoints
    (reference `remove_ddp_in_checkpoint`, finetune.py:134-156)."""
    return {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}


# === Llama (HF `LlamaForCausalLM` names -> stacked layer pytree) ===
def port_hf_llama(get: Callable[[str], np.ndarray], cfg: LlamaConfig,
                  prefix: str = "", dtype=np.float32) -> Params:
    """`get(name)` returns the tensor for an HF param name under `prefix`.

    HF stores Linear weights as (out, in); ours are (in, out) -> transpose.
    Layers stack along a new leading axis for `lax.scan`.
    """
    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = True) -> np.ndarray:
        ws = [_np(get(prefix + fmt.format(i=i))) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return np.stack(ws).astype(dtype)

    layers = {
        "attn": {
            "wq": {"kernel": stack("model.layers.{i}.self_attn.q_proj.weight")},
            "wk": {"kernel": stack("model.layers.{i}.self_attn.k_proj.weight")},
            "wv": {"kernel": stack("model.layers.{i}.self_attn.v_proj.weight")},
            "wo": {"kernel": stack("model.layers.{i}.self_attn.o_proj.weight")},
        },
        "mlp": {
            "gate": {"kernel": stack("model.layers.{i}.mlp.gate_proj.weight")},
            "up": {"kernel": stack("model.layers.{i}.mlp.up_proj.weight")},
            "down": {"kernel": stack("model.layers.{i}.mlp.down_proj.weight")},
        },
        "attn_norm": {"scale": stack("model.layers.{i}.input_layernorm.weight",
                                     transpose=False)},
        "mlp_norm": {"scale": stack("model.layers.{i}.post_attention_layernorm.weight",
                                    transpose=False)},
    }
    out = {
        "embed": {"embedding": _np(get(prefix + "model.embed_tokens.weight")).astype(dtype)},
        "layers": layers,
        "final_norm": {"scale": _np(get(prefix + "model.norm.weight")).astype(dtype)},
    }
    # lm_head is optional: OFT L1/diffusion serving never reads it, and
    # head-only exports may omit it (weight-tied models too). AR decoding
    # requires it — predict_action_autoregressive raises if absent.
    try:
        out["lm_head"] = {"kernel": _np(get(prefix + "lm_head.weight")).T.astype(dtype)}
    except KeyError:
        pass
    return out


# === Phi-2 (HF `PhiForCausalLM` names -> stacked layer pytree) ===
def port_hf_phi(get: Callable[[str], np.ndarray], cfg,
                prefix: str = "", dtype=np.float32) -> Params:
    """Port HF Phi-2 weights (reference backbone `llm/phi.py:19-25`).

    Same conventions as `port_hf_llama`: HF Linear (out, in) -> ours (in, out),
    per-layer tensors stacked on a new leading axis. Phi additionally carries
    biases on every projection, LayerNorm biases, and a biased lm_head.
    """
    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = True) -> np.ndarray:
        ws = [_np(get(prefix + fmt.format(i=i))) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return np.stack(ws).astype(dtype)

    def wb(name: str) -> Params:
        return {"kernel": stack(f"model.layers.{{i}}.{name}.weight"),
                "bias": stack(f"model.layers.{{i}}.{name}.bias", transpose=False)}

    layers = {
        "attn": {
            "wq": wb("self_attn.q_proj"),
            "wk": wb("self_attn.k_proj"),
            "wv": wb("self_attn.v_proj"),
            "wo": wb("self_attn.dense"),
        },
        "mlp": {"fc1": wb("mlp.fc1"), "fc2": wb("mlp.fc2")},
        "ln": {"scale": stack("model.layers.{i}.input_layernorm.weight",
                              transpose=False),
               "bias": stack("model.layers.{i}.input_layernorm.bias",
                             transpose=False)},
    }
    return {
        "embed": {"embedding": _np(get(prefix + "model.embed_tokens.weight")).astype(dtype)},
        "layers": layers,
        "final_norm": {
            "scale": _np(get(prefix + "model.final_layernorm.weight")).astype(dtype),
            "bias": _np(get(prefix + "model.final_layernorm.bias")).astype(dtype)},
        "lm_head": {"kernel": _np(get(prefix + "lm_head.weight")).T.astype(dtype),
                    "bias": _np(get(prefix + "lm_head.bias")).astype(dtype)},
    }


# === timm ViT -> stacked pytree ===
def port_timm_patch_embed(conv_weight: np.ndarray) -> np.ndarray:
    """timm conv (D, 3, p, p) -> patchify matmul kernel (p*p*3, D).

    `patchify` flattens each patch in (dy, dx, c) order, so permute the conv
    kernel to (p, p, 3, D) before flattening.
    """
    d = conv_weight.shape[0]
    k = conv_weight.transpose(2, 3, 1, 0)  # (p, p, 3, D)
    return k.reshape(-1, d)


def port_timm_vit(get: Callable[[str], np.ndarray], cfg: ViTConfig,
                  prefix: str = "", dtype=np.float32) -> Params:
    L = cfg.depth

    def g(name: str) -> np.ndarray:
        return _np(get(prefix + name))

    def stack(fmt: str, transpose: bool = False) -> np.ndarray:
        ws = [g(fmt.format(i=i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return np.stack(ws).astype(dtype)

    p: Params = {
        "patch_embed": {
            "kernel": port_timm_patch_embed(g("patch_embed.proj.weight")).astype(dtype),
            "bias": g("patch_embed.proj.bias").astype(dtype),
        },
        "pos_embed": g("pos_embed")[0].astype(dtype),  # (1, N, D) -> (N, D)
        "layers": {
            "norm1": {"scale": stack("blocks.{i}.norm1.weight"),
                      "bias": stack("blocks.{i}.norm1.bias")},
            "norm2": {"scale": stack("blocks.{i}.norm2.weight"),
                      "bias": stack("blocks.{i}.norm2.bias")},
            "attn": {
                "qkv": {"kernel": stack("blocks.{i}.attn.qkv.weight", transpose=True),
                        "bias": stack("blocks.{i}.attn.qkv.bias")},
                "proj": {"kernel": stack("blocks.{i}.attn.proj.weight", transpose=True),
                         "bias": stack("blocks.{i}.attn.proj.bias")},
            },
            "mlp": {
                "fc1": {"kernel": stack("blocks.{i}.mlp.fc1.weight", transpose=True),
                        "bias": stack("blocks.{i}.mlp.fc1.bias")},
                "fc2": {"kernel": stack("blocks.{i}.mlp.fc2.weight", transpose=True),
                        "bias": stack("blocks.{i}.mlp.fc2.bias")},
            },
        },
    }
    if cfg.num_cls_tokens:
        p["cls_token"] = g("cls_token")[0].astype(dtype)  # (1, 1, D) -> (1, D)
    if cfg.num_reg_tokens:
        p["reg_token"] = g("reg_token")[0].astype(dtype)
    if cfg.use_pre_norm:
        p["norm_pre"] = {"scale": g("norm_pre.weight").astype(dtype),
                         "bias": g("norm_pre.bias").astype(dtype)}
    if cfg.use_layer_scale:
        # The reference renames timm `gamma` -> `scale_factor`
        # (modeling_prismatic.py:53-63); HF checkpoints store `scale_factor`.
        def ls(fmt_new, fmt_old):
            try:
                return stack(fmt_new)
            except KeyError:
                return stack(fmt_old)

        p["layers"]["ls1"] = {"scale_factor": ls("blocks.{i}.ls1.scale_factor",
                                                 "blocks.{i}.ls1.gamma")}
        p["layers"]["ls2"] = {"scale_factor": ls("blocks.{i}.ls2.scale_factor",
                                                 "blocks.{i}.ls2.gamma")}
    return p


# === MLP-style modules with fcN naming (projectors, heads) ===
def port_linear(get, name: str, dtype=np.float32) -> Params:
    p = {"kernel": _np(get(f"{name}.weight")).T.astype(dtype)}
    try:
        p["bias"] = _np(get(f"{name}.bias")).astype(dtype)
    except KeyError:
        pass
    return p


def port_layer_norm(get, name: str, dtype=np.float32) -> Params:
    return {"scale": _np(get(f"{name}.weight")).astype(dtype),
            "bias": _np(get(f"{name}.bias")).astype(dtype)}


def port_fc_mlp(get, names, prefix: str = "", dtype=np.float32) -> Params:
    """Port {fc1, fc2, ...} style modules (vision/proprio/noisy projectors)."""
    return {n: port_linear(get, prefix + n, dtype) for n in names}


def port_mlp_resnet(get, prefix: str, num_blocks: int = 2, dtype=np.float32) -> Params:
    """Reference MLPResNet (action_heads.py:60-82) param names:
    layer_norm1, fc1, mlp_resnet_blocks.{i}.ffn.{0,1}, layer_norm2, fc2."""
    return {
        "ln_in": port_layer_norm(get, prefix + "layer_norm1", dtype),
        "fc_in": port_linear(get, prefix + "fc1", dtype),
        "blocks": [
            {"ln": port_layer_norm(get, f"{prefix}mlp_resnet_blocks.{i}.ffn.0", dtype),
             "fc": port_linear(get, f"{prefix}mlp_resnet_blocks.{i}.ffn.1", dtype)}
            for i in range(num_blocks)
        ],
        "ln_out": port_layer_norm(get, prefix + "layer_norm2", dtype),
        "fc_out": port_linear(get, prefix + "fc2", dtype),
    }


def dict_getter(state_dict: Mapping[str, Any]) -> Callable[[str], np.ndarray]:
    def get(name: str) -> np.ndarray:
        if name not in state_dict:
            raise KeyError(name)
        return _np(state_dict[name])

    return get
