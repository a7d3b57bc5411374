"""Quantization accuracy calibration (int8/int4 vs bf16).

The reference exposes `load_in_8bit/4bit` with no accuracy tooling
(openvla_utils.py:282-303 just wires bitsandbytes). Serving int8 as the
*default* config demands an argument, so this module measures:

  1. per-layer weight quantization error for every quantized projection
     (relative Frobenius error of dequant(quant(W)) - W), flagging outlier
     layers that would justify a mixed-precision fallback;
  2. stage-wise activation drift (ViT features, projector output, action-slot
     hidden states) between the bf16 and quantized model on the same inputs;
  3. the end-to-end metric that matters: L1 delta of predicted actions in
     normalized action space, compared against two floors —
       - the reference's own discrete-token bin half-width (1/255 ~ 3.9e-3):
         deltas below it are smaller than the error the reference's discrete
         mode *bakes in by design*;
       - the converged training L1 (~6e-3 on LIBERO-Spatial, LIBERO.md:119):
         deltas well below it vanish inside model noise.

`calibrate` works on any parameter tree (random-init or ported checkpoints);
`vla_scripts/calibrate_quant.py` is the CLI.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openvla_oft_tpu.config import OpenVLAConfig
from openvla_oft_tpu.constants import PlatformSpec
from openvla_oft_tpu.ops.quant import (
    _unpack_int4,
    quantize_weight,
    quantize_weight_int4,
)

# accuracy floors the end-to-end delta is judged against
DISCRETE_BIN_HALF_WIDTH = (2.0 / 255.0) / 2.0   # reference action tokenizer
TRAIN_L1_FLOOR = 6e-3                           # LIBERO.md:119 plateau


def _rel_err(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def _one_layer_err(w: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Relative Frobenius error of dequant(quant(w)) - w for one (in, out)
    kernel — runs fully on device (the 7B tree never crosses the host)."""
    wf = w.astype(jnp.float32)
    if bits == 8:
        q = quantize_weight(wf)
        deq = q["kernel"].astype(jnp.float32) * q["scale_w"][None, :]
    else:
        q = quantize_weight_int4(wf)
        unpacked = _unpack_int4(q["kernel_q4"]).astype(jnp.float32)
        scale = q["scale_w4"]
        groups = scale.shape[-2]
        d_in = unpacked.shape[-2]
        deq = (unpacked.reshape(groups, d_in // groups, -1)
               * scale[:, None, :]).reshape(wf.shape)
    num = jnp.linalg.norm(deq - wf)
    return num / (jnp.linalg.norm(wf) + 1e-12)


def weight_quant_errors(params: Dict[str, Any], min_dim: int = 1024,
                        bits: int = 8) -> Dict[str, List[float]]:
    """Per-layer relative weight error for every kernel that would quantize.

    Stacked kernels (L, in, out) report one value per layer so outlier layers
    surface individually. Returns {path: [err_layer0, ...]}. Computation is
    per-layer on device (one layer of fp32 transient memory).
    """
    import functools

    err_flat = jax.jit(functools.partial(_one_layer_err, bits=bits))
    err_stacked = jax.jit(
        lambda k: jax.lax.map(functools.partial(_one_layer_err, bits=bits), k))
    out: Dict[str, List[float]] = {}

    def visit(node, path):
        if isinstance(node, dict):
            k = node.get("kernel")
            if (k is not None and hasattr(k, "ndim") and k.ndim >= 2
                    and k.dtype != jnp.int8 and k.shape[-2] >= min_dim):
                if k.ndim == 2:
                    out[path] = [float(err_flat(k))]
                else:
                    out[path] = [float(e) for e in np.asarray(err_stacked(k))]
                return
            for key, v in node.items():
                visit(v, f"{path}/{key}" if path else key)

    visit(params, "")
    return out


def calibrate(
    cfg: OpenVLAConfig,
    platform: PlatformSpec,
    params: Dict[str, Any],
    observations: Sequence[Dict[str, jnp.ndarray]],
    bits: int = 8,
    min_dim: int = 1024,
    quant_modules: Sequence[str] = ("llm", "vision_backbone", "projector"),
    use_fused: bool = True,
    low_memory: bool = False,
    weight_errors: bool = True,
) -> Dict[str, Any]:
    """Full calibration report for a parameter tree.

    observations: dicts with input_ids (B,L), prompt_mask (B,L),
    pixels (B,N,2,H,W,3), proprio (B,P) or None.

    low_memory: run two passes and quantize by DONATING the bf16 kernels
    (ops/quant.py::quantize_tree_lowmem) — required on a 16 GB chip for the
    7B model, whose bf16 and int8 trees cannot coexist. CONSUMES `params`.
    Only bits=8 is supported in this mode.
    """
    from openvla_oft_tpu.models.action_heads import l1_head_predict
    from openvla_oft_tpu.models.llama import fuse_inference_weights
    from openvla_oft_tpu.models.prismatic import predict_action_hidden
    from openvla_oft_tpu.models.vision_backbone import vision_backbone_forward
    from openvla_oft_tpu.models.projector import vision_projector
    from openvla_oft_tpu.ops.quant import quantize_tree, quantize_tree_lowmem

    base = dict(params)
    if use_fused and not low_memory and "layers" in base.get("llm", {}):
        # Concat-only fusion (fold_norms=False): quantization-exact vs
        # unfused — each output column quantizes independently, so the
        # low_memory mode's unfused calibration describes the same int8
        # model. (A norm-scale fold would NOT be: it scales kernel rows.)
        base["llm"] = fuse_inference_weights(base["llm"], fold_norms=False)

    # weight errors first: per-layer, on-device, tiny transients.
    # weight_errors=False skips the pass: at 7B-bf16-resident + bits=4 the
    # per-layer quantize/dequant transients tip the 16 GB chip over
    # (measured RESOURCE_EXHAUSTED); the activation/action deltas below are
    # the quantities that matter.
    w_err = {}
    if weight_errors:
        for mod in quant_modules:
            if mod in base:
                for path, errs in weight_quant_errors(
                        base[mod], min_dim=min_dim, bits=bits).items():
                    w_err[f"{mod}/{path}"] = errs

    @jax.jit
    def stages(p, obs):
        feats = vision_backbone_forward(p["vision_backbone"], cfg,
                                        obs["pixels"])
        proj = vision_projector(p["projector"], feats)
        out = predict_action_hidden(
            p, cfg, platform, input_ids=obs["input_ids"],
            prompt_mask=obs["prompt_mask"], pixels=obs["pixels"],
            proprio=obs.get("proprio"))
        actions = l1_head_predict(p["action_head"],
                                  out.actions_hidden.astype(jnp.float32),
                                  platform)
        return feats, proj, out.actions_hidden, actions

    feat_err, proj_err, hidden_err, deltas = [], [], [], []
    if low_memory:
        ref = [jax.tree_util.tree_map(np.asarray, stages(base, obs))
               for obs in observations]
        for mod in quant_modules:
            if mod in base:
                base[mod] = quantize_tree_lowmem(base[mod], min_dim=min_dim,
                                                 bits=bits)
        for obs, (f0, p0, h0, a0) in zip(observations, ref):
            f1, p1, h1, a1 = stages(base, obs)
            feat_err.append(_rel_err(f1, f0))
            proj_err.append(_rel_err(p1, p0))
            hidden_err.append(_rel_err(h1, h0))
            deltas.append(np.abs(np.asarray(a1, np.float64)
                                 - np.asarray(a0, np.float64)))
    else:
        qparams = dict(base)
        for mod in quant_modules:
            if mod in qparams:
                qparams[mod] = quantize_tree(qparams[mod], min_dim=min_dim,
                                             bits=bits)
        for obs in observations:
            f0, p0, h0, a0 = stages(base, obs)
            f1, p1, h1, a1 = stages(qparams, obs)
            feat_err.append(_rel_err(f1, f0))
            proj_err.append(_rel_err(p1, p0))
            hidden_err.append(_rel_err(h1, h0))
            deltas.append(np.abs(np.asarray(a1, np.float64)
                                 - np.asarray(a0, np.float64)))
    deltas = np.stack(deltas)

    flat_w = [(k, i, e) for k, errs in w_err.items()
              for i, e in enumerate(errs)]
    flat_w.sort(key=lambda t: -t[2])
    report = {
        "bits": bits,
        "n_observations": len(observations),
        "weight_error": {
            "max": flat_w[0][2] if flat_w else 0.0,
            "mean": float(np.mean([e for _, _, e in flat_w])) if flat_w else 0.0,
            "worst_layers": [
                {"param": k, "layer": i, "rel_err": round(e, 5)}
                for k, i, e in flat_w[:8]],
        },
        "activation_rel_error": {
            "vit_features": float(np.mean(feat_err)),
            "projector": float(np.mean(proj_err)),
            "action_hidden": float(np.mean(hidden_err)),
        },
        "action_l1": {
            "mean": float(deltas.mean()),
            "max": float(deltas.max()),
            "p99": float(np.percentile(deltas, 99)),
        },
        "floors": {
            "discrete_bin_half_width": DISCRETE_BIN_HALF_WIDTH,
            "train_l1_floor": TRAIN_L1_FLOOR,
        },
    }
    report["verdict"] = {
        "below_discrete_floor":
            report["action_l1"]["mean"] < DISCRETE_BIN_HALF_WIDTH,
        "below_train_floor":
            report["action_l1"]["mean"] < TRAIN_L1_FLOOR,
    }
    return report


def attach_static_act_scales(
    params: Dict[str, Any],
    cfg: OpenVLAConfig,
    platform: PlatformSpec,
    observations: Sequence[Dict[str, jnp.ndarray]],
    margin: float = 1.0,
) -> Dict[str, Any]:
    """Calibrate static per-layer activation scales for the int8 LLM and
    attach them as stacked (L,) float32 "scale_x" leaves.

    Runs the serving forward (`predict_action_hidden` assembly — same
    embeddings, masks and layout as inference) in absmax-collection mode over
    the calibration observations, takes the elementwise max across them, and
    writes scale_x = margin * absmax / 127 next to every int8 kernel in
    `params["llm"]["layers"]`. Layers that aren't int8-quantized are skipped.
    Every lax.scan over the stacked layer tree (full forward, prefill,
    suffix step, decode step) then slices the (L,) leaf to the per-layer
    scalar that switches `int8_linear` onto the static path — the diffusion
    serving loop's per-step absmax-reduction fix (docs/PERFORMANCE.md).

    observations: dicts like `random_observations` produces; optional
    "noisy_actions"/"diffusion_t_emb" entries calibrate the diffusion
    geometry. Returns a new params dict (llm layer dicts rebuilt; arrays
    shared). Call AFTER quantization + weight fusion so the collected stat
    keys match the serving layout (wqkv/gate_up vs wq/wk/wv/gate/up).
    """
    from openvla_oft_tpu.models.prismatic import predict_action_hidden

    @jax.jit
    def run(p, obs):
        _, stats = predict_action_hidden(
            p, cfg, platform, input_ids=obs["input_ids"],
            prompt_mask=obs["prompt_mask"], pixels=obs["pixels"],
            proprio=obs.get("proprio"),
            noisy_actions=obs.get("noisy_actions"),
            diffusion_t_emb=obs.get("diffusion_t_emb"),
            collect_act_stats=True)
        return stats

    agg = None
    for obs in observations:
        stats = jax.tree_util.tree_map(np.asarray, run(params, obs))
        agg = stats if agg is None else jax.tree_util.tree_map(
            np.maximum, agg, stats)

    layers = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in params["llm"]["layers"].items()}
    attached = []
    for group, group_stats in agg.items():
        for key, absmax in group_stats.items():
            node = layers.get(group, {}).get(key)
            if not isinstance(node, dict):
                continue
            k = node.get("kernel")
            if k is None or k.dtype != jnp.int8:
                continue
            layers[group] = dict(layers[group])
            layers[group][key] = {
                **node,
                "scale_x": jnp.asarray(margin * absmax / 127.0, jnp.float32),
            }
            attached.append(f"{group}/{key}")
    assert attached, "no int8 kernels found to attach static scales to"
    out = dict(params)
    out["llm"] = {**params["llm"], "layers": layers}
    return out


def attach_placeholder_act_scales(llm_params: Dict[str, Any],
                                  value: float = 0.05) -> Dict[str, Any]:
    """Attach uniform (L,) "scale_x" leaves to every int8 kernel in an LLM
    tree WITHOUT running calibration.

    Timing-equivalent to `attach_static_act_scales` (the static int8 path's
    cost doesn't depend on scale values), so benches use this to measure the
    static-scale serving speed without a calibration forward; production
    serving must use the calibrated attach for correct numerics.
    """
    layers = {}
    n = 0
    for group, node in llm_params["layers"].items():
        if not isinstance(node, dict):
            layers[group] = node
            continue
        new_group = {}
        for key, leaf in node.items():
            if (isinstance(leaf, dict) and "kernel" in leaf
                    and leaf["kernel"].dtype == jnp.int8):
                L = leaf["kernel"].shape[0] if leaf["kernel"].ndim == 3 else ()
                sx = (jnp.full((L,), value, jnp.float32) if L != ()
                      else jnp.asarray(value, jnp.float32))
                new_group[key] = {**leaf, "scale_x": sx}
                n += 1
            else:
                new_group[key] = leaf
        layers[group] = new_group
    assert n, "no int8 kernels found"
    return {**llm_params, "layers": layers}


def random_observations(cfg: OpenVLAConfig, platform: PlatformSpec,
                        n: int = 4, seed: int = 0,
                        prompt_bucket: int = 48) -> List[Dict[str, jnp.ndarray]]:
    """Synthetic calibration inputs at serving geometry (real images/prompts
    slot in through the same dict shape when available)."""
    rng = np.random.default_rng(seed)
    size = cfg.vision_configs[0].image_size
    nb = len(cfg.vision_configs)
    obs = []
    for i in range(n):
        ln = int(rng.integers(16, prompt_bucket - 1))
        ids = np.zeros((1, prompt_bucket), np.int32)
        ids[0, -ln:] = rng.integers(3, 30000, ln)
        ids[0, -ln] = 1
        ids[0, -1] = 29871
        mask = np.zeros((1, prompt_bucket), np.int32)
        mask[0, -ln:] = 1
        pixels = rng.standard_normal(
            (1, cfg.num_images_in_input, nb, size, size, 3)) * 0.5
        obs.append({
            "input_ids": jnp.asarray(ids),
            "prompt_mask": jnp.asarray(mask),
            "pixels": jnp.asarray(pixels, jnp.bfloat16),
            "proprio": jnp.asarray(
                rng.standard_normal((1, platform.proprio_dim)), jnp.float32),
        })
    return obs
