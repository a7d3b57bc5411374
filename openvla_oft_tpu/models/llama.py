"""Llama-2 decoder, TPU-native functional implementation.

Replaces the reference's dependency on the HF transformers fork
(`moojink/transformers-openvla-oft`, reference pyproject.toml:52): a standard
Llama-2 stack (RMSNorm -> RoPE attention -> SwiGLU) plus the one non-standard
feature OFT needs — *block-bidirectional attention over the action-chunk
tokens* (causal prefix, fully-visible action block), passed in as an explicit
per-position `bidir_mask` instead of being hidden inside a forked library.

Weight layout: params["layers"] is a *stacked* pytree — every per-layer array
carries a leading (num_layers,) axis and the forward pass runs under
`jax.lax.scan`. This compiles 32 layers as one program block (fast compiles),
makes fsdp/tp sharding rules uniform, and is the idiomatic JAX shape for
pipeline/parameter sharding.

Matches HF `LlamaModel` numerics: hidden states returned *after* the final
RMSNorm (the reference slices `hidden_states[-1]`, modeling_prismatic.py:916).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from openvla_oft_tpu.config import LlamaConfig
from openvla_oft_tpu.ops.attention import attention
from openvla_oft_tpu.ops.layers import init_rms_norm, linear, rms_norm
from openvla_oft_tpu.ops.masks import make_block_bidirectional_mask
from openvla_oft_tpu.ops.rotary import apply_rope, rope_sin_cos

Params = Dict[str, Any]


def resolve_remat_policy(name: Optional[str]):
    """Map a remat-policy name to a `jax.checkpoint` policy.

    - None / "all": recompute everything in backward (minimum HBM; the
      round-2 default that trains 7B QLoRA on one 16 GB chip at batch 1).
    - "dots": save matmul outputs (`dots_with_no_batch_dims_saveable`) —
      trades ~2 GB/batch-element of saved activations at LIBERO geometry for
      skipping the forward recompute; the lever for the measured b>=2 MFU
      droop (docs/PERFORMANCE.md "Single-chip 7B training").
    - "none" is handled by the model entry points (remat skipped entirely);
      it never reaches this resolver.
    """
    if name is None or name == "all":
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "attn_out":
        # Save ONLY the tagged per-layer attention outputs (~10 MB/layer at
        # b=2 LIBERO vs the ~60 MB/layer "dots" spends): the backward skips
        # recomputing qkv projections + RoPE + the attention einsums — the
        # lowest-MFU part of the recompute — while the big MLP intermediates
        # are still recomputed, keeping HBM close to the "all" floor.
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    raise ValueError(
        f"Unknown remat policy {name!r} (use 'all', 'dots' or 'attn_out'; "
        f"'none' disables remat at the llama_model/phi_model call sites)")


# === Init ===
def init_llama_params(key, cfg: LlamaConfig, dtype=jnp.bfloat16) -> Params:
    """Random init with stacked per-layer arrays (porting overwrites these)."""
    h, kv = cfg.num_heads, cfg.num_kv_heads
    d, hd, inter, L = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size, cfg.num_layers
    ks = jax.random.split(key, 8)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in ** -0.5).astype(dtype)

    layers = {
        "attn": {
            "wq": {"kernel": w(ks[0], (L, d, h * hd), d)},
            "wk": {"kernel": w(ks[1], (L, d, kv * hd), d)},
            "wv": {"kernel": w(ks[2], (L, d, kv * hd), d)},
            "wo": {"kernel": w(ks[3], (L, h * hd, d), h * hd)},
        },
        "mlp": {
            "gate": {"kernel": w(ks[4], (L, d, inter), d)},
            "up": {"kernel": w(ks[5], (L, d, inter), d)},
            "down": {"kernel": w(ks[6], (L, inter, d), inter)},
        },
        "attn_norm": {"scale": jnp.ones((L, d), dtype)},
        "mlp_norm": {"scale": jnp.ones((L, d), dtype)},
    }
    return {
        "embed": {"embedding": w(ks[7], (cfg.vocab_size, d), d)},
        "layers": layers,
        "final_norm": init_rms_norm(d, dtype),
        "lm_head": {"kernel": w(ks[7], (d, cfg.vocab_size), d)},
    }


def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"]["embedding"], input_ids, axis=0)


def fuse_inference_weights(llm_params: Params,
                           fold_norms: bool = True) -> Params:
    """Concatenate wq/wk/wv -> wqkv and gate/up -> gate_up on the output dim
    (leading stacked-layer axis preserved).

    Serving-path optimization for the OFT single-prefill flow: one matmul
    feeds the MXU a (d, (h+2kv)*hd) tile instead of three smaller ones, and —
    decisive for int8 — the activation is quantized and dequantized ONCE per
    projection group. With `fold_norms` the RMSNorm learned scales
    additionally fold into the fused kernels ((standardize(x)*g) @ W =
    standardize(x) @ (diag(g) W), numerics-exact up to fp reassociation) —
    each fold deletes one full VPU pass over the (S, d) activations per
    layer; `ops.layers.rms_norm` keeps only the standardization when the
    scale is absent. Pass fold_norms=False when the result will be int8
    per-output-channel quantized: the fold scales kernel ROWS by gamma, which
    inflates column absmax via Llama's gamma outlier channels and coarsens
    the quantization grid — concat-only fusion is quantization-exact (each
    output column quantizes independently), so the calibration evidence
    (docs/QUANTIZATION.md) keeps describing the deployed int8 model. Apply
    AFTER any LoRA merge (LoRA factors address the unfused names). The
    KV-cache AR path handles fused+folded trees too (`_qkv_proj`, scale-less
    `rms_norm`). Phi-family trees (no attn_norm/mlp_norm split) are returned
    unchanged.
    """
    layers = llm_params["layers"]
    attn, mlp = layers["attn"], layers["mlp"]
    if "attn_norm" not in layers:
        # Phi-family trees ({attn, mlp, ln}: parallel blocks, biased
        # projections) take neither the concat nor the norm fold — no-op,
        # as before round 3.
        return llm_params
    if any("lora" in key for sub in (attn, mlp)
           for leaf in sub.values() for key in leaf):
        raise ValueError("fuse_inference_weights after LoRA merge, not before")
    f32 = jnp.float32

    def fold(norm, kernel):
        if not fold_norms:
            return kernel
        g = norm["scale"].astype(f32)[..., None]           # (L, d, 1)
        return (kernel.astype(f32) * g).astype(kernel.dtype)

    new_attn, new_mlp = dict(attn), dict(mlp)
    attn_norm, mlp_norm = layers["attn_norm"], layers["mlp_norm"]
    if "wq" in attn and "bias" not in attn["wq"]:
        wqkv = jnp.concatenate([attn["wq"]["kernel"], attn["wk"]["kernel"],
                                attn["wv"]["kernel"]], axis=-1)
        new_attn = {"wqkv": {"kernel": fold(attn_norm, wqkv)},
                    "wo": attn["wo"]}
        if fold_norms:
            attn_norm = {}
    if "gate" in mlp and "bias" not in mlp["gate"]:
        gate_up = jnp.concatenate([mlp["gate"]["kernel"],
                                   mlp["up"]["kernel"]], axis=-1)
        new_mlp = {"gate_up": {"kernel": fold(mlp_norm, gate_up)},
                   "down": mlp["down"]}
        if fold_norms:
            mlp_norm = {}
    return {**llm_params,
            "layers": {**layers, "attn": new_attn, "mlp": new_mlp,
                       "attn_norm": attn_norm, "mlp_norm": mlp_norm}}


# === Forward ===
def _block(
    p: Params,
    cfg: LlamaConfig,
    x: jnp.ndarray,
    sin: jnp.ndarray,
    cos: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    is_causal: bool,
    use_flash: bool,
    bidir_block: Optional[tuple],
    key_valid: Optional[jnp.ndarray] = None,
    bidir_1d: Optional[jnp.ndarray] = None,
    tp_mesh=None,
    collect_act_stats: bool = False,
) -> jnp.ndarray:
    b, s, d = x.shape
    h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    xa = rms_norm(p["attn_norm"], x, cfg.rms_norm_eps)
    q, k, v = _qkv_proj(p["attn"], cfg, xa)
    q = apply_rope(q, sin, cos)
    k = apply_rope(k, sin, cos)
    o = attention(q, k, v, mask=mask, is_causal=is_causal, use_flash=use_flash,
                  key_valid=key_valid, bidir_mask=bidir_1d,
                  bidir_block=bidir_block, tp_mesh=tp_mesh)
    # Tag for the "attn_out" remat policy (no-op under other policies).
    o = checkpoint_name(o, "attn_out")
    o_flat = o.reshape(b, s, h * hd)
    x = x + linear(p["attn"]["wo"], o_flat)

    xm = rms_norm(p["mlp_norm"], x, cfg.rms_norm_eps)
    if not collect_act_stats:
        return x + _mlp(p["mlp"], xm)

    # Static-quant calibration mode: also emit per-linear input absmaxes,
    # keyed by the same paths the param tree uses so the collected (L,)
    # stacks attach as "scale_x" leaves directly (ops/quant_calibrate.py::
    # attach_static_act_scales). Scalars only — no activation tensor leaves
    # the scan body.
    y_mlp, down_am = _mlp(p["mlp"], xm, collect_act=True)

    def _am(a):
        return jnp.max(jnp.abs(a.astype(jnp.float32)))

    am_xa, am_o, am_xm = _am(xa), _am(o_flat), _am(xm)
    attn_stats = ({"wqkv": am_xa} if "wqkv" in p["attn"]
                  else {"wq": am_xa, "wk": am_xa, "wv": am_xa})
    attn_stats["wo"] = am_o
    mlp_stats = ({"gate_up": am_xm} if "gate_up" in p["mlp"]
                 else {"gate": am_xm, "up": am_xm})
    mlp_stats["down"] = down_am
    return x + y_mlp, {"attn": attn_stats, "mlp": mlp_stats}


def _qkv_proj(attn: Params, cfg: LlamaConfig, xa: jnp.ndarray):
    """q/k/v projections, handling the inference-fused wqkv layout
    (fuse_inference_weights): ONE matmul and ONE activation-quant/dequant
    epilogue instead of three."""
    b, s, _ = xa.shape
    h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "wqkv" in attn:
        qkv = linear(attn["wqkv"], xa)
        q = qkv[..., :h * hd].reshape(b, s, h, hd)
        k = qkv[..., h * hd:(h + kv) * hd].reshape(b, s, kv, hd)
        v = qkv[..., (h + kv) * hd:].reshape(b, s, kv, hd)
        return q, k, v
    return (linear(attn["wq"], xa).reshape(b, s, h, hd),
            linear(attn["wk"], xa).reshape(b, s, kv, hd),
            linear(attn["wv"], xa).reshape(b, s, kv, hd))


def _mlp(mlp: Params, xm: jnp.ndarray, collect_act: bool = False):
    """SwiGLU MLP, handling the inference-fused gate_up layout.

    collect_act: also return absmax of the down-projection's input (the silu
    gate product — the one linear input not visible from _block)."""
    if "gate_up" in mlp:
        gu = linear(mlp["gate_up"], xm)
        inter = gu.shape[-1] // 2
        act = jax.nn.silu(gu[..., :inter]) * gu[..., inter:]
    else:
        act = jax.nn.silu(linear(mlp["gate"], xm)) * linear(mlp["up"], xm)
    y = linear(mlp["down"], act)
    if collect_act:
        return y, jnp.max(jnp.abs(act.astype(jnp.float32)))
    return y


def _has_int4(layers: Params) -> bool:
    """True when any linear in the stacked layer tree is int4-packed."""
    def rec(d):
        return any(("kernel_q4" in v or rec(v)) if isinstance(v, dict)
                   else False for v in d.values())
    return rec(layers)


def _index_layer(layers: Params, i: jnp.ndarray) -> Params:
    """Per-layer params for a by-index scan step, int4-aware.

    Non-int4 leaves are dynamic-sliced at `i` (XLA fuses the slice into the
    consuming matmul — the proven body_by_index pattern above). int4-packed
    linears instead KEEP their stacked (L, in/2, out) leaves and gain a
    "layer_idx" entry: ops/quant.py::int4_linear routes them to the
    scalar-prefetch Pallas kernel (ops/int4_matmul.py), which streams weight
    blocks straight out of the stacked HBM buffer. Slicing them here would
    materialize a per-layer copy (custom calls can't fuse dynamic-slice),
    tripling the decode step's weight traffic — measured 23.1 vs 12.5 ms on
    v5e before this path existed."""
    def rec(d):
        out = {}
        for name, v in d.items():
            if isinstance(v, dict):
                if "kernel_q4" in v:
                    out[name] = {leaf_name: (leaf if leaf_name in
                                             ("kernel_q4", "scale_w4")
                                             else rec(leaf)
                                             if isinstance(leaf, dict)
                                             else leaf[i])
                                 for leaf_name, leaf in v.items()}
                    out[name]["layer_idx"] = i
                else:
                    out[name] = rec(v)
            else:
                out[name] = v[i]
        return out
    return rec(layers)


def llama_model(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray] = None,
    bidir_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    bidir_block: Optional[tuple] = None,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    unroll: int = 1,
    out_window: Optional[Tuple[int, int]] = None,
    tp_mesh=None,
    collect_act_stats: bool = False,
) -> jnp.ndarray:
    """Run the decoder stack; returns post-final-norm hidden states (B, S, D).

    bidir_mask: (B, S) bool marking action-chunk positions for the OFT mask.
    bidir_block: static (start, len) window — used by the flash kernel instead
      of a materialized (S, S) mask when batch padding is absent.
    attn_mask: fully explicit (B, 1|H, S, S) boolean mask; overrides the
      mask construction below (used by the inference logical-position layout).
    out_window: static (start, len) — when set, only rows
      [start, start+len) of the FINAL layer (and final norm) are computed and
      returned, (B, len, D). The OFT parallel-decode serving path reads only
      the action-slot hidden states (modeling_prismatic.py:916 slices
      hidden_states[-1] the same way), but every earlier layer still needs all
      rows as attention KEYS — so the saving is exactly the last layer's
      Q-side + MLP over the unread rows (~200 GFLOP ≈ 1 ms at LIBERO
      geometry). Numerics-identical to slicing the full output.
    """
    b, s, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    sin, cos = rope_sin_cos(positions, cfg.head_dim, cfg.rope_theta)

    is_causal = False
    key_valid = bidir_1d = None
    if attn_mask is not None:
        mask = attn_mask
        use_flash = False  # explicit dense mask -> XLA path
    elif use_flash:
        # Masking fused inside the Pallas kernel from 1D vectors.
        mask = None
        is_causal = True
        key_valid = padding_mask.astype(bool) if padding_mask is not None else None
        bidir_1d = bidir_mask
    elif bidir_mask is not None or bidir_block is not None:
        # Honor the static window on the dense path exactly like the flash
        # kernel (dropping it here would make semantics depend on which
        # backend the auto dispatch picked).
        if bidir_mask is None:
            w0, wl = bidir_block
            bidir_mask = jnp.zeros((b, s), bool).at[:, w0:w0 + wl].set(True)
        pad = padding_mask if padding_mask is not None else jnp.ones((b, s), bool)
        mask = make_block_bidirectional_mask(pad, bidir_mask)[:, None]  # (B,1,S,S)
    elif padding_mask is not None:
        mask = padding_mask[:, None, None, :]
        is_causal = True
    else:
        mask = None
        is_causal = True

    x = inputs_embeds

    if collect_act_stats:
        # Calibration mode (ops/quant_calibrate.py::attach_static_act_scales):
        # scan ys carry the per-layer input-absmax dicts, stacked to (L,)
        # leaves that mirror the param-tree layout.
        assert out_window is None and not remat, \
            "collect_act_stats is a calibration-only forward"

        def body_stats(carry, layer_params):
            return _block(layer_params, cfg, carry, sin, cos, mask, is_causal,
                          use_flash, bidir_block, key_valid=key_valid,
                          bidir_1d=bidir_1d, tp_mesh=tp_mesh,
                          collect_act_stats=True)

        x, stats = jax.lax.scan(body_stats, x, params["layers"], unroll=unroll)
        return rms_norm(params["final_norm"], x, cfg.rms_norm_eps), stats

    def body(carry, layer_params):
        y = _block(layer_params, cfg, carry, sin, cos, mask, is_causal, use_flash,
                   bidir_block, key_valid=key_valid, bidir_1d=bidir_1d,
                   tp_mesh=tp_mesh)
        return y, None

    if remat and remat_policy != "none":
        body = jax.checkpoint(body, prevent_cse=False,
                              policy=resolve_remat_policy(remat_policy))

    has_int4 = _has_int4(params["layers"])

    if out_window is None:
        if has_int4:
            # By-index scan keeps int4 kernels stacked (see _index_layer).
            L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
            x, _ = jax.lax.scan(
                lambda c, i: body(c, _index_layer(params["layers"], i)),
                x, jnp.arange(L), unroll=unroll)
        else:
            x, _ = jax.lax.scan(body, x, params["layers"], unroll=unroll)
        return rms_norm(params["final_norm"], x, cfg.rms_norm_eps)

    # Sliced final layer: scan layers [0, L-1), then run layer L-1 with
    # Q/MLP restricted to the output window (keys/values still full-width).
    # The head layers are indexed INSIDE the scan body — a host-side
    # `tree_map(lambda a: a[:L-1])` pre-slice compiles to a near-full copy of
    # the stacked weights (measured: +10 GB HBM at 7B, an instant OOM).
    w0, wl = out_window
    L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]

    def body_by_index(carry, i):
        lp = (_index_layer(params["layers"], i) if has_int4 else
              jax.tree_util.tree_map(lambda a: a[i], params["layers"]))
        return body(carry, lp)

    x, _ = jax.lax.scan(body_by_index, x, jnp.arange(L - 1), unroll=unroll)
    last = jax.tree_util.tree_map(lambda a: a[L - 1], params["layers"])

    # Dense mask rows for the window (exact same semantics as the full mask +
    # is_causal; the flash kernel is never worth it for <=chunk-width query
    # counts, so the sliced layer always takes the XLA path).
    if mask is not None and mask.shape[2] == s and not is_causal:
        # Full (B, 1|H, S, S) mask already encodes everything — take its rows.
        win_mask = jax.lax.dynamic_slice_in_dim(mask, w0, wl, axis=2)
    else:
        # Causal branches (flash 1-D vectors / padding-only / no mask):
        # rebuild the window rows exactly.
        kv_full = key_valid if key_valid is not None else padding_mask
        kv_full = jnp.ones((b, s), bool) if kv_full is None \
            else kv_full.astype(bool)
        if bidir_1d is None and bidir_block is not None:
            bw0, bwl = bidir_block
            bidir_1d = jnp.zeros((b, s), bool).at[:, bw0:bw0 + bwl].set(True)
        rows = w0 + jnp.arange(wl)
        allow = kv_full[:, None, :] & (
            jnp.arange(s)[None, None, :] <= rows[None, :, None])
        if bidir_1d is not None:
            allow = allow | (bidir_1d[:, rows][:, :, None]
                             & bidir_1d[:, None, :] & kv_full[:, None, :])
        win_mask = allow[:, None]

    h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    xa = rms_norm(last["attn_norm"], x, cfg.rms_norm_eps)
    xa_w = jax.lax.dynamic_slice_in_dim(xa, w0, wl, axis=1)
    x_w = jax.lax.dynamic_slice_in_dim(x, w0, wl, axis=1)
    if "wqkv" in last["attn"]:
        # Column-slice the fused projection into q|k|v param dicts so the
        # quantized formats keep their per-output-channel scales (`linear`
        # dispatches on dict contents — a raw kernel matmul would silently
        # drop int8/int4 scale_w and corrupt the quantized serving path).
        def col_slice(p, lo, hi):
            # Every per-linear leaf carries `out` as its LAST axis: kernel
            # (in, out), scale_w (out,), scale_w4 (in/group, out), bias (out,).
            return {name: leaf[..., lo:hi] for name, leaf in p.items()}

        wqkv = last["attn"]["wqkv"]
        q = linear(col_slice(wqkv, 0, h * hd), xa_w).reshape(b, wl, h, hd)
        k = linear(col_slice(wqkv, h * hd, (h + kv) * hd), xa
                   ).reshape(b, s, kv, hd)
        v = linear(col_slice(wqkv, (h + kv) * hd, (h + 2 * kv) * hd), xa
                   ).reshape(b, s, kv, hd)
    else:
        q = linear(last["attn"]["wq"], xa_w).reshape(b, wl, h, hd)
        k = linear(last["attn"]["wk"], xa).reshape(b, s, kv, hd)
        v = linear(last["attn"]["wv"], xa).reshape(b, s, kv, hd)
    sin_w = jax.lax.dynamic_slice_in_dim(sin, w0, wl, axis=1)
    cos_w = jax.lax.dynamic_slice_in_dim(cos, w0, wl, axis=1)
    q = apply_rope(q, sin_w, cos_w)
    k = apply_rope(k, sin, cos)
    o = attention(q, k, v, mask=win_mask)
    x_w = x_w + linear(last["attn"]["wo"], o.reshape(b, wl, h * hd))
    xm = rms_norm(last["mlp_norm"], x_w, cfg.rms_norm_eps)
    x_w = x_w + _mlp(last["mlp"], xm)
    return rms_norm(params["final_norm"], x_w, cfg.rms_norm_eps)


def lm_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project (post-norm) hidden states to vocab logits (fp32)."""
    return jnp.dot(hidden, params["lm_head"]["kernel"],
                   preferred_element_type=jnp.float32)


# === KV-cache autoregressive path (base-OpenVLA discrete decoding parity) ===
@dataclasses.dataclass
class KVCache:
    """Static-shape KV cache: k/v are (L, B, T_max, Hkv, Dh); index = filled
    length; valid marks real (non-pad) cached positions."""

    k: jnp.ndarray
    v: jnp.ndarray
    index: jnp.ndarray  # scalar int32
    valid: jnp.ndarray  # (B, T_max) bool

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((), jnp.int32), jnp.zeros((batch, max_len), bool))


jax.tree_util.register_dataclass(KVCache,
                                 data_fields=["k", "v", "index", "valid"],
                                 meta_fields=[])


def llama_prefill(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,
    cache: KVCache,
    positions: Optional[jnp.ndarray] = None,
    key_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Causal prefill that fills the cache; returns (hidden, cache).

    key_valid: (B, S) bool — False for (left-)padded positions, which are
    excluded as attention keys now and in later decode steps.
    """
    b, s, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    sin, cos = rope_sin_cos(positions, cfg.head_dim, cfg.rope_theta)
    h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if key_valid is None:
        key_valid = jnp.ones((b, s), bool)

    x = inputs_embeds

    def step(x, p):
        xa = rms_norm(p["attn_norm"], x, cfg.rms_norm_eps)
        q, k, v = _qkv_proj(p["attn"], cfg, xa)
        q, k = apply_rope(q, sin, cos), apply_rope(k, sin, cos)
        o = attention(q, k, v, is_causal=True, key_valid=key_valid)
        x = x + linear(p["attn"]["wo"], o.reshape(b, s, h * hd))
        xm = rms_norm(p["mlp_norm"], x, cfg.rms_norm_eps)
        return x + _mlp(p["mlp"], xm), (k.astype(cache.k.dtype),
                                        v.astype(cache.v.dtype))

    if _has_int4(params["layers"]):
        L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
        x, (ks, vs) = jax.lax.scan(
            lambda carry, i: step(carry, _index_layer(params["layers"], i)),
            x, jnp.arange(L))
    else:
        x, (ks, vs) = jax.lax.scan(lambda carry, p: step(carry, p),
                                   x, params["layers"])
    new_cache = KVCache(
        k=jax.lax.dynamic_update_slice(cache.k, ks, (0, 0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(cache.v, vs, (0, 0, 0, 0, 0)),
        index=jnp.asarray(s, jnp.int32),
        valid=jax.lax.dynamic_update_slice(cache.valid, key_valid, (0, 0)),
    )
    return rms_norm(params["final_norm"], x, cfg.rms_norm_eps), new_cache


def llama_suffix_forward(
    params: Params,
    cfg: LlamaConfig,
    suffix_embeds: jnp.ndarray,   # (B, S_suf, D)
    prefix_k: jnp.ndarray,        # (L, B, T_pre, Hkv, Dh) post-RoPE
    prefix_v: jnp.ndarray,        # (L, B, T_pre, Hkv, Dh)
    positions: jnp.ndarray,       # (B, S_suf) logical RoPE positions
    attn_mask: jnp.ndarray,       # (B, 1, S_suf, T_pre + S_suf) bool
) -> jnp.ndarray:
    """Forward over suffix rows attending to cached prefix K/V + themselves.

    The diffusion serving path's inner step (models/prismatic.py): the static
    [BOS][patches][proprio] prefix K/V is computed once by `llama_prefill` and
    every DDIM step re-runs only the ~(prompt+chunk) suffix rows — the
    reference instead rebuilds embeddings and reruns the full prefill per step
    (modeling_prismatic.py:827-860). Returns post-final-norm hidden states
    (B, S_suf, D).
    """
    import os as _os

    b, s, _ = suffix_embeds.shape
    h, hd = cfg.num_heads, cfg.head_dim
    sin, cos = rope_sin_cos(positions, cfg.head_dim, cfg.rope_theta)

    x = suffix_embeds

    # OPENVLA_SPLIT_KV=1 (trace-time): attend prefix and suffix K/V as two
    # online-softmax blocks (ops/attention.attention_split_kv) instead of
    # concatenating — skips the ~10 MB/layer/step concat write+reread, a
    # fixed cost that weighs more as the weight stream shrinks under quant.
    split_kv = _os.environ.get("OPENVLA_SPLIT_KV", "0") == "1"
    t_pre = prefix_k.shape[2]

    def step(x, p, pk, pv):
        xa = rms_norm(p["attn_norm"], x, cfg.rms_norm_eps)
        q, k, v = _qkv_proj(p["attn"], cfg, xa)
        q, k = apply_rope(q, sin, cos), apply_rope(k, sin, cos)
        if split_kv:
            from openvla_oft_tpu.ops.attention import attention_split_kv

            o = attention_split_kv(
                q, pk.astype(k.dtype), pv.astype(v.dtype), k, v,
                mask_pre=attn_mask[..., :t_pre],
                mask_suf=attn_mask[..., t_pre:])
        else:
            keys = jnp.concatenate([pk.astype(k.dtype), k], axis=1)
            vals = jnp.concatenate([pv.astype(v.dtype), v], axis=1)
            o = attention(q, keys, vals, mask=attn_mask)
        x = x + linear(p["attn"]["wo"], o.reshape(b, s, h * hd))
        xm = rms_norm(p["mlp_norm"], x, cfg.rms_norm_eps)
        return x + _mlp(p["mlp"], xm)

    if _has_int4(params["layers"]):
        # By-index scan: int4 weights stay stacked (see _index_layer).
        L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]

        def body_idx(carry, inputs):
            i, pk, pv = inputs
            return step(carry, _index_layer(params["layers"], i), pk, pv), None

        x, _ = jax.lax.scan(body_idx, x,
                            (jnp.arange(L), prefix_k, prefix_v))
    else:
        def body(carry, inputs):
            p, pk, pv = inputs
            return step(carry, p, pk, pv), None

        x, _ = jax.lax.scan(body, x, (params["layers"], prefix_k, prefix_v))
    return rms_norm(params["final_norm"], x, cfg.rms_norm_eps)


def llama_decode_step(
    params: Params,
    cfg: LlamaConfig,
    token_embed: jnp.ndarray,  # (B, 1, D)
    cache: KVCache,
    positions: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """One cached decode step. Returns (post-norm hidden (B, 1, D), cache)."""
    b = token_embed.shape[0]
    h, kv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    t_max = cache.k.shape[2]
    if positions is None:
        # Default RoPE position = number of REAL (valid) cached keys per row,
        # not the raw write index: with left-padded prefills the two differ
        # by each row's pad count and the uniform cache.index would overstate
        # every real token's rotary position.
        positions = jnp.sum(cache.valid, axis=1, keepdims=True
                            ).astype(jnp.int32)
    sin, cos = rope_sin_cos(positions, cfg.head_dim, cfg.rope_theta)
    new_valid = cache.valid | (jnp.arange(t_max)[None, :] == cache.index)
    mask = new_valid[:, None, None, :]  # (B, 1, 1, T)

    x = token_embed

    def step(x, p, ck, cv):
        xa = rms_norm(p["attn_norm"], x, cfg.rms_norm_eps)
        q, k, v = _qkv_proj(p["attn"], cfg, xa)
        q, k = apply_rope(q, sin, cos), apply_rope(k, sin, cos)
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache.index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache.index, 0, 0))
        o = attention(q, ck, cv, mask=mask)
        x = x + linear(p["attn"]["wo"], o.reshape(b, 1, h * hd))
        xm = rms_norm(p["mlp_norm"], x, cfg.rms_norm_eps)
        return x + _mlp(p["mlp"], xm), (ck, cv)

    if _has_int4(params["layers"]):
        L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]

        def body_idx(carry, inputs):
            i, ck, cv = inputs
            x, kv_out = step(carry, _index_layer(params["layers"], i), ck, cv)
            return x, kv_out

        x, (ks, vs) = jax.lax.scan(body_idx, x,
                                   (jnp.arange(L), cache.k, cache.v))
    else:
        def body(carry, inputs):
            p, ck, cv = inputs
            return step(carry, p, ck, cv)

        x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    new_cache = KVCache(k=ks, v=vs, index=cache.index + 1, valid=new_valid)
    return rms_norm(params["final_norm"], x, cfg.rms_norm_eps), new_cache
