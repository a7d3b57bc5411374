"""Functional neural-net layer primitives shared across the model stack.

Design: the whole model core is *functional* — parameters live in nested dicts
of `jnp.ndarray` (pytrees), and layers are pure functions `f(params, x)`.
This keeps pjit sharding rules path-based and weight porting trivial, and lets
XLA fuse aggressively (no framework overhead in the traced graph).

Numerics policy (matches torch reference semantics under bf16 autocast):
  - matmuls run in the input dtype (bf16 on TPU) with fp32 accumulation
    (`preferred_element_type`),
  - normalization statistics are computed in fp32,
  - softmax is computed in fp32 (see ops/attention.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W + b. Weights stored as (in, out) for natural sharding.

    Two transparent extensions dispatch on the param dict contents:
      - int8-quantized kernels (ops/quant.py) take the int8 MXU path;
      - injected LoRA factors ("lora_a" pre-scaled, "lora_b" — see
        training/lora.py::inject_lora) add scale*(x@A)@B *merge-free*, so no
        second full-size weight copy is ever materialized (the merge-based
        formulation costs an extra 14.8 GB HBM copy per step on the 7B).
    """
    if "kernel_q4" in p:
        from openvla_oft_tpu.ops.quant import int4_linear

        y = int4_linear(p, x)
    elif p["kernel"].dtype == jnp.int8:
        from openvla_oft_tpu.ops.quant import int8_linear

        y = int8_linear(p, x)
    else:
        y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
        y = y.astype(x.dtype)
    if "lora_a" in p:
        # lora_a is rank-major (…, r, in) — see training/lora.py::init_lora
        # for the TPU lane-padding rationale. The swapaxes folds into the
        # dot's dimension numbers (no materialized transpose).
        down = jnp.matmul(x, jnp.swapaxes(p["lora_a"], -1, -2).astype(x.dtype),
                          preferred_element_type=jnp.float32)
        delta = jnp.matmul(down.astype(x.dtype), p["lora_b"].astype(x.dtype),
                           preferred_element_type=jnp.float32)
        y = (y.astype(jnp.float32) + delta).astype(x.dtype)
    return y


def rms_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Llama RMSNorm: x * rsqrt(mean(x^2)+eps) * scale, stats in fp32.

    An empty param dict means the learned scale was folded into the following
    matmul (llama.fuse_inference_weights) — only the data-dependent
    standardization remains.
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    if "scale" not in p:
        return normed.astype(x.dtype)
    # HF LlamaRMSNorm casts back to input dtype *before* the scale multiply.
    return normed.astype(x.dtype) * p["scale"].astype(x.dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Standard LayerNorm with learned scale/bias, stats in fp32.

    An empty param dict means the affine was folded into the following matmul
    (models/vit.py::fuse_vit_inference_weights) — standardize only."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in p:
        normed = normed * p["scale"].astype(jnp.float32) \
            + p["bias"].astype(jnp.float32)
    return normed.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU — matches torch nn.GELU() default used by the
    reference's projectors (`modeling_prismatic.py:243-248`) and timm ViT MLPs."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's quick-GELU: x * sigmoid(1.702 x) (timm QuickGELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximated GELU (HF `gelu_new`/`gelu_pytorch_tanh`; SigLIP and
    Phi-2 MLP activation).

    tanh is evaluated as 1 - 2/(e^{2z}+1): XLA's tanh is a rational
    approximation with ~5e-5 absolute error near |z|≈2 (measured), which
    breaks fp32 parity tests against torch at 27-layer depth; the exp form
    matches torch/libm to <1e-6 at the same cost (one transcendental)."""
    z = 0.7978845608028654 * (x + 0.044715 * x * x * x)  # sqrt(2/pi)
    t = 1.0 - 2.0 / (jnp.exp(2.0 * z) + 1.0)
    return 0.5 * x * (1.0 + t)


def mlp_gelu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Two-layer GELU MLP: fc1 -> gelu -> fc2 (ViT MLP / ProprioProjector shape)."""
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def swiglu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Llama MLP: down( silu(gate(x)) * up(x) )."""
    g = linear(p["gate"], x)
    u = linear(p["up"], x)
    return linear(p["down"], jax.nn.silu(g) * u)


# === Initializers (inference/fine-tune stack; pretrain init lives in training/) ===
def _dense_init(key, shape, dtype, scale: float = 0.02):
    return scale * jax.random.normal(key, shape, dtype)


def init_linear(key, d_in: int, d_out: int, dtype=jnp.float32, bias: bool = True) -> Params:
    p: Params = {"kernel": _dense_init(key, (d_in, d_out), dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def init_layer_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rms_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}
