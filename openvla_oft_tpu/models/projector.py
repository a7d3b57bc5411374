"""Projector MLPs: vision->LLM, proprio->LLM, noisy-action->LLM.

References: `prismatic/extern/hf/modeling_prismatic.py:231-262`
(PrismaticProjector), `prismatic/models/projectors.py:6-49`
(ProprioProjector, NoisyActionProjector).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from openvla_oft_tpu.ops.layers import gelu, init_linear, linear

Params = Dict[str, Any]


def init_vision_projector(key, vision_dim: int, llm_dim: int, fused: bool = True,
                          dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    if fused:
        # 3-layer GELU MLP: vision -> 4*vision -> llm -> llm (modeling_prismatic.py:243-248)
        return {
            "fc1": init_linear(ks[0], vision_dim, 4 * vision_dim, dtype),
            "fc2": init_linear(ks[1], 4 * vision_dim, llm_dim, dtype),
            "fc3": init_linear(ks[2], llm_dim, llm_dim, dtype),
        }
    return {
        "fc1": init_linear(ks[0], vision_dim, llm_dim, dtype),
        "fc2": init_linear(ks[1], llm_dim, llm_dim, dtype),
    }


def vision_projector(p: Params, patches: jnp.ndarray,
                     fast_gelu: bool = False) -> jnp.ndarray:
    """(B, N, vision_dim) -> (B, N, llm_dim).

    fast_gelu swaps exact erf-GELU for the sub-bf16-ulp logistic form
    (ops/layers.py::gelu_erf_fast) on the serving path."""
    act = gelu
    if fast_gelu:
        from openvla_oft_tpu.ops.layers import gelu_erf_fast

        act = gelu_erf_fast
    x = act(linear(p["fc1"], patches))
    x = linear(p["fc2"], x)
    if "fc3" in p:
        x = linear(p["fc3"], act(x))
    return x


def init_proprio_projector(key, proprio_dim: int, llm_dim: int,
                           dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, proprio_dim, llm_dim, dtype),
            "fc2": init_linear(k2, llm_dim, llm_dim, dtype)}


def proprio_projector(p: Params, proprio: jnp.ndarray) -> jnp.ndarray:
    """(B, proprio_dim) -> (B, llm_dim)."""
    return linear(p["fc2"], gelu(linear(p["fc1"], proprio)))


def init_noisy_action_projector(key, llm_dim: int, dtype=jnp.float32) -> Params:
    # Each scalar action dim is its own token: input dim 1 (projectors.py:27-49).
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, 1, llm_dim, dtype),
            "fc2": init_linear(k2, llm_dim, llm_dim, dtype)}


def noisy_action_projector(p: Params, noisy_actions: jnp.ndarray) -> jnp.ndarray:
    """(B, chunk_len*action_dim, 1) -> (B, chunk_len*action_dim, llm_dim)."""
    return linear(p["fc2"], gelu(linear(p["fc1"], noisy_actions)))
