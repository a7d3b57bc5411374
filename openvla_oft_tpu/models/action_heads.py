"""Continuous action heads: L1 regression and DDIM diffusion.

Reference: `prismatic/models/action_heads.py:38-211`. The MLPResNet trunk is
LayerNorm -> Linear -> ReLU -> 2x(pre-LN residual block) -> LayerNorm -> Linear.
Action hidden states (B, chunk*dim, llm_dim) are regrouped per time step to
(B, chunk, dim*llm_dim) before the trunk.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from openvla_oft_tpu.constants import PlatformSpec
from openvla_oft_tpu.ops.ddim import DDIMScheduler
from openvla_oft_tpu.ops.layers import init_layer_norm, init_linear, layer_norm, linear

Params = Dict[str, Any]


# === MLPResNet trunk (action_heads.py:38-84) ===
def init_mlp_resnet(key, input_dim: int, hidden_dim: int, output_dim: int,
                    num_blocks: int = 2, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, num_blocks + 2)
    return {
        "ln_in": init_layer_norm(input_dim, dtype),
        "fc_in": init_linear(ks[0], input_dim, hidden_dim, dtype),
        "blocks": [
            {"ln": init_layer_norm(hidden_dim, dtype),
             "fc": init_linear(ks[1 + i], hidden_dim, hidden_dim, dtype)}
            for i in range(num_blocks)
        ],
        "ln_out": init_layer_norm(hidden_dim, dtype),
        "fc_out": init_linear(ks[-1], hidden_dim, output_dim, dtype),
    }


def mlp_resnet(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = layer_norm(p["ln_in"], x, eps=1e-5)
    x = jax.nn.relu(linear(p["fc_in"], x))
    for blk in p["blocks"]:
        x = x + jax.nn.relu(linear(blk["fc"], layer_norm(blk["ln"], x, eps=1e-5)))
    x = layer_norm(p["ln_out"], x, eps=1e-5)
    return linear(p["fc_out"], x)


def _regroup_hidden(actions_hidden: jnp.ndarray, platform: PlatformSpec) -> jnp.ndarray:
    """(B, chunk*dim, D) -> (B, chunk, dim*D) — reference reshape
    (action_heads.py:104, 204)."""
    b = actions_hidden.shape[0]
    return actions_hidden.reshape(b, platform.num_actions_chunk, -1)


# === L1 regression head (action_heads.py:84-107) ===
def init_l1_head(key, platform: PlatformSpec, llm_dim: int = 4096,
                 hidden_dim: int = 4096, dtype=jnp.float32) -> Params:
    return {"model": init_mlp_resnet(key, llm_dim * platform.action_dim, hidden_dim,
                                     platform.action_dim, dtype=dtype)}


def l1_head_predict(p: Params, actions_hidden: jnp.ndarray,
                    platform: PlatformSpec) -> jnp.ndarray:
    """(B, chunk*dim, llm_dim) -> normalized actions (B, chunk, dim)."""
    return mlp_resnet(p["model"], _regroup_hidden(actions_hidden, platform))


# === Sinusoidal diffusion-timestep encoder (action_heads.py:12-35) ===
def sinusoidal_time_encoding(timesteps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(B,) -> (B, dim); exponent spacing matches the reference exactly
    (-log(10000)/(half-1) * arange(half))."""
    half = dim // 2
    exponent = jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


# === Diffusion head (action_heads.py:110-211) ===
def init_diffusion_head(key, platform: PlatformSpec, llm_dim: int = 4096,
                        hidden_dim: int = 4096, num_diffusion_steps: int = 100,
                        dtype=jnp.float32) -> Params:
    del num_diffusion_steps  # carried in TrainConfig / PolicyConfig, not params
    return {
        "noise_predictor": init_mlp_resnet(
            key, hidden_dim * platform.action_dim, hidden_dim, platform.action_dim,
            dtype=dtype),
    }


def diffusion_scheduler(num_diffusion_steps: int = 100) -> DDIMScheduler:
    return DDIMScheduler(num_train_timesteps=num_diffusion_steps)


def diffusion_predict_noise(p: Params, actions_hidden: jnp.ndarray,
                            platform: PlatformSpec) -> jnp.ndarray:
    """(B, chunk*dim, llm_dim) -> predicted noise (B, chunk, dim)."""
    return mlp_resnet(p["noise_predictor"], _regroup_hidden(actions_hidden, platform))


def diffusion_sample_noisy_actions(
    p: Params, key, gt_actions: jnp.ndarray, platform: PlatformSpec,
    llm_dim: int = 4096, num_diffusion_steps: int = 100,
) -> Dict[str, jnp.ndarray]:
    """Training-side forward diffusion (action_heads.py:166-196): sample noise
    and a timestep per example, produce noisy actions + timestep embeddings."""
    b = gt_actions.shape[0]
    k_noise, k_t = jax.random.split(key)
    sched = diffusion_scheduler(num_diffusion_steps)
    noise = jax.random.normal(
        k_noise, (b, platform.num_actions_chunk, platform.action_dim),
        dtype=jnp.float32).astype(gt_actions.dtype)
    timesteps = jax.random.randint(k_t, (b,), 0, num_diffusion_steps)
    noisy = sched.add_noise(gt_actions, noise, timesteps)
    t_emb = sinusoidal_time_encoding(timesteps, llm_dim).astype(gt_actions.dtype)
    return {"noise": noise, "noisy_actions": noisy,
            "diffusion_timestep_embeddings": t_emb[:, None, :]}
