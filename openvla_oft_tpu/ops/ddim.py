"""Native JAX DDIM scheduler (squaredcos_cap_v2 betas).

TPU-native replacement for the reference's `diffusers.DDIMScheduler` dependency
(`prismatic/models/action_heads.py:8,163`). Reproduces diffusers' defaults as
constructed there: `DDIMScheduler(num_train_timesteps=T,
beta_schedule="squaredcos_cap_v2")` — i.e. epsilon prediction, clip_sample=True
(range 1.0), set_alpha_to_one=True, steps_offset=0, eta=0.

All schedule tables are precomputed NumPy constants; `add_noise` and `step` are
pure jnp functions, so the 50-step reverse-diffusion loop compiles to a single
`lax.scan` program (see models/prismatic.py).
"""

from __future__ import annotations

import dataclasses
import math
import numpy as np
import jax.numpy as jnp


def _squaredcos_cap_v2_betas(num_train_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Diffusers `betas_for_alpha_bar` with alpha_bar(t) = cos((t+0.008)/1.008 * pi/2)^2."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_train_timesteps):
        t1 = i / num_train_timesteps
        t2 = (i + 1) / num_train_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    num_train_timesteps: int = 100
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = True

    @property
    def alphas_cumprod(self) -> np.ndarray:
        betas = _squaredcos_cap_v2_betas(self.num_train_timesteps)
        return np.cumprod(1.0 - betas)

    @property
    def final_alpha_cumprod(self) -> float:
        return 1.0 if self.set_alpha_to_one else float(self.alphas_cumprod[0])

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps (diffusers "leading" spacing, offset 0)."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].copy()
        return ts.astype(np.int64)

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """Forward diffusion: sqrt(a_t) x0 + sqrt(1-a_t) eps. t: (B,) int."""
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)
        a_t = ac[t]
        while a_t.ndim < sample.ndim:
            a_t = a_t[..., None]
        return (jnp.sqrt(a_t) * sample.astype(jnp.float32)
                + jnp.sqrt(1.0 - a_t) * noise.astype(jnp.float32)).astype(sample.dtype)

    def step(self, model_output: jnp.ndarray, t: jnp.ndarray, sample: jnp.ndarray,
             num_inference_steps: int) -> jnp.ndarray:
        """One deterministic DDIM (eta=0) reverse step x_t -> x_{t_prev}.

        t: scalar int array (a value produced by `timesteps`).
        """
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)
        prev_t = t - self.num_train_timesteps // num_inference_steps
        a_t = ac[t]
        a_prev = jnp.where(prev_t >= 0, ac[jnp.maximum(prev_t, 0)],
                           jnp.float32(self.final_alpha_cumprod))

        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        # Note: diffusers keeps pred_epsilon = model_output (it is NOT re-derived
        # from the clipped x0) for prediction_type="epsilon".
        prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return prev.astype(sample.dtype)
