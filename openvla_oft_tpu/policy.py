"""High-level policy API: build/load an OpenVLA-OFT model and predict actions.

This is the TPU-native counterpart of the reference's inference orchestration
(`experiments/robot/openvla_utils.py:711-796` `get_vla_action` +
`OpenVLAForActionPrediction.predict_action`, modeling_prismatic.py:946-1060),
packaged as one object that owns the param pytrees, the compiled predict
functions (cached per static geometry), and the un-normalization stats.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openvla_oft_tpu.config import OpenVLAConfig
from openvla_oft_tpu.constants import PlatformSpec
from openvla_oft_tpu.models.action_heads import (
    init_diffusion_head,
    init_l1_head,
    l1_head_predict,
    sinusoidal_time_encoding,
    diffusion_predict_noise,
    diffusion_scheduler,
)
from openvla_oft_tpu.models.llama import init_llama_params


def _init_llm_params(key, llm_cfg, dtype):
    """Init by LLM family (Phi-2 has a different block structure)."""
    from openvla_oft_tpu.config import PhiConfig

    if isinstance(llm_cfg, PhiConfig):
        from openvla_oft_tpu.models.phi import init_phi_params

        return init_phi_params(key, llm_cfg, dtype=dtype)
    return init_llama_params(key, llm_cfg, dtype=dtype)
from openvla_oft_tpu.models.prismatic import (
    detokenize_discrete_actions,
    compute_patch_features,
    predict_action_hidden,
    prepare_prompt_ids,
    unnormalize_actions,
)
from openvla_oft_tpu.models.projector import (
    init_noisy_action_projector,
    init_proprio_projector,
    init_vision_projector,
)
from openvla_oft_tpu.models.vision_backbone import init_film, init_vision_backbone

Params = Dict[str, Any]


def init_openvla_params(
    key,
    cfg: OpenVLAConfig,
    platform: PlatformSpec,
    dtype=jnp.bfloat16,
    head: Optional[str] = "l1",        # "l1" | "diffusion" | None (discrete)
    use_proprio: bool = True,
    with_lm_head: bool = True,
    head_dtype=jnp.float32,
) -> Params:
    """Random-init full parameter tree (weight porting overwrites leaves)."""
    ks = jax.random.split(key, 8)
    params: Params = {
        "llm": _init_llm_params(ks[0], cfg.llm, dtype=dtype),
        "vision_backbone": init_vision_backbone(ks[1], cfg, dtype=dtype),
        "projector": init_vision_projector(ks[2], cfg.vision_dim, cfg.llm_dim,
                                           fused=cfg.use_fused_vision_backbone,
                                           dtype=head_dtype),
    }
    if not with_lm_head:
        del params["llm"]["lm_head"]
    if use_proprio:
        params["proprio_projector"] = init_proprio_projector(
            ks[3], platform.proprio_dim, cfg.llm_dim, dtype=head_dtype)
    if head == "l1":
        params["action_head"] = init_l1_head(ks[4], platform, cfg.llm_dim,
                                             cfg.llm_dim, dtype=head_dtype)
    elif head == "diffusion":
        params["action_head"] = init_diffusion_head(ks[4], platform, cfg.llm_dim,
                                                    cfg.llm_dim, dtype=head_dtype)
        params["noisy_action_projector"] = init_noisy_action_projector(
            ks[5], cfg.llm_dim, dtype=head_dtype)
    if cfg.use_film:
        params["film"] = init_film(ks[6], cfg, dtype=head_dtype)
    return params


@dataclasses.dataclass
class OpenVLAPolicy:
    """Owns params + compiled predict functions; one per loaded checkpoint."""

    cfg: OpenVLAConfig
    platform: PlatformSpec
    params: Params
    norm_stats: Optional[dict] = None
    head: str = "l1"                      # "l1" | "diffusion" | "discrete"
    prompt_bucket: int = 64
    # The diffusion head's training T. The reference couples train and
    # inference (DDIMScheduler(num_train_timesteps=num_diffusion_steps) +
    # set_timesteps(num_diffusion_steps), i.e. run ALL T steps;
    # modeling_prismatic.py:808, action_heads.py:163); keep them coupled here
    # and subsample only via the explicit num_diffusion_steps_inference
    # override (TPU extra, defaults to run-all).
    num_diffusion_steps: int = 50
    num_diffusion_steps_inference: Optional[int] = None
    use_flash: Any = "auto"
    tokenizer: Any = None

    def __post_init__(self):
        if self.tokenizer is None:
            # Deterministic stand-in; real deployments load the checkpoint's
            # Llama tokenizer (processing.processor.load_tokenizer).
            from openvla_oft_tpu.processing.processor import FakeLlamaTokenizer

            self.tokenizer = FakeLlamaTokenizer()
        self._predict_jit = jax.jit(
            functools.partial(self._predict_impl),
            static_argnames=("compute_logits",))
        self._call_count = 0

    # --- compiled core ---
    def _predict_impl(self, params, input_ids, prompt_mask, pixels, proprio,
                      noise_key=None, compute_logits=False):
        if self.head == "diffusion":
            return self._diffusion_loop(params, input_ids, prompt_mask, pixels,
                                        proprio, noise_key)
        out = predict_action_hidden(
            params, self.cfg, self.platform, input_ids=input_ids,
            prompt_mask=prompt_mask, pixels=pixels, proprio=proprio,
            use_flash=self.use_flash, compute_logits=compute_logits)
        if self.head == "l1":
            actions = l1_head_predict(params["action_head"],
                                      out.actions_hidden.astype(jnp.float32),
                                      self.platform)
            return actions, out.action_logits
        return None, out.action_logits

    def _diffusion_loop(self, params, input_ids, prompt_mask, pixels, proprio,
                        noise_key=None):
        """Reverse diffusion as ONE lax.scan program — the reference reruns
        the Python loop with 50 full HF forwards (modeling_prismatic.py:793-877);
        here all 50 prefills compile into a single scanned computation."""
        sched = diffusion_scheduler(self.num_diffusion_steps)
        n_inf = self.num_diffusion_steps_inference or self.num_diffusion_steps
        ts = jnp.asarray(sched.timesteps(n_inf))
        b = input_ids.shape[0]
        # Vision is loop-invariant: compute the projected patch block ONCE
        # outside the scan (reference clones projected_patch_embeddings,
        # modeling_prismatic.py:810) instead of relying on XLA to hoist the
        # dual-ViT forward out of the while loop.
        patches = compute_patch_features(params, self.cfg, input_ids,
                                         prompt_mask, pixels)
        # Fresh starting noise per call (reference torch.randn,
        # modeling_prismatic.py:1029-1032); key threaded from the host.
        key = noise_key if noise_key is not None else jax.random.PRNGKey(0)
        noise = jax.random.normal(
            key, (b, self.platform.num_actions_chunk, self.platform.action_dim),
            dtype=jnp.float32)

        def body(x_t, t):
            t_emb = sinusoidal_time_encoding(jnp.broadcast_to(t[None], (b,)),
                                             self.cfg.llm_dim)[:, None, :]
            out = predict_action_hidden(
                params, self.cfg, self.platform, input_ids=input_ids,
                prompt_mask=prompt_mask, pixels=pixels, proprio=proprio,
                noisy_actions=x_t, diffusion_t_emb=t_emb,
                use_flash=self.use_flash, precomputed_patches=patches)
            eps = diffusion_predict_noise(
                params["action_head"], out.actions_hidden.astype(jnp.float32),
                self.platform)
            x_prev = sched.step(eps, t, x_t, n_inf)
            return x_prev, None

        actions, _ = jax.lax.scan(body, noise, ts)
        return actions, None

    # --- host-side API ---
    def predict_action(self, images: np.ndarray, instruction: str,
                       proprio: Optional[np.ndarray] = None,
                       unnorm_key: Optional[str] = None) -> np.ndarray:
        """images: (N, H, W, 3) uint8/float preprocessed to (N, 2, H, W, 3)
        normalized pixels by the processor — here expected already normalized
        with shape (num_images, n_backbones, H, W, 3)."""
        ids, mask = prepare_prompt_ids(self.tokenizer, instruction,
                                       self.prompt_bucket)
        pixels = jnp.asarray(images)[None]
        proprio_j = None
        if proprio is not None:
            proprio_j = jnp.asarray(proprio, jnp.float32)[None]
        self._call_count += 1
        noise_key = jax.random.PRNGKey(self._call_count) \
            if self.head == "diffusion" else None
        actions, logits = self._predict_jit(
            self.params, jnp.asarray(ids)[None], jnp.asarray(mask)[None],
            pixels, proprio_j, noise_key=noise_key,
            compute_logits=(self.head == "discrete"))
        if self.head == "discrete":
            token_ids = np.asarray(jnp.argmax(logits, axis=-1))
            normalized = detokenize_discrete_actions(token_ids, self.cfg,
                                                     self.platform)[0]
        else:
            normalized = np.asarray(actions)[0]
        if self.norm_stats is None:
            return normalized
        stats = self._action_stats(unnorm_key)
        return unnormalize_actions(normalized, stats, self.platform.norm_type)

    def _action_stats(self, unnorm_key: Optional[str]) -> dict:
        assert self.norm_stats, "no dataset statistics loaded"
        if unnorm_key is None:
            assert len(self.norm_stats) == 1, \
                f"pass unnorm_key from {list(self.norm_stats)}"
            unnorm_key = next(iter(self.norm_stats))
        return self.norm_stats[unnorm_key]["action"]
