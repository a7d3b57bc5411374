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
    build_diffusion_prefix,
    compute_patch_features,
    detokenize_discrete_actions,
    diffusion_suffix_step,
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


def _first_key(stats: dict, *keys):
    """First present key's value — partial stats dicts (e.g. proprio with
    only q01/q99) are legal in dataset_statistics.json."""
    for k in keys:
        if k in stats:
            return stats[k]
    raise KeyError(f"none of {keys} in stats {list(stats)}")


def serve_action_chunk(
    params: Params,
    cfg: OpenVLAConfig,
    platform: PlatformSpec,
    frames_u8: jnp.ndarray,        # (B, N, H, W, 3) uint8 camera frames
    input_ids: jnp.ndarray,        # (B, P) LEFT-padded prompt
    prompt_mask: jnp.ndarray,      # (B, P)
    proprio: Optional[jnp.ndarray],
    action_low: jnp.ndarray,       # (action_dim,) q01 / min
    action_high: jnp.ndarray,      # (action_dim,) q99 / max
    action_mask: jnp.ndarray,      # (action_dim,) bool unnorm mask
    proprio_low: Optional[jnp.ndarray] = None,
    proprio_high: Optional[jnp.ndarray] = None,
    proprio_mask: Optional[jnp.ndarray] = None,
    proprio_zero: Optional[jnp.ndarray] = None,
    use_flash="auto",
    center_crop: bool = True,
    resize_size: int = 224,
    tp_mesh=None,
    fast_gelu: bool = True,
) -> jnp.ndarray:
    """The WHOLE serving hot path as one jittable program: uint8 camera frames
    -> fused device preprocessing (lanczos resize -> 0.9 center crop ->
    normalize -> backbone stack) -> prefill with parallel decoding -> L1 head
    -> device un-normalization. Returns unnormalized actions
    (B, num_actions_chunk, action_dim).

    This is everything the reference's `get_vla_action` + `predict_action` pay
    for per chunk (openvla_utils.py:678-796, modeling_prismatic.py:946-1060)
    except the host JPEG round trip — the A100 baseline runs the image
    conditioning on CPU; here it rides the same XLA program as the model.
    """
    from openvla_oft_tpu.processing.image_processing import device_preprocess

    if fast_gelu and not cfg.fast_gelu:
        # Serving default: erf-GELU via the sub-bf16-ulp logistic form
        # (ops/layers.py::gelu_erf_fast; −1.1 ms on the LIBERO chunk).
        # Pass fast_gelu=False for bit-matching the exact-erf program.
        cfg = dataclasses.replace(cfg, fast_gelu=True)

    b, n = frames_u8.shape[:2]
    flat = frames_u8.reshape((b * n,) + frames_u8.shape[2:])
    pixels = device_preprocess(cfg, flat, resize_size=resize_size,
                               center_crop=center_crop)
    pixels = pixels.reshape((b, n) + pixels.shape[1:])

    if proprio is not None and proprio_low is not None:
        # Reference `normalize_proprio` (openvla_utils.py:645-675) with the
        # repo's staged-path semantics (data/transforms.normalize): masked
        # dims pass through, degenerate dims (low == high) map to 0.
        scaled = jnp.clip(
            2.0 * (proprio - proprio_low)
            / (proprio_high - proprio_low + 1e-8) - 1.0, -1.0, 1.0)
        pmask = proprio_mask if proprio_mask is not None else \
            jnp.ones_like(proprio_low, bool)
        out = jnp.where(pmask, scaled, jnp.clip(proprio, -1.0, 1.0))
        # Degenerate-dim rule must match the staged path
        # (data/transforms.normalize): judged by min==max when the caller has
        # full stats (pass `proprio_zero`), by the active bounds otherwise.
        zero = proprio_zero if proprio_zero is not None else \
            proprio_low == proprio_high
        proprio = jnp.where(zero, 0.0, out)

    out = predict_action_hidden(params, cfg, platform, input_ids=input_ids,
                                prompt_mask=prompt_mask, pixels=pixels,
                                proprio=proprio, use_flash=use_flash,
                                tp_mesh=tp_mesh)
    norm = l1_head_predict(params["action_head"],
                           out.actions_hidden.astype(jnp.float32), platform)
    # Device analog of `_unnormalize_actions` (modeling_prismatic.py:772-791).
    un = 0.5 * (norm + 1.0) * (action_high - action_low + 1e-8) + action_low
    return jnp.where(action_mask, un, norm)


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
    # Mesh for tp-sharded serving: routes an engaged flash path through
    # shard_map over heads (ops/attention.py) instead of a GSPMD-opaque
    # pallas_call. None (default) = single-chip serving.
    tp_mesh: Any = None
    tokenizer: Any = None
    # Reuse the static [BOS][patches][proprio] prefix K/V across DDIM steps
    # (Llama-family only; Phi-2 falls back to full prefills per step).
    diffusion_prefix_kv: bool = True
    # Serving numerics: erf-GELU via the sub-bf16-ulp logistic fast form
    # (ops/layers.py::gelu_erf_fast, tests/test_fast_gelu.py). False restores
    # the exact-erf program.
    fast_gelu: bool = True

    def __post_init__(self):
        if self.fast_gelu and not self.cfg.fast_gelu:
            self.cfg = dataclasses.replace(self.cfg, fast_gelu=True)
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
            use_flash=self.use_flash, compute_logits=compute_logits,
            tp_mesh=self.tp_mesh)
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
        here all 50 steps compile into a single scanned computation, and (for
        Llama-family LLMs) the static [BOS][patches][proprio] prefix K/V is
        computed once so each step forwards only ~(prompt+chunk) suffix rows
        (~6x less LLM work per step; see models/prismatic.py DiffusionPrefix)."""
        from openvla_oft_tpu.config import PhiConfig

        sched = diffusion_scheduler(self.num_diffusion_steps)
        n_inf = self.num_diffusion_steps_inference or self.num_diffusion_steps
        ts = jnp.asarray(sched.timesteps(n_inf))
        b = input_ids.shape[0]
        # Fresh starting noise per call (reference torch.randn,
        # modeling_prismatic.py:1029-1032); key threaded from the host.
        key = noise_key if noise_key is not None else jax.random.PRNGKey(0)
        noise = jax.random.normal(
            key, (b, self.platform.num_actions_chunk, self.platform.action_dim),
            dtype=jnp.float32)

        use_prefix_kv = (self.diffusion_prefix_kv
                         and not isinstance(self.cfg.llm, PhiConfig))
        if use_prefix_kv:
            prefix = build_diffusion_prefix(params, self.cfg, input_ids,
                                            prompt_mask, pixels, proprio)
        else:
            # Full-prefill fallback (Phi-2 parallel blocks; also the parity
            # oracle for the prefix-KV path). Vision is still loop-invariant:
            # compute the projected patch block ONCE outside the scan
            # (reference clones projected_patch_embeddings,
            # modeling_prismatic.py:810).
            patches = compute_patch_features(params, self.cfg, input_ids,
                                             prompt_mask, pixels)

        def body(x_t, t):
            t_emb = sinusoidal_time_encoding(jnp.broadcast_to(t[None], (b,)),
                                             self.cfg.llm_dim)[:, None, :]
            if use_prefix_kv:
                actions_hidden = diffusion_suffix_step(
                    params, self.cfg, self.platform, prefix, t_emb, x_t)
            else:
                out = predict_action_hidden(
                    params, self.cfg, self.platform, input_ids=input_ids,
                    prompt_mask=prompt_mask, pixels=pixels, proprio=proprio,
                    noisy_actions=x_t, diffusion_t_emb=t_emb,
                    use_flash=self.use_flash, precomputed_patches=patches,
                    tp_mesh=self.tp_mesh)
                actions_hidden = out.actions_hidden
            eps = diffusion_predict_noise(
                params["action_head"], actions_hidden.astype(jnp.float32),
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

    def predict_action_from_frames(self, frames_u8: np.ndarray,
                                   instruction: str,
                                   proprio: Optional[np.ndarray] = None,
                                   unnorm_key: Optional[str] = None,
                                   center_crop: bool = True) -> np.ndarray:
        """One-jit serving path (L1 head): RAW uint8 camera frames
        (N, H, W, 3) -> unnormalized action chunk, with preprocessing,
        proprio normalization, and un-normalization all inside the compiled
        program (`serve_action_chunk`). The staged `predict_action` remains
        the parity path (host JPEG round trip + per-stage goldens); this is
        the latency path (bench.py entry).
        """
        assert self.head == "l1", \
            "fused serving path covers the L1 head; use predict_action for " \
            f"head={self.head!r}"
        stats = self._action_stats(unnorm_key)
        from openvla_oft_tpu.constants import NormalizationType

        q99 = self.platform.norm_type == NormalizationType.BOUNDS_Q99
        lo_k, hi_k = ("q01", "q99") if q99 else ("min", "max")
        low, high = stats[lo_k], stats[hi_k]
        mask = stats.get("mask", [True] * len(np.asarray(low)))
        p_stats = None
        if proprio is not None and self.norm_stats is not None:
            key = unnorm_key or next(iter(self.norm_stats))
            p_stats = self.norm_stats[key].get("proprio")

        ids, m = prepare_prompt_ids(self.tokenizer, instruction,
                                    self.prompt_bucket)
        if not hasattr(self, "_serve_jit"):
            self._serve_jit = jax.jit(functools.partial(
                serve_action_chunk, cfg=self.cfg, platform=self.platform,
                use_flash=self.use_flash, tp_mesh=self.tp_mesh,
                resize_size=self.cfg.vision_configs[0].image_size),
                static_argnames=("center_crop",))
        actions = self._serve_jit(
            self.params,
            frames_u8=jnp.asarray(frames_u8, jnp.uint8)[None],
            input_ids=jnp.asarray(ids)[None], prompt_mask=jnp.asarray(m)[None],
            proprio=None if proprio is None else
            jnp.asarray(proprio, jnp.float32)[None],
            action_low=jnp.asarray(low, jnp.float32),
            action_high=jnp.asarray(high, jnp.float32),
            action_mask=jnp.asarray(mask, bool),
            proprio_low=None if p_stats is None else
            jnp.asarray(_first_key(p_stats, lo_k, "q01", "min"), jnp.float32),
            proprio_high=None if p_stats is None else
            jnp.asarray(_first_key(p_stats, hi_k, "q99", "max"), jnp.float32),
            proprio_mask=None if p_stats is None or "mask" not in p_stats else
            jnp.asarray(p_stats["mask"], bool),
            proprio_zero=None if p_stats is None else jnp.asarray(
                np.asarray(p_stats["min"]) == np.asarray(p_stats["max"])
                if "min" in p_stats and "max" in p_stats else
                np.asarray(_first_key(p_stats, lo_k, "q01", "min"))
                == np.asarray(_first_key(p_stats, hi_k, "q99", "max")), bool),
            center_crop=center_crop)
        return np.asarray(actions)[0]

    def _action_stats(self, unnorm_key: Optional[str]) -> dict:
        assert self.norm_stats, "no dataset statistics loaded"
        if unnorm_key is None:
            assert len(self.norm_stats) == 1, \
                f"pass unnorm_key from {list(self.norm_stats)}"
            unnorm_key = next(iter(self.norm_stats))
        return self.norm_stats[unnorm_key]["action"]
