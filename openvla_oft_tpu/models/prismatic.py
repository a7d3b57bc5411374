"""Prismatic VLM + OpenVLA action prediction — the model core.

TPU-native redesign of `prismatic/extern/hf/modeling_prismatic.py:317-1087`.
Two entry paths share one multimodal-assembly contract:

Training forward (`prismatic_forward`) — right-padded batches exactly as the
reference collator emits them: physical layout
    [BOS][patches (+proprio)(+diffusion-t)][prompt ... action tokens ... STOP][PAD]
with action-token embeddings zeroed (L1/discrete) or replaced by projected
noisy actions (diffusion), labels padded with IGNORE over the patch block, and
the OFT block-bidirectional attention mask over the action-chunk positions.

Inference (`predict_action_hidden`) — a TPU-first redesign of
`OpenVLAForActionPrediction.predict_action` (modeling_prismatic.py:946-1060).
The reference is batch-1 with a dynamic prompt length (one CUDA graph per
length). Here the prompt is *left-padded* into a static bucket so one
compiled program serves every instruction length AND real batches. A per-row
gather places the real tokens in their logical order physically:
    [pads (p)][BOS][patch block (NP)][prompt rest][action slots][STOP]
so attention is exactly *causal + key-padding + a static bidirectional
window* over the action slots — the shape the Pallas flash kernel fuses —
and the action slots sit at a static tail slice. RoPE positions are
(physical index - pad count). Parity with the reference's physical training
layout is verified by tests.

The action-head input is the hidden states whose *next* token is an action
slot (the reference's `NUM_PATCHES+NUM_PROMPT_TOKENS` slice start is the last
prompt token — an intentional next-token-prediction offset, see
modeling_prismatic.py:916-920). Under the left-padded layout those positions
are a static slice.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openvla_oft_tpu.config import OpenVLAConfig
from openvla_oft_tpu.constants import (
    EMPTY_TOKEN_ID,
    IGNORE_INDEX,
    STOP_INDEX,
    NormalizationType,
    PlatformSpec,
)
from openvla_oft_tpu.models.llama import embed_tokens, llama_model
from openvla_oft_tpu.models.llama import lm_logits as _llama_lm_logits
from openvla_oft_tpu.models.projector import (
    noisy_action_projector,
    proprio_projector,
    vision_projector,
)
from openvla_oft_tpu.models.vision_backbone import vision_backbone_forward
from openvla_oft_tpu.ops.masks import (get_all_actions_mask,
                                       make_block_bidirectional_mask)

Params = Dict[str, Any]


def _run_llm(params, llm_cfg, inputs_embeds, **kw):
    """Dispatch on the LLM config family (reference: separate backbone classes,
    `llm/{llama2,mistral,phi}.py`). Llama/Mistral share `llama_model`; Phi-2
    (parallel blocks, partial RoPE) runs `models/phi.py::phi_model`."""
    from openvla_oft_tpu.config import PhiConfig

    if isinstance(llm_cfg, PhiConfig):
        from openvla_oft_tpu.models.phi import phi_model

        return phi_model(params, llm_cfg, inputs_embeds, **kw)
    return llama_model(params, llm_cfg, inputs_embeds, **kw)


def lm_logits(params, hidden):
    if "bias" in params["lm_head"]:  # Phi-2 carries a biased lm_head
        from openvla_oft_tpu.models.phi import lm_logits as phi_lm_logits

        return phi_lm_logits(params, hidden)
    return _llama_lm_logits(params, hidden)


# === Shared pieces ===
def _patch_block(
    params: Params,
    cfg: OpenVLAConfig,
    pixels: jnp.ndarray,
    language_embedding: Optional[jnp.ndarray],
    proprio: Optional[jnp.ndarray],
    diffusion_t_emb: Optional[jnp.ndarray],
    dtype,
    precomputed_patches: Optional[jnp.ndarray] = None,
    vit_unroll: Any = 1,
    remat: bool = False,
    remat_policy: Optional[str] = None,
) -> jnp.ndarray:
    """Vision features -> projector (+proprio token)(+diffusion-t token).

    Reference `_process_vision_features` / `_process_proprio_features`
    (modeling_prismatic.py:438-459) and the diffusion-t append (:593-598).
    `precomputed_patches` skips the ViT+projector (the reference computes
    vision features ONCE outside the 50-step diffusion loop and reuses them,
    modeling_prismatic.py:810 — pass the hoisted block so the scan doesn't
    depend on XLA loop-invariant code motion to avoid 50x the vision cost).
    """
    if precomputed_patches is not None:
        proj = precomputed_patches.astype(dtype)
    else:
        # Run the ViT in the model compute dtype. Device preprocessing emits
        # fp32 pixels; without this cast the whole ViT+projector stays fp32
        # (the MXU demotes the matmuls to bf16 anyway under default
        # precision, but every elementwise op and activation round-trip pays
        # 2x HBM) — and matches the reference's bf16 autocast, which casts
        # pixel_values at the patch conv.
        pixels = pixels.astype(dtype)
        film = params.get("film") if cfg.use_film else None
        feats = vision_backbone_forward(
            params["vision_backbone"], cfg, pixels,
            film_params=film, language_embedding=language_embedding,
            unroll=vit_unroll, remat=remat, remat_policy=remat_policy)
        proj = vision_projector(params["projector"], feats,
                                fast_gelu=cfg.fast_gelu).astype(dtype)
    extra = []
    if proprio is not None:
        p_tok = proprio_projector(params["proprio_projector"],
                                  proprio.astype(jnp.float32))
        extra.append(p_tok[:, None, :].astype(dtype))
    if diffusion_t_emb is not None:
        extra.append(diffusion_t_emb.astype(dtype))  # (B, 1, llm_dim)
    if extra:
        proj = jnp.concatenate([proj] + extra, axis=1)
    return proj


def _film_language_embedding(params: Params, input_ids: jnp.ndarray,
                             prompt_mask: jnp.ndarray, dtype) -> jnp.ndarray:
    """FiLM conditioning vector for the serving paths: masked mean of the
    prompt token embeddings + one STOP embedding (the reference averages
    BOS+prompt+STOP at batch-1 inference, film_vit_wrapper.py:241-242).
    Shared by predict_action_hidden / compute_patch_features /
    build_diffusion_prefix so the three paths cannot drift."""
    b = input_ids.shape[0]
    prompt_mask = prompt_mask.astype(bool)
    text_embeds = embed_tokens(params["llm"], input_ids).astype(dtype)
    text_embeds = text_embeds * prompt_mask[..., None]
    stop_embed = embed_tokens(
        params["llm"], jnp.full((b, 1), STOP_INDEX, input_ids.dtype)).astype(dtype)
    cat = jnp.concatenate([text_embeds, stop_embed], axis=1)
    valid = jnp.concatenate([prompt_mask, jnp.ones((b, 1), bool)], axis=1)
    return _masked_mean_language_embedding(cat, valid)


def _masked_mean_language_embedding(text_embeds: jnp.ndarray,
                                    valid: jnp.ndarray) -> jnp.ndarray:
    """Mean of valid (non-action, non-pad) text embeddings for FiLM
    (film_vit_wrapper.py:241-242).

    Deliberate divergence: the reference's training-time mean includes PAD
    embeddings of right-padded batches (it averages everything outside the
    action mask); we exclude pads, which matches the reference's *inference*
    behavior (batch-1, no pads) and removes a batch-composition dependence.
    """
    w = valid.astype(jnp.float32)[..., None]
    s = jnp.sum(text_embeds.astype(jnp.float32) * w, axis=1)
    return s / jnp.maximum(jnp.sum(w, axis=1), 1.0)


# === Training forward ===
class ForwardOutput(NamedTuple):
    hidden_states: jnp.ndarray        # (B, S_mm, D) post-final-norm
    logits: Optional[jnp.ndarray]     # (B, S_mm, V) fp32, or None
    multimodal_labels: jnp.ndarray    # (B, S_mm)
    actions_hidden: Optional[jnp.ndarray]  # (B, chunk_len, D) at action slots
    all_actions_mask: jnp.ndarray     # (B, S_txt) action positions in text coords


def prismatic_forward(
    params: Params,
    cfg: OpenVLAConfig,
    platform: PlatformSpec,
    input_ids: jnp.ndarray,          # (B, S_txt) right-padded
    attention_mask: jnp.ndarray,     # (B, S_txt) 1 = real
    pixels: jnp.ndarray,             # (B, N, n_backbones, H, W, 3)
    labels: jnp.ndarray,             # (B, S_txt) IGNORE outside supervised tail
    proprio: Optional[jnp.ndarray] = None,
    noisy_actions: Optional[jnp.ndarray] = None,       # (B, chunk, dim) diffusion
    diffusion_t_emb: Optional[jnp.ndarray] = None,     # (B, 1, llm_dim)
    use_flash: bool = False,
    compute_logits: bool = True,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    gather_actions: bool = True,
) -> ForwardOutput:
    """Reference `PrismaticForConditionalGeneration.forward` multimodal branch
    (modeling_prismatic.py:575-675) + the fine-tune hidden-state gather
    (vla-scripts/finetune.py:384-394), fused into one jittable function."""
    b, s_txt = input_ids.shape
    dtype = params["llm"]["embed"]["embedding"].dtype
    pad_mask = attention_mask.astype(bool)

    text_embeds = embed_tokens(params["llm"], input_ids).astype(dtype)
    all_actions_mask = get_all_actions_mask(labels, platform.action_dim)

    lang_embedding = None
    if cfg.use_film:
        lang_embedding = _masked_mean_language_embedding(
            text_embeds, ~all_actions_mask & pad_mask)

    patch_embeds = _patch_block(params, cfg, pixels, lang_embedding, proprio,
                                diffusion_t_emb, dtype, remat=remat,
                                remat_policy=remat_policy)
    n_patch = patch_embeds.shape[1]

    if noisy_actions is not None:
        # Diffusion: scatter projected noisy-action tokens into action slots
        # (reference `_replace_input_embeddings`, modeling_prismatic.py:399-430).
        na = noisy_actions.reshape(b, -1)[..., None]                # (B, K, 1)
        na_feats = noisy_action_projector(params["noisy_action_projector"], na)
        text_embeds = _scatter_into_mask(text_embeds, all_actions_mask,
                                         na_feats.astype(dtype))
    else:
        text_embeds = text_embeds * (~all_actions_mask)[..., None]

    # Physical layout: [BOS][patch block][rest of text] (insertion after BOS,
    # reference `_build_multimodal_attention`, modeling_prismatic.py:462-486).
    mm_embeds = jnp.concatenate(
        [text_embeds[:, :1], patch_embeds, text_embeds[:, 1:]], axis=1)
    patch_true = jnp.ones((b, n_patch), bool)
    mm_pad = jnp.concatenate([pad_mask[:, :1], patch_true, pad_mask[:, 1:]], axis=1)
    # The fork's bidirectional attention window spans the action slots AND the
    # trailing STOP token: the reference appends STOP at inference because it
    # is "needed in non-causal bi-directional self-attention, as it appears at
    # train time" (modeling_prismatic.py:742) — under an actions-only window a
    # trailing token could never influence action hidden states, so STOP must
    # be inside the window. The gather/zeroing masks stay actions-only
    # (reference _process_action_masks semantics).
    after_action = jnp.pad(all_actions_mask[:, :-1], ((0, 0), (1, 0)))
    stop_after_actions = (input_ids == STOP_INDEX) & after_action
    attn_bidir_txt = all_actions_mask | stop_after_actions
    mm_actions = jnp.concatenate(
        [jnp.zeros((b, 1), bool), jnp.zeros((b, n_patch), bool),
         all_actions_mask[:, 1:]], axis=1)
    mm_bidir = jnp.concatenate(
        [jnp.zeros((b, 1), bool), jnp.zeros((b, n_patch), bool),
         attn_bidir_txt[:, 1:]], axis=1)
    ignore = jnp.full((b, n_patch), IGNORE_INDEX, labels.dtype)
    mm_labels = jnp.concatenate([labels[:, :1], ignore, labels[:, 1:]], axis=1)

    if use_flash == "auto":
        # Same crossover the serving path encodes (predict_action_hidden):
        # the Pallas kernel wins above ~1k multimodal rows (ALOHA S≈1169),
        # XLA fused attention below (LIBERO S≈618). Static shape -> resolved
        # at trace time, works identically under jax.grad/remat.
        from openvla_oft_tpu.ops.attention import FLASH_SEQ_THRESHOLD

        use_flash = mm_embeds.shape[1] >= FLASH_SEQ_THRESHOLD
    hidden = _run_llm(params["llm"], cfg.llm, mm_embeds,
                      padding_mask=mm_pad, bidir_mask=mm_bidir,
                      use_flash=use_flash, remat=remat,
                      remat_policy=remat_policy)

    logits = lm_logits(params["llm"], hidden) if compute_logits else None

    # Gather hidden states at positions whose NEXT token is an action token:
    # shift the multimodal action mask left by one (finetune.py:384-394 uses
    # `hidden[:, NUM_PATCHES:-1][mask[:, 1:]]`, same semantics). Pure-VLM
    # batches (no action tokens, e.g. LLaVA pretraining) skip the gather.
    actions_hidden = None
    if gather_actions:
        predictor_mask = jnp.concatenate(
            [mm_actions[:, 1:], jnp.zeros((b, 1), bool)], axis=1)
        actions_hidden = _gather_mask_rows(hidden, predictor_mask,
                                           platform.chunk_len)

    return ForwardOutput(hidden, logits, mm_labels, actions_hidden, all_actions_mask)


def _gather_mask_rows(x: jnp.ndarray, mask: jnp.ndarray, count: int) -> jnp.ndarray:
    """Per-row gather of the first `count` True positions of `mask` from x.

    Static output shape (B, count, D); rows must contain >= count Trues.
    """
    # stable argsort of (not mask) puts True positions first, in order.
    idx = jnp.argsort(~mask, axis=1, stable=True)[:, :count]
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _scatter_into_mask(x: jnp.ndarray, mask: jnp.ndarray,
                       values: jnp.ndarray) -> jnp.ndarray:
    """Place values[b, k] at the k-th True position of mask[b] in x."""
    b, s, d = x.shape
    k = values.shape[1]
    idx = jnp.argsort(~mask, axis=1, stable=True)[:, :k]  # (B, K)
    placed = jnp.zeros_like(x).at[jnp.arange(b)[:, None], idx].set(values)
    return jnp.where(mask[..., None], placed, x)


# === Inference: parallel action-chunk decoding ===
class PredictOutput(NamedTuple):  # noqa: D101
    actions_hidden: jnp.ndarray          # (B, chunk_len, D)
    action_logits: Optional[jnp.ndarray]  # (B, chunk_len, V) fp32 (discrete path)


def _left_padded_layout(text_embeds, patch_embeds, prompt_mask,
                        tail_embeds=None):
    """Assemble the serving-path physical layout shared by the OFT prefill
    and the AR decode path:

        staged  = [text (p_len)] [patches (n_patch)] [tail...]
        output  = [pads (p)][BOS][patches][text_rest][tail...]

    via a per-row gather (pads vary per example; everything else is static).
    Returns (embeds, positions, key_valid, pad_counts) with RoPE positions =
    physical index - pad count.
    """
    b, p_len = prompt_mask.shape
    n_patch = patch_embeds.shape[1]
    parts = [text_embeds, patch_embeds]
    if tail_embeds is not None:
        parts.append(tail_embeds)
    staged = jnp.concatenate(parts, axis=1)
    s = staged.shape[1]
    pad_counts = (p_len - jnp.sum(prompt_mask, axis=1)).astype(jnp.int32)
    i = jnp.arange(s, dtype=jnp.int32)[None, :]
    p = pad_counts[:, None]
    src = jnp.where(
        i <= p, i,
        jnp.where(i < p + 1 + n_patch, p_len + (i - (p + 1)),   # patches
                  jnp.where(i < p_len + n_patch, i - n_patch,   # text rest
                            i)))                                 # tail
    embeds = jnp.take_along_axis(staged, src[..., None], axis=1)
    positions = jnp.maximum(i - p, 0)
    key_valid = i >= p
    return embeds, positions, key_valid, pad_counts


def compute_patch_features(
    params: Params,
    cfg: OpenVLAConfig,
    input_ids: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    pixels: jnp.ndarray,
) -> jnp.ndarray:
    """Projected vision patches for the serving path, computed ONCE for reuse
    across a diffusion loop (reference modeling_prismatic.py:810). Replicates
    predict_action_hidden's FiLM language conditioning; proprio/diffusion-t
    tokens are appended per call via `precomputed_patches`."""
    dtype = params["llm"]["embed"]["embedding"].dtype
    lang_embedding = _film_language_embedding(params, input_ids, prompt_mask,
                                              dtype) if cfg.use_film else None
    return _patch_block(params, cfg, pixels, lang_embedding, None, None,
                        dtype, vit_unroll="full")


def predict_action_hidden(
    params: Params,
    cfg: OpenVLAConfig,
    platform: PlatformSpec,
    input_ids: jnp.ndarray,        # (B, P) LEFT-padded prompt incl BOS..29871
    prompt_mask: jnp.ndarray,      # (B, P) 1 = real token
    pixels: jnp.ndarray,           # (B, N, n_backbones, H, W, 3)
    proprio: Optional[jnp.ndarray] = None,
    noisy_actions: Optional[jnp.ndarray] = None,
    diffusion_t_emb: Optional[jnp.ndarray] = None,
    use_flash="auto",
    compute_logits: bool = False,
    precomputed_patches: Optional[jnp.ndarray] = None,
    tp_mesh=None,
    collect_act_stats: bool = False,
) -> PredictOutput:
    """One prefill with parallel decoding; returns action-slot hidden states.

    Jit this per static geometry (platform, num_images, prompt bucket P).
    use_flash: True | False | "auto" — "auto" picks the Pallas kernel when the
    sequence is long enough for it to beat XLA fused attention (measured
    crossover ~1k tokens on v5e: ALOHA geometry 121.7 ms flash vs 150.1 ms
    XLA; LIBERO geometry slightly favors XLA).
    tp_mesh: pass the Mesh when serving tp-sharded so the flash path (if it
    engages) shard_maps over heads instead of running a GSPMD-opaque
    pallas_call (ops/attention.py).
    """
    b, p_len = input_ids.shape
    chunk = platform.chunk_len
    dtype = params["llm"]["embed"]["embedding"].dtype
    prompt_mask = prompt_mask.astype(bool)

    text_embeds = embed_tokens(params["llm"], input_ids).astype(dtype)
    text_embeds = text_embeds * prompt_mask[..., None]

    lang_embedding = _film_language_embedding(params, input_ids, prompt_mask,
                                              dtype) if cfg.use_film else None
    patch_embeds = _patch_block(params, cfg, pixels, lang_embedding, proprio,
                                diffusion_t_emb, dtype,
                                precomputed_patches=precomputed_patches,
                                vit_unroll="full")
    n_patch = patch_embeds.shape[1]

    if noisy_actions is not None:
        na = noisy_actions.reshape(b, -1)[..., None]
        action_embeds = noisy_action_projector(
            params["noisy_action_projector"], na).astype(dtype)
    else:
        action_embeds = jnp.zeros((b, chunk, cfg.llm_dim), dtype)
    stop_embeds = embed_tokens(
        params["llm"], jnp.full((b, 1), STOP_INDEX, input_ids.dtype)).astype(dtype)

    # [pads (p)][BOS][patches][text_rest][actions][STOP] via the shared
    # per-row layout gather.
    embeds, positions, key_valid, pad_counts = _left_padded_layout(
        text_embeds, patch_embeds, prompt_mask,
        tail_embeds=jnp.concatenate([action_embeds, stop_embeds], axis=1))
    s = p_len + n_patch + chunk + 1
    # bidirectional window = action slots + the trailing STOP (chunk+1 wide):
    # the reference appends STOP because it participates in the non-causal
    # window at train time (modeling_prismatic.py:742); see prismatic_forward.
    window = (p_len + n_patch, chunk + 1)                           # static

    if use_flash == "auto":
        from openvla_oft_tpu.ops.attention import FLASH_SEQ_THRESHOLD

        use_flash = s >= FLASH_SEQ_THRESHOLD
    bidir = jnp.zeros((b, s), bool).at[:, window[0]:window[0] + chunk + 1].set(True)
    # Predictor positions: last prompt token (29871) through the second-to-last
    # action slot — a static tail slice. Llama-family computes ONLY these rows
    # in its final layer (`out_window`, models/llama.py) — every other row's
    # last-layer output is unread.
    start = p_len + n_patch - 1
    from openvla_oft_tpu.config import PhiConfig

    if collect_act_stats:
        # Static-quant calibration (ops/quant_calibrate.py::
        # attach_static_act_scales): full-width forward with per-layer
        # input-absmax collection; returns (PredictOutput, stats).
        assert not isinstance(cfg.llm, PhiConfig), "llama-family only"
        hidden, stats = _run_llm(
            params["llm"], cfg.llm, embeds, positions=positions,
            padding_mask=key_valid, bidir_mask=bidir, use_flash=False,
            bidir_block=window, collect_act_stats=True)
        actions_hidden = jax.lax.dynamic_slice_in_dim(hidden, start, chunk,
                                                      axis=1)
        return PredictOutput(actions_hidden, None), stats

    if isinstance(cfg.llm, PhiConfig):
        # phi_model ignores use_flash/out_window/tp_mesh by design (see its
        # docstring): XLA attention with the explicit 4D mask is the Phi path.
        hidden = _run_llm(params["llm"], cfg.llm, embeds, positions=positions,
                          padding_mask=key_valid, bidir_mask=bidir,
                          use_flash=use_flash, bidir_block=window)
        actions_hidden = jax.lax.dynamic_slice_in_dim(hidden, start, chunk,
                                                      axis=1)
    else:
        actions_hidden = _run_llm(params["llm"], cfg.llm, embeds,
                                  positions=positions, padding_mask=key_valid,
                                  bidir_mask=bidir, use_flash=use_flash,
                                  bidir_block=window,
                                  out_window=(start, chunk),
                                  tp_mesh=tp_mesh)

    action_logits = None
    if compute_logits:
        action_logits = lm_logits(params["llm"], actions_hidden)
    return PredictOutput(actions_hidden, action_logits)


# === Diffusion serving path: prefix-KV reuse across DDIM steps ===
class DiffusionPrefix(NamedTuple):
    """Loop-invariant state for the scanned DDIM loop.

    The multimodal sequence [BOS][patches][proprio][t][prompt][actions][STOP]
    (reference modeling_prismatic.py:826-830: the diffusion-timestep token is
    appended AFTER patches+proprio) has a prefix — [BOS][patches][proprio],
    ~515 of ~618 rows for LIBERO — that is bit-identical across all DDIM
    steps: those rows precede the timestep token, so under causal attention
    nothing they compute can depend on it. The reference reruns the full
    prefill per step; here the prefix K/V is computed once and each step
    forwards only the [t][prompt][actions][STOP] suffix (`llama_suffix_forward`).

    Physical suffix layout [t][pads][prompt right-aligned][actions][STOP]:
    the prompt-bucket pads move from the front of the whole sequence into the
    suffix so the prefix extent is static; logical RoPE positions and the
    attention mask reproduce the `predict_action_hidden` numerics exactly
    (tested in tests/test_policy_diffusion.py).
    """

    prefix_k: jnp.ndarray    # (L, B, T_pre, Hkv, Dh) post-RoPE
    prefix_v: jnp.ndarray    # (L, B, T_pre, Hkv, Dh)
    text_rest: jnp.ndarray   # (B, P-1, D) prompt minus BOS, pads left, garbage at pads
    text_valid: jnp.ndarray  # (B, P-1) bool
    pad_counts: jnp.ndarray  # (B,) int32
    stop_embed: jnp.ndarray  # (B, 1, D)


def build_diffusion_prefix(
    params: Params,
    cfg: OpenVLAConfig,
    input_ids: jnp.ndarray,     # (B, P) LEFT-padded prompt incl BOS..29871
    prompt_mask: jnp.ndarray,   # (B, P) 1 = real token
    pixels: jnp.ndarray,
    proprio: Optional[jnp.ndarray] = None,
) -> DiffusionPrefix:
    """Run ViT+projector (+proprio token) once and prefill [BOS][patches][proprio]
    K/V (reference computes vision once at modeling_prismatic.py:810 but still
    reruns the LLM over it 50x)."""
    from openvla_oft_tpu.models.llama import KVCache, llama_prefill

    b, p_len = input_ids.shape
    dtype = params["llm"]["embed"]["embedding"].dtype
    prompt_mask = prompt_mask.astype(bool)
    pad_counts = (p_len - jnp.sum(prompt_mask, axis=1)).astype(jnp.int32)

    text_embeds = embed_tokens(params["llm"], input_ids).astype(dtype)
    text_embeds = text_embeds * prompt_mask[..., None]

    lang_embedding = _film_language_embedding(params, input_ids, prompt_mask,
                                              dtype) if cfg.use_film else None
    patch_embeds = _patch_block(params, cfg, pixels, lang_embedding, proprio,
                                None, dtype, vit_unroll="full")

    # BOS sits at physical index pad_counts in the left-padded prompt.
    bos = jnp.take_along_axis(text_embeds, pad_counts[:, None, None], axis=1)
    prefix_embeds = jnp.concatenate([bos, patch_embeds], axis=1)
    n_pre = prefix_embeds.shape[1]

    cache = KVCache.create(cfg.llm, b, n_pre, dtype=dtype)
    _, cache = llama_prefill(params["llm"], cfg.llm, prefix_embeds, cache)

    # Suffix text = prompt minus BOS, keeping pads left: skip index pad_counts.
    j = jnp.arange(p_len - 1, dtype=jnp.int32)[None, :]
    src = j + (j >= pad_counts[:, None]).astype(jnp.int32)
    text_rest = jnp.take_along_axis(text_embeds, src[..., None], axis=1)
    text_valid = j >= pad_counts[:, None]

    stop_embed = embed_tokens(
        params["llm"], jnp.full((b, 1), STOP_INDEX, input_ids.dtype)).astype(dtype)
    return DiffusionPrefix(cache.k, cache.v, text_rest, text_valid,
                           pad_counts, stop_embed)


def diffusion_suffix_step(
    params: Params,
    cfg: OpenVLAConfig,
    platform: PlatformSpec,
    prefix: DiffusionPrefix,
    diffusion_t_emb: jnp.ndarray,   # (B, 1, llm_dim)
    noisy_actions: jnp.ndarray,     # (B, chunk, action_dim)
) -> jnp.ndarray:
    """One DDIM step's LLM work: forward [t][pads][prompt][actions][STOP]
    suffix rows against the cached prefix. Returns actions_hidden
    (B, chunk_len, D) — numerics match `predict_action_hidden`."""
    from openvla_oft_tpu.models.llama import llama_suffix_forward

    b = diffusion_t_emb.shape[0]
    chunk = platform.chunk_len
    dtype = params["llm"]["embed"]["embedding"].dtype
    n_pre = prefix.prefix_k.shape[2]
    p_len = prefix.text_rest.shape[1] + 1

    na = noisy_actions.reshape(b, -1)[..., None]
    action_embeds = noisy_action_projector(
        params["noisy_action_projector"], na).astype(dtype)

    suffix = jnp.concatenate(
        [diffusion_t_emb.astype(dtype), prefix.text_rest, action_embeds,
         prefix.stop_embed], axis=1)
    s_suf = suffix.shape[1]  # = p_len + chunk + 1
    i = jnp.arange(s_suf, dtype=jnp.int32)[None, :]

    # Logical positions: t-token continues the prefix at n_pre; each later
    # real row sits at n_pre + i - pad_count (pads clamp to junk, masked out).
    positions = n_pre + jnp.where(
        i == 0, 0, jnp.maximum(i - prefix.pad_counts[:, None], 0))

    key_valid = jnp.concatenate(
        [jnp.ones((b, 1), bool), prefix.text_valid,
         jnp.ones((b, chunk + 1), bool)], axis=1)
    window = jnp.broadcast_to(i >= p_len, (b, s_suf))  # actions + STOP block
    suf_mask = make_block_bidirectional_mask(key_valid, window)
    mask = jnp.concatenate(
        [jnp.ones((b, s_suf, n_pre), bool), suf_mask], axis=-1)[:, None]

    hidden = llama_suffix_forward(params["llm"], cfg.llm, suffix,
                                  prefix.prefix_k, prefix.prefix_v,
                                  positions.astype(jnp.int32), mask)
    # Predictor rows: last prompt token (29871) through second-to-last action
    # slot — suffix indices [p_len-1, p_len-1+chunk) (next-token offset, see
    # predict_action_hidden).
    return hidden[:, p_len - 1:p_len - 1 + chunk]


# === Autoregressive discrete decoding (base-OpenVLA parity) ===
def predict_action_autoregressive(
    params: Params,
    cfg: OpenVLAConfig,
    platform: PlatformSpec,
    input_ids: jnp.ndarray,        # (B, P) LEFT-padded prompt incl BOS..29871
    prompt_mask: jnp.ndarray,      # (B, P)
    pixels: jnp.ndarray,           # (B, N, n_backbones, H, W, 3)
    num_new_tokens: int,
) -> jnp.ndarray:
    """Greedy KV-cached decode of `num_new_tokens` action tokens — the vanilla
    OpenVLA path (reference `prismatic/models/vlas/openvla.py:36-103`, which
    generates ACTION_DIM tokens through HF `generate`). Returns token ids
    (B, num_new_tokens).

    Same left-padded physical-order layout as `predict_action_hidden` minus
    the action/STOP slots; one prefill + a `lax.scan` over decode steps.
    """
    from openvla_oft_tpu.config import PhiConfig
    from openvla_oft_tpu.models.llama import (
        KVCache,
        llama_decode_step,
        llama_prefill,
    )

    if isinstance(cfg.llm, PhiConfig):
        from openvla_oft_tpu.models.phi import phi_decode_step, phi_prefill

        prefill_fn, decode_fn = phi_prefill, phi_decode_step
    else:
        prefill_fn, decode_fn = llama_prefill, llama_decode_step

    b, p_len = input_ids.shape
    dtype = params["llm"]["embed"]["embedding"].dtype
    prompt_mask = prompt_mask.astype(bool)

    text_embeds = embed_tokens(params["llm"], input_ids).astype(dtype)
    text_embeds = text_embeds * prompt_mask[..., None]
    patch_embeds = _patch_block(params, cfg, pixels, None, None, None, dtype,
                                vit_unroll="full")
    n_patch = patch_embeds.shape[1]

    embeds, positions, key_valid, pad_counts = _left_padded_layout(
        text_embeds, patch_embeds, prompt_mask)
    s = p_len + n_patch

    t_max = s + num_new_tokens
    cache = KVCache.create(cfg.llm, b, t_max, dtype=dtype)
    hidden, cache = prefill_fn(params["llm"], cfg.llm, embeds, cache,
                               positions=positions, key_valid=key_valid)
    last_hidden = hidden[:, -1:]

    def step(carry, _):
        last_hidden, cache = carry
        logits = lm_logits(params["llm"], last_hidden)[:, 0]  # (B, V)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,)
        emb = embed_tokens(params["llm"], token[:, None]).astype(dtype)
        pos = (cache.index - pad_counts)[:, None].astype(jnp.int32)
        new_hidden, new_cache = decode_fn(params["llm"], cfg.llm, emb,
                                          cache, positions=pos)
        return (new_hidden, new_cache), token

    (_, _), tokens = jax.lax.scan(step, (last_hidden, cache), None,
                                  length=num_new_tokens)
    return tokens.T  # (B, num_new_tokens)


# === Host-side helpers (numpy, outside jit) ===
def prepare_prompt_ids(tokenizer, instruction: str, bucket: int,
                       max_length: int = 2048) -> tuple:
    """Tokenize the OFT prompt and LEFT-pad to `bucket`.

    Prompt format: reference `get_vla_action` (openvla_utils.py:753) +
    the 29871 empty-token fixup (modeling_prismatic.py:972-977).

    Instructions longer than `bucket` auto-escalate to the next multiple of
    `bucket` (each new bucket costs one jit recompile but never fails);
    `max_length` mirrors the reference llm_max_length=2048
    (configuration_prismatic.py:84) and is the only hard limit.
    """
    from openvla_oft_tpu.processing.processor import build_prompt

    ids = tokenizer(build_prompt(instruction),
                    add_special_tokens=True)["input_ids"]
    if ids[-1] != EMPTY_TOKEN_ID:
        ids = ids + [EMPTY_TOKEN_ID]
    if len(ids) > bucket:
        bucket = -(-len(ids) // bucket) * bucket  # next multiple up
    if bucket > max_length:
        raise ValueError(
            f"Prompt length {len(ids)} exceeds llm_max_length {max_length}")
    pad = bucket - len(ids)
    input_ids = np.asarray([0] * pad + ids, dtype=np.int32)
    mask = np.asarray([0] * pad + [1] * len(ids), dtype=np.int32)
    return input_ids, mask


def detokenize_discrete_actions(action_token_ids: np.ndarray,
                                cfg: OpenVLAConfig,
                                platform: PlatformSpec) -> np.ndarray:
    """argmax token ids -> normalized actions (reference
    modeling_prismatic.py:929-942 / action_tokenizer.py:56-72)."""
    bins = np.linspace(-1, 1, cfg.n_action_bins)
    bin_centers = (bins[:-1] + bins[1:]) / 2.0
    disc = cfg.true_vocab_size - action_token_ids
    disc = np.clip(disc - 1, 0, bin_centers.shape[0] - 1)
    return bin_centers[disc].reshape(
        *action_token_ids.shape[:-1], platform.num_actions_chunk, platform.action_dim)


def unnormalize_actions(normalized: np.ndarray, action_stats: dict,
                        norm_type: NormalizationType) -> np.ndarray:
    """Reference `_unnormalize_actions` (modeling_prismatic.py:772-791)."""
    if norm_type == NormalizationType.BOUNDS:
        low, high = np.asarray(action_stats["min"]), np.asarray(action_stats["max"])
    elif norm_type == NormalizationType.BOUNDS_Q99:
        low, high = np.asarray(action_stats["q01"]), np.asarray(action_stats["q99"])
    else:
        raise ValueError(f"Unsupported normalization type {norm_type}")
    mask = np.asarray(action_stats.get("mask", np.ones_like(low, dtype=bool)))
    return np.where(mask, 0.5 * (normalized + 1) * (high - low + 1e-8) + low,
                    normalized)
