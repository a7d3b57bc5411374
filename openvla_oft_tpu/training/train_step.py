"""Sharded LoRA fine-tuning step (reference `vla-scripts/finetune.py` training
loop + `run_forward_pass` losses, redesigned for pjit).

One jitted `train_step` covers the three OFT objectives:
  - "l1":        L1(gt_actions, head(actions_hidden))      (finetune.py:396-400)
  - "diffusion": MSE(predicted noise, sampled noise)       (finetune.py:402-407)
  - "discrete":  next-token CE on multimodal labels        (HF loss semantics)

The base VLA is frozen; trainables are {lora, action_head, proprio_projector,
noisy_action_projector, film} (exactly the modules DDP-wrapped separately in
the reference, finetune.py:893-932). Optimizer state lives only for the
trainables and is sharded by the same path rules as parameters (ZeRO analog
over the fsdp axis).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from openvla_oft_tpu.config import OpenVLAConfig
from openvla_oft_tpu.constants import IGNORE_INDEX, PlatformSpec
from openvla_oft_tpu.models.action_heads import (
    diffusion_predict_noise,
    diffusion_sample_noisy_actions,
    l1_head_predict,
)
from openvla_oft_tpu.models.prismatic import prismatic_forward
from openvla_oft_tpu.training.lora import inject_lora

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Subset of the reference `FinetuneConfig` (finetune.py:79-131) that the
    compiled step needs. CLI-facing fields live in vla_scripts/finetune.py."""

    objective: str = "l1"                 # "l1" | "diffusion" | "discrete"
    learning_rate: float = 5e-4
    num_steps_before_decay: int = 100_000
    lr_decay_factor: float = 0.1          # MultiStepLR gamma (finetune.py:955-962)
    warmup_steps: int = 0
    lora_rank: int = 32
    lora_alpha: float = 16.0
    max_grad_norm: float = 0.0            # 0 = no clipping (reference default)
    use_proprio: bool = True
    use_film: bool = False
    num_diffusion_steps: int = 100
    weight_decay: float = 0.01            # torch AdamW default
    grad_accumulation_steps: int = 1
    # Activation-remat policy for the LLM stack: "all" recomputes the whole
    # forward in backward (minimum HBM — the single-chip 7B default), "dots"
    # saves matmul outputs (faster when HBM allows; the b>=2 MFU lever),
    # "none" disables remat entirely (XLA saves what it needs).
    remat_policy: str = "all"


def lr_schedule(cfg: TrainConfig):
    """10%->100% linear warmup -> constant -> step decay.

    Warmup matches the reference exactly: lr * (0.1 + 0.9 * (i+1)/warmup)
    capped at 1 (finetune.py:1094-1096) — the first optimizer step runs at
    ~10% lr, never 0. (Reference quirk NOT reproduced: its per-step
    param_group overwrite silently cancels MultiStepLR decay whenever warmup
    is enabled; here decay applies regardless.)"""

    def fn(step):
        lr = jnp.asarray(cfg.learning_rate, jnp.float32)
        if cfg.warmup_steps > 0:
            progress = jnp.minimum((step + 1) / cfg.warmup_steps, 1.0)
            lr = lr * (0.1 + 0.9 * progress)
        return jnp.where(step >= cfg.num_steps_before_decay,
                         lr * cfg.lr_decay_factor, lr)

    return fn


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    chain.append(optax.adamw(lr_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=cfg.weight_decay))
    tx = optax.chain(*chain)
    if cfg.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accumulation_steps)
    return tx


@dataclasses.dataclass
class TrainState:
    base_params: Params     # frozen VLA (llm + vision_backbone + projector)
    trainables: Params      # {lora, action_head, proprio_projector, ...}
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


jax.tree_util.register_dataclass(
    TrainState, data_fields=["base_params", "trainables", "opt_state", "step",
                             "rng"], meta_fields=[])


def create_train_state(base_params: Params, trainables: Params,
                       cfg: TrainConfig, rng) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(base_params, trainables, tx.init(trainables),
                      jnp.zeros((), jnp.int32), rng)


def _merged_params(base: Params, trainables: Params, cfg: TrainConfig) -> Params:
    params = inject_lora(base, trainables["lora"], cfg.lora_rank, cfg.lora_alpha) \
        if "lora" in trainables else dict(base)
    # Full-parameter training (legacy pretrain path): trainable subtrees for
    # the core modules shadow the frozen base ones.
    for k in ("llm", "vision_backbone", "projector",
              "proprio_projector", "noisy_action_projector", "film"):
        if k in trainables:
            params[k] = trainables[k]
    if "llm_last_layer" in trainables:
        # Reference last_layer_finetune_modules = (embed_tokens, layers[-1],
        # lm_head) (llm/llama2.py:101-102): the trainable subtree carries the
        # LAST slice of each stacked layer array plus embed/lm_head wholesale;
        # reassemble inside jit so only those leaves receive grads/updates.
        t = trainables["llm_last_layer"]
        llm = dict(params["llm"])
        llm["layers"] = jax.tree_util.tree_map(
            lambda b, last: b.at[-1].set(last.astype(b.dtype)),
            llm["layers"], t["layers"])
        llm["embed"] = t["embed"]
        if "lm_head" in llm and "lm_head" in t:
            llm["lm_head"] = t["lm_head"]
        params["llm"] = llm
    return params


def loss_and_metrics(
    trainables: Params,
    base_params: Params,
    batch: Dict[str, jnp.ndarray],
    model_cfg: OpenVLAConfig,
    platform: PlatformSpec,
    cfg: TrainConfig,
    rng,
    use_flash: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    params = _merged_params(base_params, trainables, cfg)
    gt_actions = batch.get("actions")

    noisy_actions = diffusion_t_emb = noise = None
    if cfg.objective == "diffusion":
        nd = diffusion_sample_noisy_actions(
            trainables["action_head"], rng, gt_actions, platform,
            llm_dim=model_cfg.llm_dim, num_diffusion_steps=cfg.num_diffusion_steps)
        noise, noisy_actions = nd["noise"], nd["noisy_actions"]
        diffusion_t_emb = nd["diffusion_timestep_embeddings"]

    out = prismatic_forward(
        params, model_cfg, platform,
        input_ids=batch["input_ids"], attention_mask=batch["attention_mask"],
        pixels=batch["pixel_values"], labels=batch["labels"],
        proprio=batch.get("proprio") if cfg.use_proprio else None,
        noisy_actions=noisy_actions, diffusion_t_emb=diffusion_t_emb,
        use_flash=use_flash, compute_logits=(cfg.objective == "discrete"),
        remat=(cfg.remat_policy != "none"), remat_policy=cfg.remat_policy,
        gather_actions=(cfg.objective in ("l1", "diffusion")))

    metrics: Dict[str, jnp.ndarray] = {}
    if cfg.objective == "l1":
        pred = l1_head_predict(trainables["action_head"],
                               out.actions_hidden.astype(jnp.bfloat16), platform)
        loss = jnp.mean(jnp.abs(gt_actions.astype(jnp.float32)
                                - pred.astype(jnp.float32)))
        metrics["curr_action_l1_loss"] = jnp.mean(
            jnp.abs(gt_actions[:, 0] - pred[:, 0]).astype(jnp.float32))
        metrics["next_actions_l1_loss"] = jnp.mean(
            jnp.abs(gt_actions[:, 1:] - pred[:, 1:]).astype(jnp.float32))
    elif cfg.objective == "diffusion":
        pred_noise = diffusion_predict_noise(
            trainables["action_head"], out.actions_hidden.astype(jnp.bfloat16),
            platform)
        loss = jnp.mean(jnp.square(pred_noise.astype(jnp.float32)
                                   - noise.astype(jnp.float32)))
    elif cfg.objective == "discrete":
        # HF CausalLM CE: shift logits left / labels right, mean over non-IGNORE.
        logits = out.logits[:, :-1]
        labels = out.multimodal_labels[:, 1:]
        valid = labels != IGNORE_INDEX
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
        preds = jnp.argmax(logits, axis=-1)
        acc = jnp.sum((preds == labels) & valid) / jnp.maximum(jnp.sum(valid), 1)
        metrics["token_accuracy"] = acc
        # Current vs next action accuracy + continuous L1 from bin centers
        # (reference finetune.py:363-377 / train_utils.py:42-56), computed
        # in-jit via the uniform-bin decode.
        from openvla_oft_tpu.constants import LLAMA2_VOCAB_SIZE, N_ACTION_BINS
        from openvla_oft_tpu.ops.masks import (
            get_current_action_mask,
            get_next_actions_mask,
        )

        cur = get_current_action_mask(labels, platform.action_dim)
        nxt = get_next_actions_mask(labels, platform.action_dim)
        bins = jnp.linspace(-1.0, 1.0, N_ACTION_BINS)
        centers = (bins[:-1] + bins[1:]) / 2.0

        def decode(ids):
            d = jnp.clip(LLAMA2_VOCAB_SIZE - ids - 1, 0, N_ACTION_BINS - 2)
            return centers[d]

        def masked_acc(mask):
            return jnp.sum((preds == labels) & mask) / jnp.maximum(
                jnp.sum(mask), 1)

        def masked_l1(mask):
            diff = jnp.abs(decode(preds) - decode(labels)) * mask
            return jnp.sum(diff) / jnp.maximum(jnp.sum(mask), 1)

        metrics["curr_action_accuracy"] = masked_acc(cur)
        metrics["next_actions_accuracy"] = masked_acc(nxt)
        metrics["curr_action_l1_loss"] = masked_l1(cur)
        metrics["next_actions_l1_loss"] = masked_l1(nxt)
    else:
        raise ValueError(f"Unknown objective {cfg.objective!r}")

    metrics["loss"] = loss
    return loss, metrics


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model_cfg: OpenVLAConfig,
    platform: PlatformSpec,
    cfg: TrainConfig,
    tx: Optional[optax.GradientTransformation] = None,
    use_flash: bool = False,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step. jit with static (model_cfg, platform, cfg)."""
    tx = tx if tx is not None else make_optimizer(cfg)
    rng, step_rng = jax.random.split(state.rng)

    (loss, metrics), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(
        state.trainables, state.base_params, batch, model_cfg, platform, cfg,
        step_rng, use_flash)

    updates, new_opt = tx.update(grads, state.opt_state, state.trainables)
    new_trainables = optax.apply_updates(state.trainables, updates)
    new_state = TrainState(state.base_params, new_trainables, new_opt,
                           state.step + 1, rng)
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def diffusion_sampling_metrics(
    trainables: Params,
    base_params: Params,
    batch: Dict[str, jnp.ndarray],
    model_cfg: OpenVLAConfig,
    platform: PlatformSpec,
    cfg: TrainConfig,
    rng,
    use_flash: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Reverse-diffusion sampling on a TRAINING batch -> action L1 metrics
    (reference `run_diffusion_sampling`, finetune.py:454-540, invoked every
    `diffusion_sample_freq` steps). One `lax.scan` over all T steps using the
    training layout, so the periodic metric costs ~T forward passes in one
    compiled program."""
    from openvla_oft_tpu.models.action_heads import (
        diffusion_scheduler,
        sinusoidal_time_encoding,
    )

    params = _merged_params(base_params, trainables, cfg)
    gt_actions = batch["actions"]
    b = gt_actions.shape[0]
    sched = diffusion_scheduler(cfg.num_diffusion_steps)
    ts = jnp.asarray(sched.timesteps(cfg.num_diffusion_steps))
    noise = jax.random.normal(rng, gt_actions.shape, jnp.float32)

    def body(x_t, t):
        t_emb = sinusoidal_time_encoding(
            jnp.broadcast_to(t[None], (b,)), model_cfg.llm_dim)[:, None, :]
        out = prismatic_forward(
            params, model_cfg, platform,
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            pixels=batch["pixel_values"], labels=batch["labels"],
            proprio=batch.get("proprio") if cfg.use_proprio else None,
            noisy_actions=x_t, diffusion_t_emb=t_emb, use_flash=use_flash,
            compute_logits=False, remat=(cfg.remat_policy != "none"),
            remat_policy=cfg.remat_policy)
        eps = diffusion_predict_noise(
            trainables["action_head"],
            out.actions_hidden.astype(jnp.bfloat16), platform)
        return sched.step(eps.astype(jnp.float32), t, x_t,
                          cfg.num_diffusion_steps), None

    sampled, _ = jax.lax.scan(body, noise, ts)
    l1 = jnp.abs(gt_actions.astype(jnp.float32) - sampled)
    return {
        "sampled_actions_l1_loss": jnp.mean(l1),
        "curr_action_l1_loss_sampled": jnp.mean(l1[:, 0]),
        "next_actions_l1_loss_sampled": jnp.mean(l1[:, 1:]),
    }
