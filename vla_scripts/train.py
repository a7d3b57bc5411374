"""Full VLA pretraining with freeze stages (reference `vla-scripts/train.py`).

The reference runs the prismatic-native VLM under FSDP with a next-token CE
objective and freeze stages (train.py:159-176). Here the same objective runs
as full-parameter training on the dp×fsdp×tp mesh: the stage selects which
module subtrees are trainable (the rest stay frozen in the base tree), and
parameter + optimizer-state sharding is the FSDP analog.

Stages (reference `PrismaticVLM.freeze_backbones`, vlms/prismatic.py:129-242):
  vla-full-train       vision + projector + LLM
  vla-train            projector + LLM (vision frozen)
  vla-sandwich-train   vision + projector + LLM
  vla-last-layer-train projector only here (per-layer LLM slicing of the
                       stacked tree is approximated by freezing the LLM)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class TrainConfig:
    # fmt: off
    vla_id: str = "prism-dinosiglip-224px+mx-oxe-magic-soup-plus"
    stage: str = "vla-full-train"
    pretrained_checkpoint: Optional[str] = None   # HF-format dir or random:*
    data_root_dir: Path = Path("datasets/open-x-embodiment")
    dataset_name: str = "bridge"
    run_root_dir: Path = Path("runs")
    run_id: Optional[str] = None

    batch_size: int = 32
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    max_steps: int = 200_000
    save_interval: int = 2500
    image_aug: bool = False
    shuffle_buffer_size: int = 256_000
    seed: int = 7

    mesh_dp: int = 1
    mesh_fsdp: int = 1
    mesh_tp: int = 1
    robot_platform: Optional[str] = None
    # fmt: on


# Reference freeze_backbones (prismatic/models/vlms/prismatic.py:129-235):
#   vla-train            : projector + full LLM (vision frozen)
#   vla-full-train       : everything
#   vla-sandwich-train   : vision + projector + LAST LLM layer only
#   vla-last-layer-train : LAST LLM layer only (projector + vision frozen)
# "LAST LLM layer" = last_layer_finetune_modules = (embed_tokens, layers[-1],
# lm_head) (llm/llama2.py:101-102), realized here as the `llm_last_layer`
# trainables subtree (train_step._merged_params reassembles it in-jit).
STAGE_TRAINABLE = {
    "vla-full-train": ("llm", "vision_backbone", "projector"),
    "vla-train": ("llm", "projector"),
    "vla-sandwich-train": ("vision_backbone", "projector", "llm_last_layer"),
    "vla-last-layer-train": ("llm_last_layer",),
}


def train(cfg: TrainConfig) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import detect_robot_platform, get_platform
    from openvla_oft_tpu.data.collator import (
        PaddedCollatorForActionPrediction, batch_iterator)
    from openvla_oft_tpu.data.datasets import DummyDataset, RLDSBatchTransform
    from openvla_oft_tpu.parallel.mesh import make_mesh
    from openvla_oft_tpu.parallel.sharding import shard_params
    from openvla_oft_tpu.policy import init_openvla_params
    from openvla_oft_tpu.processing.action_tokenizer import ActionTokenizer
    from openvla_oft_tpu.processing.processor import PrismaticProcessor
    from openvla_oft_tpu.training.checkpoint import save_checkpoint
    from openvla_oft_tpu.training.metrics import JSONLinesTracker, VLAMetrics
    from openvla_oft_tpu.training.train_step import (
        TrainConfig as StepConfig, create_train_state, make_optimizer, train_step)
    from openvla_oft_tpu.utils.overwatch import initialize_overwatch

    overwatch = initialize_overwatch("train")
    platform = get_platform(cfg.robot_platform) if cfg.robot_platform else \
        detect_robot_platform(cfg.dataset_name)
    assert cfg.stage in STAGE_TRAINABLE, f"unknown stage {cfg.stage}"

    ckpt = cfg.pretrained_checkpoint or "random:tiny"
    if ckpt.startswith("random:"):
        if ckpt == "random:tiny":
            from openvla_oft_tpu.config import TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP

            C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
            C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
            model_cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                                      llm_backbone_id="tiny-llama")
        else:
            model_cfg = OpenVLAConfig()
        full = init_openvla_params(jax.random.PRNGKey(cfg.seed), model_cfg,
                                   platform, dtype=jnp.bfloat16, head=None,
                                   with_lm_head=True)
        norm_stats = None
    else:
        from openvla_oft_tpu.utils.hf_import import load_openvla_checkpoint

        model_cfg, full, norm_stats = load_openvla_checkpoint(
            ckpt, dtype=jnp.bfloat16)

    trainable_keys = STAGE_TRAINABLE[cfg.stage]
    base = {k: v for k, v in full.items()
            if k not in trainable_keys}
    trainables = {k: full[k] for k in trainable_keys if k in full}
    if "llm_last_layer" in trainable_keys:
        trainables["llm_last_layer"] = {
            "layers": jax.tree_util.tree_map(lambda a: a[-1],
                                             full["llm"]["layers"]),
            "embed": full["llm"]["embed"],
            **({"lm_head": full["llm"]["lm_head"]}
               if "lm_head" in full["llm"] else {}),
        }
    overwatch.info(f"stage={cfg.stage} trainable={sorted(trainables)} "
                   f"frozen={sorted(base)}")

    scfg = StepConfig(objective="discrete", learning_rate=cfg.learning_rate,
                      weight_decay=cfg.weight_decay, use_proprio=False,
                      num_steps_before_decay=10 ** 9)
    mesh = make_mesh(dp=cfg.mesh_dp, fsdp=cfg.mesh_fsdp, tp=cfg.mesh_tp)
    run_id = cfg.run_id or f"{cfg.vla_id}+stage-{cfg.stage}+x{cfg.seed}"
    run_dir = os.path.join(str(cfg.run_root_dir), run_id)
    os.makedirs(run_dir, exist_ok=True)

    with mesh:
        base_s = shard_params(base, mesh)
        train_s = shard_params(trainables, mesh)
        state = create_train_state(base_s, train_s, scfg,
                                   jax.random.PRNGKey(cfg.seed))

        processor = PrismaticProcessor(model_cfg)
        transform = RLDSBatchTransform(processor, ActionTokenizer(), platform)
        if str(cfg.data_root_dir) == "dummy":
            dataset = DummyDataset(
                transform, image_size=model_cfg.vision_configs[0].image_size,
                num_samples=cfg.max_steps * cfg.batch_size)
        else:
            from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

            dataset, data_stats = make_rlds_iterator(
                str(cfg.data_root_dir), cfg.dataset_name, transform, platform,
                shuffle_buffer_size=cfg.shuffle_buffer_size,
                image_aug=cfg.image_aug)
            # reference train.py:202-204: the statistics MUST ride with the
            # run so eval can un-normalize actions
            from openvla_oft_tpu.data.transforms import save_dataset_statistics

            save_dataset_statistics(data_stats, run_dir)
            norm_stats = norm_stats or data_stats

        collator = PaddedCollatorForActionPrediction(
            pad_token_id=model_cfg.pad_token_id)
        metrics = VLAMetrics([JSONLinesTracker(run_dir, run_id)])
        tx = make_optimizer(scfg)
        step_fn = jax.jit(lambda st, bt: train_step(st, bt, model_cfg, platform,
                                                    scfg, tx=tx))
        sharding = NamedSharding(mesh, P(("dp", "fsdp")))

        from openvla_oft_tpu.data.prefetch import DevicePrefetcher

        prefetched = DevicePrefetcher(
            batch_iterator(dataset, cfg.batch_size, collator),
            sharding=sharding)
        for i, batch in enumerate(prefetched):
            if i >= cfg.max_steps:
                break
            state, m = step_fn(state, batch)
            metrics.commit(**{k: float(v) for k, v in m.items()})
            if i % 10 == 0:
                smoothed = metrics.push(i)
                overwatch.info(f"[step {i}] loss={smoothed.get('loss', -1):.4f}")
            if (i + 1) % cfg.save_interval == 0 or i + 1 == cfg.max_steps:
                # async: write overlaps the next steps; waited on below
                save_checkpoint(os.path.join(run_dir, "ckpt"), i + 1,
                                {"trainables": state.trainables,
                                 "opt_state": state.opt_state}, block=False)
        prefetched.close()  # release worker + HBM-pinned buffered batches
        from openvla_oft_tpu.training.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
        metrics.finalize()
    return {"final_step": int(state.step), "run_dir": run_dir}


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    train(parse_args(TrainConfig))
