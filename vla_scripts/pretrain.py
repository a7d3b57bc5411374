"""VLM pretraining: align / finetune stages on LLaVA-format data
(reference `scripts/pretrain.py` — projector-align then instruct-finetune).

Stage "align" trains only the vision projector on captioning; stage
"finetune" trains projector + LLM on multi-turn instruct data. Objective is
next-token CE over the multimodal sequence; runs on the dp×fsdp×tp mesh.
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
class PretrainConfig:
    # fmt: off
    model_id: str = "prism-dinosiglip-224px+7b"
    pretrained_checkpoint: Optional[str] = None   # None/random:* = fresh
    stage: str = "align"                          # "align" | "finetune"
    llava_json: str = ""                          # LLaVA-format json
    image_root: str = ""
    # named variant (reference conf/datasets.py DatasetRegistry) — used when
    # llava_json is empty: resolves json/images under dataset_root_dir
    dataset_id: str = "llava-v15"
    dataset_root_dir: str = ""
    run_root_dir: Path = Path("runs")

    batch_size: int = 16
    learning_rate: float = 1e-3                   # align default; 2e-5 finetune
    max_steps: int = 10_000
    save_interval: int = 2500
    seq_bucket: int = 128
    seed: int = 7

    mesh_dp: int = 1
    mesh_fsdp: int = 1
    mesh_tp: int = 1
    # fmt: on


STAGE_TRAINABLE = {"align": ("projector",), "finetune": ("projector", "llm")}


def pretrain(cfg: PretrainConfig) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.data.collator import (
        PaddedCollatorForActionPrediction, batch_iterator)
    from openvla_oft_tpu.data.vlm_datasets import VLMPretrainDataset
    from openvla_oft_tpu.parallel.mesh import make_mesh
    from openvla_oft_tpu.parallel.sharding import shard_params
    from openvla_oft_tpu.policy import init_openvla_params
    from openvla_oft_tpu.processing.processor import PrismaticProcessor
    from openvla_oft_tpu.training.checkpoint import save_checkpoint
    from openvla_oft_tpu.training.metrics import JSONLinesTracker, VLAMetrics
    from openvla_oft_tpu.training.train_step import (
        TrainConfig as StepConfig, create_train_state, make_optimizer,
        train_step)
    from openvla_oft_tpu.utils.overwatch import initialize_overwatch

    overwatch = initialize_overwatch("pretrain")
    assert cfg.stage in STAGE_TRAINABLE

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
                                   LIBERO, dtype=jnp.bfloat16, head=None,
                                   with_lm_head=True, use_proprio=False)
    else:
        from openvla_oft_tpu.utils.hf_import import load_openvla_checkpoint

        model_cfg, full, _ = load_openvla_checkpoint(ckpt, dtype=jnp.bfloat16)

    trainable_keys = STAGE_TRAINABLE[cfg.stage]
    base = {k: v for k, v in full.items() if k not in trainable_keys}
    trainables = {k: full[k] for k in trainable_keys if k in full}
    overwatch.info(f"stage={cfg.stage} trainable={sorted(trainables)}")

    scfg = StepConfig(objective="discrete", learning_rate=cfg.learning_rate,
                      use_proprio=False, num_steps_before_decay=10 ** 9)
    mesh = make_mesh(dp=cfg.mesh_dp, fsdp=cfg.mesh_fsdp, tp=cfg.mesh_tp)
    run_id = f"{cfg.model_id}+stage-{cfg.stage}+x{cfg.seed}"
    run_dir = os.path.join(str(cfg.run_root_dir), run_id)
    os.makedirs(run_dir, exist_ok=True)

    llava_json, image_root = cfg.llava_json, cfg.image_root
    if not llava_json:
        from openvla_oft_tpu.data.vlm_datasets import resolve_vlm_dataset

        llava_json, image_root = resolve_vlm_dataset(
            cfg.dataset_id, cfg.stage, cfg.dataset_root_dir)

    processor = PrismaticProcessor(model_cfg)
    dataset = VLMPretrainDataset(llava_json, image_root, processor,
                                 stage=cfg.stage,
                                 llm_backbone_id=model_cfg.llm_backbone_id,
                                 # truncate to the bucket so long multi-turn
                                 # conversations pad instead of crashing the
                                 # fixed-shape collator
                                 max_length=cfg.seq_bucket)
    collator = PaddedCollatorForActionPrediction(
        pad_token_id=model_cfg.pad_token_id, max_length=cfg.seq_bucket)

    def batches():
        while True:
            for ex in dataset:
                yield ex

    with mesh:
        base_s = shard_params(base, mesh)
        train_s = shard_params(trainables, mesh)
        state = create_train_state(base_s, train_s, scfg,
                                   jax.random.PRNGKey(cfg.seed))
        metrics = VLAMetrics([JSONLinesTracker(run_dir, run_id)])
        tx = make_optimizer(scfg)
        step_fn = jax.jit(lambda st, bt: train_step(st, bt, model_cfg, LIBERO,
                                                    scfg, tx=tx))
        sharding = NamedSharding(mesh, P(("dp", "fsdp")))
        from openvla_oft_tpu.data.prefetch import DevicePrefetcher

        prefetched = DevicePrefetcher(
            batch_iterator(batches(), cfg.batch_size, collator),
            sharding=sharding)
        for i, batch in enumerate(prefetched):
            if i >= cfg.max_steps:
                break
            state, m = step_fn(state, batch)
            metrics.commit(**{k: float(v) for k, v in m.items()})
            if i % 10 == 0:
                s = metrics.push(i)
                overwatch.info(f"[step {i}] loss={s.get('loss', -1):.4f} "
                               f"acc={s.get('token_accuracy', -1):.3f}")
            if (i + 1) % cfg.save_interval == 0 or i + 1 == cfg.max_steps:
                # async: write overlaps the next steps; waited on below
                save_checkpoint(os.path.join(run_dir, "ckpt"), i + 1,
                                {"trainables": state.trainables}, block=False)
        prefetched.close()  # release worker + HBM-pinned buffered batches
        from openvla_oft_tpu.training.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
        metrics.finalize()
    return {"run_dir": run_dir, "final_step": int(state.step)}


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    pretrain(parse_args(PretrainConfig))
