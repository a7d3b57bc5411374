"""Fine-tune OpenVLA via LoRA on TPU (reference `vla-scripts/finetune.py`).

CLI-compatible with the reference `FinetuneConfig` (finetune.py:79-131): the
same flags drive the same behaviors (L1/diffusion/discrete objectives, FiLM,
proprio, multi-image, LoRA, MultiStep LR decay, per-module checkpoints,
resume, validation loop). TPU-native additions: a dp×fsdp×tp device mesh
(`--mesh_dp/--mesh_fsdp/--mesh_tp`), sharded optimizer state, one jitted
train step, Orbax checkpoints alongside reference-format exports.

Run (LIBERO example, mirrors LIBERO.md:92-113):
    python vla_scripts/finetune.py \
      --vla_path <ckpt-dir> --data_root_dir <rlds-root> \
      --dataset_name libero_spatial_no_noops --use_l1_regression True \
      --use_proprio True --batch_size 8 --learning_rate 5e-4 --max_steps 150005
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# Avoid HF tokenizers' fork-unsafe threading in dataloader workers
# (reference finetune.py:67).
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")


@dataclasses.dataclass
class FinetuneConfig:
    # fmt: off
    vla_path: str = "openvla/openvla-7b"          # checkpoint dir (HF format) or "random:<tiny|7b>" for smoke runs

    # Dataset
    data_root_dir: Path = Path("datasets/rlds")   # RLDS root (or "dummy")
    dataset_name: str = "aloha_scoop_x_into_bowl"
    run_root_dir: Path = Path("runs")
    shuffle_buffer_size: int = 100_000

    # Algorithm / architecture
    use_l1_regression: bool = True
    use_diffusion: bool = False
    num_diffusion_steps: int = 50
    use_film: bool = False
    num_images_in_input: int = 1
    use_proprio: bool = False

    # Training
    batch_size: int = 8                           # GLOBAL batch (sharded over mesh)
    learning_rate: float = 5e-4
    lr_warmup_steps: int = 0
    num_steps_before_decay: int = 100_000
    grad_accumulation_steps: int = 1
    max_steps: int = 200_000
    use_val_set: bool = False
    val_freq: int = 10_000
    val_time_limit: int = 180
    save_freq: int = 10_000
    save_latest_checkpoint_only: bool = False
    resume: bool = False
    resume_step: Optional[int] = None
    image_aug: bool = True
    diffusion_sample_freq: int = 50

    # LoRA
    use_lora: bool = True
    lora_rank: int = 32
    lora_dropout: float = 0.0
    merge_lora_during_training: bool = True

    # Logging
    wandb_entity: str = "your-wandb-entity"
    wandb_project: str = "your-wandb-project"
    run_id_note: Optional[str] = None
    run_id_override: Optional[str] = None
    wandb_log_freq: int = 10

    # TPU-native additions
    recipe: Optional[str] = None                  # named recipe (training/recipes.py)
    multihost: bool = False                       # jax.distributed.initialize()
    coordinator_address: Optional[str] = None     # explicit cluster wiring for
    num_processes: Optional[int] = None           # environments without TPU-pod
    process_id: Optional[int] = None              # metadata (e.g. the 2-process
                                                  # CPU dryrun, dryrun_multiprocess.py)
    mesh_dp: int = 1
    mesh_fsdp: int = 1
    mesh_tp: int = 1
    robot_platform: Optional[str] = None          # default: sniff dataset_name
    seq_bucket: int = 0                           # 0 = auto (pad to multiple of 8)
    use_flash_attention: str = "auto"             # "auto" | "true" | "false";
                                                  # auto = Pallas kernel iff the
                                                  # multimodal S clears
                                                  # FLASH_SEQ_THRESHOLD (ALOHA
                                                  # yes, LIBERO no) — same
                                                  # dispatch the serving path uses
    quantize_base: bool = False                   # QLoRA-style int8 frozen base
                                                  # (fits 7B LoRA on one 16 GB chip;
                                                  # straight-through bwd, ops/quant.py)
    quantize_base_min_dim: int = 1024             # smallest contraction dim quantized
    quantize_base_bits: int = 8                   # 8 (int8 MXU) | 4 (packed int4,
                                                  # max HBM headroom for b>=2)
    remat_policy: str = "all"                     # "all" | "dots" | "attn_out" | "none"
                                                  # (activation remat; see
                                                  # training/train_step.py)
    # fmt: on


def get_run_id(cfg: FinetuneConfig) -> str:
    """Reference run-ID convention (finetune.py:159-190)."""
    if cfg.run_id_override is not None:
        return cfg.run_id_override
    if cfg.resume:
        run_id = cfg.vla_path.split("/")[-1]
        if "chkpt" in run_id.split("--")[-1]:
            run_id = "--".join(run_id.split("--")[:-1])
        return run_id
    run_id = (f"{cfg.vla_path.split('/')[-1]}+{cfg.dataset_name}"
              f"+b{cfg.batch_size * cfg.grad_accumulation_steps}"
              f"+lr-{cfg.learning_rate}")
    if cfg.use_lora:
        run_id += f"+lora-r{cfg.lora_rank}+dropout-{cfg.lora_dropout}"
    if cfg.image_aug:
        run_id += "--image_aug"
    if cfg.run_id_note is not None:
        run_id += f"--{cfg.run_id_note}"
    return run_id


def finetune(cfg: FinetuneConfig) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import detect_robot_platform, get_platform
    from openvla_oft_tpu.data.collator import (
        PaddedCollatorForActionPrediction, batch_iterator)
    from openvla_oft_tpu.data.datasets import DummyDataset, RLDSBatchTransform
    from openvla_oft_tpu.data.transforms import save_dataset_statistics
    from openvla_oft_tpu.parallel.mesh import make_mesh
    from openvla_oft_tpu.parallel.sharding import put_global, shard_params
    from openvla_oft_tpu.policy import init_openvla_params
    from openvla_oft_tpu.processing.action_tokenizer import ActionTokenizer
    from openvla_oft_tpu.processing.processor import PrismaticProcessor
    from openvla_oft_tpu.training.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint)
    from openvla_oft_tpu.training.lora import init_lora
    from openvla_oft_tpu.training.metrics import JSONLinesTracker, VLAMetrics, \
        WeightsBiasesTracker
    from openvla_oft_tpu.training.train_step import (
        TrainConfig, TrainState, create_train_state, make_optimizer, train_step)
    from openvla_oft_tpu.utils.hf_import import load_openvla_checkpoint

    if cfg.multihost:
        # Multi-host TPU pods: wire up the JAX distributed runtime (the
        # torchrun/NCCL process-group analog, SURVEY.md §2.8/§5.8). On pods
        # the no-arg form auto-detects the cluster; explicit flags serve
        # clusters without TPU metadata (the 2-process CPU dryrun).
        kw = {}
        if cfg.coordinator_address is not None:
            kw = dict(coordinator_address=cfg.coordinator_address,
                      num_processes=cfg.num_processes,
                      process_id=cfg.process_id)
        jax.distributed.initialize(**kw)
        print(f"[finetune] process {jax.process_index()}/{jax.process_count()}"
              f" up with {jax.local_device_count()} local devices")
    n_proc = jax.process_count()
    is_primary = jax.process_index() == 0

    if cfg.recipe:
        from openvla_oft_tpu.training.recipes import apply_recipe

        cfg = apply_recipe(cfg, cfg.recipe)
        print(f"[finetune] applied recipe {cfg.recipe!r}")

    assert not (cfg.use_l1_regression and cfg.use_diffusion), \
        "choose at most one continuous objective"
    assert cfg.use_lora, \
        "Only LoRA fine-tuning is supported (reference finetune.py:779); " \
        "use vla_scripts/train.py for full-parameter training"
    assert cfg.lora_dropout == 0.0, \
        "lora_dropout is not implemented in the TPU LoRA path (the reference " \
        "recipes all use 0.0); a nonzero value would silently diverge"
    objective = ("l1" if cfg.use_l1_regression else
                 "diffusion" if cfg.use_diffusion else "discrete")
    platform = get_platform(cfg.robot_platform) if cfg.robot_platform else \
        detect_robot_platform(cfg.dataset_name)
    run_id = get_run_id(cfg)
    run_dir = os.path.join(str(cfg.run_root_dir), run_id)
    os.makedirs(run_dir, exist_ok=True)
    print(f"[finetune] run_id={run_id} objective={objective} "
          f"platform={platform.name}")

    # === Model ===
    # Build/load/quantize the parameter tree ON HOST: eager 7B init on a
    # 16 GB chip OOMs (the bf16 tree plus per-leaf PRNG uint32 transients
    # peaks ~19 GB), and checkpoint loads are host numpy anyway. The only
    # device transfer is shard_params moving the FINAL (possibly int8)
    # leaves onto the mesh.
    host_cpu = jax.local_devices(backend="cpu")[0]  # local: jax.devices()[0]
    # is process 0's device, non-addressable from other processes
    head = {"l1": "l1", "diffusion": "diffusion", "discrete": None}[objective]
    norm_stats = None

    def _make_model_cfg():
        if cfg.vla_path.startswith("random:") \
                and cfg.vla_path.split(":", 1)[1] == "tiny":
            from openvla_oft_tpu.config import (TINY_DINOV2, TINY_LLAMA,
                                                TINY_SIGLIP)

            C._VISION_REGISTRY.setdefault("tiny-dual",
                                          (TINY_DINOV2, TINY_SIGLIP))
            C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
            return OpenVLAConfig(
                vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama",
                num_images_in_input=cfg.num_images_in_input,
                use_film=cfg.use_film)
        return OpenVLAConfig(num_images_in_input=cfg.num_images_in_input,
                             use_film=cfg.use_film)

    def _build_model_host():
        """Init/load the full tree, split base vs trainables, quantize.
        Runs entirely on host CPU (see the default_device scope at the call
        site). Returns (base, trainables, model_cfg, norm_stats)."""
        norm_stats = None
        if cfg.vla_path.startswith("random:"):
            model_cfg = _make_model_cfg()
            full = init_openvla_params(
                jax.random.PRNGKey(0), model_cfg, platform,
                dtype=jnp.bfloat16, head=head,
                with_lm_head=(objective == "discrete"))
        else:
            model_cfg, base_loaded, norm_stats = load_openvla_checkpoint(
                cfg.vla_path, dtype=jnp.bfloat16)
            model_cfg = dataclasses.replace(
                model_cfg, num_images_in_input=cfg.num_images_in_input,
                use_film=cfg.use_film)
            full = init_openvla_params(
                jax.random.PRNGKey(0), model_cfg, platform,
                dtype=jnp.bfloat16, head=head,
                with_lm_head=(objective == "discrete"))
            for k in ("llm", "vision_backbone", "projector"):
                full[k] = base_loaded[k]

        base = {k: full[k] for k in ("llm", "vision_backbone", "projector")}
        trainables = {}
        if cfg.use_lora:
            trainables["lora"] = init_lora(jax.random.PRNGKey(1), base,
                                           rank=cfg.lora_rank)
        if cfg.quantize_base:
            # QLoRA on TPU: int8 frozen base (per-out-channel symmetric),
            # fp32 LoRA on top; backward is straight-through (ops/quant.py
            # _int8_matmul). Kernels are donated so the bf16 and int8 trees
            # never coexist in HBM.
            from openvla_oft_tpu.ops.quant import quantize_tree_lowmem

            for k in ("llm", "vision_backbone", "projector"):
                base[k] = quantize_tree_lowmem(
                    base[k], min_dim=cfg.quantize_base_min_dim,
                    bits=cfg.quantize_base_bits)
        for k in ("action_head", "proprio_projector",
                  "noisy_action_projector", "film"):
            if k in full and (k != "proprio_projector" or cfg.use_proprio):
                trainables[k] = full[k]
        return base, trainables, model_cfg, norm_stats

    # Random-base + QLoRA runs cache the finished HOST tree: the 7B CPU init
    # + int8 quantization costs ~50 min on a 1-core host and is fully
    # deterministic (PRNGKey(0)/(1)), so pay it once per configuration.
    _cache = None
    if cfg.vla_path.startswith("random:") and cfg.quantize_base:
        _key = (f"{cfg.vla_path.split(':', 1)[1]}_b{cfg.quantize_base_bits}"
                f"_d{cfg.quantize_base_min_dim}_h{head}"
                f"_p{int(cfg.use_proprio)}_i{cfg.num_images_in_input}"
                f"_f{int(cfg.use_film)}_r{cfg.lora_rank}"
                f"_lm{int(objective == 'discrete')}")
        _cache = Path(".cache") / f"qbase_{_key}.pkl"
    if _cache is not None and _cache.exists():
        import pickle

        with open(_cache, "rb") as f:
            cached = pickle.load(f)
        base, trainables = cached["base"], cached["trainables"]
        model_cfg = _make_model_cfg()
        print(f"[finetune] loaded cached quantized base from {_cache}")
    else:
        with jax.default_device(host_cpu):
            base, trainables, model_cfg, norm_stats = _build_model_host()
        if _cache is not None:
            import pickle

            _cache.parent.mkdir(exist_ok=True)
            host_np = jax.tree_util.tree_map(np.asarray,
                                             {"base": base,
                                              "trainables": trainables})
            with open(_cache, "wb") as f:
                pickle.dump(host_np, f, protocol=4)
            print(f"[finetune] cached quantized base -> {_cache}")

    tcfg = TrainConfig(
        objective=objective, learning_rate=cfg.learning_rate,
        num_steps_before_decay=cfg.num_steps_before_decay,
        warmup_steps=cfg.lr_warmup_steps, lora_rank=cfg.lora_rank,
        lora_alpha=float(min(cfg.lora_rank, 16)), use_proprio=cfg.use_proprio,
        use_film=cfg.use_film, num_diffusion_steps=cfg.num_diffusion_steps,
        grad_accumulation_steps=cfg.grad_accumulation_steps,
        remat_policy=cfg.remat_policy)

    # === Mesh + state ===
    mesh = make_mesh(dp=cfg.mesh_dp, fsdp=cfg.mesh_fsdp, tp=cfg.mesh_tp)
    with mesh:
        base_s = shard_params(base, mesh)
        train_s = shard_params(trainables, mesh)
        state = create_train_state(base_s, train_s, tcfg, jax.random.PRNGKey(2))
        # Homogeneous mesh placement: tx.init leaves optimizer scalars
        # (count) and the step counter on the default device; restoring a
        # checkpoint against that template commits them single-device, which
        # deadlocks/errors against mesh-wide params in multi-process runs.
        # Put moments under the param sharding rules and scalars replicated.
        state = TrainState(
            state.base_params, state.trainables,
            shard_params(state.opt_state, mesh),
            put_global(state.step, NamedSharding(mesh, P())),
            put_global(state.rng, NamedSharding(mesh, P())))

        ckpt_dir = os.path.join(run_dir, "ckpt")
        if cfg.resume:
            step0 = cfg.resume_step if cfg.resume_step is not None else latest_step(ckpt_dir)
            assert step0 is not None, f"no checkpoint to resume in {ckpt_dir}"
            try:
                restored = restore_checkpoint(
                    ckpt_dir, step0,
                    template={"trainables": state.trainables,
                              "opt_state": state.opt_state})
            except Exception as e:
                # Pre-rank-major checkpoints stored LoRA A as (in, r); the
                # current layout is (r, in) (training/lora.py::init_lora).
                # Shape mismatch surfaces here as an Orbax restore error —
                # turn it into an actionable message instead of a traceback.
                if "shape" in str(e).lower() or "Shape" in str(e):
                    raise RuntimeError(
                        f"resume from {ckpt_dir} step {step0} failed on a "
                        "shape mismatch. If this run was started before the "
                        "rank-major LoRA A layout change, the checkpoint "
                        "holds A factors as (in, r); offline merging still "
                        "works (merge_lora_weights_and_save.py migrates "
                        "on load via lora.migrate_lora_layout), but "
                        "optimizer state cannot be transposed safely — "
                        "restart fine-tuning or merge and re-init.") from e
                raise
            # Orbax steps are GRADIENT steps; state.step counts micro-steps.
            micro0 = step0 * max(cfg.grad_accumulation_steps, 1)
            state = TrainState(state.base_params, restored["trainables"],
                               restored["opt_state"],
                               put_global(np.asarray(micro0, np.int32),
                                          NamedSharding(mesh, P())),
                               state.rng)
            print(f"[finetune] resumed at gradient step {step0}")

        # === Data ===
        processor = PrismaticProcessor(model_cfg)
        transform = RLDSBatchTransform(processor, ActionTokenizer(), platform)
        if str(cfg.data_root_dir) == "dummy":
            dataset = DummyDataset(transform,
                                   image_size=model_cfg.vision_configs[0].image_size,
                                   num_samples=max(cfg.max_steps, 1) * cfg.batch_size
                                   * max(cfg.grad_accumulation_steps, 1),
                                   num_images=cfg.num_images_in_input)
            stats = {cfg.dataset_name: {
                "action": {"min": [-1.0] * platform.action_dim,
                           "max": [1.0] * platform.action_dim,
                           "q01": [-1.0] * platform.action_dim,
                           "q99": [1.0] * platform.action_dim},
                "num_transitions": len(dataset), "num_trajectories": 1}}
        else:
            from openvla_oft_tpu.data.rlds.pipeline import make_rlds_iterator

            dataset, stats = make_rlds_iterator(
                str(cfg.data_root_dir), cfg.dataset_name, transform, platform,
                shuffle_buffer_size=cfg.shuffle_buffer_size,
                image_aug=cfg.image_aug, train=True,
                num_images=cfg.num_images_in_input)
        if is_primary:
            save_dataset_statistics(stats, run_dir)

        collator = PaddedCollatorForActionPrediction(
            pad_token_id=model_cfg.pad_token_id,
            max_length=cfg.seq_bucket or None)
        # batch_size is GLOBAL; each process assembles its local share and
        # DevicePrefetcher stitches global arrays (SPMD data loading).
        assert cfg.batch_size % n_proc == 0, \
            f"global batch {cfg.batch_size} must divide process count {n_proc}"
        assert n_proc == 1 or cfg.seq_bucket > 0, \
            "multihost requires --seq_bucket: auto length-bucketing is " \
            "per-process and the padded lengths would diverge across the " \
            "SPMD program (every process must build identically-shaped " \
            "global batches)"
        batches = batch_iterator(dataset, cfg.batch_size // n_proc, collator)

        # === Trackers === (host-side IO is primary-process only; every
        # process still computes the replicated metric scalars)
        trackers = [JSONLinesTracker(run_dir, run_id)] if is_primary else []
        if is_primary and cfg.wandb_entity != "your-wandb-entity":
            trackers.append(WeightsBiasesTracker(
                run_dir, run_id, project=cfg.wandb_project,
                entity=cfg.wandb_entity, config=dataclasses.asdict(cfg)))
        metrics = VLAMetrics(trackers, window=max(cfg.grad_accumulation_steps, 1))

        # === Compiled step ===
        # "auto" resolves inside prismatic_forward from the static multimodal
        # length (ALOHA S≈1169 -> Pallas kernel fwd+bwd; LIBERO S≈618 -> XLA).
        use_flash = {"true": True, "false": False}.get(
            str(cfg.use_flash_attention).strip().lower(), "auto")
        tx = make_optimizer(tcfg)
        # Donate the state: without aliasing, the updated TrainState is a
        # SECOND copy of the int8 base + fp32 optimizer (~5 GB at 7B) during
        # the step — the difference between fitting and OOMing one v5e chip.
        step_fn = jax.jit(lambda st, bt: train_step(
            st, bt, model_cfg, platform, tcfg, tx=tx,
            use_flash=use_flash), donate_argnums=(0,))
        if cfg.use_diffusion:
            # Periodic reverse-diffusion sampling on the training batch
            # (reference run_diffusion_sampling every diffusion_sample_freq
            # steps) — the action-space L1 signal the noise-MSE loss hides.
            from openvla_oft_tpu.training.train_step import (
                diffusion_sampling_metrics)

            sample_fn = jax.jit(lambda st, bt, key: diffusion_sampling_metrics(
                st.trainables, st.base_params, bt, model_cfg, platform, tcfg,
                key, use_flash=use_flash))
        batch_sharding = NamedSharding(mesh, P(("dp", "fsdp")))

        # Validation loss (reference `run_validation`, finetune.py:678-760):
        # wall-clock-limited pass over a held-out stream with the same loss.
        from openvla_oft_tpu.training.train_step import loss_and_metrics

        val_loss_fn = jax.jit(lambda st, bt, key: loss_and_metrics(
            st.trainables, st.base_params, bt, model_cfg, platform, tcfg, key,
            use_flash=use_flash))

        # Build the validation stream ONCE (the reference constructs its
        # val_dataloader once, finetune.py:678-760 — rebuilding the tf.data
        # pipeline + shuffle buffer per validation call wastes minutes).
        _val_ds = None

        def _get_val_ds():
            nonlocal _val_ds
            if _val_ds is None:
                if str(cfg.data_root_dir) == "dummy":
                    _val_ds = DummyDataset(
                        dataclasses.replace(transform),
                        image_size=model_cfg.vision_configs[0].image_size,
                        num_samples=8 * cfg.batch_size, seed=999,
                        num_images=cfg.num_images_in_input)
                else:
                    from openvla_oft_tpu.data.rlds.pipeline import (
                        make_rlds_iterator)

                    _val_ds, _ = make_rlds_iterator(
                        str(cfg.data_root_dir), cfg.dataset_name, transform,
                        platform, shuffle_buffer_size=1000,
                        image_aug=cfg.image_aug,
                        train=False, num_images=cfg.num_images_in_input)
            return _val_ds

        def run_validation(state, step):
            """Wall-clock-limited val pass logging the FULL metric suite the
            reference's run_validation logs (loss + curr/next action L1 /
            token accuracies), not just the mean loss."""
            t0 = time.time()
            agg: dict = {}
            key = jax.random.PRNGKey(4242)
            for bi, vb in enumerate(batch_iterator(_get_val_ds(),
                                                   cfg.batch_size, collator)):
                if time.time() - t0 > cfg.val_time_limit:
                    break
                vb = {k: jax.device_put(v, batch_sharding)
                      for k, v in vb.items() if k != "dataset_name"}
                # vary the diffusion-timestep key per batch (a fixed key
                # would sample identical timesteps every batch)
                key, sub = jax.random.split(key)
                _, m = val_loss_fn(state, vb, sub)
                for k, v in m.items():
                    agg.setdefault(k, []).append(float(v))
            if agg:
                extra = {f"val_{k}": float(np.mean(v)) for k, v in agg.items()}
                metrics.push(step, extra=extra)
                print(f"[finetune] val_loss={extra['val_loss']:.4f} "
                      f"({len(agg['loss'])} batches)")

        from openvla_oft_tpu.data.prefetch import DevicePrefetcher

        from openvla_oft_tpu.training.preemption import PreemptionGuard

        start = int(state.step)
        t_start = time.time()
        prefetched = DevicePrefetcher(batches, sharding=batch_sharding)
        guard = PreemptionGuard()
        guard.__enter__()
        G = max(cfg.grad_accumulation_steps, 1)

        def save_training_checkpoint(state, grad_step):
            """Reference save_training_checkpoint layout (finetune.py:610-675):
            everything co-located in `{run_dir}--{N}_chkpt` (or run_dir itself
            with `latest` naming under save_latest_checkpoint_only) —
            dataset_statistics.json, per-module `{name}--{N}_checkpoint.pt`,
            and the merged model. Orbax resume state stays in run_dir/ckpt."""
            # async: the ~30 GB Orbax write overlaps the next train steps;
            # waited on before pruning, resuming, or process exit
            save_checkpoint(ckpt_dir, grad_step,
                            {"trainables": state.trainables,
                             "opt_state": state.opt_state}, block=False)
            if cfg.save_latest_checkpoint_only:
                chkpt_dir, label = run_dir, "latest"
                # keep ONE orbax step dir (prune older ones; never rmtree
                # under an in-flight async write)
                from openvla_oft_tpu.training.checkpoint import (
                    prune_old_steps, wait_for_checkpoints)

                wait_for_checkpoints()
                if is_primary:
                    prune_old_steps(ckpt_dir)
            else:
                chkpt_dir = f"{run_dir}--{grad_step}_chkpt"
                label = str(grad_step)
            # Gather trainables to host COLLECTIVELY (all processes must
            # participate), then only the primary writes the reference-format
            # exports below.
            if n_proc > 1:
                from jax.experimental import multihost_utils

                host_tr = multihost_utils.process_allgather(
                    state.trainables, tiled=True)
            else:
                host_tr = jax.device_get(state.trainables)
            if not is_primary:
                return
            os.makedirs(chkpt_dir, exist_ok=True)
            save_dataset_statistics(stats, chkpt_dir)
            print(f"[finetune] saved checkpoint for step {grad_step}")

            from openvla_oft_tpu.training.checkpoint import export_module_pt

            for mod in ("action_head", "proprio_projector",
                        "noisy_action_projector"):
                if mod in host_tr:
                    export_module_pt(host_tr[mod], mod, chkpt_dir, label)
            if cfg.use_film and "film" in host_tr and not cfg.quantize_base:
                from openvla_oft_tpu.training.checkpoint import (
                    export_film_vision_backbone_pt)

                export_film_vision_backbone_pt(
                    jax.device_get(base["vision_backbone"]),
                    host_tr["film"], model_cfg, chkpt_dir, label)

            if cfg.merge_lora_during_training and cfg.use_lora:
                # In-training LoRA merge + reference-format export
                # (finetune.py:663-675). Host-side NumPy merge so the device
                # never holds a second full weight copy. Under QLoRA the
                # in-memory base is int8 (merging into quantization codes
                # would be garbage) — the reference merges against the
                # original checkpoint (finetune.py:664), so reload it.
                from openvla_oft_tpu.training.lora import (
                    merge_lora_into_params)
                from openvla_oft_tpu.utils.hf_import import (
                    export_openvla_checkpoint)

                if n_proc > 1 and not os.path.isdir(cfg.vla_path):
                    print("[finetune] skipping merged export under multihost: "
                          "the sharded base would need a full cross-host "
                          "gather; merge offline with "
                          "merge_lora_weights_and_save.py")
                    return
                if cfg.quantize_base:
                    if not os.path.isdir(cfg.vla_path):
                        print("[finetune] skipping merged export: base is "
                              "int8-quantized and vla_path is not a local "
                              "checkpoint to re-merge against; use "
                              "merge_lora_weights_and_save.py offline")
                        return
                    from openvla_oft_tpu.utils.hf_import import (
                        load_openvla_checkpoint)

                    _, host_base, _ = load_openvla_checkpoint(cfg.vla_path)
                    host_base = {k: host_base[k] for k in
                                 ("llm", "vision_backbone", "projector")}
                elif n_proc > 1:
                    # primary-only context: cannot touch the cross-host
                    # sharded base here (collectives would deadlock) —
                    # reload from the checkpoint dir instead (guarded
                    # isdir above).
                    from openvla_oft_tpu.utils.hf_import import (
                        load_openvla_checkpoint)

                    _, host_base, _ = load_openvla_checkpoint(cfg.vla_path)
                    host_base = {k: host_base[k] for k in
                                 ("llm", "vision_backbone", "projector")}
                else:
                    host_base = jax.tree_util.tree_map(np.asarray, base)
                host_lora = jax.tree_util.tree_map(
                    np.asarray, jax.device_get(state.trainables["lora"]))
                with jax.default_device(jax.devices("cpu")[0]):
                    merged = merge_lora_into_params(
                        jax.tree_util.tree_map(jnp.asarray, host_base),
                        jax.tree_util.tree_map(jnp.asarray, host_lora),
                        rank=cfg.lora_rank,
                        alpha=float(min(cfg.lora_rank, 16)))
                export_openvla_checkpoint(
                    model_cfg, merged, chkpt_dir, norm_stats=norm_stats,
                    extras_from=cfg.vla_path
                    if os.path.isdir(cfg.vla_path) else None)
                print(f"[finetune] merged LoRA checkpoint -> {chkpt_dir}")

        for i, batch in enumerate(prefetched):
            micro = start + i
            # max_steps counts OPTIMIZER steps (reference breaks on
            # log_step==max_steps, finetune.py:1132): with gradient
            # accumulation the loop runs max_steps*G micro-batches, and all
            # cadences/naming below use the gradient step.
            grad_step = micro // G
            if grad_step >= cfg.max_steps:
                break
            state, m = step_fn(state, batch)
            metrics.commit(**{k: float(v) for k, v in m.items()})
            at_boundary = (micro + 1) % G == 0
            if cfg.use_diffusion and at_boundary \
                    and (grad_step + 1) % cfg.diffusion_sample_freq == 0:
                dm = sample_fn(state, batch, jax.random.PRNGKey(grad_step))
                metrics.commit(**{k: float(v) for k, v in dm.items()})
            if grad_step % cfg.wandb_log_freq == 0 and (G == 1 or at_boundary):
                smoothed = metrics.push(grad_step)
                if is_primary and grad_step % (cfg.wandb_log_freq * 10) == 0:
                    print(f"[step {grad_step}] " + " ".join(
                        f"{k}={v:.4f}" for k, v in sorted(smoothed.items())))
            if cfg.use_val_set and at_boundary \
                    and (grad_step + 1) % cfg.val_freq == 0:
                run_validation(state, grad_step)
            # Preemption (SIGTERM from the TPU VM scheduler) latches a flag;
            # checkpoint at the step boundary so resume loses zero steps
            # (SURVEY.md §5.3 — the reference has no preemption handling).
            preempted = guard.should_stop
            if (at_boundary and ((grad_step + 1) % cfg.save_freq == 0
                                 or grad_step + 1 == cfg.max_steps)) \
                    or preempted:
                save_training_checkpoint(state, grad_step + 1)
            if preempted:
                print(f"[finetune] preempted (signal "
                      f"{guard.received_signal}); checkpoint saved at step "
                      f"{grad_step + 1} — resume with --resume True")
                break

        from openvla_oft_tpu.training.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # async saves must commit before we exit
        guard.__exit__()
        prefetched.close()  # release worker + HBM-pinned buffered batches
        metrics.finalize()
        elapsed = time.time() - t_start
        print(f"[finetune] done: {int(state.step) - start} steps in "
              f"{elapsed:.1f}s")
        return {"final_step": int(state.step), "run_dir": run_dir}


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    finetune(parse_args(FinetuneConfig))
