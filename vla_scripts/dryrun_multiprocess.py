"""Multi-process trainer dryrun: 2 real JAX processes on a CPU cluster.

The reference trains multi-process via `torchrun --nnodes 1 --nproc-per-node N
vla-scripts/finetune.py` (`/root/reference/vla-scripts/finetune.py:796-798`,
LIBERO.md:92). This driver is the TPU-pod analog executed WITHOUT pod
hardware: it launches two OS processes, each with 2 virtual CPU devices
(`--xla_force_host_platform_device_count=2`), federates them with
`jax.distributed.initialize` into one 4-device cluster, and runs
`vla_scripts/finetune.py::finetune` with `--multihost` end to end:

  - per-process episode-file sharding in the RLDS pipeline
    (data/rlds/pipeline.py `files[proc::n_proc]`),
  - process-local batch assembly -> global arrays
    (`jax.make_array_from_process_local_data`, data/prefetch.py),
  - sharded train steps on a dp=2 x fsdp=2 global mesh,
  - a COLLECTIVE multi-process Orbax save plus the collective
    trainables-allgather feeding the primary-only `.pt` exports,
  - a second 2-process launch that RESUMES from the multi-process
    checkpoint and trains further steps.

Run:  python vla_scripts/dryrun_multiprocess.py [--steps 4] [--port 12955]
Exit code 0 = everything above executed and the resumed run advanced.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
RUN_ID = "mp_dryrun"


def child(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(REPO))
    from vla_scripts.finetune import FinetuneConfig, finetune

    cfg = FinetuneConfig(
        vla_path="random:tiny",
        data_root_dir=Path(args.data_root),
        dataset_name="mp_synth",
        run_root_dir=Path(args.run_root),
        shuffle_buffer_size=50,
        use_l1_regression=True,
        use_proprio=True,
        batch_size=4,                      # GLOBAL: 2 examples per process
        learning_rate=1e-3,
        max_steps=args.steps * 2 if args.resume else args.steps,
        save_freq=args.steps,
        image_aug=False,
        resume=args.resume,
        run_id_override=RUN_ID,
        wandb_log_freq=1,
        merge_lora_during_training=False,
        multihost=True,
        coordinator_address=f"localhost:{args.port}",
        num_processes=2,
        process_id=args.child,
        mesh_dp=2,
        mesh_fsdp=2,
        seq_bucket=160,
    )
    out = finetune(cfg)
    print(f"[mp-child {args.child}] done final_step={out['final_step']}")


def parent(args) -> int:
    from vla_scripts.make_synthetic_rlds import generate

    data_root = args.data_root or tempfile.mkdtemp(prefix="mp_rlds_")
    if not (Path(data_root) / "mp_synth").exists():
        # >=2 shards so each process reads a DISJOINT half of the episodes
        generate(data_root, "mp_synth", episodes=8, steps=16, tasks=4,
                 image_size=64, shard_size=2)
    run_root = args.run_root or tempfile.mkdtemp(prefix="mp_runs_")
    run_dir = Path(run_root) / RUN_ID

    def launch(resume: bool) -> list:
        procs = []
        for i in range(2):
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                                " --xla_force_host_platform_device_count=2").strip()
            env["TF_CPP_MIN_LOG_LEVEL"] = "3"
            cmd = [sys.executable, __file__, "--child", str(i),
                   "--port", str(args.port), "--data-root", data_root,
                   "--run-root", run_root, "--steps", str(args.steps)]
            if resume:
                cmd.append("--resume")
            log = open(f"/tmp/mp_dryrun_{args.port}_p{i}"
                       f"{'_resume' if resume else ''}.log", "w")
            procs.append((subprocess.Popen(cmd, env=env, stdout=log,
                                           stderr=subprocess.STDOUT,
                                           cwd=str(REPO)), log))
        rcs = []
        for p, log in procs:
            rcs.append(p.wait(timeout=900))
            log.close()
        return rcs

    print(f"[mp-dryrun] phase 1: fresh 2-process run ({args.steps} steps)")
    rcs = launch(resume=False)
    assert rcs == [0, 0], f"phase-1 exit codes {rcs} (logs /tmp/mp_dryrun_<port>_p*.log)"

    metrics_path = run_dir / f"{RUN_ID}-metrics.jsonl"
    assert metrics_path.exists(), f"primary wrote no metrics at {metrics_path}"
    recs = [json.loads(line) for line in open(metrics_path)]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert losses and all(np.isfinite(losses)), f"bad losses {losses}"
    ckpt_step = run_dir / "ckpt" / f"{args.steps:06d}"
    assert ckpt_step.exists(), f"no multi-process checkpoint at {ckpt_step}"
    p0 = open(f"/tmp/mp_dryrun_{args.port}_p0.log").read()
    assert "process 0/2 up with 2 local devices" in p0, "cluster not federated"
    assert "process 0/2 reads" in p0, "per-process file sharding not exercised"
    pt = list(run_dir.glob("*_chkpt/action_head--*_checkpoint.pt")) or \
        list(Path(run_root).glob(f"{RUN_ID}--*_chkpt/action_head--*.pt"))
    assert pt, "primary-only .pt export missing after collective allgather"

    print(f"[mp-dryrun] phase 2: 2-process RESUME to {args.steps * 2} steps")
    rcs = launch(resume=True)
    assert rcs == [0, 0], f"phase-2 exit codes {rcs}"
    pr = open(f"/tmp/mp_dryrun_{args.port}_p0_resume.log").read()
    assert f"resumed at gradient step {args.steps}" in pr, "resume didn't restore"
    recs = [json.loads(line) for line in open(metrics_path)]
    assert any(r["step"] >= args.steps for r in recs), "resume made no progress"
    print("[mp-dryrun] OK: 2-process train, collective save, resume all green")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=12955)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--run-root", default=None)
    ap.add_argument("--resume", action="store_true")
    a = ap.parse_args()
    if a.child is None:
        sys.exit(parent(a))
    child(a)
