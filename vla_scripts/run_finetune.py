"""Resilient fine-tune wrapper: restart loop with resume-from-latest
(reference `vla-scripts/run_finetune.py:18-40` — the fork's "poor-man's
elastic recovery": find the highest checkpoint, merge/resume, relaunch).

Relaunches `vla_scripts/finetune.py` until `max_steps` is reached, resuming
from the latest Orbax checkpoint after any crash or preemption. This is the
failure-recovery subsystem the reference lacks as a first-class feature
(SURVEY.md §5.3).
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class RunnerConfig:
    max_restarts: int = 100
    restart_delay_s: float = 10.0
    # everything after `--` is forwarded to finetune.py verbatim
    forward_args: str = ""


def latest_finetune_step(run_root_dir: str) -> int:
    from openvla_oft_tpu.training.checkpoint import latest_step

    best = 0
    if os.path.isdir(run_root_dir):
        for run in os.listdir(run_root_dir):
            ckpt = os.path.join(run_root_dir, run, "ckpt")
            step = latest_step(ckpt)
            if step:
                best = max(best, step)
    return best


def main() -> int:
    argv = sys.argv[1:]
    if "--" in argv:
        split = argv.index("--")
        runner_args, ft_args = argv[:split], argv[split + 1:]
    else:
        runner_args, ft_args = [], argv

    from openvla_oft_tpu.utils.cli import parse_args

    cfg = parse_args(RunnerConfig, runner_args)
    script = str(Path(__file__).with_name("finetune.py"))

    for attempt in range(cfg.max_restarts):
        args = list(ft_args)
        has_resume_flag = any(
            a == "--resume" or a.startswith("--resume=") for a in args)
        if attempt > 0 and not has_resume_flag:
            # exact-flag check: the old substring test was fooled by
            # --resume_step, suppressing the restart resume
            args += ["--resume", "True"]
        print(f"[run_finetune] attempt {attempt}: {script} {' '.join(args)}")
        proc = subprocess.run([sys.executable, script] + args)
        if proc.returncode == 0:
            print("[run_finetune] finetune finished cleanly")
            return 0
        print(f"[run_finetune] exited with {proc.returncode}; restarting in "
              f"{cfg.restart_delay_s}s")
        time.sleep(cfg.restart_delay_s)
    print("[run_finetune] exceeded max_restarts")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
