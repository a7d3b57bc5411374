"""2-process JAX cluster integration: the torchrun-DDP analog, executed for
real (reference finetune.py:796-798). Heavy — spawns four subprocesses (two
per phase) that federate via jax.distributed; runs in the slow tier."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_two_process_finetune_and_resume(tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / "vla_scripts" / "dryrun_multiprocess.py"),
         "--steps", "2", "--port", "12971",
         "--data-root", str(tmp_path / "rlds"),
         "--run-root", str(tmp_path / "runs")],
        capture_output=True, text=True, timeout=1500, cwd=str(REPO))
    assert r.returncode == 0, (
        f"multi-process dryrun failed\nstdout:\n{r.stdout[-3000:]}\n"
        f"stderr:\n{r.stderr[-3000:]}")
    assert "2-process train, collective save, resume all green" in r.stdout
