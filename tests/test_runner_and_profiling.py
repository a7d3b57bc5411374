"""Restart-runner, profiling utilities, and the verify harness config."""

import os
import sys
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_latest_finetune_step_scans_runs(tmp_path):
    from vla_scripts.run_finetune import latest_finetune_step

    assert latest_finetune_step(str(tmp_path / "missing")) == 0
    # two runs with Orbax-style step dirs; the max across runs wins
    for run, steps in (("runA", (2, 6)), ("runB", (4,))):
        for s in steps:
            (tmp_path / run / "ckpt" / f"{s:06d}").mkdir(parents=True)
    assert latest_finetune_step(str(tmp_path)) == 6


def test_runner_restart_injects_resume(tmp_path, monkeypatch):
    """A failing first attempt must relaunch WITH --resume True; a --resume
    flag already present must not be duplicated (and --resume_step alone must
    not suppress the injection — the reference-era substring bug)."""
    import vla_scripts.run_finetune as rf

    calls = []

    class FakeProc:
        def __init__(self, rc):
            self.returncode = rc

    def fake_run(argv):
        calls.append(argv)
        return FakeProc(1 if len(calls) == 1 else 0)

    monkeypatch.setattr(rf.subprocess, "run", fake_run)
    monkeypatch.setattr(rf.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        sys, "argv",
        ["run_finetune.py", "--max_restarts", "3", "--restart_delay_s", "0",
         "--", "--resume_step", "5"])
    assert rf.main() == 0
    assert len(calls) == 2
    first, second = calls
    assert "--resume" not in first
    i = second.index("--resume")
    assert second[i + 1] == "True"
    assert "--resume_step" in second  # forwarded args survive


def test_runner_gives_up_after_max_restarts(monkeypatch):
    import vla_scripts.run_finetune as rf

    class FakeProc:
        returncode = 7

    monkeypatch.setattr(rf.subprocess, "run", lambda argv: FakeProc())
    monkeypatch.setattr(rf.time, "sleep", lambda s: None)
    monkeypatch.setattr(sys, "argv",
                        ["run_finetune.py", "--max_restarts", "2", "--"])
    assert rf.main() == 1


def test_step_timer_summary():
    from openvla_oft_tpu.utils.profiling import StepTimer

    t = StepTimer(window=3)
    assert t.summary() == {}
    for dt in (0.01, 0.02, 0.03, 0.04):  # window drops the first
        t.times.append(dt)
    t.times = t.times[-t.window:]
    s = StepTimer.summary(t)
    np.testing.assert_allclose(s["p50"], 0.03)
    np.testing.assert_allclose(s["mean"], 0.03, rtol=1e-9)
    np.testing.assert_allclose(s["steps_per_sec"], 1 / 0.03, rtol=1e-9)
    # start/stop measures real wall time
    t2 = StepTimer()
    t2.start()
    time.sleep(0.01)
    assert t2.stop() >= 0.009
    assert t2._t0 is None


def test_verify_openvla_config_surface():
    """The latency harness parses reference-style flags and exposes the
    int8 toggle (reference vla-scripts/extern/verify_openvla.py drives
    predict_action N times — config-only check here, no TPU)."""
    from openvla_oft_tpu.utils.cli import parse_args
    from vla_scripts.verify_openvla import VerifyConfig

    cfg = parse_args(VerifyConfig, [
        "--pretrained_checkpoint", "random:tiny", "--num_iterations", "3",
        "--quant", "int8", "--use_proprio", "false"])
    assert cfg.num_iterations == 3
    assert cfg.quant == "int8"
    assert cfg.use_proprio is False


def test_profiler_trace_writes_events(tmp_path):
    """trace() captures a jax.profiler trace directory with event data."""
    import jax
    import jax.numpy as jnp

    from openvla_oft_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path)):
        with annotate("matmul_region"):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
    produced = list(Path(tmp_path).rglob("*"))
    assert any(p.is_file() and p.stat().st_size > 0 for p in produced), \
        f"no trace files under {tmp_path}: {produced}"
