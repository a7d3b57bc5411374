"""Robosuite expert-collection protocol tests (no simulator needed: the env
builder is injected)."""

import json
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments.robot.robosuite.collect_data.collect_task import (
    TASK_COMMAND,
    make_seed_schedule,
    save_rollout,
)
from experiments.robot.robosuite.collect_data.rollout_trajectory import (
    NORMALIZATION_RANGES,
    denormalize_action,
    normalize_action,
    quantize_roundtrip,
)


class _FakeTraj(list):
    def get(self, t):
        return self[t]


def _fake_expert(env_type, **kwargs):
    steps = [{"action": np.linspace(-1, 1, 7) * (t + 1) * 0.1, "obs": {}}
             for t in range(8)]
    return _FakeTraj(steps)


def test_save_rollout_protocol(tmp_path):
    """Directory layout, pkl schema, and command lookup match the reference
    protocol (collect_task.py:100-120): task_XX/trajNNN.pkl with
    {traj, len, env_type, command, task_id}."""
    n_tasks, per_group = 9, 2
    seeds = make_seed_schedule(6, n_tasks, per_group)
    written = save_rollout(
        list(range(6)), task_name="nut_assembly",
        env_type="Panda_NutAssemblyDistractor", env_func=_fake_expert,
        save_dir=str(tmp_path), n_tasks=n_tasks, seeds=seeds,
        n_per_group=per_group, object_set=1,
        controller_loader=lambda c: {"type": c})
    assert len(written) == 6
    # indices 0..5 with group size 2 -> tasks 0,0,1,1,2,2
    assert sorted(Path(p).parent.name for p in written) == [
        "task_00", "task_00", "task_01", "task_01", "task_02", "task_02"]
    with open(written[0], "rb") as f:
        rec = pickle.load(f)
    assert set(rec) == {"traj", "len", "env_type", "command", "task_id"}
    assert rec["len"] == 8
    assert rec["env_type"] == "Panda_NutAssemblyDistractor"
    assert rec["command"] == TASK_COMMAND["nut_assembly"]["0"]
    # traj000 and traj001 within the same task dir
    names = sorted(Path(p).name for p in written if "task_00" in p)
    assert names == ["traj000.pkl", "traj001.pkl"]


def test_seed_schedule_matches_reference_formula():
    """Deterministic schedule: base + group strides (collect_task.py:183-185)."""
    seeds = make_seed_schedule(8, n_tasks=2, per_task_group=2)
    base = 263237945
    assert seeds == [base + (i // 4) * 2 + i % 2 for i in range(8)]
    assert make_seed_schedule(3, 2, 2, random_seed=True) == [None] * 3
    fixed = make_seed_schedule(5, 2, 2, n_env=3)
    assert all(base <= s < base + 3 for s in fixed)


def test_action_quantize_roundtrip():
    """normalize->256-bin->denormalize reproduces in-range actions to within
    one bin width per dim; the gripper dim passes through sign-exact."""
    rng = np.random.default_rng(0)
    lo, hi = NORMALIZATION_RANGES[:, 0], NORMALIZATION_RANGES[:, 1]
    for _ in range(20):
        a = np.concatenate([rng.uniform(lo, hi), [rng.choice([-1.0, 1.0])]])
        out = quantize_roundtrip(a)
        bin_w = (hi - lo) / 256.0
        assert np.all(np.abs(out[:-1] - a[:-1]) <= bin_w + 1e-9)
        assert np.sign(out[-1]) == np.sign(a[-1])
    # normalize alone lands on the discrete grid
    n = normalize_action(np.concatenate([lo, [1.0]]), 256,
                         NORMALIZATION_RANGES)
    assert np.allclose(n[:-1] * 128, np.round(n[:-1] * 128))
    # denormalize clips out-of-range inputs
    d = denormalize_action(np.full(7, 5.0), NORMALIZATION_RANGES)
    assert np.allclose(d[:6], hi)
