"""Env-gated bench/smoke aids in the eval API (round 5).

OPENVLA_ZERO_INIT: `get_vla` materializes flagship SHAPES as zeros via
eval_shape — latency benches on capacity-constrained chips skip the 13.5 GB
random materialization. OPENVLA_FAKE_NORM_STATS: identity-bounds statistics
under "{platform}_bench" so the FULL serving path (un-normalization +
proprio normalization) runs against `random:` checkpoints
(vla_scripts/bench_deploy.py drives both).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp


@dataclasses.dataclass
class _Cfg:
    pretrained_checkpoint: str = "random:tiny"
    use_l1_regression: bool = True
    use_diffusion: bool = False
    num_images_in_input: int = 2
    use_film: bool = False
    use_proprio: bool = True
    unnorm_key: str = "libero_bench"


def test_fake_norm_stats_env(monkeypatch):
    from experiments.robot.openvla_utils import get_vla

    monkeypatch.setenv("OPENVLA_FAKE_NORM_STATS", "1")
    vla = get_vla(_Cfg())
    assert vla.norm_stats and "libero_bench" in vla.norm_stats
    st = vla.norm_stats["libero_bench"]["action"]
    assert len(st["q01"]) == vla.platform.action_dim
    assert st["mask"][-1] is False          # gripper excluded, like the ref
    # the unnorm accessor resolves without error
    assert vla._action_stats("libero_bench") is st


def test_zero_init_env(monkeypatch):
    from experiments.robot.openvla_utils import get_vla

    monkeypatch.setenv("OPENVLA_ZERO_INIT", "1")
    vla = get_vla(_Cfg())
    attn = vla.params["llm"]["layers"]["attn"]
    k = attn["wqkv" if "wqkv" in attn else "wq"]["kernel"]
    assert float(jnp.abs(k).max()) == 0.0   # zeros, correct shapes
    assert k.ndim == 3                       # stacked layers intact


def test_no_stats_without_env(monkeypatch):
    from experiments.robot.openvla_utils import get_vla

    monkeypatch.delenv("OPENVLA_FAKE_NORM_STATS", raising=False)
    vla = get_vla(_Cfg())
    assert not vla.norm_stats
