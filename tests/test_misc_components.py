"""Tests for auxiliary components: CLI parser, recipes, model registry,
prompting, overwatch, length-grouped batching, gripper conventions."""

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np
import pytest

from openvla_oft_tpu.utils.cli import parse_args


def test_cli_parser_types():
    @dataclasses.dataclass
    class Cfg:
        name: str = "x"
        steps: int = 10
        lr: float = 1e-3
        flag: bool = False
        opt: Optional[int] = None
        path: Path = Path("runs")

    cfg = parse_args(Cfg, ["--name", "abc", "--steps", "5", "--lr", "0.5",
                           "--flag", "True", "--opt", "7", "--path", "/tmp/x"])
    assert cfg == Cfg("abc", 5, 0.5, True, 7, Path("/tmp/x"))
    cfg2 = parse_args(Cfg, ["--opt", "none", "--flag=false"])
    assert cfg2.opt is None and cfg2.flag is False
    with pytest.raises(SystemExit):
        parse_args(Cfg, ["--bogus", "1"])


def test_recipes_apply():
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from vla_scripts.finetune import FinetuneConfig
    from openvla_oft_tpu.training.recipes import apply_recipe, available_recipes

    assert "oft-libero-spatial" in available_recipes()
    cfg = apply_recipe(FinetuneConfig(), "oft-libero-spatial")
    assert cfg.dataset_name == "libero_spatial_no_noops"
    assert cfg.use_proprio and cfg.num_images_in_input == 2
    assert cfg.max_steps == 150_005
    aloha = apply_recipe(FinetuneConfig(), "oft-plus-aloha_scoop_x_into_bowl")
    assert aloha.use_film and aloha.num_images_in_input == 3


def test_model_registry():
    from openvla_oft_tpu.models.registry import (
        MODEL_REGISTRY, available_models, get_model_description)

    assert "openvla-7b-oft-finetuned-libero-spatial" in available_models()
    assert "LIBERO-Spatial" in get_model_description(
        "openvla-7b-oft-finetuned-libero-spatial")
    with pytest.raises(FileNotFoundError):
        from openvla_oft_tpu.models.registry import load

        load("openvla-7b")  # zero egress, no local cache


def test_prompt_builders():
    from openvla_oft_tpu.processing.prompting import (
        PurePromptBuilder, get_prompt_builder)

    b = PurePromptBuilder()
    b.add_turn("human", "What action should the robot take to stack bowls?")
    assert b.get_prompt() == \
        "In: What action should the robot take to stack bowls?\nOut: "
    b.add_turn("gpt", "ACTION")
    assert b.get_prompt().endswith("ACTION</s>")
    chat = get_prompt_builder("llama2-7b-chat")
    chat.add_turn("human", "hello")
    assert chat.get_prompt().startswith("[INST]")


def test_overwatch_rank_zero():
    from openvla_oft_tpu.utils.overwatch import initialize_overwatch

    ow = initialize_overwatch("test")
    assert ow.is_rank_zero()
    calls = []
    wrapped = ow.rank_zero_only(lambda: calls.append(1))
    wrapped()
    assert calls == [1]


def test_length_grouped_batcher():
    from openvla_oft_tpu.data.batching import LengthGroupedBatcher

    rng = np.random.default_rng(0)
    examples = [{"input_ids": np.zeros(int(n), np.int32)}
                for n in rng.integers(10, 120, 64)]
    batcher = LengthGroupedBatcher(batch_size=4, buckets=(64, 96, 128))
    batches = list(batcher(iter(examples)))
    assert batches, "no batches emitted"
    seen = 0
    for bucket, group in batches:
        assert len(group) == 4
        assert all(len(e["input_ids"]) <= bucket for e in group)
        seen += 4
    assert seen >= 48  # most examples batched (full groups only)


def test_gripper_conventions():
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from experiments.robot.robot_utils import (
        invert_gripper_action, normalize_gripper_action)

    a = np.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.8])
    out = normalize_gripper_action(a, binarize=True)
    assert out[-1] == 1.0
    np.testing.assert_array_equal(out[:-1], a[:-1])
    inv = invert_gripper_action(out)
    assert inv[-1] == -1.0
