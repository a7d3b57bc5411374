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


def test_hub_download_hook(tmp_path, monkeypatch):
    """_resolve_checkpoint_dir pulls through huggingface_hub.snapshot_download
    when available (reference openvla_utils.py:270-303 hub path); registered
    ids resolve via their hub repo, bare org/name strings pass through, and
    OPENVLA_OFFLINE=1 disables the hook."""
    import sys
    import types

    from openvla_oft_tpu.models import registry

    calls = []
    fake = types.ModuleType("huggingface_hub")

    def snapshot_download(repo_id, cache_dir=None):
        calls.append(repo_id)
        d = tmp_path / repo_id.replace("/", "__")
        d.mkdir(exist_ok=True)
        return str(d)

    fake.snapshot_download = snapshot_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    monkeypatch.delenv("OPENVLA_OFFLINE", raising=False)

    # registered model id -> its hub repo
    out = registry._resolve_checkpoint_dir("openvla-7b", None)
    assert calls == ["openvla/openvla-7b"] and out.endswith("openvla__openvla-7b")
    # bare repo id passes through verbatim
    registry._resolve_checkpoint_dir("moojink/some-ckpt", None)
    assert calls[-1] == "moojink/some-ckpt"
    # offline switch disables the hook
    monkeypatch.setenv("OPENVLA_OFFLINE", "1")
    with pytest.raises(FileNotFoundError):
        registry._resolve_checkpoint_dir("openvla-7b", None)
    # non-repo-looking strings never hit the hub
    calls.clear()
    monkeypatch.delenv("OPENVLA_OFFLINE")
    with pytest.raises(FileNotFoundError):
        registry._resolve_checkpoint_dir("/no/such/dir", None)
    assert calls == []


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
        assert len(group) <= 4
        assert all(len(e["input_ids"]) <= bucket for e in group)
        seen += len(group)
    assert seen == 64  # every example batched (short tail batches included)


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


def test_device_prefetcher():
    from openvla_oft_tpu.data.prefetch import DevicePrefetcher

    batches = ({"x": np.full((2, 2), i), "dataset_name": "d"} for i in range(5))
    pf = DevicePrefetcher(batches, depth=2)
    seen = [int(np.asarray(b["x"])[0, 0]) for b in pf]
    assert seen == [0, 1, 2, 3, 4]
    assert all("dataset_name" not in b for b in [])
    # error propagation
    def bad():
        yield {"x": np.ones(2)}
        raise RuntimeError("source died")
    pf2 = DevicePrefetcher(bad())
    next(pf2)
    with pytest.raises(RuntimeError):
        next(pf2)


def test_vlm_pretrain_dataset(tmp_path):
    import json
    from PIL import Image

    from openvla_oft_tpu.config import OpenVLAConfig
    from openvla_oft_tpu.constants import IGNORE_INDEX
    from openvla_oft_tpu.data.vlm_datasets import VLMPretrainDataset
    from openvla_oft_tpu.processing.processor import PrismaticProcessor
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP

    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama")
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
        img_dir / "0.jpg")
    recs = [{"id": "0", "image": "0.jpg", "conversations": [
        {"from": "human", "value": "<image>\nDescribe."},
        {"from": "gpt", "value": "A pattern."}]}]
    jp = tmp_path / "d.json"
    jp.write_text(json.dumps(recs))
    ds = VLMPretrainDataset(str(jp), str(img_dir),
                            PrismaticProcessor(cfg), stage="align",
                            llm_backbone_id="tiny-llama")
    ex = next(iter(ds))
    assert ex["pixel_values"].shape[0] == 1
    # align stage: prompt masked, answer supervised
    assert (ex["labels"] == IGNORE_INDEX).sum() > 0
    assert (ex["labels"] != IGNORE_INDEX).sum() > 0


def test_model_registry_full_prismatic_breadth():
    """All 49 released Prismatic VLM ids from the reference MODEL_REGISTRY
    (prismatic/models/registry.py, architectures per conf/models.py) are
    registered with resolvable backbone ids."""
    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.models.registry import MODEL_REGISTRY

    vlms = {mid: e for mid, e in MODEL_REGISTRY.items() if not e.is_vla}
    assert len(vlms) == 49
    # every architecture id resolves in the config registries
    for e in vlms.values():
        assert e.vision_backbone_id in C._VISION_REGISTRY, e.model_id
        assert e.llm_backbone_id in C._LLM_REGISTRY, e.model_id
        assert e.image_resize_strategy in (
            "resize-naive", "resize-crop", "letterbox"), e.model_id
    # spot-check mappings against the reference conf
    assert vlms["reproduction-llava-v15+13b"].llm_backbone_id == \
        "vicuna-v15-13b"
    assert vlms["prism-dinosiglip-224px+7b"].vision_backbone_id == \
        "dinosiglip-vit-so-224px"
    assert vlms["prism-dinosiglip-224px+7b"].image_resize_strategy == \
        "resize-naive"
    assert vlms["siglip-384px-letterbox+7b"].image_resize_strategy == \
        "letterbox"
    assert vlms["phi-2+3b"].llm_backbone_id == "phi-2-3b"
    # the reference conf quirk: prism-siglip+13b points at the CLIP backbone
    assert vlms["prism-siglip+13b"].vision_backbone_id == "clip-vit-l-336px"


def test_vlm_dataset_registry():
    """The 5 named LLaVA variants (reference conf/datasets.py:35-113) resolve
    to the reference's relative file pairs under any root."""
    from openvla_oft_tpu.data.vlm_datasets import (
        VLM_DATASET_REGISTRY, resolve_vlm_dataset)

    assert sorted(VLM_DATASET_REGISTRY) == [
        "llava-lrv", "llava-lvis4v", "llava-lvis4v-lrv", "llava-multimodal",
        "llava-v15"]
    j, r = resolve_vlm_dataset("llava-v15", "align", "/data")
    assert j == "/data/download/llava-laion-cc-sbu-558k/chat.json"
    assert r == "/data/download/llava-laion-cc-sbu-558k/"
    j, _ = resolve_vlm_dataset("llava-lvis4v-lrv", "finetune", "/data")
    assert j.endswith("llava_v1_5_lvis4v_lrv_mix1231k.json")
    j, _ = resolve_vlm_dataset("llava-multimodal", "finetune", "/data")
    assert j.endswith("llava_v1_5_stripped625k.json")
    with pytest.raises(KeyError):
        resolve_vlm_dataset("nope", "align", "/data")


def test_preprocess_registry_and_convert(tmp_path):
    """Dataset-artifact registry covers both LLaVA stages; convert_to_jpg
    normalizes gif/png to RGB jpg and skips already-converted files."""
    from PIL import Image

    from vla_scripts.preprocess import DATASET_ARTIFACTS, convert_to_jpg

    assert set(DATASET_ARTIFACTS) == {"llava-laion-cc-sbu-558k",
                                      "llava-v1.5-instruct"}
    names = [c["name"] for c in DATASET_ARTIFACTS["llava-v1.5-instruct"]]
    assert "coco/train2017" in names and "ocr_vqa/images" in names

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "a.png")
    Image.fromarray(arr).convert("P").save(tmp_path / "b.gif")
    Image.fromarray(arr).save(tmp_path / "c.jpg")
    assert convert_to_jpg(tmp_path) == 2
    for stem in ("a", "b", "c"):
        out = Image.open(tmp_path / f"{stem}.jpg")
        assert out.mode == "RGB" and out.size == (8, 8)
    assert convert_to_jpg(tmp_path) == 0  # idempotent


def test_build_instruct_mixtures(tmp_path):
    """LVIS-4V merge and LRV chat-format conversion produce the mixture
    jsons the dataset variants name, deterministically shuffled."""
    import json

    from vla_scripts.build_instruct_mixtures import (
        build_lrv_mixtures, build_lvis4v_mixture)

    base = tmp_path
    (base / "lrv").mkdir()
    json.dump([{"id": "b0", "image": "x.jpg",
                "conversations": [{"from": "human", "value": "<image>\nq"},
                                  {"from": "gpt", "value": "a"}]}
               for _ in range(3)],
              open(base / "llava_v1_5_mix665k.json", "w"))
    json.dump([{"id": "l0", "image": "y.jpg", "conversations": []}],
              open(base / "lvis_instruct4v_220k.json", "w"))
    json.dump([{"image_id": "12", "question": " why? ", "answer": " so. "}],
              open(base / "lrv" / "filter_cap1.json", "w"))
    json.dump([], open(base / "lrv" / "filter_cap_more1.json", "w"))
    json.dump([{"image_id": "c.png", "question": "q2", "answer": "a2"}],
              open(base / "lrv" / "chart_release_update.json", "w"))

    out = build_lvis4v_mixture(base, verify_images=False)
    mix888 = json.load(open(out))
    assert len(mix888) == 4 and out.name == "llava_v1_5_lvis4v_mix888k.json"

    outs = build_lrv_mixtures(base, verify_images=False)
    mix1008 = json.load(open(outs[0]))
    assert len(mix1008) == 5  # 3 base + 2 lrv
    assert len(json.load(open(outs[1]))) == 6  # 4 lvis-mix + 2 lrv
    lrv_ex = [e for e in mix1008 if e["id"] == "12"][0]
    assert lrv_ex["image"] == "lrv/lrv-vg/12.jpg"
    assert lrv_ex["conversations"][0]["value"] == "<image>\nwhy?"
    assert lrv_ex["conversations"][1]["value"] == "so."
    chart = [e for e in mix1008 if e["id"] == "c"][0]
    assert chart["image"] == "lrv/lrv-chart/c.png"
    # deterministic: rebuilding yields the identical order
    again = json.load(open(build_lrv_mixtures(base, verify_images=False)[0]))
    assert again == mix1008
    # verify_images catches missing files
    with pytest.raises(AssertionError):
        build_lvis4v_mixture(base, verify_images=True)
