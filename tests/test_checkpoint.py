"""Checkpoint interop tests: HF safetensors export/import round trip,
reference per-module .pt import, Orbax save/restore."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import openvla_oft_tpu.config as C
from openvla_oft_tpu.config import OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP
from openvla_oft_tpu.constants import LIBERO
from openvla_oft_tpu.policy import init_openvla_params
from openvla_oft_tpu.training.checkpoint import (
    import_action_head_pt,
    import_projector_pt,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from openvla_oft_tpu.utils.hf_import import (
    export_openvla_checkpoint,
    load_openvla_checkpoint,
)

C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
CFG = OpenVLAConfig(vision_backbone_id="tiny-dual", llm_backbone_id="tiny-llama")


def _tree_allclose(a, b, atol=1e-6):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    b_map = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(b_map)
    for path, leaf in flat_a:
        other = b_map[path]
        np.testing.assert_allclose(np.asarray(leaf, np.float32),
                                   np.asarray(other, np.float32), atol=atol,
                                   err_msg=str(path))


def test_hf_export_import_roundtrip(tmp_path):
    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head=None)
    base = {k: params[k] for k in ("llm", "vision_backbone", "projector")}
    out = export_openvla_checkpoint(CFG, base, str(tmp_path / "ckpt"),
                                    norm_stats={"d": {"action": {"min": [0]}}})
    cfg2, params2, norm_stats = load_openvla_checkpoint(out)
    assert cfg2.vision_backbone_id == CFG.vision_backbone_id
    assert norm_stats == {"d": {"action": {"min": [0]}}}
    _tree_allclose(base, params2)

    # loaded params must drive the model identically
    from openvla_oft_tpu.models.vit import vit_featurize

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, TINY_DINOV2.image_size,
                                TINY_DINOV2.image_size, 3)), jnp.float32)
    a = vit_featurize(base["vision_backbone"]["featurizer"], TINY_DINOV2, x)
    b = vit_featurize(params2["vision_backbone"]["featurizer"], TINY_DINOV2, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_reference_pt_import(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    # Rebuild the reference MLPResNet layout (action_heads.py:60-82) in torch.
    class MLPResNetBlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.ffn = nn.Sequential(nn.LayerNorm(dim), nn.Linear(dim, dim),
                                     nn.ReLU())

        def forward(self, x):
            return x + self.ffn(x)

    class MLPResNet(nn.Module):
        def __init__(self, num_blocks, input_dim, hidden_dim, output_dim):
            super().__init__()
            self.layer_norm1 = nn.LayerNorm(input_dim)
            self.fc1 = nn.Linear(input_dim, hidden_dim)
            self.relu = nn.ReLU()
            self.mlp_resnet_blocks = nn.ModuleList(
                [MLPResNetBlock(hidden_dim) for _ in range(num_blocks)])
            self.layer_norm2 = nn.LayerNorm(hidden_dim)
            self.fc2 = nn.Linear(hidden_dim, output_dim)

        def forward(self, x):
            x = self.layer_norm1(x)
            x = self.relu(self.fc1(x))
            for blk in self.mlp_resnet_blocks:
                x = blk(x)
            return self.fc2(self.layer_norm2(x))

    class L1Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = MLPResNet(2, 8 * 16, 32, 7)

    torch.manual_seed(0)
    head = L1Head()
    # simulate DDP prefix as the reference saves it
    sd = {f"module.{k}": v for k, v in head.state_dict().items()}
    path = tmp_path / "action_head--1000_checkpoint.pt"
    torch.save(sd, str(path))

    ours = import_action_head_pt(str(path), head="l1")
    x = torch.randn(3, 8, 8 * 16)
    with torch.no_grad():
        ref = head.model(x).numpy()
    from openvla_oft_tpu.models.action_heads import mlp_resnet

    got = np.asarray(mlp_resnet(ours["model"], jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # proprio projector .pt
    class Proprio(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(8, 16)
            self.fc2 = nn.Linear(16, 16)
            self.act_fn1 = nn.GELU()

        def forward(self, x):
            return self.fc2(self.act_fn1(self.fc1(x)))

    pp = Proprio()
    ppath = tmp_path / "proprio_projector--1000_checkpoint.pt"
    torch.save(pp.state_dict(), str(ppath))
    ours_pp = import_projector_pt(str(ppath))
    from openvla_oft_tpu.models.projector import proprio_projector

    xp = torch.randn(4, 8)
    with torch.no_grad():
        refp = pp(xp).numpy()
    gotp = np.asarray(proprio_projector(ours_pp, jnp.asarray(xp.numpy())))
    np.testing.assert_allclose(gotp, refp, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    tree = {"a": jnp.arange(12.0).reshape(3, 4),
            "nested": {"b": jnp.ones((2, 2), jnp.bfloat16)}}
    d = str(tmp_path / "ckpts")
    save_checkpoint(d, 100, tree)
    assert latest_step(d) == 100
    restored = restore_checkpoint(d, 100, template=tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
    assert restored["nested"]["b"].dtype == jnp.bfloat16


def test_orbax_async_save(tmp_path):
    """block=False returns before the commit; back-to-back async saves
    sequence; wait_for_checkpoints/restore observe the committed files.
    (Restore itself waits, so an in-flight save can be restored safely.)"""
    from openvla_oft_tpu.training.checkpoint import wait_for_checkpoints

    d = str(tmp_path / "ckpts")
    t1 = {"a": jnp.arange(4096.0), "n": {"b": jnp.ones((32, 32))}}
    t2 = jax.tree_util.tree_map(lambda x: x + 1.0, t1)
    save_checkpoint(d, 1, t1, block=False)
    save_checkpoint(d, 2, t2, block=False)  # overlaps save 1's commit
    wait_for_checkpoints()
    assert latest_step(d) == 2
    r1 = restore_checkpoint(d, 1, template=t1)
    r2 = restore_checkpoint(d, 2, template=t2)
    np.testing.assert_array_equal(np.asarray(r1["a"]), np.asarray(t1["a"]))
    np.testing.assert_array_equal(np.asarray(r2["n"]["b"]),
                                  np.asarray(t2["n"]["b"]))


def test_sharded_safetensors_load(tmp_path):
    """Multi-shard checkpoints (model-00001-of-0000N.safetensors) load."""
    from safetensors.numpy import save_file

    from openvla_oft_tpu.utils.hf_import import (
        export_llama,
        load_openvla_checkpoint,
    )
    from openvla_oft_tpu.models.llama import init_llama_params
    from openvla_oft_tpu.config import TINY_LLAMA
    from openvla_oft_tpu.policy import init_openvla_params

    params = init_openvla_params(jax.random.PRNGKey(0), CFG, LIBERO,
                                 dtype=jnp.float32, head=None)
    base = {k: params[k] for k in ("llm", "vision_backbone", "projector")}
    # export single-file then split into two shards by key
    from openvla_oft_tpu.utils.hf_import import export_openvla_checkpoint
    import json, os

    d = tmp_path / "sharded"
    export_openvla_checkpoint(CFG, base, str(d))
    from safetensors import safe_open

    single = d / "model.safetensors"
    tensors = {}
    with safe_open(str(single), framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    keys = sorted(tensors)
    half = len(keys) // 2
    save_file({k: tensors[k] for k in keys[:half]},
              str(d / "model-00001-of-00002.safetensors"))
    save_file({k: tensors[k] for k in keys[half:]},
              str(d / "model-00002-of-00002.safetensors"))
    os.remove(single)

    cfg2, params2, _ = load_openvla_checkpoint(str(d))
    np.testing.assert_allclose(
        np.asarray(params2["llm"]["final_norm"]["scale"]),
        np.asarray(base["llm"]["final_norm"]["scale"]), atol=1e-6)


def test_module_pt_export_import_roundtrip(tmp_path, rng):
    """export_module_pt output loads back through the reference-format
    importers with identical numerics."""
    from openvla_oft_tpu.models.action_heads import (
        init_diffusion_head, init_l1_head, mlp_resnet)
    from openvla_oft_tpu.models.projector import (
        init_proprio_projector, proprio_projector)
    from openvla_oft_tpu.training.checkpoint import export_module_pt

    head = init_l1_head(jax.random.PRNGKey(0), LIBERO, llm_dim=32,
                        hidden_dim=16)
    path = export_module_pt(head, "action_head", str(tmp_path), 42)
    assert path.endswith("action_head--42_checkpoint.pt")
    back = import_action_head_pt(path, head="l1")
    x = jnp.asarray(rng.standard_normal((2, 8, 7 * 32)), jnp.float32)
    np.testing.assert_allclose(np.asarray(mlp_resnet(back["model"], x)),
                               np.asarray(mlp_resnet(head["model"], x)),
                               rtol=1e-6, atol=1e-6)

    dh = init_diffusion_head(jax.random.PRNGKey(1), LIBERO, llm_dim=32,
                             hidden_dim=16)
    p2 = export_module_pt(dh, "action_head", str(tmp_path / "d"), 7)
    back2 = import_action_head_pt(p2, head="diffusion")
    xd = jnp.asarray(rng.standard_normal((2, 8, 7 * 16)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mlp_resnet(back2["noise_predictor"], xd)),
        np.asarray(mlp_resnet(dh["noise_predictor"], xd)), rtol=1e-6, atol=1e-6)

    pp = init_proprio_projector(jax.random.PRNGKey(2), LIBERO.proprio_dim, 32)
    p3 = export_module_pt(pp, "proprio_projector", str(tmp_path), 42)
    back3 = import_projector_pt(p3)
    xp = jnp.asarray(rng.standard_normal((3, LIBERO.proprio_dim)), jnp.float32)
    np.testing.assert_allclose(np.asarray(proprio_projector(back3, xp)),
                               np.asarray(proprio_projector(pp, xp)),
                               rtol=1e-6, atol=1e-6)


def test_film_vision_backbone_pt_roundtrip(tmp_path, rng):
    """FiLMed vision backbone .pt export/import round trip with identical
    FiLM-conditioned features."""
    from openvla_oft_tpu.models.vision_backbone import (
        init_film, init_vision_backbone, vision_backbone_forward)
    from openvla_oft_tpu.training.checkpoint import (
        export_film_vision_backbone_pt, import_film_vision_backbone_pt)

    backbone = init_vision_backbone(jax.random.PRNGKey(0), CFG,
                                    dtype=jnp.float32)
    film = init_film(jax.random.PRNGKey(1), CFG)
    film = jax.tree_util.tree_map(lambda a: a + 0.01, film)  # nonzero FiLM

    path = export_film_vision_backbone_pt(backbone, film, CFG, str(tmp_path),
                                          150000)
    assert path.endswith("vision_backbone--150000_checkpoint.pt")
    backbone2, film2 = import_film_vision_backbone_pt(path, CFG)

    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((1, 1, 2, h, h, 3)), jnp.float32)
    le = jnp.asarray(rng.standard_normal((1, CFG.llm_dim)), jnp.float32)
    a = vision_backbone_forward(backbone, CFG, pixels, film_params=film,
                                language_embedding=le)
    b = vision_backbone_forward(backbone2, CFG, pixels, film_params=film2,
                                language_embedding=le)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_convert_weights_cli_roundtrip(tmp_path):
    """HF -> Orbax -> HF conversion preserves weights and statistics."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
    from vla_scripts.convert_weights import ConvertConfig, convert

    params = init_openvla_params(jax.random.PRNGKey(5), CFG, LIBERO,
                                 dtype=jnp.float32, head=None)
    base = {k: params[k] for k in ("llm", "vision_backbone", "projector")}
    stats = {"d": {"action": {"min": [0.0] * 7}}}
    src = export_openvla_checkpoint(CFG, base, str(tmp_path / "hf_in"),
                                    norm_stats=stats)

    orbax_dir = str(tmp_path / "orbax")
    convert(ConvertConfig(direction="import", source=src, output=orbax_dir))
    # meta carries tiny ids, which are registered in this process
    out = convert(ConvertConfig(direction="export", source=orbax_dir,
                                output=str(tmp_path / "hf_out")))
    cfg2, params2, stats2 = load_openvla_checkpoint(out)
    assert stats2 == stats
    np.testing.assert_allclose(
        np.asarray(params2["llm"]["layers"]["attn"]["wq"]["kernel"]),
        np.asarray(base["llm"]["layers"]["attn"]["wq"]["kernel"]), atol=1e-6)


def test_film_import_peft_wrapped_checkpoint(tmp_path, rng):
    """Real reference FiLM backbones are saved AFTER get_peft_model wraps the
    ViT linears: keys are `<module>.base_layer.weight` with
    lora_A/lora_B.default factors that must be MERGED, not dropped
    (round-2 review finding). Synthesize that layout from a plain export and
    assert the import reproduces base + alpha/r * B@A."""
    torch = pytest.importorskip("torch")

    from openvla_oft_tpu.models.vision_backbone import (
        init_film, init_vision_backbone, vision_backbone_forward)
    from openvla_oft_tpu.training.checkpoint import (
        export_film_vision_backbone_pt, import_film_vision_backbone_pt)

    backbone = init_vision_backbone(jax.random.PRNGKey(0), CFG,
                                    dtype=jnp.float32)
    film = init_film(jax.random.PRNGKey(1), CFG)
    path = export_film_vision_backbone_pt(backbone, film, CFG, str(tmp_path),
                                          1000)
    sd = torch.load(path, map_location="cpu", weights_only=True)

    # rewrite every block linear into the peft layout with a known LoRA
    rank, alpha = 4, 4.0  # alpha = min(rank, 16) convention
    gen = torch.Generator().manual_seed(0)
    new_sd = {}
    deltas = {}
    for key, value in sd.items():
        is_block_linear = (".block." in key and key.endswith(".weight")
                          and value.ndim == 2)
        if is_block_linear:
            stem = key[: -len(".weight")]
            out_d, in_d = value.shape
            a = torch.randn(rank, in_d, generator=gen) * 0.02
            b = torch.randn(out_d, rank, generator=gen) * 0.02
            new_sd[f"{stem}.base_layer.weight"] = value
            new_sd[f"{stem}.lora_A.default.weight"] = a
            new_sd[f"{stem}.lora_B.default.weight"] = b
            deltas[key] = (alpha / rank) * (b @ a)
        else:
            new_sd[key] = value
    peft_path = str(tmp_path / "vision_backbone--2000_checkpoint.pt")
    torch.save(new_sd, peft_path)

    backbone2, film2 = import_film_vision_backbone_pt(peft_path, CFG)
    # the imported features must equal a forward through base + merged deltas
    assert deltas, "no block linears rewritten"
    h = TINY_DINOV2.image_size
    pixels = jnp.asarray(rng.random((1, 1, 2, h, h, 3)), jnp.float32)
    le = jnp.asarray(rng.standard_normal((1, CFG.llm_dim)), jnp.float32)
    plain = vision_backbone_forward(backbone, CFG, pixels, film_params=film,
                                    language_embedding=le)
    merged = vision_backbone_forward(backbone2, CFG, pixels,
                                     film_params=film2,
                                     language_embedding=le)
    # LoRA deltas were nonzero, so outputs MUST differ from the plain base...
    assert np.abs(np.asarray(plain) - np.asarray(merged)).max() > 1e-4
    # ...and one spot-checked kernel equals base + alpha/r * B@A exactly
    key = next(iter(deltas))
    qkv = np.asarray(backbone2["featurizer"]["layers"]["attn"]["qkv"]
                     ["kernel"][0])
    base_qkv = np.asarray(backbone["featurizer"]["layers"]["attn"]["qkv"]
                          ["kernel"][0])
    want = next(d for k, d in deltas.items()
                if "featurizer.blocks.0.block.attn.qkv" in k).numpy().T
    np.testing.assert_allclose(qkv, base_qkv + want, rtol=1e-5, atol=1e-6)
