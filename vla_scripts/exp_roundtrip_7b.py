"""7B-scale checkpoint port round-trip drill (offline day-one-porting proxy).

The converter bijection (utils/hf_import.py::load/export_openvla_checkpoint,
training/checkpoint.py per-module `.pt` export/import) is regression-tested at
tiny configs only; this drill exercises it at the REAL 7B scale on one chip:

  1. random-init the full OpenVLA-7B-OFT tree on device (bf16 backbone,
     fp32 heads) and run `predict_action_hidden` + L1 head on a fixed input,
  2. export to the reference HF layout — `model.safetensors` + `config.json`
     (utils/hf_import.py) plus per-module `{name}--{step}_checkpoint.pt`
     heads (`action_head`, `proprio_projector`) exactly like the released
     `moojink/openvla-7b-oft-*` checkpoints
     (reference vla-scripts/finetune.py:584-675 writes this layout;
     LIBERO.md:41-45 lists the artifacts),
  3. free the device tree, re-import module-streamed from disk
     (load_openvla_checkpoint + import_action_head_pt/import_projector_pt),
  4. assert the round trip is BIT-IDENTICAL per leaf and that the re-imported
     tree reproduces the same action chunk bit-for-bit.

bf16 leaves survive exactly: export writes them as fp32 (every bf16 value is
exactly representable), import casts fp32 -> bf16 (exact for such values).

Usage: python vla_scripts/exp_roundtrip_7b.py [--scale tiny|7b] [--out DIR]
"""

from __future__ import annotations

import argparse
import gc
import shutil
import sys
import time
from pathlib import Path

import numpy as np
import os

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("OPENVLA_FORCE_CPU", "0") == "1":
    # The axon sitecustomize overrides JAX_PLATFORMS; jax.config as the
    # first jax call is the reliable way to pin host CPU (the 7B
    # --no_forward drill is host-only: 128 GB RAM vs the tunnel's
    # fluctuating free HBM).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def _tree_to_host(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def _assert_trees_bitwise(a, b, path=""):
    """Per-leaf bitwise equality (dtype + payload)."""
    la, sa = jax.tree_util.tree_flatten_with_path(a)[0], None
    lb = jax.tree_util.tree_flatten_with_path(b)[0]
    ka = {jax.tree_util.keystr(k): v for k, v in la}
    kb = {jax.tree_util.keystr(k): v for k, v in lb}
    assert ka.keys() == kb.keys(), (
        f"tree keys differ: only-orig={sorted(ka.keys() - kb.keys())[:5]} "
        f"only-reimport={sorted(kb.keys() - ka.keys())[:5]}")
    n_bytes = 0
    for k in ka:
        x = np.ascontiguousarray(np.asarray(ka[k]))
        y = np.ascontiguousarray(np.asarray(kb[k]))
        assert x.dtype == y.dtype, f"{path}{k}: dtype {x.dtype} vs {y.dtype}"
        assert x.shape == y.shape, f"{path}{k}: shape {x.shape} vs {y.shape}"
        if not np.array_equal(x.view(np.uint8), y.view(np.uint8)):
            bad = np.flatnonzero(x.view(np.uint8) != y.view(np.uint8))
            raise AssertionError(
                f"{path}{k}: {bad.size} differing bytes of {x.nbytes}")
        n_bytes += x.nbytes
    return n_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="7b", choices=["tiny", "7b"])
    ap.add_argument("--out", default="/tmp/roundtrip_7b")
    ap.add_argument("--keep", action="store_true",
                    help="keep the exported checkpoint dir")
    ap.add_argument("--no_forward", action="store_true",
                    help="skip the predict_action equality forward. Per-leaf "
                         "BITWISE identity subsumes it (deterministic "
                         "programs on identical weights); the forward check "
                         "is still exercised at --scale tiny. Lets the 7B "
                         "drill run host-only (JAX_PLATFORMS=cpu) when the "
                         "chip lacks 13.5 GB free for params + workspace.")
    args = ap.parse_args()

    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import (OpenVLAConfig, TINY_DINOV2,
                                        TINY_LLAMA, TINY_SIGLIP)
    from openvla_oft_tpu.constants import LIBERO
    from openvla_oft_tpu.models.action_heads import l1_head_predict
    from openvla_oft_tpu.models.prismatic import predict_action_hidden
    from openvla_oft_tpu.policy import init_openvla_params
    from openvla_oft_tpu.training.checkpoint import (
        export_module_pt, find_checkpoint_file, import_action_head_pt,
        import_projector_pt)
    from openvla_oft_tpu.utils.hf_import import (export_openvla_checkpoint,
                                                 load_openvla_checkpoint)

    if args.scale == "tiny":
        C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
        C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
        cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                            llm_backbone_id="tiny-llama",
                            num_images_in_input=2)
    else:
        cfg = OpenVLAConfig(vision_backbone_id="dinosiglip-vit-so-224px",
                            llm_backbone_id="llama2-7b-pure",
                            num_images_in_input=2)
    platform = LIBERO
    out_dir = Path(args.out)
    if out_dir.exists():
        shutil.rmtree(out_dir)
    out_dir.mkdir(parents=True)

    # --- 1. random-init on device + forward ---------------------------------
    t0 = time.perf_counter()
    # with_lm_head=False on DEVICE: bf16 7B + lm_head + fp32 heads +
    # forward workspace exceeds the 16 GB chip (measured RESOURCE_EXHAUSTED
    # on the first forward). The lm_head STILL round-trips: a host-side
    # numpy copy is inserted into the export tree below — the released
    # checkpoints carry it, but the OFT L1 serving path never reads it.
    params = init_openvla_params(jax.random.PRNGKey(11), cfg, platform,
                                 dtype=jnp.bfloat16, head="l1",
                                 with_lm_head=False, head_dtype=jnp.float32)
    # The released checkpoints store the projector INSIDE model.safetensors
    # at the backbone dtype (bf16); the heads ship as fp32 `.pt` modules.
    params["projector"] = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params["projector"])
    h = cfg.vision_configs[0].image_size
    ids = jnp.zeros((1, 48), jnp.int32).at[0, -24:].set(
        jnp.concatenate([jnp.asarray([1]), jnp.full((22,), 100),
                         jnp.asarray([29871])]))
    mask = jnp.zeros((1, 48), jnp.int32).at[0, -24:].set(1)
    pixels = jax.random.normal(jax.random.PRNGKey(3),
                               (1, cfg.num_images_in_input, 2, h, h, 3),
                               jnp.float32).astype(jnp.bfloat16)
    proprio = jnp.linspace(-0.5, 0.5, platform.proprio_dim)[None].astype(
        jnp.float32)

    # UNFUSED forward both times: the serving fusion (wqkv/gate_up concat) is
    # orthogonal to porting and would double-hold the LLM in HBM here.
    def forward(p):
        out = predict_action_hidden(p, cfg, platform, ids, mask, pixels,
                                    proprio=proprio, use_flash=False)
        return l1_head_predict(p["action_head"],
                               out.actions_hidden.astype(jnp.bfloat16),
                               platform)

    a0 = None
    if not args.no_forward:
        fwd = jax.jit(forward)
        a0 = np.asarray(fwd(params))
    print(f"[roundtrip] init{'' if args.no_forward else '+forward'}: "
          f"{time.perf_counter()-t0:.1f}s"
          + ("" if a0 is None else
             f" actions {a0.shape} mean "
             f"{float(np.asarray(a0, np.float32).mean()):+.6f}"))

    # --- 2. export (module-streamed device -> host -> disk) -----------------
    t0 = time.perf_counter()
    core = {"llm": params["llm"], "projector": params["projector"],
            "vision_backbone": params["vision_backbone"]}
    host_core = _tree_to_host(core)
    if args.scale == "7b" and "lm_head" not in host_core["llm"]:
        import ml_dtypes

        lm_rng = np.random.default_rng(17)
        host_core["llm"] = dict(host_core["llm"])
        host_core["llm"]["lm_head"] = {"kernel": (
            lm_rng.standard_normal((cfg.llm.hidden_size, cfg.llm.vocab_size),
                                   np.float32) * 0.02
        ).astype(ml_dtypes.bfloat16)}
    export_openvla_checkpoint(cfg, host_core, str(out_dir),
                              norm_stats={"libero_synth": {}})
    step = 150000  # the released LIBERO checkpoints' step (LIBERO.md:41-45)
    host_head = _tree_to_host(params["action_head"])
    host_proprio = _tree_to_host(params["proprio_projector"])
    export_module_pt(host_head, "action_head", str(out_dir), step)
    export_module_pt(host_proprio, "proprio_projector", str(out_dir), step)
    sz = sum(f.stat().st_size for f in out_dir.iterdir()) / 2**30
    print(f"[roundtrip] export: {time.perf_counter()-t0:.1f}s "
          f"({sz:.2f} GiB on disk: "
          f"{sorted(f.name for f in out_dir.iterdir())})")

    # --- 3. free the device tree, re-import from disk -----------------------
    del params, core
    gc.collect()
    t0 = time.perf_counter()
    cfg2, params2, norm_stats = load_openvla_checkpoint(
        str(out_dir), dtype=jnp.bfloat16)
    # heads (fp32, reference .pt layout)
    params2["action_head"] = jax.tree_util.tree_map(
        jnp.asarray, import_action_head_pt(
            find_checkpoint_file(str(out_dir), "action_head"), head="l1"))
    params2["proprio_projector"] = jax.tree_util.tree_map(
        jnp.asarray, import_projector_pt(
            find_checkpoint_file(str(out_dir), "proprio_projector")))
    assert "libero_synth" in (norm_stats or {}), "norm_stats lost in transit"
    print(f"[roundtrip] re-import: {time.perf_counter()-t0:.1f}s")
    # Pull the lm_head back to host for the bitwise check, then free the
    # device copy before the forward (same 16 GB constraint as above).
    lm_reimported = None
    if "lm_head" in params2["llm"]:
        lm_reimported = _tree_to_host(params2["llm"].pop("lm_head"))
        gc.collect()

    # --- 4a. bitwise round-trip check (host) --------------------------------
    t0 = time.perf_counter()
    reimported_host = {
        "llm": _tree_to_host(params2["llm"]),
        "projector": _tree_to_host(params2["projector"]),
        "vision_backbone": _tree_to_host(params2["vision_backbone"]),
    }
    if lm_reimported is not None:
        reimported_host["llm"] = dict(reimported_host["llm"])
        reimported_host["llm"]["lm_head"] = lm_reimported
    n = _assert_trees_bitwise(host_core, reimported_host)
    n += _assert_trees_bitwise(host_head, _tree_to_host(params2["action_head"]))
    n += _assert_trees_bitwise(host_proprio,
                               _tree_to_host(params2["proprio_projector"]))
    del reimported_host, host_core
    gc.collect()
    print(f"[roundtrip] bitwise identity: OK over {n/2**30:.2f} GiB of leaves "
          f"({time.perf_counter()-t0:.1f}s)")

    # --- 4b. forward equality (device) --------------------------------------
    if args.no_forward:
        print("[roundtrip] forward equality: SKIPPED (--no_forward; implied "
              "by per-leaf bitwise identity, exercised at --scale tiny)")
        print(f"[roundtrip] OK scale={args.scale}")
        if not args.keep:
            shutil.rmtree(out_dir)
        return
    fwd2 = jax.jit(forward)
    a1 = np.asarray(fwd2(params2))
    assert a0.dtype == a1.dtype and np.array_equal(
        a0.view(np.uint8), a1.view(np.uint8)), (
        f"action mismatch after round trip: max|d|="
        f"{np.abs(a0.astype(np.float64)-a1.astype(np.float64)).max()}")
    print(f"[roundtrip] predict_action equality: BIT-IDENTICAL "
          f"({a0.size} action values)")

    if not args.keep:
        shutil.rmtree(out_dir)
    print(f"[roundtrip] OK scale={args.scale}")


if __name__ == "__main__":
    main()
