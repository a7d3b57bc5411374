"""Checkpoint-parity validation harness (SURVEY.md §4's golden-value plan).

Given a reference HF OpenVLA checkpoint directory (and optionally the
reference's `sample_libero_spatial_observation.pkl` + per-module `.pt` files),
runs stage-by-stage comparisons and reports per-module agreement:

  1. tokenizer: prompt ids for the fixture instruction
  2. pixel pipeline: JPEG->lanczos->crop->normalize output stats
  3. ViT features (per backbone, second-to-last tap)
  4. projector output
  5. final action chunk from `predict_action`

When a `--reference_outputs` npz is supplied (recorded on the reference
implementation with `--record`-style dumps), stages compare numerically;
otherwise the harness reports shapes/statistics for eyeball checks and runs
end-to-end to validate load + predict. Works against this repo's own exports
too, which is how it is smoke-tested without network access.
"""

from __future__ import annotations

import dataclasses
import pickle
import sys
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class ParityConfig:
    checkpoint: str = ""
    observation: Optional[str] = None      # reference sample .pkl
    reference_outputs: Optional[str] = None  # npz of recorded activations
    unnorm_key: str = ""
    num_images_in_input: int = 2
    use_proprio: bool = True
    center_crop: bool = True
    # Action head for stage 5. "auto" = L1 when an action_head .pt sits in
    # the checkpoint dir (the OFT release layout the recorder targets),
    # else the discrete LM-logit decode. Must match how
    # record_reference_outputs.py ran (it records get_vla_action with the
    # reference's L1 head by default).
    head: str = "auto"                     # auto | l1 | diffusion | discrete
    atol: float = 2e-2                     # bf16 end-to-end tolerance
    # Day-one chaining (PARITY_RUNBOOK.md: one command from import to bench):
    calibrate_int8: bool = False           # re-run int8 calibration on PASS
    run_bench: bool = False                # run bench.py measurement on PASS
    full: bool = False                     # --full True = the day-one command:
                                           # calibrate + bench on PASS
    report: Optional[str] = None           # write a JSON parity report here
                                           # (default <checkpoint>/parity_report.json)


def _report(name: str, ours: np.ndarray, ref: Optional[np.ndarray],
            atol: float, sink: Optional[list] = None) -> bool:
    stats = (f"shape={tuple(ours.shape)} mean={ours.mean():+.4f} "
             f"std={ours.std():.4f} absmax={np.abs(ours).max():.4f}")
    rec = {"stage": name, "shape": list(ours.shape), "atol": atol}
    if ref is None:
        print(f"  [stats] {name}: {stats}")
        rec.update(status="stats-only", ok=True)
        if sink is not None:
            sink.append(rec)
        return True
    if tuple(ours.shape) != tuple(ref.shape):
        # Shape drift (e.g. a tokenizer emitting one extra merge) is the most
        # likely first divergence — report it as a FAIL, don't crash on the
        # broadcast so later stages still run.
        print(f"  [FAIL] {name}: shape mismatch ours={tuple(ours.shape)} "
              f"ref={tuple(ref.shape)} {stats}")
        rec.update(status="shape-mismatch", ok=False,
                   ref_shape=list(ref.shape))
        if sink is not None:
            sink.append(rec)
        return False
    err = np.abs(ours.astype(np.float32) - ref.astype(np.float32)).max()
    ok = err <= atol
    print(f"  [{'OK ' if ok else 'FAIL'}] {name}: max|Δ|={err:.5f} "
          f"(atol {atol}) {stats}")
    rec.update(status="compared", ok=bool(ok), max_abs_err=float(err))
    if sink is not None:
        sink.append(rec)
    return ok


def _flip_siglip_act(model_cfg):
    """Register a registry variant with the SigLIP GELU flipped
    (gelu_tanh <-> gelu); returns a config pointing at it, or None when the
    backbone has no SigLIP entry. The one-field switch PARITY_RUNBOOK.md
    describes, automated."""
    import dataclasses as dc

    import openvla_oft_tpu.config as C

    cfgs = model_cfg.vision_configs
    # SigLIP: the entry whose act is a GELU variant and mean is 0.5-centered
    # (CLIP uses quick_gelu; DINOv2/IN1K use exact gelu with imagenet stats).
    def is_siglip(v):
        return v.act in ("gelu", "gelu_tanh") and tuple(v.mean) == (0.5, 0.5, 0.5)

    if not any(is_siglip(v) for v in cfgs):
        return None
    new = tuple(
        dc.replace(v, act=("gelu" if v.act == "gelu_tanh" else "gelu_tanh"))
        if is_siglip(v) else v for v in cfgs)
    key = model_cfg.vision_backbone_id + "#gelu-flipped"
    C._VISION_REGISTRY[key] = new
    return dc.replace(model_cfg, vision_backbone_id=key)


def validate(cfg: ParityConfig) -> bool:
    import jax.numpy as jnp

    from examples.quickstart import load_observation
    from openvla_oft_tpu.models.projector import vision_projector
    from openvla_oft_tpu.models.prismatic import prepare_prompt_ids
    from openvla_oft_tpu.models.vision_backbone import vision_backbone_forward
    from openvla_oft_tpu.processing.image_processing import (
        prepare_images_for_policy)
    from openvla_oft_tpu.utils.hf_import import load_openvla_checkpoint
    from openvla_oft_tpu.policy import OpenVLAPolicy
    from openvla_oft_tpu.constants import detect_robot_platform
    from experiments.robot.openvla_utils import _try_tokenizer

    refs = dict(np.load(cfg.reference_outputs)) if cfg.reference_outputs else {}
    if "pixels_channel_stacked" in refs and "pixels" not in refs:
        # record_reference_outputs.py dumps the reference's (1, 6N, H, W)
        # channel-stacked layout; convert to ours for comparison.
        from openvla_oft_tpu.processing.processor import from_channel_stacked

        refs["pixels"] = from_channel_stacked(
            refs.pop("pixels_channel_stacked"),
            cfg.num_images_in_input)[0]
    obs = load_observation(cfg.observation)
    task = obs.pop("task_description")
    platform = detect_robot_platform(cfg.checkpoint + " " + (cfg.unnorm_key or ""))

    print(f"[1/5] loading checkpoint {cfg.checkpoint}")
    model_cfg, params, norm_stats = load_openvla_checkpoint(
        cfg.checkpoint, dtype=jnp.bfloat16)
    import dataclasses as dc

    model_cfg = dc.replace(model_cfg,
                           num_images_in_input=cfg.num_images_in_input)
    ok = True
    stages: list = []
    gelu_choice = None

    def report(name, ours, ref, atol):
        return _report(name, ours, ref, atol, sink=stages)

    print("[2/5] tokenizer / prompt")
    tokenizer = _try_tokenizer(cfg.checkpoint)
    ids, mask = prepare_prompt_ids(tokenizer, task, bucket=64)
    real_ids = ids[mask.astype(bool)]
    ok &= report("prompt_ids", real_ids.astype(np.float32),
                  refs.get("prompt_ids"), atol=0.0)

    print("[3/5] pixel pipeline")
    images = [obs["full_image"]]
    if cfg.num_images_in_input > 1 and "wrist_image" in obs:
        images.append(obs["wrist_image"])
    pixels = prepare_images_for_policy(images, model_cfg,
                                       center_crop=cfg.center_crop)
    ok &= report("pixels", pixels, refs.get("pixels"), cfg.atol)

    print("[4/5] vision features + projector")
    feats = np.asarray(vision_backbone_forward(
        params["vision_backbone"], model_cfg,
        jnp.asarray(pixels)[None].astype(jnp.bfloat16)), np.float32)
    ref_feats = refs.get("vit_features")
    if ref_feats is not None:
        # SigLIP GELU variant auto-try (docs/ROADMAP.md open question: the
        # reference's pinned timm==0.9.10 may run exact OR tanh GELU — decide
        # empirically against the recorded activations and report the winner).
        err_a = np.abs(feats - ref_feats.astype(np.float32)).max()
        flipped_cfg = _flip_siglip_act(model_cfg)
        if flipped_cfg is not None:
            feats_b = np.asarray(vision_backbone_forward(
                params["vision_backbone"], flipped_cfg,
                jnp.asarray(pixels)[None].astype(jnp.bfloat16)), np.float32)
            err_b = np.abs(feats_b - ref_feats.astype(np.float32)).max()
            act_a = model_cfg.vision_configs[-1].act
            act_b = flipped_cfg.vision_configs[-1].act
            print(f"  [gelu] SigLIP {act_a}: max|d|={err_a:.5f}  "
                  f"{act_b}: max|d|={err_b:.5f} -> "
                  f"{'keep ' + act_a if err_a <= err_b else 'SWITCH TO ' + act_b}")
            if err_b < err_a:
                model_cfg, feats = flipped_cfg, feats_b
            gelu_choice = model_cfg.vision_configs[-1].act
    ok &= report("vit_features", feats, ref_feats, cfg.atol)
    proj = np.asarray(vision_projector(params["projector"],
                                       jnp.asarray(feats)), np.float32)
    ok &= report("projected_patches", proj, refs.get("projected_patches"),
                  cfg.atol)

    print("[5/5] end-to-end action chunk (eval API)")
    # Per-module OFT artifacts: the released checkpoints keep the action
    # head / proprio projector in separate .pt files next to the HF weights
    # (reference openvla_utils.py get_action_head/get_proprio_projector);
    # load whichever exist and pick the head accordingly so the comparison
    # runs the same program the recorder did.
    from types import SimpleNamespace

    from experiments.robot.openvla_utils import get_vla_action
    from openvla_oft_tpu.training.checkpoint import (
        find_checkpoint_file, import_action_head_pt, import_projector_pt)

    def _try_module(pattern, importer, **kw):
        try:
            return importer(find_checkpoint_file(cfg.checkpoint, pattern), **kw)
        except (AssertionError, FileNotFoundError, KeyError):
            return None

    head = cfg.head
    action_head = (_try_module("action_head", import_action_head_pt,
                               head=("diffusion" if head == "diffusion"
                                     else "l1"))
                   if head != "discrete" else None)
    if head == "auto":
        if action_head is None:  # diffusion .pt? (noise_predictor keys)
            action_head = _try_module("action_head", import_action_head_pt,
                                      head="diffusion")
            head = "diffusion" if action_head is not None else "discrete"
        else:
            head = "l1"
    elif head in ("l1", "diffusion") and action_head is None:
        print(f"  [FAIL] head={head} requested but no action_head .pt in "
              f"{cfg.checkpoint}")
        ok = False
        head = "discrete"
    use_proprio = cfg.use_proprio and "state" in obs and bool(norm_stats)
    proprio_projector = (_try_module("proprio_projector", import_projector_pt,
                                     kind="proprio") if use_proprio else None)
    noisy_projector = (_try_module("noisy_action_projector",
                                   import_projector_pt, kind="noisy_action")
                       if head == "diffusion" else None)
    use_proprio = use_proprio and proprio_projector is not None
    print(f"  head={head} proprio={'on' if use_proprio else 'off'}")

    # Exact erf-GELU for the strict real-weight comparison: the serving
    # default (fast_gelu=True) is sub-bf16-ulp equivalent but parity
    # validation must isolate model-porting errors from the (documented,
    # enumerated) fast-GELU rounding deltas.
    policy = OpenVLAPolicy(cfg=model_cfg, platform=platform, params=params,
                           norm_stats=norm_stats, head=head,
                           tokenizer=tokenizer, fast_gelu=False)
    eval_cfg = SimpleNamespace(
        num_images_in_input=cfg.num_images_in_input, use_proprio=use_proprio,
        center_crop=cfg.center_crop, unnorm_key=cfg.unnorm_key or None,
        device_preprocess=False)
    actions = get_vla_action(eval_cfg, policy, None, dict(obs), task,
                             action_head=action_head,
                             proprio_projector=proprio_projector,
                             noisy_action_projector=noisy_projector)
    ok &= report("actions", np.asarray(actions), refs.get("actions"), cfg.atol)

    print("PARITY:", "PASS" if ok else "FAIL")

    # Machine-readable report (the day-one artifact PARITY_RUNBOOK.md asks
    # the operator to attach): per-stage outcomes + the auto-selected SigLIP
    # GELU variant + the head/proprio wiring that actually ran.
    import json
    import os

    report_path = cfg.report or (
        os.path.join(cfg.checkpoint, "parity_report.json")
        if os.path.isdir(cfg.checkpoint) else "parity_report.json")
    with open(report_path, "w") as f:
        json.dump({
            "pass": bool(ok),
            "checkpoint": cfg.checkpoint,
            "reference_outputs": cfg.reference_outputs,
            "stages": stages,
            "siglip_gelu": gelu_choice,
            "head": head,
            "use_proprio": bool(use_proprio),
            "atol": cfg.atol,
        }, f, indent=2)
    print(f"parity report -> {report_path}")

    if cfg.full:
        cfg = dataclasses.replace(cfg, calibrate_int8=True, run_bench=True)
    if ok and cfg.calibrate_int8:
        print("[+] int8 re-calibration (ops/quant_calibrate.py)")
        from openvla_oft_tpu.ops.quant_calibrate import (
            calibrate,
            random_observations,
        )

        report = calibrate(model_cfg, platform, params,
                           random_observations(model_cfg, platform, n=4),
                           low_memory=True)
        print("    action_l1:", report["action_l1"],
              "verdict:", report["verdict"])
    if ok and cfg.run_bench:
        print("[+] bench.py (headline serving latency)")
        import subprocess

        subprocess.run([sys.executable,
                        str(Path(__file__).resolve().parent.parent / "bench.py")],
                       check=False)
    return ok


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    raise SystemExit(0 if validate(parse_args(ParityConfig)) else 1)
