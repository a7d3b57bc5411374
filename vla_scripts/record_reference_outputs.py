"""Reference-side activation recorder for the parity harness.

Run this ON THE REFERENCE IMPLEMENTATION (torch/CUDA env with the upstream
openvla-oft repo on PYTHONPATH) to dump the npz that
`vla_scripts/validate_parity.py --reference_outputs` consumes:

    python record_reference_outputs.py \
        --checkpoint moojink/openvla-7b-oft-finetuned-libero-spatial \
        --observation experiments/robot/libero/sample_libero_spatial_observation.pkl \
        --unnorm_key libero_spatial_no_noops --out reference_outputs.npz

It imports ONLY upstream modules (`experiments.robot.openvla_utils`), drives
the stock `get_vla_action` flow (openvla_utils.py:711-796), and captures
intermediates with forward hooks rather than re-implementing any stage — so
the recorded tensors are exactly what the reference model computed:

    prompt_ids             int32 (L,)   input_ids at the LLM embedding (first
                                        prefill call; includes the appended
                                        empty token 29871)
    pixels_channel_stacked f32 (1,6N,H,W)  vision-backbone input (channel-
                                        stacked reference layout; the parity
                                        harness converts with
                                        processing.processor.from_channel_stacked)
    vit_features           f32 (1,256N,D)  fused backbone output
    projected_patches      f32 (1,256N,llm_dim)  projector output
    actions                f32 (chunk,action_dim)  final unnormalized chunk

This file has no dependency on openvla_oft_tpu — copy it alone to the
reference machine.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--observation", required=True,
                    help="sample observation .pkl (reference README flow)")
    ap.add_argument("--unnorm_key", required=True)
    ap.add_argument("--num_images_in_input", type=int, default=2)
    ap.add_argument("--use_proprio", action="store_true", default=True)
    ap.add_argument("--no_proprio", dest="use_proprio", action="store_false")
    ap.add_argument("--use_l1_regression", action="store_true", default=True)
    ap.add_argument("--center_crop", action="store_true", default=True)
    ap.add_argument("--out", default="reference_outputs.npz")
    args = ap.parse_args()

    import torch
    from experiments.robot.openvla_utils import (
        get_action_head,
        get_processor,
        get_proprio_projector,
        get_vla,
        get_vla_action,
    )

    class Cfg:  # the duck-typed cfg the reference utils expect
        pretrained_checkpoint = args.checkpoint
        load_in_8bit = False
        load_in_4bit = False
        use_l1_regression = args.use_l1_regression
        use_diffusion = False
        use_film = False
        use_proprio = args.use_proprio
        num_images_in_input = args.num_images_in_input
        center_crop = args.center_crop
        num_open_loop_steps = 8
        unnorm_key = args.unnorm_key
        lora_rank = 32

    cfg = Cfg()
    vla = get_vla(cfg)
    processor = get_processor(cfg)
    action_head = get_action_head(cfg, llm_dim=vla.llm_dim) \
        if args.use_l1_regression else None
    proprio_projector = get_proprio_projector(
        cfg, llm_dim=vla.llm_dim, proprio_dim=8) if args.use_proprio else None

    rec: dict[str, np.ndarray] = {}

    def save_once(key):
        def hook(_mod, inputs, output):
            if key not in rec:
                src = output if key.endswith("_out") else inputs[0]
                rec[key] = src.detach().float().cpu().numpy()
        return hook

    handles = [
        vla.vision_backbone.register_forward_hook(save_once("pixels_in")),
        vla.vision_backbone.register_forward_hook(save_once("vit_out")),
        vla.projector.register_forward_hook(save_once("proj_out")),
        vla.get_input_embeddings().register_forward_hook(save_once("ids_in")),
    ]

    with open(args.observation, "rb") as f:
        obs = pickle.load(f)
    task = obs.pop("task_description")

    with torch.no_grad():
        actions = get_vla_action(cfg, vla, processor, obs, task,
                                 action_head=action_head,
                                 proprio_projector=proprio_projector)
    for h in handles:
        h.remove()

    out = {
        "prompt_ids": rec["ids_in"].astype(np.int64).ravel().astype(np.int32),
        "pixels_channel_stacked": rec["pixels_in"],
        "vit_features": rec["vit_out"],
        "projected_patches": rec["proj_out"],
        "actions": np.asarray(actions, np.float32),
    }
    np.savez(args.out, **out)
    for k, v in out.items():
        print(f"recorded {k}: shape={v.shape} dtype={v.dtype}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
