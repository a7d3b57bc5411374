#!/bin/bash
# TPU-VM launcher for OFT fine-tuning (reference vla-scripts/finetune.sh:1-45,
# a SLURM/torchrun wrapper — here one process per TPU host; JAX's GSPMD mesh
# replaces torchrun's per-GPU process model, so single-host pods need no
# launcher daemon at all and pod slices just add --multihost).
#
# Positional args mirror the reference launcher:
#   1 CKPT_FOLDER   2 RUN_ID_NOTE   3 RESUME   4 RESUME_STEP
#   5 RUN_ROOT_DIR  6 DATASET_NAME
#
# Multi-host pods: run this same script on every worker, e.g.
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all \
#       --command="cd ~/openvla-oft-tpu && bash vla_scripts/finetune.sh ... "
# and set MULTIHOST=true so each process joins the jax.distributed job.
set -euo pipefail

CKPT_FOLDER="${1:-openvla/openvla-7b}"
RUN_ID_NOTE="${2:-parallel_dec--8_acts_chunk--continuous_acts--L1_regression--3rd_person_img-gripper_img}"
RESUME="${3:-false}"
RESUME_STEP="${4:-0}"
RUN_ROOT_DIR="${5:-runs}"
DATASET_NAME="${6:-ur5e_pick_place}"

DATA_ROOT_DIR="${DATA_ROOT_DIR:-datasets/rlds}"
MULTIHOST="${MULTIHOST:-false}"
MESH_FSDP="${MESH_FSDP:-1}"
MESH_TP="${MESH_TP:-1}"

RESUME_ARGS=()
if [ "$RESUME" = "true" ]; then
    RESUME_ARGS=(--resume true --resume_step "$RESUME_STEP")
fi

python vla_scripts/finetune.py \
    --vla_path "$CKPT_FOLDER" \
    --data_root_dir "$DATA_ROOT_DIR" \
    --dataset_name "$DATASET_NAME" \
    --run_root_dir "$RUN_ROOT_DIR" \
    --use_l1_regression true \
    --use_diffusion false \
    --use_film false \
    --num_images_in_input 2 \
    --use_proprio true \
    --batch_size 8 \
    --learning_rate 5e-4 \
    --num_steps_before_decay 100000 \
    --max_steps 224686 \
    --save_freq 5000 \
    --save_latest_checkpoint_only false \
    --image_aug true \
    --lora_rank 32 \
    --mesh_fsdp "$MESH_FSDP" \
    --mesh_tp "$MESH_TP" \
    --multihost "$MULTIHOST" \
    --run_id_note "$RUN_ID_NOTE" \
    "${RESUME_ARGS[@]}" \
    ${EXTRA_ARGS:-}
# EXTRA_ARGS: optional extra --flag value pairs appended last — the CLI lets
# later flags win, so e.g. EXTRA_ARGS="--batch_size 2 --max_steps 2" gives a
# smoke run without editing this file (word-splitting is intentional).
