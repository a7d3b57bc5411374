#!/bin/bash
# Offline LoRA-merge launcher (reference
# vla-scripts/merge_lora_weights_and_save.sh:12-16).
#   1 BASE_CHECKPOINT   2 LORA_FINETUNED_CHECKPOINT_DIR
set -euo pipefail

BASE_CHECKPOINT="$1"
LORA_FINETUNED_CHECKPOINT_DIR="$2"   # the finetune run dir holding ckpt/<step>

python vla_scripts/merge_lora_weights_and_save.py \
    --base_checkpoint "$BASE_CHECKPOINT" \
    --finetune_run_dir "$LORA_FINETUNED_CHECKPOINT_DIR"
