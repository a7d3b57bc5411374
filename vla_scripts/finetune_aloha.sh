#!/bin/bash
# ALOHA OFT+ fine-tuning launch (reference ALOHA.md:59-84 recipe: FiLM on,
# 3 camera images, proprio, 100K steps with decay at 50K).

set -euo pipefail

VLA_PATH=${VLA_PATH:-/checkpoints/openvla-7b}
DATA_ROOT=${DATA_ROOT:-/data/rlds}

python "$(dirname "$0")/finetune.py" \
  --vla_path "$VLA_PATH" \
  --data_root_dir "$DATA_ROOT" \
  --recipe oft-plus-aloha_scoop_x_into_bowl \
  --mesh_fsdp 8 \
  "$@"
