#!/bin/bash
# LIBERO-Spatial OFT fine-tuning launch (reference `vla-scripts/finetune.sh`
# torchrun recipe, LIBERO.md:92-113 — here one JAX process drives all local
# TPU chips; multi-host pods add --multihost True on every host).
#
# Reference batch geometry: 8 GPUs x batch 8 = global 64; on a v5e-8 use
# fsdp=8 with the same global batch.

set -euo pipefail

VLA_PATH=${VLA_PATH:-/checkpoints/openvla-7b}
DATA_ROOT=${DATA_ROOT:-/data/rlds}
RUN_ROOT=${RUN_ROOT:-runs}

python "$(dirname "$0")/finetune.py" \
  --vla_path "$VLA_PATH" \
  --data_root_dir "$DATA_ROOT" \
  --dataset_name libero_spatial_no_noops \
  --run_root_dir "$RUN_ROOT" \
  --recipe oft-libero-spatial \
  --mesh_fsdp 8 \
  --batch_size 64 \
  --use_val_set True \
  --save_freq 10000 \
  "$@"
