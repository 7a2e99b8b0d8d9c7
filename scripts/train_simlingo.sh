#!/bin/bash
# Production training launch (counterpart of reference train_simlingo_seed1.sh:
# 8 GPUs x batch/GPU with NCCL -> one process per TPU host, mesh over all chips).
# Usage: bash scripts/train_simlingo.sh [data_root] [extra overrides...]
set -e
cd "$(dirname "$0")/.."
DATA_ROOT=${1:-database/simlingo}
shift || true
python train.py --experiment configs/simlingo.yaml \
  data.data_root="$DATA_ROOT" \
  data.batch_size=8 \
  "$@"
