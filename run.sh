#!/usr/bin/env bash
# Launch wrapper (counterpart of the reference run.sh): single-host training
# of the flagship MoCo CLIP-RN50 experiment. Multi-host: set
# JAX_COORDINATOR (and run one process per host) to trigger
# jax.distributed.initialize inside train_net.py.
set -euo pipefail

ROOT="${ROOT:-$HOME}"
CONFIG="${CONFIG:-configs/cuhkpedes/moco_gru_cliprn50_ls_bs128_2048.yaml}"

python train_net.py \
  --root "$ROOT" \
  --config-file "$CONFIG" \
  --use-tensorboard \
  "$@"
