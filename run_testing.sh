#!/bin/bash
# Full-volume evaluation (reference run_testing.sh recipe).
set -e
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to a .msgpack checkpoint}
DATA_ROOT=${DATA_ROOT:-datasets/resampled}
EXPERIMENT_DIR=${EXPERIMENT_DIR:-experiments}
MODEL_NAME=${MODEL_NAME:-unet}
MODALITIES=${MODALITIES:-all}

python main.py \
  --experiment eval \
  --model_path "$MODEL_PATH" \
  --data_root "$DATA_ROOT" \
  --experiment_dir "$EXPERIMENT_DIR" \
  --model_name "$MODEL_NAME" \
  --modalities "$MODALITIES" \
  --seed 42
