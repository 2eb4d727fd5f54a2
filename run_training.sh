#!/bin/bash
# Baseline supervised training on a TPU VM (reference run_training.sh recipe:
# batch 1/device, grad-accum 8, lr 1e-3, wd 1e-4, ce_tversky, bf16, 100 epochs).
# No SLURM / no accelerate launcher: single-controller JAX drives all local
# chips through one process (data-parallel mesh is sized automatically).
set -e

DATA_ROOT=${DATA_ROOT:-datasets/resampled}
EXPERIMENT_DIR=${EXPERIMENT_DIR:-experiments}
BATCH_SIZE=${BATCH_SIZE:-1}
EPOCHS=${EPOCHS:-100}
LR=${LR:-1e-3}
WEIGHT_DECAY=${WEIGHT_DECAY:-1e-4}
GRAD_ACCUM=${GRAD_ACCUM:-8}
MODALITIES=${MODALITIES:-mri}
LOSS=${LOSS:-ce_tversky}
N_SAMPLES=${N_SAMPLES:-}

EXTRA=()
[ -n "$N_SAMPLES" ] && EXTRA+=(--n_samples "$N_SAMPLES")

python main.py \
  --experiment train \
  --data_root "$DATA_ROOT" \
  --experiment_dir "$EXPERIMENT_DIR" \
  --batch_size "$BATCH_SIZE" \
  --epochs "$EPOCHS" \
  --lr "$LR" \
  --weight_decay "$WEIGHT_DECAY" \
  --gradient_accumulation_steps "$GRAD_ACCUM" \
  --mixed_precision bf16 \
  --modalities "$MODALITIES" \
  --loss "$LOSS" \
  --early_stopping --patience 10 \
  --seed 42 \
  "${EXTRA[@]}"
