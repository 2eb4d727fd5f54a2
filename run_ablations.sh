#!/bin/bash
# n-sample ablation sweeps — the parameterized equivalent of the
# reference's 31 run_*.sh variants (run_training_ct_{1,5,10,25,50,100}.sh,
# run_finetune_ct_n*.sh, run_distillation_n*.sh, run_dann_n*.sh).
#
#   MODE=train MODALITIES=ct ./run_ablations.sh          # baselines
#   MODE=finetune PRETRAINED=... ./run_ablations.sh      # limited-label CT
#   MODE=distill TEACHER=... ./run_ablations.sh
#   MODE=dann ./run_ablations.sh                         # add-n sweep
set -e

MODE=${MODE:-train}
NS=${NS:-"1 5 10 25 50 100"}
DATA_ROOT=${DATA_ROOT:-datasets/resampled}
EXPERIMENT_DIR=${EXPERIMENT_DIR:-experiments/ablations}

for N in $NS; do
  echo "=== $MODE ablation n=$N ==="
  case "$MODE" in
    train)
      N_SAMPLES=$N DATA_ROOT="$DATA_ROOT" \
        EXPERIMENT_DIR="$EXPERIMENT_DIR/${MODE}_n${N}" ./run_training.sh ;;
    finetune)
      N_SAMPLES=$N DATA_ROOT="$DATA_ROOT" PRETRAINED="$PRETRAINED" \
        EXPERIMENT_DIR="$EXPERIMENT_DIR/${MODE}_n${N}" ./run_finetune_ct.sh ;;
    distill)
      N_SAMPLES=$N DATA_ROOT="$DATA_ROOT" TEACHER="$TEACHER" \
        EXPERIMENT_DIR="$EXPERIMENT_DIR/${MODE}_n${N}" ./run_distillation.sh ;;
    dann)
      N_ADD=$N DATA_ROOT="$DATA_ROOT" \
        EXPERIMENT_DIR="$EXPERIMENT_DIR/${MODE}_add${N}" ./run_dann.sh ;;
    *) echo "unknown MODE=$MODE"; exit 1 ;;
  esac
done
