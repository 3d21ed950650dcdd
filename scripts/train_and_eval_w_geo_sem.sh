#!/bin/bash
# Launch tier 'w_geo_sem' (reference parity: scripts/train_and_eval_w_geo_sem.sh).
# usage: bash scripts/train_and_eval_w_geo_sem.sh <demo_root> <logdir> [seed] [extra overrides...]
set -e
DEMO_ROOT=${1:?demo root}
LOGDIR=${2:?logdir}
SEED=${3:-0}
shift 3 2>/dev/null || shift 2

python train.py --variant w_geo_sem --demo-root "$DEMO_ROOT" --logdir "$LOGDIR" \
    --seed "$SEED" method.neural_renderer.foundation_model_name=diffusion "$@"

python eval.py --logdir "$LOGDIR/seed$SEED" --demo-root "$DEMO_ROOT" \
    --env mock --eval-type last
