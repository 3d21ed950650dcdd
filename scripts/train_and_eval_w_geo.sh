#!/bin/bash
# Launch tier 'w_geo' (reference parity: scripts/train_and_eval_w_geo.sh).
# usage: bash scripts/train_and_eval_w_geo.sh <demo_root> <logdir> [seed] [extra overrides...]
set -e
DEMO_ROOT=${1:?demo root}
LOGDIR=${2:?logdir}
SEED=${3:-0}
shift 3 2>/dev/null || shift 2

python train.py --variant w_geo --demo-root "$DEMO_ROOT" --logdir "$LOGDIR" \
    --seed "$SEED"  "$@"

python eval.py --logdir "$LOGDIR/seed$SEED" --demo-root "$DEMO_ROOT" \
    --env mock --eval-type last
