#!/bin/bash
# SimT-stage launcher with the canonical hyper-parameter set of record
# (reference sh_simt.sh:17: open 15, lr 6e-4 / lr_T 6e-3, thresholds 0.8/0.2,
# lambdas Place 0.1 / Convex 0.1 / Volume 1.0 / Anchor 1.0).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:?set DATA_ROOT to the Cityscapes root}
RESTORE=${RESTORE:?set RESTORE to the warmup checkpoint (.pth or orbax)}

cd "$(dirname "$0")/../tools"
exec python train_simt.py \
    --preset simt_bapa_lr6 \
    --data-dir-target "$DATA_ROOT" \
    --gt-dir "$DATA_ROOT/label" \
    --val-list ../simt_tpu/data/assets/cityscapes_list/val.txt \
    --restore-from "$RESTORE" \
    --random-mirror \
    --snapshot-dir ../snapshots/simt \
    "$@"
