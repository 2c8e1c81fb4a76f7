#!/bin/bash
# Warmup-stage launcher — the TPU equivalent of the reference's SLURM script
# (sh_warmup.sh:17): DeepLabv2-ResNet101 warmup on BAPA pseudo-labels.
# Set DATA_ROOT to a Cityscapes-layout tree (train images + pseudo_* label dirs,
# label/ with *_gtFine_labelIds.png).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:?set DATA_ROOT to the Cityscapes root}
RESTORE=${RESTORE:-resnet_pretrain.pth}

cd "$(dirname "$0")/../tools"
exec python train_warmup.py \
    --preset warmup_bapa \
    --data-dir-target "$DATA_ROOT" \
    --gt-dir "$DATA_ROOT/label" \
    --val-list ../simt_tpu/data/assets/cityscapes_list/val.txt \
    --restore-from "$RESTORE" \
    --random-mirror \
    --snapshot-dir ../snapshots/warmup \
    "$@"
