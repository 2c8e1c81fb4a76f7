#!/usr/bin/env python3
"""34x19 noise-rate confusion matrix between ground truth and pseudo labels.

Rebuilds the *intent* of the reference's tools/compute_ConfusionMatrix.py, which is
broken as shipped (imports nonexistent modules at :13-16 and reads a nonexistent
info.json key 'label2train_1' at :77 — SURVEY.md §2.4): rows are raw 34 Cityscapes label
ids (no remap — that is what makes it 34x19), columns the 19 pseudo trainids. The
normalised rows are the empirical noise-transition estimate the NTM learns.

  python tools/compute_confusion_matrix.py --gt-dir /data/label --pred-dir /data/pseudo \
      --gt-list label.txt --pred-list train.txt --out cm.npy [--plot cm.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hist_34x19(label: np.ndarray, pred: np.ndarray, n_gt=34, n_pred=19) -> np.ndarray:
    """Rectangular confusion (compute_ConfusionMatrix.py:54-56)."""
    k = (label >= 0) & (label < n_gt) & (pred >= 0) & (pred < n_pred)
    return np.bincount(
        n_pred * label[k].astype(int) + pred[k], minlength=n_gt * n_pred
    ).reshape(n_gt, n_pred)


def compute_confusion(gt_dir, pred_dir, gt_names, pred_names, n_gt=34, n_pred=19):
    from PIL import Image

    cm = np.zeros((n_gt, n_pred), np.float64)
    for gt_name, pred_name in zip(gt_names, pred_names):
        gt = np.asarray(Image.open(os.path.join(gt_dir, gt_name)))
        pred = np.asarray(Image.open(os.path.join(pred_dir, os.path.basename(pred_name))))
        if gt.size != pred.size:
            print(f"Skipping: gt {gt.shape} vs pred {pred.shape} ({gt_name})")
            continue
        cm += hist_34x19(gt.flatten(), pred.flatten(), n_gt, n_pred)
    return cm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--pred-dir", required=True)
    p.add_argument("--gt-list", required=True)
    p.add_argument("--pred-list", required=True)
    p.add_argument("--out", required=True, help="output .npy path (34x19 counts)")
    p.add_argument("--plot", default=None, help="optional heat-map PNG (row-normalised)")
    args = p.parse_args()

    gt_names = [l.strip() for l in open(args.gt_list) if l.strip()]
    pred_names = [l.strip() for l in open(args.pred_list) if l.strip()]
    cm = compute_confusion(args.gt_dir, args.pred_dir, gt_names, pred_names)
    np.save(args.out, cm)
    print("saved", args.out, "total pixels", int(cm.sum()))
    if args.plot:
        from simt_tpu.utils import plot_ntm

        rows = cm / np.maximum(cm.sum(1, keepdims=True), 1)
        plot_ntm(rows, args.plot, title="GT(34) vs pseudo(19) noise rates")
        print("plotted", args.plot)


if __name__ == "__main__":
    main()
