#!/usr/bin/env python3
"""Compute the class-frequency prior from pseudo-label PNGs (reference:
tools/compute_ClassDistribution.py:52-93 — per-class pixel histogram over the train
pseudo-labels, normalised to sum 1, saved as the ``sig_NTM`` prior).

  python tools/compute_class_distribution.py --pred-dir /data/pseudo_bapa \
      --list dataset_list.txt --out ClassDist_bapa.npy
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def class_histogram(pred: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-class pixel counts over valid (0..n-1) ids (compute_ClassDistribution.py:52-54)."""
    k = (pred >= 0) & (pred < num_classes)
    return np.bincount(pred[k].astype(int), minlength=num_classes)


def compute_class_distribution(pred_dir, names, num_classes=19):
    from PIL import Image

    counts = np.zeros(num_classes, np.float64)
    for name in names:
        pred = np.asarray(Image.open(os.path.join(pred_dir, os.path.basename(name))))
        counts += class_histogram(pred.flatten(), num_classes)
    # Normalisation with the reference's epsilon (compute_ClassDistribution.py:92).
    return counts / (counts.sum() + 10e-10)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-dir", required=True, help="directory of trainid pseudo PNGs")
    p.add_argument("--list", required=True, help="name list (one image path per line)")
    p.add_argument("--out", required=True, help="output .npy path")
    p.add_argument("--num-classes", type=int, default=19)
    args = p.parse_args()

    names = [l.strip() for l in open(args.list) if l.strip()]
    dist = compute_class_distribution(args.pred_dir, names, args.num_classes)
    np.save(args.out, dist.astype(np.float32))
    print("saved", args.out, dist)


if __name__ == "__main__":
    main()
