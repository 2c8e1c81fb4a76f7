"""Confusion-matrix / IoU metrics, device-native.

Reference: ``tools/compute_iou.py:9-22`` (numpy ``fast_hist`` / ``per_class_iu`` /
``label_mapping``, duplicated at ``tools/evaluate_cityscapes.py:81-94``). Here the histogram
is accumulated on-device with a one-hot matmul (MXU) instead of host ``np.bincount``, and
merged across data-parallel shards with a ``psum`` — the distributed-eval reduction the
reference never had (it ran one process; SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def fast_hist(label: jax.Array, pred: jax.Array, num_classes: int) -> jax.Array:
    """(num_classes, num_classes) confusion matrix; rows = gt, cols = pred.

    Matches ``fast_hist`` (compute_iou.py:9-11): only pixels with ``0 <= label < n`` count.
    Implemented as a flat scatter-add of ``n*label + pred`` — XLA lowers this to an
    efficient on-device sort/segment-sum rather than a host round-trip.
    """
    label = label.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = jnp.logical_and(label >= 0, label < num_classes)
    idx = jnp.where(valid, num_classes * label + pred, num_classes * num_classes)
    hist = jnp.zeros((num_classes * num_classes + 1,), dtype=jnp.int32).at[idx].add(1)
    return hist[:-1].reshape(num_classes, num_classes)


def fast_hist_np(label: np.ndarray, pred: np.ndarray, num_classes: int) -> np.ndarray:
    """Host-side reference twin of :func:`fast_hist` (compute_iou.py:9-11)."""
    k = (label >= 0) & (label < num_classes)
    return np.bincount(
        num_classes * label[k].astype(int) + pred[k], minlength=num_classes**2
    ).reshape(num_classes, num_classes)


def per_class_iu(hist) -> np.ndarray:
    """Per-class IoU = diag / (row + col - diag) (compute_iou.py:14-15). NaN for absent."""
    hist = np.asarray(hist, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))


def mean_iou(hist) -> float:
    """mIoU in percent, rounded to 2dp exactly like evaluate_cityscapes.py:162."""
    return float(round(np.nanmean(per_class_iu(hist)) * 100, 2))


@functools.lru_cache(maxsize=8)
def _mapping_lut(mapping: tuple, size: int = 256) -> np.ndarray:
    lut = np.arange(size, dtype=np.int64)
    for src, dst in mapping:
        lut[src] = dst
    return lut


def label_mapping(label: np.ndarray, mapping: Sequence[Sequence[int]]) -> np.ndarray:
    """Remap label ids through ``mapping`` pairs (compute_iou.py:18-22).

    The reference loops over pairs writing into a copy based on the *original* values, so a
    lookup table is exact. Used for the Cityscapes 34-id -> 19-trainid map from
    ``info.json['label2train']``.
    """
    lut = _mapping_lut(tuple(tuple(int(v) for v in m) for m in mapping))
    return lut[label.astype(np.int64)]
