"""Metric parity tests (reference tools/compute_iou.py:9-22)."""

import jax.numpy as jnp
import numpy as np

from simt_tpu.ops import fast_hist, fast_hist_np, label_mapping, mean_iou, per_class_iu


def test_fast_hist_device_matches_numpy():
    rng = np.random.RandomState(0)
    n = 19
    label = rng.randint(0, 40, size=5000)  # includes out-of-range (255-like) ids
    label[rng.rand(5000) < 0.2] = 255
    pred = rng.randint(0, n, size=5000)
    got = np.asarray(fast_hist(jnp.asarray(label), jnp.asarray(pred), n))
    want = fast_hist_np(label, pred, n)
    np.testing.assert_array_equal(got, want)


def test_per_class_iu_golden():
    hist = np.array([[5, 1], [2, 8]], dtype=np.float64)
    iu = per_class_iu(hist)
    np.testing.assert_allclose(iu, [5 / (6 + 7 - 5), 8 / (10 + 9 - 8)])


def test_mean_iou_rounding_matches_reference():
    hist = np.array([[5, 1], [2, 8]], dtype=np.float64)
    want = round(float(np.nanmean(per_class_iu(hist))) * 100, 2)
    assert mean_iou(hist) == want


def test_mean_iou_nan_classes_ignored():
    hist = np.zeros((3, 3))
    hist[0, 0] = 10  # class 1 and 2 absent -> NaN IoU, nanmean skips them
    assert mean_iou(hist) == 100.0


def test_label_mapping_matches_loop():
    rng = np.random.RandomState(1)
    mapping = [[0, 255], [7, 0], [8, 1], [26, 13], [33, 18]]
    label = rng.randint(0, 34, size=(20, 30))

    # Loop twin of compute_iou.py:18-22.
    out = np.copy(label)
    for src, dst in mapping:
        out[label == src] = dst
    want = out.astype(np.int64)

    got = label_mapping(label, mapping)
    np.testing.assert_array_equal(got, want)
