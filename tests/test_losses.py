"""Loss parity tests against torch functional ops (the reference's loss math:
utils/loss.py, tools/trainV2_simt.py:202-230,402-421)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from simt_tpu.ops import (
    cross_entropy_2d,
    entropy_loss,
    finite_or_zero,
    mse_sum,
    nll_from_probs_2d,
    placeholder_loss,
    volume_loss,
)


def _rand_logits_labels(seed=0, b=2, h=6, w=7, c=5, ignore_frac=0.3):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, h, w, c).astype(np.float32) * 3
    labels = rng.randint(0, c, size=(b, h, w)).astype(np.int64)
    mask = rng.rand(b, h, w) < ignore_frac
    labels[mask] = 255
    return logits, labels


def test_cross_entropy_matches_torch():
    logits, labels = _rand_logits_labels()
    got = float(cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels)))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels),
        ignore_index=255,
    ).item()
    assert abs(got - want) < 1e-5


def test_cross_entropy_all_ignored_returns_zero():
    logits = jnp.ones((1, 2, 2, 3))
    labels = jnp.full((1, 2, 2), 255, jnp.int32)
    assert float(cross_entropy_2d(logits, labels)) == 0.0


def test_nll_from_probs_matches_torch():
    logits, labels = _rand_logits_labels(seed=1)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    got = float(nll_from_probs_2d(jnp.asarray(probs), jnp.asarray(labels)))
    # Reference path: log(predict) + nll_loss on masked flattened pixels (utils/loss.py:38-39).
    pt = torch.from_numpy(probs).reshape(-1, probs.shape[-1])
    lt = torch.from_numpy(labels).reshape(-1)
    keep = lt != 255
    want = F.nll_loss(torch.log(pt[keep]), lt[keep]).item()
    assert abs(got - want) < 1e-5


def test_entropy_matches_torch():
    logits, _ = _rand_logits_labels(seed=2)
    got = float(entropy_loss(jnp.asarray(logits)))
    t = torch.from_numpy(logits).permute(0, 3, 1, 2)
    b = F.softmax(t, dim=1) * F.log_softmax(t, dim=1)
    want = (-1.0 * b.sum(1)).mean().item()
    assert abs(got - want) < 1e-5


def _torch_placeholder_loss(pred_nchw, num_classes, open_classes, lambda_place, thres):
    """Torch twin of the reference math (tools/trainV2_simt.py:202-230), test-only."""
    seg_loss = torch.nn.CrossEntropyLoss(ignore_index=255)
    pred = pred_nchw
    pseudo = torch.argmax(pred, dim=1).long()
    pseudo_onehot = (
        torch.eye(num_classes + open_classes)[pseudo].permute(0, 3, 1, 2).float()
    )
    zeros = torch.zeros_like(pseudo_onehot)
    ones_f = torch.zeros_like(pseudo_onehot)
    predict = torch.where(pseudo_onehot > zeros, -1000.0 * ones_f, pred)

    ones = torch.ones_like(pseudo)
    pseudo1 = torch.where(pseudo < num_classes * ones, pseudo, 255 * ones)
    if thres is not None:
        pred_max = torch.max(torch.softmax(pred.detach(), dim=1), 1)[0]
        pseudo1 = torch.where(pred_max > thres, pseudo1, 255 * ones)
    loss_known = seg_loss(pred, pseudo1)

    predict_open = torch.zeros_like(predict)
    predict_open[:, num_classes:, :, :] = predict[:, num_classes:, :, :].detach()
    place_y = torch.argmax(predict_open, dim=1)
    place_y = torch.where(pseudo1 == 255 * ones, 255 * ones, place_y)
    loss_unknown = seg_loss(predict, place_y)
    return (loss_known + lambda_place * loss_unknown).item()


def test_placeholder_loss_matches_reference_math():
    rng = np.random.RandomState(3)
    c, o = 6, 4
    logits = (rng.randn(2, 8, 9, c + o) * 2).astype(np.float32)
    got = float(
        placeholder_loss(
            jnp.asarray(logits),
            num_classes=c,
            open_classes=o,
            lambda_place=0.1,
            threshold=0.5,
        )
    )
    want = _torch_placeholder_loss(
        torch.from_numpy(logits).permute(0, 3, 1, 2), c, o, 0.1, 0.5
    )
    assert abs(got - want) < 1e-4


def test_placeholder_loss_no_threshold():
    rng = np.random.RandomState(4)
    c, o = 5, 3
    logits = (rng.randn(1, 5, 5, c + o) * 2).astype(np.float32)
    got = float(
        placeholder_loss(
            jnp.asarray(logits), num_classes=c, open_classes=o, lambda_place=0.2,
            threshold=None,
        )
    )
    want = _torch_placeholder_loss(
        torch.from_numpy(logits).permute(0, 3, 1, 2), c, o, 0.2, None
    )
    assert abs(got - want) < 1e-4


def test_volume_loss_matches_torch():
    rng = np.random.RandomState(5)
    t = np.abs(rng.rand(10, 6).astype(np.float32)) + 0.1
    t = t / t.sum(1, keepdims=True)
    got = float(volume_loss(jnp.asarray(t)))
    # float64 torch twin as ground truth (a float32 det underflows here).
    tt = torch.from_numpy(t).double()
    want = torch.log(
        torch.sqrt(torch.abs(torch.linalg.det(tt.T.mm(tt))))
    ).item()
    assert abs(got - want) < 1e-2, (got, want)


def test_finite_or_zero():
    assert float(finite_or_zero(jnp.asarray(np.inf))) == 0.0
    assert float(finite_or_zero(jnp.asarray(np.nan))) == 0.0
    assert float(finite_or_zero(jnp.asarray(-3.5))) == -3.5


def test_mse_sum_matches_torch():
    rng = np.random.RandomState(6)
    a, b = rng.randn(7, 5).astype(np.float32), rng.randn(7, 5).astype(np.float32)
    got = float(mse_sum(jnp.asarray(a), jnp.asarray(b)))
    want = torch.nn.MSELoss(reduction="sum")(torch.from_numpy(a), torch.from_numpy(b)).item()
    assert abs(got - want) < 1e-4
