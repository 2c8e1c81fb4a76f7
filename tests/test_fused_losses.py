"""Exact equivalence of the flash-style fused loss block vs the unfused ops."""

import jax
import jax.numpy as jnp
import numpy as np

from simt_tpu.ops import (
    cross_entropy_2d,
    nll_from_probs_2d,
    placeholder_loss,
    upsample_bilinear_align_corners,
)
from simt_tpu.ops.fused_losses import simt_loss_block, upsample_ce
from simt_tpu.train.simt import _anchor_loss

C, O, TOTAL = 5, 3, 8
H8, W8 = 9, 13
HH, WW = 40, 72  # divisible into chunks


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.randn(1, H8, W8, TOTAL).astype(np.float32) * 2)
    x2 = jnp.asarray(rng.randn(1, H8, W8, TOTAL).astype(np.float32) * 2)
    tp8 = jax.nn.softmax(jnp.asarray(rng.randn(1, H8, W8, C).astype(np.float32) * 3), -1)
    label = rng.randint(0, C, (1, HH, WW))
    label[rng.rand(1, HH, WW) < 0.15] = 255
    t1 = jax.nn.softmax(jnp.asarray(rng.randn(TOTAL, C).astype(np.float32)), -1)
    t2 = jax.nn.softmax(jnp.asarray(rng.randn(TOTAL, C).astype(np.float32)), -1)
    return x1, x2, tp8, jnp.asarray(label), t1, t2


def _unfused(x1, x2, tp8, label, t1m, t2m, th_hi=0.7, th_lo=0.3, lp=0.1, ls=0.1):
    """Reference-shaped unfused computation (mirrors train/simt.py loss_fn)."""
    hw = (HH, WW)
    teacher_prob = upsample_bilinear_align_corners(tp8, hw)
    tmax = jnp.max(teacher_prob, -1)
    targ = jnp.argmax(teacher_prob, -1)
    conf = jnp.where(tmax > th_hi, targ, 255)
    conf = jnp.where(tmax < th_lo, C, conf)
    teacher_flat = teacher_prob.reshape(-1, C)
    pred1 = upsample_bilinear_align_corners(x1, hw)
    pred2 = upsample_bilinear_align_corners(x2, hw)
    anchor = _anchor_loss(pred1.reshape(-1, TOTAL), t1m, teacher_flat) + _anchor_loss(
        pred2.reshape(-1, TOTAL), t2m, teacher_flat
    )
    pseudo = jnp.argmax(pred2, -1)
    unk = conf == C
    p1_ = jnp.where(unk, pseudo, 0)
    p1_ = jnp.where(p1_ >= C, p1_, 255)
    refined = jnp.where(unk, p1_, conf)
    loss_p1 = cross_entropy_2d(pred1, refined)
    loss_p2 = cross_entropy_2d(pred2, refined)
    place = ls * placeholder_loss(
        pred1, num_classes=C, open_classes=O, lambda_place=lp, threshold=th_hi
    ) + placeholder_loss(
        pred2, num_classes=C, open_classes=O, lambda_place=lp, threshold=th_hi
    )
    pr1 = jax.nn.softmax(pred1, -1).reshape(-1, TOTAL) @ t1m
    pr2 = jax.nn.softmax(pred2, -1).reshape(-1, TOTAL) @ t2m
    loss_y1 = nll_from_probs_2d(pr1.reshape(1, HH, WW, C), label)
    loss_y2 = nll_from_probs_2d(pr2.reshape(1, HH, WW, C), label)
    return dict(loss_p1=loss_p1, loss_p2=loss_p2, loss_y1=loss_y1, loss_y2=loss_y2,
                place=place, anchor=anchor)


def _fused(x1, x2, tp8, label, t1m, t2m, chunk_rows=8):
    return simt_loss_block(
        x1, x2, tp8, label, t1m, t2m,
        num_classes=C, open_classes=O, threshold_high=0.7, threshold_low=0.3,
        lambda_place=0.1, lambda_seg=0.1, chunk_rows=chunk_rows,
    )


def test_fused_matches_unfused_values():
    args = _inputs()
    want = _unfused(*args)
    got = _fused(*args)
    for k in want:
        assert abs(float(got[k]) - float(want[k])) < 2e-4 * max(1, abs(float(want[k]))), (
            k, float(got[k]), float(want[k]),
        )


def test_fused_matches_unfused_gradients():
    args = _inputs(1)

    def total_unfused(x1, x2, t1, t2):
        d = _unfused(x1, x2, args[2], args[3], t1, t2)
        return d["loss_p2"] + d["loss_y2"] + 0.1 * d["loss_p1"] + 0.1 * d["loss_y1"] + \
            d["place"] + d["anchor"]

    def total_fused(x1, x2, t1, t2):
        d = _fused(x1, x2, args[2], args[3], t1, t2)
        return d["loss_p2"] + d["loss_y2"] + 0.1 * d["loss_p1"] + 0.1 * d["loss_y1"] + \
            d["place"] + d["anchor"]

    g_want = jax.grad(total_unfused, argnums=(0, 1, 2, 3))(args[0], args[1], args[4], args[5])
    g_got = jax.grad(total_fused, argnums=(0, 1, 2, 3))(args[0], args[1], args[4], args[5])
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_fused_chunking_invariant():
    args = _inputs(2)
    a = _fused(*args, chunk_rows=4)
    b = _fused(*args, chunk_rows=40)
    for k in a:
        assert abs(float(a[k]) - float(b[k])) < 1e-4, k


def test_upsample_ce_matches_unfused():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, H8, W8, C).astype(np.float32) * 2)
    label = rng.randint(0, C, (2, HH, WW))
    label[rng.rand(2, HH, WW) < 0.2] = 255
    label = jnp.asarray(label)
    want = cross_entropy_2d(upsample_bilinear_align_corners(logits, (HH, WW)), label)
    got = upsample_ce(logits, label, chunk_rows=8)
    assert abs(float(got) - float(want)) < 1e-4

    g_want = jax.grad(lambda l: cross_entropy_2d(
        upsample_bilinear_align_corners(l, (HH, WW)), label))(logits)
    g_got = jax.grad(lambda l: upsample_ce(l, label, chunk_rows=8))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-3, atol=1e-6)


def test_fused_degenerate_inputs_stay_finite():
    """All-ignored labels + tie-heavy uniform logits: every component and every
    gradient must stay finite (the masked means divide by max(count, 1))."""
    x1, x2, tp8, _, t1m, t2m = _inputs(3)
    label = jnp.full((1, HH, WW), 255, jnp.int32)
    x1u = jnp.zeros_like(x1)  # exact ties everywhere

    def total(a, b):
        m = _fused(a, b, tp8, label, t1m, t2m)
        return (m["loss_p1"] + m["loss_p2"] + m["loss_y1"] + m["loss_y2"]
                + m["place"] + m["anchor"])

    val, grads = jax.value_and_grad(total, argnums=(0, 1))(x1u, x2)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_fused_chunking_invariant_non_divisor():
    """A requested chunk_rows that does not divide H must still produce the exact
    same losses (the scan falls back to a divisor tile)."""
    args = _inputs(4)
    a = _fused(*args, chunk_rows=7)   # 7 does not divide 40
    b = _fused(*args, chunk_rows=8)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=2e-6,
                                   atol=1e-6, err_msg=k)
