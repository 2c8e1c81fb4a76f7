"""Pallas VMEM-resident SimT loss core vs the lax.scan core (interpret mode on CPU).

Same formulas, different accumulation order (wtile-major vs full-W rows), so values
and gradients are compared at float tolerances. Covers the full simt_loss_block
surface: the six scalar losses and the gradients wrt both heads' logits and both
transition matrices (the exact cotangents the train step consumes).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if __name__ == "__main__" or "pallas_alternates" not in sys.path[0]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simt_tpu.ops.fused_losses import simt_loss_block
from loss_fused import loss_block_pallas

C, O = 4, 2
TOTAL = C + O


def _fixture(seed, b=1, h8=9, w8=17, hh=64, ww=128):
    rng = np.random.RandomState(seed)
    x1 = rng.randn(b, h8, w8, TOTAL).astype(np.float32) * 2
    x2 = rng.randn(b, h8, w8, TOTAL).astype(np.float32) * 2
    tp = jax.nn.softmax(jnp.asarray(rng.randn(b, h8, w8, C) * 2), axis=-1)
    label = rng.randint(0, C, (b, hh, ww)).astype(np.int32)
    label[rng.rand(b, hh, ww) < 0.15] = 255
    t1 = jax.nn.softmax(jnp.asarray(rng.randn(TOTAL, C)), axis=-1)
    t2 = jax.nn.softmax(jnp.asarray(rng.randn(TOTAL, C)), axis=-1)
    return (jnp.asarray(x1), jnp.asarray(x2), tp, jnp.asarray(label),
            jnp.asarray(t1), jnp.asarray(t2))


def _losses(core, args, chunk_rows=16, wtile_kw=None):
    x1, x2, tp, label, t1, t2 = args
    fn = simt_loss_block if core == "scan" else loss_block_pallas
    return fn(
        x1, x2, tp, label, t1, t2,
        num_classes=C, open_classes=O,
        threshold_high=0.6, threshold_low=0.3,
        lambda_place=0.1, lambda_seg=0.1,
        ignore_label=255, chunk_rows=chunk_rows,
    )


KEYS = ("loss_p1", "loss_p2", "loss_y1", "loss_y2", "place", "anchor")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_core_values_match_scan(seed):
    args = _fixture(seed, b=2 if seed == 2 else 1)
    want = _losses("scan", args)
    got = _losses("pallas", args)
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=2e-5, atol=2e-6,
            err_msg=k,
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_core_grads_match_scan(seed):
    args = _fixture(seed)

    def total_loss(core, x1, x2, t1, t2):
        fn = simt_loss_block if core == "scan" else loss_block_pallas
        l = fn(
            x1, x2, args[2], args[3], t1, t2,
            num_classes=C, open_classes=O,
            threshold_high=0.6, threshold_low=0.3,
            lambda_place=0.1, lambda_seg=0.1,
            ignore_label=255, chunk_rows=16,
        )
        # The composition the train step differentiates (weights arbitrary
        # but fixed): every loss participates.
        return (l["loss_p1"] + 2.0 * l["loss_p2"] + 0.5 * l["loss_y1"]
                + l["loss_y2"] + l["place"] + 3.0 * l["anchor"])

    x1, x2, _, _, t1, t2 = args
    g_scan = jax.grad(lambda *a: total_loss("scan", *a), argnums=(0, 1, 2, 3))(
        x1, x2, t1, t2)
    g_pall = jax.grad(lambda *a: total_loss("pallas", *a), argnums=(0, 1, 2, 3))(
        x1, x2, t1, t2)
    for name, gs, gp in zip(("dx1", "dx2", "dt1", "dt2"), g_scan, g_pall):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gs), rtol=5e-5, atol=5e-6, err_msg=name,
        )


def test_pallas_core_all_ignored_labels_finite():
    args = list(_fixture(0))
    args[3] = jnp.full_like(args[3], 255)
    got = _losses("pallas", tuple(args))
    for k in KEYS:
        assert np.isfinite(np.asarray(got[k])), k
