"""Pallas fused eval head vs the unfused XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simt_tpu.ops import fast_hist, upsample_bilinear_align_corners


def _reference_hist(la, lb, gt, out_hw, c):
    ua = upsample_bilinear_align_corners(la[None], out_hw)[0]
    ub = upsample_bilinear_align_corners(lb[None], out_hw)[0]
    pred = jnp.argmax(ua + ub, axis=-1)
    return np.asarray(fast_hist(gt, pred, c))


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_hist_matches_unfused(seed, monkeypatch):
    # Run the kernel in interpreter mode (tests are on CPU).
    import simt_tpu.ops.pallas.eval_fused as ef
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(ef.pl, "pallas_call", interp_call)

    c = 19
    rng = np.random.RandomState(seed)
    la = jnp.asarray(rng.randn(9, 17, c).astype(np.float32) * 3)
    lb = jnp.asarray(rng.randn(11, 21, c).astype(np.float32) * 3)
    out_hw = (64, 128)
    gt = rng.randint(0, 40, (64, 128))
    gt[rng.rand(64, 128) < 0.2] = 255
    gt = jnp.asarray(gt)

    got = np.asarray(
        ef.multiscale_argmax_hist(la, lb, gt, out_hw=out_hw, num_classes=c,
                                  chunk_rows=16)
    )
    want = _reference_hist(la, lb, np.asarray(gt), out_hw, c)
    # f32 sum-order differences can flip near-tie argmaxes on a vanishing fraction.
    assert got.sum() == want.sum()
    assert np.abs(got - want).sum() <= 2, np.abs(got - want).sum()
