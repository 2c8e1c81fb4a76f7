"""Parity tests for align-corners bilinear resize against torch (the reference's
``nn.Upsample(align_corners=True)``, tools/trainV2_simt.py:300-301)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from simt_tpu.ops import upsample_bilinear_align_corners, upsample_bilinear_half_pixel


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((5, 9), (16, 32)),
        ((65, 129), (512, 1024)),  # the training interp geometry
        ((7, 7), (7, 7)),  # identity
        ((16, 16), (5, 3)),  # downsample
        ((1, 4), (8, 8)),  # degenerate single row
    ],
)
def test_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), out_hw))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_half_pixel_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 12, 4).astype(np.float32)
    got = np.asarray(upsample_bilinear_half_pixel(jnp.asarray(x), (32, 48)))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(32, 48), mode="bilinear"
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_is_differentiable():
    import jax

    x = jnp.ones((1, 4, 4, 2))
    g = jax.grad(lambda v: jnp.sum(upsample_bilinear_align_corners(v, (8, 8)) ** 2))(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
