"""Pallas implicit-GEMM 3x3 conv vs XLA conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conv3x3 import dilated_conv3x3


def _xla(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("d,h,w,cin,cout", [
    (1, 8, 16, 4, 4), (2, 12, 20, 8, 16), (4, 16, 12, 8, 8), (2, 13, 10, 3, 5),
])
def test_forward_matches_xla(d, h, w, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    got = dilated_conv3x3(x, k, d)
    want = _xla(x, k, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_gradients_match_xla():
    d = 2
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 14, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 6, 8).astype(np.float32) * 0.1)

    def loss_p(x, k):
        return jnp.sum(dilated_conv3x3(x, k, d) ** 2)

    def loss_x(x, k):
        return jnp.sum(_xla(x, k, d) ** 2)

    gx, gk = jax.grad(loss_p, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_x, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk2), rtol=1e-3, atol=1e-3)


# (A former test asserted the product's SIMT_PALLAS_CONV gate was off by default;
# the gate was removed entirely in round 5 — the product path is always the
# shifted-slice GEMM formulation in simt_tpu/ops/conv.py.)
