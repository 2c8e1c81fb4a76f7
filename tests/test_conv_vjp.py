"""Equivalence of the all-GEMM conv (ops/conv.py) against the conv primitive.

``dilated_conv3x3_taps`` re-expresses the forward AND both gradients as shifted-slice
MXU GEMMs; all three must match jax autodiff on ``conv_general_dilated`` to float
round-off for every dilation the model family uses (1, 2, 4 bottleneck; 6, 12 ASPP —
deeplab_multi.py:68-69,104-113). ``conv1x1`` likewise vs the strided 1x1 primitive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simt_tpu.ops.conv import conv1x1, dilated_conv3x3_taps


def _ref_conv(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("d", [1, 2, 4, 6, 12])
@pytest.mark.parametrize("shape", [(1, 16, 24, 8, 5), (2, 13, 17, 4, 3)])
def test_taps_conv_matches_autodiff(d, shape):
    """The all-GEMM variant: forward AND gradients vs the conv primitive."""
    b, h, w, c, o = shape
    k = jax.random.PRNGKey(100 + d)
    x = jax.random.normal(k, (b, h, w, c), jnp.float32)
    wk = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, c, o), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(k, 2), (b, h, w, o), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(dilated_conv3x3_taps(x, wk, d)),
        np.asarray(_ref_conv(x, wk, d)), rtol=1e-5, atol=1e-5)

    def pull(f):
        y, vjp = jax.vjp(lambda x_, w_: f(x_, w_), x, wk)
        return vjp(g)

    dx_c, dw_c = pull(lambda x_, w_: dilated_conv3x3_taps(x_, w_, d))
    dx_r, dw_r = pull(lambda x_, w_: _ref_conv(x_, w_, d))
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_c), np.asarray(dw_r),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv1x1_matches_primitive(stride):
    k = jax.random.PRNGKey(7)
    x = jax.random.normal(k, (2, 12, 10, 6), jnp.float32)
    wk = jax.random.normal(jax.random.fold_in(k, 1), (1, 1, 6, 9), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, wk, (stride, stride), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(conv1x1(x, wk, stride)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv_vjp_grad_through_composition():
    """Grad flows through BN-like epilogues identically (chain-rule placement)."""
    d = 2
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, 8, 8, 4), jnp.float32)
    wk = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 4, 4), jnp.float32)

    def loss(f, x, wk):
        y = f(x, wk)
        y = jax.nn.relu((y - y.mean((0, 1, 2))) / (y.std((0, 1, 2)) + 1e-5))
        return jnp.sum(y ** 2)

    g_c = jax.grad(loss, argnums=(1, 2))(
        lambda a, b: dilated_conv3x3_taps(a, b, d), x, wk)
    g_r = jax.grad(loss, argnums=(1, 2))(lambda a, b: _ref_conv(a, b, d), x, wk)
    for a, b in zip(g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_aspp_sum_wide_matches_tap_path():
    """aspp_sum_wide (merged-N head formulation) == per-branch tap sum, values and
    grads (grad reduction order differs -> float tolerance, not bitwise)."""
    import jax

    from simt_tpu.ops.conv import aspp_sum_wide, dilated_conv3x3_taps

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 9, 11, 16).astype(np.float32))
    ks = [jnp.asarray(rng.randn(3, 3, 16, 5).astype(np.float32)) for _ in range(2)]
    bs = [jnp.asarray(rng.randn(5).astype(np.float32)) for _ in range(2)]
    dils = [2, 3]

    def tap_path(x, ks, bs):
        out = None
        for k, b, d in zip(ks, bs, dils):
            y = dilated_conv3x3_taps(x, k, d).astype(jnp.float32) + b
            out = y if out is None else out + y
        return out

    def wide_path(x, ks, bs):
        return aspp_sum_wide(x, ks, bs, dils, dtype=jnp.float32)

    want = tap_path(x, ks, bs)
    got = wide_path(x, ks, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)

    def loss(fn):
        return lambda x, ks, bs: jnp.sum(fn(x, ks, bs).astype(jnp.float32) ** 2)

    g_want = jax.grad(loss(tap_path), argnums=(0, 1, 2))(x, ks, bs)
    g_got = jax.grad(loss(wide_path), argnums=(0, 1, 2))(x, ks, bs)
    for a, b in zip(jax.tree_util.tree_leaves(g_want),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-4)
