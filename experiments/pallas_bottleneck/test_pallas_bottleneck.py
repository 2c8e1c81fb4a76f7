"""Fused Pallas bottleneck (experiments/pallas_bottleneck) vs the plain-jnp reference.

Run from the repo root: python -m pytest experiments/pallas_bottleneck -q

Runs in interpret mode on CPU at small shapes; covers the forward values, the batch
stats, and every gradient (input, three conv kernels, six BN affine params) against
jax autodiff of the identical-math reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bottleneck import (
    fused_bottleneck,
    reference_bottleneck,
)


def _inputs(d, h=10, w=16, p=8, ct=32, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 10)
    x = jax.random.normal(ks[0], (h, w, ct), jnp.float32)
    w1 = jax.random.normal(ks[1], (ct, p), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[2], (3, 3, p, p), jnp.float32) * 0.1
    w3 = jax.random.normal(ks[3], (p, ct), jnp.float32) * 0.1
    g1 = 1.0 + 0.1 * jax.random.normal(ks[4], (p,), jnp.float32)
    b1 = 0.1 * jax.random.normal(ks[5], (p,), jnp.float32)
    g2 = 1.0 + 0.1 * jax.random.normal(ks[6], (p,), jnp.float32)
    b2 = 0.1 * jax.random.normal(ks[7], (p,), jnp.float32)
    g3 = 1.0 + 0.1 * jax.random.normal(ks[8], (ct,), jnp.float32)
    b3 = 0.1 * jax.random.normal(ks[9], (ct,), jnp.float32)
    return (x, w1, w2, w3, g1, b1, g2, b2, g3, b3)


@pytest.mark.parametrize("d", [1, 2, 4])
def test_fused_forward_matches_reference(d):
    args = _inputs(d)
    out, stats = fused_bottleneck(*args, d)
    ref_out, ref_stats = reference_bottleneck(*args, d)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        rtol=0, atol=2e-2)
    for got, want in zip(stats, ref_stats):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("d", [1, 2])
def test_fused_backward_matches_reference(d):
    args = _inputs(d, h=8, w=12, p=8, ct=16, seed=1)

    def loss_fused(*a):
        out, _ = fused_bottleneck(*a, d)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(*a):
        out, _ = reference_bottleneck(*a, d)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    names = ["x", "w1", "w2", "w3", "g1", "b1", "g2", "b2", "g3", "b3"]
    for n, a, b in zip(names, gf, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1e-3, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2 * scale,
                                   err_msg=f"grad {n}")


def test_fused_forward_odd_geometry():
    """65x129-style odd spatial sizes (ceil-mode stride-8) tile correctly."""
    args = _inputs(2, h=9, w=13, p=8, ct=16, seed=2)
    out, _ = fused_bottleneck(*args, 2)
    ref_out, _ = reference_bottleneck(*args, 2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        rtol=0, atol=2e-2)
