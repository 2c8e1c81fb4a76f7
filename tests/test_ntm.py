"""NTM module parity tests (model/deeplab_multi.py:244-286)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from simt_tpu.models import ntm


def test_ntm_forward_matches_torch_math():
    c, o = 6, 4
    rng = np.random.RandomState(0)
    param = rng.randn(c + o, c).astype(np.float32)
    class_dist = np.abs(rng.rand(c).astype(np.float32))
    class_dist /= class_dist.sum()

    got = np.asarray(ntm.ntm_forward(jnp.asarray(param), jnp.asarray(class_dist), c, o))

    # Torch twin of deeplab_multi.py:259-263.
    t = torch.sigmoid(torch.from_numpy(param))
    cd = torch.from_numpy(np.tile(class_dist, (c + o, 1)))
    prior = torch.cat([torch.eye(c), torch.zeros(o, c)], 0)
    t = t.mul(cd) + prior
    want = torch.nn.functional.normalize(t, p=1, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_ntm_rows_are_simplex():
    c, o = 19, 15
    param = ntm.ntm_init(jax.random.PRNGKey(0), c, o)
    cd = jnp.asarray(ntm.load_class_dist("bapa"))
    t = ntm.ntm_forward(param, cd, c, o)
    assert t.shape == (c + o, c)
    np.testing.assert_allclose(np.asarray(t).sum(1), 1.0, atol=1e-5)
    assert float(jnp.min(t)) >= 0.0


def test_ntm_identity_prior_dominates_diagonal():
    # With the identity prior added before normalisation, known-class rows should put
    # the most mass on their own class initially.
    c, o = 19, 15
    param = ntm.ntm_init(jax.random.PRNGKey(1), c, o)
    cd = jnp.asarray(ntm.load_class_dist("bapa"))
    t = np.asarray(ntm.ntm_forward(param, cd, c, o))
    assert (t[:c].argmax(1) == np.arange(c)).all()


def test_w_forward_matches_torch_math():
    n = 10
    rng = np.random.RandomState(2)
    param = rng.randn(n, n).astype(np.float32)
    got = np.asarray(ntm.w_forward(jnp.asarray(param)))

    # Torch twin of deeplab_multi.py:278-286 (with the in-place diagonal surgery).
    w = torch.from_numpy(param.copy())
    ind = np.diag_indices(n)
    with torch.no_grad():
        w[ind[0], ind[1]] = -10000.0 * torch.ones(n)
    sm = torch.softmax(w, dim=1)
    want = (torch.zeros(n, n) - torch.eye(n) + sm).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_w_rows_sum_to_zero():
    w = ntm.w_forward(ntm.w_init(19, 15))
    np.testing.assert_allclose(np.asarray(w).sum(1), 0.0, atol=1e-5)


def test_w_grad_ignores_diagonal():
    # Gradient w.r.t. the parameter diagonal must be exactly zero — the functional
    # equivalent of the reference's per-forward diagonal reset.
    n = 6
    param = jnp.asarray(np.random.RandomState(3).randn(n, n).astype(np.float32))
    g = jax.grad(lambda p: jnp.sum(ntm.w_forward(p) ** 2))(param)
    np.testing.assert_allclose(np.asarray(jnp.diag(g)), 0.0, atol=1e-8)


def test_load_class_dist_assets():
    for name in ["bapa", "sfdaseg", "adapt", "dsp", "ltir"]:
        cd = ntm.load_class_dist(name)
        assert cd.shape == (19,)
        np.testing.assert_allclose(cd.sum(), 1.0, rtol=1e-3)
