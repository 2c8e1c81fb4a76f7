"""Simplex Noise Transition Matrix (NTM) modules — the core of SimT.

Functional re-design of ``sig_NTM`` / ``sig_W`` (model/deeplab_multi.py:244-286). Both are
tiny (34x19 / 34x34) learnable matrices; parameters are plain arrays in the train state and
the forward maps are pure functions, so they live inside the jitted train step.

Key translation (SURVEY.md §7 "hard parts"): the reference mutates ``sig_W``'s parameter
diagonal to -10000 in-place under ``no_grad`` on every forward (deeplab_multi.py:279-281).
Functionally we mask the *logits* instead — the diagonal branch of the ``where`` is a
constant, so no gradient flows to diagonal entries, and since the reference resets the
diagonal every forward anyway, the observable W values and all off-diagonal gradients are
identical.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "data", "assets", "class_dist")


def load_class_dist(name_or_path: str = "bapa") -> np.ndarray:
    """Load a 19-vector class-frequency prior (reference ClassDist/*.npy, used at
    model/deeplab_multi.py:255). Accepts a short name ('bapa', 'sfdaseg', ...) or a path."""
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(_ASSETS, f"ClassDist_{name_or_path}.npy")
    return np.load(path).astype(np.float32)


def ntm_init(
    rng: jax.Array, num_classes: int, open_classes: int = 0
) -> jax.Array:
    """sig_NTM parameter init: kaiming-normal fan_out/relu on a (C+O, C) matrix
    (deeplab_multi.py:248-252). For a 2-D tensor torch's fan_out is dim 0 (= C+O)."""
    total = num_classes + open_classes
    std = float(np.sqrt(2.0 / total))
    return std * jax.random.normal(rng, (total, num_classes), dtype=jnp.float32)


def ntm_forward(
    param: jax.Array, class_dist: jax.Array, num_classes: int, open_classes: int = 0
) -> jax.Array:
    """T = L1-normalise_rows( sigmoid(param) * tile(class_dist) + [I_C; 0] )
    (deeplab_multi.py:259-263). All terms are non-negative so the L1 norm is a row sum."""
    total = num_classes + open_classes
    identity_prior = jnp.concatenate(
        [jnp.eye(num_classes, dtype=jnp.float32),
         jnp.zeros((open_classes, num_classes), dtype=jnp.float32)],
        axis=0,
    )
    t = jax.nn.sigmoid(param.astype(jnp.float32))
    t = t * jnp.broadcast_to(class_dist.astype(jnp.float32), (total, num_classes))
    t = t + identity_prior
    # F.normalize(p=1, dim=1) divides by max(||row||_1, 1e-12).
    return t / jnp.maximum(jnp.sum(t, axis=1, keepdims=True), 1e-12)


def ntm_invert(t: np.ndarray, class_dist: np.ndarray, num_classes: int) -> np.ndarray:
    """Exact inverse of :func:`ntm_forward` — solve sigmoid params P such that
    ``normalize(sigmoid(P) * class_dist + [I; 0]) == t``.

    Used to PLANT a known transition matrix inside the representable family for
    identification experiments (tests/test_planted_noise.py,
    experiments/planted_noise_tpu/): recovery becomes an identification problem,
    not an approximation problem.

    Row k's free scale Z_k (the pre-normalisation row sum) must put every
    s_j = sigmoid(p_kj) in (0,1): known rows need Z in (1/t_kk, (1+cd_k)/t_kk)
    intersected with the off-diagonal caps Z < cd_j/t_kj; open rows need
    Z < min_j cd_j/t_kj. A mid-range Z is chosen per row; infeasibility (a planted
    leak above its structural cap cd_j) raises ValueError.
    """
    c = num_classes
    cd = np.asarray(class_dist, np.float64)
    total = t.shape[0]
    p = np.zeros((total, c), np.float64)
    for k in range(total):
        if k < c:
            lo = 1.0 / t[k, k]
            hi = (1.0 + cd[k]) / t[k, k]
            for j in range(c):
                if j != k and t[k, j] > 0:
                    hi = min(hi, cd[j] / t[k, j])
        else:
            lo, hi = 0.0, min(cd[j] / t[k, j] for j in range(c) if t[k, j] > 0)
        if not lo < hi:
            raise ValueError(f"row {k}: leak above structural cap (lo={lo}, hi={hi})")
        z = 0.5 * (lo + hi)
        s = t[k] * z / cd
        if k < c:
            s[k] = (t[k, k] * z - 1.0) / cd[k]
        eps = 1e-7
        s = np.clip(s, eps, 1 - eps)
        p[k] = np.log(s) - np.log1p(-s)
    return p.astype(np.float32)


def w_init(num_classes: int, open_classes: int = 0) -> jax.Array:
    """sig_W parameter init: constant 1/(classes-1) (deeplab_multi.py:269-272)."""
    total = num_classes + open_classes
    return jnp.full((total, total), 1.0 / (total - 1.0), dtype=jnp.float32)


def w_forward(param: jax.Array) -> jax.Array:
    """W = -I + row_softmax(param with diagonal masked to -10000)
    (deeplab_multi.py:278-286), with the in-place diagonal surgery made functional."""
    total = param.shape[0]
    eye = jnp.eye(total, dtype=jnp.bool_)
    logits = jnp.where(eye, -10000.0, param.astype(jnp.float32))
    w = jax.nn.softmax(logits, axis=1)
    return w - jnp.eye(total, dtype=jnp.float32)
