"""Pure NTM-game harness: evolve T under the exact SimT T-forces with no network.

Isolates the T-estimation subsystem of tools/trainV2_simt.py:327-435 — the inner
W-adversary loop (including the reference's uncleared-grad leak into T), the
anchor / convex / volume terms, and an *idealized best-case* fit + anchor signal:

  - anchors: every row anchored at the planted T*'s row every step (a perfect
    teacher read at a perfectly-confident student pixel — the upper bound of what
    the real anchor mechanism can deliver);
  - fit (loss_y): sum_c PI_c * CE(T*[c,:], T[c,:]) — the asymptotic noisy-label
    fit with a student that has already converged to the clean posterior.

Because both recovery forces are at their best case, a failure to recover T*
here is a property of the T-dynamics themselves, not of any fixture: whatever
flattens T in this game flattens it under every teacher/student.

Findings (see README.md in this directory, reproduced by `python tgame.py`):
  - reference-verbatim (quirk on, lambda_volume=1.0): T converges AWAY from T*
    to the class_dist-shaped smoothing attractor (dT ratio ~1.9);
  - either force alone (quirk on + volume 0, or quirk off + volume 1.0) does
    the same (~1.9);
  - quirk off + the reference's CODE-DEFAULT lambda_volume=0.1: T* recovered
    (dT ratio ~0.14 — volume minimization at moderate weight HELPS, the
    VolMinNet result the paper builds on);
  - the same holds at the reference's own geometry (C=19, O=3, ClassDist_bapa):
    verbatim dynamics give dT ratio ~2.6.

This is the measured basis for SimTConfig.clear_inner_t_grads and for the
planted-noise test's split assertions (tests/test_planted_noise.py).
"""

import argparse
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

if __package__ is None:  # direct execution
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from simt_tpu.models import ntm as ntm_lib


def toy_problem():
    """C=8/O=2 fixture: skewed priors (road-analog class 0), diagonal-dominant
    known rows with asymmetric leaks, flat open rows."""
    c, o = 8, 2
    pi = np.array([0.26, 0.16, 0.13, 0.11, 0.09, 0.07, 0.05, 0.05, 0.04, 0.04])
    t_star = np.array([
        [0.90, 0.04, 0.02, 0.01, 0.01, 0.01, 0.005, 0.005],
        [0.18, 0.74, 0.03, 0.02, 0.01, 0.01, 0.005, 0.005],
        [0.10, 0.03, 0.80, 0.03, 0.02, 0.01, 0.005, 0.005],
        [0.08, 0.02, 0.06, 0.78, 0.03, 0.02, 0.005, 0.005],
        [0.06, 0.02, 0.02, 0.04, 0.82, 0.02, 0.01, 0.01],
        [0.05, 0.02, 0.02, 0.02, 0.04, 0.83, 0.01, 0.01],
        [0.04, 0.02, 0.01, 0.01, 0.02, 0.02, 0.86, 0.02],
        [0.04, 0.02, 0.01, 0.01, 0.01, 0.01, 0.03, 0.87],
        [0.125] * 8,
        [0.125] * 8,
    ])
    return c, o, pi, t_star


def ref_problem():
    """The reference's own geometry: C=19, O=3, cd = ClassDist_bapa; a synthetic
    realistic T* (diag 0.8, leaks proportional to class frequency, open rows =
    the class marginal)."""
    c, o = 19, 3
    cd_ref = ntm_lib.load_class_dist("bapa").astype(np.float64)
    pi = np.concatenate([cd_ref, [0.03] * o])
    pi /= pi.sum()
    t_star = np.zeros((c + o, c))
    for k in range(c):
        leak = 0.2 * cd_ref / (cd_ref.sum() - cd_ref[k])
        t_star[k] = leak
        t_star[k, k] = 0.8
        t_star[k] /= t_star[k].sum()
    t_star[c:] = cd_ref / cd_ref.sum()
    return c, o, pi, t_star


def ntm_invert(t: np.ndarray, cd: np.ndarray, c: int) -> np.ndarray:
    """Exact inverse of ntm_forward (same construction as tests/test_planted_noise.py)."""
    total = t.shape[0]
    p = np.zeros((total, c), np.float64)
    for k in range(total):
        if k < c:
            lo, hi = 1.0 / t[k, k], (1.0 + cd[k]) / t[k, k]
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
        s = np.clip(s, 1e-7, 1 - 1e-7)
        p[k] = np.log(s) - np.log1p(-s)
    return p.astype(np.float32)


def run_game(c, o, pi, t_star, *, quirk=True, lam_volume=1.0, lam_convex=0.1,
             lam_anchor=1.0, lr_t=2.5e-2, steps=2000, inner_steps=10, seed=0,
             verbose=True):
    total = c + o
    cd = (pi @ t_star).astype(np.float32)
    # T* must be representable inside the sigmoid*cd + identity envelope;
    # ntm_invert raises if a planted leak exceeds its structural cap.
    p_star = ntm_invert(t_star, cd, c)
    chk = np.asarray(ntm_lib.ntm_forward(jnp.asarray(p_star), jnp.asarray(cd), c, o))
    assert np.abs(chk - t_star).max() < 1e-5

    cd_j = jnp.asarray(cd)
    t_star_j = jnp.asarray(t_star.astype(np.float32))
    pi_j = jnp.asarray(pi.astype(np.float32))
    adam = optax.adam(lr_t)

    def fwd(param):
        return ntm_lib.ntm_forward(param, cd_j, c, o)

    def volume(t):
        return jnp.log(jnp.sqrt(jnp.abs(jnp.linalg.det(t.T @ t))))

    def w_obj(wp, tp):
        return jnp.sum((ntm_lib.w_forward(wp) @ fwd(tp)) ** 2)

    def main_obj(tp, w_mat):
        t = fwd(tp)
        anchor = jnp.sum((t - t_star_j) ** 2)
        fit = -jnp.sum(pi_j[:, None] * t_star_j * jnp.log(t + 1e-12))
        convex = -jnp.sum((w_mat @ t) ** 2)
        return (lam_anchor * anchor + fit + lam_convex * convex
                + lam_volume * volume(t))

    @jax.jit
    def step(p, w, p_opt, w_opt):
        def body(_, carry):
            w, w_opt, gq = carry
            gw, gt = jax.grad(w_obj, argnums=(0, 1))(w, p)
            uw, w_opt = adam.update(gw, w_opt, w)
            return optax.apply_updates(w, uw), w_opt, gq + gt
        w, w_opt, g_quirk = jax.lax.fori_loop(
            0, inner_steps, body, (w, w_opt, jnp.zeros_like(p)))
        w_mat = jax.lax.stop_gradient(ntm_lib.w_forward(w))
        g = jax.grad(main_obj)(p, w_mat)
        if quirk:
            g = g + g_quirk
        up, p_opt = adam.update(g, p_opt, p)
        return optax.apply_updates(p, up), w, p_opt, w_opt

    p = ntm_lib.ntm_init(jax.random.PRNGKey(seed), c, o)
    w = ntm_lib.w_init(c, o)
    p_opt, w_opt = adam.init(p), adam.init(w)

    def dist(p):
        return float(np.abs(np.asarray(fwd(p)) - t_star).sum(1).mean())

    d0 = dist(p)
    for i in range(steps):
        p, w, p_opt, w_opt = step(p, w, p_opt, w_opt)
        if verbose and (i + 1) % max(1, steps // 5) == 0:
            print(f"  step {i + 1}: dT={dist(p):.4f}", flush=True)
    d1 = dist(p)
    return d0, d1, np.asarray(fwd(p))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr-t", type=float, default=2.5e-2)
    args = ap.parse_args()

    for name, prob in (("toy C=8/O=2", toy_problem()), ("reference C=19/O=3", ref_problem())):
        print(f"== {name} ==")
        for label, kw in (
            ("reference-verbatim (quirk, vol 1.0)", dict(quirk=True, lam_volume=1.0)),
            ("quirk only (vol 0)", dict(quirk=True, lam_volume=0.0)),
            ("vol 1.0 only (no quirk)", dict(quirk=False, lam_volume=1.0)),
            ("paper-faithful (no quirk, vol 0.1)", dict(quirk=False, lam_volume=0.1)),
        ):
            d0, d1, _ = run_game(*prob, steps=args.steps, lr_t=args.lr_t,
                                 verbose=False, **kw)
            print(f"  {label:40s} dT {d0:.3f} -> {d1:.3f} (ratio {d1 / d0:.2f})")


if __name__ == "__main__":
    main()
