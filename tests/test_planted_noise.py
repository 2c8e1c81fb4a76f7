"""Planted-noise recovery: semantic end-to-end proof of the SimT mechanism.

Every other correctness artifact in this repo (torch oracle, golden traces, parity
twins) proves "our step computes what the reference computes". This test proves
what the *training procedure itself* does: clean synthetic labels are corrupted
through a KNOWN (C+O)xC transition matrix T* — including open-set pixels labelled
as known classes, the exact noise model of the SimT paper — and a few hundred
tiny-geometry steps are run from a shared warm start in three arms: a plain-CE
control, the reference-VERBATIM mechanism, and the PAPER-FAITHFUL mode
(SimTConfig.clear_inner_t_grads=True + the reference's code-default
lambda_volume=0.1; see docs/PARITY.md "NTM identification"), plus an ORACLE arm
with T frozen at the planted T* that isolates the loss mechanism from the
T-estimation problem. The arms pin the full causal chain (400-step schedule,
seed 0 in the suite; deterministic for a fixed XLA config, but any single
trajectory is chaotic ACROSS configs — ~0.03 val / ~0.03 dTk drift between the
suite's 8-virtual-device environment and a plain single-device run). The
committed assertions are therefore ONLY the causal facts that held at every
measured (seed, env) point — seeds 0-3 suite-env + seed 0 single-device, via
experiments/ntm_identification/calibrate.py; table in that README — with
margins sized against the measured cross-env drift. Seed-0 numbers below
(suite env first, single-device in parens):

  (a) denoising (oracle arm): the forward-corrected loss resists label-noise
      memorization — train-clean mIoU 0.779 (0.788) vs the CE control's 0.896
      — while beating it on held-out clean val: 0.6967 vs 0.6716 (0.7046 vs
      0.7017). The margin is horizon-dependent: at a 1200-step schedule CE's
      val peaks then DECAYS as it memorizes per-cell feature draws
      (train 0.911), while the oracle arm holds = +0.047 over CE-at-budget,
      single-device measured (the fair protocol: noisy-label learning has no
      clean val to early-stop on). The long schedule is asserted by
      test_planted_noise_long (env-gate SIMT_PLANTED_LONG=1, ~80 min) and its
      captured runs are archived in experiments/ntm_identification/README.md.
  (b) paper-faithful vs verbatim T-dynamics: clearing the leak + code-default
      lambda_volume keeps the known rows of T substantially closer to the
      planted T* than the verbatim dynamics (seed 0: 0.286 -> 0.232 (0.199) vs
      verbatim's 0.286 -> 0.534 (0.533)) and resists the attractor pull that
      captures verbatim, at no val cost. FULL identification at this toy
      end-to-end scale is SEED-DEPENDENT and not asserted: seed 0 identifies
      (dTk falls 19-30%), seeds 1-2 do not (dTk flat or rising — the anchor
      pixels' realized teacher rows sit too far from T*'s rows, the same
      anchor-quality failure measured at reference geometry on the real chip,
      PLANTED_TPU_r05.json: anchors ~1.7 L1 from T*). The idealized-anchor
      game (experiments/ntm_identification/tgame.py) is where
      identification-vs-attractor is proven force-by-force; end-to-end, the
      seed-robust fact is the DIRECTION gap between the two modes.
  (c) verbatim dynamics converge to the PREDICTED class-frequency attractor
      T_ATTR (row_k -> (e_k + cd)/(1 + sum cd)) and away from T*, without
      collapsing the student. This is the pinned behaviour of the reference's
      uncleared inner-W T-gradient leak + headline lambda_volume=1.0, measured
      force-by-force in experiments/ntm_identification/ (idealized-anchor game:
      verbatim ratio 1.86-2.57 away from T* at toy AND reference geometry;
      paper-faithful 0.14-0.20 toward it) and corroborated by the reference's
      own logs (anchor loss pinned at ~8-15 for 250k steps, volume saturating —
      logs/BAPA_SimT_lr25.out).

Mechanism under test: tools/trainV2_simt.py:307-436 (teacher two-threshold
labelling, placeholder/open-set refinement, noisy-posterior loss through T, anchor
loss, W/convex/volume regularisers, the never-cleared inner-loop T-grad quirk) as
rebuilt in simt_tpu/train/simt.py. The reference's only empirical evidence for the
mechanism is its run logs; this fixture is the in-environment substitute for the
(data-blocked) real GTA5->Cityscapes parity run — see docs/PARITY.md.

Fixture design notes (each choice was forced by a measured failure mode):
  - Features are 3-channel Gaussians drawn ONCE PER 8x8 CELL (block-constant, the
    model's own output resolution) plus small per-pixel jitter. Per-PIXEL feature
    noise makes every cell separable — 64 iid draws average the within-class spread
    down 8x, a capable model then classifies every cell's clean class from its mean
    and plain CE is near-optimal no matter the label noise (measured round-4 failure
    mode: CE ~0.55, every SimT variant below it, even with an ORACLE T frozen at
    T*). With cell-level noise the (0,1) and (2,3) pairs OVERLAP at the decision
    resolution (means 1.2 sigma apart): a generalising CE learner converges to
    argmax_j sum_c p(c|x) T*[c,j], whose boundary the ASYMMETRIC planted noise
    (T*[1] leaks 0.16 to class 0 while T*[0] leaks 0.03 back) shifts ~0.3 sigma into
    class 1 — a real, irreducible mIoU loss that the forward-corrected loss_y
    removes: E_y[-log (T^T sm)_y | x] is minimised at sm = the CLEAN posterior.
  - The noisy label is y ~ Categorical(T*[clean cell]), ONE draw per cell broadcast
    over the 8x8 block — the SimT paper's noise model at the resolution the head
    predicts, so the planted T* is exactly the matrix the method estimates.
  - **The teacher posterior is the Bayes posterior of the NOISY label given the
    cell's features**: teacher(y|x) = sum_c p(c|x) T*[c,:], with p(c|x) the
    Gaussian-mixture posterior over all six generating classes — what a converged
    warmup network trained on the noisy labels produces (it is fed through the
    product's cached-posterior path, train/simt.py:247-252; a warmup net actually
    trained at this tiny scale stays underconfident — median max-prob 0.55, 50-70%
    of pixels misrouted to "unknown", measured — and its label quality poisons every
    arm). Teacher confidence is pixel-dependent: cluster cores are confident (clean
    argmax), pair boundaries fall in the ignore band, open-set pixels (flat T* rows,
    max 0.34) fall below threshold_low -> the "unknown" marker. At cluster cores
    p(c|x) ~= 1 so the anchor rows (most-confident pixel per channel) equal T*'s
    rows EXACTLY — the paper's anchor-point assumption emerges instead of being
    hand-planted.
  - ``class_dist`` is the EXACT noisy-label marginal sum_c pi_c T*[c,:] (what
    tools/compute_class_distribution.py would measure on the corrupted data). It is
    load-bearing twice over: in ``T = normalize(sigmoid(p)*class_dist + I)``
    (models/ntm.py) the off-diagonal mass of row k is structurally bounded by the
    class frequencies (with cd = ones(C) the accumulated inner-W "quirk" T-gradient
    — measured ~8x the anchor grad at init — flattens every row and NO lambda
    setting recovers T*), and the planted leaks must sit INSIDE those bounds for T*
    to be representable at all.
  - T* is planted inside the representable family by EXACT closed-form inversion:
    P* = ntm_invert(T*, cd) with ntm_forward(P*) == T* to float precision, so
    recovery is an identification problem, not an approximation problem.
  - The two open-set rows of T* are IDENTICAL. Which open CHANNEL the student
    assigns to which open feature cluster is arbitrary (fresh heads — the labelling
    is only identifiable up to open-channel permutation); identical target rows make
    the T-recovery metric permutation-invariant.
  - lr_t = 10x lr, the reference's own ratio (sh_simt.sh:17, lr_T = 10x lr).
"""

import os

import jax
import pytest

if __name__ == "__main__":  # hermetic CPU when run directly (conftest covers pytest)
    import pathlib
    import sys

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
from simt_tpu.models import ntm as ntm_lib
from simt_tpu.models.resnet_multi import ResNetMulti
from simt_tpu.ops.metrics import fast_hist_np, per_class_iu
from simt_tpu.train import (
    create_simt_state,
    create_warmup_state,
    make_simt_step,
    make_warmup_step,
)

C, O = 4, 2
TOTAL = C + O
HW = (64, 128)  # full resolution; class-map cells are 8x8 blocks
G = (HW[0] // 8, HW[1] // 8)
# The dilated-ResNet stride-8 output grid (H/8+1, like the reference's 65x129 at
# 512x1024); teacher posteriors live on this grid.
G8 = (HW[0] // 8 + 1, HW[1] // 8 + 1)

# Clean-class priors: class 0 dominates mildly (the road-class analog), opens are
# rare. Near-balanced known priors are load-bearing: with pi_0 = 2 x pi_1 the Bayes
# teacher's class-1 confidence at a TYPICAL class-1 core tops out at
# 0.78 * p(1|x) ~= 0.6 and the two-threshold scheme starves class 1 of loss_p
# supervision entirely (measured round-4 failure mode).
PI = np.array([0.22, 0.18, 0.22, 0.18, 0.10, 0.10], dtype=np.float32)

# Planted transition matrix: rows = clean class (incl. 2 open), cols = noisy label.
# Known rows diagonal-dominant with asymmetric pair leaks; open rows identical
# (see docstring) and flat (max 0.34 < threshold_low routes them to "unknown").
T_STAR = np.array(
    [
        [0.92, 0.03, 0.03, 0.02],
        [0.18, 0.78, 0.025, 0.015],
        [0.03, 0.03, 0.90, 0.04],
        [0.03, 0.02, 0.18, 0.77],
        [0.06, 0.34, 0.32, 0.28],
        [0.06, 0.34, 0.32, 0.28],
    ],
    dtype=np.float32,
)

# The noisy-label marginal — what compute_class_distribution.py would output.
CLASS_DIST = (PI @ T_STAR).astype(np.float32)

# The attractor of the reference-verbatim T-dynamics (docs/PARITY.md "NTM
# identification", measured in experiments/ntm_identification/): the uncleared
# inner-W T-gradient leak and the headline lambda_volume=1.0 each drive every
# sigmoid toward saturation, where row_k -> (e_k + cd) / (1 + sum(cd)).
T_ATTR = np.concatenate(
    [np.eye(C, dtype=np.float32), np.zeros((O, C), np.float32)], axis=0
)
T_ATTR = (T_ATTR + CLASS_DIST) / (1.0 + CLASS_DIST.sum())


# Exact closed-form inversion of the NTM parameterisation (models/ntm.py::ntm_invert).
P_STAR = ntm_lib.ntm_invert(T_STAR, CLASS_DIST, C)
# Representability is exact by construction; guard the fixture against drift.
np.testing.assert_allclose(
    np.asarray(ntm_lib.ntm_forward(jnp.asarray(P_STAR), jnp.asarray(CLASS_DIST), C, O)),
    T_STAR, atol=1e-5,
)

# Class feature means (3 channels, sigma = 1): (0,1) and (2,3) overlap along ch0 at
# 2 sigma separation; open classes live on ch2, 3 sigma from every known class.
MEANS = np.array(
    [
        [+1.0, +2.0, 0.0],
        [-1.0, +2.0, 0.0],
        [+1.0, -2.0, 0.0],
        [-1.0, -2.0, 0.0],
        [0.0, 0.0, +3.0],
        [0.0, 0.0, -3.0],
    ],
    dtype=np.float32,
)

# threshold_high = 0.60 is the boundary-UNBIASED choice for this T*: conf labels
# appear only where the clean argmax is already clear (class 0: needs p(0|x) > 0.57;
# class 1: p(1|x) > 0.73), so the teacher never plants shifted-boundary labels,
# while typical class-1 cores (p(1|x) ~ 0.8) still clear it. At 0.70 the asymmetric
# row maxima (0.92 vs 0.78) starve class 1 (measured).
THRESH_HIGH = 0.60
THRESH_LOW = 0.40  # open rows (max 0.34) land below -> "unknown" marker


CELL = 8  # noise/feature cell = the model's stride-8 output resolution
# Clean-class regions are REGION x REGION cells. The align-corners teacher upsample
# blends the 4 grid nodes around every pixel, i.e. adjacent CELLS' posteriors; with
# a fully random cell layout no pixel has agreeing neighbours and the two-threshold
# scheme routes almost everything to the ignore band. Same-class 2x2 regions (like
# real segmentation masks' contiguous objects) keep region cores confident.
REGION = 2
SIGMA = 1.0  # per-cell within-class feature sigma
JITTER = 0.25  # per-pixel feature jitter on top of the cell draw


def _bayes_teacher(cell_feat: np.ndarray) -> np.ndarray:
    """p(noisy label | cell feature) = sum_c p(c|f) T*[c,:] — the converged-warmup
    teacher (see the docstring's teacher note)."""
    d2 = ((cell_feat[..., None, :] - MEANS) ** 2).sum(-1)
    logp = np.log(PI) - 0.5 * d2 / SIGMA**2
    logp -= logp.max(-1, keepdims=True)
    p = np.exp(logp)
    p /= p.sum(-1, keepdims=True)
    return (p @ T_STAR).astype(np.float32)


def _make_clean8(rng: np.random.RandomState) -> np.ndarray:
    """Stride-8 clean class map: REGIONxREGION-cell same-class regions ~
    Categorical(PI), every class present."""
    g_r = (G[0] // REGION, G[1] // REGION)
    while True:
        m = rng.choice(TOTAL, size=g_r, p=PI)
        if len(np.unique(m)) == TOTAL:
            return np.repeat(np.repeat(m, REGION, axis=0), REGION, axis=1)


def _make_example(rng: np.random.RandomState):
    """One (image, clean_full, noisy_label, teacher_prob8) example."""
    clean8 = _make_clean8(rng)
    clean = np.repeat(np.repeat(clean8, CELL, axis=0), CELL, axis=1)  # (H, W)
    # Features drawn ONCE PER CELL (+ small per-pixel jitter): per-PIXEL draws let
    # the stride-8 head average 64 iid samples per decision, making every cell
    # separable and plain CE near-optimal (measured failure mode, docstring).
    cell_feat = (MEANS[clean8] + SIGMA * rng.randn(*G, 3)).astype(np.float32)
    image = np.repeat(np.repeat(cell_feat, CELL, axis=0), CELL, axis=1)
    image = image + JITTER * rng.randn(*HW, 3).astype(np.float32)
    # Per-PIXEL noisy pseudo-label ~ Categorical(T*[clean]): 64 INDEPENDENT draws
    # per cell. This is load-bearing against a measured failure mode: with ONE draw
    # per cell (per-cell noise), memorizing the flipped label is pointwise optimal
    # even THROUGH the planted T — -log(T^T sm)_y is always minimized by
    # sm = onehot(argmax_c T[c,y]) = onehot(y) for a diagonal-dominant T — so the
    # SimT student memorized right alongside the CE control (both train-clean 0.75
    # vs a 0.99 clean-label ceiling). Forward correction's anti-noise property
    # lives in the EXPECTATION over y|x: the stride-8 head cannot sub-divide a
    # block-constant cell, so each cell's one prediction faces ~64 iid draws of
    # T*[clean], making CE's per-cell optimum the (boundary-shifted) noisy
    # posterior while loss_y's optimum is the CLEAN posterior.
    u = rng.rand(*HW, 1)
    cdf = np.cumsum(T_STAR[clean], axis=-1)
    noisy = np.sum(u > cdf, axis=-1).astype(np.int32)  # inverse-CDF per pixel
    # Bayes teacher posterior on the stride-8 output grid (G8 nodes): node (i, j)
    # sits at pixel (8i, 8j), the corner of cell (i, j) — clamp the last node row/col.
    ii = np.minimum(np.arange(G8[0]), G[0] - 1)
    jj = np.minimum(np.arange(G8[1]), G[1] - 1)
    tprob = _bayes_teacher(cell_feat[np.ix_(ii, jj)])
    return image.astype(np.float32), clean, noisy, tprob


def make_dataset(n: int, batch: int, seed: int):
    """n batches of size `batch`; returns list of dicts + clean full-res labels."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        ims, cls, nys, tps = zip(*[_make_example(rng) for _ in range(batch)])
        out.append(
            {
                "image": jnp.asarray(np.stack(ims)),
                "label": jnp.asarray(np.stack(nys)),
                # The product's cached-posterior path (train/simt.py:247-252)
                # consumes this; the warmup/CE steps ignore it.
                "teacher_prob8": jnp.asarray(np.stack(tps)),
                "_clean": np.stack(cls),
            }
        )
    return out


def tiny(openset: bool) -> ResNetMulti:
    return ResNetMulti(
        num_classes=C,
        open_classes=O if openset else 0,
        openset=openset,
        layers=(1, 1, 1, 1),
        dtype=jnp.float32,
    )


def make_cfg(tmp_path, stage: str, steps: int, lr: float, lr_t: float,
             **simt_kw) -> TrainConfig:
    cd_path = str(tmp_path / "cd.npy")
    np.save(cd_path, CLASS_DIST)
    return TrainConfig(
        stage=stage,
        model=ModelConfig(num_classes=C, open_classes=O, openset=stage == "simt",
                          compute_dtype="float32"),
        optim=OptimConfig(num_steps=steps, learning_rate=lr, learning_rate_t=lr_t),
        simt=SimTConfig(**{**dict(class_dist=cd_path, threshold_high=THRESH_HIGH,
                                  threshold_low=THRESH_LOW, inner_w_steps=10),
                           **simt_kw}),
    )


def transfer_params(src_tree, dst_tree):
    """Copy every leaf whose path+shape matches (warmup -> open-set student: the
    whole backbone and the closed-set heads transfer; layer5_1/layer6_1 stay fresh).
    Mirrors the reference's partial state_dict load between stages."""
    import flax.traverse_util as tu

    src = tu.flatten_dict(src_tree)
    dst = dict(tu.flatten_dict(dst_tree))
    for k, v in src.items():
        if k in dst and dst[k].shape == v.shape:
            dst[k] = v
    return tu.unflatten_dict(dst)


def clean_miou(logits_fn, variables, batches) -> float:
    """mIoU over the C known classes vs CLEAN labels at FULL resolution: the
    stride-8 logits are upsampled align-corners and argmaxed over the first C
    channels — the [:, :19] eval-protocol analog (eval/evaluate.py)."""
    hist = np.zeros((C, C), np.int64)
    for b in batches:
        pred = np.asarray(logits_fn(variables, b["image"]))  # (B, H, W)
        clean = b["_clean"]
        mask = clean < C  # known-class pixels only
        hist += fast_hist_np(clean[mask], pred[mask], C)
    return float(np.nanmean(per_class_iu(hist)))


def t_distance(t_param, class_dist, rows=None, target=None) -> float:
    """Mean row-wise L1 distance between the realised T and ``target`` (default
    the planted T*; pass T_ATTR to measure convergence to the verbatim-dynamics
    attractor).

    rows=slice(0, C) restricts to the known rows. The open rows stay
    unidentified at this scale (measured: open-row L1 vs T* stays ~0.8 in every
    arm): the anchor target for an open channel is the teacher posterior at the
    FRESH open head's most-confident pixel, which early in training is an
    arbitrary pixel rather than an open-cluster core, so the open-row anchor is
    unreliable — identification claims cover known rows only."""
    t = np.asarray(ntm_lib.ntm_forward(t_param, jnp.asarray(class_dist), C, O))
    d = np.abs(t - (T_STAR if target is None else target)).sum(axis=1)
    if rows is not None:
        d = d[rows]
    return float(d.mean())


# The paper-faithful T-configuration (docs/PARITY.md "NTM identification"):
# clear the reference's uncleared inner-W T-gradient leak, and use the
# reference's CODE-DEFAULT lambda_volume=0.1 instead of the headline launcher's
# 1.0 (measured in experiments/ntm_identification/: either verbatim force alone
# prevents identification; this pair recovers a planted T* at both toy and
# reference geometry).
PAPER_KW = dict(clear_inner_t_grads=True, lambda_volume=0.1)


def run_experiment(tmp_path, warmup_steps=50, train_steps=400, batch=2,
                   n_batches=6, lr=2.5e-3, lr_t=2.5e-2, seed=0, verbose=False,
                   arms=None):
    """Shared warmup + plain-CE control, then one SimT arm per entry of ``arms``
    (name -> dict(simt_kw=..., oracle_t=..., lr_t=...)); returns the control
    metrics plus one result dict per arm."""
    arms = arms if arms is not None else {
        "verbatim": {},
        "paper": dict(simt_kw=PAPER_KW),
        "oracle": dict(oracle_t=True, lr_t=0.0),
    }
    train_data = make_dataset(n_batches, batch, seed=seed)
    val_data = make_dataset(2, 2, seed=seed + 10_000)
    class_dist = CLASS_DIST

    # ---- stage 0: shared warmup on the NOISY labels (closed-set model) ----
    wcfg = make_cfg(tmp_path, "warmup", warmup_steps + train_steps, lr, lr_t)
    wmodel = tiny(False)
    wvars = wmodel.init(jax.random.PRNGKey(seed), jnp.zeros((1, *HW, 3)), False)
    wstate = create_warmup_state(wmodel, wvars, wcfg)
    wstep = make_warmup_step(wmodel, wcfg)
    for i in range(warmup_steps):
        wstate, wm = wstep(wstate, train_data[i % n_batches])
    warm_params, warm_stats = wstate.model.params, wstate.model.batch_stats

    from simt_tpu.ops.interp import upsample_bilinear_align_corners as up

    def make_eval(model):
        return jax.jit(lambda v, x: jnp.argmax(
            up(model.apply(v, x, False)[1].astype(jnp.float32), HW)[..., :C],
            axis=-1))

    eval_closed = make_eval(wmodel)

    # ---- arm A: plain-CE control, continued on the same noisy labels ----
    ce_state = wstate
    for i in range(train_steps):
        ce_state, cem = wstep(ce_state, train_data[(warmup_steps + i) % n_batches])
        if verbose and (i + 1) % 100 == 0:
            cv = {"params": ce_state.model.params,
                  "batch_stats": ce_state.model.batch_stats}
            print(f"  ce step {i+1}: train-clean mIoU="
                  f"{clean_miou(eval_closed, cv, train_data):.4f} val="
                  f"{clean_miou(eval_closed, cv, val_data):.4f}", flush=True)
    ce_vars = {"params": ce_state.model.params,
               "batch_stats": ce_state.model.batch_stats}
    # The denoising metric is clean-label mIoU on HELD-OUT draws (val): the CE
    # control partially MEMORIZES — each cell's feature vector is a unique random
    # draw the net can key on, so CE reaches ~0.90 train-clean while its val stays
    # at the noisy-posterior boundary shift; the T-corrected loss resists
    # memorization (≈0.79 train) and generalizes past it (measured: oracle-T val
    # 0.712 vs CE 0.674). Train-clean is reported for the memorization-gap story.
    miou_ce = clean_miou(eval_closed, ce_vars, train_data)
    miou_ce_val = clean_miou(eval_closed, ce_vars, val_data)

    def run_simt_arm(name, simt_kw=None, oracle_t=False, lr_t=lr_t):
        """One SimT arm from the shared warm start."""
        scfg = make_cfg(tmp_path, "simt", train_steps, lr, lr_t, **(simt_kw or {}))
        student = tiny(True)
        svars = student.init(jax.random.PRNGKey(seed + 1),
                             jnp.zeros((1, *HW, 3)), False)
        svars = {
            "params": transfer_params(warm_params, svars["params"]),
            "batch_stats": transfer_params(warm_stats, svars["batch_stats"]),
        }
        # Batches carry the Bayes teacher posterior (docstring: a warmup net
        # actually trained at this tiny scale is too underconfident to supervise
        # anything), so the step takes the product's cached-posterior path
        # (train/simt.py:247-252) and the teacher network below is never applied.
        tvars = {"params": warm_params, "batch_stats": warm_stats}
        sstate = create_simt_state(svars, tvars, scfg, jax.random.PRNGKey(seed + 3))
        if oracle_t:
            # Diagnostic mode: freeze T1/T2 at the planted T* (P* in param
            # space) — combined with lr_t=0 this isolates the student-arm
            # dynamics from the T-estimation problem.
            sstate = sstate.replace(
                t1=sstate.t1.replace(param=jnp.asarray(P_STAR)),
                t2=sstate.t2.replace(param=jnp.asarray(P_STAR)),
            )
        sstep = make_simt_step(student, tiny(False), scfg)

        eval_open = make_eval(student)
        # Diagnostic: softmax mass on the O open channels (q-dilution checks).
        open_mass = jax.jit(lambda v, x: jax.nn.softmax(
            up(student.apply(v, x, False)[1].astype(jnp.float32), HW), axis=-1
        )[..., C:].sum(-1))
        known = slice(0, C)

        def dists(st):
            return {
                "t_dist": 0.5 * (t_distance(st.t1.param, class_dist)
                                 + t_distance(st.t2.param, class_dist)),
                "t_dist_known": 0.5 * (
                    t_distance(st.t1.param, class_dist, known)
                    + t_distance(st.t2.param, class_dist, known)),
                "t_attr_known": 0.5 * (
                    t_distance(st.t1.param, class_dist, known, T_ATTR)
                    + t_distance(st.t2.param, class_dist, known, T_ATTR)),
            }

        d0 = dists(sstate)
        for i in range(train_steps):
            sstate, sm = sstep(sstate, train_data[(warmup_steps + i) % n_batches])
            if verbose and (i + 1) % 100 == 0:
                d = dists(sstate)
                t1r = np.asarray(ntm_lib.ntm_forward(
                    sstate.t1.param, jnp.asarray(class_dist), C, O))
                comps = " ".join(
                    f"{k}={float(sm[k]):.3f}"
                    for k in ("loss_seg_p", "loss_seg_y", "convex", "volume",
                              "anchor", "place"))
                sv = {"params": sstate.model.params,
                      "batch_stats": sstate.model.batch_stats}
                b0 = train_data[0]
                om = np.asarray(open_mass(sv, b0["image"]))
                # Anchor-target diagnostic: teacher posterior at each known
                # channel's max-logit pixel vs the planted T* row.
                lg2 = np.asarray(up(student.apply(
                    sv, b0["image"], False)[1].astype(jnp.float32), HW))
                tp = np.asarray(up(b0["teacher_prob8"].astype(jnp.float32), HW))
                aidx = lg2.reshape(-1, TOTAL).argmax(0)
                arows = tp.reshape(-1, C)[aidx]
                aerr = np.abs(arows[:C] - T_STAR[:C]).sum(1)
                print(f"  {name} anchor-row L1 err vs T*: "
                      + " ".join(f"{e:.2f}" for e in aerr), flush=True)
                print(f"  {name} step {i+1}: loss={float(sm['loss']):.3f} "
                      f"dTk={d['t_dist_known']:.3f} "
                      f"dAttrK={d['t_attr_known']:.3f} "
                      f"T[1,0]={t1r[1,0]:.3f} (T*={T_STAR[1,0]:.3f}) train-clean="
                      f"{clean_miou(eval_open, sv, train_data):.4f} openmass(k/o)="
                      f"{float(om[b0['_clean'] < C].mean()):.3f}/"
                      f"{float(om[b0['_clean'] >= C].mean()):.3f} {comps}",
                      flush=True)
        d1 = dists(sstate)

        simt_vars = {"params": sstate.model.params,
                     "batch_stats": sstate.model.batch_stats}
        return {
            "miou_simt": clean_miou(eval_open, simt_vars, train_data),
            "miou_simt_val": clean_miou(eval_open, simt_vars, val_data),
            **{k + "_init": v for k, v in d0.items()},
            **{k + "_final": v for k, v in d1.items()},
            "t1": np.asarray(ntm_lib.ntm_forward(
                sstate.t1.param, jnp.asarray(class_dist), C, O)),
        }

    out = {
        "miou_ce": miou_ce,
        "miou_ce_val": miou_ce_val,
    }
    for name, akw in arms.items():
        out[name] = run_simt_arm(name, **akw)
    return out


def _strip_t1(r):
    return {k: ({kk: vv for kk, vv in v.items() if kk != "t1"}
                if isinstance(v, dict) else v) for k, v in r.items()}


def test_planted_noise_recovery(tmp_path):
    # Every assertion below is a causal fact that held at EVERY measured
    # (seed, environment) point — seeds 0-3 in the suite's 8-virtual-device env
    # plus seed 0 single-device (experiments/ntm_identification/calibrate.py;
    # table in that directory's README) — with the stated worst-case margin,
    # sized against the measured ~0.03 val / ~0.03 dT cross-environment drift
    # of any single trajectory. No recalibration on XLA/env changes should be
    # needed; if one trips, re-run calibrate.py and check whether the FACT
    # broke or only a margin.
    r = run_experiment(tmp_path)
    v, p, o = r["verbatim"], r["paper"], r["oracle"]
    ctx = _strip_t1(r)

    # (a) Denoising, oracle arm: the T-corrected loss resists memorizing the
    # noisy labels (train-clean gap vs CE >= 0.09 at every point) while staying
    # at-or-above CE on held-out val (worst margin +0.003, single-device seed
    # 0) and decisively above the learned-T students (worst +0.042) — the
    # outright +0.047 val win over CE at the memorization horizon is asserted
    # by test_planted_noise_long (1200-step schedule, env-gated).
    assert o["miou_simt"] < r["miou_ce"] - 0.05, ctx
    assert o["miou_simt_val"] > r["miou_ce_val"] - 0.02, ctx
    assert o["miou_simt_val"] > v["miou_simt_val"] + 0.01, ctx

    # (b) Paper-faithful T-dynamics vs verbatim: clearing the inner-loop
    # T-grad leak + code-default lambda_volume keeps T substantially closer to
    # the planted T* (worst gap 0.112) and away from the attractor (worst gap
    # +0.046) than the verbatim dynamics, at no val cost (paper-minus-verbatim
    # val: worst +0.004, best +0.028). FULL identification is seed-dependent
    # (docstring: anchor quality) and is NOT asserted — seed 0 identifies
    # (dTk 0.286 -> 0.232); the idealized-anchor game proves the dynamics
    # force-by-force (experiments/ntm_identification/tgame.py).
    assert p["t_dist_known_final"] < v["t_dist_known_final"] - 0.05, ctx
    assert p["t_attr_known_final"] > v["t_attr_known_final"] + 0.015, ctx
    assert p["miou_simt_val"] > v["miou_simt_val"] - 0.03, ctx

    # (c) Reference-verbatim dynamics: T converges to the predicted
    # class-frequency attractor (docs/PARITY.md "NTM identification") — toward
    # T_ATTR (worst final/init ratio 0.30 vs the 0.5 bound) and away from T*
    # (worst move +0.248 vs the 0.1 bound) — while the student does not
    # collapse (worst val vs CE -0.039, vs the -0.07 collapse bound).
    assert v["t_attr_known_final"] < 0.5 * v["t_attr_known_init"], ctx
    assert v["t_dist_known_final"] > v["t_dist_known_init"] + 0.1, ctx
    assert v["miou_simt_val"] > r["miou_ce_val"] - 0.07, ctx


@pytest.mark.skipif(
    not os.environ.get("SIMT_PLANTED_LONG"),
    reason="~30-45 min on the 1-core CPU host; set SIMT_PLANTED_LONG=1 to run. "
    "Captured runs (single-device AND suite-env, both green 2026-08-20) archived "
    "in experiments/ntm_identification/README.md.",
)
def test_planted_noise_long(tmp_path):
    """The memorization-horizon schedule (1200 steps): CE's val peaks ~0.702 at
    step 400 then decays to 0.674 as it memorizes (train 0.911); the oracle arm
    holds 0.7207 — the headline denoising margin. Measured (seed 0,
    single-device run; archived in experiments/ntm_identification/README.md):
      CE       train 0.9108  val 0.6741
      verbatim val 0.6661  dTk 0.286->0.558  dAttrK 0.248->0.099
      paper    val 0.6680  dTk 0.286->0.367
      oracle   train 0.7959  val 0.7207
    """
    r = run_experiment(tmp_path, train_steps=1200)
    v, p, o = r["verbatim"], r["paper"], r["oracle"]
    ctx = _strip_t1(r)

    # Denoising at budget: SimT with the true T beats the CE control outright
    # (measured margin +0.047).
    assert o["miou_simt_val"] > r["miou_ce_val"] + 0.02, ctx
    assert o["miou_simt"] < r["miou_ce"] - 0.08, ctx
    # Identification and attractor claims survive the long schedule.
    assert p["t_dist_known_final"] < 0.80 * v["t_dist_known_final"], ctx
    assert v["t_attr_known_final"] < 0.5 * v["t_attr_known_init"], ctx
    assert v["t_dist_known_final"] > v["t_dist_known_init"], ctx


if __name__ == "__main__":
    import pathlib
    import sys
    import tempfile

    kw = dict(verbose=True)
    if "--quick" in sys.argv:
        kw.update(warmup_steps=50, train_steps=150)
    if "--long" in sys.argv:
        kw.update(train_steps=1200, arms={
            "verbatim": {},
            "paper": dict(simt_kw=PAPER_KW),
            "oracle": dict(oracle_t=True, lr_t=0.0),
        })
    if "--all3" in sys.argv:  # the committed test's arms at the default schedule
        kw.update(arms={
            "verbatim": {},
            "paper": dict(simt_kw=PAPER_KW),
            "oracle": dict(oracle_t=True, lr_t=0.0),
        })
    if "--oracle" in sys.argv:
        kw.update(arms={"oracle": dict(oracle_t=True, lr_t=0.0)})
    elif "--paper" in sys.argv:
        kw.update(arms={"paper": dict(simt_kw=PAPER_KW)})
    elif "--verbatim" in sys.argv:
        kw.update(arms={"verbatim": {}})
    with tempfile.TemporaryDirectory() as d:
        r = run_experiment(pathlib.Path(d), **kw)
    print({k: round(v, 4) for k, v in r.items() if not isinstance(v, dict)})
    for name in r:
        if not isinstance(r[name], dict):
            continue
        arm = dict(r[name])
        t1 = arm.pop("t1")
        print(name, {k: round(v, 4) for k, v in arm.items()})
        print(f"{name} learned T1 rows:\n", np.round(t1, 3))
    print("planted T* rows:\n", T_STAR)
    print("verbatim attractor rows:\n", np.round(T_ATTR, 3))
