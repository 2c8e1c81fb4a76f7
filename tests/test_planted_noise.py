"""Planted-noise recovery: semantic end-to-end proof that the SimT mechanism works.

Every other correctness artifact in this repo (torch oracle, golden traces, parity
twins) proves "our step computes what the reference computes". This test proves the
*training procedure itself* denoises: clean synthetic labels are corrupted through a
KNOWN (C+O)xC transition matrix T* — including open-set pixels labelled as known
classes, the exact noise model of the SimT paper — and after a few hundred
tiny-geometry steps we assert

  (a) the learned transition matrices move toward the planted T* (mean row-wise L1
      distance shrinks well below its value at init), and
  (b) the SimT student's mIoU on CLEAN labels beats a plain-CE control trained on the
      same corrupted labels from the same warm start.

Mechanism under test: tools/trainV2_simt.py:307-436 (teacher two-threshold labelling,
placeholder/open-set refinement, noisy-posterior loss through T, anchor loss, W/convex/
volume regularisers, the never-cleared inner-loop T-grad quirk) as rebuilt in
simt_tpu/train/simt.py. The reference's only empirical evidence for the mechanism is
its run logs (logs/SFDA_SimT.out:15); this fixture is the in-environment substitute
for the (data-blocked) real GTA5->Cityscapes parity run — see docs/PARITY.md.

Fixture design notes:
  - Features are 3-channel Gaussians. Classes (0,1) and (2,3) are OVERLAPPING pairs
    (means 2 sigma apart) with ASYMMETRIC planted noise (T*[1] puts 0.30 on class 0):
    a plain-CE learner converges to argmax_j sum_c p(c|x) T*[c,j], which shifts the
    0/1 and 2/3 decision boundaries by ~0.5 sigma — a real, measurable mIoU loss that
    modelling T removes. Diagonal-dominant noise on *separable* data would flip no
    argmax and show nothing.
  - T*'s known rows keep the diagonal maximal because the sig_NTM parameterisation
    (identity prior + row L1-normalise, models/ntm.py) can only represent
    diagonal-dominant rows — matching the paper's assumption that pseudo-labels are
    per-class mostly correct.
  - The teacher posterior is T*[clean] with multiplicative jitter — the anchor-point
    assumption (the most-confident pixel of class k has posterior = row k) holds the
    way it would for a well-trained warmup teacher. Confidence margins are set so the
    two-threshold scheme routes high-noise known classes (row max 0.6) to the ignore
    band and open-set pixels (row max <= 0.3) to the "unknown" marker.
"""

import dataclasses

import jax
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

# Planted transition matrix T*: rows = clean class (incl. 2 open classes), cols =
# observed pseudo-label. Rows 1 and 3 are high-noise known classes (0.30 leaks to the
# overlapping partner); rows 4-5 are open-set classes labelled as known classes.
T_STAR = np.array(
    [
        [0.85, 0.05, 0.05, 0.05],
        [0.30, 0.60, 0.05, 0.05],
        [0.05, 0.05, 0.85, 0.05],
        [0.05, 0.05, 0.30, 0.60],
        [0.25, 0.25, 0.25, 0.25],
        [0.10, 0.30, 0.30, 0.30],
    ],
    dtype=np.float32,
)

# Class feature means (3 channels, sigma = 1): (0,1) and (2,3) overlap along ch0 at
# 2 sigma separation; open classes live on ch2.
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


def _make_clean8(rng: np.random.RandomState) -> np.ndarray:
    """Stride-8 clean class map (G cells), every class present."""
    while True:
        m = rng.randint(0, TOTAL, size=G)
        if len(np.unique(m)) == TOTAL:
            return m


def _grid_points(full: int, grid: int) -> np.ndarray:
    """Align-corners sample positions of the model's stride-8 grid in full res."""
    return np.round(np.arange(grid) * (full - 1) / (grid - 1)).astype(int)


def _make_example(rng: np.random.RandomState):
    """One (image, clean_full, noisy_label, teacher_prob8) example."""
    clean8 = _make_clean8(rng)
    clean = np.repeat(np.repeat(clean8, 8, axis=0), 8, axis=1)  # (H, W)
    image = MEANS[clean] + rng.randn(*HW, 3).astype(np.float32)
    # Per-pixel noisy pseudo-label ~ Categorical(T*[clean]).
    u = rng.rand(*HW, 1)
    cdf = np.cumsum(T_STAR[clean], axis=-1)
    noisy = np.sum(u > cdf, axis=-1).astype(np.int32)  # inverse-CDF sample
    # Teacher posterior on the model's stride-8 grid: T*[clean at the grid point]
    # with multiplicative jitter (the anchor rows a real warmup teacher would
    # provide, imperfectly).
    gy, gx = _grid_points(HW[0], G8[0]), _grid_points(HW[1], G8[1])
    clean_g = clean[np.ix_(gy, gx)]
    t = T_STAR[clean_g] * np.exp(0.05 * rng.randn(*G8, C).astype(np.float32))
    teacher8 = (t / t.sum(-1, keepdims=True)).astype(np.float32)
    return image.astype(np.float32), clean, noisy, teacher8


def make_dataset(n: int, batch: int, seed: int):
    """n batches of size `batch`; returns list of dicts + clean full-res labels."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        ims, cls, nys, t8s = zip(*[_make_example(rng) for _ in range(batch)])
        out.append(
            {
                "image": jnp.asarray(np.stack(ims)),
                "label": jnp.asarray(np.stack(nys)),
                "teacher_prob8": jnp.asarray(np.stack(t8s)),
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


def make_cfg(tmp_path, stage: str, steps: int, lr: float, lr_t: float) -> TrainConfig:
    cd_path = str(tmp_path / "cd.npy")
    np.save(cd_path, np.ones(C, np.float32))
    return TrainConfig(
        stage=stage,
        model=ModelConfig(num_classes=C, open_classes=O, openset=stage == "simt",
                          compute_dtype="float32"),
        optim=OptimConfig(num_steps=steps, learning_rate=lr, learning_rate_t=lr_t),
        simt=SimTConfig(class_dist=cd_path, threshold_high=0.75, threshold_low=0.4,
                        inner_w_steps=10),
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


def t_distance(t_param, class_dist) -> float:
    """Mean row-wise L1 distance between the realised T and the planted T*."""
    t = np.asarray(ntm_lib.ntm_forward(t_param, jnp.asarray(class_dist), C, O))
    return float(np.abs(t - T_STAR).sum(axis=1).mean())


def run_experiment(tmp_path, warmup_steps=150, train_steps=400, batch=2,
                   n_batches=6, lr=2.5e-3, lr_t=5e-3, seed=0, verbose=False):
    """Shared warm start -> (CE control | SimT) -> clean-label mIoU + T recovery."""
    train_data = make_dataset(n_batches, batch, seed=seed)
    val_data = make_dataset(2, 2, seed=seed + 10_000)
    class_dist = np.ones(C, np.float32)

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
    ce_vars = {"params": ce_state.model.params,
               "batch_stats": ce_state.model.batch_stats}
    miou_ce = clean_miou(eval_closed, ce_vars, val_data)

    # ---- arm B: SimT from the SAME warm start ----
    scfg = make_cfg(tmp_path, "simt", train_steps, lr, lr_t)
    student = tiny(True)
    svars = student.init(jax.random.PRNGKey(seed + 1), jnp.zeros((1, *HW, 3)), False)
    svars = {
        "params": transfer_params(warm_params, svars["params"]),
        "batch_stats": transfer_params(warm_stats, svars["batch_stats"]),
    }
    # Teacher net is required by the state ctor but bypassed: batches carry the
    # cached `teacher_prob8` posterior (train/simt.py:247-253).
    tvars = tiny(False).init(jax.random.PRNGKey(seed + 2), jnp.zeros((1, *HW, 3)), False)
    sstate = create_simt_state(svars, tvars, scfg, jax.random.PRNGKey(seed + 3))
    sstep = make_simt_step(student, tiny(False), scfg)

    d_init = 0.5 * (t_distance(sstate.t1.param, class_dist)
                    + t_distance(sstate.t2.param, class_dist))
    for i in range(train_steps):
        sstate, sm = sstep(sstate, train_data[(warmup_steps + i) % n_batches])
        if verbose and (i + 1) % 50 == 0:
            d = 0.5 * (t_distance(sstate.t1.param, class_dist)
                       + t_distance(sstate.t2.param, class_dist))
            print(f"  simt step {i+1}: loss={float(sm['loss']):.3f} dT={d:.3f}")
    d_final = 0.5 * (t_distance(sstate.t1.param, class_dist)
                     + t_distance(sstate.t2.param, class_dist))

    eval_open = make_eval(student)
    simt_vars = {"params": sstate.model.params,
                 "batch_stats": sstate.model.batch_stats}
    miou_simt = clean_miou(eval_open, simt_vars, val_data)

    return {
        "miou_ce": miou_ce,
        "miou_simt": miou_simt,
        "t_dist_init": d_init,
        "t_dist_final": d_final,
        "t1": np.asarray(ntm_lib.ntm_forward(sstate.t1.param,
                                             jnp.asarray(class_dist), C, O)),
    }


def test_planted_noise_recovery(tmp_path):
    r = run_experiment(tmp_path)
    # (a) T recovery: the learned transition matrices end much closer to the planted
    # T* than the init was (thresholds hold with >= 2x margin over measured runs).
    assert r["t_dist_final"] < 0.5 * r["t_dist_init"], r
    assert r["t_dist_final"] < 0.25, r
    # (b) Denoising: SimT beats the plain-CE control on clean-label mIoU.
    assert r["miou_simt"] > r["miou_ce"] + 0.02, r


if __name__ == "__main__":
    import pathlib
    import sys
    import tempfile

    kw = {}
    if "--quick" in sys.argv:
        kw = dict(warmup_steps=30, train_steps=60, verbose=True)
    else:
        kw = dict(verbose=True)
    with tempfile.TemporaryDirectory() as d:
        r = run_experiment(pathlib.Path(d), **kw)
    t1 = r.pop("t1")
    print({k: round(v, 4) for k, v in r.items()})
    print("learned T1 rows:\n", np.round(t1, 3))
    print("planted T* rows:\n", T_STAR)
