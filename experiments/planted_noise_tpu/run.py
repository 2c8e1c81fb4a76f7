"""Planted-noise recovery at REFERENCE GEOMETRY on the real TPU.

tests/test_planted_noise.py proves the SimT causal chain (denoising / identification
/ attractor) at toy geometry (64x128, C=4+O=2, float32, CPU). This runner re-runs the
same three-arm protocol at the reference operating point the framework was built for:

  - 512x1024 crops (INPUT_SIZE_TARGET, /root/reference/tools/trainV2_simt.py:46),
  - C=19 known + O=15 open classes (sh_simt.sh:17),
  - the full dilated ResNet-101 (model/deeplab_multi.py:122-242 as rebuilt in
    models/resnet_multi.py), bfloat16 compute — the production numerics,
  - batch size 1 on one v5e chip, all batches device-resident (no host pipeline).

Arms (shared from-scratch warmup on the noisy labels):
  ce        plain cross-entropy control (the warmup step, continued)
  verbatim  reference-verbatim SimT (uncleared inner-W T-grad leak, lambda_volume=1.0)
  paper     paper-faithful mode (clear_inner_t_grads=True, lambda_volume=0.1)
  oracle    T frozen at the planted T* (isolates the loss mechanism)

Fixture: the test's design scaled up — 9 feature-overlapping class pairs + 1
singleton known + 15 open clusters; a planted (C+O)xC transition matrix T* with a
road-like dominant class receiving the big asymmetric leak (class 1 -> 0 at 0.14,
the largest leak the NTM parameterisation can represent at these class frequencies:
every off-diagonal t_kj is structurally capped by cd_j, models/ntm.py::ntm_invert),
per-pair asymmetric leaks at their caps, and identical flat open rows equal to the
noisy-label marginal. class_dist is the EXACT marginal pi @ T*; T* is planted inside
the representable family by closed-form inversion (ntm_invert). The teacher is the
Bayes posterior of the noisy label given the cell features (what a converged warmup
network produces), fed through the product's cached-posterior path
(train/simt.py:247-252).

Usage:
  python run.py                      # TPU, 4 arms x 1200 steps -> PLANTED_TPU_r05.json
  python run.py --train-steps 10000 --arms ce,oracle --out ..._long.json
  python run.py --smoke              # tiny geometry + tiny model on CPU (plumbing test)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true",
                   help="tiny fixture + tiny model on CPU: validates the plumbing")
    p.add_argument("--arms", default="ce,verbatim,paper,oracle")
    p.add_argument("--warmup-steps", type=int, default=2000)
    p.add_argument("--train-steps", type=int, default=1200)
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--n-train", type=int, default=8, help="distinct training examples")
    p.add_argument("--n-val", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr-t", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=os.path.join(REPO, "PLANTED_TPU_r05.json"))
    p.add_argument("--platform", default=None, help="override jax platform")
    return p.parse_args()


ARGS = parse_args()

import jax  # noqa: E402

if ARGS.smoke and ARGS.platform is None:
    ARGS.platform = "cpu"
if ARGS.platform:
    jax.config.update("jax_platforms", ARGS.platform)
from common import enable_compilation_cache  # noqa: E402  (tools/common.py)

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig  # noqa: E402
from simt_tpu.models import ntm as ntm_lib  # noqa: E402
from simt_tpu.models.resnet_multi import ResNetMulti  # noqa: E402
from simt_tpu.ops.metrics import fast_hist, per_class_iu  # noqa: E402
from simt_tpu.ops.interp import upsample_bilinear_align_corners as up  # noqa: E402
from simt_tpu.train import (  # noqa: E402
    create_simt_state,
    create_warmup_state,
    make_simt_step,
    make_warmup_step,
)

# ----------------------------------------------------------------------------- fixture


class Fixture:
    """Planted-noise fixture generalising tests/test_planted_noise.py to any scale.

    Knowns = ``pairs`` feature-overlapping pairs (2 sigma apart along ch0) + ``extra``
    well-separated singletons; ``opens`` open clusters 4+ sigma from every known.
    Pair (0, 1) is the road-like pair: dominant priors and the big asymmetric leak.
    """

    CELL = 8      # noise/feature cell = the model's stride-8 output resolution
    REGION = 2    # same-class regions of REGIONxREGION cells (contiguous objects)
    SIGMA = 1.0
    JITTER = 0.25
    THRESH_HIGH = 0.60  # boundary-unbiased (see tests/test_planted_noise.py docstring)
    THRESH_LOW = 0.32   # above every open row's max (~0.29), below known-core conf

    def __init__(self, pairs: int, extra: int, opens: int, hw, known_pi):
        self.C = 2 * pairs + extra
        self.O = opens
        self.TOTAL = self.C + self.O
        self.HW = tuple(hw)
        assert self.HW[0] % (self.CELL * self.REGION) == 0
        assert self.HW[1] % (self.CELL * self.REGION) == 0
        self.G = (self.HW[0] // self.CELL, self.HW[1] // self.CELL)
        # Stride-8 output grid (H/8+1, the dilated-ResNet geometry: 65x129 at 512x1024).
        self.G8 = (self.G[0] + 1, self.G[1] + 1)
        C, O = self.C, self.O

        # Priors: explicit known-class weights (must sum to 0.85 — road pair dominant,
        # other pairs asymmetric), opens rare at 0.15 total. Every structural leak cap
        # below is cd_j-bounded, so the priors and T* must be designed together.
        pi = np.zeros(self.TOTAL)
        known_pi = np.asarray(known_pi, np.float64)
        assert known_pi.shape == (C,) and abs(known_pi.sum() - 0.85) < 1e-6
        pi[:C] = known_pi
        pi[C:] = 0.15 / O
        pi /= pi.sum()
        self.PI = pi.astype(np.float32)

        # Planted T*: diag-dominant known rows with road + pair leaks and a small
        # uniform floor; open rows all equal to the noisy-label marginal cd (flat,
        # max < THRESH_LOW, and trivially inside every structural cap).
        floor = 0.003
        t = np.zeros((self.TOTAL, C))
        for k in range(C):
            row = np.full(C, floor)
            row[k] = 0.0
            if k == 0:
                row[1] = 0.01
            elif k == 1:
                row[0] = 0.14          # the big representable leak (into the road class)
            else:
                row[0] = 0.05
                if k < 2 * pairs:
                    partner = k ^ 1
                    row[partner] = 0.035 if (k % 2) else 0.008  # asymmetric pair leak
            row[k] = 1.0 - row.sum()
            t[k] = row
        # Solve the open-row fixed point: open rows == cd == sum_c pi_c T*[c]
        #   => cd = (pi_known @ T_known) / (1 - sum(pi_open)).
        m = self.PI[:C] @ t[:C]
        cd = m / (1.0 - self.PI[C:].sum())
        t[C:] = cd
        self.T_STAR = t.astype(np.float32)
        self.CLASS_DIST = (self.PI @ self.T_STAR).astype(np.float32)
        np.testing.assert_allclose(self.CLASS_DIST, cd.astype(np.float32), atol=1e-6)
        assert self.CLASS_DIST.max() < self.THRESH_LOW - 0.02, self.CLASS_DIST.max()

        # Verbatim-dynamics attractor (docs/PARITY.md "NTM identification").
        attr = np.concatenate(
            [np.eye(C, dtype=np.float32), np.zeros((O, C), np.float32)], axis=0
        )
        self.T_ATTR = (attr + self.CLASS_DIST) / (1.0 + self.CLASS_DIST.sum())

        # Exact inversion: raises if any leak exceeds its structural cap.
        self.P_STAR = ntm_lib.ntm_invert(self.T_STAR, self.CLASS_DIST, C)
        np.testing.assert_allclose(
            np.asarray(ntm_lib.ntm_forward(
                jnp.asarray(self.P_STAR), jnp.asarray(self.CLASS_DIST), C, O)),
            self.T_STAR, atol=1e-5,
        )

        # Feature means (3 channels): pair centers on a radius-5 circle in (ch1, ch2),
        # members at ch0 = +/-1 (2 sigma overlap); singletons on the same circle at
        # ch0 = 0; opens on a radius-5 circle at ch0 = +5.
        n_centers = pairs + extra
        means = np.zeros((self.TOTAL, 3), np.float32)
        for p in range(pairs):
            a = 2 * np.pi * p / n_centers
            means[2 * p] = [+1.0, 5 * np.cos(a), 5 * np.sin(a)]
            means[2 * p + 1] = [-1.0, 5 * np.cos(a), 5 * np.sin(a)]
        for e in range(extra):
            a = 2 * np.pi * (pairs + e) / n_centers
            means[2 * pairs + e] = [0.0, 5 * np.cos(a), 5 * np.sin(a)]
        for o in range(O):
            a = 2 * np.pi * (o + 0.5) / O
            means[C + o] = [5.0, 5 * np.cos(a), 5 * np.sin(a)]
        self.MEANS = means

    # -- generation (mirrors tests/test_planted_noise.py, parameterised) --

    def bayes_teacher(self, cell_feat: np.ndarray) -> np.ndarray:
        d2 = ((cell_feat[..., None, :] - self.MEANS) ** 2).sum(-1)
        logp = np.log(self.PI) - 0.5 * d2 / self.SIGMA**2
        logp -= logp.max(-1, keepdims=True)
        p = np.exp(logp)
        p /= p.sum(-1, keepdims=True)
        return (p @ self.T_STAR).astype(np.float32)

    def make_clean8(self, rng) -> np.ndarray:
        g_r = (self.G[0] // self.REGION, self.G[1] // self.REGION)
        while True:
            m = rng.choice(self.TOTAL, size=g_r, p=self.PI)
            if len(np.unique(m)) == self.TOTAL:
                return np.repeat(np.repeat(m, self.REGION, 0), self.REGION, 1)

    def make_example(self, rng):
        clean8 = self.make_clean8(rng)
        clean = np.repeat(np.repeat(clean8, self.CELL, 0), self.CELL, 1)
        cell_feat = (self.MEANS[clean8]
                     + self.SIGMA * rng.randn(*self.G, 3)).astype(np.float32)
        image = np.repeat(np.repeat(cell_feat, self.CELL, 0), self.CELL, 1)
        image = image + self.JITTER * rng.randn(*self.HW, 3).astype(np.float32)
        # Per-pixel noisy label ~ Categorical(T*[clean]) via inverse CDF.
        u = rng.rand(*self.HW, 1).astype(np.float32)
        cdf = np.cumsum(self.T_STAR[clean], axis=-1)
        noisy = np.sum(u > cdf, axis=-1).astype(np.int32)
        ii = np.minimum(np.arange(self.G8[0]), self.G[0] - 1)
        jj = np.minimum(np.arange(self.G8[1]), self.G[1] - 1)
        tprob = self.bayes_teacher(cell_feat[np.ix_(ii, jj)])
        return image.astype(np.float32), clean.astype(np.int32), noisy, tprob

    def make_dataset(self, n: int, seed: int):
        """n device-resident batches of size 1 (+ device clean labels for eval)."""
        rng = np.random.RandomState(seed)
        out = []
        for _ in range(n):
            im, cl, ny, tp = self.make_example(rng)
            out.append({
                "image": jnp.asarray(im[None]),
                "label": jnp.asarray(ny[None]),
                "teacher_prob8": jnp.asarray(tp[None]),
                "_clean": jnp.asarray(cl[None]),
            })
        return out

    def routing_diagnostics(self, batches) -> dict:
        """Fraction of stride-8 teacher nodes routed conf / unknown / ignore, and the
        conf-label error rate vs the clean class — the teacher-quality sanity check."""
        conf = unk = ign = conf_wrong = total = 0
        for b in batches:
            tp = np.asarray(b["teacher_prob8"][0])
            mx, am = tp.max(-1), tp.argmax(-1)
            cl8 = np.asarray(b["_clean"][0])[:: self.CELL, :: self.CELL]
            cl8 = np.pad(cl8, ((0, 1), (0, 1)), mode="edge")
            c = mx > self.THRESH_HIGH
            u = mx < self.THRESH_LOW
            conf += int(c.sum()); unk += int(u.sum())
            ign += int((~c & ~u).sum()); total += mx.size
            conf_wrong += int((c & (am != cl8)).sum())
        return {
            "conf_frac": conf / total, "unknown_frac": unk / total,
            "ignore_frac": ign / total,
            "conf_err": conf_wrong / max(conf, 1),
        }


# ------------------------------------------------------------------------------ arms


def transfer_params(src_tree, dst_tree):
    """Warmup -> open-set student partial load (the reference's key-intersection
    state_dict load, trainV2_simt.py:252-255): copy every path+shape match."""
    import flax.traverse_util as tu

    src = tu.flatten_dict(src_tree)
    dst = dict(tu.flatten_dict(dst_tree))
    for k, v in src.items():
        if k in dst and dst[k].shape == v.shape:
            dst[k] = v
    return tu.unflatten_dict(dst)


def main():
    a = ARGS
    if a.smoke:
        fx = Fixture(pairs=2, extra=1, opens=3, hw=(64, 128),
                     known_pi=[0.22, 0.13, 0.20, 0.12, 0.18])
        layers, dtype_name = (1, 1, 1, 1), "float32"
    else:
        fx = Fixture(pairs=9, extra=1, opens=15, hw=(512, 1024),
                     known_pi=[0.15, 0.09] + [0.042, 0.028] * 8 + [0.05])
        layers, dtype_name = (3, 4, 23, 3), "bfloat16"
    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    C, O, HW = fx.C, fx.O, fx.HW
    print(f"fixture: C={C} O={O} HW={HW} platform={jax.default_backend()}", flush=True)
    print("T* diag:", np.round(np.diag(fx.T_STAR[:C]), 3), flush=True)
    print("class_dist:", np.round(fx.CLASS_DIST, 3), flush=True)

    train_data = fx.make_dataset(a.n_train, seed=a.seed)
    val_data = fx.make_dataset(a.n_val, seed=a.seed + 10_000)
    diag = fx.routing_diagnostics(train_data)
    print("teacher routing:", {k: round(v, 4) for k, v in diag.items()}, flush=True)

    cd_path = os.path.join(os.path.dirname(a.out) or ".", "_planted_cd.npy")
    np.save(cd_path, fx.CLASS_DIST)

    def make_cfg(stage, steps, lr, lr_t, **simt_kw):
        return TrainConfig(
            stage=stage,
            model=ModelConfig(num_classes=C, open_classes=O, openset=stage == "simt",
                              compute_dtype=dtype_name),
            optim=OptimConfig(num_steps=steps, learning_rate=lr, learning_rate_t=lr_t),
            simt=SimTConfig(**{**dict(class_dist=cd_path,
                                      threshold_high=fx.THRESH_HIGH,
                                      threshold_low=fx.THRESH_LOW,
                                      inner_w_steps=10),
                               **simt_kw}),
        )

    def model_of(openset):
        return ResNetMulti(num_classes=C, open_classes=O if openset else 0,
                           openset=openset, layers=layers, dtype=dtype)

    def make_hist_fn(model):
        @jax.jit
        def hist_fn(variables, image, clean):
            logits = model.apply(variables, image, False)[1].astype(jnp.float32)
            pred = jnp.argmax(up(logits, HW)[..., :C], axis=-1)
            return fast_hist(clean, pred, C)
        return hist_fn

    def miou(hist_fn, variables, batches) -> float:
        h = sum(np.asarray(hist_fn(variables, b["image"], b["_clean"]))
                for b in batches).astype(np.float64)
        return float(np.nanmean(per_class_iu(h)))

    def t_metrics(st):
        def d(param, target, rows):
            t = np.asarray(ntm_lib.ntm_forward(
                param, jnp.asarray(fx.CLASS_DIST), C, O))
            return float(np.abs(t - target).sum(1)[rows].mean())
        known = slice(0, C)
        return {
            "t_dist_known": 0.5 * (d(st.t1.param, fx.T_STAR, known)
                                   + d(st.t2.param, fx.T_STAR, known)),
            "t_attr_known": 0.5 * (d(st.t1.param, fx.T_ATTR, known)
                                   + d(st.t2.param, fx.T_ATTR, known)),
            "t1_leak_10": float(np.asarray(ntm_lib.ntm_forward(
                st.t1.param, jnp.asarray(fx.CLASS_DIST), C, O))[1, 0]),
        }

    def run_steps(step_fn, state, steps, log_every, eval_cb, arm):
        traj = []
        for start in range(0, steps, log_every):
            n = min(log_every, steps - start)
            t0 = time.perf_counter()
            m = None
            for i in range(start, start + n):
                state, m = step_fn(state, train_data[i % len(train_data)])
            # Host readback = the only honest sync on axon (CLAUDE.md).
            loss = float(m["loss"] if "loss" in m else m["loss_seg2"])
            dt = time.perf_counter() - t0
            rec = {"step": start + n, "loss": round(loss, 4),
                   "steps_per_sec": round(n / dt, 2)}
            rec.update(eval_cb(state, m))
            traj.append(rec)
            print(f"[{arm}] {rec}", flush=True)
        return state, traj

    results = {"geometry": {"hw": HW, "C": C, "O": O, "layers": list(layers),
                            "dtype": dtype_name, "batch": 1,
                            "n_train": a.n_train, "n_val": a.n_val,
                            "warmup_steps": a.warmup_steps,
                            "train_steps": a.train_steps,
                            "lr": a.lr, "lr_t": a.lr_t, "seed": a.seed,
                            "threshold_high": fx.THRESH_HIGH,
                            "threshold_low": fx.THRESH_LOW},
               "teacher_routing": diag,
               "platform": jax.default_backend(),
               "arms": {}}

    # ---- shared warmup on the noisy labels ----
    wcfg = make_cfg("warmup", a.warmup_steps + a.train_steps, a.lr, a.lr_t)
    wmodel = model_of(False)
    wvars = wmodel.init(jax.random.PRNGKey(a.seed), jnp.zeros((1, *HW, 3)), False)
    wstate = create_warmup_state(wmodel, wvars, wcfg)
    wstep = make_warmup_step(wmodel, wcfg)
    whist = make_hist_fn(wmodel)

    def warm_eval(st, m):
        v = {"params": st.model.params, "batch_stats": st.model.batch_stats}
        return {"train_clean_miou": round(miou(whist, v, train_data), 4),
                "val_miou": round(miou(whist, v, val_data), 4)}

    print(f"warmup: {a.warmup_steps} steps (first step compiles)...", flush=True)
    wstate, wtraj = run_steps(wstep, wstate, a.warmup_steps,
                              max(a.log_every, a.warmup_steps // 4), warm_eval, "warmup")
    results["warmup_traj"] = wtraj
    warm_params, warm_stats = wstate.model.params, wstate.model.batch_stats

    arms = [s.strip() for s in a.arms.split(",") if s.strip()]

    # ---- CE control: keep stepping the warmup state ----
    if "ce" in arms:
        ce_state, ce_traj = run_steps(wstep, wstate, a.train_steps, a.log_every,
                                      warm_eval, "ce")
        results["arms"]["ce"] = {"traj": ce_traj, **ce_traj[-1]}

    # ---- SimT arms from the shared warm start ----
    PAPER_KW = dict(clear_inner_t_grads=True, lambda_volume=0.1)
    student = model_of(True)
    shist = make_hist_fn(student)

    t_star_known = jnp.asarray(fx.T_STAR[:C])

    @jax.jit
    def anchor_diag(variables, image, tprob8, clean):
        """Realized-anchor quality (trainV2_simt.py:374-384 picks exactly these rows
        as T's targets): per known channel k, the teacher posterior at the student's
        max-logit pixel vs the planted T* row (L1), whether that pixel's CLEAN class
        is k (is the anchor point on-class?), and the teacher row's own max there
        (is the teacher confident?)."""
        _, x2 = student.apply(variables, image, False)
        lg = up(x2.astype(jnp.float32), HW).reshape(-1, C + O)
        tp = up(tprob8.astype(jnp.float32), HW).reshape(-1, C)
        idx = jnp.argmax(lg, axis=0)  # (C+O,)
        rows = tp[idx]  # (C+O, C)
        err = jnp.abs(rows[:C] - t_star_known).sum(1)  # (C,)
        on_class = clean.reshape(-1)[idx[:C]] == jnp.arange(C)
        conf = rows[:C].max(1)
        return err, on_class, conf

    def anchor_err(variables, image, tprob8, clean):
        err, _, _ = anchor_diag(variables, image, tprob8, clean)
        return float(err.mean())

    def run_simt_arm(name, simt_kw=None, oracle_t=False, lr_t=None):
        scfg = make_cfg("simt", a.train_steps, a.lr,
                        a.lr_t if lr_t is None else lr_t, **(simt_kw or {}))
        svars = student.init(jax.random.PRNGKey(a.seed + 1),
                             jnp.zeros((1, *HW, 3)), False)
        svars = {"params": transfer_params(warm_params, svars["params"]),
                 "batch_stats": transfer_params(warm_stats, svars["batch_stats"])}
        tvars = {"params": warm_params, "batch_stats": warm_stats}
        sstate = create_simt_state(svars, tvars, scfg, jax.random.PRNGKey(a.seed + 3))
        if oracle_t:
            sstate = sstate.replace(
                t1=sstate.t1.replace(param=jnp.asarray(fx.P_STAR)),
                t2=sstate.t2.replace(param=jnp.asarray(fx.P_STAR)),
            )
        sstep = make_simt_step(student, model_of(False), scfg)

        def simt_eval(st, m):
            v = {"params": st.model.params, "batch_stats": st.model.batch_stats}
            b0 = train_data[0]
            rec = {"train_clean_miou": round(miou(shist, v, train_data), 4),
                   "val_miou": round(miou(shist, v, val_data), 4),
                   "anchor_err_known": round(anchor_err(
                       v, b0["image"], b0["teacher_prob8"], b0["_clean"]), 4)}
            rec.update({k: round(val, 4) for k, val in t_metrics(st).items()})
            for key in ("loss_seg_p", "loss_seg_y", "convex", "volume",
                        "anchor", "place"):
                rec[key] = round(float(m[key]), 3)
            return rec

        init_t = {k: round(v, 4) for k, v in t_metrics(sstate).items()}
        print(f"[{name}] init {init_t}", flush=True)
        sstate, traj = run_steps(sstep, sstate, a.train_steps, a.log_every,
                                 simt_eval, name)
        t1_final = np.asarray(ntm_lib.ntm_forward(
            sstate.t1.param, jnp.asarray(fx.CLASS_DIST), C, O))
        # Anchor-point-assumption post-mortem across all train batches: how often is
        # the student's per-channel most-confident pixel actually ON its clean class,
        # and how confident is the teacher there?
        v = {"params": sstate.model.params, "batch_stats": sstate.model.batch_stats}
        errs, ons, confs = [], [], []
        for b in train_data:
            e, oc, cf = anchor_diag(v, b["image"], b["teacher_prob8"], b["_clean"])
            errs.append(np.asarray(e)); ons.append(np.asarray(oc))
            confs.append(np.asarray(cf))
        diag = {"anchor_on_class_frac": round(float(np.mean(ons)), 4),
                "anchor_teacher_conf_mean": round(float(np.mean(confs)), 4),
                "anchor_err_known_mean": round(float(np.mean(errs)), 4)}
        print(f"[{name}] anchor diag {diag}", flush=True)
        print(f"[{name}] per-ch err (batch0): "
              + " ".join(f"{x:.2f}" for x in errs[0]), flush=True)
        return {"init": init_t, "traj": traj, **traj[-1], **diag,
                "t1_diag_final": [round(float(x), 4)
                                  for x in np.diag(t1_final[:C])]}

    for name in arms:
        if name == "ce":
            continue
        kw = {"verbatim": {},
              "paper": dict(simt_kw=PAPER_KW),
              "oracle": dict(oracle_t=True, lr_t=0.0)}[name]
        results["arms"][name] = run_simt_arm(name, **kw)

    # ---- summary: the causal-ordering facts the CPU test asserts ----
    s = {}
    arm_r = results["arms"]
    if "ce" in arm_r and "oracle" in arm_r:
        s["oracle_val_minus_ce_val"] = round(
            arm_r["oracle"]["val_miou"] - arm_r["ce"]["val_miou"], 4)
        s["ce_train_minus_oracle_train"] = round(
            arm_r["ce"]["train_clean_miou"] - arm_r["oracle"]["train_clean_miou"], 4)
    if "paper" in arm_r:
        s["paper_dTk_init_to_final"] = [arm_r["paper"]["init"]["t_dist_known"],
                                        arm_r["paper"]["t_dist_known"]]
    if "verbatim" in arm_r:
        s["verbatim_dTk_init_to_final"] = [arm_r["verbatim"]["init"]["t_dist_known"],
                                           arm_r["verbatim"]["t_dist_known"]]
        s["verbatim_dAttrK_init_to_final"] = [
            arm_r["verbatim"]["init"]["t_attr_known"],
            arm_r["verbatim"]["t_attr_known"]]
    if "paper" in arm_r and "verbatim" in arm_r:
        s["paper_val_minus_verbatim_val"] = round(
            arm_r["paper"]["val_miou"] - arm_r["verbatim"]["val_miou"], 4)
    results["summary"] = s

    with open(a.out, "w") as f:
        json.dump(results, f, indent=1)
    print("summary:", json.dumps(s), flush=True)
    print("wrote", a.out, flush=True)


if __name__ == "__main__":
    main()
