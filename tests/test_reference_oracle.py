"""Reference-derived loss oracle: ONE full SimT iteration, torch vs simt_tpu.

The parity tests elsewhere compare against torch twins of individual components; a twin
can share its author's misreading. This test re-derives the ENTIRE per-iteration math of
the reference trainer (tools/trainV2_simt.py:307-436, model/deeplab_multi.py:244-286,
utils/loss.py:6-40) in torch — de-CUDA'd, driven by precomputed student/teacher logits —
and runs the REAL jitted ``make_simt_step`` on the same inputs via stub models whose
forward returns those logits. Asserted equal:

  - all seven loss components (loss_seg_p, loss_seg_y, convex, volume, anchor, place,
    total loss);
  - the post-step T1/T2 parameters — which proves the inner-W-loop T-gradient
    accumulation quirk (optimizer_t1.zero_grad() once per OUTER iteration at :317 while
    NTM_loss.backward(retain_graph=True) at :337 deposits d/dT MSE(W_i@T,0) ten times,
    all applied by optimizer_t1.step() at :435 together with the main-loss grad);
  - the post-step W1/W2 parameters (off-diagonal; the reference's in-place diagonal
    surgery at deeplab_multi.py:279-281 writes -10000 into the param itself, which the
    functional logit mask deliberately does not);
  - iter_size=2 gradient accumulation (:345,:426-436: per-sub-batch loss/iter_size,
    one Adam step for T after the sub-loop).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
from simt_tpu.train import create_simt_state, make_simt_step

C, O = 5, 3
TOTAL = C + O
H8, W8 = 6, 8
HH, WW = 24, 32
INNER = 5
LR_T = 1e-3
IGNORE = 255


# ---------------------------------------------------------------------------
# torch re-derivation of the reference math (cited per block)
# ---------------------------------------------------------------------------


class SigNTM(torch.nn.Module):
    """sig_NTM forward (model/deeplab_multi.py:244-263), params injected."""

    def __init__(self, init: np.ndarray, class_dist: np.ndarray):
        super().__init__()
        self.T = torch.nn.Parameter(torch.tensor(init, dtype=torch.float32))
        prior = torch.cat(
            [torch.eye(C), torch.zeros(O, C)], dim=0
        )  # co_NTM: identity over known classes, zeros over open (:256-258)
        self.register_buffer("prior", prior)
        self.register_buffer(
            "dist", torch.tensor(class_dist, dtype=torch.float32).expand(TOTAL, C)
        )

    def forward(self):
        t = torch.sigmoid(self.T) * self.dist + self.prior
        return F.normalize(t, p=1, dim=1)  # row L1 (:263)


class SigW(torch.nn.Module):
    """sig_W forward incl. the in-place diagonal surgery (deeplab_multi.py:265-286)."""

    def __init__(self, init: np.ndarray):
        super().__init__()
        self.W = torch.nn.Parameter(torch.tensor(init, dtype=torch.float32))

    def forward(self):
        with torch.no_grad():
            idx = torch.arange(TOTAL)
            self.W[idx, idx] = -10000.0  # parameter mutation (:279-281)
        return F.softmax(self.W, dim=1) - torch.eye(TOTAL)  # (0 - I) + softmax (:284-286)


def placeholder_loss(pred, lambda_place, thres):
    """Placeholder_loss (trainV2_simt.py:202-230). ``ones = torch.zeros_like`` at :208
    makes the -1000 suppression multiply by ZERO — the argmax channel is set to 0, not
    -1000; reproduced as-is."""
    seg = torch.nn.CrossEntropyLoss(ignore_index=IGNORE)
    pseudo = torch.argmax(pred, dim=1).long()
    onehot = torch.eye(TOTAL)[pseudo].permute(0, 3, 1, 2).float()
    zeros = torch.zeros_like(onehot)
    ones = torch.zeros_like(onehot)  # sic (:208)
    predict = torch.where(onehot > zeros, -1000.0 * ones, pred)

    lones = torch.ones_like(pseudo)
    pseudo1 = torch.where(pseudo < C * lones, pseudo, IGNORE * lones)
    pred_max = torch.max(torch.softmax(pred.clone().detach(), dim=1), 1)[0]
    pseudo1 = torch.where(pred_max > thres, pseudo1, IGNORE * lones)
    loss_known = seg(pred, pseudo1)

    predict_open = torch.zeros_like(predict)
    predict_open[:, C:, :, :] = predict[:, C:, :, :].clone().detach()
    place_y = torch.argmax(predict_open, dim=1)
    place_y = torch.where(pseudo1 == IGNORE * lones, IGNORE * lones, place_y)
    loss_unknown = seg(predict, place_y)
    return loss_known + lambda_place * loss_unknown


def ce2d_probs(probs, target):
    """CrossEntropy2d(is_softmax=False) (utils/loss.py:14-40): log of the already
    T-multiplied probabilities, masked NLL mean."""
    n, c, h, w = probs.shape
    mask = (target >= 0) & (target != IGNORE)
    tgt = target[mask]
    p = probs.permute(0, 2, 3, 1)[mask].view(-1, c)
    return F.nll_loss(torch.log(p), tgt, reduction="mean")


def run_torch_iteration(x1s, x2s, teachs, labels, t1_init, t2_init, w_init_np,
                        class_dist, lambdas, iter_size):
    """One full reference iteration (trainV2_simt.py:307-436) on ``iter_size``
    sub-batches of precomputed stride-8 logits. Returns (metrics, post-step params)."""
    lam_seg, lam_place, lam_convex, lam_volume, lam_anchor = lambdas
    ntm1, ntm2 = SigNTM(t1_init, class_dist), SigNTM(t2_init, class_dist)
    w1, w2 = SigW(w_init_np), SigW(w_init_np)
    opt_t1 = torch.optim.Adam(ntm1.parameters(), lr=LR_T)
    opt_t2 = torch.optim.Adam(ntm2.parameters(), lr=LR_T)
    opt_w1 = torch.optim.Adam(w1.parameters(), lr=LR_T)
    opt_w2 = torch.optim.Adam(w2.parameters(), lr=LR_T)
    mse = torch.nn.MSELoss(reduction="sum")
    seg_loss = torch.nn.CrossEntropyLoss(ignore_index=IGNORE)
    interp = torch.nn.Upsample(size=(HH, WW), mode="bilinear", align_corners=True)

    opt_t1.zero_grad()
    opt_t2.zero_grad()  # once per outer iteration (:317-318)
    zeros = torch.zeros(TOTAL, C)
    for _ in range(INNER):  # (:327-339)
        T1, T2 = ntm1(), ntm2()
        W1, W2 = w1(), w2()
        opt_w1.zero_grad()
        opt_w2.zero_grad()
        ntm_loss = mse(W1.mm(T1), zeros) + mse(W2.mm(T2), zeros)
        ntm_loss.backward(retain_graph=True)  # T grads ACCUMULATE (:337)
        opt_w1.step()
        opt_w2.step()

    acc = {k: 0.0 for k in ("loss_seg_p", "loss_seg_y", "convex", "volume",
                            "anchor", "place", "loss")}
    for sub in range(iter_size):  # (:345)
        T1, T2 = ntm1(), ntm2()
        x1 = interp(torch.tensor(x1s[sub]).permute(0, 3, 1, 2))
        x2 = interp(torch.tensor(x2s[sub]).permute(0, 3, 1, 2))
        label = torch.tensor(labels[sub]).long()

        # Teacher pseudo-labels (:351-362).
        with torch.no_grad():
            labelC = interp(torch.softmax(torch.tensor(teachs[sub]).permute(0, 3, 1, 2),
                                          dim=1))
            labelC_max = torch.max(labelC, 1)
            labelC_argmax = torch.argmax(labelC, dim=1).float()
            labelC_flat = labelC.permute(0, 2, 3, 1).reshape(-1, C)
            lc = torch.where(labelC_max[0] > 0.8, labelC_argmax,
                             255.0 * torch.ones_like(labelC_argmax))
            lc = torch.where(labelC_max[0] < 0.2,
                             C * torch.ones_like(labelC_argmax), lc)
            conf = lc.long()

        pred1, pred2 = x1, x2  # precomputed student logits; grads flow to T/W only

        # Anchor loss (:374-384).
        anchor = torch.zeros(())
        for T, pred in ((T1, pred1), (T2, pred2)):
            flat = pred.clone().permute(0, 2, 3, 1).reshape(-1, TOTAL).detach()
            a_idx = torch.argmax(flat, dim=0)
            exist = torch.unique(torch.argmax(flat, dim=1))
            a_rows = labelC_flat[a_idx]
            anchor = anchor + mse(T[exist], a_rows[exist])

        # Class posterior constraint (:387-395).
        pseudo = torch.argmax(pred2.clone(), dim=1).detach()
        ones = torch.ones_like(conf)
        mask = torch.where(conf == C * ones, ones, torch.zeros_like(conf))
        pseudo1 = mask * pseudo
        pseudo1 = torch.where(pseudo1 >= C * ones, pseudo1, IGNORE * ones)
        conf = torch.where(conf == C * ones, pseudo1, conf)
        loss_p1 = seg_loss(pred1, conf)
        loss_p2 = seg_loss(pred2, conf)

        # Placeholder loss (:398-399).
        place = lam_seg * placeholder_loss(pred1, lam_place, 0.8)
        place = place + placeholder_loss(pred2, lam_place, 0.8)

        # Noisy posterior (:402-409); interp of an already-(HH,WW) map is identity.
        q1 = torch.softmax(interp(pred1), dim=1).permute(0, 2, 3, 1).reshape(-1, TOTAL)
        q1 = q1.mm(T1).view(1, HH, WW, C).permute(0, 3, 1, 2)
        q2 = torch.softmax(interp(pred2), dim=1).permute(0, 2, 3, 1).reshape(-1, TOTAL)
        q2 = q2.mm(T2).view(1, HH, WW, C).permute(0, 3, 1, 2)
        loss_y1 = ce2d_probs(q1, label)
        loss_y2 = ce2d_probs(q2, label)

        # Convex + volume (:412-421).
        W1m, W2m = w1(), w2()
        convex = 0.0 - (mse(W1m.mm(T1), zeros) + mse(W2m.mm(T2), zeros))
        volume = torch.log(torch.sqrt(torch.abs(torch.linalg.det(T1.t().mm(T1)))))
        volume = volume + torch.log(
            torch.sqrt(torch.abs(torch.linalg.det(T2.t().mm(T2))))
        )
        if torch.isinf(volume) or torch.isnan(volume):
            volume = 0.0

        loss_target = loss_p2 + loss_y2 + lam_seg * loss_p1 + lam_seg * loss_y1
        loss = (place + loss_target + lam_convex * convex + lam_volume * volume
                + lam_anchor * anchor)
        loss = loss / iter_size  # (:426-428)
        loss.backward()

        # Reference metric conventions: the seg components accumulate at
        # 1/iter_size (:429-432); Convex/Volume/Anchor/Place are the loop variables
        # read AFTER the sub-loop (:438-441) — last sub-batch, unscaled.
        for k, v in (("loss_seg_p", loss_p1 + loss_p2),
                     ("loss_seg_y", loss_y1 + loss_y2), ("loss", loss * iter_size)):
            acc[k] += float(v) / iter_size  # (:429-432)
        for k, v in (("convex", convex), ("volume", volume), ("anchor", anchor),
                     ("place", place)):
            acc[k] = float(v)  # loop-final, unscaled (:438-441)

    opt_t1.step()
    opt_t2.step()  # (:434-436); W opts stepped only in the inner loop
    return acc, {
        "t1": ntm1.T.detach().numpy(), "t2": ntm2.T.detach().numpy(),
        "w1": w1.W.detach().numpy(), "w2": w2.W.detach().numpy(),
    }


# ---------------------------------------------------------------------------
# JAX side: drive the REAL make_simt_step with stub models
# ---------------------------------------------------------------------------


class _StubStudent:
    """'Model' whose forward slices the precomputed logits out of the image tensor
    (channels [0:T) = head1, [T:2T) = head2), so the oracle exercises the genuine
    train_step including the streamed loss block and the optimizer families."""

    def apply(self, variables, image, train, mutable=None):
        x1 = image[..., :TOTAL]
        x2 = image[..., TOTAL:2 * TOTAL]
        if mutable is not None:
            return (x1, x2), {}
        return x1, x2


class _StubTeacher:
    def apply(self, variables, image, train):
        return None, image[..., 2 * TOTAL:2 * TOTAL + C]


@pytest.mark.parametrize("iter_size", [1, 2])
def test_full_iteration_matches_reference_math(tmp_path, iter_size):
    rng = np.random.RandomState(7 + iter_size)
    x1s = [rng.randn(1, H8, W8, TOTAL).astype(np.float32) * 2 for _ in range(iter_size)]
    x2s = [rng.randn(1, H8, W8, TOTAL).astype(np.float32) * 2 for _ in range(iter_size)]
    # Teacher logits scaled so all three threshold bands (>0.8, <0.2, mid) occur.
    teachs = [rng.randn(1, H8, W8, C).astype(np.float32) * 4 for _ in range(iter_size)]
    labels = [
        np.where(rng.rand(1, HH, WW) < 0.15, IGNORE,
                 rng.randint(0, C, (1, HH, WW))).astype(np.int32)
        for _ in range(iter_size)
    ]
    class_dist = (rng.rand(C).astype(np.float32) + 0.5)
    class_dist /= class_dist.sum()
    cd_path = str(tmp_path / "cd.npy")
    np.save(cd_path, class_dist)

    t1_init = rng.randn(TOTAL, C).astype(np.float32) * 0.5
    t2_init = rng.randn(TOTAL, C).astype(np.float32) * 0.5
    w_init_np = np.full((TOTAL, TOTAL), 1.0 / (TOTAL - 1.0), np.float32)
    lambdas = (0.1, 0.1, 0.1, 1.0, 1.0)  # seg, place, convex, volume, anchor

    # --- torch reference iteration ---
    torch_metrics, torch_params = run_torch_iteration(
        x1s, x2s, teachs, labels, t1_init, t2_init, w_init_np, class_dist,
        lambdas, iter_size,
    )

    # --- simt_tpu real train step ---
    cfg = TrainConfig(
        model=ModelConfig(num_classes=C, open_classes=O, openset=True,
                          compute_dtype="float32"),
        optim=OptimConfig(learning_rate_t=LR_T, num_steps=10**9,  # poly factor ~1
                          iter_size=iter_size),
        simt=dataclasses.replace(SimTConfig(), class_dist=cd_path,
                                 inner_w_steps=INNER),
    )
    stub_params = {"layer3_0": {"conv1": {"kernel": jnp.zeros((1, 1, 1, 1))}}}
    state = create_simt_state(
        {"params": stub_params}, {"params": {}}, cfg, jax.random.PRNGKey(0)
    )
    # Overwrite the NTM inits with the oracle's.
    state = state.replace(
        t1=state.t1.replace(param=jnp.asarray(t1_init)),
        t2=state.t2.replace(param=jnp.asarray(t2_init)),
    )
    step = make_simt_step(_StubStudent(), _StubTeacher(), cfg)

    images = [
        np.concatenate([x1s[i], x2s[i], teachs[i]], axis=-1) for i in range(iter_size)
    ]
    if iter_size == 1:
        batch = {"image": jnp.asarray(images[0]), "label": jnp.asarray(labels[0])}
    else:
        batch = {"image": jnp.asarray(np.stack(images)),
                 "label": jnp.asarray(np.stack(labels))}
    new_state, metrics = step(state, batch)

    for k, want in torch_metrics.items():
        got = float(metrics[k])
        assert got == pytest.approx(want, rel=2e-4, abs=2e-4), (k, got, want)

    # Post-step NTM params: proves the inner-loop T-grad accumulation quirk AND the
    # single Adam step on (inner-sum + main/iter_size-mean) grads.
    np.testing.assert_allclose(
        np.asarray(new_state.t1.param), torch_params["t1"], atol=2e-5,
        err_msg="T1 post-step mismatch (inner-loop T-grad accumulation?)")
    np.testing.assert_allclose(
        np.asarray(new_state.t2.param), torch_params["t2"], atol=2e-5)

    # W params: off-diagonal must match; torch's diagonal is the surgical -10000.
    off = ~np.eye(TOTAL, dtype=bool)
    for key, got in (("w1", new_state.w1.param), ("w2", new_state.w2.param)):
        np.testing.assert_allclose(
            np.asarray(got)[off], torch_params[key][off], atol=2e-5, err_msg=key)
    assert np.all(torch_params["w1"][np.eye(TOTAL, dtype=bool)] == -10000.0)
