"""SimT-stage trainer (stage 2): joint segmentation + Noise Transition Matrix training.

Re-implements the reference's core entry point (tools/trainV2_simt.py:307-436) as ONE
jitted ``train_step`` containing everything the reference does per iteration:

  - the 10-step inner Adam loop optimising W1/W2 against MSE(W @ T, 0) (:327-339), as a
    ``lax.fori_loop``. The reference's ``NTM_loss.backward(retain_graph=True)`` also
    deposits d/dT MSE(W_i @ T, 0) into the NTM parameters' ``.grad`` on every inner
    iteration — ``optimizer_t1.zero_grad()`` runs only once per *outer* iteration
    (:317) while the inner loop never clears the T grads — so ``optimizer_t1.step()``
    (:435) applies the SUM of the 10 inner W-objective T-gradients plus the main-loss
    T-gradient. This quirk dominates the T update (~100x the main-loss T-grad) and is
    reproduced here exactly: the fori_loop carry accumulates the T-gradients of the W
    objective at each inner step, and they are added to the main-loss T-grads before
    the single Adam update;
  - frozen-teacher pseudo-labelling with the two-threshold scheme: argmax where
    max-prob > 0.8, class-C "unknown" where < 0.2, else 255-ignore (:351-362) — without
    the reference's GPU->CPU->GPU round trip at :362;
  - anchor loss: per-channel most-confident pixel's teacher posterior as a row target for
    T over the classes present in the prediction (:374-384);
  - class-posterior constraint: unknown-marked pixels take the student's own open-set
    argmax as label (:387-395);
  - placeholder loss on both heads (:398-399 -> :202-230);
  - noisy posterior loss log(softmax(pred) @ T) vs the on-disk pseudo label (:402-409);
  - convex (-MSE(W@T,0)) and guarded volume losses (:412-421);
  - composite loss (:423-424) and the three optimizer families: model SGD (1x/10x poly),
    T1/T2 Adam (W1/W2 were stepped in the inner loop; their grads from the main loss are
    discarded, exactly like the reference's zero_grad at the top of the next iteration);
  - ``iter_size`` gradient accumulation (:85-86, :345, :426-436): the main loss is
    evaluated on ``iter_size`` sub-batches, each contribution scaled by 1/iter_size,
    with ONE model/T optimizer step after the sub-loop (the teacher pseudo-labelling
    runs per sub-batch; the W inner loop runs once per outer iteration, before it).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

import flax.traverse_util as traverse_util

from ..data.pipeline import normalize_image, normalize_label
from ..models import ntm as ntm_lib
from ..ops import mse_sum, volume_loss
from ..ops.fused_losses import simt_loss_block
from ..ops.schedules import poly_lr
from . import state as state_lib


def _cast_frozen_kernels(params, compute_dtype: str):
    """Store a frozen network's conv kernels in the compute dtype.

    Every conv kernel is consumed via ``.astype(compute_dtype)`` (models/layers.py,
    ops/conv.py) or flax's promote_dtype, so pre-casting once at state creation is
    bit-identical to casting every step — it just deletes ~250 MB/step of f32->bf16
    HBM traffic for the never-updated teacher. BN affine/stats and ASPP biases stay
    f32: flax BatchNorm and the branch-bias add run their arithmetic in f32.
    """
    if compute_dtype == "float32":
        return params
    dtype = jnp.bfloat16
    flat = traverse_util.flatten_dict(params)
    flat = {
        k: (jnp.asarray(v, dtype) if k[-1].endswith("kernel") else v)
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(flat)


def create_simt_state(model_vars, teacher_vars, cfg, rng) -> state_lib.SimTState:
    """Initialise the SimT train state (trainV2_simt.py:250-280)."""
    init_model, _ = state_lib.make_model_tx(
        cfg.optim.momentum,
        cfg.optim.weight_decay,
        warmup=False,
        aspp_effective_branches=cfg.model.aspp_effective_branches,
    )
    adam_init, _ = state_lib.make_adam_tx()
    c, o = cfg.model.num_classes, cfg.model.open_classes
    k1, k2 = jax.random.split(rng)
    t1 = ntm_lib.ntm_init(k1, c, o)
    t2 = ntm_lib.ntm_init(k2, c, o)
    w1 = ntm_lib.w_init(c, o)
    w2 = ntm_lib.w_init(c, o)
    return state_lib.SimTState(
        model=state_lib.ModelState(
            params=model_vars["params"],
            batch_stats=model_vars.get("batch_stats", {}),
            opt_state=init_model(model_vars["params"]),
        ),
        teacher_params=_cast_frozen_kernels(
            teacher_vars["params"], cfg.model.compute_dtype
        ),
        teacher_batch_stats=teacher_vars.get("batch_stats", {}),
        t1=state_lib.NTMState(t1, adam_init(t1)),
        t2=state_lib.NTMState(t2, adam_init(t2)),
        w1=state_lib.NTMState(w1, adam_init(w1)),
        w2=state_lib.NTMState(w2, adam_init(w2)),
        step=jnp.zeros((), jnp.int32),
    )


def _guarded_volume(t1: jax.Array, t2: jax.Array) -> jax.Array:
    """Volume loss with the reference's non-finite->0 guard. The guard tests the SUM
    of both heads' volumes (trainV2_simt.py:417-421: the two log-dets are added first,
    then `if isinf or isnan: = 0.`), so one non-finite head zeroes BOTH contributions.
    Implemented with the double-where pattern so the backward pass through a singular
    Gram matrix cannot poison gradients with NaN."""
    raw = volume_loss(jax.lax.stop_gradient(t1)) + volume_loss(
        jax.lax.stop_gradient(t2)
    )
    ok = jnp.isfinite(raw)
    # Safe substitute: the identity-prior matrix (full rank by construction).
    safe_sub = jnp.zeros_like(t1).at[: t1.shape[1], :].set(jnp.eye(t1.shape[1]))
    t1_safe = jnp.where(ok, t1, safe_sub)
    t2_safe = jnp.where(ok, t2, safe_sub)
    return jnp.where(ok, volume_loss(t1_safe) + volume_loss(t2_safe), 0.0)


def _anchor_loss(pred_flat: jax.Array, t: jax.Array, teacher_flat: jax.Array) -> jax.Array:
    """Anchor loss for one head (trainV2_simt.py:375-384).

    pred_flat: (P, C+O) student logits (already detached by the caller);
    t: (C+O, C) transition matrix; teacher_flat: (P, C) upsampled teacher posterior.
    """
    total = pred_flat.shape[1]
    anchor_idx = jnp.argmax(pred_flat, axis=0)  # most-confident pixel per channel, (C+O,)
    anchors = teacher_flat[anchor_idx]  # (C+O, C)
    per_pixel_arg = jnp.argmax(pred_flat, axis=1)  # (P,)
    exist = jnp.zeros((total,), jnp.float32).at[per_pixel_arg].set(1.0)
    return jnp.sum(exist[:, None] * (t - anchors.astype(jnp.float32)) ** 2)


def make_simt_step(model, teacher_model, cfg, donate: bool = False):
    """Build the jitted SimT train step: (state, batch) -> (state, metrics).

    ``model`` is the open-set student (C+O channels); ``teacher_model`` the closed-set
    warmup network (C channels), applied in eval mode with constant weights — the
    reference re-loads the same state_dict into it every iteration (trainV2_simt.py:352),
    which is a no-op, so the teacher is simply state that never updates.
    """
    _, model_update = state_lib.make_model_tx(
        cfg.optim.momentum,
        cfg.optim.weight_decay,
        warmup=False,
        aspp_effective_branches=cfg.model.aspp_effective_branches,
    )
    _, adam_update = state_lib.make_adam_tx()

    c, o = cfg.model.num_classes, cfg.model.open_classes
    total = c + o
    s = cfg.simt
    class_dist = jnp.asarray(ntm_lib.load_class_dist(s.class_dist))
    ignore = cfg.ignore_label

    def ntm_fwd(p):
        return ntm_lib.ntm_forward(p, class_dist, c, o)

    def split_params(params):
        """(trainable, frozen) flat dicts. Differentiating only the trainable set lets
        XLA dead-code-eliminate the entire frozen backward — in the SimT stage the
        stem/layer1/layer2 are frozen (deeplab_multi.py:203-209), so their weight grads
        and the max-pool select-and-scatter backward never run."""
        flat = traverse_util.flatten_dict(params)
        train, frozen = {}, {}
        for k, v in flat.items():
            label = state_lib.param_label(
                k, warmup=False,
                aspp_effective_branches=cfg.model.aspp_effective_branches,
            )
            (frozen if label == state_lib.LABEL_FROZEN else train)[k] = v
        return train, frozen

    def merge_params(train, frozen):
        return traverse_util.unflatten_dict({**train, **frozen})

    iter_size = cfg.optim.iter_size

    # With donate=True the old state is donated: params/opt/NTM buffers alias in
    # place (saves the double-buffered ~350 MB of f32 state and a ~0.25 ms/step
    # copy tail on v5e). Donation is honored on BOTH the TPU and CPU backends
    # here, so it is opt-in: only callers that never touch a state object after
    # stepping it (the product loops and benches, which always reassign) pass
    # donate=True; tests and profiling tools rerun states freely by default.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(
        st: state_lib.SimTState, batch: Dict[str, jax.Array]
    ) -> Tuple[state_lib.SimTState, Dict[str, jax.Array]]:
        lr = poly_lr(cfg.optim.learning_rate, st.step, cfg.optim.num_steps, cfg.optim.power)
        lr_t = poly_lr(
            cfg.optim.learning_rate_t, st.step, cfg.optim.num_steps, cfg.optim.power
        )

        # ------- inner loop: optimise W1/W2 against the current T1/T2 (:327-339) -------
        def w_objective(w1p, w2p, t1p, t2p):
            w1m = ntm_lib.w_forward(w1p)
            w2m = ntm_lib.w_forward(w2p)
            return mse_sum(w1m @ ntm_fwd(t1p), jnp.zeros((total, c))) + mse_sum(
                w2m @ ntm_fwd(t2p), jnp.zeros((total, c))
            )

        def w_body(_, carry):
            # The W params advance each inner step; the T params do not, but their
            # gradients through MSE(W_i @ T, 0) accumulate into gt1/gt2 — the
            # reference's never-cleared ``.grad`` buffers (:317,:337,:435).
            w1, w2, gt1, gt2 = carry
            g1, g2, g3, g4 = jax.grad(w_objective, argnums=(0, 1, 2, 3))(
                w1.param, w2.param, st.t1.param, st.t2.param
            )
            u1, s1 = adam_update(g1, w1.opt_state, w1.param, lr_t)
            u2, s2 = adam_update(g2, w2.opt_state, w2.param, lr_t)
            return (
                state_lib.NTMState(optax.apply_updates(w1.param, u1), s1),
                state_lib.NTMState(optax.apply_updates(w2.param, u2), s2),
                gt1 + g3,
                gt2 + g4,
            )

        zt = jnp.zeros((total, c), jnp.float32)
        # Unrolled (static trip count): each iteration is ~30 microscopic ops on
        # 34x19 matrices, so a lax.while_loop's per-iteration overhead dominates its
        # body on TPU (~2 ms of the step measured as `while` HLOs); unrolling lets
        # XLA fuse across iterations.
        carry = (st.w1, st.w2, zt, zt)
        for _ in range(s.inner_w_steps):
            carry = w_body(0, carry)
        w1, w2, g_t1_inner, g_t2_inner = carry
        w1_mat = jax.lax.stop_gradient(ntm_lib.w_forward(w1.param))
        w2_mat = jax.lax.stop_gradient(ntm_lib.w_forward(w2.param))

        train_params, frozen_params = split_params(st.model.params)

        def one_subbatch(sub, batch_stats):
            """Teacher labelling + student forward + composite loss + grads for ONE
            sub-batch (the body of the reference's ``for sub_i in range(iter_size)``
            loop, :345-428). Returns grads (train, t1, t2), metrics, new batch_stats."""
            # uint8 wire format: float cast + mean-sub on device
            # (data/pipeline.py normalize_image; no-op for float32 batches).
            image = normalize_image(sub["image"], cfg.data.mean_bgr)
            label = normalize_label(sub["label"])

            # ------- teacher pseudo-labels (:351-362), fully on device -------
            if "teacher_prob8" in sub:
                # Cached teacher posterior (train/teacher_cache.py): the teacher is
                # frozen and deterministic per (image, mirror), so recomputing it every
                # step — as the reference does (:351-353) — is redundant across epochs.
                # The jit specialises on the batch structure, so both variants coexist.
                teacher_prob8 = sub["teacher_prob8"].astype(jnp.float32)
            else:
                _, teach2 = teacher_model.apply(
                    {"params": st.teacher_params,
                     "batch_stats": st.teacher_batch_stats},
                    image,
                    False,
                )
                # Softmax at stride 8 — reference order (:354); the upsample +
                # thresholding happen inside the streamed loss block.
                teacher_prob8 = jax.nn.softmax(teach2.astype(jnp.float32), axis=-1)

            # ------- student forward + composite loss (:370-424) -------
            def loss_fn(tparams, t1p, t2p):
                t1m = ntm_fwd(t1p)
                t2m = ntm_fwd(t2p)
                (x1, x2), mutated = model.apply(
                    {"params": merge_params(tparams, frozen_params),
                     "batch_stats": batch_stats},
                    image,
                    True,
                    mutable=["batch_stats"],
                )
                # All full-resolution losses — anchor (:374-384), class-posterior
                # refinement + CE (:387-395), placeholder (:398-399), noisy posterior
                # (:402-409) — in one streamed pass (ops/fused_losses.py).
                losses = simt_loss_block(
                    x1, x2, teacher_prob8, label, t1m, t2m,
                    num_classes=c, open_classes=o,
                    threshold_high=s.threshold_high, threshold_low=s.threshold_low,
                    lambda_place=s.lambda_place, lambda_seg=s.lambda_seg,
                    ignore_label=ignore, chunk_rows=s.loss_chunk_rows,
                )
                loss_p1, loss_p2 = losses["loss_p1"], losses["loss_p2"]
                loss_y1, loss_y2 = losses["loss_y1"], losses["loss_y2"]
                place, anchor = losses["place"], losses["anchor"]

                # Convex loss (:412-415): push T away from the other rows' convex hull.
                convex = -(
                    mse_sum(w1_mat @ t1m, jnp.zeros((total, c)))
                    + mse_sum(w2_mat @ t2m, jnp.zeros((total, c)))
                )

                # Volume loss (:417-421), guarded on the two-head sum.
                volume = _guarded_volume(t1m, t2m)

                loss_target = (
                    loss_p2 + loss_y2 + s.lambda_seg * loss_p1 + s.lambda_seg * loss_y1
                )
                loss = (
                    place
                    + loss_target
                    + s.lambda_convex * convex
                    + s.lambda_volume * volume
                    + s.lambda_anchor * anchor
                )
                metrics = {
                    "loss": loss,
                    "loss_seg_p": loss_p1 + loss_p2,
                    "loss_seg_y": loss_y1 + loss_y2,
                    "convex": convex,
                    "volume": volume,
                    "anchor": anchor,
                    "place": place,
                }
                # ``loss / iter_size`` before backward (:426-428). Metric conventions
                # at iter_size > 1 follow the reference exactly: the seg components
                # accumulate at 1/iter_size (:429-432) while Convex/Volume/Anchor/
                # Place print the LAST sub-batch's unscaled loop-final values
                # (:438-441 reads the loop variables after the sub-loop).
                return loss / iter_size, (metrics, mutated.get("batch_stats", {}))

            grads = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
            return grads(train_params, st.t1.param, st.t2.param)

        if iter_size == 1:
            (g_train, g_t1, g_t2), (metrics, new_stats) = one_subbatch(
                batch, st.model.batch_stats
            )
        else:
            # Batch arrays carry a leading (iter_size,) axis (train/loop.py stacks
            # ``iter_size`` loader batches). The sub-loop unrolls at trace time; BN
            # batch_stats chain through sub-batches like the reference's per-forward
            # running-stat updates.
            g_train = jax.tree.map(jnp.zeros_like, train_params)
            g_t1 = jnp.zeros((total, c), jnp.float32)
            g_t2 = jnp.zeros((total, c), jnp.float32)
            metrics = None
            new_stats = st.model.batch_stats
            # Reference metric conventions (:429-441): seg losses (and the composite
            # loss, for our CSV) accumulate at 1/iter_size; the NTM components are
            # the loop-final (last sub-batch) values, unscaled.
            _ACCUM = ("loss", "loss_seg_p", "loss_seg_y")
            for i in range(iter_size):
                sub = jax.tree.map(lambda a: a[i], batch)
                (sg_train, sg_t1, sg_t2), (m, new_stats) = one_subbatch(sub, new_stats)
                g_train = jax.tree.map(jnp.add, g_train, sg_train)
                g_t1, g_t2 = g_t1 + sg_t1, g_t2 + sg_t2
                if metrics is None:
                    metrics = {
                        k: (v / iter_size if k in _ACCUM else v) for k, v in m.items()
                    }
                else:
                    metrics = {
                        k: (metrics[k] + m[k] / iter_size if k in _ACCUM else m[k])
                        for k in metrics
                    }

        # The inner-loop T grads add to the main-loss T grads (the reference quirk
        # documented above); they are NOT scaled by iter_size (:337 vs :427).
        # clear_inner_t_grads=True is the opt-in paper-faithful mode (config.py):
        # it discards the leak exactly as a zero_grad between :339 and :345 would.
        if not getattr(s, "clear_inner_t_grads", False):
            g_t1 = g_t1 + g_t1_inner
            g_t2 = g_t2 + g_t2_inner
        # The optimizer partitions statically: it reads only the trainable leaves of
        # the grad tree, and frozen params pass through by reference (no HBM pass).
        params, opt_state = model_update(
            traverse_util.unflatten_dict(g_train), st.model.opt_state,
            st.model.params, lr,
        )
        u1, s1 = adam_update(g_t1, st.t1.opt_state, st.t1.param, lr_t)
        u2, s2 = adam_update(g_t2, st.t2.opt_state, st.t2.param, lr_t)

        new_state = state_lib.SimTState(
            model=state_lib.ModelState(params=params, batch_stats=new_stats,
                                       opt_state=opt_state),
            teacher_params=st.teacher_params,
            teacher_batch_stats=st.teacher_batch_stats,
            t1=state_lib.NTMState(optax.apply_updates(st.t1.param, u1), s1),
            t2=state_lib.NTMState(optax.apply_updates(st.t2.param, u2), s2),
            w1=w1,
            w2=w2,
            step=st.step + 1,
        )
        metrics["lr"] = lr
        return new_state, metrics

    return train_step
