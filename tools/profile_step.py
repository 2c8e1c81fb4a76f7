"""Decompose the SimT train-step cost on the current backend.

Times, with the marginal-cost harness (slope between 1 and 5 chained invocations of
the same compiled fn — the tunnel's constant dispatch+readback cancels):

  full step | teacher fwd | student fwd | student fwd+bwd (dummy loss, trainable-only)
  | loss block fwd | loss block fwd+grad | W inner loop | optimizer updates

Usage: python tools/profile_step.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import common  # noqa: F401

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from common import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import optax

    from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
    from simt_tpu.data import synthetic
    from simt_tpu.models import deeplab_multi
    from simt_tpu.models import ntm as ntm_lib
    from simt_tpu.ops import mse_sum
    from simt_tpu.ops.fused_losses import simt_loss_block
    from simt_tpu.train import create_simt_state, make_simt_step
    from simt_tpu.train import state as state_lib
    import flax.traverse_util as traverse_util

    cfg = TrainConfig(
        model=ModelConfig(num_classes=19, open_classes=15, openset=True,
                          compute_dtype="bfloat16"),
        optim=OptimConfig(),
        simt=SimTConfig(),
    )
    student = deeplab_multi(19, 15, openset=True, dtype=jnp.bfloat16)
    teacher = deeplab_multi(19, dtype=jnp.bfloat16)
    hw = (512, 1024)

    init_x = jnp.zeros((1, *hw, 3), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        sv = student.init(jax.random.PRNGKey(0), init_x, False)
        tv = teacher.init(jax.random.PRNGKey(1), init_x, False)
    device = jax.devices()[0]
    sv = jax.device_put(sv, device)
    tv = jax.device_put(tv, device)
    state = create_simt_state(sv, tv, cfg, jax.random.PRNGKey(2))
    step = make_simt_step(student, teacher, cfg)  # no donation: state rerun for timing

    raw = synthetic.synthetic_batch(batch_size=1, hw=hw, num_classes=19, seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}
    print(f"backend={jax.default_backend()}")

    def timeit(name, fn, *fn_args):
        def run(k):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn(*fn_args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
            return time.perf_counter() - t0

        run(1)
        t1 = min(run(1), run(1))
        t5 = min(run(5), run(5))
        per = (t5 - t1) / 4 * 1e3
        print(f"  {name:44s} {per:8.2f} ms")
        return per

    # full step (state-carried chaining happens naturally via same-input reruns)
    def full(st, b):
        st2, m = step(st, b)
        return m["loss"]

    timeit("FULL step", full, state, batch)

    # teacher fwd + softmax
    @jax.jit
    def teacher_fwd(tp, tbs, img):
        _, t2 = teacher.apply({"params": tp, "batch_stats": tbs}, img, False)
        return jax.nn.softmax(t2.astype(jnp.float32), axis=-1)

    timeit("teacher fwd (eval) + softmax", teacher_fwd,
           state.teacher_params, state.teacher_batch_stats, batch["image"])

    # student fwd (train mode)
    @jax.jit
    def student_fwd(p, bs, img):
        (x1, x2), mut = student.apply(
            {"params": p, "batch_stats": bs}, img, True, mutable=["batch_stats"])
        return x1, x2

    timeit("student fwd (train-mode BN)", student_fwd,
           state.model.params, state.model.batch_stats, batch["image"])

    # student fwd+bwd wrt trainable params only, dummy scalar head loss
    def split_params(params):
        flat = traverse_util.flatten_dict(params)
        train, frozen = {}, {}
        for k, v in flat.items():
            label = state_lib.param_label(
                k, warmup=False,
                aspp_effective_branches=cfg.model.aspp_effective_branches)
            (frozen if label == state_lib.LABEL_FROZEN else train)[k] = v
        return train, frozen

    train_params, frozen_params = split_params(state.model.params)

    @jax.jit
    def student_fwdbwd(tp, img):
        def lf(tp):
            params = traverse_util.unflatten_dict({**tp, **frozen_params})
            (x1, x2), mut = student.apply(
                {"params": params, "batch_stats": state.model.batch_stats},
                img, True, mutable=["batch_stats"])
            return jnp.sum(x1.astype(jnp.float32) ** 2) + jnp.sum(
                x2.astype(jnp.float32) ** 2)
        return jax.grad(lf)(tp)

    timeit("student fwd+bwd (dummy head loss)", student_fwdbwd,
           train_params, batch["image"])

    # loss block, given fixed head logits + teacher posterior
    k = jax.random.PRNGKey(3)
    h8, w8 = hw[0] // 8, hw[1] // 8
    x1 = jax.random.normal(k, (1, h8, w8, 34), jnp.float32)
    x2 = jax.random.normal(jax.random.fold_in(k, 1), (1, h8, w8, 34), jnp.float32)
    tp8 = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(k, 2), (1, h8, w8, 19), jnp.float32), -1)
    cd = jnp.asarray(ntm_lib.load_class_dist(cfg.simt.class_dist))
    t1m = ntm_lib.ntm_forward(state.t1.param, cd, 19, 15)
    t2m = ntm_lib.ntm_forward(state.t2.param, cd, 19, 15)

    def lb(x1, x2, t1m, t2m):
        losses = simt_loss_block(
            x1, x2, tp8, batch["label"], t1m, t2m, num_classes=19, open_classes=15,
            threshold_high=cfg.simt.threshold_high,
            threshold_low=cfg.simt.threshold_low,
            lambda_place=cfg.simt.lambda_place, lambda_seg=cfg.simt.lambda_seg,
            ignore_label=cfg.ignore_label)
        return (losses["loss_p1"] + losses["loss_p2"] + losses["loss_y1"]
                + losses["loss_y2"] + losses["place"] + losses["anchor"])

    timeit("loss block fwd", jax.jit(lb), x1, x2, t1m, t2m)
    timeit("loss block fwd+grad(x1,x2,T)",
           jax.jit(lambda *a: jax.grad(lb, argnums=(0, 1, 2, 3))(*a)),
           x1, x2, t1m, t2m)

    # W inner loop
    _, adam_update = state_lib.make_adam_tx()
    total, c = 34, 19

    def ntm_fwd(p):
        return ntm_lib.ntm_forward(p, cd, c, 15)

    def w_objective(w1p, w2p, t1p, t2p):
        w1m = ntm_lib.w_forward(w1p)
        w2m = ntm_lib.w_forward(w2p)
        return mse_sum(w1m @ ntm_fwd(t1p), jnp.zeros((total, c))) + mse_sum(
            w2m @ ntm_fwd(t2p), jnp.zeros((total, c)))

    @jax.jit
    def w_loop(w1, w2, t1p, t2p):
        def body(_, carry):
            w1, w2, gt1, gt2 = carry
            g1, g2, g3, g4 = jax.grad(w_objective, argnums=(0, 1, 2, 3))(
                w1.param, w2.param, t1p, t2p)
            u1, s1 = adam_update(g1, w1.opt_state, w1.param, 1e-3)
            u2, s2 = adam_update(g2, w2.opt_state, w2.param, 1e-3)
            return (state_lib.NTMState(optax.apply_updates(w1.param, u1), s1),
                    state_lib.NTMState(optax.apply_updates(w2.param, u2), s2),
                    gt1 + g3, gt2 + g4)
        zt = jnp.zeros((total, c), jnp.float32)
        out = jax.lax.fori_loop(0, cfg.simt.inner_w_steps, body,
                                (w1, w2, zt, zt))
        return out[2]

    timeit("W inner loop (10 Adam steps)", w_loop,
           state.w1, state.w2, state.t1.param, state.t2.param)

    # model optimizer update on zero grads
    _, model_update = state_lib.make_model_tx(
        cfg.optim.momentum, cfg.optim.weight_decay, warmup=False,
        aspp_effective_branches=cfg.model.aspp_effective_branches)

    @jax.jit
    def opt_step(params, opt_state):
        g = jax.tree.map(jnp.zeros_like, params)
        new_params, os2 = model_update(g, opt_state, params, 1e-4)
        return new_params

    timeit("model SGD update (zero grads)", opt_step,
           state.model.params, state.model.opt_state)


if __name__ == "__main__":
    main()
