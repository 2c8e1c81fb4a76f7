"""Capture a jax.profiler trace of the student fwd+bwd (or the full SimT step) and
print the top device ops by total time, aggregated from the perfetto JSON.

Usage: python tools/profile_trace.py [--what step|fwdbwd|fwd] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile


def summarize(trace_dir: str, top: int, reps: int) -> None:
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace.json.gz found under", trace_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # HLO ops carry hlo_category in args; host-side python lanes do not.
    ops = [e for e in events
           if e.get("ph") == "X" and e.get("args", {}).get("hlo_category")]
    by_cat = collections.Counter()
    cat_n = collections.Counter()
    by_op = {}
    total = 0.0
    for e in ops:
        a = e["args"]
        cat = a["hlo_category"]
        dur = e.get("dur", 0) / 1e3
        by_cat[cat] += dur
        cat_n[cat] += 1
        total += dur
        name = e.get("name", "?")
        rec = by_op.setdefault(name, dict(ms=0.0, n=0, flops=0, args=a))
        rec["ms"] += dur
        rec["n"] += 1
        rec["flops"] += int(a.get("model_flops", 0) or 0)
    print(f"trace: {path}")
    print(f"device HLO total: {total / reps:.2f} ms/call over "
          f"{len(ops) // reps} ops/call")
    print("\nby hlo_category (ms/call):")
    for cat, ms in by_cat.most_common():
        print(f"  {cat:<40} {ms / reps:8.2f} ms  n/call={cat_n[cat] // reps}")
    print(f"\ntop ops: {'name':<24} {'ms/call':>8} {'TFLOP/s':>8}  long_name")
    items = sorted(by_op.items(), key=lambda kv: -kv[1]["ms"])
    for name, rec in items[:top]:
        tfs = rec["flops"] / (rec["ms"] / 1e3) / 1e12 if rec["ms"] else 0.0
        ln = rec["args"].get("long_name", "")[:110]
        print(f"  {name:<24} {rec['ms'] / reps:8.2f} {tfs:8.1f}  {ln}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="fwdbwd",
                   choices=["step", "fwdbwd", "fwd", "teacher", "trunk"])
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=1,
                   help="train-step batch size (bs>=4 crashes this env's tunnel)")
    args = p.parse_args()

    import common  # noqa: F401
    from common import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import flax.traverse_util as traverse_util

    from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
    from simt_tpu.data import synthetic
    from simt_tpu.models import deeplab_multi
    from simt_tpu.train import create_simt_state, make_simt_step
    from simt_tpu.train import state as state_lib

    cfg = TrainConfig(
        model=ModelConfig(num_classes=19, open_classes=15, openset=True,
                          compute_dtype="bfloat16"),
        optim=OptimConfig(), simt=SimTConfig(),
    )
    student = deeplab_multi(19, 15, openset=True, dtype=jnp.bfloat16)
    teacher = deeplab_multi(19, dtype=jnp.bfloat16)
    hw = (512, 1024)
    bs = args.batch_size
    init_x = jnp.zeros((bs, *hw, 3), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        sv = student.init(jax.random.PRNGKey(0), init_x, False)
        tv = teacher.init(jax.random.PRNGKey(1), init_x, False)
    device = jax.devices()[0]
    sv = jax.device_put(sv, device)
    tv = jax.device_put(tv, device)
    state = create_simt_state(sv, tv, cfg, jax.random.PRNGKey(2))

    raw = synthetic.synthetic_batch(batch_size=bs, hw=hw, num_classes=19, seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}

    if args.what == "trunk":
        import flax.linen as nn

        from simt_tpu.models.layers import ASPPHead, res_stage

        class Trunk34(nn.Module):
            @nn.compact
            def __call__(self, x, train=True):
                x = res_stage(x, 3, 256, 23, stride=1, dilation=2, train=train,
                              dtype=jnp.bfloat16)
                x1 = ASPPHead(num_classes=34, dtype=jnp.bfloat16, name="layer5")(x)
                x = res_stage(x, 4, 512, 3, stride=1, dilation=4, train=train,
                              dtype=jnp.bfloat16)
                x2 = ASPPHead(num_classes=34, dtype=jnp.bfloat16, name="layer6")(x)
                return x1, x2

        mod = Trunk34()
        xt = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 128, 512),
                               jnp.bfloat16)
        tvars = mod.init(jax.random.PRNGKey(1), xt, True)

        @jax.jit
        def trunk_fwdbwd(p, bstats, xi):
            def lf(p):
                (x1, x2), _ = mod.apply({"params": p, "batch_stats": bstats},
                                        xi, True, mutable=["batch_stats"])
                return jnp.sum(x1.astype(jnp.float32) ** 2) + jnp.sum(
                    x2.astype(jnp.float32) ** 2)
            return jax.grad(lf)(p)

        def fn():
            return trunk_fwdbwd(tvars["params"], tvars.get("batch_stats", {}), xt)
    elif args.what == "step":
        step = make_simt_step(student, teacher, cfg)  # no donation: state rerun for timing

        def fn():
            st, m = step(state, batch)
            return m["loss"]
    elif args.what == "teacher":
        @jax.jit
        def teacher_fwd(tp, tbs, img):
            _, t2 = teacher.apply(
                {"params": tp, "batch_stats": tbs}, img, False)
            return jax.nn.softmax(t2.astype(jnp.float32), axis=-1)

        def fn():
            return teacher_fwd(state.teacher_params, state.teacher_batch_stats,
                               batch["image"])
    else:
        def split_params(params):
            flat = traverse_util.flatten_dict(params)
            train, frozen = {}, {}
            for k, v in flat.items():
                label = state_lib.param_label(
                    k, warmup=False,
                    aspp_effective_branches=cfg.model.aspp_effective_branches)
                (frozen if label == state_lib.LABEL_FROZEN else train)[k] = v
            return train, frozen

        train_params, frozen_params_ = split_params(state.model.params)

        @jax.jit
        def fwdbwd(tp, frozen, bstats, img):
            def lf(tp):
                params = traverse_util.unflatten_dict({**tp, **frozen})
                (x1, x2), _ = student.apply(
                    {"params": params, "batch_stats": bstats},
                    img, True, mutable=["batch_stats"])
                return jnp.sum(x1.astype(jnp.float32) ** 2) + jnp.sum(
                    x2.astype(jnp.float32) ** 2)
            return jax.grad(lf)(tp)

        @jax.jit
        def fwd(p, bstats, img):
            (x1, x2), _ = student.apply(
                {"params": p, "batch_stats": bstats},
                img, True, mutable=["batch_stats"])
            return x1

        if args.what == "fwdbwd":
            def fn():
                return fwdbwd(train_params, frozen_params_,
                              state.model.batch_stats, batch["image"])
        else:
            def fn():
                return fwd(state.model.params, state.model.batch_stats,
                           batch["image"])

    # compile outside the trace
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

    d = tempfile.mkdtemp(prefix="simt_trace_")
    jax.profiler.start_trace(d)
    for _ in range(args.reps):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    jax.profiler.stop_trace()
    summarize(d, args.top, args.reps)


if __name__ == "__main__":
    main()
