"""Isolated benchmark: fused Pallas bottleneck vs the XLA all-dots Bottleneck at the
real stride-8 geometry (65x129 for 512x1024 input; ceil-mode pooling).

Usage: python tools/bench_fused_bottleneck.py [--geometry 65,129,256,1024,2]
"""

from __future__ import annotations

import argparse
import time

import common  # noqa: F401
from common import enable_compilation_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--geometry", default="65,129,256,1024,2",
                   help="h,w,planes,trunk,dilation")
    args = p.parse_args()
    h, w, planes, trunk, d = (int(v) for v in args.geometry.split(","))

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from simt_tpu.models.layers import Bottleneck
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bottleneck import fused_bottleneck

    print(f"backend={jax.default_backend()} geometry=({h},{w},{trunk}) "
          f"planes={planes} d={d}")
    gflop = 2 * h * w * (trunk * planes + 9 * planes * planes + planes * trunk) / 1e9

    def timeit(name, fn, *fn_args, flops=None):
        def run(k):
            out = None
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*fn_args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
            return time.perf_counter() - t0

        run(1)
        t1 = min(run(1), run(1))
        t5 = min(run(5), run(5))
        per = (t5 - t1) / 4 / REPS * 1e3
        tfs = flops / (per / 1e3) / 1e12 if flops else 0.0
        print(f"  {name:36s} {per:8.3f} ms   {tfs:6.1f} TFLOP/s")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    x = jax.random.normal(ks[0], (h, w, trunk), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (trunk, planes), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[2], (3, 3, planes, planes), jnp.float32) * 0.05
    w3 = jax.random.normal(ks[3], (planes, trunk), jnp.float32) * 0.05
    g1 = jnp.ones((planes,)); b1 = jnp.zeros((planes,))
    g2 = jnp.ones((planes,)); b2 = jnp.zeros((planes,))
    g3 = jnp.ones((trunk,)); b3 = jnp.zeros((trunk,))

    REPS = 10

    @jax.jit
    def fused_fwd_chain(x, w1, w2, w3):
        def body(c, _):
            y, stats = fused_bottleneck(c, w1, w2, w3, g1, b1, g2, b2, g3, b3, d)
            return y, stats[0][0]
        y, _ = jax.lax.scan(body, x, None, length=REPS)
        return y

    @jax.jit
    def fused_fwdbwd_chain(x, w1, w2, w3):
        def body(c, _):
            def lf(c, w1, w2, w3):
                y, _ = fused_bottleneck(c, w1, w2, w3, g1, b1, g2, b2, g3, b3, d)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            _, grads = jax.value_and_grad(lf, argnums=(0, 1, 2, 3))(c, w1, w2, w3)
            return grads[0].astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, None, length=REPS)
        return y

    # XLA baseline: the flax Bottleneck (all-dots) at batch 1
    block = Bottleneck(planes, dilation=d, dtype=jnp.bfloat16)
    xb = x[None]
    variables = block.init(jax.random.PRNGKey(1), xb, True)
    params, bstats = variables["params"], variables["batch_stats"]

    @jax.jit
    def xla_fwd_chain(params, xi):
        def body(c, _):
            y, _ = block.apply({"params": params, "batch_stats": bstats}, c, True,
                               mutable=["batch_stats"])
            return y.astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, xi, None, length=REPS)
        return y

    @jax.jit
    def xla_fwdbwd_chain(params, xi):
        def body(c, _):
            def lf(params, c):
                y, _ = block.apply({"params": params, "batch_stats": bstats}, c,
                                   True, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32) ** 2)
            _, grads = jax.value_and_grad(lf, argnums=(0, 1))(params, c)
            return grads[1].astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, xi, None, length=REPS)
        return y

    timeit("XLA block fwd (/rep)",
           lambda: xla_fwd_chain(params, xb), flops=gflop * 1e9)
    timeit("XLA block fwd+bwd (/rep)",
           lambda: xla_fwdbwd_chain(params, xb), flops=3 * gflop * 1e9)
    timeit("fused fwd (/rep)",
           lambda: fused_fwd_chain(x, w1, w2, w3), flops=gflop * 1e9)
    timeit("fused fwd+bwd (/rep)",
           lambda: fused_fwdbwd_chain(x, w1, w2, w3),
           flops=3 * gflop * 1e9)


if __name__ == "__main__":
    main()
