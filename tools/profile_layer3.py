"""Profile the layer3 bottleneck cost pieces on the current backend.

The SimT step budget is dominated by layer3 (23 bottlenecks, planes=256, dilation=2,
64x128 spatial at 1024 trunk channels; reference model/deeplab_multi.py:57-101 under
tools/trainV2_simt.py:370). This tool measures, with honest host-readback timing
(CLAUDE.md: block_until_ready is not a true sync on the axon tunnel):

  a) XLA bottleneck fwd and fwd+bwd (the current default path, models/layers.py),
  b) a pure-GEMM floor: conv1/conv3 as matmuls + conv2 as 9 static-slice GEMMs
     (what a perfect implicit-GEMM lowering would cost, ignoring BN stats plumbing),
  c) the fused Pallas bottleneck kernel (experiments/pallas_bottleneck/) — see
     its README for measured status.

Each variant is scan-chained REPS times inside one jit to amortise the ~5 ms
dispatch floor of the tunnel.

Usage: python tools/profile_layer3.py [--reps 20] [--platform cpu]
"""

from __future__ import annotations

import argparse
import functools
import time

import common  # noqa: F401  (sys.path bootstrap)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--platform", default=None)
    p.add_argument("--hw", default="64,128")
    p.add_argument("--dilation", type=int, default=2)
    p.add_argument("--planes", type=int, default=256)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from common import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from simt_tpu.models.layers import Bottleneck

    H, W = (int(v) for v in args.hw.split(","))
    planes = args.planes
    trunk = planes * 4
    d = args.dilation
    REPS = args.reps

    print(f"backend={jax.default_backend()} geometry=({H},{W},{trunk}) planes={planes} "
          f"dilation={d} reps={REPS}")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, H, W, trunk), jnp.bfloat16)

    block = Bottleneck(planes, dilation=d, dtype=jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(1), x, True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    gflop_fwd = 2 * H * W * (trunk * planes + 9 * planes * planes + planes * trunk) / 1e9

    def timeit(name, fn, *fn_args, flops_per_rep=None):
        # Marginal-cost timing: the tunnel adds a large constant (dispatch + readback
        # round-trip) per measurement, so time k=1 and k=5 chained invocations of the
        # same compiled fn and report the slope — constant overhead cancels.
        def run(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*fn_args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))  # honest barrier
            return time.perf_counter() - t0

        run(1)  # warm compile
        t1 = min(run(1), run(1))
        t5 = min(run(5), run(5))
        per = (t5 - t1) / 4 / REPS * 1e3
        tfs = (flops_per_rep / (per / 1e3) / 1e12) if flops_per_rep else 0.0
        print(f"  {name:34s} {per:8.3f} ms/rep   {tfs:6.1f} TFLOP/s")
        return per

    # ---- a) XLA bottleneck --------------------------------------------------------
    def apply_block(xi, train):
        return block.apply(
            {"params": params, "batch_stats": batch_stats}, xi, train,
            mutable=["batch_stats"] if train else False,
        )

    @jax.jit
    def fwd_chain(xi):
        def body(c, _):
            y, _ = apply_block(c, True)
            return y.astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, xi, None, length=REPS)
        return y

    print("\n[a] XLA bottleneck (current default path)")
    timeit("fwd (train-mode BN)", fwd_chain, x, flops_per_rep=gflop_fwd * 1e9)

    def loss_fn(p, xi):
        y, _ = block.apply({"params": p, "batch_stats": batch_stats}, xi, True,
                           mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    @jax.jit
    def fwdbwd_chain(p, xi):
        def body(c, _):
            l, (dp, dx) = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, c)
            return dx.astype(jnp.bfloat16), l
        y, ls = jax.lax.scan(body, xi, None, length=REPS)
        return ls

    timeit("fwd+bwd (grad wrt params+input)", fwdbwd_chain, params, x,
           flops_per_rep=3 * gflop_fwd * 1e9)

    # ---- b) pure-GEMM floor -------------------------------------------------------
    print("\n[b] pure-GEMM floor (no BN plumbing)")
    w1 = jax.random.normal(key, (trunk, planes), jnp.bfloat16) * 0.01
    w2 = jax.random.normal(key, (3, 3, planes, planes), jnp.bfloat16) * 0.01
    w3 = jax.random.normal(key, (planes, trunk), jnp.bfloat16) * 0.01

    def gemm_block(xi, w1, w2, w3):
        h = xi.reshape(H * W, trunk)
        h1 = jax.nn.relu(jnp.dot(h, w1, preferred_element_type=jnp.float32))
        h1 = h1.astype(jnp.bfloat16).reshape(H, W, planes)
        h1p = jnp.pad(h1, ((d, d), (d, d), (0, 0)))
        acc = jnp.zeros((H * W, planes), jnp.float32)
        for kh in range(3):
            for kw in range(3):
                a = jax.lax.dynamic_slice(h1p, (kh * d, kw * d, 0), (H, W, planes))
                acc += jnp.dot(a.reshape(H * W, planes), w2[kh, kw],
                               preferred_element_type=jnp.float32)
        h2 = jax.nn.relu(acc).astype(jnp.bfloat16)
        out = jnp.dot(h2, w3, preferred_element_type=jnp.float32)
        return jax.nn.relu(out.astype(jnp.bfloat16) + h.astype(jnp.bfloat16))

    @jax.jit
    def gemm_fwd_chain(xi):
        def body(c, _):
            y = gemm_block(c[0], w1, w2, w3)
            return (y.reshape(1, H, W, trunk),), None
        (y,), _ = jax.lax.scan(body, (xi,), None, length=REPS)
        return y

    timeit("fwd", gemm_fwd_chain, x, flops_per_rep=gflop_fwd * 1e9)

    def gemm_loss(ws, xi):
        y = gemm_block(xi, *ws)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    @jax.jit
    def gemm_fwdbwd_chain(ws, xi):
        def body(c, _):
            l, (dw, dx) = jax.value_and_grad(gemm_loss, argnums=(0, 1))(ws, c)
            return dx.astype(jnp.bfloat16), l
        y, ls = jax.lax.scan(body, xi[0], None, length=REPS)
        return ls

    timeit("fwd+bwd", gemm_fwdbwd_chain, (w1, w2, w3), x,
           flops_per_rep=3 * gflop_fwd * 1e9)

    # ---- b2) XLA dilated conv2 alone ---------------------------------------------
    print("\n[b2] conv2 (3x3 dilated) alone")
    gflop_c2 = 2 * H * W * 9 * planes * planes / 1e9
    xc = jax.random.normal(key, (1, H, W, planes), jnp.bfloat16)

    @jax.jit
    def xla_conv_chain(xi):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, w2, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, xi, None, length=REPS)
        return y

    timeit("XLA conv_general_dilated fwd", xla_conv_chain, xc,
           flops_per_rep=gflop_c2 * 1e9)

    # ---- c) fused Pallas bottleneck: see experiments/pallas_bottleneck/ ------------
    print("\n[c] fused Pallas bottleneck: benchmarked separately "
          "(experiments/pallas_bottleneck: bench_fused_bottleneck.py + README)")


if __name__ == "__main__":
    main()
