"""Stage-by-stage fwd+bwd decomposition of the DeepLabv2 student at train geometry.

Locates where the full-model backward time goes (profile_step.py showed student
fwd+bwd at ~56 ms vs 8.4 ms fwd — far above the 2.5x of an isolated bottleneck).
Times each ResNet stage and each ASPP head separately with the marginal-cost harness.

Usage: python tools/profile_model.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import functools
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

    import flax.linen as nn
    import jax.numpy as jnp

    from simt_tpu.models.layers import ASPPHead, res_stage

    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")

    def timeit(name, fn, *fn_args):
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
        per = (t5 - t1) / 4 * 1e3
        print(f"  {name:44s} {per:8.2f} ms")
        return per

    class Stage(nn.Module):
        idx: int
        planes: int
        blocks: int
        stride: int
        dilation: int

        @nn.compact
        def __call__(self, x, train=True):
            return res_stage(x, self.idx, self.planes, self.blocks,
                             stride=self.stride, dilation=self.dilation,
                             train=train, dtype=jnp.bfloat16)

    def bench_module(name, mod, in_shape, train=True):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, in_shape, jnp.bfloat16)
        variables = mod.init(jax.random.PRNGKey(1), x, train)
        params = variables["params"]
        bs = variables.get("batch_stats", {})

        @jax.jit
        def fwd(p, xi):
            out = mod.apply({"params": p, "batch_stats": bs}, xi, train,
                            mutable=["batch_stats"] if train else False)
            return out[0] if isinstance(out, tuple) else out

        timeit(f"{name} fwd", fwd, params, x)

        @jax.jit
        def fwdbwd(p, xi):
            def lf(p):
                out = mod.apply({"params": p, "batch_stats": bs}, xi, train,
                                mutable=["batch_stats"] if train else False)
                y = out[0] if isinstance(out, tuple) else out
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(lf)(p)

        timeit(f"{name} fwd+bwd", fwdbwd, params, x)

    # Stages at the 512x1024-input geometry.
    bench_module("layer1 (3 blocks, 64p, 128x256)",
                 Stage(1, 64, 3, 1, 1), (1, 128, 256, 64))
    bench_module("layer2 (4 blocks, 128p, s2)",
                 Stage(2, 128, 4, 2, 1), (1, 128, 256, 256))
    bench_module("layer3 (23 blocks, 256p, d2)",
                 Stage(3, 256, 23, 1, 2), (1, 64, 128, 512))
    bench_module("layer4 (3 blocks, 512p, d4)",
                 Stage(4, 512, 3, 1, 4), (1, 64, 128, 1024))

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return ASPPHead(num_classes=34, dtype=jnp.bfloat16, name="head")(x)

    bench_module("ASPP head 1024ch -> 34", Head(), (1, 64, 128, 1024))
    bench_module("ASPP head 2048ch -> 34", Head(), (1, 64, 128, 2048))


if __name__ == "__main__":
    main()
