"""Bisect the composed-graph overhead: time layer3+layer4+heads in ONE jit,
comparing against the sum of the isolated stages (tools/profile_model.py).

Usage: python tools/profile_trunk.py
"""
import time

import common  # noqa: F401
from common import enable_compilation_cache

enable_compilation_cache()

import flax.linen as nn
import jax
import jax.numpy as jnp

from simt_tpu.models.layers import ASPPHead, res_stage


class Trunk34(nn.Module):
    """layer3 + layer5-head + layer4 + layer6-head (the trainable region)."""

    @nn.compact
    def __call__(self, x, train=True):
        x = res_stage(x, 3, 256, 23, stride=1, dilation=2, train=train,
                      dtype=jnp.bfloat16)
        x1 = ASPPHead(num_classes=34, dtype=jnp.bfloat16, name="layer5")(x)
        x = res_stage(x, 4, 512, 3, stride=1, dilation=4, train=train,
                      dtype=jnp.bfloat16)
        x2 = ASPPHead(num_classes=34, dtype=jnp.bfloat16, name="layer6")(x)
        return x1, x2


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


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    mod = Trunk34()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 128, 512), jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(1), x, True)
    params, bs = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def fwd(p, xi):
        (x1, x2), _ = mod.apply({"params": p, "batch_stats": bs}, xi, True,
                                mutable=["batch_stats"])
        return x1, x2

    timeit("trunk34 fwd", fwd, params, x)

    @jax.jit
    def fwdbwd(p, xi):
        def lf(p):
            (x1, x2), _ = mod.apply({"params": p, "batch_stats": bs}, xi, True,
                                    mutable=["batch_stats"])
            return jnp.sum(x1.astype(jnp.float32) ** 2) + jnp.sum(
                x2.astype(jnp.float32) ** 2)
        return jax.grad(lf)(p)

    timeit("trunk34 fwd+bwd", fwdbwd, params, x)


if __name__ == "__main__":
    main()
