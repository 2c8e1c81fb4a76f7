#!/usr/bin/env python3
"""Minimal repro + alternatives for the wide-ASPP x Pallas-eval TPU worker fault.

Round-3 finding: composing the merged-N wide ASPP head (ops/conv.py::aspp_sum_wide)
with the fused Pallas eval kernel (ops/pallas/eval_fused.py) in ONE two-scale eval
program reproducibly faults the v5e tunnel worker (UNAVAILABLE; the chip recovers on
the next process). Each piece alone runs fine. Round-3 production eval therefore
cloned models with aspp_wide=False; since round 4 the shipped structure is
`split_wide` below — wide heads kept, forward jitted separately from the Pallas
hist program (see README.md "Outcome (wired in round 4)" and eval/evaluate.py).

This script pins the repro and measures the cheap restructurings, one variant per
process (a fault kills the process, so run them separately):

  python repro.py fused_wide      # THE FAULT: wide heads + Pallas hist, one program
  python repro.py fused_pertap    # production path: per-tap heads + Pallas hist
  python repro.py split_wide      # wide heads, forward jitted separately from the
                                  # Pallas hist program (tests the composition theory)
  python repro.py nonpallas_wide  # wide heads + unfused upsample/argmax + fast_hist

Each variant prints a one-line JSON with img/s (honest readback sync) or the fault.
Run on the real chip: `python experiments/wide_aspp_eval_fault/repro.py <variant>`.
Measured results live in README.md next to this file.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

VARIANTS = ("fused_wide", "fused_pertap", "split_wide", "nonpallas_wide")


def main(variant: str):
    import jax

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
    cache = os.path.join(root, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(cache, jax.default_backend()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from simt_tpu.models import deeplab_multi
    from simt_tpu.ops import fast_hist
    from simt_tpu.ops.interp import upsample_bilinear_align_corners as up
    from simt_tpu.ops.pallas import multiscale_argmax_hist

    out_hw, c = (1024, 2048), 19
    wide = variant != "fused_pertap"
    model = deeplab_multi(19, 15, openset=True, dtype=jnp.bfloat16)
    if not wide:
        model = model.clone(aspp_wide=False)
    assert model.aspp_wide == wide

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 512, 1024, 3).astype(np.float32))
    x640 = jnp.asarray(rng.randn(1, 640, 1280, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, c, (1, *out_hw)))
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 1024, 3)),
                               False)
    variables = jax.device_put(variables, jax.devices()[0])

    def head2(v, image):
        return model.apply(v, image, False)[1][..., :c].astype(jnp.float32)

    if variant in ("fused_wide", "fused_pertap"):
        # ONE program: both forwards + the Pallas kernel (eval/evaluate.py fast path).
        @jax.jit
        def run(v, xa, xb, g):
            a, b = head2(v, xa), head2(v, xb)
            return jnp.sum(jax.lax.map(
                lambda t: multiscale_argmax_hist(t[0], t[1], t[2], out_hw=out_hw,
                                                 num_classes=c),
                (a, b, g)), axis=0)

        call = lambda: run(variables, x, x640, gt)
    elif variant == "split_wide":
        # Forwards in their own jits; the Pallas kernel in a third.
        fwd = jax.jit(head2)

        @jax.jit
        def hist_only(a, b, g):
            return jnp.sum(jax.lax.map(
                lambda t: multiscale_argmax_hist(t[0], t[1], t[2], out_hw=out_hw,
                                                 num_classes=c),
                (a, b, g)), axis=0)

        call = lambda: hist_only(fwd(variables, x), fwd(variables, x640), gt)
    else:  # nonpallas_wide
        @jax.jit
        def run(v, xa, xb, g):
            logits = up(head2(v, xa), out_hw) + up(head2(v, xb), out_hw)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return fast_hist(g, pred, c)

        call = lambda: run(variables, x, x640, gt)

    h = call()
    _ = np.asarray(h)  # readback barrier (block_until_ready lies on the tunnel)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        h = call()
    _ = np.asarray(h)
    img_per_sec = n / (time.perf_counter() - t0)
    print(json.dumps({"variant": variant, "img_per_sec": round(img_per_sec, 2)}))


if __name__ == "__main__":
    v = sys.argv[1] if len(sys.argv) > 1 else "fused_wide"
    assert v in VARIANTS, f"variant must be one of {VARIANTS}"
    main(v)
