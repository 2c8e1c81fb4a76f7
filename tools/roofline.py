"""Whole-step roofline for the SimT train step on one TPU chip.

Answers "is the step at speed of light?" with program-level numbers rather than
per-op ones: total step FLOPs and HBM bytes from XLA's cost analysis of the
compiled executable, achieved TFLOP/s and GB/s from an honest wall-clock timing
(host readback sync — block_until_ready is not a true sync on the axon tunnel),
and the implied roofline bounds against the v5e chip peaks.

The reference hot loop this bounds: model/deeplab_multi.py:57-119 under
tools/trainV2_simt.py:370,428 (fwd+bwd+NTM losses+SGD, bs1 512x1024).

Usage: python tools/roofline.py [--batch-size N] [--n 30]
Prints one human block + one JSON line (committable artifact).
"""

from __future__ import annotations

import argparse
import json
import time

# TPU v5e (one chip): public peak numbers.
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--n", type=int, default=30)
    args = p.parse_args()

    import common  # noqa: F401
    from common import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
    from simt_tpu.data import synthetic
    from simt_tpu.models import deeplab_multi
    from simt_tpu.train import create_simt_state, make_simt_step

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
    # No donation: we re-run the same state for timing.
    step = make_simt_step(student, teacher, cfg)

    raw = synthetic.synthetic_batch(batch_size=bs, hw=hw, num_classes=19, seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}

    # XLA cost analysis of the compiled executable (whole-program totals).
    lowered = jax.jit(step).lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    hbm_bytes = float(ca.get("bytes accessed", 0.0))

    # Warmup + timed window with a host readback barrier (CLAUDE.md gotcha).
    st = state
    for _ in range(3):
        st, metrics = step(st, batch)
    float(metrics["loss"])
    n = args.n
    t0 = time.perf_counter()
    st = state
    for _ in range(n):
        st, metrics = step(st, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n

    tflops = flops / dt / 1e12
    gbs = hbm_bytes / dt / 1e9
    mfu = tflops / V5E_BF16_TFLOPS
    hbm_frac = gbs / V5E_HBM_GBS
    # Roofline lower bounds on the step time from each resource alone.
    t_flops_ms = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
    t_hbm_ms = hbm_bytes / (V5E_HBM_GBS * 1e9) * 1e3

    print(f"step: bs{bs} 512x1024  measured {dt * 1e3:.2f} ms/step "
          f"({1.0 / dt:.2f} steps/s)")
    print(f"XLA cost analysis: {flops / 1e12:.3f} TFLOP, "
          f"{hbm_bytes / 1e9:.2f} GB HBM traffic, "
          f"arithmetic intensity {flops / max(hbm_bytes, 1):.1f} FLOP/B")
    print(f"achieved: {tflops:.1f} TFLOP/s = {mfu * 100:.1f}% of v5e bf16 peak "
          f"({V5E_BF16_TFLOPS:.0f}); {gbs:.0f} GB/s = {hbm_frac * 100:.1f}% of "
          f"HBM peak ({V5E_HBM_GBS:.0f})")
    print(f"roofline floors: compute-only {t_flops_ms:.2f} ms, "
          f"HBM-only {t_hbm_ms:.2f} ms, max {max(t_flops_ms, t_hbm_ms):.2f} ms "
          f"-> headroom {dt * 1e3 / max(t_flops_ms, t_hbm_ms):.2f}x")
    print(json.dumps({
        "metric": f"simt_step_roofline_bs{bs}_512x1024",
        "ms_per_step": round(dt * 1e3, 2),
        "steps_per_sec": round(1.0 / dt, 2),
        "tflop_per_step": round(flops / 1e12, 3),
        "gb_per_step": round(hbm_bytes / 1e9, 3),
        "achieved_tflops": round(tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(mfu, 3),
        "achieved_gbs": round(gbs, 1),
        "hbm_frac": round(hbm_frac, 3),
        "floor_ms_compute": round(t_flops_ms, 2),
        "floor_ms_hbm": round(t_hbm_ms, 2),
        "headroom_x": round(dt * 1e3 / max(t_flops_ms, t_hbm_ms), 2),
    }))


if __name__ == "__main__":
    main()
