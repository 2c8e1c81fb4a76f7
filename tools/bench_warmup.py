#!/usr/bin/env python3
"""Warmup-stage train-step throughput (secondary metric; headline is bench.py).

The reference shipped NO warmup-stage run log (logs/ holds SimT-stage runs only), so
there is no measured warmup baseline. The SimT-stage rate (~1.29 steps/s,
BASELINE.md) is used as a conservative proxy denominator — the warmup loop does
strictly less work per step than the SimT loop (no teacher forward, no NTM losses),
so the true reference warmup rate is at least this, and the reported multiplier is an
upper bound labelled as such. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# SimT-stage reference rate as a conservative proxy (see module docstring).
BASELINE_PROXY = 1.29


def main():
    import jax
    from common import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig
    from simt_tpu.data import synthetic
    from simt_tpu.models import deeplab_multi
    from simt_tpu.train import create_warmup_state, make_warmup_step

    cfg = TrainConfig(
        stage="warmup",
        model=ModelConfig(num_classes=19, compute_dtype="bfloat16"),
        optim=OptimConfig(),
    )
    model = deeplab_multi(19, dtype=jnp.bfloat16)
    hw = (512, 1024)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), False)
    variables = jax.device_put(variables, jax.devices()[0])
    state = create_warmup_state(model, variables, cfg)
    step = make_warmup_step(model, cfg, donate=True)

    raw = synthetic.synthetic_batch(batch_size=1, hw=hw, num_classes=19, seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}
    for _ in range(3):
        state, m = step(state, batch)
    float(m["loss_seg2"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    float(m["loss_seg2"])
    sps = n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "warmup_train_steps_per_sec_bs1_512x1024",
        "value": round(sps, 2), "unit": "steps/s",
        # vs the SimT-stage reference rate (no warmup log exists; upper bound).
        "vs_baseline": round(sps / BASELINE_PROXY, 2),
        "baseline_is_simt_stage_proxy": True,
    }))


if __name__ == "__main__":
    main()
