#!/usr/bin/env python3
"""TPU soak run: sustain the SimT train step for hundreds of steps on the real chip.

The 20-step bench (bench.py) cannot catch slow recompiles, HBM fragmentation, or
host-side leak drift; this drives the SAME jitted step for --steps steps (default
600), reads back metrics every --window steps (default 100, an honest sync point),
and asserts

  - every windowed metric stays finite across the whole run,
  - no step-function recompile happens after warmup (jit cache-miss counter),
  - the slowest window sustains >= --min-rate steps/s (default: 90% of the
    bench claim, i.e. 0.9 * 35.9 = 32.3).

Prints ONE JSON line:
  {"metric": "simt_soak_steps_per_sec_min_window", "value": ..., "unit": "steps/s",
   "windows": [...], "steps": N, "finite": true, "recompiles": 0, "pass": true}

Usage: python tools/soak.py [--steps 600] [--window 100] [--min-rate 32.3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--window", type=int, default=100)
    p.add_argument("--min-rate", type=float, default=0.9 * 35.9)
    args = p.parse_args()

    from common import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    cfg, state, step, hw, batch_size = bench._setup()
    from simt_tpu.data import synthetic

    raw = synthetic.synthetic_batch(batch_size=batch_size, hw=hw, num_classes=19,
                                    seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}

    # Warmup / compile.
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    compiles_after_warmup = step._cache_size()

    windows = []
    finite = True
    n_done = 0
    while n_done < args.steps:
        n = min(args.window, args.steps - n_done)
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch)
        vals = {k: float(v) for k, v in metrics.items()}  # readback = sync
        dt = time.perf_counter() - t0
        windows.append(round(n / dt, 2))
        finite = finite and all(np.isfinite(v) for v in vals.values())
        n_done += n

    recompiles = step._cache_size() - compiles_after_warmup
    min_rate = min(windows)
    ok = finite and recompiles == 0 and min_rate >= args.min_rate
    print(json.dumps({
        "metric": "simt_soak_steps_per_sec_min_window",
        "value": min_rate,
        "unit": "steps/s",
        "windows": windows,
        "steps": args.steps,
        "finite": finite,
        "recompiles": recompiles,
        "pass": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
