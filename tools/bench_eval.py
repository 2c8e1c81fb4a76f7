#!/usr/bin/env python3
"""Evaluation-throughput benchmark (secondary metric; the headline is bench.py).

Measures the full per-image eval path — two-scale forward + fused Pallas
upsample/argmax/histogram — on the real chip with honest readback sync, and prints one
JSON line. Reference baseline: 500 val images x 2 scales in ~550-750 s => ~1.3-1.8
images/s (BASELINE.md eval row).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_IMG_PER_SEC = 1.55  # midpoint of the reference's 1.3-1.8 range


def main():
    import jax

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
    import jax as _jax

    os.makedirs(d, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir",
                       os.path.join(d, _jax.default_backend()))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from simt_tpu.eval.evaluate import make_eval_fn
    from simt_tpu.models import deeplab_multi

    model = deeplab_multi(19, 15, openset=True, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 512, 1024, 3).astype(np.float32))
    x640 = jnp.asarray(rng.randn(1, 640, 1280, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 19, (1, 1024, 2048)))
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 1024, 3)), False)
    variables = jax.device_put(variables, jax.devices()[0])

    _, predict_hist, _ = make_eval_fn(model, 19, "simt")
    h = predict_hist(variables, x, x640, gt)
    _ = np.asarray(h)

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        h = predict_hist(variables, x, x640, gt)
    _ = np.asarray(h)
    img_per_sec = n / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "eval_images_per_sec_two_scale_1024x2048",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
