"""Capture the TPU golden trace constants for tests/test_tpu_golden.py.

Runs 3 SimT steps of the bench configuration (full-depth ResNet-101, bf16,
512x1024, synthetic batch, fixed seeds) on the real chip and prints the loss
components per step as a Python literal to paste into the test.

Usage: python tools/capture_tpu_golden.py
"""

import sys

import common  # noqa: F401
from common import enable_compilation_cache


def main():
    enable_compilation_cache()
    import jax

    if jax.default_backend() != "tpu":
        sys.exit("must run on the TPU backend")

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    import jax.numpy as jnp

    from simt_tpu.data import synthetic

    cfg, state, step, hw, batch_size = bench._setup()
    raw = synthetic.synthetic_batch(batch_size=batch_size, hw=hw, num_classes=19,
                                    seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}

    keys = ["loss", "loss_seg_p", "loss_seg_y", "convex", "volume", "anchor", "place"]
    print("TPU_GOLDEN = [")
    for _ in range(3):
        state, m = step(state, batch)
        vals = {k: float(m[k]) for k in keys}
        print("    dict(" + ", ".join(f"{k}={v:.6g}" for k, v in vals.items()) + "),")
    print("]")


if __name__ == "__main__":
    main()
