"""Learning-rate schedules (reference ``lr_poly``, tools/trainV2_simt.py:174-185)."""

from __future__ import annotations

import jax.numpy as jnp


def poly_lr(base_lr: float, step, max_steps: int, power: float = 0.9):
    """``base_lr * (1 - step/max_steps)**power`` — trainV2_simt.py:174-175.

    Works on traced integer ``step`` inside a jitted train step. The 1x/10x group split
    (trainV2_simt.py:177-181) is applied by the optimizer partition in train/state.py,
    not here.
    """
    frac = 1.0 - jnp.asarray(step, jnp.float32) / float(max_steps)
    return base_lr * jnp.power(frac, power)
