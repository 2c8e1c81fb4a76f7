"""Bilinear resize with ``align_corners=True`` semantics, TPU-native.

The reference uses ``nn.Upsample(mode='bilinear', align_corners=True)`` on logits both in
training (tools/trainV1_warmup.py:200-201, tools/trainV2_simt.py:300-301) and evaluation
(tools/evaluate_cityscapes.py:108). XLA's ``jax.image.resize`` implements the
half-pixel-centres convention, which does NOT match; a silent mismatch here shifts every
logit map and kills mIoU parity (SURVEY.md §7 "hard parts").

TPU-first design: align-corners bilinear interpolation is a *separable linear map*, so we
materialise the two interpolation matrices ``A_h (H_out, H_in)`` and ``A_w (W_out, W_in)``
(two non-zeros per row) once per shape at trace time and apply them as dense matmuls on the
MXU: ``out = A_h @ x @ A_w^T``. For the eval upsample (65x129 -> 1024x2048 per 19-channel
logit map) this runs at matmul speed and fuses with the surrounding argmax, instead of the
reference's device->host transpose + numpy argmax (evaluate_cityscapes.py:128,137-138).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic (out_size, in_size) align-corners linear interpolation matrix."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        a[:, 0] = 1.0
        return a
    if out_size == 1:
        # align_corners maps the single output point to source index 0.
        a[0, 0] = 1.0
        return a
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    a[rows, lo] = 1.0 - frac
    a[rows, lo + 1] = frac
    return a


def upsample_bilinear_align_corners(
    x: jax.Array, out_hw: Tuple[int, int], *, accum_dtype=jnp.float32
) -> jax.Array:
    """Resize NHWC ``x`` to ``out_hw`` with torch ``align_corners=True`` semantics.

    The interpolation is applied as two MXU matmuls (H then W). Output dtype follows the
    input dtype; accumulation happens in ``accum_dtype``.
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    a_h = jnp.asarray(_interp_matrix(h_in, h_out), dtype=x.dtype)
    a_w = jnp.asarray(_interp_matrix(w_in, w_out), dtype=x.dtype)
    # In float32, force full-precision MXU passes — this op gates mIoU parity.
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    # (h_out, h_in) x (B, h_in, w_in, C) -> (B, h_out, w_in, C)
    y = jnp.einsum(
        "hH,bHwc->bhwc", a_h, x, preferred_element_type=accum_dtype, precision=prec
    )
    # (w_out, w_in) x (B, h_out, w_in, C) -> (B, h_out, w_out, C)
    y = jnp.einsum(
        "wW,bhWc->bhwc",
        a_w,
        y.astype(x.dtype),
        preferred_element_type=accum_dtype,
        precision=prec,
    )
    return y.astype(x.dtype)


def upsample_bilinear_half_pixel(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Standard half-pixel bilinear resize (torch ``align_corners=False``), NHWC.

    Used by the DeepLabv3 variant, whose in-model upsample (model/deeplabv3.py:102,137)
    uses ``F.interpolate(..., mode='bilinear')`` without align_corners.
    """
    return jax.image.resize(x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]), method="linear")
