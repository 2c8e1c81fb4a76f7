"""Stride-1 SAME dilated 3x3 conv with a hand-written GEMM backward.

Why: XLA:TPU's autodiff backward for ``conv_general_dilated`` lowers the weight
gradient to a transposed convolution whose preferred operand layouts conflict with the
forward's NHWC layouts; in large composed graphs (the full DeepLabv2 student) this
inserts hundreds of layout-copy ops — measured ~2x inflation of the whole backward
(tools/profile_trunk.py: composed layer3+4+heads bwd 33 ms vs 17 ms as isolated
stages; copies/slices/converts account for ~27 ms of the 56 ms full-model fwd+bwd,
tools/profile_trace.py).

This custom VJP expresses both gradients as plain MXU contractions in the SAME layout
as the forward:

  - d_input:  conv of the cotangent with the spatially-flipped, io-transposed kernel
              (stride-1 SAME dilated conv is its own transpose up to kernel flip);
  - d_weight: nine shifted-slice GEMMs ``dw[kh,kw] = sum_pix x_shift[kh,kw] * dy``
              (the implicit-GEMM formulation), contracted in f32 on the MXU.

The forward is byte-identical to the default path (same primitive, same layout); only
gradient op *order* differs (mathematically the same linear maps), so this is enabled
everywhere — CPU tests cover equivalence against jax autodiff.

Used by models/layers.py (bottleneck conv2) and the ASPP heads. Reference hot path
this accelerates: model/deeplab_multi.py:57-119 under tools/trainV2_simt.py:370,428.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _conv(x: jax.Array, w: jax.Array, d: int) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((d, d), (d, d)),
        rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dilated_conv3x3_gemm_bwd(x: jax.Array, w: jax.Array, d: int) -> jax.Array:
    """x (B,H,W,C), w (3,3,C,O), stride-1 SAME conv with dilation ``d``.

    Forward identical to ``lax.conv_general_dilated``; backward hand-written as
    layout-preserving GEMMs (see module docstring).
    """
    return _conv(x, w, d)


def _fwd(x, w, d):
    return _conv(x, w, d), (x, w)


def _bwd(d, res, g):
    x, w = res
    g = g.astype(x.dtype)
    # d_input: flip taps spatially, swap in/out channels.
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv(g, w_flip.astype(x.dtype), d)

    # d_weight: implicit-GEMM taps. Pad H/W by d, then each tap is a static slice
    # contracted against the cotangent over (batch, H, W) — a (C, O) MXU GEMM with
    # K = B*H*W. No transposed-convolution lowering, no layout changes.
    _, h, ww, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    taps = []
    for kh in range(3):
        row = []
        for kw in range(3):
            xs = jax.lax.slice(
                xp, (0, kh * d, kw * d, 0),
                (xp.shape[0], kh * d + h, kw * d + ww, xp.shape[3]),
            )
            row.append(
                jax.lax.dot_general(
                    xs, g,
                    dimension_numbers=(((0, 1, 2), (0, 1, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps)  # (3, 3, C, O) f32
    return dx.astype(x.dtype), dw.astype(w.dtype)


dilated_conv3x3_gemm_bwd.defvjp(_fwd, _bwd)
