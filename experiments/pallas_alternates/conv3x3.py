"""Pallas TPU kernel: implicit-GEMM 3x3 (dilated) convolution with custom VJP.

The hot compute of the DeepLabv2 trunk is the stride-1 3x3 conv of every bottleneck
(dilation 1/2/4, model/deeplab_multi.py:68-69); at batch 1 and stride-8 spatial size XLA's
conv lowering plateaus around ~50 TFLOP/s on v5e. This kernel keeps the (padded) input
resident in VMEM and accumulates the nine tap-GEMMs

    out[p, :] += x_shifted_by_tap_k[p, :] @ W[k]          (M = rows x W, K = C, N = O)

directly on the MXU — no HBM im2col, input read once. The backward passes reuse the same
structure: d_input is the same kernel with the spatially-flipped, io-transposed kernel;
d_weights is one tap-indexed GEMM contraction over all pixels.

Used by models/layers.py for bottleneck conv2 when enabled (see ``use_pallas_conv``);
falls back to XLA conv on CPU (interpret mode is used for tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_row_tile(h: int, target: int = 16) -> int:
    for r in range(min(target, h), 0, -1):
        if h % r == 0:
            return r
    return h


def _fwd_kernel(xp_ref, w_ref, out_ref, *, rows: int, w_out: int, c_in: int,
                c_out: int, d: int):
    i = pl.program_id(0)
    acc = jnp.zeros((rows * w_out, c_out), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            a = xp_ref[pl.ds(i * rows + kh * d, rows), pl.ds(kw * d, w_out), :]
            a = a.reshape(rows * w_out, c_in)
            acc += jax.lax.dot_general(
                a, w_ref[kh, kw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = acc.reshape(rows, w_out, c_out).astype(out_ref.dtype)


def _wgrad_kernel(xp_ref, dy_ref, dw_ref, *, h: int, w_out: int, c_in: int,
                  c_out: int, d: int):
    # bf16 operands, f32 accumulation (standard mixed-precision weight grads).
    dy = dy_ref[:].reshape(h * w_out, c_out)
    for kh in range(3):
        for kw in range(3):
            a = xp_ref[pl.ds(kh * d, h), pl.ds(kw * d, w_out), :]
            a = a.reshape(h * w_out, c_in)
            dw_ref[kh, kw] = jax.lax.dot_general(
                a, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(dw_ref.dtype)


def _conv_fwd_2d(x: jax.Array, w: jax.Array, d: int) -> jax.Array:
    """x (H, W, C) bf16/f32; w (3,3,C,O). SAME padding with dilation d."""
    h, ww, c_in = x.shape
    c_out = w.shape[-1]
    xp = jnp.pad(x, ((d, d), (d, d), (0, 0)))
    rows = _pick_row_tile(h)
    kernel = functools.partial(
        _fwd_kernel, rows=rows, w_out=ww, c_in=c_in, c_out=c_out, d=d
    )
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(h // rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xp whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w whole
        ],
        out_specs=pl.BlockSpec((rows, ww, c_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, ww, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, w.astype(x.dtype))


def _conv_wgrad_2d(x: jax.Array, dy: jax.Array, d: int,
                   kshape: Tuple[int, ...]) -> jax.Array:
    h, ww, c_in = x.shape
    c_out = dy.shape[-1]
    dy = dy.astype(x.dtype)
    xp = jnp.pad(x, ((d, d), (d, d), (0, 0)))
    kernel = functools.partial(
        _wgrad_kernel, h=h, w_out=ww, c_in=c_in, c_out=c_out, d=d
    )
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, c_in, c_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dilated_conv3x3(x: jax.Array, w: jax.Array, d: int) -> jax.Array:
    """Batched stride-1 SAME 3x3 conv with dilation ``d``: x (B,H,W,C), w (3,3,C,O)."""
    return jax.vmap(lambda xi: _conv_fwd_2d(xi, w, d))(x)


def _vjp_fwd(x, w, d):
    return dilated_conv3x3(x, w, d), (x, w)


def _vjp_bwd(d, res, g):
    x, w = res
    # d_input: conv of the cotangent with the spatially-flipped, io-transposed kernel.
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = jax.vmap(lambda gi: _conv_fwd_2d(gi.astype(x.dtype), w_flip, d))(g)
    # d_weights: tap-indexed contraction over all pixels, summed over batch.
    dw = jnp.sum(
        jax.vmap(lambda xi, gi: _conv_wgrad_2d(xi, gi, d, w.shape))(x, g), axis=0
    )
    return dx.astype(x.dtype), dw.astype(w.dtype)


dilated_conv3x3.defvjp(_vjp_fwd, _vjp_bwd)
