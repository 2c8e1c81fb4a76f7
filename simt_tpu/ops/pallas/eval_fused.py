"""Pallas TPU kernel: fused multi-scale eval head.

The reference eval protocol (tools/evaluate_cityscapes.py:127-148) upsamples head-2
logits from both input scales to 1024x2048 with align-corners bilinear, sums them, takes
the per-pixel argmax, and accumulates a 19x19 confusion histogram against the remapped
ground truth. Done with separate XLA ops this materialises two (1024,2048,19) float32
tensors (~160 MB each) in HBM; this kernel streams the whole thing:

  grid over output-row chunks; per chunk, both scales' logits are upsampled
  channels-first via MXU matmuls (the align-corners resize is a linear map — see
  ops/interp.py), summed in VMEM, argmax'd over the 19 classes on sublanes, and reduced
  against the ground-truth chunk into the 19x19 histogram with two one-hot matmuls.
  Only the histogram ever leaves the chip.

Forward-only (evaluation), so no custom VJP is needed. Numerics: float32 matmuls with
the MXU's highest precision, matching the unfused eval path; argmax tie-breaking is
first-index in both paths (sum order may differ by accumulation — tests allow a
vanishing fraction of near-tie flips).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..interp import _interp_matrix


def _kernel(a_h_a_ref, a_h_b_ref, gt_ref, la_ref, lb_ref, a_w_a_ref, a_w_b_ref,
            hist_ref, *, num_classes: int, rows: int, w_out: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    prec = jax.lax.Precision.HIGHEST

    def upsample_cf(logits_cf, a_h_c, a_w):
        # logits_cf: (C, h8, w8); a_h_c: (rows, h8); a_w: (w_out, w8)
        z = jnp.einsum("rH,cHW->crW", a_h_c, logits_cf, precision=prec,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("wW,crW->crw", a_w, z, precision=prec,
                          preferred_element_type=jnp.float32)

    pred = upsample_cf(la_ref[:], a_h_a_ref[:], a_w_a_ref[:])
    pred = pred + upsample_cf(lb_ref[:], a_h_b_ref[:], a_w_b_ref[:])  # (C, rows, w_out)
    pred_flat = pred.reshape(num_classes, rows * w_out)
    amax = jnp.argmax(pred_flat, axis=0)  # (rows*w_out,)

    gt = gt_ref[:].reshape(rows * w_out)
    iota = jax.lax.broadcasted_iota(jnp.int32, (num_classes, rows * w_out), 0)
    onehot_gt = (iota == gt[None, :]).astype(jnp.float32)
    onehot_pred = (iota == amax[None, :]).astype(jnp.float32)
    # hist[g, p] = sum_i onehot_gt[g, i] * onehot_pred[p, i]  — one MXU matmul.
    part = jax.lax.dot_general(
        onehot_gt, onehot_pred, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    hist_ref[:] += part


@functools.partial(jax.jit, static_argnames=("out_hw", "num_classes", "chunk_rows"))
def multiscale_argmax_hist(
    logits_a: jax.Array,
    logits_b: jax.Array,
    gt: jax.Array,
    *,
    out_hw: Tuple[int, int] = (1024, 2048),
    num_classes: int = 19,
    chunk_rows: int = 32,
) -> jax.Array:
    """Fused eval head for ONE image: stride-8 logits from the two eval scales
    (H8a,W8a,C) / (H8b,W8b,C) + ground truth (H,W) -> (C, C) int32 confusion matrix.

    Equivalent to upsample(a) + upsample(b), argmax, fast_hist (evaluate_cityscapes.py
    :127-148) without materialising the full-resolution logit maps.
    """
    hh, ww = out_hw
    c = num_classes
    h8a, w8a = logits_a.shape[0], logits_a.shape[1]
    h8b, w8b = logits_b.shape[0], logits_b.shape[1]
    rows = chunk_rows
    while hh % rows:  # largest divisor of hh that is <= chunk_rows
        rows -= 1
    n_chunks = hh // rows

    la_cf = jnp.moveaxis(logits_a.astype(jnp.float32), -1, 0)  # (C, h8a, w8a)
    lb_cf = jnp.moveaxis(logits_b.astype(jnp.float32), -1, 0)
    a_h_a = jnp.asarray(_interp_matrix(h8a, hh))
    a_w_a = jnp.asarray(_interp_matrix(w8a, ww))
    a_h_b = jnp.asarray(_interp_matrix(h8b, hh))
    a_w_b = jnp.asarray(_interp_matrix(w8b, ww))
    gt = gt.astype(jnp.int32)

    kernel = functools.partial(_kernel, num_classes=c, rows=rows, w_out=ww)
    hist = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",  # CPU tests run the interpreter
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((rows, h8a), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, h8b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, ww), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # la_cf (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lb_cf (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_w_a (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_w_b (whole)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a_h_a, a_h_b, gt, la_cf, lb_cf, a_w_a, a_w_b)
    return hist.astype(jnp.int32)
