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


def _rowblock_hist(
    a_h_a: jax.Array,
    a_h_b: jax.Array,
    gt: jax.Array,
    la_cf: jax.Array,
    lb_cf: jax.Array,
    a_w_a: jax.Array,
    a_w_b: jax.Array,
    *,
    num_classes: int,
    chunk_rows: int,
) -> jax.Array:
    """Histogram contribution of one output ROW BLOCK.

    ``a_h_a``/``a_h_b``: (block_rows, h8) slices of the align-corners H-interp
    matrices; ``gt``: the matching (block_rows, W) ground-truth rows; logits
    channels-first, whole. The full-image kernel is the block_rows == H case; the
    spatially-sharded eval (multiscale_argmax_hist_spatial) runs one block per
    ``spatial`` shard and psums — the hist is a sum over output rows, so the
    decomposition is exact.
    """
    c = num_classes
    blk, ww = gt.shape
    rows = chunk_rows
    while blk % rows:  # largest divisor of blk that is <= chunk_rows
        rows -= 1
    n_chunks = blk // rows
    h8a = la_cf.shape[1]
    h8b = lb_cf.shape[1]

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


def _prep(logits_a, logits_b, gt, out_hw):
    hh, ww = out_hw
    la_cf = jnp.moveaxis(logits_a.astype(jnp.float32), -1, 0)  # (C, h8a, w8a)
    lb_cf = jnp.moveaxis(logits_b.astype(jnp.float32), -1, 0)
    a_h_a = jnp.asarray(_interp_matrix(la_cf.shape[1], hh))
    a_w_a = jnp.asarray(_interp_matrix(la_cf.shape[2], ww))
    a_h_b = jnp.asarray(_interp_matrix(lb_cf.shape[1], hh))
    a_w_b = jnp.asarray(_interp_matrix(lb_cf.shape[2], ww))
    return la_cf, lb_cf, a_h_a, a_w_a, a_h_b, a_w_b, gt.astype(jnp.int32)


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
    la_cf, lb_cf, a_h_a, a_w_a, a_h_b, a_w_b, gt = _prep(logits_a, logits_b, gt, out_hw)
    return _rowblock_hist(
        a_h_a, a_h_b, gt, la_cf, lb_cf, a_w_a, a_w_b,
        num_classes=num_classes, chunk_rows=chunk_rows,
    )


def multiscale_argmax_hist_spatial(
    logits_a: jax.Array,
    logits_b: jax.Array,
    gt: jax.Array,
    mesh,
    *,
    out_hw: Tuple[int, int] = (1024, 2048),
    num_classes: int = 19,
    chunk_rows: int = 32,
) -> jax.Array:
    """Spatially-sharded fused eval head (SURVEY.md §2.5 SP/CP row, §5 long-context).

    The 2048x1024 upsample+argmax+hist dominates eval FLOPs/bytes while its inputs —
    the stride-8 logits — are tiny (~640 KB/scale). So instead of halo-exchanging
    conv activations here, the OUTPUT rows are sharded over the mesh's ``spatial``
    axis: every device holds the (replicated) logits, upsamples only its block of
    output rows against its slice of the H-interp matrix and its slice of the ground
    truth, computes the block's partial histogram with the fused Pallas kernel, and
    the (C, C) histograms are ``psum``-ed over ICI. The row decomposition is exact
    (the histogram is a sum over pixels), so this equals the single-device kernel
    bit-for-bit. (The conv forward itself shards over H via GSPMD upstream —
    eval/evaluate.py ``make_eval_fn(mesh=...)``.)
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ...parallel.mesh import SPATIAL_AXIS

    hh, _ = out_hw
    n_sp = mesh.shape[SPATIAL_AXIS]
    if hh % n_sp:
        raise ValueError(f"out height {hh} not divisible by spatial={n_sp}")

    la_cf, lb_cf, a_h_a, a_w_a, a_h_b, a_w_b, gt = _prep(logits_a, logits_b, gt, out_hw)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(SPATIAL_AXIS, None), P(SPATIAL_AXIS, None), P(SPATIAL_AXIS, None),
                  P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,  # the pallas_call inside is opaque to the varying-axis checker
    )
    def body(a_h_a_blk, a_h_b_blk, gt_blk, la, lb, awa, awb):
        part = _rowblock_hist(
            a_h_a_blk, a_h_b_blk, gt_blk, la, lb, awa, awb,
            num_classes=num_classes, chunk_rows=chunk_rows,
        )
        return jax.lax.psum(part, SPATIAL_AXIS)

    return body(a_h_a, a_h_b, gt, la_cf, lb_cf, a_w_a, a_w_b)
