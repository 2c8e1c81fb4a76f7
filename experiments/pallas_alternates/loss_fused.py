"""Pallas TPU kernel: the SimT streamed loss block, VMEM-resident.

Drop-in replacement for the ``lax.scan`` core of ``ops/fused_losses.py::
simt_loss_block`` (the reference losses at tools/trainV2_simt.py:370-409). The scan
materialises per-chunk (B, 68, 64, 1024) float32 tiles in HBM between every fused
reduction — round-4 profiling put the two loss-scan ``while`` HLOs at 2.85 ms/step
(~1.7 TFLOP/s) plus ~1 ms of scan-adjacent fusions, almost all of it HBM streaming
of intermediates. This kernel computes each (rows x wtile) tile FROM the stride-8
logits entirely in VMEM:

  grid (chunk, wtile), sequential. At wtile 0 of each chunk the H-contraction
  ``z = a_h_c @ xcat`` lands in a VMEM scratch reused by the chunk's other wtiles;
  each wtile then runs the W-contraction GEMM and every per-pixel loss reduction
  (teacher-threshold refinement, two CE sums, the placeholder pieces, the noisy
  posterior q = T^T softmax, the anchor max/argmax carry) without touching HBM.
  Only the stride-8 ``xcat`` (2.2 MB), the label/conf maps, and the scalar
  accumulators cross HBM.

The backward (custom VJP, same recompute-in-kernel structure as the scan's
``jax.checkpoint``) is in ``_bwd_kernel``: it re-derives the tile forward, forms
the per-component cotangents (softmax/CE algebra, the placeholder's zeroed-argmax
channel, the q-path through T), and accumulates ``dxcat`` via the transposed
upsample GEMMs and ``dT1/dT2`` via one MXU outer-product per tile.

Numerics: identical formulas to fused_losses.py with the same DEFAULT-precision
matmuls; accumulation orders differ (wtile-major instead of full-W rows), so tests
compare at float tolerances (tests/test_pallas_loss.py). Anchor argmax tie-breaking
is lowest-flat-index within a tile and first-tile across tiles — equal-value ties
across different pixels are measure-zero for real logits (same caveat as the scan).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simt_tpu.ops.interp import _interp_matrix


def loss_block_pallas(
    x1, x2, teacher_prob8, label, t1m, t2m, *,
    num_classes, open_classes, threshold_high, threshold_low,
    lambda_place, lambda_seg, ignore_label=255, chunk_rows=64, precision=None,
):
    """simt_loss_block with the Pallas VMEM-resident core — the former
    ``SimTConfig.loss_core="pallas"`` branch, preserved here verbatim for the
    equivalence tests (pass-1 teacher thresholds and the post-core finish are the
    product's own helpers; only the streamed core differs)."""
    from simt_tpu.ops.fused_losses import (
        _chunk_rows, _finish_losses, _upsample_chunk_cf,
    )

    c, o = num_classes, open_classes
    b, h8, w8, _ = x1.shape
    _, hh, ww = label.shape
    rows = _chunk_rows(hh, chunk_rows)

    a_h = jnp.asarray(_interp_matrix(h8, hh))
    a_w = jnp.asarray(_interp_matrix(w8, ww))
    prec = precision
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    teacher_prob8 = teacher_prob8.astype(jnp.float32)
    xcat = jnp.concatenate([x1, x2], axis=-1)

    tch = _upsample_chunk_cf(teacher_prob8, a_h, a_w, prec)
    tmax = jnp.max(tch, axis=1)
    targ = jnp.argmax(tch, axis=1)
    conf_full = jnp.where(tmax > threshold_high, targ, ignore_label)
    conf_full = jnp.where(tmax < threshold_low, c, conf_full).astype(jnp.uint8)

    (m1, i1, e1, m2, i2, e2), acc = simt_loss_core_pallas(
        xcat, label, conf_full, t1m, t2m,
        num_classes=c, open_classes=o, threshold_high=threshold_high,
        ignore_label=ignore_label, chunk_rows=rows,
    )
    return _finish_losses(
        acc, m1, i1, e1, m2, i2, e2, teacher_prob8, t1m, t2m,
        a_h=a_h, a_w=a_w, hh=hh, ww=ww,
        lambda_place=lambda_place, lambda_seg=lambda_seg, prec=prec,
    )

_NEG = -3.4e38  # ~f32 lowest; used for running-max inits
_BIG_IDX = np.int32(2**31 - 1)


def _ce_tile(pred, labels, ignore, iota_ch):
    """Masked CE on one channels-first tile: pred (Ct, r, w), labels (r, w).
    Returns the two (r, w) MAPS (nll, valid) — the final scalar reduction happens
    via full-tile MXU dots in the kernel. Reducing below 2-D full tiles inside the
    kernel crashes the Mosaic backend: rank-0 full reduces and sublane-dim-1
    intermediates both die with "Check failed: limits[i] <= dim(i) (8 vs. 1)"."""
    valid = jnp.logical_and(labels >= 0, labels != ignore)
    safe = jnp.where(valid, labels, 0)
    mask = (iota_ch == safe[None]).astype(jnp.float32)
    mx = jnp.max(pred, axis=0)
    lz = mx + jnp.log(jnp.sum(jnp.exp(pred - mx[None]), axis=0))
    picked = jnp.sum(pred * mask, axis=0)
    nll = (lz - picked) * valid
    return nll, valid.astype(jnp.float32)


def _head_tile(pred, refined, label_c, tm_t, pseudo, *, c, threshold_high, ignore,
               iota_ch, prec):
    """Per-head loss MAPS on one (C+O, r, w) tile — mirrors
    fused_losses.head_chunk_losses, returning eight (r, w) maps whose full-tile
    sums are the scan core's eight per-head accumulators."""
    import os as _os
    _dbg = _os.environ.get("SIMT_PALLAS_DEBUG_SECTIONS", "")
    total = pred.shape[0]
    r, w = pred.shape[1], pred.shape[2]
    zero = jnp.zeros((r, w), jnp.float32)

    def gated(name, thunk):
        return thunk() if (not _dbg or name in _dbg) else (zero, zero)

    ce_s, ce_n = gated("ce", lambda: _ce_tile(pred, refined, ignore, iota_ch))

    mx = jnp.max(pred, axis=0)
    den = jnp.sum(jnp.exp(pred - mx[None]), axis=0)
    onehot_arg = iota_ch == pseudo[None]
    predict = jnp.where(onehot_arg, 0.0, pred)
    pred_max = 1.0 / den  # exp(max - mx) / den with mx == max
    pseudo1 = jnp.where(pseudo < c, pseudo, ignore)
    pseudo1 = jnp.where(pred_max > threshold_high, pseudo1, ignore)
    known_s, known_n = gated("place", lambda: _ce_tile(pred, pseudo1, ignore,
                                                       iota_ch))

    def unk_maps():
        # The reference's placeholder argmax zeroes the known channels rather than
        # masking them to -inf (Placeholder_loss, trainV2_simt.py:202-230): when
        # every open-channel logit is negative, a known channel (value 0) wins.
        predict_open = jnp.where(iota_ch >= c, predict, 0.0)
        place_y = jnp.argmax(predict_open, axis=0)
        place_y = jnp.where(pseudo1 == ignore, ignore, place_y)
        return _ce_tile(predict, place_y, ignore, iota_ch)

    unk_s, unk_n = gated("place", unk_maps)

    sm = jnp.exp(pred - mx[None]) / den[None]

    def y_maps():
        # tm_t is the PRE-TRANSPOSED (C, C+O) transition matrix: the natural
        # q = T^T sm form contracts dim 0 of BOTH operands ((k,m) x (k,n)), which
        # the Mosaic backend cannot lower ("Check failed: limits[i] <= dim(i)",
        # round-4 bisect); with the transpose done outside the kernel this is a
        # standard (m,k) x (k,n) MXU dot.
        validy = jnp.logical_and(label_c >= 0, label_c != ignore)
        if "ymask" in _dbg:
            q = sm[:c]
        else:
            q = jax.lax.dot_general(
                tm_t, sm.reshape(total, r * w), (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32,
            ).reshape(c, r, w)
        if "ydot" in _dbg:
            return jnp.sum(q, axis=0), validy.astype(jnp.float32)
        safey = jnp.where(validy, label_c, 0)
        # A fresh (c, r, w) iota, NOT iota_ch[:c]: slicing a broadcasted iota
        # along the loop dim crashes the Mosaic backend (round-4 bisect).
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, r, w), 0)
        masky = (iota_c == safey[None]).astype(jnp.float32)
        picked = jnp.sum(q * masky, axis=0)
        return jnp.where(validy, -jnp.log(picked), 0.0), validy.astype(jnp.float32)

    y_s, y_n = gated("y", y_maps)
    return (ce_s, ce_n, known_s, known_n, unk_s, unk_n, y_s, y_n), sm, den, mx


def _refine(conf, pseudo2, *, c, ignore):
    """Class-posterior refinement (trainV2_simt.py:387-393), head-2's argmax."""
    unk = conf == c
    p1_ = jnp.where(unk, pseudo2, 0)
    p1_ = jnp.where(p1_ >= c, p1_, ignore)
    return jnp.where(unk, p1_, conf)


def _fwd_kernel(a_h_ref, a_w_ref, label_ref, conf_ref, xcat_ref, t1_ref, t2_ref,
                sums_ref, m1_ref, i1_ref, e1_ref, m2_ref, i2_ref, e2_ref, z_ref, *,
                c, total, rows, wtile, ww, n_wtiles, threshold_high, ignore, prec):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        for m_h, i_h, e_h in ((m1_ref, i1_ref, e1_ref), (m2_ref, i2_ref, e2_ref)):
            m_h[:] = jnp.full_like(m_h, _NEG)
            i_h[:] = jnp.zeros_like(i_h)
            e_h[:] = jnp.zeros_like(e_h)

    # H-contraction once per chunk, reused across its wtiles. The einsum orders
    # keep the channel dim LEADING in every 3-D operand/result — Mosaic lowers
    # those as per-channel 2-D MXU matmuls (the proven eval_fused.py pattern);
    # channel-in-the-middle orders make it flatten (cat, w8) into a non-128-
    # aligned lane dim, which fails to compile ("unsupported shape cast").
    @pl.when(j == 0)
    def _():
        z_ref[:] = jnp.einsum(
            "rH,cHW->crW", a_h_ref[:], xcat_ref[:],
            precision=prec, preferred_element_type=jnp.float32,
        )  # (cat, rows, w8)

    # W-contraction: (wtile, w8) x (cat, rows, w8) -> (cat, rows, wtile)
    zw = jnp.einsum(
        "wW,crW->crw", a_w_ref[:], z_ref[:],
        precision=prec, preferred_element_type=jnp.float32,
    )

    pred1 = zw[:total]
    pred2 = zw[total:]
    label_c = label_ref[:]
    conf = conf_ref[:]

    iota_ch = jax.lax.broadcasted_iota(jnp.int32, (total, rows, wtile), 0)
    pseudo1 = jnp.argmax(pred1, axis=0)
    pseudo2 = jnp.argmax(pred2, axis=0)
    refined = _refine(conf, pseudo2, c=c, ignore=ignore)

    h1, _, _, _ = _head_tile(pred1, refined, label_c, t1_ref[:], pseudo1, c=c,
                             threshold_high=threshold_high, ignore=ignore,
                             iota_ch=iota_ch, prec=prec)
    h2, _, _, _ = _head_tile(pred2, refined, label_c, t2_ref[:], pseudo2, c=c,
                             threshold_high=threshold_high, ignore=ignore,
                             iota_ch=iota_ch, prec=prec)
    # Reduce the 8 per-head (rows, wtile) loss maps to the (8, 128) sums tile with
    # two full-tile MXU dots (the eval_fused.py one-hot-matmul pattern): concat the
    # maps along sublanes (aligned — rows % 8 == 0), contract lanes against ones,
    # then contract each rows-group against a one-hot selector. In-kernel rank-0
    # full reduces and sublane-dim-1 intermediates both crash the Mosaic backend
    # ("Check failed: limits[i] <= dim(i) (8 vs. 1)"); this keeps every
    # intermediate a full 2-D tile. Only column 0 is read back by the wrapper.
    onesw = jnp.ones((wtile, 128), jnp.float32)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (8, 8 * rows), 0)
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (8, 8 * rows), 1) // rows
    sel = (iota_k == iota_g).astype(jnp.float32)
    for head, maps in ((0, h1), (1, h2)):
        big = jnp.concatenate(maps, axis=0)  # (8*rows, wtile)
        cols = jax.lax.dot_general(
            big, onesw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8*rows, 128): per-row sums, lane-broadcast
        sums_ref[head] += jax.lax.dot_general(
            sel, cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, 128)

    # Anchor carry per head: running per-channel max + GLOBAL flat pixel index
    # (strict > keeps the earliest tile; lowest flat index wins within a tile).
    # Carries are (total, 128) lane-broadcast tiles for the same reason.
    p = rows * wtile
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, wtile), 0)
    w_i = jax.lax.broadcasted_iota(jnp.int32, (rows, wtile), 1)
    glob = ((i * rows + row_i) * ww + j * wtile + w_i).reshape(1, p)
    iota_ch_f = jax.lax.broadcasted_iota(jnp.int32, (total, p), 0)

    def carry(head, m_h, idx_h, ex_h, pred, pseudo):
        flat = pred.reshape(total, p)
        cand_m = jnp.broadcast_to(jnp.max(flat, axis=1, keepdims=True),
                                  (total, 128))
        at_max = flat == cand_m[:, :1]
        cand_idx = jnp.broadcast_to(
            jnp.min(jnp.where(at_max, glob, _BIG_IDX), axis=1, keepdims=True),
            (total, 128))
        better = cand_m > m_h[:]
        m_h[:] = jnp.where(better, cand_m, m_h[:])
        idx_h[:] = jnp.where(better, cand_idx, idx_h[:])
        ex = jnp.broadcast_to(
            jnp.max((iota_ch_f == pseudo.reshape(1, p)).astype(jnp.float32),
                    axis=1, keepdims=True),
            (total, 128))
        ex_h[:] = jnp.maximum(ex_h[:], ex)

    carry(0, m1_ref, i1_ref, e1_ref, pred1, pseudo1)
    carry(1, m2_ref, i2_ref, e2_ref, pred2, pseudo2)


def _core_fwd_call(xcat_cf, t1m, t2m, a_h, a_w, label, conf, *, c, total, rows,
                   wtile, hh, ww, threshold_high, ignore, prec, interpret):
    cat = 2 * total
    h8, w8 = xcat_cf.shape[1], xcat_cf.shape[2]
    n_chunks = hh // rows
    n_wtiles = ww // wtile
    kernel = functools.partial(
        _fwd_kernel, c=c, total=total, rows=rows, wtile=wtile, ww=ww,
        n_wtiles=n_wtiles, threshold_high=threshold_high, ignore=ignore, prec=prec,
    )
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n_chunks, n_wtiles),
        in_specs=[
            pl.BlockSpec((rows, h8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wtile, w8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wtile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wtile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xcat_cf whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t1m transposed (C, C+O)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t2m transposed (C, C+O)
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_shape=[
            jax.ShapeDtypeStruct((2, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((total, 128), jnp.float32),
            jax.ShapeDtypeStruct((total, 128), jnp.int32),
            jax.ShapeDtypeStruct((total, 128), jnp.float32),
            jax.ShapeDtypeStruct((total, 128), jnp.float32),
            jax.ShapeDtypeStruct((total, 128), jnp.int32),
            jax.ShapeDtypeStruct((total, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((cat, rows, w8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a_h, a_w, label, conf, xcat_cf, t1m.T, t2m.T)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15)
)
def _loss_core(xcat_cf, t1m, t2m, a_h, a_w, label, conf,
               c, total, rows, wtile, hh, ww, threshold_high, ignore, interp):
    """Streamed-core: per-image sums + anchor carries. Differentiable in
    (xcat_cf, t1m, t2m) via the custom VJP below."""
    return _core_fwd_call(
        xcat_cf, t1m, t2m, a_h, a_w, label, conf, c=c, total=total, rows=rows,
        wtile=wtile, hh=hh, ww=ww, threshold_high=threshold_high, ignore=ignore,
        prec=None, interpret=interp,
    )


def _loss_core_fwd(xcat_cf, t1m, t2m, a_h, a_w, label, conf,
                   c, total, rows, wtile, hh, ww, threshold_high, ignore, interp):
    out = _loss_core(xcat_cf, t1m, t2m, a_h, a_w, label, conf,
                     c, total, rows, wtile, hh, ww, threshold_high, ignore, interp)
    return out, (xcat_cf, t1m, t2m, a_h, a_w, label, conf)


def _bwd_kernel(g_ref, a_h_ref, a_w_ref, label_ref, conf_ref, xcat_ref, t1_ref,
                t2_ref, t1t_ref, t2t_ref, dx_ref, dt1_ref, dt2_ref, z_ref, dz_ref,
                *, c, total, rows, wtile, ww, n_wtiles, threshold_high, ignore,
                prec):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dt1_ref[:] = jnp.zeros_like(dt1_ref)
        dt2_ref[:] = jnp.zeros_like(dt2_ref)

    @pl.when(j == 0)
    def _():
        z_ref[:] = jnp.einsum(
            "rH,cHW->crW", a_h_ref[:], xcat_ref[:],
            precision=prec, preferred_element_type=jnp.float32,
        )  # (cat, rows, w8) — channel-leading (see the fwd kernel's layout note)
        dz_ref[:] = jnp.zeros_like(dz_ref)

    # ---- recompute the tile forward (checkpoint semantics) ----
    zw = jnp.einsum(
        "wW,crW->crw", a_w_ref[:], z_ref[:],
        precision=prec, preferred_element_type=jnp.float32,
    )  # (cat, rows, wtile)
    label_c = label_ref[:]
    conf = conf_ref[:]
    iota_ch = jax.lax.broadcasted_iota(jnp.int32, (total, rows, wtile), 0)
    pred1 = zw[:total]
    pred2 = zw[total:]
    pseudo1 = jnp.argmax(pred1, axis=0)
    pseudo2 = jnp.argmax(pred2, axis=0)
    refined = _refine(conf, pseudo2, c=c, ignore=ignore)

    def head_bwd(head, pred, pseudo, t_ref, tt_ref, dt_ref):
        """dP (total, rows, wtile) and dT accumulation for one head."""
        # Cotangent scalars live in SMEM; scalar * vector broadcasts are the
        # supported pattern (rank-0 reads from VMEM are not).
        g_ce = g_ref[head, 0]
        g_known = g_ref[head, 2]
        g_unk = g_ref[head, 4]
        g_y = g_ref[head, 6]
        tm = t_ref[:]
        tm_t = tt_ref[:]  # pre-transposed (C, C+O) — see the fwd kernel's y note

        mx = jnp.max(pred, axis=0)
        e = jnp.exp(pred - mx[None])
        den = jnp.sum(e, axis=0)
        sm = e / den[None]

        def ce_grad(labels):
            valid = jnp.logical_and(labels >= 0, labels != ignore)
            safe = jnp.where(valid, labels, 0)
            mask = (iota_ch == safe[None]).astype(jnp.float32)
            vf = valid.astype(jnp.float32)[None]
            return (sm - mask) * vf

        dP = g_ce * ce_grad(refined)

        onehot_arg = iota_ch == pseudo[None]
        pred_max = 1.0 / den
        pseudo1_lbl = jnp.where(pseudo < c, pseudo, ignore)
        pseudo1_lbl = jnp.where(pred_max > threshold_high, pseudo1_lbl, ignore)
        dP = dP + g_known * ce_grad(pseudo1_lbl)

        predict = jnp.where(onehot_arg, 0.0, pred)
        predict_open = jnp.where(iota_ch >= c, predict, 0.0)  # quirk: 0-fill, not -inf
        place_y = jnp.argmax(predict_open, axis=0)
        place_y = jnp.where(pseudo1_lbl == ignore, ignore, place_y)
        mxu = jnp.max(predict, axis=0)
        eu = jnp.exp(predict - mxu[None])
        smu = eu / jnp.sum(eu, axis=0)[None]
        validu = jnp.logical_and(place_y >= 0, place_y != ignore)
        safeu = jnp.where(validu, place_y, 0)
        masku = (iota_ch == safeu[None]).astype(jnp.float32)
        dPREDICT = g_unk * (smu - masku) * validu.astype(jnp.float32)[None]
        dP = dP + jnp.where(onehot_arg, 0.0, dPREDICT)

        # y path: q = T^T sm; nll vs the on-disk label.
        q = jax.lax.dot_general(
            tm_t, sm.reshape(total, rows * wtile), (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        ).reshape(c, rows, wtile)
        validy = jnp.logical_and(label_c >= 0, label_c != ignore)
        safey = jnp.where(validy, label_c, 0)
        # Fresh iota, not iota_ch[:c] — see the fwd kernel's y_maps note.
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, rows, wtile), 0)
        masky = (iota_c == safey[None]).astype(jnp.float32)
        picked = jnp.sum(q * masky, axis=0)
        inv = jnp.where(validy, 1.0 / picked, 0.0)
        dq = (-g_y) * masky * inv[None]  # (c, rows, wtile)
        dq_flat = dq.reshape(c, rows * wtile)
        sm_flat = sm.reshape(total, rows * wtile)
        # dT[k, j] = sum_p sm[k, p] dq[j, p]
        dt_ref[:] += jax.lax.dot_general(
            sm_flat, dq_flat, (((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )
        dsm = jax.lax.dot_general(
            tm, dq_flat, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        ).reshape(total, rows, wtile)
        dP = dP + sm * (dsm - jnp.sum(dsm * sm, axis=0)[None])
        return dP

    d1 = head_bwd(0, pred1, pseudo1, t1_ref, t1t_ref, dt1_ref)
    d2 = head_bwd(1, pred2, pseudo2, t2_ref, t2t_ref, dt2_ref)
    dzw = jnp.concatenate([d1, d2], axis=0)  # (cat, rows, wtile)

    # dz += dzw contracted with a_w tile: (cat, rows, wtile) x (wtile, w8)
    dz_ref[:] += jnp.einsum(
        "crw,wW->crW", dzw, a_w_ref[:],
        precision=prec, preferred_element_type=jnp.float32,
    )  # (cat, rows, w8)

    @pl.when(j == n_wtiles - 1)
    def _():
        # dxcat += a_h_c^T dz : (rows, h8) x (cat, rows, w8) -> (cat, h8, w8)
        dx_ref[:] += jnp.einsum(
            "rH,crW->cHW", a_h_ref[:], dz_ref[:],
            precision=prec, preferred_element_type=jnp.float32,
        )


def _loss_core_bwd(c, total, rows, wtile, hh, ww, threshold_high, ignore, interp,
                   residuals, gout):
    xcat_cf, t1m, t2m, a_h, a_w, label, conf = residuals
    g_sums = gout[0][..., 0]  # (2, 8); the anchor carries carry no gradient
    cat = 2 * total
    h8, w8 = xcat_cf.shape[1], xcat_cf.shape[2]
    n_chunks = hh // rows
    n_wtiles = ww // wtile
    kernel = functools.partial(
        _bwd_kernel, c=c, total=total, rows=rows, wtile=wtile, ww=ww,
        n_wtiles=n_wtiles, threshold_high=threshold_high, ignore=ignore, prec=None,
    )
    dx, dt1, dt2 = pl.pallas_call(
        kernel,
        interpret=interp,
        grid=(n_chunks, n_wtiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # g_sums (2, 8) scalars
            pl.BlockSpec((rows, h8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wtile, w8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wtile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wtile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xcat_cf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t1m
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t2m
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t1m transposed
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t2m transposed
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cat, h8, w8), jnp.float32),
            jax.ShapeDtypeStruct((total, c), jnp.float32),
            jax.ShapeDtypeStruct((total, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cat, rows, w8), jnp.float32),
            pltpu.VMEM((cat, rows, w8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(g_sums, a_h, a_w, label, conf, xcat_cf, t1m, t2m, t1m.T, t2m.T)
    zeros = jnp.zeros_like

    def f0(x):  # integer primals take float0 cotangents per the custom_vjp contract
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return dx, dt1, dt2, zeros(a_h), zeros(a_w), f0(label), f0(conf)


_loss_core.defvjp(_loss_core_fwd, _loss_core_bwd)


def _choose_wtile(ww: int, target: int = 256) -> int:
    for t in range(min(target, ww), 0, -1):
        if ww % t == 0 and t % 128 == 0:
            return t
    return ww


def simt_loss_core_pallas(
    xcat: jax.Array,
    label: jax.Array,
    conf_full: jax.Array,
    t1m: jax.Array,
    t2m: jax.Array,
    *,
    num_classes: int,
    open_classes: int,
    threshold_high: float,
    ignore_label: int,
    chunk_rows: int,
    wtile: int | None = None,
) -> Tuple[tuple, tuple]:
    """Streamed-core twin of the scan in fused_losses.simt_loss_block.

    xcat: (B, h8, w8, 2*(C+O)) f32 concatenated head logits; label (B, H, W) int;
    conf_full (B, H, W) uint8/int teacher-threshold labels. Returns
    ((m1, i1, e1, m2, i2, e2), acc16) with the scan's carry semantics: acc16 is the
    16-tuple of per-head loss sums/counts, m/i/e are the per-head anchor carries
    with GLOBAL batch-major flat indices.
    """
    c, o = num_classes, open_classes
    total = c + o
    b, h8, w8, cat = xcat.shape
    _, hh, ww = label.shape
    wt = wtile or _choose_wtile(ww)
    interp = jax.default_backend() == "cpu"
    # Kernel preconditions (loud, not silent): the sums-reduce trick needs sublane-
    # aligned row chunks, and a non-lane-aligned wtile would fail Mosaic compilation
    # on TPU for widths with no 128-multiple divisor.
    if chunk_rows % 8:
        raise ValueError(f"chunk_rows={chunk_rows} must be a multiple of 8")
    if not interp and wt % 128:
        raise ValueError(
            f"width {ww} has no 128-multiple divisor <= 256 (wtile={wt}); "
            "pad the width or pass an explicit lane-aligned wtile"
        )
    # NOTE: SIMT_PALLAS_DEBUG_SECTIONS gates sections of the FORWARD kernel only
    # (triage tool); gradients are always the full custom VJP, so set it only for
    # forward-value bisection, never under jax.grad.

    a_h = jnp.asarray(_interp_matrix(h8, hh))  # (H, h8)
    a_w = jnp.asarray(_interp_matrix(w8, ww))  # (W, w8)
    label = label.astype(jnp.int32)
    conf = conf_full.astype(jnp.int32)

    sums = jnp.zeros((2, 8), jnp.float32)
    m = jnp.full((2, total), -jnp.inf, jnp.float32)
    idx = jnp.zeros((2, total), jnp.int32)
    ex = jnp.zeros((2, total), jnp.float32)
    for bi in range(b):  # b is 1-4; unrolled at trace time
        xcf = jnp.transpose(xcat[bi].astype(jnp.float32), (2, 0, 1))
        s_i, m1_i, i1_i, e1_i, m2_i, i2_i, e2_i = _loss_core(
            xcf, t1m, t2m, a_h, a_w, label[bi], conf[bi],
            c, total, chunk_rows, wt, hh, ww, float(threshold_high),
            int(ignore_label), interp,
        )
        m_i = jnp.stack([m1_i[:, 0], m2_i[:, 0]])  # (2, total)
        idx_i = jnp.stack([i1_i[:, 0], i2_i[:, 0]])
        ex_i = jnp.stack([e1_i[:, 0], e2_i[:, 0]])
        glob = idx_i + bi * (hh * ww)
        better = m_i > m  # strict: earlier batch element wins ties (batch-major)
        m = jnp.where(better, m_i, m)
        idx = jnp.where(better, glob, idx)
        ex = jnp.maximum(ex, ex_i)
        sums = sums + s_i[..., 0]
    acc16 = tuple(sums[0, k] for k in range(8)) + tuple(
        sums[1, k] for k in range(8)
    )
    return (m[0], idx[0], ex[0], m[1], idx[1], ex[1]), acc16
