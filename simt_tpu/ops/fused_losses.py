"""Flash-style fused loss blocks: upsample + per-pixel losses tiled over output rows.

Why this exists: the reference evaluates every loss on logits upsampled to the full
input resolution (tools/trainV2_simt.py:370-409). Done naively, that materialises dozens
of (B, 512, 1024, 34) float32 tensors; measured on TPU v5e the unfused block costs
60-90 ms per step — more than the entire ResNet-101 forward+backward. Two structural
fixes, both exact:

 1. **Streaming**: a ``lax.scan`` over output-row chunks upsamples one chunk at a time
    (the align-corners resize is a row-local linear map) and reduces it to scalar
    accumulators; ``jax.checkpoint`` keeps backward memory flat. Masked means decompose
    into (sum, count); the anchor argmax decomposes into a running strict-max carry
    (first occurrence wins, matching torch argmax tie-breaking).
 2. **Channels-first tiles**: per-pixel reductions over C+O=34 channels (softmax,
    argmax, label gathers) are computed on (C, pixels) tiles — pixels on the 128-wide
    lane dimension, channels on sublanes — instead of (pixels, 34) tiles that waste 73%
    of every vector op and relayout on each gather. Measured ~2.5x on the loss block.

The math is identical to the unfused ops (tests/test_fused_losses.py checks values and
gradients exactly).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .interp import _interp_matrix


def _chunk_rows(h: int, target: int = 64) -> int:
    """Largest divisor of ``h`` that is <= target (chunks must tile exactly)."""
    for r in range(min(target, h), 0, -1):
        if h % r == 0:
            return r
    return h


def _finish_mean(s: jax.Array, n: jax.Array) -> jax.Array:
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 0.0)


def _upsample_chunk_cf(x: jax.Array, a_h_c: jax.Array, a_w: jax.Array, prec) -> jax.Array:
    """(B, h8, w8, C) -> (B, C, rows, W) channels-first chunk (two MXU matmuls).

    Kept 4-D on purpose: flattening (rows, W) -> rows*W retiles the (8, 128)
    vector layout and showed up as ~0.6 ms/step of pure reshape ops in the
    round-3 trace; every downstream op reduces over axis 1 (channels) or the
    trailing spatial axes, so the flat view buys nothing.
    """
    z = jnp.einsum("bHWc,rH->bcrW", x, a_h_c, precision=prec,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("bcrW,wW->bcrw", z, a_w, precision=prec,
                      preferred_element_type=jnp.float32)


def _label_mask(labels: jax.Array, num_ch: int, ignore: int):
    """(valid (B,...), one-hot mask (B,num_ch,...)) for channels-first gathers.

    ``labels`` may be (B, P) or (B, rows, W); the mask broadcasts either way.
    """
    valid = jnp.logical_and(labels >= 0, labels != ignore)
    safe = jnp.where(valid, labels, 0)
    iota = jnp.arange(num_ch, dtype=safe.dtype).reshape(
        (1, num_ch) + (1,) * (labels.ndim - 1)
    )
    mask = (iota == safe[:, None]).astype(jnp.float32)
    return valid, mask


def _ce_sums_cf(logits_cf: jax.Array, labels: jax.Array, ignore: int):
    """Masked CE sums on channels-first tiles: logits (B,C,...), labels (B,...)."""
    valid, mask = _label_mask(labels, logits_cf.shape[1], ignore)
    mx = jnp.max(logits_cf, axis=1)
    lz = mx + jnp.log(jnp.sum(jnp.exp(logits_cf - mx[:, None]), axis=1))
    picked = jnp.sum(logits_cf * mask, axis=1)
    nll = (lz - picked) * valid
    return jnp.sum(nll), jnp.sum(valid)


def simt_loss_block(
    x1: jax.Array,
    x2: jax.Array,
    teacher_prob8: jax.Array,
    label: jax.Array,
    t1m: jax.Array,
    t2m: jax.Array,
    *,
    num_classes: int,
    open_classes: int,
    threshold_high: float,
    threshold_low: float,
    lambda_place: float,
    lambda_seg: float,
    ignore_label: int = 255,
    chunk_rows: int = 64,
    precision=None,
) -> Dict[str, jax.Array]:
    """All full-resolution SimT losses (trainV2_simt.py:351-409) in one streamed pass.

    Inputs are stride-8: ``x1``/``x2`` student logits (B,h8,w8,C+O), ``teacher_prob8``
    teacher softmax (B,h8,w8,C); ``label`` is the full-resolution pseudo label (B,H,W).
    Returns the scalar losses {loss_p1, loss_p2, loss_y1, loss_y2, place, anchor}.

    ``precision``: MXU precision for the upsample/NTM matmuls. The default (single-pass)
    is used in training — a 6-pass HIGHEST upsample costs ~18 ms/step on v5e for a
    ~1e-2 logit difference that is irrelevant to SGD; evaluation (which gates mIoU
    parity) uses HIGHEST via ops/interp.py. On CPU (tests) f32 is exact either way.

    The streamed core is a checkpointed ``lax.scan`` over row chunks. A VMEM-resident
    Pallas twin with a custom VJP was measured NEUTRAL on v5e (35.47 vs 35.9 steps/s
    at HEAD — the scan's per-chunk GEMMs already overlap with the surrounding step)
    and lives in experiments/pallas_alternates/loss_fused.py with its tests.
    """
    c, o = num_classes, open_classes
    total = c + o
    b, h8, w8, _ = x1.shape
    _, hh, ww = label.shape
    rows = _chunk_rows(hh, chunk_rows)
    n_chunks = hh // rows

    a_h = jnp.asarray(_interp_matrix(h8, hh))  # (H, h8)
    a_w = jnp.asarray(_interp_matrix(w8, ww))  # (W, w8)
    a_h_chunks = a_h.reshape(n_chunks, rows, h8)
    label_chunks = jnp.moveaxis(label.reshape(b, n_chunks, rows, ww), 1, 0)
    prec = precision

    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    teacher_prob8 = teacher_prob8.astype(jnp.float32)
    # One concatenated-channel tensor feeds a SINGLE upsample per chunk instead of
    # one per head: the H- and W-contractions are channel-independent, so
    # per-channel results are bit-identical, while the chunk GEMMs grow from
    # K=65/129 x N~=34ch to N~=68ch — much better MXU occupancy at these tiny-K
    # shapes (the loss-scan whiles were ~4.8 ms/step with per-tensor upsamples).
    xcat = jnp.concatenate([x1, x2], axis=-1)
    iota_t = jnp.arange(total)[None, :, None, None]

    # ------- pass 1 (no grad): teacher thresholds (:354-362) as a uint8 label map ----
    # The teacher posterior contributes to the differentiated losses ONLY through the
    # integer ``conf`` labels (argmax where max-prob > hi, class C where < lo, else
    # ignore) and the post-scan anchor rows. Computing ``conf`` OUTSIDE the
    # checkpointed main scan keeps the teacher upsample + threshold reductions out of
    # its backward, and doing it UNSCANNED (one full-height two-GEMM upsample) beats
    # a row-chunk scan: the per-chunk K=65 GEMMs ran at ~1.6 TFLOP/s inside a ~1 ms
    # while loop, while the one-shot f32 intermediate is only (B, C, H, W) ≈ 40 MB —
    # trivial against HBM bandwidth. Per-element H/W contractions are the same dots,
    # so the labels match the chunked form.
    tch = _upsample_chunk_cf(teacher_prob8, a_h, a_w, prec)  # (B, C, H, W)
    tmax = jnp.max(tch, axis=1)
    targ = jnp.argmax(tch, axis=1)
    conf_full = jnp.where(tmax > threshold_high, targ, ignore_label)
    conf_full = jnp.where(tmax < threshold_low, c, conf_full).astype(jnp.uint8)
    conf_chunks = jnp.moveaxis(
        conf_full.reshape(b, n_chunks, rows, ww), 1, 0
    )  # (n_chunks, B, rows, W)

    def head_chunk_losses(pred, refined, label_c, tm, pseudo):
        """Per-head local sums on (B, C+O, rows, W) tiles. ``pseudo`` is the per-pixel
        argmax (computed once per head in ``body``, shared with the anchor carry).

        Returns (ce_s, ce_n, known_s, known_n, unk_s, unk_n, y_s, y_n).
        """
        # CE vs refined label (:394-395).
        ce_s, ce_n = _ce_sums_cf(pred, refined, ignore_label)

        # Placeholder loss (:202-230) — the zeros-multiplied suppression (value 0).
        mx = jnp.max(pred, axis=1)
        den = jnp.sum(jnp.exp(pred - mx[:, None, :]), axis=1)
        onehot_arg = iota_t == pseudo[:, None, :]
        predict = jnp.where(onehot_arg, 0.0, pred)
        pred_max = jnp.exp(jnp.max(pred, axis=1) - mx) / den  # softmax max
        pseudo1 = jnp.where(pseudo < c, pseudo, ignore_label)
        pseudo1 = jnp.where(pred_max > threshold_high, pseudo1, ignore_label)
        known_s, known_n = _ce_sums_cf(pred, pseudo1, ignore_label)
        predict_open = jnp.where(iota_t >= c, predict, 0.0)
        place_y = jnp.argmax(predict_open, axis=1)
        place_y = jnp.where(pseudo1 == ignore_label, ignore_label, place_y)
        unk_s, unk_n = _ce_sums_cf(predict, place_y, ignore_label)

        # Noisy posterior (:402-409): q = T^T softmax(pred) on the MXU, NLL vs label.
        sm = jnp.exp(pred - mx[:, None, :]) / den[:, None, :]
        q = jnp.einsum("kc,bkrw->bcrw", tm, sm, precision=prec,
                       preferred_element_type=jnp.float32)
        valid, maskc = _label_mask(label_c, c, ignore_label)
        picked = jnp.sum(q * maskc, axis=1)
        y_s = jnp.sum(-jnp.log(picked) * valid)
        y_n = jnp.sum(valid)
        return (ce_s, ce_n, known_s, known_n, unk_s, unk_n, y_s, y_n)

    rows_w = rows * ww  # pixels per image per chunk

    def anchor_carry(pred, pseudo, chunk_idx, max_v, idx_v, exist_v):
        """(:374-384): running per-channel max of detached logits + the GLOBAL
        batch-major flat index of the max pixel; strict > keeps the first
        occurrence. The teacher posterior rows at the winning indices are
        recomputed ONCE after the scan (``teacher_rows_at``) instead of being
        gathered per chunk — the per-chunk one-hot gather matmul was ~1 ms/step.

        Two-stage argmax (over W per row, then over B*rows) keeps every reduction
        on the natural (rows, W) tiles — a flat (C, B*rows*W) view retiles the
        chunk. First-occurrence semantics are preserved: the first row holding
        the max wins stage 2, the first column within it wins stage 1.
        """
        det = jax.lax.stop_gradient(pred)  # (B, C+O, rows, W)
        row_max = jnp.moveaxis(jnp.max(det, axis=3), 1, 0).reshape(total, -1)
        row_arg = jnp.moveaxis(jnp.argmax(det, axis=3), 1, 0).reshape(total, -1)
        cand_max = jnp.max(row_max, axis=1)
        loc_br = jnp.argmax(row_max, axis=1)  # (C+O,) index into (B, rows)
        wi = jnp.take_along_axis(row_arg, loc_br[:, None], axis=1)[:, 0]
        bi = loc_br // rows
        within = (loc_br % rows) * ww + wi
        glob = bi * (hh * ww) + chunk_idx * rows_w + within
        better = cand_max > max_v
        new_max = jnp.where(better, cand_max, max_v)
        new_idx = jnp.where(better, glob.astype(jnp.int32), idx_v)
        # Per-class presence: max-reduce of the per-pixel argmax one-hot.
        ex = jnp.max(
            (jnp.arange(total)[:, None, None, None] == pseudo[None]).astype(
                jnp.float32
            ),
            axis=(1, 2, 3),
        )
        return new_max, new_idx, jnp.maximum(exist_v, ex)

    def body(carry, inp):
        a_h_c, label_c, conf_c, chunk_idx = inp  # label_c: (B, rows, W)
        zcat = _upsample_chunk_cf(xcat, a_h_c, a_w, prec)
        pred1 = zcat[:, :total]
        pred2 = zcat[:, total:]
        conf = conf_c.astype(jnp.int32)  # pass-1 teacher thresholds (:354-362)

        # Class-posterior refinement (:387-393) — uses head-2's argmax.
        pseudo1 = jnp.argmax(pred1, axis=1)
        pseudo2 = jnp.argmax(pred2, axis=1)
        unk = conf == c
        p1_ = jnp.where(unk, pseudo2, 0)
        p1_ = jnp.where(p1_ >= c, p1_, ignore_label)
        refined = jnp.where(unk, p1_, conf)

        h1 = head_chunk_losses(pred1, refined, label_c, t1m, pseudo1)
        h2 = head_chunk_losses(pred2, refined, label_c, t2m, pseudo2)

        (m1, i1, e1, m2, i2, e2, acc) = carry
        m1, i1, e1 = anchor_carry(pred1, pseudo1, chunk_idx, m1, i1, e1)
        m2, i2, e2 = anchor_carry(pred2, pseudo2, chunk_idx, m2, i2, e2)
        acc = tuple(
            a + jnp.asarray(v, jnp.float32) for a, v in zip(acc, h1 + h2)
        )
        return (m1, i1, e1, m2, i2, e2, acc), None

    neg = jnp.full((total,), -jnp.inf, jnp.float32)
    zidx = jnp.zeros((total,), jnp.int32)
    zex = jnp.zeros((total,), jnp.float32)
    acc0 = tuple(jnp.zeros((), jnp.float32) for _ in range(16))
    carry0 = (neg, zidx, zex, neg, zidx, zex, acc0)

    # Deliberately a rolled scan: full unrolling was measured ~1 ms SLOWER per step
    # on v5e (the unrolled chunks' buffers stop XLA reusing the while-body allocation
    # and add copies), despite removing the loop overhead; scan(unroll=2) was
    # neutral and unroll=4 lost ~1.9 ms (round-3 measurement).
    carry, _ = jax.lax.scan(
        jax.checkpoint(body), carry0,
        (a_h_chunks, label_chunks, conf_chunks,
         jnp.arange(n_chunks, dtype=jnp.int32)),
    )
    m1, i1, e1, m2, i2, e2, acc = carry
    return _finish_losses(
        acc, m1, i1, e1, m2, i2, e2, teacher_prob8, t1m, t2m,
        a_h=a_h, a_w=a_w, hh=hh, ww=ww,
        lambda_place=lambda_place, lambda_seg=lambda_seg, prec=prec,
    )


def _finish_losses(acc, m1, i1, e1, m2, i2, e2, teacher_prob8, t1m, t2m, *,
                   a_h, a_w, hh, ww, lambda_place, lambda_seg, prec):
    """Post-core finish shared by the scan and Pallas cores: masked means from the
    16 accumulated (sum, count) pairs, anchor teacher rows at the winning pixels,
    and the anchor/place compositions (trainV2_simt.py:374-384, :398-399)."""
    (ce1_s, ce1_n, k1_s, k1_n, u1_s, u1_n, y1_s, y1_n,
     ce2_s, ce2_n, k2_s, k2_n, u2_s, u2_n, y2_s, y2_n) = acc

    def teacher_rows_at(glob_idx):
        """Upsampled teacher posterior rows at 34 global pixels — the same
        (h-then-w) f32 contraction the in-scan chunks used, evaluated only at the
        winning anchor pixels (bit-identical per-element reduction order)."""
        bi = glob_idx // (hh * ww)
        rem = glob_idx % (hh * ww)
        ah = a_h[rem // ww]  # (C+O, h8)
        aw = a_w[rem % ww]  # (C+O, w8)
        tb = teacher_prob8[bi]  # (C+O, h8, w8, C)
        z = jnp.einsum("th,thwc->twc", ah, tb, precision=prec,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("tw,twc->tc", aw, z, precision=prec,
                          preferred_element_type=jnp.float32)

    r1 = teacher_rows_at(i1)
    r2 = teacher_rows_at(i2)

    loss_p1 = _finish_mean(ce1_s, ce1_n)
    loss_p2 = _finish_mean(ce2_s, ce2_n)
    loss_y1 = _finish_mean(y1_s, y1_n)
    loss_y2 = _finish_mean(y2_s, y2_n)
    place1 = _finish_mean(k1_s, k1_n) + lambda_place * _finish_mean(u1_s, u1_n)
    place2 = _finish_mean(k2_s, k2_n) + lambda_place * _finish_mean(u2_s, u2_n)
    place = lambda_seg * place1 + place2

    anchor = jnp.sum(e1[:, None] * (t1m - r1) ** 2) + jnp.sum(
        e2[:, None] * (t2m - r2) ** 2
    )

    return {
        "loss_p1": loss_p1,
        "loss_p2": loss_p2,
        "loss_y1": loss_y1,
        "loss_y2": loss_y2,
        "place": place,
        "anchor": anchor,
    }


def upsample_ce(
    logits: jax.Array,
    label: jax.Array,
    *,
    ignore_label: int = 255,
    chunk_rows: int = 64,
    precision=None,
) -> jax.Array:
    """Fused align-corners upsample + masked CE mean (the warmup loss,
    trainV1_warmup.py:219-224), streamed over row chunks, channels-first tiles."""
    b, h8, w8, cc = logits.shape
    _, hh, ww = label.shape
    rows = _chunk_rows(hh, chunk_rows)
    n_chunks = hh // rows
    a_h = jnp.asarray(_interp_matrix(h8, hh)).reshape(n_chunks, rows, h8)
    a_w = jnp.asarray(_interp_matrix(w8, ww))
    label_chunks = jnp.moveaxis(label.reshape(b, n_chunks, rows, ww), 1, 0)
    logits = logits.astype(jnp.float32)

    def body(carry, inp):
        a_h_c, label_c = inp
        pred = _upsample_chunk_cf(logits, a_h_c, a_w, precision)
        s, n = _ce_sums_cf(pred, label_c, ignore_label)
        return (carry[0] + s, carry[1] + n), None

    (s, n), _ = jax.lax.scan(
        jax.checkpoint(body),
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        (a_h, label_chunks),
    )
    return _finish_mean(s, n)
