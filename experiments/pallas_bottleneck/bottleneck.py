"""Fused Pallas bottleneck: conv1(1x1) + BN + ReLU + conv2(3x3,dilated) + BN + ReLU
+ conv3(1x1) + BN + residual + ReLU — one kernel, batch-stats BN included.

Why: even with the all-GEMM conv formulation (ops/conv.py), XLA runs each
bottleneck as ~15 separate HLOs per direction; the train-mode BatchNorm stat
reductions alone cost ~0.2 ms per 16 MB activation (10x off HBM roofline) because
each is a separate pass over the conv output, and the tap-GEMM slices round-trip HBM.
This kernel keeps the whole block resident in VMEM: the input is read once, the nine
conv2 taps slice a VMEM-padded buffer (no HBM im2col), and the BN statistics are
accumulated in registers as each GEMM tile is produced.

Semantics match the XLA path (models/layers.py Bottleneck, train mode, batch 1):
  - conv outputs are rounded to bf16 BEFORE the stats/normalise, exactly like the
    bf16 conv + flax BatchNorm composition;
  - stats are biased (flax _compute_stats) over all pixels of the single image;
  - normalise in f32 (x_bf16 - mean) * rsqrt(var + eps) * scale + bias.

The backward kernel recomputes the cheap elementwise pieces from the saved raw conv
outputs (h1raw/h2raw, bf16) and expresses every gradient as VMEM-resident GEMMs,
including the batch-stat BN backward (dx = A*(dy' - mean(dy') - xhat*mean(dy'*xhat))
with A = scale*rsqrt(var+eps); the reductions double as d_scale/d_bias).

Reference block: model/deeplab_multi.py:57-101 (the hot loop of
tools/trainV2_simt.py:370,428).

STATUS — complete and tested, NOT wired into the model. Measured on v5e at the real
layer3 geometry (65x129x1024, tools/bench_fused_bottleneck.py):

    XLA all-dots block   fwd 0.147 ms   fwd+bwd 0.271 ms
    this kernel          fwd 0.126 ms   fwd+bwd 0.885 ms

The forward wins 14% (VMEM-resident taps + fused BN stats). The backward loses 3x:
its weight-gradient GEMMs contract the pixel (sublane) dimension, which forces an
operand transpose per tile inside the kernel, whereas XLA schedules the same
contraction with free layout choice. Since the all-GEMM formulation (ops/conv.py)
already made the composed XLA backward faster than the sum of isolated stages, the
residual upside (~1-2 ms/step) does not justify a TPU-only divergent code path; the
kernel is kept as a tested building block (tests/test_pallas_bottleneck.py) for a
future backward that keeps transposed copies of the residuals.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _row_tiles(h: int, target_rows: int):
    """Static row tiling [(start, rows), ...] covering h (last tile may be short)."""
    out = []
    r = 0
    while r < h:
        out.append((r, min(target_rows, h - r)))
        r += target_rows
    return out


def _pick_rows(h: int, w: int, target_m: int = 2048) -> int:
    return max(1, min(h, target_m // max(1, w)))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w1_ref, w2_ref, w3_ref, g1_ref, b1_ref, g2_ref, b2_ref,
                g3_ref, b3_ref, out_ref, h1raw_ref, h2raw_ref, statsp_ref,
                statst_ref, h1p_ref, *, h: int, w: int, p: int, ct: int, d: int,
                rows: int):
    m = h * w
    tiles = _row_tiles(h, rows)
    f32 = jnp.float32

    # ---- phase 1: h1raw = bf16(x @ w1); stats ---------------------------------
    s1 = jnp.zeros((p,), f32)
    q1 = jnp.zeros((p,), f32)
    for (r0, nr) in tiles:
        a = x_ref[pl.ds(r0, nr), :, :].reshape(nr * w, ct)
        rb = jax.lax.dot_general(a, w1_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32).astype(jnp.bfloat16)
        h1raw_ref[pl.ds(r0, nr), :, :] = rb.reshape(nr, w, p)
        rf = rb.astype(f32)
        s1 = s1 + jnp.sum(rf, axis=0)
        q1 = q1 + jnp.sum(rf * rf, axis=0)
    m1 = s1 / m
    v1 = q1 / m - m1 * m1
    a1 = g1_ref[0] * jax.lax.rsqrt(v1 + EPS)
    c1 = b1_ref[0] - m1 * a1

    # ---- phase 2: h1p = pad(relu(norm(h1raw))) --------------------------------
    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    for (r0, nr) in tiles:
        rb = h1raw_ref[pl.ds(r0, nr), :, :].astype(f32)
        h1 = jnp.maximum(rb * a1 + c1, 0.0).astype(jnp.bfloat16)
        h1p_ref[pl.ds(d + r0, nr), pl.ds(d, w), :] = h1

    # ---- phase 3: h2raw = bf16(conv3x3_d(h1p)); stats -------------------------
    s2 = jnp.zeros((p,), f32)
    q2 = jnp.zeros((p,), f32)
    for (r0, nr) in tiles:
        acc = jnp.zeros((nr * w, p), f32)
        for kh in range(3):
            for kw in range(3):
                a = h1p_ref[pl.ds(r0 + kh * d, nr), pl.ds(kw * d, w), :]
                acc = acc + jax.lax.dot_general(
                    a.reshape(nr * w, p), w2_ref[kh, kw],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
        rb = acc.astype(jnp.bfloat16)
        h2raw_ref[pl.ds(r0, nr), :, :] = rb.reshape(nr, w, p)
        rf = rb.astype(f32)
        s2 = s2 + jnp.sum(rf, axis=0)
        q2 = q2 + jnp.sum(rf * rf, axis=0)
    m2 = s2 / m
    v2 = q2 / m - m2 * m2
    a2 = g2_ref[0] * jax.lax.rsqrt(v2 + EPS)
    c2 = b2_ref[0] - m2 * a2

    # ---- phase 4: h2 = relu(norm(h2raw)) stored into h1p interior -------------
    for (r0, nr) in tiles:
        rb = h2raw_ref[pl.ds(r0, nr), :, :].astype(f32)
        h2 = jnp.maximum(rb * a2 + c2, 0.0).astype(jnp.bfloat16)
        h1p_ref[pl.ds(r0, nr), pl.ds(0, w), :] = h2

    # ---- phase 5: outraw = bf16(h2 @ w3) into out_ref; stats ------------------
    s3 = jnp.zeros((ct,), f32)
    q3 = jnp.zeros((ct,), f32)
    for (r0, nr) in tiles:
        a = h1p_ref[pl.ds(r0, nr), pl.ds(0, w), :].reshape(nr * w, p)
        rb = jax.lax.dot_general(a, w3_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32).astype(jnp.bfloat16)
        out_ref[pl.ds(r0, nr), :, :] = rb.reshape(nr, w, ct)
        rf = rb.astype(f32)
        s3 = s3 + jnp.sum(rf, axis=0)
        q3 = q3 + jnp.sum(rf * rf, axis=0)
    m3 = s3 / m
    v3 = q3 / m - m3 * m3
    a3 = g3_ref[0] * jax.lax.rsqrt(v3 + EPS)
    c3 = b3_ref[0] - m3 * a3

    # ---- phase 6: out = relu(norm(outraw) + x) --------------------------------
    for (r0, nr) in tiles:
        rb = out_ref[pl.ds(r0, nr), :, :].astype(f32)
        res = x_ref[pl.ds(r0, nr), :, :].astype(f32)
        y = jnp.maximum(rb * a3 + c3 + res, 0.0)
        out_ref[pl.ds(r0, nr), :, :] = y.astype(jnp.bfloat16)

    statsp_ref[0] = m1
    statsp_ref[1] = v1
    statsp_ref[2] = m2
    statsp_ref[3] = v2
    statst_ref[0] = m3
    statst_ref[1] = v3


def _fwd_call(x, w1, w2, w3, g1, b1, g2, b2, g3, b3, d: int):
    h, w, ct = x.shape
    p = w1.shape[-1]
    rows = _pick_rows(h, w)
    kernel = functools.partial(_fwd_kernel, h=h, w=w, p=p, ct=ct, d=d, rows=rows)
    bf = jnp.bfloat16
    out_shapes = (
        jax.ShapeDtypeStruct((h, w, ct), bf),       # out
        jax.ShapeDtypeStruct((h, w, p), bf),        # h1raw
        jax.ShapeDtypeStruct((h, w, p), bf),        # h2raw
        jax.ShapeDtypeStruct((4, p), jnp.float32),  # m1 v1 m2 v2
        jax.ShapeDtypeStruct((2, ct), jnp.float32),  # m3 v3
    )
    vec = lambda v: v.reshape(1, -1).astype(jnp.float32)  # noqa: E731
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((h + 2 * d, w + 2 * d, p), bf)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x.astype(bf), w1.astype(bf), w2.astype(bf), w3.astype(bf),
      vec(g1), vec(b1), vec(g2), vec(b2), vec(g3), vec(b3))


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, dy_ref, w1_ref, w2_ref, w3_ref, g1_ref, b1_ref, g2_ref,
                b2_ref, g3_ref, b3_ref, h1raw_ref, h2raw_ref, statsp_ref,
                statst_ref, dx_ref, dw1_ref, dw2_ref, dw3_ref, dgb_p_ref,
                dgb_t_ref, h1p_ref, h2_ref, dz2_ref, dor2p_ref, *,
                h: int, w: int, p: int, ct: int, d: int, rows: int):
    m = h * w
    tiles = _row_tiles(h, rows)
    f32 = jnp.float32
    bf = jnp.bfloat16
    dn = (((1,), (0,)), ((), ()))  # (M,K)x(K,N)
    dn_t = (((0,), (0,)), ((), ()))  # (K,M)x(K,N) -> (M,N): contract rows

    m1, v1, m2, v2 = statsp_ref[0], statsp_ref[1], statsp_ref[2], statsp_ref[3]
    m3, v3 = statst_ref[0], statst_ref[1]
    i1 = jax.lax.rsqrt(v1 + EPS)
    i2 = jax.lax.rsqrt(v2 + EPS)
    i3 = jax.lax.rsqrt(v3 + EPS)
    a1 = g1_ref[0] * i1
    c1 = b1_ref[0] - m1 * a1
    a2 = g2_ref[0] * i2
    c2 = b2_ref[0] - m2 * a2
    a3 = g3_ref[0] * i3
    c3 = b3_ref[0] - m3 * a3

    # ---- B0: recompute h1 (padded, relu'd) and h2 -----------------------------
    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    for (r0, nr) in tiles:
        rb1 = h1raw_ref[pl.ds(r0, nr), :, :].astype(f32)
        h1 = jnp.maximum(rb1 * a1 + c1, 0.0)
        h1p_ref[pl.ds(d + r0, nr), pl.ds(d, w), :] = h1.astype(bf)
        rb2 = h2raw_ref[pl.ds(r0, nr), :, :].astype(f32)
        h2 = jnp.maximum(rb2 * a2 + c2, 0.0)
        h2_ref[pl.ds(r0, nr), :, :] = h2.astype(bf)

    # ---- B1: dz3 = dy * relu3_mask; stats; dz3 -> dx_ref (residual grad) ------
    s3 = jnp.zeros((ct,), f32)
    q3 = jnp.zeros((ct,), f32)
    for (r0, nr) in tiles:
        h2t = h2_ref[pl.ds(r0, nr), :, :].reshape(nr * w, p)
        orb = jax.lax.dot_general(h2t, w3_ref[:], dn,
                                  preferred_element_type=f32).astype(bf)
        orf = orb.astype(f32)
        z3 = orf * a3 + c3 + x_ref[pl.ds(r0, nr), :, :].reshape(nr * w, ct).astype(f32)
        mask = z3 > 0.0
        dz = jnp.where(mask, dy_ref[pl.ds(r0, nr), :, :].reshape(nr * w, ct).astype(f32),
                       0.0)
        dx_ref[pl.ds(r0, nr), :, :] = dz.astype(bf).reshape(nr, w, ct)
        xhat3 = (orf - m3) * i3
        s3 = s3 + jnp.sum(dz, axis=0)
        q3 = q3 + jnp.sum(dz * xhat3, axis=0)
    dgb_t_ref[0] = q3  # d_scale3
    dgb_t_ref[1] = s3  # d_bias3

    # ---- B2: dor3 -> dh2 -> dz2 (+ dw3) ---------------------------------------
    s2 = jnp.zeros((p,), f32)
    q2 = jnp.zeros((p,), f32)
    dw3_acc = jnp.zeros((p, ct), f32)
    w3t = jnp.transpose(w3_ref[:], (1, 0))
    for (r0, nr) in tiles:
        h2t = h2_ref[pl.ds(r0, nr), :, :].reshape(nr * w, p)
        orb = jax.lax.dot_general(h2t, w3_ref[:], dn,
                                  preferred_element_type=f32).astype(bf)
        xhat3 = (orb.astype(f32) - m3) * i3
        dz = dx_ref[pl.ds(r0, nr), :, :].reshape(nr * w, ct).astype(f32)
        dor3 = (a3 * (dz - s3 / m - xhat3 * (q3 / m))).astype(bf)
        dw3_acc = dw3_acc + jax.lax.dot_general(
            h2t, dor3, dn_t, preferred_element_type=f32)
        dh2 = jax.lax.dot_general(dor3, w3t, dn, preferred_element_type=f32)
        mask2 = h2t.astype(f32) > 0.0
        dz2 = jnp.where(mask2, dh2, 0.0)
        xhat2 = (h2raw_ref[pl.ds(r0, nr), :, :].reshape(nr * w, p).astype(f32)
                 - m2) * i2
        s2 = s2 + jnp.sum(dz2, axis=0)
        q2 = q2 + jnp.sum(dz2 * xhat2, axis=0)
        dz2_ref[pl.ds(r0, nr), :, :] = dz2.astype(bf).reshape(nr, w, p)
    dw3_ref[:] = dw3_acc
    dgb_p_ref[2] = q2
    dgb_p_ref[3] = s2

    # ---- B3: dor2 (padded) + dw2 ----------------------------------------------
    dor2p_ref[:] = jnp.zeros_like(dor2p_ref)
    for (r0, nr) in tiles:
        dz2 = dz2_ref[pl.ds(r0, nr), :, :].reshape(nr * w, p).astype(f32)
        xhat2 = (h2raw_ref[pl.ds(r0, nr), :, :].reshape(nr * w, p).astype(f32)
                 - m2) * i2
        dor2 = (a2 * (dz2 - s2 / m - xhat2 * (q2 / m))).astype(bf)
        dor2p_ref[pl.ds(d + r0, nr), pl.ds(d, w), :] = dor2.reshape(nr, w, p)
    # Per-tap accumulation as plain Python values (Mosaic has no scatter-add).
    dw2_acc = [[jnp.zeros((p, p), f32) for _ in range(3)] for _ in range(3)]
    for (r0, nr) in tiles:
        dor2 = dor2p_ref[pl.ds(d + r0, nr), pl.ds(d, w), :].reshape(nr * w, p)
        for kh in range(3):
            for kw in range(3):
                a = h1p_ref[pl.ds(r0 + kh * d, nr), pl.ds(kw * d, w), :]
                dw2_acc[kh][kw] = dw2_acc[kh][kw] + jax.lax.dot_general(
                    a.reshape(nr * w, p), dor2, dn_t, preferred_element_type=f32)
    for kh in range(3):
        for kw in range(3):
            dw2_ref[kh, kw] = dw2_acc[kh][kw]

    # ---- B4: dh1 = conv_T(dor2p) -> dz1 ---------------------------------------
    s1 = jnp.zeros((p,), f32)
    q1 = jnp.zeros((p,), f32)
    for (r0, nr) in tiles:
        acc = jnp.zeros((nr * w, p), f32)
        for kh in range(3):
            for kw in range(3):
                a = dor2p_ref[pl.ds(r0 + kh * d, nr), pl.ds(kw * d, w), :]
                wf = jnp.transpose(w2_ref[2 - kh, 2 - kw], (1, 0))
                acc = acc + jax.lax.dot_general(a.reshape(nr * w, p), wf, dn,
                                                preferred_element_type=f32)
        h1t = h1p_ref[pl.ds(d + r0, nr), pl.ds(d, w), :].reshape(nr * w, p)
        mask1 = h1t.astype(f32) > 0.0
        dz1 = jnp.where(mask1, acc, 0.0)
        xhat1 = (h1raw_ref[pl.ds(r0, nr), :, :].reshape(nr * w, p).astype(f32)
                 - m1) * i1
        s1 = s1 + jnp.sum(dz1, axis=0)
        q1 = q1 + jnp.sum(dz1 * xhat1, axis=0)
        # reuse h2 scratch as dz1 storage (h2 is consumed)
        h2_ref[pl.ds(r0, nr), :, :] = dz1.astype(bf).reshape(nr, w, p)
    dgb_p_ref[0] = q1
    dgb_p_ref[1] = s1

    # ---- B5: dor1 -> dx (+= w1^T path) and dw1 --------------------------------
    dw1_acc = jnp.zeros((ct, p), f32)
    w1t = jnp.transpose(w1_ref[:], (1, 0))
    for (r0, nr) in tiles:
        dz1 = h2_ref[pl.ds(r0, nr), :, :].reshape(nr * w, p).astype(f32)
        xhat1 = (h1raw_ref[pl.ds(r0, nr), :, :].reshape(nr * w, p).astype(f32)
                 - m1) * i1
        dor1 = (a1 * (dz1 - s1 / m - xhat1 * (q1 / m))).astype(bf)
        xt = x_ref[pl.ds(r0, nr), :, :].reshape(nr * w, ct)
        dw1_acc = dw1_acc + jax.lax.dot_general(xt, dor1, dn_t,
                                                preferred_element_type=f32)
        dxt = jax.lax.dot_general(dor1, w1t, dn, preferred_element_type=f32)
        prev = dx_ref[pl.ds(r0, nr), :, :].reshape(nr * w, ct).astype(f32)
        dx_ref[pl.ds(r0, nr), :, :] = (prev + dxt).astype(bf).reshape(nr, w, ct)
    dw1_ref[:] = dw1_acc


def _bwd_call(x, dy, w1, w2, w3, g1, b1, g2, b2, g3, b3, h1raw, h2raw, sp, st,
              d: int):
    h, w, ct = x.shape
    p = w1.shape[-1]
    rows = _pick_rows(h, w)
    kernel = functools.partial(_bwd_kernel, h=h, w=w, p=p, ct=ct, d=d, rows=rows)
    bf = jnp.bfloat16
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((h, w, ct), bf),       # dx
        jax.ShapeDtypeStruct((ct, p), f32),         # dw1
        jax.ShapeDtypeStruct((3, 3, p, p), f32),    # dw2
        jax.ShapeDtypeStruct((p, ct), f32),         # dw3
        jax.ShapeDtypeStruct((4, p), f32),          # dg1 db1 dg2 db2
        jax.ShapeDtypeStruct((2, ct), f32),         # dg3 db3
    )
    vec = lambda v: v.reshape(1, -1).astype(f32)  # noqa: E731
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((h + 2 * d, w + 2 * d, p), bf),  # h1p
            pltpu.VMEM((h, w, p), bf),                   # h2 / dz1
            pltpu.VMEM((h, w, p), bf),                   # dz2
            pltpu.VMEM((h + 2 * d, w + 2 * d, p), bf),  # dor2p
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(x.astype(bf), dy.astype(bf), w1.astype(bf), w2.astype(bf), w3.astype(bf),
      vec(g1), vec(b1), vec(g2), vec(b2), vec(g3), vec(b3), h1raw, h2raw, sp, st)


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_bottleneck(x, w1, w2, w3, g1, b1, g2, b2, g3, b3, d: int):
    """Single-image fused bottleneck. x (H,W,Ct) bf16; returns
    (out (H,W,Ct) bf16, (m1,v1,m2,v2,m3,v3) f32 batch stats)."""
    out, h1raw, h2raw, sp, st = _fwd_call(x, w1, w2, w3, g1, b1, g2, b2, g3, b3, d)
    return out, (sp[0], sp[1], sp[2], sp[3], st[0], st[1])


def _vjp_fwd(x, w1, w2, w3, g1, b1, g2, b2, g3, b3, d):
    out, h1raw, h2raw, sp, st = _fwd_call(x, w1, w2, w3, g1, b1, g2, b2, g3, b3, d)
    res = (x, w1, w2, w3, g1, b1, g2, b2, g3, b3, h1raw, h2raw, sp, st)
    return (out, (sp[0], sp[1], sp[2], sp[3], st[0], st[1])), res


def _vjp_bwd(d, res, cotangents):
    (x, w1, w2, w3, g1, b1, g2, b2, g3, b3, h1raw, h2raw, sp, st) = res
    dy, _dstats = cotangents  # stats feed running averages: stop-gradient there
    dx, dw1, dw2, dw3, dgb_p, dgb_t = _bwd_call(
        x, dy, w1, w2, w3, g1, b1, g2, b2, g3, b3, h1raw, h2raw, sp, st, d
    )
    return (
        dx.astype(x.dtype),
        dw1.reshape(w1.shape).astype(w1.dtype),
        dw2.astype(w2.dtype),
        dw3.reshape(w3.shape).astype(w3.dtype),
        dgb_p[0].astype(g1.dtype), dgb_p[1].astype(b1.dtype),
        dgb_p[2].astype(g2.dtype), dgb_p[3].astype(b2.dtype),
        dgb_t[0].astype(g3.dtype), dgb_t[1].astype(b3.dtype),
    )


fused_bottleneck.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Pure-jnp reference (for tests): must equal the XLA Bottleneck math
# ---------------------------------------------------------------------------


def reference_bottleneck(x, w1, w2, w3, g1, b1, g2, b2, g3, b3, d: int):
    """Same math in plain jnp (bf16 conv rounding + f32 stats/normalise)."""
    bf = jnp.bfloat16
    f32 = jnp.float32
    hw = x.shape[0] * x.shape[1]

    def bn(raw, g, b):
        rf = raw.astype(f32)
        mean = jnp.sum(rf, axis=(0, 1)) / hw
        var = jnp.sum(rf * rf, axis=(0, 1)) / hw - mean * mean
        a = g * jax.lax.rsqrt(var + EPS)
        return rf * a + (b - mean * a), mean, var

    x = x.astype(bf)
    h1raw = jax.lax.dot_general(x, w1.astype(bf), (((2,), (0,)), ((), ())),
                                preferred_element_type=f32).astype(bf)
    n1, m1, v1 = bn(h1raw, g1, b1)
    h1 = jnp.maximum(n1, 0.0).astype(bf)
    h1p = jnp.pad(h1, ((d, d), (d, d), (0, 0)))
    acc = None
    hh, ww = x.shape[0], x.shape[1]
    for kh in range(3):
        for kw in range(3):
            a = jax.lax.slice(h1p, (kh * d, kw * d, 0),
                              (kh * d + hh, kw * d + ww, h1p.shape[2]))
            y = jax.lax.dot_general(a, w2[kh, kw].astype(bf),
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            acc = y if acc is None else acc + y
    h2raw = acc.astype(bf)
    n2, m2, v2 = bn(h2raw, g2, b2)
    h2 = jnp.maximum(n2, 0.0).astype(bf)
    outraw = jax.lax.dot_general(h2, w3.astype(bf), (((2,), (0,)), ((), ())),
                                 preferred_element_type=f32).astype(bf)
    n3, m3, v3 = bn(outraw, g3, b3)
    out = jnp.maximum(n3 + x.astype(f32), 0.0).astype(bf)
    return out, (m1, v1, m2, v2, m3, v3)
