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

``dilated_conv3x3_taps`` goes further: the FORWARD is also expressed as the nine
tap GEMMs, so no convolution HLO exists at all and XLA never imposes convolution
operand layouts in either direction. Gradient op *order* differs from jax autodiff of
the conv primitive (mathematically the same linear maps); CPU tests cover equivalence.

Used by models/layers.py (bottleneck conv2, via ``dilated_conv3x3_taps``) and the ASPP
heads. Reference hot path this accelerates: model/deeplab_multi.py:57-119 under
tools/trainV2_simt.py:370,428.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def conv1x1(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """1x1 conv as a plain channel matmul: x (B,H,W,C), w (1,1,C,O) or (C,O).

    A strided 1x1 conv is a strided subsample followed by the matmul. Expressing it
    as ``dot_general`` (instead of a convolution HLO) keeps XLA:TPU from imposing
    convolution operand layouts — the source of the (H,B,W,C)-transposed copies seen
    in the composed backward (tools/profile_trace.py). Autodiff through a dot is two
    dots, both layout-clean."""
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    w2 = w.reshape(w.shape[-2], w.shape[-1])
    # f32 accumulation pinned in the HLO (like _conv_taps) — XLA:TPU accumulates in
    # f32 on the MXU either way, but requesting it keeps the semantics explicit; the
    # final round to x.dtype is identical to a dot with preferred type x.dtype.
    return jax.lax.dot_general(
        x, w2, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _tap_slice(xp: jax.Array, kh: int, kw: int, d: int, h: int, w: int) -> jax.Array:
    return jax.lax.slice(
        xp, (0, kh * d, kw * d, 0),
        (xp.shape[0], kh * d + h, kw * d + w, xp.shape[3]),
    )


def _conv_taps(x: jax.Array, w: jax.Array, d: int) -> jax.Array:
    """Stride-1 SAME dilated 3x3 conv as nine shifted-slice GEMMs (implicit GEMM).

    Every tap is ``slice(pad(x)) @ w[kh,kw]`` — an (B*H*W, C) x (C, O) MXU matmul in
    the activation's native NHWC layout, accumulated in f32."""
    b, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    acc = None
    for kh in range(3):
        for kw in range(3):
            xs = _tap_slice(xp, kh, kw, d, h, ww)
            y = jax.lax.dot_general(
                xs, w[kh, kw], dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype)


def _wgrad_taps(x: jax.Array, g: jax.Array, d: int) -> jax.Array:
    """d_weight as nine tap contractions ``dw[kh,kw] = sum_pix x_shift * dy``
    ((C, O) MXU GEMMs with K = B*H*W) — no transposed-convolution lowering."""
    _, h, ww, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    taps = []
    for kh in range(3):
        row = []
        for kw in range(3):
            xs = _tap_slice(xp, kh, kw, d, h, ww)
            row.append(
                jax.lax.dot_general(
                    xs, g,
                    dimension_numbers=(((0, 1, 2), (0, 1, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        taps.append(jnp.stack(row))
    return jnp.stack(taps)  # (3, 3, C, O) f32


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dilated_conv3x3_taps(x: jax.Array, w: jax.Array, d: int) -> jax.Array:
    """All-GEMM stride-1 SAME dilated 3x3 conv: forward AND both gradients are
    shifted-slice ``dot_general`` contractions — zero convolution HLOs.

    In composed fwd+bwd graphs XLA:TPU's convolution custom-calls force
    (H,B,W,C)-style operand layouts that insert big transpose copies (measured on the
    DeepLabv2 trunk: the 34-channel ASPP head forward ran at 6 TFLOP/s behind such a
    copy). Plain dots keep the native NHWC layout end to end. Gradients match jax
    autodiff on the conv primitive to float round-off (tests/test_conv_vjp.py)."""
    return _conv_taps(x, w, d)


def _taps_fwd(x, w, d):
    return _conv_taps(x, w, d), (x, w)


def _taps_bwd(d, res, g):
    x, w = res
    g = g.astype(x.dtype)
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv_taps(g, w_flip.astype(x.dtype), d)
    dw = _wgrad_taps(x, g, d)
    return dx.astype(x.dtype), dw.astype(w.dtype)


dilated_conv3x3_taps.defvjp(_taps_fwd, _taps_bwd)


def aspp_sum_wide(x, kernels, biases, dilations, dtype=jnp.bfloat16):
    """Weight-summed dilated-3x3 ASPP branches with ALL channel GEMMs merged into
    ONE dot (the head of model/deeplab_multi.py:104-119, perf formulation).

    Each head branch GEMM has N = num_classes+open (34 in the SimT configuration) —
    27% of one 128-lane MXU tile, and its autodiff dx/dw GEMMs contract K=34 (27% of
    the MXU's reduction depth). Merging the 9 taps x B branches along the output
    dimension yields a single (C, 9*sum N_b) contraction (N=612 for the two-branch
    openset head) at full lane utilization; autodiff's dx/dw become single K=612 /
    N=612 GEMMs. Taps are recombined by padded shift-adds over disjoint channel
    blocks — pure slices XLA fuses. Measured on v5e: full SimT step 35.6 -> 31.7 ms
    (28.0 -> 31.5 steps/s) when the heads switched from the per-tap path to this
    (GEMM-fusion category 23.4 -> 19.4 ms in the step trace).

    Values match the per-tap path (``aspp_apply``'s dilated_conv3x3_taps sum): the
    per-branch f32 tap accumulation happens in the same (kh, kw) order, each branch
    rounds to ``dtype`` before the cross-branch f32 + bias sum, exactly like
    models/layers.py aspp_apply. Gradient reduction ORDER differs (one wide GEMM vs
    9 small ones), so grads match to float round-off, not bitwise.
    """
    b, h, w, c = x.shape
    xb = x.astype(dtype)
    ns = [k.shape[-1] for k in kernels]
    w_all = jnp.concatenate(
        [k.astype(dtype).reshape(9, c, n).transpose(1, 0, 2).reshape(c, 9 * n)
         for k, n in zip(kernels, ns)],
        axis=-1,
    )
    z = jax.lax.dot_general(
        xb, w_all, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, H, W, 9*sum N_b) f32 — the per-tap pre-shift products
    out = None
    off = 0
    for bias, n, d in zip(biases, ns, dilations):
        zb = jax.lax.slice(z, (0, 0, 0, off), (b, h, w, off + 9 * n))
        off += 9 * n
        zp = jnp.pad(zb, ((0, 0), (d, d), (d, d), (0, 0)))
        acc = None
        for kh in range(3):
            for kw in range(3):
                t = kh * 3 + kw
                sl = jax.lax.slice(
                    zp, (0, kh * d, kw * d, t * n),
                    (b, kh * d + h, kw * d + w, (t + 1) * n),
                )
                acc = sl if acc is None else acc + sl
        y = acc.astype(dtype).astype(jnp.float32) + bias
        out = y if out is None else out + y
    return out.astype(dtype)
