"""Shared NHWC building blocks for the DeepLab model family.

TPU-first conventions:
  - NHWC activations / HWIO kernels (XLA's preferred conv layout on TPU);
  - compute dtype configurable (bfloat16 by default) with float32 params;
  - BatchNorm with frozen affine parameters but live batch statistics in training, exactly
    matching the reference's ``requires_grad=False`` + ``model.train()`` combination
    (model/deeplab_multi.py:64-76 with tools/trainV2_simt.py:308): normalisation uses batch
    stats during training (and updates running stats), running stats at eval.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def conv(
    features: int,
    kernel: Tuple[int, int],
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    bias: bool = False,
    name: str,
    dtype: Any,
) -> nn.Conv:
    """Conv matching torch ``nn.Conv2d(kernel, stride, padding, dilation)`` semantics."""
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=bias,
        kernel_init=nn.initializers.normal(stddev=0.01),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def batch_norm(*, name: str, dtype: Any) -> nn.BatchNorm:
    """BatchNorm matching torch defaults (momentum 0.1 -> flax momentum 0.9, eps 1e-5)."""
    return nn.BatchNorm(
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def stem_conv7x7_wfold(x: jax.Array, dtype: Any) -> jax.Array:
    """The ResNet 7x7/2 pad-3 stem with W pixel-pairs folded into channels.

    Parameter-compatible with the ``nn.Conv`` stem: one ``conv1/kernel`` HWIO
    (7, 7, 3, 64) float32 param. The fold is TRANSPOSE-FREE: (…, W, C) ->
    (…, W/2, 2C) is a pure reshape (W, C are the two minor contiguous dims), and
    the kernel's W taps are zero-padded to 8 and regrouped (7, 4, 2*3, 64) the
    same way — a (7, 4)/(2, 1) VALID conv over 6 channels then lands every
    original stride-2 output column exactly. Same math as the 7x7/2 conv up to
    accumulation order (a full 2x2 space-to-depth would give K=192 but needs a
    channel-minor=3 transpose, measured SLOWER in-step: 33.1 -> 32.7 steps/s).
    """
    w = conv_kernel_param("conv1", (7, 7, 3, 64))
    b, h, wd, c = x.shape
    x = x.astype(dtype)
    pwr = 3 + (wd % 2)  # keep the padded W extent even for the pair fold
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, pwr), (0, 0)))
    xp = xp.reshape(b, h + 6, (wd + 3 + pwr) // 2, 2 * c)
    w8 = jnp.pad(w.astype(dtype), ((0, 0), (0, 1), (0, 0), (0, 0)))
    ws = w8.reshape(7, 4, 2 * c, 64)
    return jax.lax.conv_general_dilated(
        xp, ws, window_strides=(2, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def max_pool_ceil(x: jax.Array, window: int, stride: int, padding: int) -> jax.Array:
    """Max pool with torch ``ceil_mode=True`` semantics (deeplab_multi.py:133).

    Implemented as a floor-mode pool with asymmetric -inf padding
    ``(padding, padding + stride - 1)``: floor((H + 2p + s-1 - k)/s) + 1 == ceil-mode size.
    Valid for the DeepLab geometry (the extra window always overlaps real input here).

    Measured non-win (round 4, don't redo): a shifted-slice formulation of the
    3x3/2 pool (even/odd row folds + elementwise max, value-identical — the
    all-GEMM-conv trick applied to pooling) removes the two 0.16 ms reduce-window
    HLOs from the SimT step trace but the full step is NEUTRAL (3x A/B on v5e:
    off 36.06/36.15/36.14 vs on 36.24/36.02/36.12 steps/s) — the pools overlap
    with adjacent work. It also routes tie gradients differently from torch
    (reduce-window matches F.max_pool2d bit-exactly at post-ReLU zero ties;
    the maximum-tree does not), so it could never serve the warmup stage anyway.
    """
    pads = ((padding, padding + stride - 1), (padding, padding + stride - 1))
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=pads)


def conv_kernel_param(scope_name: str, shape: Tuple[int, ...]) -> jax.Array:
    """A bare conv kernel param under a child scope (torch-compatible naming:
    ``<scope>/kernel`` with the same HWIO shape nn.Conv would store), for convs
    implemented as explicit MXU dots (ops/conv.py) instead of convolution HLOs."""

    class _P(nn.Module):
        @nn.compact
        def __call__(self):
            return self.param(
                "kernel", nn.initializers.normal(stddev=0.01), shape, jnp.float32
            )

    return _P(name=scope_name)()


def conv3x3_param(mod: nn.Module, scope_name: str, c_in: int, c_out: int) -> jax.Array:
    """A bare 3x3 conv kernel param under a child scope (torch-compatible naming)."""
    return conv_kernel_param(scope_name, (3, 3, c_in, c_out))


# A Pallas implicit-GEMM 3x3 kernel was measured against the shifted-slice GEMM
# formulation below and LOSES ~20% end-to-end (wins 15-30% in isolation; pallas_call
# boundaries stop XLA from fusing the surrounding BN/ReLU/residual elementwise work
# into the conv loops). It lives in experiments/pallas_alternates/conv3x3.py with its
# tests and the measured ledger.


class Bottleneck(nn.Module):
    """ResNet bottleneck with optional dilation (model/deeplab_multi.py:57-101).

    Stride sits on the 1x1 ``conv1`` (the "change" comment in the reference :62), not on
    the 3x3 — this is the DeepLab variant of torchvision's block. All BN affine params are
    frozen (optimizer partition handles that; see train/state.py).
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # All convs are explicit MXU dots (ops/conv.py): 1x1s are channel matmuls,
        # the dilated 3x3 is nine shifted-slice GEMMs with a hand-written VJP of the
        # same form. Zero convolution HLOs -> no convolution operand layouts -> no
        # transpose copies in the composed backward (tools/profile_trace.py).
        from ..ops.conv import conv1x1, dilated_conv3x3_taps

        residual = x
        use_ra = not train
        in_ch = x.shape[-1]
        x = x.astype(self.dtype)
        w1 = conv_kernel_param("conv1", (1, 1, in_ch, self.planes))
        out = conv1x1(x, w1.astype(self.dtype), stride=self.stride)
        out = batch_norm(name="bn1", dtype=self.dtype)(out, use_running_average=use_ra)
        out = nn.relu(out)
        w2 = conv3x3_param(self, "conv2", self.planes, self.planes)
        out = dilated_conv3x3_taps(
            out.astype(self.dtype), w2.astype(self.dtype), self.dilation
        )
        out = batch_norm(name="bn2", dtype=self.dtype)(out, use_running_average=use_ra)
        out = nn.relu(out)
        w3 = conv_kernel_param("conv3", (1, 1, self.planes, self.planes * 4))
        out = conv1x1(out, w3.astype(self.dtype))
        out = batch_norm(name="bn3", dtype=self.dtype)(out, use_running_average=use_ra)
        if self.has_downsample:
            wd = conv_kernel_param(
                "downsample_conv", (1, 1, in_ch, self.planes * 4)
            )
            residual = conv1x1(x, wd.astype(self.dtype), stride=self.stride)
            residual = batch_norm(name="downsample_bn", dtype=self.dtype)(
                residual, use_running_average=use_ra
            )
        return nn.relu(out + residual)


def res_stage(
    x: jax.Array,
    idx: int,
    planes: int,
    blocks: int,
    *,
    stride: int,
    dilation: int,
    train: bool,
    dtype: Any,
) -> jax.Array:
    """One ResNet stage (``_make_layer``, deeplab_multi.py:152-167), named ``layer{idx}_{i}``.

    Downsample on the first block iff stride != 1, channel change, or dilation in {2, 4}
    (the reference's dilated layers always get a projection, :154).
    Must be called from inside a flax module's ``__call__`` (submodules bind to it).
    """
    in_ch = x.shape[-1]
    has_ds = stride != 1 or in_ch != planes * 4 or dilation in (2, 4)
    x = Bottleneck(
        planes,
        stride=stride,
        dilation=dilation,
        has_downsample=has_ds,
        dtype=dtype,
        name=f"layer{idx}_0",
    )(x, train)
    for i in range(1, blocks):
        x = Bottleneck(planes, dilation=dilation, dtype=dtype, name=f"layer{idx}_{i}")(
            x, train
        )
    return x


def aspp_branch_params(
    mod: nn.Module, scope_name: str, in_ch: int, num_classes: int,
    dilations: Sequence[int] = (6, 12, 18, 24),
):
    """Create the 4 dilated-conv branch params of one ``Classifier_Module``
    (deeplab_multi.py:104-113) under a child scope named ``scope_name`` (so the torch
    checkpoint mapping ``layer5.conv2d_list.{i}`` keeps working). Returns
    (kernels, biases) lists of length 4."""

    class _Params(nn.Module):
        @nn.compact
        def __call__(self):
            ws, bs = [], []
            for i in range(len(dilations)):
                ws.append(self.param(
                    f"branch{i}_kernel", nn.initializers.normal(stddev=0.01),
                    (3, 3, in_ch, num_classes), jnp.float32,
                ))
                bs.append(self.param(
                    f"branch{i}_bias", nn.initializers.zeros, (num_classes,), jnp.float32
                ))
            return ws, bs

    return _Params(name=scope_name)()


def aspp_apply(
    x: jax.Array,
    kernels: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    *,
    dilations: Sequence[int] = (6, 12, 18, 24),
    effective_branches: int = 2,
    dtype: Any = jnp.bfloat16,
    wide: bool = True,
) -> jax.Array:
    """Sum of the first ``effective_branches`` dilated convs (the reference's
    early-return quirk, deeplab_multi.py:115-119). Branch sum + bias in float32 (MXU
    accumulates bf16 matmuls in f32 internally; the cross-branch reduction shouldn't
    re-round to bf16).

    ``wide=True`` (the default, used in training) routes through ``aspp_sum_wide``
    (ops/conv.py), which merges all (tap x branch) channel GEMMs into one
    full-lane-width dot — the N=34 per-branch GEMMs of the per-tap path waste 73%
    of every MXU output tile and contract K=34 in the backward. ``wide=False``
    keeps the per-tap formulation; the EVAL jits use it because the wide graph
    composed with the fused Pallas eval kernel in one two-scale program
    reproducibly faulted the v5e TPU worker (round-3 finding; each piece alone is
    fine), and eval is forward-only where the per-tap cost difference is small."""
    if wide:
        from ..ops.conv import aspp_sum_wide

        return aspp_sum_wide(
            x, list(kernels[:effective_branches]), list(biases[:effective_branches]),
            list(dilations[:effective_branches]), dtype=dtype,
        )
    from ..ops.conv import dilated_conv3x3_taps

    out = None
    for i, d in enumerate(dilations[:effective_branches]):
        y = dilated_conv3x3_taps(x.astype(dtype), kernels[i].astype(dtype), d)
        y = y.astype(jnp.float32) + biases[i]
        out = y if out is None else out + y
    return out.astype(dtype)


class ASPPHead(nn.Module):
    """ASPP classifier (``Classifier_Module``, model/deeplab_multi.py:104-119).

    Four parallel 3x3 dilated convs (dilations 6/12/18/24) whose outputs are summed.
    ``effective_branches`` replicates the reference's early-return quirk
    (deeplab_multi.py:115-119): the multi-head and VGG models effectively sum only the
    first two branches; the single-head model (deeplab.py:112-116) sums all four. All four
    branches' parameters are always created for checkpoint compatibility; unused branches
    cost zero FLOPs and are excluded from optimizer updates (matching torch, where unused
    params receive no grad and SGD skips them).
    """

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    effective_branches: int = 2
    dtype: Any = jnp.bfloat16
    wide: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        ws, bs = [], []
        for i in range(len(self.dilations)):
            ws.append(self.param(
                f"branch{i}_kernel", nn.initializers.normal(stddev=0.01),
                (3, 3, in_ch, self.num_classes), jnp.float32,
            ))
            bs.append(self.param(
                f"branch{i}_bias", nn.initializers.zeros, (self.num_classes,), jnp.float32
            ))
        return aspp_apply(
            x, ws, bs, dilations=self.dilations,
            effective_branches=self.effective_branches, dtype=self.dtype,
            wide=self.wide,
        )
