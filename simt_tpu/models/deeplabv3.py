"""DeepLabv3-ASPP on a ResNet-50 trunk (``DeepLabv3``, model/deeplabv3.py).

The TPAMI-variant backbone: torchvision ResNet-50 truncated after layer3 (output stride
16, 1024ch — deeplabv3.py:9-21), a 5-branch ASPP (1x1 + dilations 6/12/18 + 1x1, concat +
1x1 fuse, each conv+BN+ReLU — :23-108), a 1x1 classifier with optional open-set head, and
an in-model half-pixel bilinear upsample to the input size (:129-138, align_corners=False).
Not imported by any reference tool in this branch (SURVEY.md §2.1) — provided as the
second model config.

Unlike the DeepLabv2 trunk, BN here follows torchvision semantics: affine params are
*trainable* and the stride sits on the 3x3 conv2 of each bottleneck.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.interp import upsample_bilinear_half_pixel
from .layers import batch_norm, conv, stem_conv7x7_wfold


class BottleneckV3(nn.Module):
    """torchvision-style bottleneck: stride on conv2 (the 3x3)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        use_ra = not train
        out = conv(self.planes, (1, 1), name="conv1", dtype=self.dtype)(x)
        out = batch_norm(name="bn1", dtype=self.dtype)(out, use_running_average=use_ra)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), stride=self.stride, padding=1, name="conv2",
                   dtype=self.dtype)(out)
        out = batch_norm(name="bn2", dtype=self.dtype)(out, use_running_average=use_ra)
        out = nn.relu(out)
        out = conv(self.planes * 4, (1, 1), name="conv3", dtype=self.dtype)(out)
        out = batch_norm(name="bn3", dtype=self.dtype)(out, use_running_average=use_ra)
        if self.has_downsample:
            residual = conv(self.planes * 4, (1, 1), stride=self.stride,
                            name="downsample_conv", dtype=self.dtype)(x)
            residual = batch_norm(name="downsample_bn", dtype=self.dtype)(
                residual, use_running_average=use_ra
            )
        return nn.relu(out + residual)


class ASPPv3(nn.Module):
    """5-branch ASPP with concat + fuse (``ASSP``, deeplabv3.py:23-108)."""

    out_channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        use_ra = not train
        branches = []
        specs = [  # (name suffix, kernel, dilation) — conv5 is the second 1x1 (:62-69)
            ("1", (1, 1), 1), ("2", (3, 3), 6), ("3", (3, 3), 12), ("4", (3, 3), 18),
            ("5", (1, 1), 1),
        ]
        for suffix, k, d in specs:
            pad = d if k == (3, 3) else 0
            y = conv(self.out_channels, k, padding=pad, dilation=d,
                     name=f"conv{suffix}", dtype=self.dtype)(x)
            y = batch_norm(name=f"bn{suffix}", dtype=self.dtype)(y, use_running_average=use_ra)
            branches.append(nn.relu(y))
        # Reference bilinearly resizes x5 to x4's size (:102) — a no-op here since a 1x1
        # conv preserves HW; kept as documentation of intent.
        y = jnp.concatenate(branches, axis=-1)
        y = conv(self.out_channels, (1, 1), name="convf", dtype=self.dtype)(y)
        y = batch_norm(name="bnf", dtype=self.dtype)(y, use_running_average=use_ra)
        return nn.relu(y)


class DeepLabv3(nn.Module):
    num_classes: int = 19
    open_classes: int = 0
    openset: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1:3]
        use_ra = not train
        x = x.astype(self.dtype)
        # torchvision resnet50 stem: 7x7/2 + BN + ReLU + 3x3/2 max pool (floor mode).
        x = stem_conv7x7_wfold(x, self.dtype)
        x = batch_norm(name="bn1", dtype=self.dtype)(x, use_running_average=use_ra)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for idx, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2)], start=1
        ):
            for i in range(blocks):
                x = BottleneckV3(
                    planes,
                    stride=stride if i == 0 else 1,
                    has_downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{idx}_{i}",
                )(x, train)
        x = ASPPv3(dtype=self.dtype, name="assp")(x, train)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv")(x)
        if self.openset:
            out_open = nn.Conv(self.open_classes, (1, 1), use_bias=True, dtype=self.dtype,
                               param_dtype=jnp.float32, name="conv_1")(x)
            out = jnp.concatenate([out, out_open], axis=-1)
        out = upsample_bilinear_half_pixel(out.astype(jnp.float32), (h, w))
        return out


def deeplabv3(num_classes: int = 19, open_classes: int = 0, openset: bool = False,
              *, dtype: Any = jnp.bfloat16) -> DeepLabv3:
    return DeepLabv3(num_classes=num_classes, open_classes=open_classes, openset=openset,
                     dtype=dtype)
