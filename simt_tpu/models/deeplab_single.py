"""DeepLab single-head ResNet-101 (``Res_Deeplab``, model/deeplab.py).

Same dilated trunk as ResNetMulti but ONE classifier on layer4 features whose ASPP sums
ALL four branches (deeplab.py:112-116 returns *outside* the loop, unlike the multi-head
quirk), and ``forward`` returns the logits duplicated ``(x, x)`` (deeplab.py:166-177).
Used by the reference only as an alternative eval model (evaluate_cityscapes.py:12).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    ASPPHead, batch_norm, max_pool_ceil, res_stage, stem_conv7x7_wfold,
)


class DeeplabSingle(nn.Module):
    num_classes: int = 19
    layers: Sequence[int] = (3, 4, 23, 3)
    dtype: Any = jnp.bfloat16
    aspp_wide: bool = True  # eval jits clone this off (see eval/evaluate.py)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x = stem_conv7x7_wfold(x, self.dtype)
        x = batch_norm(name="bn1", dtype=self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_ceil(x, window=3, stride=2, padding=1)
        kw = dict(train=train, dtype=self.dtype)
        x = res_stage(x, 1, 64, self.layers[0], stride=1, dilation=1, **kw)
        x = res_stage(x, 2, 128, self.layers[1], stride=2, dilation=1, **kw)
        x = res_stage(x, 3, 256, self.layers[2], stride=1, dilation=2, **kw)
        x = res_stage(x, 4, 512, self.layers[3], stride=1, dilation=4, **kw)
        out = ASPPHead(
            self.num_classes, effective_branches=4, dtype=self.dtype,
            wide=self.aspp_wide, name="layer5"
        )(x)
        out = out.astype(jnp.float32)
        return out, out


def res_deeplab(num_classes: int = 19, *, dtype: Any = jnp.bfloat16) -> DeeplabSingle:
    """Factory matching ``Res_Deeplab`` (deeplab.py:223): ResNet-101 single head."""
    return DeeplabSingle(num_classes=num_classes, layers=(3, 4, 23, 3), dtype=dtype)
