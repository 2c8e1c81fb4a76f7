"""DeepLab-VGG16 (``DeeplabVGG``, model/deeplab_vgg.py).

The reference file is Python-2-only (``range(23)+range(24,30)`` at deeplab_vgg.py:34
raises TypeError on the repo's own Python 3), i.e. dead code; this is the *repaired*
intent: VGG16 features with pool4/pool5 removed, conv5 block dilated (2,2), fc6/fc7 as
dilated-4 3x3 convs (1024ch), and the 2-branch-effective ASPP classifier
(deeplab_vgg.py:17-21 has the same return-inside-loop quirk as the multi-head model).

Module names mirror the reference's ``features.{i}`` Sequential indices *after* pool
removal (conv5 convs land at 23/25/27, fc6 at 29, fc7 at 31 — deeplab_vgg.py:34-43) so
torch VGG checkpoints import mechanically.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ASPPHead

# (new_sequential_index, out_channels, dilation) for every conv in the trimmed stack.
_VGG_CONVS = [
    (0, 64, 1), (2, 64, 1),            # block1 (pool at old idx 4)
    (5, 128, 1), (7, 128, 1),          # block2 (pool at 9)
    (10, 256, 1), (12, 256, 1), (14, 256, 1),  # block3 (pool at 16)
    (17, 512, 1), (19, 512, 1), (21, 512, 1),  # block4 (pool4 removed)
    (23, 512, 2), (25, 512, 2), (27, 512, 2),  # block5 dilated (deeplab_vgg.py:36-38)
    (29, 1024, 4), (31, 1024, 4),      # fc6 / fc7 (deeplab_vgg.py:40-41)
]
_POOL_AFTER = {2, 7, 14}  # pool follows these conv indices (old pools 4/9/16)


class DeeplabVGG(nn.Module):
    num_classes: int = 19
    aspp_effective_branches: int = 2
    dtype: Any = jnp.bfloat16
    aspp_wide: bool = True  # eval jits clone this off (see eval/evaluate.py)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        for idx, ch, dil in _VGG_CONVS:
            k = (3, 3)
            x = nn.Conv(
                features=ch,
                kernel_size=k,
                padding=((dil, dil), (dil, dil)) if dil > 1 else ((1, 1), (1, 1)),
                kernel_dilation=(dil, dil),
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"features_{idx}",
            )(x)
            x = nn.relu(x)
            if idx in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        out = ASPPHead(
            self.num_classes,
            effective_branches=self.aspp_effective_branches,
            dtype=self.dtype,
            wide=self.aspp_wide,
            name="classifier",
        )(x)
        out = out.astype(jnp.float32)
        return out, out


def deeplab_vgg(num_classes: int = 19, *, dtype: Any = jnp.bfloat16) -> DeeplabVGG:
    return DeeplabVGG(num_classes=num_classes, dtype=dtype)
