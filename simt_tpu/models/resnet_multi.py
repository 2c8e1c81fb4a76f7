"""DeepLabv2-ResNet101 multi-head — the flagship trained model.

Re-designs ``ResNetMulti`` / ``DeeplabMulti`` (model/deeplab_multi.py:122-242) TPU-first:
NHWC activations, bfloat16 conv compute on the MXU with float32 params, XLA dilated convs
(``rhs_dilation``) for layers 3/4 and the ASPP heads, and a functional forward under
``jax.jit``. Geometry matches the reference exactly:

  - 7x7/2 stem + ceil-mode 3x3/2 max pool (deeplab_multi.py:127-133);
  - layer1 (3 blocks), layer2 (4 blocks, stride 2), layer3 (23 blocks, dilation 2),
    layer4 (3 blocks, dilation 4) — output stride 8 (deeplab_multi.py:134-137);
  - ``layer5`` ASPP on layer3 features (1024ch), ``layer6`` on layer4 (2048ch), with the
    effective 2-branch sum quirk (deeplab_multi.py:115-119);
  - optional open-set heads ``layer5_1``/``layer6_1`` concatenated channel-wise
    (deeplab_multi.py:140-142,182-190).

Returns ``(x1, x2)`` logits at stride 8 in float32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    aspp_apply,
    aspp_branch_params,
    batch_norm,
    max_pool_ceil,
    res_stage,
    stem_conv7x7_wfold,
)


class ResNetMulti(nn.Module):
    num_classes: int = 19
    open_classes: int = 0
    openset: bool = False
    layers: Sequence[int] = (3, 4, 23, 3)
    aspp_effective_branches: int = 2
    dtype: Any = jnp.bfloat16
    # Merged-N wide ASPP heads (ops/conv.py::aspp_sum_wide). Training default; the
    # eval jits clone the model with False (see models/layers.py aspp_apply).
    aspp_wide: bool = True

    def _head(self, x: jax.Array, name: str) -> jax.Array:
        """One classifier head; in open-set mode the known/open heads' kernels are
        concatenated per branch so each dilation costs ONE conv producing all C+O
        channels (the reference runs layer5 and layer5_1 separately and concatenates
        outputs, deeplab_multi.py:182-190 — output-identical, half the conv calls)."""
        in_ch = x.shape[-1]
        ws, bs = aspp_branch_params(self, name, in_ch, self.num_classes)
        if self.openset:
            wso, bso = aspp_branch_params(self, f"{name}_1", in_ch, self.open_classes)
            ws = [jnp.concatenate([w, wo], axis=-1) for w, wo in zip(ws, wso)]
            bs = [jnp.concatenate([b, bo], axis=-1) for b, bo in zip(bs, bso)]
        return aspp_apply(
            x, ws, bs, effective_branches=self.aspp_effective_branches,
            dtype=self.dtype, wide=self.aspp_wide,
        )

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """x: (B, H, W, 3) mean-subtracted BGR. Returns stride-8 logit maps (f32)."""
        x = x.astype(self.dtype)
        x = stem_conv7x7_wfold(x, self.dtype)
        x = batch_norm(name="bn1", dtype=self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_ceil(x, window=3, stride=2, padding=1)
        x = res_stage(x, 1, 64, self.layers[0], stride=1, dilation=1, train=train,
                      dtype=self.dtype)
        x = res_stage(x, 2, 128, self.layers[1], stride=2, dilation=1, train=train,
                      dtype=self.dtype)
        x = res_stage(x, 3, 256, self.layers[2], stride=1, dilation=2, train=train,
                      dtype=self.dtype)

        x1 = self._head(x, "layer5")

        x = res_stage(x, 4, 512, self.layers[3], stride=1, dilation=4, train=train,
                      dtype=self.dtype)
        x2 = self._head(x, "layer6")

        return x1.astype(jnp.float32), x2.astype(jnp.float32)


def deeplab_multi(
    num_classes: int = 19,
    open_classes: int = 0,
    openset: bool = False,
    *,
    dtype: Any = jnp.bfloat16,
    aspp_effective_branches: int = 2,
) -> ResNetMulti:
    """Factory matching ``DeeplabMulti`` (model/deeplab_multi.py:240-242): ResNet-101."""
    return ResNetMulti(
        num_classes=num_classes,
        open_classes=open_classes,
        openset=openset,
        layers=(3, 4, 23, 3),
        aspp_effective_branches=aspp_effective_branches,
        dtype=dtype,
    )
