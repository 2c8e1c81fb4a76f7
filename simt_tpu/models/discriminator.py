"""PatchGAN discriminator (``FCDiscriminator``, model/discriminator.py:5-34).

5 stride-2 4x4 convs over class-probability maps (ndf 64->512->1), LeakyReLU(0.2).
Present-but-unused in the reference (its only import is commented out,
trainV2_simt.py:19); provided for the adversarial-warmup capability surface
(BASELINE.json warmup config). See train/adversarial.py for the optional trainer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class FCDiscriminator(nn.Module):
    ndf: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, num_classes) probability/logit maps -> (B, H/32, W/32, 1)."""
        x = x.astype(self.dtype)
        for i, ch in enumerate([self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8]):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"conv{i + 1}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(1, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="classifier")(x)
        return x.astype(jnp.float32)
