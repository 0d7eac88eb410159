"""ESPCN: efficient sub-pixel conv SR network.

Capability twin of the reference's ``ESPC`` (SR/espcn.py:9-23): three convs
(5x5 -> 3x3 -> 3x3) with tanh activations and a final x``scale`` pixel
shuffle producing a 3-channel image. ~0.04 M params at defaults
(SR/espcn.py:33), verified in tests.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from srbh_tpu.models.layers import Dtype, tconv
from srbh_tpu.ops.shuffle import pixel_shuffle


class ESPCN(nn.Module):
    upscale_factor: int = 4
    out_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = self.upscale_factor
        x = jnp.tanh(tconv(64, 5, dtype=self.dtype, name="conv1")(x))
        x = jnp.tanh(tconv(32, 3, dtype=self.dtype, name="conv2")(x))
        x = tconv(self.out_channels * r * r, 3, dtype=self.dtype, name="conv3")(x)
        return pixel_shuffle(x, r)
