"""U-Net decoder matching segmentation_models_pytorch's UnetDecoder.

The reference instantiates two of these per height model
(mymodels.py:244-258): 5 blocks, decoder channels (256, 128, 64, 32, 16),
batch-norm on, no attention, no center block. Each block nearest-upsamples
x2, concatenates the encoder skip (the last block has none) and applies two
Conv3x3-BN-ReLU stages.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from srbh_tpu.models.layers import ConvBNAct, Dtype
from srbh_tpu.ops.resize import upsample_nearest


class DecoderBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = upsample_nearest(x, 2)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNAct(self.out_ch, 3, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBNAct(self.out_ch, 3, dtype=self.dtype, name="conv2")(x, train)
        return x


class UnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, *features, train: bool = False):
        # features: [input, f2, f4, f8, f16, f32] from the encoder
        feats = list(features[1:])[::-1]  # drop input tap; deepest first
        x, skips = feats[0], feats[1:]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(x, skip, train)
        return x
