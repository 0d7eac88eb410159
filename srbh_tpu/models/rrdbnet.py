"""RRDBNet — the (Real-)ESRGAN generator and frozen feature extractor.

Capability twin of SR/rrdbnet_arch.py:113-240: 23 residual-in-residual dense
blocks (each 3 dense blocks of 5 growth convs with LeakyReLU 0.2 and 0.2-scaled
residuals), conv trunk skip, two nearest-x2 + conv upsample stages, and either
the final SR image (``__call__``) or the pre-``conv_last`` 64-channel x4
features consumed by the height model (``forward_feature``,
SR/rrdbnet_arch.py:225-240 — note the final ``conv_hr`` there is *not*
activated).

Also provides the older 4-channel ``RRDBNetSimple`` (SR/RRDBNet.py:14-78).

TPU notes: dense-block concat growth (64 + i*32 channels) is left to XLA —
each conv is an implicit-GEMM on the MXU and the concats are fused into the
conv input reads; channels-last keeps the 32/64-channel axes on the lane
dimension. The whole trunk jits into one program, so the "frozen SR feature"
pass fuses with the downstream height model in a single XLA executable.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from srbh_tpu.models.layers import Dtype, kaiming_normal_scaled, tconv
from srbh_tpu.ops.resize import upsample_nearest
from srbh_tpu.ops.shuffle import pixel_unshuffle


def _growth_conv(features, name, dtype):
    # ESRGAN residual-branch init: kaiming_normal * 0.1 (rrdbnet_arch.py:138)
    return tconv(features, 3, kernel_init=kaiming_normal_scaled(0.1),
                 dtype=dtype, name=name)


class ResidualDenseBlock(nn.Module):
    """5-conv dense block with 0.2-scaled residual (rrdbnet_arch.py:113-143)."""

    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        x1 = lrelu(_growth_conv(self.num_grow_ch, "conv1", self.dtype)(x))
        x2 = lrelu(_growth_conv(self.num_grow_ch, "conv2", self.dtype)(
            jnp.concatenate([x, x1], -1)))
        x3 = lrelu(_growth_conv(self.num_grow_ch, "conv3", self.dtype)(
            jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(_growth_conv(self.num_grow_ch, "conv4", self.dtype)(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _growth_conv(self.num_feat, "conv5", self.dtype)(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (rrdbnet_arch.py:146-167)."""

    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype,
                                 name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype,
                                 name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype,
                                 name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """ESRGAN generator (rrdbnet_arch.py:170-240), scale 1/2/4."""

    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32

    def _trunk(self, x):
        # scale<4 trades spatial for channels up front (rrdbnet_arch.py:208-213)
        if self.scale == 2:
            x = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = pixel_unshuffle(x, 4)
        feat = tconv(self.num_feat, 3, dtype=self.dtype, name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, self.dtype,
                        name=f"body_{i}")(body)
        body = tconv(self.num_feat, 3, dtype=self.dtype, name="conv_body")(body)
        feat = feat + body
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        feat = lrelu(tconv(self.num_feat, 3, dtype=self.dtype, name="conv_up1")(
            upsample_nearest(feat, 2)))
        feat = lrelu(tconv(self.num_feat, 3, dtype=self.dtype, name="conv_up2")(
            upsample_nearest(feat, 2)))
        return tconv(self.num_feat, 3, dtype=self.dtype, name="conv_hr")(feat)

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        hr = self._trunk(x)
        if features_only:
            # forward_feature (rrdbnet_arch.py:225-240): pre-conv_last features
            # WITHOUT the LeakyReLU that the image path applies.
            return hr
        out = tconv(self.num_out_ch, 3, dtype=self.dtype, name="conv_last")(
            nn.leaky_relu(hr, 0.2))
        return out


class RRDBNetSimple(nn.Module):
    """Older ESRGAN generator without pixel-unshuffle (SR/RRDBNet.py:53-78)."""

    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = tconv(self.num_feat, 3, use_bias=True, dtype=self.dtype,
                     name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, self.dtype,
                        name=f"body_{i}")(body)
        body = tconv(self.num_feat, 3, dtype=self.dtype, name="trunk_conv")(body)
        feat = feat + body
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        feat = lrelu(tconv(self.num_feat, 3, dtype=self.dtype, name="upconv1")(
            upsample_nearest(feat, 2)))
        feat = lrelu(tconv(self.num_feat, 3, dtype=self.dtype, name="upconv2")(
            upsample_nearest(feat, 2)))
        feat = lrelu(tconv(self.num_feat, 3, dtype=self.dtype, name="HRconv")(feat))
        return tconv(self.num_out_ch, 3, dtype=self.dtype, name="conv_last")(feat)
