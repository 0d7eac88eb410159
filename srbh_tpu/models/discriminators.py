"""GAN discriminators for SR training.

Twins of SR/rrdbnet_arch.py:

* :class:`UNetDiscriminatorSN` (:244-303) — U-Net discriminator with
  spectral-normalised convs (flax ``nn.SpectralNorm``; power-iteration state
  lives in the ``batch_stats`` collection, updated when ``train=True``),
  bilinear x2 upsampling, skip connections, LeakyReLU 0.2.
* :class:`VGGStyleDiscriminator` (:306-384) — VGG-style conv/BN stack with
  stride-2 4x4 convs and a 100-dim linear head (input 128 or 256).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from srbh_tpu.models.layers import Dtype, TorchBatchNorm, tconv


def _bilinear_x2(x):
    """align_corners=False bilinear upsample x2 (torch F.interpolate twin)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear")


class UNetDiscriminatorSN(nn.Module):
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        nf = self.num_feat

        def sn_conv(feats, k, s, name):
            # torch padding=1 for both the 4x4/s2 and 3x3/s1 convs (:262-271).
            # Naming the inner Conv puts its kernel at params[name]/kernel
            # (stable for checkpoint conversion); the SN power-iteration
            # state lives at batch_stats[name_sn].
            conv = nn.Conv(feats, (k, k), strides=(s, s),
                           padding=((1, 1), (1, 1)),
                           use_bias=False, dtype=self.dtype, name=name)
            return nn.SpectralNorm(conv, name=f"{name}_sn")

        x0 = lrelu(tconv(nf, 3, 1, dtype=self.dtype, name="conv0")(x))
        x1 = lrelu(sn_conv(nf * 2, 4, 2, "conv1")(x0, update_stats=train))
        x2 = lrelu(sn_conv(nf * 4, 4, 2, "conv2")(x1, update_stats=train))
        x3 = lrelu(sn_conv(nf * 8, 4, 2, "conv3")(x2, update_stats=train))

        x3 = _bilinear_x2(x3)
        x4 = lrelu(sn_conv(nf * 4, 3, 1, "conv4")(x3, update_stats=train))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = _bilinear_x2(x4)
        x5 = lrelu(sn_conv(nf * 2, 3, 1, "conv5")(x4, update_stats=train))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = _bilinear_x2(x5)
        x6 = lrelu(sn_conv(nf, 3, 1, "conv6")(x5, update_stats=train))
        if self.skip_connection:
            x6 = x6 + x0
        out = lrelu(sn_conv(nf, 3, 1, "conv7")(x6, update_stats=train))
        out = lrelu(sn_conv(nf, 3, 1, "conv8")(out, update_stats=train))
        return tconv(1, 3, 1, dtype=self.dtype, name="conv9")(out)


class VGGStyleDiscriminator(nn.Module):
    num_feat: int = 64
    input_size: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.input_size in (128, 256)
        assert x.shape[1] == self.input_size
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        nf = self.num_feat

        def bn(name):
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                  dtype=self.dtype, name=name)

        def down(v, feats, i):
            v = tconv(feats, 3, 1, use_bias=False, dtype=self.dtype,
                      name=f"conv{i}_0")(v)
            v = lrelu(bn(f"bn{i}_0")(v))
            v = tconv(feats, 4, 2, use_bias=False, dtype=self.dtype,
                      name=f"conv{i}_1")(v)
            return lrelu(bn(f"bn{i}_1")(v))

        feat = lrelu(tconv(nf, 3, 1, dtype=self.dtype, name="conv0_0")(x))
        feat = tconv(nf, 4, 2, use_bias=False, dtype=self.dtype,
                     name="conv0_1")(feat)
        feat = lrelu(bn("bn0_1")(feat))
        feat = down(feat, nf * 2, 1)
        feat = down(feat, nf * 4, 2)
        feat = down(feat, nf * 8, 3)
        feat = down(feat, nf * 8, 4)
        if self.input_size == 256:
            feat = down(feat, nf * 8, 5)
        feat = feat.reshape(feat.shape[0], -1)  # (N, 4*4*8nf)
        feat = lrelu(nn.Dense(100, dtype=self.dtype, name="linear1")(feat))
        return nn.Dense(1, dtype=self.dtype, name="linear2")(feat)
