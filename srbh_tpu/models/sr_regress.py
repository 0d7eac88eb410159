"""Trainable-SR height models (the reference's earlier ablations).

Twins of mymodels.py:

* :class:`SRRegress`           (:16-26)  — EDSR x4 then an EfficientNet-UNet
  regressing at the SR resolution.
* :class:`SRRegressClsEDSR`    (:29-68)  — trainable EDSR feature branch,
  dual U-Net decoders with 3x3 heads at SR resolution.
* :class:`SRRegressClsDecision` (:181-228) — trainable ``EDSR_feaHR`` SR
  branch; its HR pre-tail features fuse with the decoders via
  :class:`HRFuseX2`; also returns the SR image for the decision loss.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from srbh_tpu.models.edsr import EDSR
from srbh_tpu.models.efficientnet import EfficientNetEncoder
from srbh_tpu.models.hrfuse import HRFuseX2
from srbh_tpu.models.layers import Dtype, tconv
from srbh_tpu.models.unet_decoder import UnetDecoder


class SRRegress(nn.Module):
    encoder_name: str = "efficientnet-b4"
    super_channels: int = 4
    classes: int = 1
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.super_res = EDSR(n_out=self.super_channels, dtype=self.dtype)
        self.encoder = EfficientNetEncoder(self.encoder_name, dtype=self.dtype)
        self.decoder = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.head = tconv(self.classes, 3, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        fea = self.super_res(x)
        feats = self.encoder(fea, train)
        return self.head(self.decoder(*feats, train=train))


class SRRegressClsEDSR(nn.Module):
    encoder_name: str = "efficientnet-b4"
    super_channels: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.super_res = EDSR(n_out=self.super_channels, dtype=self.dtype)
        self.super_out = tconv(3, 3, dtype=self.dtype)
        self.encoder = EfficientNetEncoder(self.encoder_name, dtype=self.dtype)
        self.decoder1 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.decoder2 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.seg1 = tconv(1, 3, dtype=self.dtype)
        self.seg2 = tconv(2, 3, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        fea = self.super_res(x)
        sup = self.super_out(fea)
        feats = self.encoder(fea, train)
        height = self.seg1(self.decoder1(*feats, train=train))
        build = self.seg2(self.decoder2(*feats, train=train))
        return sup, height, build


class SRRegressClsDecision(nn.Module):
    encoder_name: str = "efficientnet-b4"
    super_in: int = 4
    super_mid: int = 64
    upscale: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.super_res = EDSR(n_out=3, n_feats=self.super_mid,
                              return_features="hr", dtype=self.dtype)
        self.encoder = EfficientNetEncoder(self.encoder_name, dtype=self.dtype)
        self.decoder1 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.decoder2 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        mid = self.decoder_channels[-1]
        self.seg1 = HRFuseX2(mid, 1, self.upscale, dtype=self.dtype)
        self.seg2 = HRFuseX2(mid, 2, self.upscale, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        sup_out, sup_fea = self.super_res(x[..., : self.super_in])
        feats = self.encoder(x, train)
        height = self.seg1(self.decoder1(*feats, train=train), sup_fea, train)
        build = self.seg2(self.decoder2(*feats, train=train), sup_fea, train)
        return sup_out, height, build
