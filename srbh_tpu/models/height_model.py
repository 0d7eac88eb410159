"""Height-regression + hierarchical-segmentation models.

Capability twins of mymodels.py:

* :class:`SRRegressClsFeature` (mymodels.py:233-337) — **the proposed
  model**: EfficientNet-B4 encoder over the 8-channel S2+S1 tile, two U-Net
  decoders (height / build), an :class:`HRFeature` adapter on the frozen
  Real-ESRGAN features, two :class:`HRFuseResidual` heads (x4 pixel-shuffle
  + fuse + conv), and an optional 64x64 ``aggre_height`` 3x3 conv on the
  height-decoder features.
* :class:`SRRegressClsNosuper` (mymodels.py:341-409) — no-SR ablation with
  :class:`HRUpsample` heads.
* :class:`SRRegressClsFeatureGeo` (mymodels.py:513-578) — adds a GeoNet
  lon/lat/alt prior concatenated into the fusion heads.
* :class:`SRRegressClsFeatureRefine` (mymodels.py:582-650) — second-stage
  :class:`RefineResidual` on top of the fused prediction.

Outputs are NHWC: height (N, 256, 256, 1), build logits (N, 256, 256, C),
aggregated height (N, 64, 64, 1). Callers squeeze the channel axis.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from srbh_tpu.models.efficientnet import EfficientNetEncoder
from srbh_tpu.models.hrfuse import (
    GeoNet,
    HRFeature,
    HRFuseResidual,
    HRUpsample,
    RefineResidual,
)
from srbh_tpu.models.layers import Dtype, tconv
from srbh_tpu.models.unet_decoder import UnetDecoder


class SRRegressClsFeature(nn.Module):
    """The main model: frozen-SR-feature fused height + build prediction.

    ``compute_mode="packed"`` (inference only) runs the 256^2 fusion stack
    (HRFeature + both HRFuseResidual heads) in the space-to-depth domain
    (ops/s2d.py) — measured ~24 TFLOP/s in literal form because 16-channel
    convs starve the MXU lanes.  Parameters and outputs are identical
    (up to dtype rounding); checkpoints load into either mode.
    """

    encoder_name: str = "efficientnet-b4"
    super_mid: int = 16
    upscale: int = 4
    isaggre: bool = False
    chans_build: int = 2
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    compute_mode: str = "literal"  # or "packed" (eval-only fast path)
    drop_connect_rate: float = 0.2  # smp/efficientnet-pytorch default
    remat: bool = False  # rematerialise the 256^2 fusion stack in backward
    dtype: Dtype = jnp.float32

    def setup(self):
        packed = self.compute_mode == "packed"
        # ``remat=True`` wraps the full-resolution (256^2) fusion modules in
        # jax.checkpoint (flax nn.remat): their activations — by far the
        # largest live ranges in training — are recomputed in the backward
        # pass instead of stored, trading ~one extra forward of the cheap
        # 16-channel stack for HBM headroom at large batch. Numerically
        # identical (pinned by tests/test_remat.py); no reference
        # counterpart (torch would use checkpoint_sequential).
        hrfeature, hrfuse = HRFeature, HRFuseResidual
        if self.remat:
            hrfeature = nn.remat(HRFeature, static_argnums=(2,))
            hrfuse = nn.remat(HRFuseResidual, static_argnums=(3,))
        self.encoder = EfficientNetEncoder(
            self.encoder_name, drop_connect_rate=self.drop_connect_rate,
            dtype=self.dtype)
        self.decoder1 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.decoder2 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.hrfeat = hrfeature(self.super_mid, self.super_mid,
                                packed=packed, dtype=self.dtype)
        self.reg = hrfuse(self.decoder_channels[-1], 1, self.upscale,
                          packed=packed, dtype=self.dtype)
        self.seg = hrfuse(self.decoder_channels[-1], self.chans_build,
                          self.upscale, packed=packed, dtype=self.dtype)
        if self.isaggre:
            self.aggre_height = tconv(1, 3, dtype=self.dtype)

    def __call__(self, x, super_fea, train: bool = False,
                 with_build: bool = True, with_aggre: Optional[bool] = None):
        """x: (N, 64, 64, 8) normalised S2+S1; super_fea: (N, 256, 256, 64)
        frozen RRDBNet features.

        ``with_build=False, with_aggre=False`` is the reference's
        ``forward_unsup`` (mymodels.py:295-312, height only);
        ``with_build=False`` alone is ``forward_nobuild`` (:314-337).
        """
        with_aggre = self.isaggre if with_aggre is None else (
            with_aggre and self.isaggre)
        feats = self.encoder(x, train)
        hr = self.hrfeat(super_fea, train)

        height_fea = self.decoder1(*feats, train=train)
        height = self.reg(height_fea, hr, train)

        outputs = [height]
        if with_build:
            build_fea = self.decoder2(*feats, train=train)
            outputs.append(self.seg(build_fea, hr, train))
        if with_aggre:
            outputs.append(self.aggre_height(height_fea))
        return tuple(outputs) if len(outputs) > 1 else outputs[0]


class SRRegressClsNosuper(nn.Module):
    """No-SR ablation (mymodels.py:341-409): HRUpsample heads, no HR input."""

    encoder_name: str = "efficientnet-b4"
    upscale: int = 4
    isaggre: bool = False
    chans_build: int = 2
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    drop_connect_rate: float = 0.2  # smp/efficientnet-pytorch default
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = EfficientNetEncoder(
            self.encoder_name, drop_connect_rate=self.drop_connect_rate,
            dtype=self.dtype)
        self.decoder1 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.decoder2 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.reg = HRUpsample(1, self.upscale, dtype=self.dtype)
        self.seg = HRUpsample(self.chans_build, self.upscale, dtype=self.dtype)
        if self.isaggre:
            self.aggre_height = tconv(1, 3, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        feats = self.encoder(x, train)
        height_fea = self.decoder1(*feats, train=train)
        height = self.reg(height_fea)
        build = self.seg(self.decoder2(*feats, train=train))
        if self.isaggre:
            return height, build, self.aggre_height(height_fea)
        return height, build


class SRRegressClsFeatureGeo(nn.Module):
    """Geo-prior variant (mymodels.py:513-578): the last ``geo_chans_in``
    channels of ``x`` (lon/lat/alt planes) pass through a GeoNet and are
    concatenated with *both decoder outputs* before the fusion heads and the
    aggregation conv."""

    encoder_name: str = "efficientnet-b4"
    in_chans: int = 8  # image channels; geo planes follow at x[..., in_chans:]
    super_mid: int = 16
    geo_mid: int = 16
    upscale: int = 4
    isaggre: bool = False
    chans_build: int = 2
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    drop_connect_rate: float = 0.2  # smp/efficientnet-pytorch default
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = EfficientNetEncoder(
            self.encoder_name, drop_connect_rate=self.drop_connect_rate,
            dtype=self.dtype)
        self.decoder1 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.decoder2 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.hrfeat = HRFeature(self.super_mid, self.super_mid, dtype=self.dtype)
        self.geoprior = GeoNet(self.geo_mid, dtype=self.dtype)
        self.reg = HRFuseResidual(self.decoder_channels[-1], 1, self.upscale,
                                  dtype=self.dtype)
        self.seg = HRFuseResidual(self.decoder_channels[-1], self.chans_build,
                                  self.upscale, dtype=self.dtype)
        if self.isaggre:
            self.aggre_height = tconv(1, 3, dtype=self.dtype)

    def __call__(self, x, super_fea, train: bool = False):
        geo_fea = self.geoprior(x[..., self.in_chans:], train)
        feats = self.encoder(x[..., : self.in_chans], train)
        hr = self.hrfeat(super_fea, train)

        height_fea = self.decoder1(*feats, train=train)
        height_fea = jnp.concatenate([height_fea, geo_fea], axis=-1)
        height = self.reg(height_fea, hr, train)

        build_fea = self.decoder2(*feats, train=train)
        build_fea = jnp.concatenate([build_fea, geo_fea], axis=-1)
        build = self.seg(build_fea, hr, train)
        if self.isaggre:
            return height, build, self.aggre_height(height_fea)
        return height, build


class SRRegressClsFeatureRefine(nn.Module):
    """Two-stage variant (mymodels.py:582-650): a RefineResidual (mid 8) takes
    ``concat(height, build)`` with the HR features and emits a refined height."""

    encoder_name: str = "efficientnet-b4"
    super_mid: int = 16
    upscale: int = 4
    isaggre: bool = False
    chans_build: int = 2
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    drop_connect_rate: float = 0.2  # smp/efficientnet-pytorch default
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = EfficientNetEncoder(
            self.encoder_name, drop_connect_rate=self.drop_connect_rate,
            dtype=self.dtype)
        self.decoder1 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.decoder2 = UnetDecoder(self.decoder_channels, dtype=self.dtype)
        self.hrfeat = HRFeature(self.super_mid, self.super_mid, dtype=self.dtype)
        mid = self.decoder_channels[-1]
        self.reg = HRFuseResidual(mid, 1, self.upscale, dtype=self.dtype)
        self.seg = HRFuseResidual(mid, self.chans_build, self.upscale,
                                  dtype=self.dtype)
        self.refine = RefineResidual(8, 1, dtype=self.dtype)
        if self.isaggre:
            self.aggre_height = tconv(1, 3, dtype=self.dtype)

    def __call__(self, x, super_fea, train: bool = False):
        feats = self.encoder(x, train)
        hr = self.hrfeat(super_fea, train)
        height_fea = self.decoder1(*feats, train=train)
        height = self.reg(height_fea, hr, train)
        build = self.seg(self.decoder2(*feats, train=train), hr, train)
        refined = self.refine(jnp.concatenate([height, build], axis=-1), hr, train)
        if self.isaggre:
            return height, build, self.aggre_height(height_fea), refined
        return height, build, refined
