"""HR-feature fusion blocks for the height model.

Capability twins of SR/HRfuse.py:

* :class:`HRFeature`       (:164-169)  — 3 ResNet basic blocks adapting the
  frozen SR features (64ch @256^2) to the fusion width.
* :class:`HRFuseResidual`  (:173-190)  — pixel-shuffle x4 the LR decoder
  features, concat with HR features, 3 basic blocks, 3x3 head. **Used by the
  main model** for both the height-regression and segmentation heads.
* :class:`HRFuse` / :class:`HRFuseX2` (:47-89) — conv-BN-ReLU fuse variants
  (fuse-then-upsample / upsample-then-fuse).
* :class:`HRUpsample`      (:193-202) — no-SR ablation head.
* :class:`GeoNet`          (:205-213) — lon/lat/alt prior encoder.
* :class:`RefineResidual`  (:216-228) — second-stage refinement head.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from srbh_tpu.models.layers import (
    BasicBlock,
    ConvBNAct,
    Dtype,
    PixelShuffleUpsampler,
    _PackedConv,
    tconv,
)
from srbh_tpu.ops import s2d


class HRFeature(nn.Module):
    """3-block ResNet adapter on the frozen SR features (SR/HRfuse.py:164-169).

    ``packed=True`` (inference only): computes in the space-to-depth domain
    (ops/s2d.py) — the 16-channel 256^2 chain is MXU-lane-starved in literal
    form — and returns the parity-0 *packed* adapter output (consumers:
    :class:`HRFuseResidual` with ``packed=True``).
    """

    mid_chans: int = 64
    out_chans: int = 64
    packed: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.packed:
            x = s2d.pack(x)
        kw = dict(dtype=self.dtype, packed=self.packed)
        x = BasicBlock(self.mid_chans, name="block0", **kw)(x, train)
        x = BasicBlock(self.mid_chans, name="block1", **kw)(x, train)
        x = BasicBlock(self.out_chans, name="block2", **kw)(x, train)
        return x


class HRFuseResidual(nn.Module):
    """Upsample-then-fuse head with ResNet fusion (SR/HRfuse.py:173-190).

    ``packed=True`` (inference only): expects ``x_hr`` as a parity-0 packed
    tensor (from ``HRFeature(packed=True)``), upsamples straight into the
    packed domain, fuses there, and unpacks only the final small output.
    Parameters are identical to the literal path.
    """

    mid_chans: int = 16
    out_chans: int = 1
    upscale: int = 4
    packed: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_lr, x_hr, train: bool = False):
        lr_chans = x_lr.shape[-1]
        x_lr = PixelShuffleUpsampler(self.upscale, lr_chans, dtype=self.dtype,
                                     packed_output=self.packed,
                                     name="upsampler")(x_lr)
        x = jnp.concatenate([x_lr, x_hr], axis=-1)
        if self.packed:
            hr_chans = x_hr.shape[-1] // 4
            perm = s2d.concat_perm([lr_chans, hr_chans])
            x = BasicBlock(self.mid_chans, dtype=self.dtype, packed=True,
                           kin_perm=perm, name="fuse0")(x, train)
        else:
            x = BasicBlock(self.mid_chans, dtype=self.dtype, name="fuse0")(x, train)
        kw = dict(dtype=self.dtype, packed=self.packed)
        x = BasicBlock(self.mid_chans, name="fuse1", **kw)(x, train)
        x = BasicBlock(self.mid_chans, name="fuse2", **kw)(x, train)
        if self.packed:
            out = _PackedConv(self.out_chans, 3, use_bias=True,
                              dtype=self.dtype, name="conv_last")(x, 0)
            return s2d.unpack(out, parity=1)
        return tconv(self.out_chans, 3, dtype=self.dtype, name="conv_last")(x)


class HRFuse(nn.Module):
    """Fuse-then-upsample conv-BN variant (SR/HRfuse.py:47-66)."""

    mid_chans: int = 16
    out_chans: int = 3
    upscale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_lr, x_hr, train: bool = False):
        x = jnp.concatenate([x_lr, x_hr], axis=-1)
        x = ConvBNAct(self.mid_chans, dtype=self.dtype, name="fuse0")(x, train)
        x = ConvBNAct(self.mid_chans, dtype=self.dtype, name="fuse1")(x, train)
        x = PixelShuffleUpsampler(self.upscale, self.mid_chans,
                                  dtype=self.dtype, name="upsampler")(x)
        return tconv(self.out_chans, 3, dtype=self.dtype, name="conv_last")(x)


class HRFuseX2(nn.Module):
    """Upsample-then-fuse conv-BN variant (SR/HRfuse.py:69-89)."""

    mid_chans: int = 16
    out_chans: int = 3
    upscale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_lr, x_hr, train: bool = False):
        x_lr = PixelShuffleUpsampler(self.upscale, self.mid_chans,
                                     dtype=self.dtype, name="upsampler")(x_lr)
        x = jnp.concatenate([x_lr, x_hr], axis=-1)
        x = ConvBNAct(self.mid_chans, dtype=self.dtype, name="fuse0")(x, train)
        x = ConvBNAct(self.mid_chans, dtype=self.dtype, name="fuse1")(x, train)
        return tconv(self.out_chans, 3, dtype=self.dtype, name="conv_last")(x)


class HRUpsample(nn.Module):
    """No-SR ablation head: upsample + conv (SR/HRfuse.py:193-202)."""

    out_chans: int = 3
    upscale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = PixelShuffleUpsampler(self.upscale, x.shape[-1], dtype=self.dtype,
                                  name="upsampler")(x)
        return tconv(self.out_chans, 3, dtype=self.dtype, name="conv_last")(x)


class GeoNet(nn.Module):
    """lon/lat/alt prior encoder: 3 basic blocks (SR/HRfuse.py:205-213)."""

    mid_chans: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(3):
            x = BasicBlock(self.mid_chans, dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class RefineResidual(nn.Module):
    """Second-stage refinement: concat + 3 basic blocks + head
    (SR/HRfuse.py:216-228)."""

    mid_chans: int = 16
    out_chans: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_lr, x_hr, train: bool = False):
        x = jnp.concatenate([x_lr, x_hr], axis=-1)
        for i in range(3):
            x = BasicBlock(self.mid_chans, dtype=self.dtype, name=f"fuse{i}")(x, train)
        return tconv(self.out_chans, 3, dtype=self.dtype, name="conv_last")(x)
