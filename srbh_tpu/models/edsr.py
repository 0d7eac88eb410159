"""EDSR super-resolution family.

Capability twins of the reference's EDSR variants (SR/edsr.py:105-324):

* :class:`EDSR`       — head conv, 16 residual blocks (res_scale 0.1, no BN),
  body conv + global skip, pixel-shuffle tail (returns the SR image).
* :class:`EDSR` with ``return_features='lr'``  — also returns the LR body
  features (``EDSR_fea``, SR/edsr.py:178-249).
* ``return_features='hr'`` — returns pre-``conv_last`` HR features
  (``EDSR_feaHR``, SR/edsr.py:252-324, used by ``SRRegress_Cls_decision``).

One module with a flag replaces the reference's three near-identical classes;
the parameter tree is identical across modes so checkpoints interchange.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from srbh_tpu.models.layers import Dtype, PixelShuffleUpsampler, tconv


class ResBlock(nn.Module):
    """Residual block without BN, scaled residual (SR/edsr.py:51-72)."""

    n_feats: int
    res_scale: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = tconv(self.n_feats, 3, dtype=self.dtype, name="conv1")(x)
        res = nn.relu(res)
        res = tconv(self.n_feats, 3, dtype=self.dtype, name="conv2")(res)
        return x + res * self.res_scale


class EDSR(nn.Module):
    n_resblocks: int = 16
    n_feats: int = 128
    n_out: int = 3
    up_scale: int = 4
    res_scale: float = 0.1
    return_features: Optional[str] = None  # None | 'lr' | 'hr'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = tconv(self.n_feats, 3, dtype=self.dtype, name="head")(x)
        res = x
        for i in range(self.n_resblocks):
            res = ResBlock(self.n_feats, self.res_scale, self.dtype,
                           name=f"body_{i}")(res)
        res = tconv(self.n_feats, 3, dtype=self.dtype, name="body_conv")(res)
        res = res + x
        up = PixelShuffleUpsampler(self.up_scale, self.n_feats,
                                   dtype=self.dtype, name="upsampler")(res)
        out = tconv(self.n_out, 3, dtype=self.dtype, name="tail")(up)
        if self.return_features == "lr":
            return out, res  # LR body features (EDSR_fea)
        if self.return_features == "hr":
            return out, up   # HR pre-tail features (EDSR_feaHR)
        return out
