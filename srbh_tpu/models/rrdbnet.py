"""RRDBNet — the (Real-)ESRGAN generator and frozen feature extractor.

Capability twin of SR/rrdbnet_arch.py:113-240: 23 residual-in-residual dense
blocks (each 3 dense blocks of 5 growth convs with LeakyReLU 0.2 and 0.2-scaled
residuals), conv trunk skip, two nearest-x2 + conv upsample stages, and either
the final SR image (``__call__``) or the pre-``conv_last`` 64-channel x4
features consumed by the height model (``forward_feature``,
SR/rrdbnet_arch.py:225-240 — note the final ``conv_hr`` there is *not*
activated).

Also provides the older 4-channel ``RRDBNetSimple`` (SR/RRDBNet.py:14-78).

TPU notes: channels-last keeps the 32/64-channel axes on the lane dimension,
and the whole trunk jits into one program, so the "frozen SR feature" pass
fuses with the downstream height model in a single XLA executable.

The dense block's literal form is MXU-hostile: convs 1-4 have only 32 output
channels (25% of the 128 MXU lanes) and the growing concats (96/128/160/192
channels) are materialised through HBM. ``ResidualDenseBlock`` therefore
offers an algebraically *identical* regrouping (``fused=True``): each
conv's kernel is split by input source (x, x1, .., x4) and the per-source
slices of ALL later convs are stacked output-wise, giving one wide conv per
source (N = 192/160/128/96/64 instead of 32/32/32/32/64) whose partial sums
are added before each LeakyReLU. Parameters are identical in both modes
(conv1..conv5 kernel/bias), so converted reference checkpoints load
unchanged.

MEASURED on a real v5e chip (chained timing, b128/b256): the regrouped form
is ~7-11% SLOWER than the literal one (555 vs 593 t/s at b128) — XLA
already fuses the concats into the conv input reads, and the restacked
form pays extra partial-sum writes. The default is therefore the literal
form; ``fused=True`` remains available (and equivalence-tested) as a
building block for future kernel work.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import Any, Callable, Optional

from srbh_tpu.models.layers import (
    Dtype,
    kaiming_normal_scaled,
    tconv,
    torch_conv_default_init,
)
from srbh_tpu.ops.quant import int8_conv
from srbh_tpu.ops.resize import upsample_nearest
from srbh_tpu.ops.shuffle import pixel_unshuffle


def _growth_conv(features, name, dtype, kernel_init=None):
    # ESRGAN residual-branch init: kaiming_normal * 0.1 (rrdbnet_arch.py:138)
    return tconv(features, 3,
                 kernel_init=kernel_init or kaiming_normal_scaled(0.1),
                 dtype=dtype, name=name)


class _ConvParams(nn.Module):
    """Declares a conv's kernel/bias with nn.Conv's exact names, shapes and
    init, without binding the compute — used by the fused dense block (which
    slices and restacks kernels) and the int8 path (which quantizes them)."""

    cin: int
    cout: int
    k: int = 3
    kernel_init: Any = None

    @nn.compact
    def __call__(self):
        init = self.kernel_init or kaiming_normal_scaled(0.1)
        kernel = self.param("kernel", init,
                            (self.k, self.k, self.cin, self.cout))
        bias = self.param("bias", nn.initializers.zeros, (self.cout,))
        return kernel, bias


def _conv3x3(x, kernel, dtype):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResidualDenseBlock(nn.Module):
    """5-conv dense block with 0.2-scaled residual (rrdbnet_arch.py:113-143).

    ``fused=False`` (default — measured faster, see module docstring) is the
    literal concat-then-narrow-conv translation; ``fused=True`` computes the
    source-split/output-stacked form. Both share one parameter layout.
    """

    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32
    fused: bool = False
    quantize: bool = False
    growth_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        nf, gc = self.num_feat, self.num_grow_ch
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        if self.quantize:
            def qc(v, feats, name):
                k, b = _ConvParams(v.shape[-1], feats, name=name)()
                return int8_conv(v, k, b, out_dtype=self.dtype)

            x1 = lrelu(qc(x, gc, "conv1"))
            x2 = lrelu(qc(jnp.concatenate([x, x1], -1), gc, "conv2"))
            x3 = lrelu(qc(jnp.concatenate([x, x1, x2], -1), gc, "conv3"))
            x4 = lrelu(qc(jnp.concatenate([x, x1, x2, x3], -1), gc, "conv4"))
            x5 = qc(jnp.concatenate([x, x1, x2, x3, x4], -1), nf, "conv5")
            return x5 * 0.2 + x
        if not self.fused:
            x1 = lrelu(_growth_conv(gc, "conv1", self.dtype,
                                    self.growth_init)(x))
            x2 = lrelu(_growth_conv(gc, "conv2", self.dtype,
                                    self.growth_init)(
                jnp.concatenate([x, x1], -1)))
            x3 = lrelu(_growth_conv(gc, "conv3", self.dtype,
                                    self.growth_init)(
                jnp.concatenate([x, x1, x2], -1)))
            x4 = lrelu(_growth_conv(gc, "conv4", self.dtype,
                                    self.growth_init)(
                jnp.concatenate([x, x1, x2, x3], -1)))
            x5 = _growth_conv(nf, "conv5", self.dtype, self.growth_init)(
                jnp.concatenate([x, x1, x2, x3, x4], -1))
            return x5 * 0.2 + x

        couts = (gc, gc, gc, gc, nf)
        kb = [_ConvParams(nf + i * gc, couts[i], name=f"conv{i + 1}")()
              for i in range(5)]
        # source j's channel range within conv_i's concatenated input
        src = lambda j: slice(0, nf) if j == 0 else slice(
            nf + (j - 1) * gc, nf + j * gc)
        # one wide conv per source: stack the source-j slice of convs j+1..5
        stacked = [
            jnp.concatenate([kb[i][0][:, :, src(j), :] for i in range(j, 5)],
                            axis=-1)
            for j in range(5)
        ]
        bias_all = jnp.concatenate([b for _, b in kb]).astype(self.dtype)

        dt = self.dtype
        acc = _conv3x3(x.astype(dt), stacked[0], dt) + bias_all
        # partial sums indexed by producing conv (2..5) from each source
        cut = lambda t, k0, k1: t[..., k0:k1]
        a = [cut(acc, sum(couts[:i]), sum(couts[:i + 1])) for i in range(5)]
        x1 = lrelu(a[0])
        b_ = _conv3x3(x1, stacked[1], dt)
        x2 = lrelu(a[1] + b_[..., :gc])
        c_ = _conv3x3(x2, stacked[2], dt)
        x3 = lrelu(a[2] + b_[..., gc:2 * gc] + c_[..., :gc])
        d_ = _conv3x3(x3, stacked[3], dt)
        x4 = lrelu(a[3] + b_[..., 2 * gc:3 * gc] + c_[..., gc:2 * gc]
                   + d_[..., :gc])
        e_ = _conv3x3(x4, stacked[4], dt)
        x5 = (a[4] + b_[..., 3 * gc:] + c_[..., 2 * gc:] + d_[..., gc:] + e_)
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (rrdbnet_arch.py:146-167)."""

    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32
    fused: bool = False
    quantize: bool = False
    growth_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for name in ("rdb1", "rdb2", "rdb3"):
            block = ResidualDenseBlock(
                self.num_feat, self.num_grow_ch, self.dtype, self.fused,
                self.quantize, growth_init=self.growth_init, name=name)
            out = block(x if name == "rdb1" else out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """ESRGAN generator (rrdbnet_arch.py:170-240), scale 1/2/4."""

    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32
    fused: bool = False
    quantize: bool = False  # opt-in int8 serving mode (ops/quant.py)
    # rematerialise each RRDB in backward (jax.checkpoint): the 23-block
    # trunk's concat-growth activations are the GAN trainer's largest live
    # ranges (SURVEY hard part #2); numerically identical, ~1 extra trunk
    # forward of FLOPs when training the generator. Irrelevant for the
    # frozen-feature path (stop_gradient stores nothing anyway).
    remat: bool = False

    def _tconv(self, x, feats, name):
        """Trunk conv: bf16 nn.Conv, or int8 MXU path when quantized."""
        if self.quantize:
            k, b = _ConvParams(x.shape[-1], feats,
                               kernel_init=torch_conv_default_init(),
                               name=name)()
            return int8_conv(x, k, b, out_dtype=self.dtype)
        return tconv(feats, 3, dtype=self.dtype, name=name)(x)

    def _trunk(self, x):
        # scale<4 trades spatial for channels up front (rrdbnet_arch.py:208-213)
        if self.scale == 2:
            x = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = pixel_unshuffle(x, 4)
        feat = self._tconv(x, self.num_feat, "conv_first")
        body = feat
        block_cls = nn.remat(RRDB) if self.remat else RRDB
        for i in range(self.num_block):
            body = block_cls(self.num_feat, self.num_grow_ch, self.dtype,
                             self.fused, self.quantize, name=f"body_{i}")(body)
        body = self._tconv(body, self.num_feat, "conv_body")
        feat = feat + body
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        feat = lrelu(self._tconv(upsample_nearest(feat, 2), self.num_feat,
                                 "conv_up1"))
        feat = lrelu(self._tconv(upsample_nearest(feat, 2), self.num_feat,
                                 "conv_up2"))
        return self._tconv(feat, self.num_feat, "conv_hr")

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
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        feat = tconv(self.num_feat, 3, use_bias=True, dtype=self.dtype,
                     name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            # the old generator's 0.1-scaled init is commented out in the
            # reference (SR/RRDBNet.py:75-77) -> torch's default conv init
            body = RRDB(self.num_feat, self.num_grow_ch, self.dtype,
                        self.fused, growth_init=torch_conv_default_init(),
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
