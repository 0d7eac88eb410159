"""Shared Flax building blocks for the model zoo (NHWC, torch-compatible).

Conventions
-----------
* ``tconv`` uses explicit torch-style padding ``k//2`` on both sides so that
  stride-2 convs place padding exactly as ``nn.Conv2d`` does — required for
  bit-parity when loading converted PyTorch checkpoints (flax 'SAME' pads
  asymmetrically for even inputs).
* BatchNorm: flax ``momentum = 1 - torch_momentum``; torch default 0.1 -> 0.9.
* Compute dtype is a module arg (bf16 on TPU); params stay float32.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from srbh_tpu.ops import s2d
from srbh_tpu.ops.shuffle import pixel_shuffle

Dtype = Any


def kaiming_normal_scaled(scale: float = 1.0):
    """He-normal (fan_in) init times ``scale`` — ESRGAN's residual-branch init
    (SR/rrdbnet_arch.py:20-48 uses kaiming_normal then *0.1)."""
    base = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


def torch_conv_default_init():
    """torch.nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def tconv(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    use_bias: bool = True,
    groups: int = 1,
    kernel_init=None,
    name: Optional[str] = None,
    dtype: Dtype = jnp.float32,
) -> nn.Conv:
    """3x3-style conv with torch padding semantics (pad = k//2 both sides)."""
    k = kernel_size
    return nn.Conv(
        features,
        (k, k),
        strides=(stride, stride),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        use_bias=use_bias,
        feature_group_count=groups,
        kernel_init=kernel_init or torch_conv_default_init(),
        name=name,
        dtype=dtype,
    )


def leaky_relu(x, negative_slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact running-statistics semantics.

    Forward values match ``nn.BatchNorm`` (normalisation uses the *biased*
    batch variance in both frameworks), but the running average differs:
    ``torch.nn.BatchNorm2d`` stores the Bessel-corrected (*unbiased*,
    factor n/(n-1)) batch variance while flax stores the biased one, so
    ``batch_stats`` saved by flax drift from a torch training run by
    (n-1)/n per update.  This module applies the correction, making
    train-mode statistics — and therefore checkpoints exported back to the
    reference's .tar layout — bit-comparable with the torch
    ``nn.BatchNorm2d`` layers used throughout the reference's models
    (e.g. SR/HRfuse.py:115-159, smp decoder blocks per mymodels.py:244-258);
    pinned by tests/test_train_step_oracle.py.

    Collection layout is identical to ``nn.BatchNorm`` (params scale/bias,
    batch_stats mean/var), so converters and existing checkpoints are
    unaffected.  Statistics are computed in float32 regardless of compute
    dtype, like flax.
    """

    use_running_average: bool
    momentum: float = 0.9  # flax convention: torch momentum 0.1 -> 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            # one-pass (fast) variance like flax: a single fused reduction
            # instead of a dependent second pass over the activation
            mean = jnp.mean(xf, axes)
            var = jnp.maximum(jnp.mean(xf * xf, axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * bessel)
        y = x - mean  # promotes to float32
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = y * mul + bias
        return jnp.asarray(y, self.dtype)


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation, the standard fused TPU pattern."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    act: Optional[Callable] = nn.relu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = tconv(
            self.features, self.kernel_size, self.stride,
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class _PackedConv(nn.Module):
    """Space-to-depth packed conv that declares its parameters with
    ``nn.Conv``'s exact names/shapes/init, so literal and packed compute
    paths share one checkpoint layout (see srbh_tpu/ops/s2d.py).

    ``kernel_size`` 3 flips the packed parity (pass ``parity``); 1 is the
    parity-preserving block-diagonal projection.
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = False
    kernel_init: Any = None
    kin_perm: Any = None  # canonical->actual input-channel gather (s2d.concat_perm)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, parity: int = 0):
        cin = xp.shape[-1] // 4
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init or torch_conv_default_init(),
            (k, k, cin if self.kin_perm is None else len(self.kin_perm) // 4,
             self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if k == 3:
            return s2d.conv3x3_packed(xp, parity, kernel, bias,
                                      dtype=self.dtype, kin_perm=self.kin_perm)
        if k == 1:
            return s2d.conv1x1_packed(xp, kernel, bias, dtype=self.dtype,
                                      kin_perm=self.kin_perm)
        raise ValueError(f"packed conv supports k in (1, 3), got {k}")


class _PackedBNEval(nn.Module):
    """Inference-mode BatchNorm on a packed tensor; mirrors ``nn.BatchNorm``'s
    parameter/collection layout (params scale/bias, batch_stats mean/var)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        c = xp.shape[-1] // 4
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.epsilon)
               ).astype(self.dtype)
        return xp.astype(self.dtype) * s2d.tile_channel_param(mul) \
            + s2d.tile_channel_param(add)


class BasicBlock(nn.Module):
    """ResNet-v1 basic block, stride-1/2, with 1x1 projection shortcut.

    Mirrors SR/HRfuse.py:115-159 (conv3x3-BN-ReLU-conv3x3-BN + identity,
    projection when stride != 1 or channels change).

    ``packed=True`` switches to the space-to-depth compute mode
    (srbh_tpu/ops/s2d.py): input/output are parity-0 packed tensors with
    4x channels and half spatial dims; parameters are identical to the
    literal path (inference only — stride must be 1, train must be False).
    """

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    packed: bool = False
    kin_perm: Any = None  # only used when packed: input is a concat of packs

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.packed:
            if train or self.stride != 1:
                raise ValueError("packed BasicBlock is inference-only, stride 1")
            return self._packed_call(x)
        needs_proj = self.stride != 1 or x.shape[-1] != self.planes
        identity = x
        out = tconv(self.planes, 3, self.stride, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        out = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = tconv(self.planes, 3, 1, use_bias=False,
                    dtype=self.dtype, name="conv2")(out)
        out = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="bn2")(out)
        if needs_proj:
            identity = tconv(self.planes, 1, self.stride, use_bias=False,
                             dtype=self.dtype, name="down_conv")(x)
            identity = TorchBatchNorm(use_running_average=not train,
                                      momentum=0.9, dtype=self.dtype,
                                      name="down_bn")(identity)
        return nn.relu(out + identity)

    def _packed_call(self, xp):
        cin = (xp.shape[-1] if self.kin_perm is None else len(self.kin_perm)) // 4
        needs_proj = cin != self.planes
        out = _PackedConv(self.planes, 3, kin_perm=self.kin_perm,
                          dtype=self.dtype, name="conv1")(xp, 0)
        out = _PackedBNEval(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _PackedConv(self.planes, 3, dtype=self.dtype, name="conv2")(out, 1)
        out = _PackedBNEval(dtype=self.dtype, name="bn2")(out)
        identity = xp
        if needs_proj:
            identity = _PackedConv(self.planes, 1, kin_perm=self.kin_perm,
                                   dtype=self.dtype, name="down_conv")(xp)
            identity = _PackedBNEval(dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(out + identity)


class PixelShuffleUpsampler(nn.Module):
    """Conv + depth-to-space ladder: x2 per octave for power-of-two scales,
    single x3 step otherwise (SR/HRfuse.py:17-44, SR/edsr.py:75-102).

    Feature count is preserved; each step is a conv to ``4*n_feats`` (or
    ``9*n_feats``) followed by pixel shuffle — MXU-heavy conv, free reshuffle.

    ``packed_output=True`` (power-of-two scales only) skips the final
    shuffle and instead emits the parity-0 space-to-depth packing of the
    full-resolution map (ops/s2d.py) via a static channel gather that XLA
    folds into the conv — zero extra data movement for packed consumers.
    """

    scale: int
    n_feats: int
    use_bias: bool = True
    packed_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if (scale & (scale - 1)) == 0:
            if scale == 1 and self.packed_output:
                # zero octaves: the identity map, delivered in the promised
                # parity-0 packed layout (a pure reshape)
                return s2d.pack(x)
            last = int(math.log2(scale)) - 1
            for i in range(int(math.log2(scale))):
                x = tconv(4 * self.n_feats, 3, use_bias=self.use_bias,
                          dtype=self.dtype, name=f"conv_{i}")(x)
                if self.packed_output and i == last:
                    return x[..., s2d.ps_to_pack_perm(self.n_feats)]
                x = pixel_shuffle(x, 2)
        elif self.packed_output:
            raise NotImplementedError("packed_output needs a power-of-2 scale")
        elif scale == 3:
            x = tconv(9 * self.n_feats, 3, use_bias=self.use_bias,
                      dtype=self.dtype, name="conv_0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise NotImplementedError(f"scale {scale}")
        return x


def param_count(params) -> int:
    """Total number of parameters in a pytree."""
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))
