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
import jax.numpy as jnp

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
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock(nn.Module):
    """ResNet-v1 basic block, stride-1/2, with 1x1 projection shortcut.

    Mirrors SR/HRfuse.py:115-159 (conv3x3-BN-ReLU-conv3x3-BN + identity,
    projection when stride != 1 or channels change).
    """

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_proj = self.stride != 1 or x.shape[-1] != self.planes
        identity = x
        out = tconv(self.planes, 3, self.stride, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = tconv(self.planes, 3, 1, use_bias=False,
                    dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=self.dtype, name="bn2")(out)
        if needs_proj:
            identity = tconv(self.planes, 1, self.stride, use_bias=False,
                             dtype=self.dtype, name="down_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(out + identity)


class PixelShuffleUpsampler(nn.Module):
    """Conv + depth-to-space ladder: x2 per octave for power-of-two scales,
    single x3 step otherwise (SR/HRfuse.py:17-44, SR/edsr.py:75-102).

    Feature count is preserved; each step is a conv to ``4*n_feats`` (or
    ``9*n_feats``) followed by pixel shuffle — MXU-heavy conv, free reshuffle.
    """

    scale: int
    n_feats: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if (scale & (scale - 1)) == 0:
            for i in range(int(math.log2(scale))):
                x = tconv(4 * self.n_feats, 3, use_bias=self.use_bias,
                          dtype=self.dtype, name=f"conv_{i}")(x)
                x = pixel_shuffle(x, 2)
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
