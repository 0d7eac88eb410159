"""EfficientNet encoder with U-Net feature taps (smp-compatible).

Re-implements the capability of ``segmentation_models_pytorch``'s
EfficientNet encoder used by the reference height model
(mymodels.py:242-258 via ``get_encoder("efficientnet-b4", in_channels=8,
depth=5)``): MBConv blocks with squeeze-excite, swish, stochastic depth, and
five feature taps at reductions 1/2/4/8/16/32 with channels
(C_in, 48, 32, 56, 160, 448) for B4.

Faithful details: TF-SAME padding on stride-2 convs, BatchNorm momentum 0.99 /
eps 1e-3, SE reduction computed from the block *input* channels, expand conv
skipped when expand_ratio == 1, drop-connect on identity blocks. The r16 tap
is taken after the stride-1 160-channel stage (matching smp's stage grouping),
and the r2 tap is the stem output.

TPU notes: depthwise convs lower to VPU ops; the 1x1 expand/project convs are
the MXU hot loops. All shapes are static; stochastic-depth uses a single
bernoulli per (sample, block) — jit-friendly.
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from srbh_tpu.models.layers import TorchBatchNorm

Dtype = Any

# (expand_ratio, kernel, stride, base_channels, base_repeats) per stage (B0)
_B0_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)

# name -> (width_coefficient, depth_coefficient, dropout)
SCALING = {
    # minimal config for fast CPU tests: 7 blocks, 8-channel floor widths
    "efficientnet-test": (0.1, 0.1, 0.2),
    "efficientnet-b0": (1.0, 1.0, 0.2),
    "efficientnet-b1": (1.0, 1.1, 0.2),
    "efficientnet-b2": (1.1, 1.2, 0.3),
    "efficientnet-b3": (1.2, 1.4, 0.3),
    "efficientnet-b4": (1.4, 1.8, 0.4),
    "efficientnet-b5": (1.6, 2.2, 0.4),
    "efficientnet-b6": (1.8, 2.6, 0.5),
    "efficientnet-b7": (2.0, 3.1, 0.5),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    f = filters * width
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _bn(train, dtype, name):
    return TorchBatchNorm(use_running_average=not train, momentum=0.99,
                          epsilon=1e-3, dtype=dtype, name=name)


def _conv_same(features, kernel, stride, groups=1, name=None, dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding="SAME", use_bias=False, feature_group_count=groups,
                   dtype=dtype, name=name)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excite."""

    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        if self.expand_ratio != 1:
            h = _conv_same(in_ch * self.expand_ratio, 1, 1,
                           name="expand_conv", dtype=self.dtype)(h)
            h = _bn(train, self.dtype, "expand_bn")(h)
            h = nn.silu(h)
        mid = h.shape[-1]
        h = _conv_same(mid, self.kernel, self.stride, groups=mid,
                       name="dw_conv", dtype=self.dtype)(h)
        h = _bn(train, self.dtype, "dw_bn")(h)
        h = nn.silu(h)
        # squeeze-excite, reduction from block INPUT channels
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        h = h * nn.sigmoid(s)
        h = _conv_same(self.out_ch, 1, 1, name="project_conv", dtype=self.dtype)(h)
        h = _bn(train, self.dtype, "project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            if train and self.drop_rate > 0.0:
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jnp.floor(
                    keep + jnp.asarray(
                        nn.initializers.uniform(1.0)(rng, (x.shape[0], 1, 1, 1))
                    )
                )
                h = h / keep * mask
            h = h + x
        return h


class EfficientNetEncoder(nn.Module):
    """EfficientNet trunk returning smp-style pyramid features.

    Returns ``[x, f2, f4, f8, f16, f32]`` — six tensors at reductions
    1,2,4,8,16,32 with B4 channels (C_in, 48, 32, 56, 160, 448).
    """

    model_name: str = "efficientnet-b4"
    drop_connect_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @staticmethod
    def out_channels(model_name: str, in_channels: int) -> Tuple[int, ...]:
        width, depth, _ = SCALING[model_name]
        ch = [round_filters(c, width) for _, _, _, c, _ in _B0_STAGES]
        stem = round_filters(32, width)
        # taps: input, stem, stage2, stage3, stage5, stage7
        return (in_channels, stem, ch[1], ch[2], ch[4], ch[6])

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        width, depth, _ = SCALING[self.model_name]
        feats = [x]
        h = _conv_same(round_filters(32, width), 3, 2, name="stem_conv",
                       dtype=self.dtype)(x)
        h = _bn(train, self.dtype, "stem_bn")(h)
        h = nn.silu(h)
        feats.append(h)  # r2

        # global block index for the linearly-increasing drop-connect rate
        repeats = [round_repeats(r, depth) for _, _, _, _, r in _B0_STAGES]
        total_blocks = sum(repeats)
        block_idx = 0
        # skip taps feed the UnetDecoder after stages 2 (r4), 3 (r8),
        # 5 (r16) and 7 (r32)
        for si, (expand, kernel, stride, base_c, _) in enumerate(_B0_STAGES, 1):
            out_ch = round_filters(base_c, width)
            for bi in range(repeats[si - 1]):
                rate = self.drop_connect_rate * block_idx / total_blocks
                h = MBConv(
                    out_ch, expand, kernel, stride if bi == 0 else 1,
                    drop_rate=rate, dtype=self.dtype,
                    name=f"blocks_{si}_{bi}",
                )(h, train)
                block_idx += 1
            if si in (2, 3, 5, 7):
                feats.append(h)
        return feats
