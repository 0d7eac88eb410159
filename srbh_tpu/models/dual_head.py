"""Both HRFuseResidual heads computed together with grouped convolutions.

The flagship model runs two topology-identical fusion heads (height
regression and build segmentation, SR/HRfuse.py:173-190) over the same
decoder/HR-feature resolutions with different weights.  Measured on chip
(tools/conv_microbench.py): a 16-channel 256^2 conv runs MXU-lane-bound at
~16.6 TF/s, while a 2-group 16+16 conv runs at the full 32-channel rate
(~37.5 TF/s) — so executing the two heads as ONE stream of
``feature_group_count=2`` convs doubles the lane fill of the dominant
non-trunk cost.

**Measured NEGATIVE end-to-end** (tools/profile_flagship.py, b256): the
grouped stream takes 73.9 ms vs 58.1 ms for the two literal heads.  XLA's
scheduler already overlaps the two *independent* literal head chains
(effective ~29 TF/s vs the 16.6 lane-bound floor); grouping serialises
everything onto one dependency chain and adds per-octave concat relayouts,
which costs more than the extra lane fill earns.  Same lesson as the
space-to-depth mode (ops/s2d.py): on this XLA stack, inter-op ILP beats
manual channel packing for this model.  Kept as a tested, documented
experiment so the approach is not blindly re-tried.

This is a *pure function over the literal checkpoint pytree* — it reads
``params['reg']/params['seg']`` (+ batch stats) exactly as trained/converted
and needs no parameter re-declaration; outputs equal the two
``model.apply`` head calls to float epsilon (tests/test_dual_head.py).
Inference only (BN uses running stats).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from srbh_tpu.ops.shuffle import pixel_shuffle


def _conv(x, w, groups=1, bias=None, dtype=None):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1),
        ((w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _stack_kernels(pa, pb, name):
    """Two (kh, kw, ci, co) kernels -> one 2-group kernel (kh, kw, ci, 2co)."""
    return jnp.concatenate([pa[name]["kernel"], pb[name]["kernel"]], axis=-1)


def _bn_eval_grouped(x, pa, sa, pb, sb, name, eps=1e-5):
    """Inference BatchNorm over a 2-group stream: per-head affine, stacked."""
    scale = jnp.concatenate([pa[name]["scale"], pb[name]["scale"]])
    bias = jnp.concatenate([pa[name]["bias"], pb[name]["bias"]])
    mean = jnp.concatenate([sa[name]["mean"], sb[name]["mean"]])
    var = jnp.concatenate([sa[name]["var"], sb[name]["var"]])
    mul = (scale * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    add = (bias - mean * scale * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return x * mul + add


def _basicblock_grouped(x, pa, sa, pb, sb, name):
    """Two same-shape BasicBlocks (layers.py) as one 2-group stream."""
    ba, sta = pa[name], sa[name]
    bb, stb = pb[name], sb[name]
    cin_half = x.shape[-1] // 2
    planes = ba["conv1"]["kernel"].shape[-1]
    out = _conv(x, _stack_kernels(ba, bb, "conv1"), groups=2)
    out = _bn_eval_grouped(out, ba, sta, bb, stb, "bn1")
    out = jax.nn.relu(out)
    out = _conv(out, _stack_kernels(ba, bb, "conv2"), groups=2)
    out = _bn_eval_grouped(out, ba, sta, bb, stb, "bn2")
    identity = x
    if cin_half != planes:
        identity = _conv(x, _stack_kernels(ba, bb, "down_conv"), groups=2)
        identity = _bn_eval_grouped(identity, ba, sta, bb, stb, "down_bn")
    return jax.nn.relu(out + identity)


def dual_head_apply(
    params: Any,
    batch_stats: Any,
    height_fea: jnp.ndarray,
    build_fea: jnp.ndarray,
    hr: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute reg+seg heads (HRFuseResidual pair) as one grouped stream.

    ``height_fea``/``build_fea``: (N, H, W, C) decoder outputs;
    ``hr``: (N, 4H, 4W, C) HRFeature output.  Returns (height, build).
    """
    pa, pb = params["reg"], params["seg"]
    sa, sb = batch_stats["reg"], batch_stats["seg"]

    # upsampler: two conv+pixel-shuffle octaves, grouped.  pixel_shuffle of
    # a contiguous 2-head stack == stack of per-head shuffles (channel index
    # c*4+ij stays within its head's contiguous range).
    x = jnp.concatenate([height_fea, build_fea], axis=-1)
    for i in (0, 1):
        ua, ub = pa["upsampler"], pb["upsampler"]
        k = _stack_kernels(ua, ub, f"conv_{i}")
        bias = jnp.concatenate([ua[f"conv_{i}"]["bias"], ub[f"conv_{i}"]["bias"]])
        x = _conv(x, k, groups=2, bias=bias)
        half = x.shape[-1] // 2
        x = jnp.concatenate(
            [pixel_shuffle(x[..., :half], 2), pixel_shuffle(x[..., half:], 2)],
            axis=-1)

    # fuse0 consumes concat([lr_head, hr]) per head: split its kernels into
    # the lr rows (grouped over the 2-head stream) and the hr rows (the two
    # heads' hr contributions = ONE dense conv) — avoids duplicating hr.
    lr_c = x.shape[-1] // 2
    f0a, f0b = pa["fuse0"], pb["fuse0"]
    s0a, s0b = sa["fuse0"], sb["fuse0"]
    k1a, k1b = f0a["conv1"]["kernel"], f0b["conv1"]["kernel"]
    k_lr = jnp.concatenate([k1a[:, :, :lr_c], k1b[:, :, :lr_c]], axis=-1)
    k_hr = jnp.concatenate([k1a[:, :, lr_c:], k1b[:, :, lr_c:]], axis=-1)
    out = _conv(x, k_lr, groups=2) + _conv(hr, k_hr)
    out = _bn_eval_grouped(out, f0a, s0a, f0b, s0b, "bn1")
    out = jax.nn.relu(out)
    out = _conv(out, _stack_kernels(f0a, f0b, "conv2"), groups=2)
    out = _bn_eval_grouped(out, f0a, s0a, f0b, s0b, "bn2")
    d1a, d1b = f0a["down_conv"]["kernel"], f0b["down_conv"]["kernel"]
    idn = (_conv(x, jnp.concatenate([d1a[:, :, :lr_c], d1b[:, :, :lr_c]], -1),
                 groups=2)
           + _conv(hr, jnp.concatenate([d1a[:, :, lr_c:], d1b[:, :, lr_c:]], -1)))
    idn = _bn_eval_grouped(idn, f0a, s0a, f0b, s0b, "down_bn")
    x = jax.nn.relu(out + idn)

    x = _basicblock_grouped(x, pa, sa, pb, sb, "fuse1")
    x = _basicblock_grouped(x, pa, sa, pb, sb, "fuse2")

    half = x.shape[-1] // 2
    height = _conv(x[..., :half], pa["conv_last"]["kernel"],
                   bias=pa["conv_last"]["bias"])
    build = _conv(x[..., half:], pb["conv_last"]["kernel"],
                  bias=pb["conv_last"]["bias"])
    return height, build
