"""Nearest/bilinear resize with torch/cv2-compatible index semantics.

The reference pipeline round-trips tiles through ``cv2.resize(...,
INTER_NEAREST)`` x4 and ``F.interpolate(scale_factor=0.25, mode="nearest")``
(BH_loader.py:354-369) and upsamples features with
``F.interpolate(scale_factor=2, mode='nearest')`` inside RRDBNet
(SR/rrdbnet_arch.py:219-220). Torch's nearest maps output index ``o`` to input
``floor(o * in / out)`` — NOT what ``jax.image.resize('nearest')`` computes
(it rounds from pixel centres), so we gather explicitly. For integer scale
factors this is also bit-identical to cv2 INTER_NEAREST.
"""
from __future__ import annotations

import jax.numpy as jnp


def _nearest_indices(out_size: int, in_size: int) -> jnp.ndarray:
    return (jnp.arange(out_size) * in_size) // out_size


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest resize of (..., H, W, C) to (..., out_h, out_w, C)."""
    h, w = x.shape[-3], x.shape[-2]
    rows = _nearest_indices(out_h, h)
    cols = _nearest_indices(out_w, w)
    x = jnp.take(x, rows, axis=-3)
    x = jnp.take(x, cols, axis=-2)
    return x


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Integer-factor nearest upsample of (..., H, W, C) — pure repeat.

    ``jnp.repeat`` on the spatial axes compiles to a broadcast+reshape, which
    XLA fuses with the consuming conv; no gather needed.
    """
    x = jnp.repeat(x, scale, axis=-3)
    x = jnp.repeat(x, scale, axis=-2)
    return x


def downsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Integer-factor nearest downsample: strided slice picking index i*scale.

    Matches ``F.interpolate(scale_factor=1/scale, mode="nearest")``:
    ``floor(o * scale) = o * scale``.
    """
    return x[..., ::scale, ::scale, :]
