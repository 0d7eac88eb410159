"""Depth-to-space / space-to-depth (pixel shuffle) ops, NHWC.

TPU-native equivalents of ``torch.nn.PixelShuffle`` and the ESRGAN
``pixel_unshuffle`` helper (reference: SR/rrdbnet_arch.py:94-110,
SR/HRfuse.py:24, SR/espcn.py:16). Pure reshape+transpose, which XLA lowers to
a layout change fused with neighbouring convs — no custom kernel needed.

Channel ordering matches torch semantics so converted checkpoints are
bit-compatible: for ``pixel_shuffle``,
``out[n, h*r + i, w*r + j, c] = x[n, h, w, c*r*r + i*r + j]``.
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Rearrange (N, H, W, C*r^2) -> (N, H*r, W*r, C).

    Equivalent to ``torch.nn.PixelShuffle(scale)`` on the NCHW transpose.
    """
    n, h, w, c = x.shape
    r = scale
    if c % (r * r) != 0:
        raise ValueError(f"channels {c} not divisible by scale^2 {r * r}")
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    # (n, h, i, w, j, c_out) then merge (h,i) and (w,j)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c_out)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Rearrange (N, H*r, W*r, C) -> (N, H, W, C*r^2).

    Matches ESRGAN's ``pixel_unshuffle`` (SR/rrdbnet_arch.py:94-110): the
    output channel index is ``c*r*r + i*r + j`` where (i, j) is the intra-block
    offset. Exact inverse of :func:`pixel_shuffle`.
    """
    n, hh, ww, c = x.shape
    r = scale
    if hh % r != 0 or ww % r != 0:
        raise ValueError(f"spatial dims ({hh},{ww}) not divisible by {r}")
    h, w = hh // r, ww // r
    x = x.reshape(n, h, r, w, r, c)
    # -> (n, h, w, c, i, j)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h, w, c * r * r)
