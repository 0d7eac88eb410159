"""SSIM / MS-SSIM losses (losses_pytorch/fastssim.py twin).

``ssim_loss`` = 1 - SSIM (fastssim.py:248-288); ``ms_ssim`` multi-scale with
default weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333) and 2x avg-pool
between scales (fastssim.py:155-200, 291-331). Built on the device SSIM ops
(``srbh_tpu.ops.ssim``); data_range rescales inputs onto the [0, 255]
constant scale those ops use.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from jax import lax

from srbh_tpu.ops.ssim import _filter_valid, _window

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _ssim_maps(x, y, data_range: float, win_size: int = 11,
               win_sigma: float = 1.5, k=(0.01, 0.03)):
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    window = _window(win_size, win_sigma)
    mu1, mu2 = _filter_valid(x, window), _filter_valid(y, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter_valid(x * x, window) - mu1_sq
    s2 = _filter_valid(y * y, window) - mu2_sq
    s12 = _filter_valid(x * y, window) - mu1_mu2
    cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map, cs_map


def _ssim_and_cs(x, y, data_range: float, win_size: int = 11,
                 win_sigma: float = 1.5, k=(0.01, 0.03)):
    ssim_map, cs_map = _ssim_maps(x, y, data_range, win_size, win_sigma, k)
    return ssim_map.mean(axis=(1, 2, 3)), cs_map.mean(axis=(1, 2, 3))


def ssim(x, y, data_range: float = 255.0, nonnegative: bool = False,
         win_size: int = 11, win_sigma: float = 1.5):
    """Per-image SSIM of NHWC batches."""
    s, _ = _ssim_and_cs(x, y, data_range, win_size, win_sigma)
    if nonnegative:
        s = jnp.maximum(s, 0.0)
    return s


def ssim_loss(x, y, data_range: float = 255.0, nonnegative: bool = False):
    """1 - mean SSIM (fastssim.py:248-288)."""
    return 1.0 - ssim(x, y, data_range, nonnegative).mean()


def _filter_same(x, window):
    """Depthwise conv with torch ``F.conv2d(padding=k//2)`` semantics
    (ZERO padding) — the border rule of losses_pytorch/ssim_loss.py."""
    c = x.shape[-1]
    k = window.shape[0]
    w = jnp.tile(jnp.asarray(window, x.dtype).reshape(k, k, 1, 1),
                 (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _ssim_map_same(x, y, data_range: float = 1.0, win_size: int = 11,
                   win_sigma: float = 1.5, k=(0.01, 0.03)):
    """SSIM map with the ssim_loss.py border/constant conventions: zero-pad
    SAME filtering and C1/C2 on the given scale (the reference hardcodes
    the [0,1] constants, ssim_loss.py:79-80)."""
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    window = _window(win_size, win_sigma)
    mu1, mu2 = _filter_same(x, window), _filter_same(y, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter_same(x * x, window) - mu1_sq
    s2 = _filter_same(y * y, window) - mu2_sq
    s12 = _filter_same(x * y, window) - mu1_mu2
    return ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))


def ssim_same(x, y, data_range: float = 1.0, win_size: int = 11,
              win_sigma: float = 1.5):
    """Mean SSIM with ssim_loss.py's SSIM conventions (SAME zero-padding,
    [0,1]-scale constants) — the variant myloss.py's composites consume."""
    return _ssim_map_same(x, y, data_range, win_size, win_sigma).mean()


def log_ssim_loss(x, y, data_range: float = 1.0, win_size: int = 11,
                  win_sigma: float = 1.5):
    """LOGSSIM (losses_pytorch/ssim_loss.py:68-117): SAME-padded SSIM map
    with [0,1]-scale constants, min-max-normalised over the whole batch,
    then mean ``-log(map + 1e-8)`` — penalises the worst-structured
    regions far harder than ``1 - SSIM``."""
    smap = _ssim_map_same(x, y, data_range, win_size, win_sigma)
    smap = (smap - smap.min()) / (smap.max() - smap.min())
    return jnp.mean(-jnp.log(smap + 1e-8))


def _avg_pool2(x):
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID") / 4.0


def ms_ssim(x, y, data_range: float = 255.0,
            weights: Optional[Sequence[float]] = None,
            win_size: int = 11, win_sigma: float = 1.5):
    """Multi-scale SSIM (fastssim.py:155-200)."""
    weights = jnp.asarray(weights if weights is not None else MS_SSIM_WEIGHTS)
    levels = weights.shape[0]
    mcs = []
    for i in range(levels):
        s, cs = _ssim_and_cs(x, y, data_range, win_size, win_sigma)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            x, y = _avg_pool2(x), _avg_pool2(y)
    mcs_and_ssim = jnp.stack(mcs + [jnp.maximum(s, 0.0)])  # (levels, N)
    return jnp.prod(mcs_and_ssim ** weights[:, None], axis=0)


def ms_ssim_loss(x, y, data_range: float = 255.0):
    """1 - mean MS-SSIM (fastssim.py:291-331)."""
    return 1.0 - ms_ssim(x, y, data_range).mean()
