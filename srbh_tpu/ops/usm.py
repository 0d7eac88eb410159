"""Unsharp-mask sharpening (USM) for GAN ground truths.

Twin of ``USMSharp`` / ``filter2D`` (SR/rrdbnet_arch.py:387-434): a 51-tap
Gaussian blur (cv2.getGaussianKernel(51, 0) sigma rule), residual
thresholding at 10/255, soft mask blending. Runs on device as a depthwise
conv with REFLECT padding; entirely jit-able so it fuses into the GAN
training step (``gt_usm = usm(gt)``, rrdbnet_arch.py:524-529).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def cv2_gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel: sigma<=0 uses 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


@functools.lru_cache(maxsize=4)
def _usm_window(radius: int, sigma: float) -> np.ndarray:
    if radius % 2 == 0:
        radius += 1
    k = cv2_gaussian_kernel(radius, sigma)
    return np.outer(k, k)


def filter2d_reflect(x: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Depthwise 2-D filter with reflect padding on (N, H, W, C)."""
    k = window.shape[0]
    pad = k // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    c = x.shape[-1]
    w = jnp.asarray(window, x.dtype).reshape(k, k, 1, 1)
    w = jnp.tile(w, (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def usm_sharp(img: jnp.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: float = 10.0, sigma: float = 0.0) -> jnp.ndarray:
    """USM sharpen a [0,1] NHWC image batch (rrdbnet_arch.py:425-434)."""
    window = _usm_window(radius if radius % 2 else radius + 1, sigma)
    blur = filter2d_reflect(img, window)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d_reflect(mask, window)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img
