"""Device-side (JAX) SSIM / PSNR building blocks.

Math follows the reference's MATLAB-equivalent SSIM (SR/psnr_ssim.py:321-382):
11-tap Gaussian window (sigma 1.5), VALID convolution, C1=(0.01*255)^2,
C2=(0.03*255)^2 on the [0, 255] scale. The reference computes in float64 on
CPU/GPU; on TPU we compute in float32 on-device (the windowed sums are small
enough that f32 matches f64 to ~1e-6 relative — verified in tests) and leave
float64 finalisation to the host-side twins in ``srbh_tpu.metrics.image``.

The Gaussian filtering is a depthwise conv (`feature_group_count=C`), which
XLA maps to the VPU as two separable passes — no Pallas needed; the op is
bandwidth-bound and already fuses with the elementwise SSIM map.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

_C1 = (0.01 * 255.0) ** 2
_C2 = (0.03 * 255.0) ** 2


def gaussian_kernel_1d(ksize: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel-compatible normalised 1-D Gaussian."""
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


@functools.lru_cache(maxsize=8)
def _window(ksize: int, sigma: float) -> np.ndarray:
    k = gaussian_kernel_1d(ksize, sigma)
    return np.outer(k, k)


def _filter_valid(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID conv of (N, H, W, C) with a (k, k) window."""
    c = x.shape[-1]
    k = window.shape[0]
    w = jnp.asarray(window, x.dtype).reshape(k, k, 1, 1)
    w = jnp.tile(w, (1, 1, 1, c))  # HWIO with I=1 (depthwise)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim_map(
    img: jnp.ndarray, img2: jnp.ndarray, ksize: int = 11, sigma: float = 1.5
) -> jnp.ndarray:
    """Per-pixel SSIM map of two (N, H, W, C) images on the [0, 255] scale."""
    window = _window(ksize, sigma)
    mu1 = _filter_valid(img, window)
    mu2 = _filter_valid(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter_valid(img * img, window) - mu1_sq
    sigma2_sq = _filter_valid(img2 * img2, window) - mu2_sq
    sigma12 = _filter_valid(img * img2, window) - mu1_mu2
    cs = (2 * sigma12 + _C2) / (sigma1_sq + sigma2_sq + _C2)
    return ((2 * mu1_mu2 + _C1) / (mu1_sq + mu2_sq + _C1)) * cs


def ssim(img: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM per batch element; inputs (N, H, W, C) in [0, 255]."""
    return ssim_map(img, img2).mean(axis=(1, 2, 3))


def psnr(
    img: jnp.ndarray, img2: jnp.ndarray, max_val: float = 255.0
) -> jnp.ndarray:
    """Per-batch-element PSNR; matches SR/psnr_ssim.py:208-232 (+1e-8 guard)."""
    mse = jnp.mean((img - img2) ** 2, axis=tuple(range(1, img.ndim)))
    return 10.0 * jnp.log10(max_val * max_val / (mse + 1e-8))


def rgb_to_y(img01: jnp.ndarray) -> jnp.ndarray:
    """BT.601 Y channel of an (N, H, W, 3) RGB image in [0, 1], output [0, 1].

    Matches rgb2ycbcr_pt(..., y_only=True) (SR/psnr_ssim.py:123-144).
    """
    w = jnp.asarray([65.481, 128.553, 24.966], img01.dtype)
    y = img01 @ w + 16.0
    return (y / 255.0)[..., None]
