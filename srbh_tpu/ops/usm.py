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


def filter2d_reflect(x: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Depthwise 2-D filter with reflect padding on (N, H, W, C).

    General (non-separable) ``filter2D`` twin. NOTE: a k x k depthwise
    conv is GROUPED conv work that XLA:TPU runs off the MXU — at the USM
    shapes (51 taps, 256^2 x 3 x 12) this measured 139 ms on chip, more
    than the whole RRDBNet-23 generator forward. Separable windows must
    use :func:`separable_filter_reflect` instead (USM's Gaussian is).
    """
    k = window.shape[0]
    pad = k // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    c = x.shape[-1]
    w = jnp.asarray(window, x.dtype).reshape(k, k, 1, 1)
    w = jnp.tile(w, (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@functools.lru_cache(maxsize=8)
def _band_matrix(n: int, ktuple: tuple) -> np.ndarray:
    """(n, n + k - 1) banded matrix B with B[i, i:i+k] = k1d: contracting
    the reflect-padded axis with B equals the 1-D VALID correlation."""
    k1d = np.asarray(ktuple, np.float64)
    k = len(k1d)
    B = np.zeros((n, n + k - 1), np.float64)
    for i in range(n):
        B[i, i:i + k] = k1d
    return B


def separable_filter_reflect(x: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable 2-D filter (outer(k1d, k1d)) with reflect padding, as two
    banded-matrix contractions on (N, H, W, C).

    TPU-native form of the Gaussian blur: each axis becomes a dense
    (dim, dim+k-1) matmul that runs on the MXU, instead of a k x k
    depthwise (grouped) conv on the VPU — measured 139 ms -> ~1 ms at the
    USM shapes. Same math as the full-window conv up to float summation
    order (the band rows carry exact zeros outside the window).
    """
    pad = len(k1d) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    bh = jnp.asarray(_band_matrix(x.shape[1], tuple(np.asarray(k1d))),
                     x.dtype)
    bw = jnp.asarray(_band_matrix(x.shape[2], tuple(np.asarray(k1d))),
                     x.dtype)
    t = jnp.einsum("ij,njwc->niwc", bh, xp)
    return jnp.einsum("wj,nhjc->nhwc", bw, t)


def usm_sharp(img: jnp.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: float = 10.0, sigma: float = 0.0) -> jnp.ndarray:
    """USM sharpen a [0,1] NHWC image batch (rrdbnet_arch.py:425-434)."""
    ksize = radius if radius % 2 else radius + 1
    k1d = cv2_gaussian_kernel(ksize, sigma)
    blur = separable_filter_reflect(img, k1d)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = separable_filter_reflect(mask, k1d)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img
