"""Joint image/mask augmentation matching the reference's albumentations
pipeline (BH_loader.py:17-28):

* ``Flip(p=0.5)``              — horizontal, vertical, or both (d in -1/0/1),
* ``RandomGridShuffle(2,2,p=0.5)`` — permute the four quadrants,
* ``Rotate(p=0.5)``            — uniform angle in [-90, 90], reflect-101
  border, bilinear for the image / nearest for the mask,
* strong variant ``ColorJitter`` (brightness/contrast/saturation 0.5,
  hue 0.25, p=0.8) for the unsupervised branch.

Runs host-side (numpy + cv2) inside the input pipeline at the x4 (256 px)
resolution, exactly where the reference applies it (BH_loader.py:356-359).
"""
from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def _warp(img: np.ndarray, mat: np.ndarray, interp: int) -> np.ndarray:
    """cv2.warpAffine for arbitrary channel counts (cv2 caps at 4)."""
    h, w = img.shape[:2]
    if img.ndim == 2 or img.shape[2] <= 4:
        return cv2.warpAffine(img, mat, (w, h), flags=interp,
                              borderMode=cv2.BORDER_REFLECT_101)
    chunks = [cv2.warpAffine(img[..., i: i + 4], mat, (w, h), flags=interp,
                             borderMode=cv2.BORDER_REFLECT_101)
              for i in range(0, img.shape[2], 4)]
    chunks = [c[..., None] if c.ndim == 2 else c for c in chunks]
    return np.concatenate(chunks, axis=-1)


def random_flip(rng: np.random.Generator, img, mask):
    d = int(rng.integers(-1, 2))  # -1 both, 0 vertical, 1 horizontal
    return cv2.flip(img, d), cv2.flip(mask, d)


def grid_shuffle_2x2(rng: np.random.Generator, img, mask):
    order = rng.permutation(4)
    return _grid_shuffle_apply(img, order), _grid_shuffle_apply(mask, order)


def random_rotate(rng: np.random.Generator, img, mask, limit: float = 90.0):
    angle = float(rng.uniform(-limit, limit))
    h, w = img.shape[:2]
    mat = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
    return (_warp(img, mat, cv2.INTER_LINEAR),
            _warp(mask, mat, cv2.INTER_NEAREST))


def augment_pair(rng: np.random.Generator, img: np.ndarray, mask: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """The training pipeline: each transform fires with p=0.5."""
    if rng.random() < 0.5:
        img, mask = random_flip(rng, img, mask)
    if rng.random() < 0.5:
        img, mask = grid_shuffle_2x2(rng, img, mask)
    if rng.random() < 0.5:
        img, mask = random_rotate(rng, img, mask)
    return img, mask


def _grid_shuffle_apply(arr: np.ndarray, order: np.ndarray) -> np.ndarray:
    h, w = arr.shape[:2]
    hh, hw = h // 2, w // 2
    cells = [(0, 0), (0, hw), (hh, 0), (hh, hw)]
    # copy first: odd H/W leave a last row/col outside the 2x2 cells, which
    # must carry the input values, not uninitialised memory
    out = arr.copy()
    for dst, src in enumerate(order):
        dy, dx = cells[dst]
        sy, sx = cells[src]
        out[dy: dy + hh, dx: dx + hw] = arr[sy: sy + hh, sx: sx + hw]
    return out


def augment_pair_lowres(rng: np.random.Generator, img_lr: np.ndarray,
                        mask: np.ndarray, scale: int = 4
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """``augment_pair`` fused with the x4-nearest-up / x0.25-down image dance
    of the dataset recipe (BH_loader.py:354-365), bit-identical but without
    materialising the upsampled image unless the rotation branch fires.

    Given the low-res image ``img_lr`` (H, W, C) and the hi-res ``mask``
    (``scale``·H, ``scale``·W), returns exactly
    ``augment_pair(rng, up4(img_lr), mask)`` with the image subsampled back by
    ``[::scale, ::scale]``:

    * flip and 2x2 grid shuffle are 4x4-block-aligned pixel permutations of
      the block-replicated image, so they commute exactly with nearest
      up/down sampling and run on the low-res image directly;
    * rotation interpolates (bilinear) across block boundaries, so only that
      branch replicates to hi-res (``np.repeat`` == cv2 INTER_NEAREST x4),
      warps with the identical affine call, and subsamples.

    The RNG draw order/types match ``augment_pair`` exactly, so a given
    generator state yields the same augmentation in both paths.
    """
    if rng.random() < 0.5:
        d = int(rng.integers(-1, 2))
        img_lr, mask = cv2.flip(img_lr, d), cv2.flip(mask, d)
    if rng.random() < 0.5:
        order = rng.permutation(4)
        img_lr = _grid_shuffle_apply(img_lr, order)
        mask = _grid_shuffle_apply(mask, order)
    if rng.random() < 0.5:
        angle = float(rng.uniform(-90.0, 90.0))
        h, w = mask.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        img = np.repeat(np.repeat(img_lr, scale, axis=0), scale, axis=1)
        img_lr = _warp(img, mat, cv2.INTER_LINEAR)[::scale, ::scale]
        mask = _warp(mask, mat, cv2.INTER_NEAREST)
    return img_lr, mask


def augment_lrhr_pair(rng: np.random.Generator, lr: np.ndarray,
                      hr: np.ndarray, scale: int = 4
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Joint SR-pair augmentation (BH_loader.py:713-716, 729-736): Flip +
    RandomGridShuffle(2,2) + Rotate, each p=0.5, applied by the reference to
    the x4-nearest-upsampled LR concatenated with the HR target.

    Unlike :func:`augment_pair_lowres`'s image/mask split, BOTH halves are
    part of the albumentations *image* here, so the rotation interpolates
    both with INTER_LINEAR. The LR half uses the same fused low-res trick:
    flips and 2x2 shuffles are block-aligned (exact at LR resolution), and
    only the rotation branch replicates to hi-res, warps with the identical
    affine call, and nearest-subsamples back (== the reference's
    F.interpolate(scale_factor=0.25, mode='nearest') at BH_loader.py:745).
    """
    if rng.random() < 0.5:
        d = int(rng.integers(-1, 2))
        lr, hr = cv2.flip(lr, d), cv2.flip(hr, d)
    if rng.random() < 0.5:
        order = rng.permutation(4)
        lr = _grid_shuffle_apply(lr, order)
        hr = _grid_shuffle_apply(hr, order)
    if rng.random() < 0.5:
        angle = float(rng.uniform(-90.0, 90.0))
        h, w = hr.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        up = np.repeat(np.repeat(lr, scale, axis=0), scale, axis=1)
        lr = _warp(up, mat, cv2.INTER_LINEAR)[::scale, ::scale]
        hr = _warp(hr, mat, cv2.INTER_LINEAR)
    return lr, hr


_LUMA = np.asarray([0.2989, 0.587, 0.114], np.float32)  # ITU-R 601


def color_jitter(rng: np.random.Generator, img01: np.ndarray,
                 brightness=0.5, contrast=0.5, saturation=0.5, hue=0.25,
                 p=0.8) -> np.ndarray:
    """Strong augmentation on a [0,1] RGB image (BH_loader.py:24-28).

    torchvision/albumentations ColorJitter semantics: factors drawn from
    [max(0, 1-x), 1+x] (hue from [-hue, hue]), the four adjustments applied
    in a RANDOM order, contrast blending against the scalar mean of the
    ITU-R 601 grayscale image, saturation blending against the per-pixel
    grayscale, each result clamped to [0, 1]."""
    if rng.random() >= p:
        return img01
    b = float(rng.uniform(max(0.0, 1.0 - brightness), 1.0 + brightness))
    c = float(rng.uniform(max(0.0, 1.0 - contrast), 1.0 + contrast))
    s = float(rng.uniform(max(0.0, 1.0 - saturation), 1.0 + saturation))
    hshift = float(rng.uniform(-hue, hue))
    out = img01.astype(np.float32).copy()
    for op in rng.permutation(4):
        if op == 0:
            out = np.clip(out * b, 0.0, 1.0)
        elif op == 1:
            mean = float((out @ _LUMA).mean())
            out = np.clip(c * out + (1.0 - c) * mean, 0.0, 1.0)
        elif op == 2:
            gray = (out @ _LUMA)[..., None]
            out = np.clip(s * out + (1.0 - s) * gray, 0.0, 1.0)
        else:
            hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)
            hsv[..., 0] = (hsv[..., 0] + hshift * 360.0) % 360.0
            out = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0.0, 1.0)
    return out
