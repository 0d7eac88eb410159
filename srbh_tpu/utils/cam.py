"""Class-activation-map utilities (utils/camutils.py:4-175 capability twin).

The reference's weakly-supervised leftovers compute multi-scale, flip-
averaged CAMs from a classifier's final features and refine masks with a
dense CRF. Here:

* :func:`multi_scale_cam` — averages normalised CAMs across scales and a
  horizontal flip, for any feature+weights pair produced by a jax model.
* :func:`cam_to_label`    — background-threshold argmax labelling
  (camutils.py label carving).
* :func:`crf_refine`      — a pure-numpy mean-field refinement with a
  Gaussian pairwise kernel (pydensecrf is not available in this image; this
  keeps the API so weak-supervision experiments still run end-to-end).
"""
from __future__ import annotations

from typing import Callable, Sequence

import cv2
import numpy as np


def _normalise(cam: np.ndarray) -> np.ndarray:
    cmin = cam.min(axis=(1, 2), keepdims=True)
    cmax = cam.max(axis=(1, 2), keepdims=True)
    return (cam - cmin) / np.maximum(cmax - cmin, 1e-5)


def multi_scale_cam(cam_fn: Callable[[np.ndarray], np.ndarray],
                    image: np.ndarray,
                    scales: Sequence[float] = (1.0, 0.5, 1.5)) -> np.ndarray:
    """Average flip-symmetrised CAMs over scales.

    ``cam_fn``: (N, H, W, C) image -> (N, h, w, K) raw class maps.
    Returns (N, H, W, K) normalised CAMs at the input resolution.
    """
    n, h, w = image.shape[:3]
    total = None
    for s in scales:
        hs, ws = max(1, int(h * s)), max(1, int(w * s))
        imgs = np.stack([cv2.resize(im, (ws, hs)) for im in image])
        if imgs.ndim == 3:
            imgs = imgs[..., None]
        both = np.concatenate([imgs, imgs[:, :, ::-1]], axis=0)
        cams = np.asarray(cam_fn(both))
        cams = np.maximum(cams, 0)
        fwd, flip = cams[:n], cams[n:, :, ::-1]
        cam = fwd + flip
        cam = np.stack([cv2.resize(c, (w, h)) for c in cam])
        if cam.ndim == 3:
            cam = cam[..., None]
        total = cam if total is None else total + cam
    return _normalise(total / len(scales))


def cam_to_label(cam: np.ndarray, bkg_thre: float = 0.3,
                 ignore_index: int = 255) -> np.ndarray:
    """(N, H, W, K) CAMs -> labels with an uncertain band marked ignore."""
    score = cam.max(axis=-1)
    label = cam.argmax(axis=-1) + 1  # classes are 1-based over background
    label[score < bkg_thre] = 0
    band = (score >= bkg_thre * 0.7) & (score < bkg_thre)
    label[band] = ignore_index
    return label.astype(np.int32)


def crf_refine(prob: np.ndarray, image: np.ndarray, iters: int = 5,
               sxy: float = 3.0, compat: float = 3.0) -> np.ndarray:
    """Mean-field refinement of (H, W, K) probabilities with a Gaussian
    spatial pairwise term (utils/utils_rrm.py:6-92 capability stand-in)."""
    q = prob.copy()
    k = int(2 * round(2 * sxy) + 1)
    for _ in range(iters):
        # neighbourhood consensus message (negative-Potts compatibility):
        # each pixel's label distribution is pulled toward the Gaussian-
        # weighted average of its neighbours'
        msg = np.stack([cv2.GaussianBlur(q[..., c], (k, k), sxy)
                        for c in range(q.shape[-1])], axis=-1)
        logits = np.log(np.clip(prob, 1e-8, 1.0)) + compat * msg
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        q = e / e.sum(axis=-1, keepdims=True)
    return q
