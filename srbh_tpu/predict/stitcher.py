"""Overlap-blend stitching of tiled predictions into a city mosaic.

Twin of the canvas accumulation in predict_realesanet_feature_globe.py:156-209:
height predictions (clamped, x10 decimetre uint16) and per-class build
softmax (x255 uint16) are summed into full-resolution canvases together with
an overlap counter; the mosaic divides by the counter at the end and the
build canvas argmaxes to a class map.

This host-side accumulator uses int64 (no uint16 overflow mid-sum) and
reproduces the reference's final ``round(sum/weight) -> uint16`` semantics.
City canvases reach tens of GB at 2.5 m, which exceeds single-chip HBM, so
the mosaic lives on host; the per-batch model + post-processing runs
entirely on device.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


class MosaicAccumulator:
    def __init__(self, width: int, height: int, n_classes: int, upscale: int = 4):
        self.upscale = upscale
        self.w = width * upscale
        self.h = height * upscale
        self.height_sum = np.zeros((self.h, self.w), np.int64)
        self.build_sum = np.zeros((n_classes, self.h, self.w), np.int64)
        self.weight = np.zeros((self.h, self.w), np.uint16)

    def add_batch(self, height_u16: np.ndarray, build_u16: np.ndarray,
                  pos: np.ndarray):
        """height (N, T, T) uint16; build (N, T, T, C) uint16;
        pos (N, 4) [xoff, yoff, xcount, ycount] in source pixels."""
        from srbh_tpu import native

        if build_u16.dtype == np.uint8:  # compact transfer staging
            build_u16 = build_u16.astype(np.uint16)
        if (height_u16.dtype == np.uint16 and build_u16.dtype == np.uint16
                and native.blend_tiles(
                    self.height_sum, self.build_sum, self.weight,
                    np.ascontiguousarray(height_u16),
                    np.ascontiguousarray(build_u16),
                    np.ascontiguousarray(pos, np.int32), self.upscale)):
            return
        s = self.upscale
        for i in range(height_u16.shape[0]):
            xoff, yoff, xc, yc = (int(v) * s for v in pos[i])
            self.height_sum[yoff: yoff + yc, xoff: xoff + xc] += \
                height_u16[i, :yc, :xc].astype(np.int64)
            self.build_sum[:, yoff: yoff + yc, xoff: xoff + xc] += \
                build_u16[i, :yc, :xc].transpose(2, 0, 1).astype(np.int64)
            self.weight[yoff: yoff + yc, xoff: xoff + xc] += 1

    def finalize(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(height uint16 decimetres, build class uint8, weight uint16)."""
        build_cls = np.argmax(self.build_sum, axis=0).astype(np.uint8)
        mask = self.weight > 0
        height = np.zeros((self.h, self.w), np.uint16)
        height[mask] = np.round(
            self.height_sum[mask] / self.weight[mask]).astype(np.uint16)
        return height, build_cls, self.weight.copy()
