"""Device-side training augmentation + target building (in-jit).

The host input pipeline runs ~225 tiles/s per worker core with cv2's
rotation at 48% of the per-tile cost (tools/loader_bench.py), while the
fused train step consumes ~400 tiles/s — on hosts with few free cores the
composed pipeline is host-bound. This module moves the reference's
albumentations augmentation (BH_loader.py:17-22: Flip p=0.5,
RandomGridShuffle(2,2) p=0.5, Rotate(limit 90) p=0.5) AND the downstream
hierarchy-mask / pixel-weight / aggregation target building
(BH_loader.py:373-392) inside the jitted train step, so the host only
decodes + normalises tiles.

Semantics vs the host path (data/augment.py):

* flip and 2x2 grid shuffle are bit-exact pixel permutations;
* target building (LUT classes, class weights, valid-pixel block
  aggregation) is bit-exact given the same height map;
* rotation is distribution-equivalent, not bit-equal: same angle law
  (uniform [-90, 90]), same geometry (cv2.getRotationMatrix2D about
  (w/2-0.5, h/2-0.5), BORDER_REFLECT_101, bilinear image / nearest mask,
  applied on the x4 grid with nearest up/x0.25-down — augment.py's fused
  low-res trick), but float32 arithmetic instead of cv2's 5-bit
  fixed-point bilinear (documented ~1.8%-of-range per-pixel bound), and
  draws come from ``jax.random`` instead of ``np.random``.

Everything is static-shaped and branch-free (both branches of every p=0.5
coin are computed and selected), so the whole augmentation fuses into the
train step's input processing with no host round-trip.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from srbh_tpu.ops.aggregate import aggregate


def _reflect101(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 index folding (gfedcb|abcdefgh|gfedcba)."""
    if n == 1:
        return jnp.zeros_like(idx)
    m = 2 * (n - 1)
    idx = jnp.abs(idx) % m
    return jnp.minimum(idx, m - idx)


def flip(arr: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """cv2.flip codes on an (H, W, ...) array: 0 = vertical (reverse rows),
    1 = horizontal (reverse cols), -1 = both. ``d`` is a traced scalar."""
    return jax.lax.switch(
        d + 1,
        [lambda a: a[::-1, ::-1], lambda a: a[::-1, :], lambda a: a[:, ::-1]],
        arr)


def grid_shuffle_2x2(arr: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """albumentations RandomGridShuffle(2,2): destination quadrant ``dst``
    (row-major) takes source quadrant ``order[dst]`` (augment.py:65-76)."""
    h, w = arr.shape[0], arr.shape[1]
    hh, hw = h // 2, w // 2
    quads = jnp.stack([arr[:hh, :hw], arr[:hh, hw:],
                       arr[hh:, :hw], arr[hh:, hw:]])
    src = quads[order]
    return jnp.concatenate(
        [jnp.concatenate([src[0], src[1]], axis=1),
         jnp.concatenate([src[2], src[3]], axis=1)], axis=0)


def _src_coords(angle_deg, h, w, ys, xs):
    """Source coordinates for a cv2.warpAffine(getRotationMatrix2D(c, a, 1))
    at destination pixels (ys, xs): warpAffine inverts the forward map, and
    the inverse of a pure rotation about c is the transposed rotation."""
    cy, cx = h / 2.0 - 0.5, w / 2.0 - 0.5
    t = angle_deg * (math.pi / 180.0)
    a, b = jnp.cos(t), jnp.sin(t)
    dx, dy = xs - cx, ys - cy
    return cy + b * dx + a * dy, cx + a * dx - b * dy  # (sy, sx)


def rotate_mask_nearest(mask: jnp.ndarray, angle_deg) -> jnp.ndarray:
    """INTER_NEAREST + BORDER_REFLECT_101 rotation of an (H, W) mask.

    The gather runs as a flattened 1-D ``take`` — XLA:TPU lowers that far
    better than 2-D advanced indexing (measured on the train step)."""
    h, w = mask.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    sy, sx = _src_coords(angle_deg, h, w, ys, xs)
    yi = _reflect101(jnp.round(sy).astype(jnp.int32), h)
    xi = _reflect101(jnp.round(sx).astype(jnp.int32), w)
    return jnp.take(mask.reshape(-1), (yi * w + xi).reshape(-1),
                    mode="clip").reshape(h, w)


def rotate_image_lowres(img_lr: jnp.ndarray, angle_deg,
                        scale: int = 4) -> jnp.ndarray:
    """Bilinear + BORDER_REFLECT_101 rotation of the x``scale``
    nearest-replicated image, sampled back at stride ``scale`` — the
    reference's rotate-at-2.5m-then-x0.25-down recipe
    (BH_loader.py:354-365 / augment.py:augment_pair_lowres) without ever
    materialising the hi-res image: each bilinear tap of the replicated
    image IS a low-res pixel (index // scale)."""
    h, w = img_lr.shape[0], img_lr.shape[1]
    hh, ww = h * scale, w * scale
    ys = (jnp.arange(h, dtype=jnp.float32) * scale)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) * scale)[None, :]
    sy, sx = _src_coords(angle_deg, hh, ww, ys, xs)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]

    flat = img_lr.reshape(-1, img_lr.shape[-1])

    def tap(yi, xi):
        idx = ((_reflect101(yi, hh) // scale) * w
               + _reflect101(xi, ww) // scale)
        return jnp.take(flat, idx.reshape(-1), axis=0,
                        mode="clip").reshape(h, w, -1)

    v00, v01 = tap(y0, x0), tap(y0, x0 + 1)
    v10, v11 = tap(y0 + 1, x0), tap(y0 + 1, x0 + 1)
    top = v00 + fx * (v01 - v00)
    bot = v10 + fx * (v11 - v10)
    return top + fy * (bot - top)


def augment_sample(key: jax.Array, img_lr: jnp.ndarray, height: jnp.ndarray,
                   scale: int = 4):
    """One sample of the reference training augmentation
    (BH_loader.py:17-22 via augment.py:augment_pair_lowres):
    Flip(p=.5) -> RandomGridShuffle(2,2)(p=.5) -> Rotate(90, p=.5),
    applied jointly to the normalised low-res image (h, w, C) and the
    hi-res height mask (scale*h, scale*w)."""
    kf, kd, ks, kp, kr, ka = jax.random.split(key, 6)
    do = jax.random.uniform(kf) < 0.5
    d = jax.random.randint(kd, (), -1, 2)
    img_lr = jnp.where(do, flip(img_lr, d), img_lr)
    height = jnp.where(do, flip(height, d), height)

    do = jax.random.uniform(ks) < 0.5
    order = jax.random.permutation(kp, 4)
    img_lr = jnp.where(do, grid_shuffle_2x2(img_lr, order), img_lr)
    height = jnp.where(do, grid_shuffle_2x2(height, order), height)

    do = jax.random.uniform(kr) < 0.5
    angle = jax.random.uniform(ka, (), minval=-90.0, maxval=90.0)
    img_lr = jnp.where(do, rotate_image_lowres(img_lr, angle, scale), img_lr)
    height = jnp.where(do, rotate_mask_nearest(height, angle), height)
    return img_lr, height


def augment_batch(key: jax.Array, images: jnp.ndarray, heights: jnp.ndarray,
                  scale: int = 4):
    """vmap of :func:`augment_sample` with per-sample keys."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, h: augment_sample(k, i, h, scale)
                    )(keys, images, heights)


def build_targets(height: jnp.ndarray, lut: jnp.ndarray,
                  class_weight: jnp.ndarray, isaggre: bool = True
                  ) -> Dict[str, jnp.ndarray]:
    """Hierarchy class mask + per-pixel weights + aggregation targets from a
    (possibly augmented) height map — the device twin of
    ``S12GlobeDataset._finish_sample`` (BH_loader.py:373-392), bit-exact:
    int cast truncates like numpy ``astype``, aggregation is the
    ``aggregate_torch`` block mean.

    The hierarchy LUT is monotone (hir bins), so class ids are computed as
    threshold SUMS and weights as cumulative deltas — pure VPU compares
    instead of per-pixel gathers, which dominate the in-jit augmentation
    cost on TPU (measured 2x step time with gathers).
    """
    import numpy as np

    height = height.astype(jnp.float32)
    try:
        # trace-time constants (the normal path: lut/class_weight are host
        # arrays closed over by the train step)
        lut_np = np.asarray(lut, np.int64)
        cw_np = np.asarray(class_weight, np.float32)
        num = int(lut_np.max()) + 1
        monotone = bool((np.diff(lut_np) >= 0).all())
    except Exception:  # traced lut (created inside a jit): gather fallback
        monotone = False
        lut_np, cw_np = lut, class_weight

    def classes_of(h_float):
        hi = jnp.clip(h_float.astype(jnp.int32), 0, 255)
        if not monotone:  # arbitrary LUT: fall back to the gather
            return jnp.asarray(lut_np, jnp.int32)[hi]
        b = jnp.zeros(h_float.shape, jnp.int32)
        for v in range(1, num):
            thr = int(np.argmax(lut_np >= v))  # first height of class v
            b = b + (hi >= thr).astype(jnp.int32)
        return b

    def weights_of(h_float):
        if not monotone:
            return jnp.asarray(cw_np)[classes_of(h_float)]
        # select chain (not cumulative float deltas): picks the literal
        # class weight, so it stays bit-equal to cw[class]
        hi = jnp.clip(h_float.astype(jnp.int32), 0, 255)
        w = jnp.full(h_float.shape, float(cw_np[0]), jnp.float32)
        for v in range(1, num):
            thr = int(np.argmax(lut_np >= v))
            w = jnp.where(hi >= thr, jnp.float32(cw_np[v]), w)
        return w

    build = classes_of(height)
    out = {"height": height, "build": build, "weight": weights_of(height)}
    if isaggre:
        aggre = aggregate(height, 0.25)
        out["height_aggre"] = aggre
        out["weight_aggre"] = weights_of(aggre)
    return out
