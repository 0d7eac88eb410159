"""On-device overlap-blend stitching (scatter-add) for city mosaics.

SURVEY.md §5.7's TPU-native design for the fishnet predictor
(predict_realesanet_feature_globe.py:156-209): instead of shipping every
batch's tiles to the host and summing there, keep the canvases in HBM,
scatter-add fixed-shape tiles under ``lax.scan`` (XLA updates the donated
carry in place), and materialise ONE finalized mosaic on host per city.
``stitch_tiles_sharded`` runs the same accumulation with the tile list
sharded over a mesh's data axis and ``psum``-merges the per-device
canvases over ICI — the multi-chip city sweep.

Semantics match :class:`srbh_tpu.predict.stitcher.MosaicAccumulator`
exactly (int accumulation, ragged edge windows via ``xcount/ycount``
masking, final ``round(sum/weight) -> uint16`` + argmax), which the parity
test pins. Host accumulation stays the default for canvases beyond HBM
(tens of GB at 2.5 m); this path wins when a city canvas fits.
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu.parallel.mesh import DATA_AXIS


def _scan_stitch(hs, bs, wt, height, build, pos, upscale):
    """Scatter-add tiles into (hs, bs, wt) canvases; pos = (N, 4) int32
    [xoff, yoff, xcount, ycount] in source pixels (reference layout)."""
    t = height.shape[1]
    iota_y = jnp.arange(t, dtype=jnp.int32)
    iota_x = jnp.arange(t, dtype=jnp.int32)

    def body(carry, inp):
        hs, bs, wt = carry
        h, b, p = inp
        x0, y0, xc, yc = (p[0] * upscale, p[1] * upscale,
                          p[2] * upscale, p[3] * upscale)
        mask = ((iota_y[:, None] < yc) & (iota_x[None, :] < xc)
                ).astype(hs.dtype)
        # dynamic_slice clamps out-of-bounds starts, so an edge window whose
        # fixed t-window overhangs the canvas would land at a clamped (wrong)
        # offset. Shift the window start back inside and roll the masked
        # tile by the same delta — the wrapped-in region is already zero.
        yd = jnp.maximum(y0 + t - hs.shape[0], 0)
        xd = jnp.maximum(x0 + t - hs.shape[1], 0)
        ys, xs = y0 - yd, x0 - xd
        mask = jnp.roll(jnp.roll(mask, yd, 0), xd, 1)
        h = jnp.roll(jnp.roll(h.astype(hs.dtype), yd, 0), xd, 1) * mask
        b = jnp.roll(jnp.roll(b.astype(bs.dtype), yd, 0), xd, 1) \
            * mask[..., None]
        win = jax.lax.dynamic_slice(hs, (ys, xs), (t, t))
        hs = jax.lax.dynamic_update_slice(hs, win + h, (ys, xs))
        winb = jax.lax.dynamic_slice(bs, (ys, xs, 0), (t, t, bs.shape[-1]))
        bs = jax.lax.dynamic_update_slice(bs, winb + b, (ys, xs, 0))
        winw = jax.lax.dynamic_slice(wt, (ys, xs), (t, t))
        wt = jax.lax.dynamic_update_slice(wt, winw + mask.astype(wt.dtype),
                                          (ys, xs))
        return (hs, bs, wt), None

    (hs, bs, wt), _ = jax.lax.scan(body, (hs, bs, wt), (height, build, pos))
    return hs, bs, wt


@partial(jax.jit, static_argnames=("canvas_hw", "upscale"),
         donate_argnums=())
def stitch_tiles(height_u16: jnp.ndarray, build_u16: jnp.ndarray,
                 pos: jnp.ndarray, canvas_hw: Tuple[int, int],
                 upscale: int = 4):
    """Single-device scatter-add of a whole tile list.

    ``height_u16`` (N, T, T) and ``build_u16`` (N, T, T, C) integer tiles
    (any uint dtype), ``pos`` (N, 4) int32 source-pixel windows. Returns
    int32 (H, W) height sum, (H, W, C) build sum, (H, W) weight, with
    H, W = canvas_hw (already at output resolution).
    """
    h, w = canvas_hw
    hs = jnp.zeros((h, w), jnp.int32)
    bs = jnp.zeros((h, w, build_u16.shape[-1]), jnp.int32)
    wt = jnp.zeros((h, w), jnp.int32)
    return _scan_stitch(hs, bs, wt, height_u16, build_u16,
                        pos.astype(jnp.int32), upscale)


@functools.lru_cache(maxsize=8)
def _accumulator_step_fn(upscale: int):
    """Shared jitted scatter-add step for DeviceMosaicAccumulator; jit's
    own cache then reuses compiles across same-shape cities."""
    return jax.jit(
        lambda hs, bs, wt, h, b, p: _scan_stitch(hs, bs, wt, h, b, p,
                                                 upscale),
        donate_argnums=(0, 1, 2))


@functools.lru_cache(maxsize=32)
def _sharded_stitch_fn(mesh, h: int, w: int, c: int, upscale: int):
    """Jitted shard_map program for one (mesh, canvas, classes) shape —
    cached so per-city calls in a fleet sweep compile once."""
    from jax.sharding import PartitionSpec as P

    def local(hts, bts, pts):
        # initial canvases must be typed as varying over the data axis
        # (each device accumulates a different partial sum before the psum)
        def vary(x):
            return jax.lax.pcast(x, DATA_AXIS, to="varying")

        hs = vary(jnp.zeros((h, w), jnp.int32))
        bs = vary(jnp.zeros((h, w, c), jnp.int32))
        wt = vary(jnp.zeros((h, w), jnp.int32))
        hs, bs, wt = _scan_stitch(hs, bs, wt, hts, bts,
                                  pts.astype(jnp.int32), upscale)
        return (jax.lax.psum(hs, DATA_AXIS), jax.lax.psum(bs, DATA_AXIS),
                jax.lax.psum(wt, DATA_AXIS))

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P())))


def stitch_tiles_sharded(height_u16, build_u16, pos,
                         canvas_hw: Tuple[int, int], mesh,
                         upscale: int = 4):
    """Mesh-sharded stitching: tiles split over ``mesh``'s data axis, each
    device scans its shard into a local canvas, canvases ``psum``-merged
    over ICI. The tile list is padded with zero-count windows (mask = 0) to
    a multiple of the axis size, so any N works."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[DATA_AXIS]
    n = height_u16.shape[0]
    padded = -(-n // n_dev) * n_dev
    if padded != n:
        padn = padded - n
        height_u16 = np.concatenate(
            [height_u16, np.zeros((padn,) + height_u16.shape[1:],
                                  height_u16.dtype)])
        build_u16 = np.concatenate(
            [build_u16, np.zeros((padn,) + build_u16.shape[1:],
                                 build_u16.dtype)])
        pos = np.concatenate([pos, np.zeros((padn, 4), pos.dtype)])

    h, w = canvas_hw
    fn = _sharded_stitch_fn(mesh, h, w, int(build_u16.shape[-1]),
                            int(upscale))
    shard = NamedSharding(mesh, P(DATA_AXIS))
    args = [jax.device_put(np.asarray(a), shard)
            for a in (height_u16, build_u16, pos)]
    return fn(*args)


class DeviceMosaicAccumulator:
    """Drop-in MosaicAccumulator that keeps the canvases in HBM.

    ``add_batch`` accepts device (or host) tiles — in the predictor loop the
    model outputs never leave the chip — and scatter-adds them with a
    donated-carry jit, so XLA updates the canvases in place. ``finalize``
    computes the mosaic on device and ships ONE compact result to host.
    """

    def __init__(self, width: int, height: int, n_classes: int,
                 upscale: int = 4):
        self.upscale = upscale
        self.h, self.w = height * upscale, width * upscale
        self.hs = jnp.zeros((self.h, self.w), jnp.int32)
        self.bs = jnp.zeros((self.h, self.w, n_classes), jnp.int32)
        self.wt = jnp.zeros((self.h, self.w), jnp.int32)
        # module-level cache: per-instance lambdas would recompile the
        # scatter-add program for every city even at repeated shapes
        self._step = _accumulator_step_fn(upscale)

    def add_batch(self, height_u16, build_u16, pos):
        """Tiles (N, T, T[, C]); pos (N, 4) [xoff, yoff, xc, yc] source px.
        Short batches may pad with zero-count windows (xc = yc = 0)."""
        self.hs, self.bs, self.wt = self._step(
            self.hs, self.bs, self.wt, jnp.asarray(height_u16),
            jnp.asarray(build_u16), jnp.asarray(np.asarray(pos), jnp.int32))

    def finalize(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        height, build_cls, weight = finalize_mosaic(self.hs, self.bs, self.wt)
        return np.asarray(height), np.asarray(build_cls), np.asarray(weight)


@partial(jax.jit, static_argnames=())
def finalize_mosaic(height_sum, build_sum, weight):
    """Device-side twin of ``MosaicAccumulator.finalize``: height =
    round(sum / weight) as uint16 (0 where never covered), build = argmax
    class uint8, weight uint16 — one compact host transfer per city."""
    wt = weight.astype(jnp.float32)
    height = jnp.where(
        weight > 0,
        jnp.round(height_sum.astype(jnp.float32) / jnp.maximum(wt, 1.0)),
        0.0).astype(jnp.uint16)
    build_cls = jnp.argmax(build_sum, axis=-1).astype(jnp.uint8)
    return height, build_cls, weight.astype(jnp.uint16)
