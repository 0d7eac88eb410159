"""On-device scatter-add stitching vs the host MosaicAccumulator.

Pins exact parity (sums, ragged edge masking, round(sum/weight) finalize,
argmax classes) for both the single-device scan and the 8-device
shard_map + psum variant, including the zero-count padding path.
"""
import numpy as np

import jax.numpy as jnp

from srbh_tpu.parallel import mesh as pmesh
from srbh_tpu.predict.device_stitcher import (
    finalize_mosaic,
    stitch_tiles,
    stitch_tiles_sharded,
)
from srbh_tpu.predict.stitcher import MosaicAccumulator

SRC_W, SRC_H, WIN, UP, C = 24, 20, 8, 4, 3
T = WIN * UP


def _random_batch(rng, n):
    height = rng.randint(0, 2000, (n, T, T)).astype(np.uint16)
    build = rng.randint(0, 256, (n, T, T, C)).astype(np.uint16)
    pos = np.zeros((n, 4), np.int32)
    for i in range(n):
        # overlapping stride-6 style windows; a few edge-clipped ones
        pos[i, 0] = rng.randint(0, SRC_W - 4)
        pos[i, 1] = rng.randint(0, SRC_H - 4)
        pos[i, 2] = min(WIN, SRC_W - pos[i, 0])
        pos[i, 3] = min(WIN, SRC_H - pos[i, 1])
    return height, build, pos


def _host_reference(height, build, pos):
    acc = MosaicAccumulator(SRC_W, SRC_H, C, upscale=UP)
    acc.add_batch(height, build, pos)
    return acc


def _check(hs, bs, wt, acc):
    np.testing.assert_array_equal(np.asarray(hs), acc.height_sum)
    np.testing.assert_array_equal(
        np.asarray(bs).transpose(2, 0, 1), acc.build_sum)
    np.testing.assert_array_equal(np.asarray(wt), acc.weight.astype(np.int64))


def test_single_device_matches_host():
    rng = np.random.RandomState(0)
    height, build, pos = _random_batch(rng, 13)
    acc = _host_reference(height, build, pos)
    hs, bs, wt = stitch_tiles(jnp.asarray(height), jnp.asarray(build),
                              jnp.asarray(pos),
                              (SRC_H * UP, SRC_W * UP), UP)
    _check(hs, bs, wt, acc)

    h_d, cls_d, w_d = finalize_mosaic(hs, bs, wt)
    h_h, cls_h, w_h = acc.finalize()
    np.testing.assert_array_equal(np.asarray(h_d), h_h)
    np.testing.assert_array_equal(np.asarray(cls_d), cls_h)
    np.testing.assert_array_equal(np.asarray(w_d), w_h)


def test_sharded_matches_host_with_padding():
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    rng = np.random.RandomState(1)
    height, build, pos = _random_batch(rng, 19)  # not a multiple of 8
    acc = _host_reference(height, build, pos)
    hs, bs, wt = stitch_tiles_sharded(height, build, pos,
                                      (SRC_H * UP, SRC_W * UP), mesh, UP)
    _check(hs, bs, wt, acc)


def test_zero_count_window_is_a_noop():
    height = np.full((1, T, T), 7, np.uint16)
    build = np.full((1, T, T, C), 9, np.uint16)
    pos = np.array([[3, 2, 0, 0]], np.int32)
    hs, bs, wt = stitch_tiles(jnp.asarray(height), jnp.asarray(build),
                              jnp.asarray(pos),
                              (SRC_H * UP, SRC_W * UP), UP)
    assert int(jnp.abs(hs).sum()) == 0
    assert int(jnp.abs(bs).sum()) == 0
    assert int(jnp.abs(wt).sum()) == 0


def test_predict_city_device_stitch_matches_host(tmp_path):
    """predict_city(stitch='device') writes byte-identical mosaics to the
    host path on a synthetic city (the SURVEY §5.7 on-device blending)."""
    import os

    import jax
    from srbh_tpu import models
    from srbh_tpu.data.grid import GridImageDataset, fishgrid_stats, write_fishgrid
    from srbh_tpu.data.tiff import TiffReader, write_tiff
    from srbh_tpu.predict.predictor import make_city_step, predict_city

    root = tmp_path / "city"
    os.makedirs(root)
    rng = np.random.default_rng(3)
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    w, h = 130, 100
    write_tiff(str(root / "demo_s2.tif"),
               rng.integers(0, 5000, (h, w, 6)).astype(np.uint16),
               geotransform=gt)
    write_tiff(str(root / "demo_s1.tif"),
               rng.uniform(-25, 5, (h, w, 2)).astype(np.float32),
               geotransform=gt)
    write_tiff(str(root / "demo_wsf.tif"),
               (rng.random((h, w)) < 0.5).astype(np.uint8) * 255,
               geotransform=gt)
    write_fishgrid(str(root / "demo_s2.tif"), 64, 56)
    fishgrid_stats(str(root / "demo_wsf.tif"), str(root / "demo_s2_grid.shp"),
                   condition=(0, 20, 4096))
    os.makedirs(root / "stats")
    np.savetxt(root / "stats" / "s2x_minmax.txt",
               np.stack([np.full(6, 0.0), np.full(6, 5000.0)]))
    np.savetxt(root / "stats" / "s1x_minmax.txt",
               np.stack([np.full(2, -25.0), np.full(2, 5.0)]))

    sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8,
                        dtype=jnp.float32)
    model = models.SRRegressClsFeature(encoder_name="efficientnet-test",
                                       super_mid=8, isaggre=True,
                                       chans_build=7, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 64, 64, 8))
    sr_params = jax.jit(sr.init)(key, x[..., :3])
    variables = jax.jit(model.init)(key, x, jnp.zeros((4, 256, 256, 8)))
    step = make_city_step(model, sr, dtype=jnp.float32)
    ds = GridImageDataset(str(root), "demo", str(root / "stats"),
                          s1dir="s1x", s2dir="s2x", gridvalid="isv",
                          nchans=6)

    out_h = str(tmp_path / "host")
    out_d = str(tmp_path / "dev")
    os.makedirs(out_h)
    os.makedirs(out_d)
    bh, hh = predict_city(ds, step, variables, sr_params, out_h, "demo",
                          batch_size=4, stitch="host")
    bd, hd = predict_city(ds, step, variables, sr_params, out_d, "demo",
                          batch_size=4, stitch="device")
    np.testing.assert_array_equal(TiffReader(bd).read(), TiffReader(bh).read())
    np.testing.assert_array_equal(TiffReader(hd).read(), TiffReader(hh).read())


def test_make_city_step_mesh_sharded_matches_single():
    """GSPMD data-parallel inference step == single-device outputs."""
    import jax
    from srbh_tpu import models
    from srbh_tpu.predict.predictor import make_city_step

    sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8,
                        dtype=jnp.float32)
    model = models.SRRegressClsFeature(encoder_name="efficientnet-test",
                                       super_mid=8, isaggre=True,
                                       chans_build=7, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((8, 32, 32, 8))
    sr_params = jax.jit(sr.init)(key, x0[..., :3])
    variables = jax.jit(model.init)(key, x0, jnp.zeros((8, 128, 128, 8)))

    mesh = pmesh.make_mesh()
    step1 = make_city_step(model, sr, dtype=jnp.float32)
    step8 = make_city_step(model, sr, dtype=jnp.float32, mesh=mesh)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 8))
    h1, b1 = step1(variables, sr_params, x)
    h8, b8 = step8(variables, sr_params, x)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h8))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b8))
