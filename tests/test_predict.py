"""Grid generation, shapefile I/O, and the city predictor end-to-end on a
synthetic city."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.data.grid import (
    GridImageDataset,
    count_fishgrid_valid,
    fishgrid_cells,
    fishgrid_stats,
    generate_index,
    write_fishgrid,
)
from srbh_tpu.data.shapefile import ShapeRecord, read_shapefile, write_shapefile
from srbh_tpu.data.tiff import TiffReader, write_tiff


class TestShapefile:
    def test_roundtrip_with_fields(self, tmp_path):
        recs = [ShapeRecord((0.0, 0.0, 10.0, 10.0), {"isv": 1, "sum": 42}),
                ShapeRecord((10.0, 0.0, 20.0, 10.0), {"isv": 0, "sum": 7})]
        p = str(tmp_path / "grid.shp")
        write_shapefile(p, recs, [("isv", "N", 19, 0), ("sum", "N", 19, 0)],
                        prj_wkt='PROJCS["test"]')
        back = read_shapefile(p)
        assert len(back) == 2
        assert back[0].bounds == (0.0, 0.0, 10.0, 10.0)
        assert back[0].attributes == {"isv": 1, "sum": 42}
        assert back[1].attributes["isv"] == 0
        assert os.path.exists(p[:-4] + ".prj")
        assert os.path.exists(p[:-4] + ".shx")


class TestFishgrid:
    def test_cell_count_and_coverage(self):
        # 200x150 raster, 64-px cells, 56-px stride (the reference's params)
        gt = (1000.0, 10.0, 0.0, 5000.0, 0.0, -10.0)
        cells = fishgrid_cells(200, 150, gt, 64, 56)
        cols = (200 - 64) // 56 + 1  # 3
        rows = (150 - 64) // 56 + 1  # 2
        # regular + boundary col + boundary row + corner
        assert len(cells) == cols * rows + rows + cols + 1
        # every cell is exactly 64 px and inside the extent
        for (minx, miny, maxx, maxy) in cells:
            assert abs((maxx - minx) / 10.0 - 64) < 1e-9
            assert abs((maxy - miny) / 10.0 - 64) < 1e-9
            assert minx >= 1000.0 - 1e-6 and maxx <= 1000.0 + 2000.0 + 1e-6
        # full coverage of the raster area
        covered = np.zeros((150, 200), bool)
        for (minx, miny, maxx, maxy) in cells:
            x0 = round((minx - 1000.0) / 10.0)
            y0 = round((5000.0 - maxy) / 10.0)
            covered[y0: y0 + 64, x0: x0 + 64] = True
        assert covered.all()

    def test_exact_multiple_has_no_boundary_cells(self):
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
        cells = fishgrid_cells(64 + 56, 64 + 56, gt, 64, 56)
        assert len(cells) == 4  # 2x2 regular grid only


@pytest.fixture(scope="module")
def synth_city(tmp_path_factory):
    """A 200x150 synthetic city: s2 (6-band), s1 (2-band), wsf mask, grid."""
    root = tmp_path_factory.mktemp("city")
    rng = np.random.default_rng(0)
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    w, h = 200, 150
    s2 = rng.integers(0, 5000, (h, w, 6)).astype(np.uint16)
    s1 = rng.uniform(-25, 5, (h, w, 2)).astype(np.float32)
    wsf = (rng.random((h, w)) < 0.5).astype(np.uint8) * 255
    write_tiff(str(root / "demo_s2.tif"), s2, geotransform=gt)
    write_tiff(str(root / "demo_s1.tif"), s1, geotransform=gt)
    write_tiff(str(root / "demo_wsf.tif"), wsf, geotransform=gt)
    write_fishgrid(str(root / "demo_s2.tif"), 64, 56)
    fishgrid_stats(str(root / "demo_wsf.tif"),
                   str(root / "demo_s2_grid.shp"),
                   condition=(0, 20, 4096))
    # stats tables
    os.makedirs(root / "stats", exist_ok=True)
    np.savetxt(root / "stats" / "s2x_minmax.txt",
               np.stack([np.full(6, 0.0), np.full(6, 5000.0)]))
    np.savetxt(root / "stats" / "s1x_minmax.txt",
               np.stack([np.full(2, -25.0), np.full(2, 5.0)]))
    return root


class TestGridDataset:
    def test_validity_and_windows(self, synth_city):
        n_valid = count_fishgrid_valid(str(synth_city / "demo_s2_grid.shp"))
        assert n_valid > 0
        recs = read_shapefile(str(synth_city / "demo_s2_grid.shp"))
        # 50% random mask: every full cell has ~2048 hits >= 20 and 4096 px
        assert all(r.attributes["count"] == 4096 for r in recs)
        ds = GridImageDataset(str(synth_city), "demo",
                              str(synth_city / "stats"), s1dir="s1x",
                              s2dir="s2x", gridvalid="isv", nchans=6)
        assert len(ds) == n_valid
        s = ds[0]
        assert s["image"].shape == (64, 64, 8)
        assert s["pos"].tolist()[2:] == [64, 64]
        # windowed read equals direct slice of the source raster
        r = TiffReader(str(synth_city / "demo_s2.tif"))
        xo, yo, xc, yc = s["pos"]
        raw = r.read((int(xo), int(yo), int(xc), int(yc)))[..., :6]
        want = raw.astype(np.float32) / 5000.0
        np.testing.assert_allclose(s["image"][..., :6], want, atol=1e-6)


class TestPredictor:
    def test_city_end_to_end(self, synth_city, tmp_path):
        from srbh_tpu import models
        from srbh_tpu.predict.predictor import make_city_step, predict_city

        sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8,
                            dtype=jnp.float32)
        model = models.SRRegressClsFeature(encoder_name="efficientnet-test",
                                           super_mid=8, isaggre=True,
                                           chans_build=7, dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((4, 64, 64, 8))
        sr_params = jax.jit(sr.init)(rng, x[..., :3])
        variables = jax.jit(model.init)(rng, x, jnp.zeros((4, 256, 256, 8)))
        step = make_city_step(model, sr, dtype=jnp.float32)

        ds = GridImageDataset(str(synth_city), "demo",
                              str(synth_city / "stats"), s1dir="s1x",
                              s2dir="s2x", gridvalid="isv", nchans=6)
        respath = str(tmp_path / "pred")
        os.makedirs(respath)
        build_tif, height_tif = predict_city(
            ds, step, variables, sr_params, respath, "demo", batch_size=4)

        b = TiffReader(build_tif)
        h = TiffReader(height_tif)
        assert (b.width, b.height) == (800, 600)  # x4 of 200x150
        assert h.read().dtype.kind == "u" and h.read().dtype.itemsize == 2
        # 2.5 m geotransform (10 m / 4)
        assert b.geotransform[1] == pytest.approx(2.5)
        # build classes in range, height covered where grids were valid
        bc = b.read()[..., 0]
        assert bc.max() <= 6
        # resume: second call is a no-op (file exists)
        r1, r2 = predict_city(ds, step, variables, sr_params, respath,
                              "demo", batch_size=4)
        assert r1 == build_tif

    def test_device_canvas_hbm_guard(self, synth_city, tmp_path,
                                     monkeypatch, capsys):
        """stitch='device' falls back to host when the int32 canvases blow
        the HBM budget (guard for continent-scale cities)."""
        from srbh_tpu.predict.predictor import (
            _canvas_bytes, _device_canvas_fits)

        assert _canvas_bytes(2048, 2048, 7, 4) == 8192 * 8192 * 4 * 9
        monkeypatch.setenv("SRBH_DEVICE_CANVAS_BUDGET", str(2 * 2**30))
        assert not _device_canvas_fits(8192, 8192, 7, 4)
        assert _device_canvas_fits(512, 512, 7, 4)
        # end-to-end: tiny budget forces the fallback path, which still
        # produces the artifacts
        from srbh_tpu import models
        from srbh_tpu.predict.predictor import make_city_step, predict_city

        monkeypatch.setenv("SRBH_DEVICE_CANVAS_BUDGET", str(1000))
        sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8,
                            dtype=jnp.float32)
        model = models.SRRegressClsFeature(encoder_name="efficientnet-test",
                                           super_mid=8, isaggre=True,
                                           chans_build=7, dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((4, 64, 64, 8))
        sr_params = jax.jit(sr.init)(rng, x[..., :3])
        variables = jax.jit(model.init)(rng, x, jnp.zeros((4, 256, 256, 8)))
        step = make_city_step(model, sr, dtype=jnp.float32)
        ds = GridImageDataset(str(synth_city), "demo",
                              str(synth_city / "stats"), s1dir="s1x",
                              s2dir="s2x", gridvalid="isv", nchans=6)
        respath = str(tmp_path / "guard")
        os.makedirs(respath)
        btif, htif = predict_city(ds, step, variables, sr_params, respath,
                                  "demo", batch_size=4, stitch="device")
        assert "falling back to the host stitcher" in capsys.readouterr().out
        assert os.path.exists(btif) and os.path.exists(htif)

    def test_stitcher_blend_math(self):
        from srbh_tpu.predict.stitcher import MosaicAccumulator

        acc = MosaicAccumulator(4, 4, 2, upscale=1)
        h = np.array([[[10, 10], [10, 10]], [[30, 30], [30, 30]]], np.uint16)
        b = np.zeros((2, 2, 2, 2), np.uint16)
        # two overlapping 2x2 tiles at (0,0) and (1,0)
        pos = np.array([[0, 0, 2, 2], [1, 0, 2, 2]], np.int32)
        acc.add_batch(h, b, pos)
        height, cls, weight = acc.finalize()
        assert height[0, 0] == 10           # single coverage
        assert height[0, 1] == 20           # (10+30)/2
        assert weight[0, 1] == 2
        assert height[3, 3] == 0            # uncovered
