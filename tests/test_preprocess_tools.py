"""Preprocessing toolbox: rasterisation, clipping, mosaics, comparisons."""
import os

import numpy as np
import pytest

from srbh_tpu.data.shapefile import ShapeRecord, read_shapefile, write_shapefile
from srbh_tpu.data.tiff import TiffReader, write_tiff
from srbh_tpu.tools import preprocess as prep


@pytest.fixture()
def ref_raster(tmp_path):
    gt = (1000.0, 10.0, 0.0, 2000.0, 0.0, -10.0)
    p = str(tmp_path / "ref.tif")
    write_tiff(p, np.zeros((50, 60), np.uint8), geotransform=gt)
    return p, gt


class TestShp2Tif:
    def test_burns_polygon(self, tmp_path, ref_raster):
        ref, gt = ref_raster
        # a 20x10-pixel rectangle starting at pixel (5, 5)
        minx, maxy = 1000 + 5 * 10, 2000 - 5 * 10
        maxx, miny = minx + 20 * 10, maxy - 10 * 10
        shp = str(tmp_path / "poly.shp")
        write_shapefile(shp, [ShapeRecord((minx, miny, maxx, maxy),
                                          {"val": 7})],
                        [("val", "N", 10, 0)])
        # ring geometry roundtrips through our reader
        assert read_shapefile(shp)[0].rings is not None
        out = prep.shp2tif(shp, ref, str(tmp_path / "burn.tif"),
                           attribute="val")
        assert out[7, 7] == 7 and out[7, 26] == 0  # inside / outside
        assert out[0, 0] == 0
        assert TiffReader(str(tmp_path / "burn.tif")).geotransform == gt

    def test_burn_constant(self, tmp_path, ref_raster):
        ref, gt = ref_raster
        shp = str(tmp_path / "c.shp")
        write_shapefile(shp, [ShapeRecord((1100, 1800, 1300, 1950))])
        out = prep.shp2tif(shp, ref, str(tmp_path / "c.tif"), burn_value=1)
        assert out.max() == 1 and out.sum() > 0


class TestClipAndMosaic:
    def test_clip_by_extent(self, tmp_path):
        big_gt = (0.0, 10.0, 0.0, 1000.0, 0.0, -10.0)
        big = np.arange(100 * 100, dtype=np.uint16).reshape(100, 100)
        bp = str(tmp_path / "big.tif")
        write_tiff(bp, big, geotransform=big_gt)
        # extent covering pixels x 20..40, y 30..50
        ext_gt = (200.0, 10.0, 0.0, 700.0, 0.0, -10.0)
        ep = str(tmp_path / "ext.tif")
        write_tiff(ep, np.zeros((20, 20), np.uint8), geotransform=ext_gt)
        out = prep.clip_tiff_by_tiff(bp, ep, str(tmp_path / "clip.tif"))
        np.testing.assert_array_equal(out[..., 0], big[30:50, 20:40])
        r = TiffReader(str(tmp_path / "clip.tif"))
        assert r.geotransform[0] == 200.0 and r.geotransform[3] == 700.0

    def test_main_gen_mask(self, tmp_path):
        os.makedirs(tmp_path / "cities")
        gt = (100.0, 10.0, 0.0, 900.0, 0.0, -10.0)
        write_tiff(str(tmp_path / "cities" / "abc_s2.tif"),
                   np.zeros((10, 10), np.uint8), geotransform=gt)
        write_tiff(str(tmp_path / "wsf.tif"),
                   np.ones((100, 100), np.uint8),
                   geotransform=(0.0, 10.0, 0.0, 1000.0, 0.0, -10.0))
        outs = prep.main_gen_mask(str(tmp_path / "cities"),
                                  str(tmp_path / "wsf.tif"),
                                  str(tmp_path / "masks"))
        assert outs == [str(tmp_path / "masks" / "abc_wsf.tif")]
        assert TiffReader(outs[0]).read().shape == (10, 10, 1)

    def test_mosaic(self, tmp_path):
        gt1 = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        gt2 = (5.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        write_tiff(str(tmp_path / "a.tif"),
                   np.full((10, 10), 1, np.uint8), geotransform=gt1)
        write_tiff(str(tmp_path / "b.tif"),
                   np.full((10, 10), 2, np.uint8), geotransform=gt2)
        out = prep.mosaic_rasters([str(tmp_path / "a.tif"),
                                   str(tmp_path / "b.tif")],
                                  str(tmp_path / "m.tif"))
        assert out.shape == (10, 15, 1)
        assert out[0, 0, 0] == 1 and out[0, 14, 0] == 2
        assert out[0, 7, 0] == 2  # later raster wins the overlap


class TestCompare:
    def test_metrics(self, tmp_path):
        gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        a = np.zeros((10, 10), np.float32)
        a[2:6, 2:6] = 10.0
        b = np.zeros((10, 10), np.float32)
        b[2:6, 2:6] = 12.0
        write_tiff(str(tmp_path / "a.tif"), a, geotransform=gt)
        write_tiff(str(tmp_path / "b.tif"), b, geotransform=gt)
        r = prep.compare_rasters(str(tmp_path / "a.tif"),
                                 str(tmp_path / "b.tif"))
        assert r["iou"] == 1.0
        assert r["rmse"] == pytest.approx(2.0)
        assert r["me"] == pytest.approx(-2.0)

    def test_floor_conversion(self):
        v = np.array([0, 1, 2, 3, 10], np.float32)
        out = prep.floor_field_to_height(v)
        np.testing.assert_array_equal(out, [0, 6, 6, 9, 30])

    def test_download_requires_ref_grid(self, tmp_path):
        """download_sentinel12 is a real offline manifest builder now
        (not the old Earth-Engine stub): without the WorldCover grid
        shapefile it must fail loudly before touching the filesystem."""
        shp = str(tmp_path / "q.shp")
        write_shapefile(shp, [ShapeRecord((0, 0, 1, 1))])
        with pytest.raises(ValueError, match="ref_shp"):
            prep.download_sentinel12(shp, str(tmp_path))


class TestCLIs:
    def test_preprocess_cli_roundtrip(self, tmp_path):
        """shp-to-tiff + clip + grid subcommands drive the real functions."""
        import numpy as np
        from srbh_tpu.data.shapefile import ShapeRecord, write_shapefile
        from srbh_tpu.data.tiff import TiffReader, write_tiff
        from srbh_tpu.tools.preprocess import _cli

        shp = str(tmp_path / "b.shp")
        write_shapefile(shp, [ShapeRecord((0.0, 0.0, 20.0, 20.0),
                                          {"class": 5})],
                        [("class", "N", 9, 0)])
        out = str(tmp_path / "b.tif")
        _cli(["shp-to-tiff", "--shp", shp, "--out", out,
              "--resolution", "2.5"])
        r = TiffReader(out)
        assert (r.width, r.height) == (8, 8)
        assert r.read().max() == 5

        big = str(tmp_path / "big.tif")
        write_tiff(big, np.arange(400, dtype=np.uint16).reshape(20, 20),
                   geotransform=(0, 2.5, 0, 50, 0, -2.5))
        clipped = str(tmp_path / "clip.tif")
        _cli(["clip", "--src", big, "--extent", out, "--out", clipped])
        assert TiffReader(clipped).width == 8

    def test_stats_cli(self, tmp_path):
        import numpy as np
        from srbh_tpu.data.stats import _cli
        from srbh_tpu.data.tiff import write_tiff

        d = tmp_path / "tiles" / "s2x"
        d.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(3):
            write_tiff(str(d / f"t{i}.tif"),
                       rng.randint(0, 1000, (8, 8, 2)).astype(np.uint16))
        res = str(tmp_path / "stats")
        _cli(["stats", "--ipath", str(tmp_path / "tiles"),
              "--subdir", "s2x", "--nband", "2", "--resroot", res])
        table = np.loadtxt(res + "/s2x_minmax.txt")
        assert table.shape == (2, 2)
        assert (table[1] > table[0]).all()
