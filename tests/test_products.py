"""Height-product comparison & sample-selection toolbox
(demo_preprocess_height_v2.py long tail) on synthetic rasters/grids."""
import csv
import os

import numpy as np
import pytest

from srbh_tpu.data.shapefile import ShapeRecord, read_shapefile, write_shapefile
from srbh_tpu.data.tiff import TiffReader, write_tiff
from srbh_tpu.tools import products as prod

GT = (0.0, 1.0, 0.0, 100.0, 0.0, -1.0)  # 1 m pixels, top-left (0, 100)


def _tif(tmp_path, name, arr, gt=GT):
    p = str(tmp_path / name)
    write_tiff(p, arr, geotransform=gt)
    return p


class TestVirtualMosaic:
    def test_single_raster_window(self, tmp_path):
        a = np.arange(100, dtype=np.uint16).reshape(10, 10)
        m = prod.VirtualMosaic([_tif(tmp_path, "a.tif", a,
                                     (0, 1, 0, 10, 0, -1))])
        out = m.read_window((2, 5, 6, 9), resolution=1.0)
        # rows 1..4 (y from 9 down to 5), cols 2..5
        np.testing.assert_array_equal(out, a[1:5, 2:6])

    def test_overlap_later_wins_and_nodata(self, tmp_path):
        g1 = (0, 1, 0, 10, 0, -1)
        g2 = (5, 1, 0, 10, 0, -1)
        p1 = _tif(tmp_path, "m1.tif", np.full((10, 10), 1, np.uint8), g1)
        p2 = _tif(tmp_path, "m2.tif", np.full((10, 10), 2, np.uint8), g2)
        m = prod.VirtualMosaic([p1, p2], nodata=9)
        out = m.read_window((0, 0, 20, 10), resolution=1.0)
        assert out[0, 0] == 1 and out[0, 7] == 2 and out[0, 14] == 2
        assert out[0, 16] == 9  # outside both -> nodata

    def test_resolution_resample(self, tmp_path):
        a = np.zeros((10, 10), np.uint8)
        a[::2, ::2] = 4
        m = prod.VirtualMosaic([_tif(tmp_path, "r.tif", a, (0, 1, 0, 10, 0, -1))])
        out = m.read_window((0, 0, 10, 10), resolution=2.0)
        assert out.shape == (5, 5)
        # centre of each 2 m pixel falls on an odd source row/col -> 0
        assert out.max() == 0


class TestVectorTools:
    def test_raster_extent_shapefile(self, tmp_path):
        p1 = _tif(tmp_path, "beijing_x.tif", np.zeros((10, 20), np.uint8),
                  (100, 2, 0, 500, 0, -2))
        out = str(tmp_path / "all_grid.shp")
        rows = prod.raster_extent_shapefile([p1], out)
        assert rows[0]["location"] == "beijing"
        rec = read_shapefile(out)[0]
        assert rec.bounds == (100.0, 480.0, 140.0, 500.0)
        assert rec.attributes["location"] == "beijing"

    def test_add_field_by_expression(self, tmp_path):
        shp = str(tmp_path / "b.shp")
        recs = [ShapeRecord((0, 0, 1, 1), {"elevation": 9}),
                ShapeRecord((1, 0, 2, 1), {"elevation": 30})]
        write_shapefile(shp, recs, [("elevation", "N", 10, 0)])
        vals = prod.add_field_by_expression(shp)
        assert vals == [3, 10]
        assert read_shapefile(shp)[1].attributes["FloorNum"] == 10

    def test_zonal_stats(self, tmp_path):
        a = np.zeros((10, 10), np.uint8)
        a[0:4, 0:4] = 5
        tif = _tif(tmp_path, "z.tif", a, (0, 1, 0, 10, 0, -1))
        shp = str(tmp_path / "z.shp")
        write_shapefile(shp, [ShapeRecord((0, 6, 4, 10)),
                              ShapeRecord((6, 0, 10, 4))])
        sums, counts = prod.zonal_stats(shp, tif)
        assert sums == [16, 0] and counts == [16, 16]
        assert read_shapefile(shp)[0].attributes["sum"] == 16


class TestGridComparison:
    def _setup(self, tmp_path, agree=True):
        """Reference city raster + product mosaic + a 4-cell fishgrid."""
        ref = np.zeros((8, 8), np.uint8)
        ref[0:4, 0:4] = 1  # top-left cell fully built
        ref_tif = _tif(tmp_path, "city.tif", ref, (0, 1, 0, 8, 0, -1))
        pr = ref.copy() if agree else np.zeros_like(ref)
        mosaic = prod.VirtualMosaic(
            [_tif(tmp_path, "prod.tif", pr, (0, 1, 0, 8, 0, -1))])
        shp = str(tmp_path / "city_grid.shp")
        cells = [(0, 4, 4, 8), (4, 4, 8, 8), (0, 0, 4, 4), (4, 0, 8, 4)]
        recs = [ShapeRecord(c, {"FID": i, "isv": 1})
                for i, c in enumerate(cells)]
        write_shapefile(shp, recs, [("FID", "N", 10, 0), ("isv", "N", 10, 0)])
        return ref_tif, mosaic, shp

    def test_compare_grid_products_agreeing(self, tmp_path):
        ref_tif, mosaic, shp = self._setup(tmp_path, agree=True)
        prod.compare_grid_products(ref_tif, mosaic, shp, nresolution=1.0,
                                   condition=(0, 4, 16, 0.3), use_iou=True)
        recs = read_shapefile(shp)
        # cell 0 (top-left): 16 built px, perfect agreement
        assert recs[0].attributes["vrt_sum"] == 16
        assert recs[0].attributes["vrt_count"] == 16
        assert recs[0].attributes["absdiff"] == 0
        assert recs[0].attributes["isv2"] == 1
        assert recs[0].attributes["isv3"] == 1
        assert recs[0].attributes["isv4"] == 1
        # empty cell: not enough product pixels -> isv2=0, but agreement holds
        assert recs[3].attributes["isv2"] == 0
        assert recs[3].attributes["isv4"] == 0

    def test_compare_grid_products_disagreeing(self, tmp_path):
        ref_tif, mosaic, shp = self._setup(tmp_path, agree=False)
        prod.compare_grid_products(ref_tif, mosaic, shp, nresolution=1.0,
                                   condition=(0, 4, 16, 0.3), use_iou=True)
        recs = read_shapefile(shp)
        assert recs[0].attributes["absdiff"] == 16
        assert recs[0].attributes["isv3"] == 0  # diou = 1 > 0.3
        assert float(recs[0].attributes["diou"]) == pytest.approx(1.0)

    def test_skips_invalid_cells(self, tmp_path):
        ref_tif, mosaic, shp = self._setup(tmp_path)
        recs = read_shapefile(shp)
        for r in recs:
            r.attributes["isv"] = 0
        write_shapefile(shp, recs, [("FID", "N", 10, 0), ("isv", "N", 10, 0)])
        cols = prod.compare_grid_products(ref_tif, mosaic, shp)
        assert all(v == 0 for v in cols["vrt_sum"])

    def test_clip_valid_samples(self, tmp_path):
        ref_tif, mosaic, shp = self._setup(tmp_path)
        prod.compare_grid_products(ref_tif, mosaic, shp, nresolution=1.0,
                                   condition=(0, 4, 16, 0.3), use_iou=True)
        out = prod.clip_valid_samples(ref_tif, mosaic, shp,
                                      str(tmp_path / "samples"),
                                      subdir=("bh", "cbra"), nresolution=1.0)
        # only the fully-built cell survives isv4
        assert len(out) == 2
        assert os.path.basename(out[0]) == "city_0.tif"
        a = TiffReader(out[0]).read()[..., 0]
        b = TiffReader(out[1]).read()[..., 0]
        np.testing.assert_array_equal(a, np.ones((4, 4), np.uint8))
        np.testing.assert_array_equal(a, b)


class TestSampleMetrics:
    def test_sample_height_rmse_recipe(self, tmp_path):
        os.makedirs(tmp_path / "cnbh"); os.makedirs(tmp_path / "cbra")
        os.makedirs(tmp_path / "bh")
        cnbh = np.full((128, 128), 9.0, np.float32)  # resized to 256 nearest
        cbra = np.zeros((256, 256), np.uint8)
        cbra[:128, :] = 255  # mask top half
        bh = np.zeros((256, 256), np.uint8)
        bh[:, :] = 2  # clamps to 3 floors -> 9 m
        write_tiff(str(tmp_path / "cnbh" / "t.tif"), cnbh)
        write_tiff(str(tmp_path / "cbra" / "t.tif"), cbra)
        write_tiff(str(tmp_path / "bh" / "t.tif"), bh)
        r = prod.sample_height_rmse(str(tmp_path / "cbra"),
                                    str(tmp_path / "cnbh"),
                                    str(tmp_path / "bh"), "t.tif")
        # masked top half: 9 - 9 = 0 (dropped); bottom half: 0 - 9 = -9
        assert r == pytest.approx(9.0)

    def test_count_valid_samples_csv(self, tmp_path):
        shp = str(tmp_path / "cityA_grid.shp")
        write_shapefile(shp, [ShapeRecord((0, 0, 1, 1), {"isv4": 1}),
                              ShapeRecord((1, 0, 2, 1), {"isv4": 0})],
                        [("isv4", "N", 10, 0)])
        out = str(tmp_path / "num_valid.csv")
        counts = prod.count_valid_samples([shp], out)
        assert counts == {"cityA": 1}
        with open(out) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["", "num_valid"] and rows[1] == ["cityA", "1"]


class TestProductSweep:
    def test_compare_height_products_csv(self, tmp_path):
        a = np.zeros((10, 10), np.float32); a[2:6, 2:6] = 10.0
        b = np.zeros((10, 10), np.float32); b[2:6, 2:6] = 12.0
        pairs = {"cityA": (_tif(tmp_path, "a.tif", a),
                           _tif(tmp_path, "b.tif", b))}
        out = str(tmp_path / "cmp.csv")
        rows = prod.compare_height_products(pairs, out)
        assert [r["city"] for r in rows] == ["cityA", "all"]
        assert rows[0]["iou"] == 1.0
        assert rows[0]["rmse"] == pytest.approx(2.0)
        assert rows[0]["me"] == pytest.approx(-2.0)
        with open(out) as f:
            header = f.readline().strip()
        assert header == "city,iou,rmse,mae,me,count"

    def test_shape_mismatch_regrids(self, tmp_path):
        a = np.full((10, 10), 5, np.float32)
        b = np.full((5, 5), 5, np.float32)  # coarser product
        pairs = {"c": (_tif(tmp_path, "fa.tif", a),
                       _tif(tmp_path, "fb.tif", b))}
        rows = prod.compare_height_products(pairs, str(tmp_path / "o.csv"))
        assert rows[0]["rmse"] == 0.0 and rows[0]["iou"] == 1.0


class TestEndToEnd:
    def test_main_sample_selection(self, tmp_path):
        ref = np.zeros((8, 8), np.uint8)
        ref[0:4, 0:4] = 1
        city = _tif(tmp_path, "metro.tif", ref, (0, 1, 0, 8, 0, -1))
        product = _tif(tmp_path, "prodx.tif", ref, (0, 1, 0, 8, 0, -1))
        counts = prod.main_sample_selection(
            [city], [product], window_size=4,
            grid_condition=(0, 4, 16), compare_condition=(0, 4, 16, 0.3),
            nresolution=1.0, out_csv=str(tmp_path / "nv.csv"))
        assert counts == {"metro": 1}
        assert os.path.exists(tmp_path / "metro_grid.shp")
        assert os.path.exists(tmp_path / "nv.csv")
