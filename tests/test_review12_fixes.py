"""Regression tests for the twelfth adversarial-review findings."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.data.tiff import write_tiff


class TestNearestTorchRule:
    def test_matches_torch_interpolate(self):
        """floor(dst * float32(in/out)), not exact integer floor — they
        disagree at boundary indices (224->384: rows 62/118/125)."""
        torch = pytest.importorskip("torch")

        from srbh_tpu.metrics.learned import _nearest_torch

        x = np.arange(224 * 224 * 3, dtype=np.float32).reshape(1, 224, 224, 3)
        got = np.asarray(_nearest_torch(jnp.asarray(x), 384))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(384, 384),
            mode="nearest").numpy().transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(got, want)

    def test_downscale_matches_torch(self):
        torch = pytest.importorskip("torch")

        from srbh_tpu.metrics.learned import _nearest_torch

        x = np.arange(100 * 100, dtype=np.float32).reshape(1, 100, 100, 1)
        got = np.asarray(_nearest_torch(jnp.asarray(x), 37))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(37, 37),
            mode="nearest").numpy().transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(got, want)


class TestSwinShiftStatic:
    def test_window_sized_input_still_shifts(self):
        """The reference decides shift from the init img_size, so a runtime
        8x8 input through an img_size-64 model still rolls+masks; the old
        runtime rule silently disabled the shift."""
        from srbh_tpu.models.swinir import SwinTransformerBlock

        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 8, 8, 16)), jnp.float32)
        static = SwinTransformerBlock(16, 4, 8, shift_size=4, static_size=64)
        runtime = SwinTransformerBlock(16, 4, 8, shift_size=4)
        v = static.init(jax.random.PRNGKey(0), x)
        out_s = static.apply(v, x)
        out_r = runtime.apply(v, x)  # identical params, runtime rule
        assert not np.allclose(np.asarray(out_s), np.asarray(out_r)), \
            "static shift decision had no effect on a window-sized input"

    def test_large_input_unchanged(self):
        from srbh_tpu.models.swinir import SwinTransformerBlock

        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 16, 16, 16)), jnp.float32)
        static = SwinTransformerBlock(16, 4, 8, shift_size=4, static_size=64)
        runtime = SwinTransformerBlock(16, 4, 8, shift_size=4)
        v = static.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(static.apply(v, x)),
                                   np.asarray(runtime.apply(v, x)), atol=1e-6)


class TestFishgridStatsPreservesColumns:
    def test_existing_dbf_columns_survive(self, tmp_path):
        from srbh_tpu.data.grid import fishgrid_stats
        from srbh_tpu.data.shapefile import (ShapeRecord, read_shapefile,
                                             write_shapefile)

        tif = str(tmp_path / "mask.tif")
        write_tiff(tif, np.ones((128, 128), np.uint8),
                   (0.0, 1.0, 0.0, 128.0, 0.0, -1.0))
        shp = str(tmp_path / "grid.shp")
        recs = [ShapeRecord((0.0, 64.0, 64.0, 128.0),
                            attributes={"diou": 0.5, "isv4": 1}),
                ShapeRecord((64.0, 0.0, 128.0, 64.0),
                            attributes={"diou": 0.25, "isv4": 0})]
        write_shapefile(shp, recs, [("diou", "N", 19, 6),
                                    ("isv4", "N", 19, 0)])
        fishgrid_stats(tif, shp)
        back = read_shapefile(shp)
        assert back[0].attributes["diou"] == pytest.approx(0.5)
        assert back[1].attributes["isv4"] == 0
        assert back[0].attributes["isv"] == 1  # new fields added too
        assert back[0].attributes["sum"] == 64 * 64


class TestFishgridPrj:
    def test_grid_inherits_raster_crs(self, tmp_path):
        from srbh_tpu.data.crs import TransverseMercator, from_wkt, \
            geokeys_for_epsg
        from srbh_tpu.data.grid import write_fishgrid

        tif = str(tmp_path / "city_s2.tif")
        write_tiff(tif, np.ones((128, 128), np.uint8),
                   (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0),
                   geo_keys=geokeys_for_epsg(32633))
        out = write_fishgrid(tif, window_size=64, offset=56)
        prj = out[:-4] + ".prj"
        assert os.path.exists(prj)
        assert isinstance(from_wkt(open(prj).read()), TransverseMercator)


class TestHeightHistogramRecursive:
    def test_finds_tiles_in_subdirs(self, tmp_path):
        from srbh_tpu.data.stats import height_histogram

        sub = tmp_path / "tiles" / "cityA"
        os.makedirs(sub)
        write_tiff(str(sub / "t.tif"),
                   np.full((32, 32), 7, np.uint8),
                   (0.0, 2.5, 0.0, 80.0, 0.0, -2.5))
        hist = height_histogram(str(tmp_path / "tiles"), str(tmp_path),
                                "bh_test", plot=False)
        assert hist[7] == 32 * 32

    def test_empty_dir_raises(self, tmp_path):
        from srbh_tpu.data.stats import height_histogram

        os.makedirs(tmp_path / "none")
        with pytest.raises(FileNotFoundError):
            height_histogram(str(tmp_path / "none"), str(tmp_path), "x",
                             plot=False)


class TestHarnessCheckpointGuard:
    def test_missing_model_path_errors_clearly(self, tmp_path):
        from srbh_tpu.tools import swinir_harness

        with pytest.raises(SystemExit):
            swinir_harness.main(["--task", "color_dn",
                                 "--model_path", str(tmp_path / "nope"),
                                 "--folder_gt", str(tmp_path)])
