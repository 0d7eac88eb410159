"""Regression tests for the sixteenth (round-3) review findings:
device_norm trainer crash (covered in test_e2e_train), ishir=False
device_aug targets, epsg_of datum-shift mislabel, long-range bilateral
truncation, UTM-name-fallback dropping TOWGS84, device_norm missing-stats
guard, manifest shell quoting."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.data import crs


class TestDeviceAugIshirFalse:
    def test_binary_targets_match_host_semantics(self):
        """ishir=False must build the binary (height>0) mask + unit
        weights (dataset._finish_sample), not hierarchy classes."""
        from srbh_tpu.train.state import TrainState
        from srbh_tpu.train.steps import make_train_step
        from test_train import tiny_setup, tiny_batch

        model, sr, state, sr_params = tiny_setup()
        step = make_train_step(model, sr, isaggre=False, device_aug=True,
                               ishir=False, seed=0)
        b = tiny_batch()
        raw = {"image": jnp.asarray(b["image"]),
               "height": jnp.asarray(b["height"])}
        state, m = step(state, sr_params, raw, jnp.asarray(1e-3))
        assert np.isfinite(float(m["loss"]))
        assert np.asarray(m["log_vars"]).shape == (3,)  # state n_log_vars

    def test_isaggre_without_ishir_raises(self):
        from srbh_tpu.train.steps import make_train_step

        with pytest.raises(ValueError, match="ishir"):
            make_train_step(object(), object(), isaggre=True,
                            device_aug=True, ishir=False)


class TestEpsgOfDatumShift:
    def test_shifted_datum_never_gets_epsg_stamp(self):
        wkt = ('GEOGCS["x",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
               '298.257223563],TOWGS84[1,2,3,0,0,0,0]],PRIMEM["Greenwich",'
               '0],UNIT["degree",0.0174532925199433]]')
        assert crs.epsg_of(crs.from_wkt(wkt)) is None
        # zero TOWGS84 still resolves
        wkt0 = wkt.replace("TOWGS84[1,2,3", "TOWGS84[0,0,0")
        assert crs.epsg_of(crs.from_wkt(wkt0)) == 4326

    def test_utm_name_fallback_carries_towgs84(self):
        """A PROJECTION-less WKT resolved by its 'UTM zone NN' name must
        keep the parsed TOWGS84 (it previously returned towgs84=None and
        silently skipped the ~170 m Helmert shift)."""
        wkt = ('PROJCS["Pulkovo 1942 / UTM zone 50N",GEOGCS["Pulkovo 1942",'
               'DATUM["Pulkovo_1942",SPHEROID["Krassowsky 1940",6378245,'
               '298.3],TOWGS84[23.92,-141.27,-80.9,0,0.35,0.82,-0.12]],'
               'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
               'UNIT["metre",1]]')
        p = crs.from_wkt(wkt)
        assert isinstance(p, crs.TransverseMercator)
        assert p.towgs84 is not None and p.towgs84[0] == 23.92
        # and the shift is actually applied in transform
        lon_s, lat_s = crs.transform(p, crs.Geographic(), 500000.0, 4427757.0)
        lon_n, lat_n = p.inverse(500000.0, 4427757.0)
        assert abs(lat_s - lat_n) * 111e3 + abs(lon_s - lon_n) * 85e3 > 30


class TestBilateralLongRange:
    def test_dilated_window_reaches_three_sigma(self):
        """sxy_b=80 (the reference's addPairwiseBilateral) must NOT
        degenerate to a 49-px local average: influence must reach far
        pixels via the dilated window."""
        from srbh_tpu.utils.cam import crf_refine

        h, w = 96, 96
        img = np.zeros((h, w, 3), np.float32)  # uniform colour everywhere
        prob = np.full((h, w, 2), 0.5, np.float32)
        # strong evidence ONLY in the left column block
        prob[:, :8, 0] = 0.95
        prob[:, :8, 1] = 0.05
        out = crf_refine(prob, img, iters=5, sxy=1.0, compat=0.0,
                         bilateral=(80.0, 13.0, 10.0))
        # with a true long-range kernel the far-right pixels (88 px away,
        # ~1.1 sigma) feel the left block's pull toward class 0
        assert out[:, -1, 0].mean() > 0.55, (
            f"no long-range influence: {out[:, -1, 0].mean()}")

    def test_stride_one_still_exact_vs_oracle(self):
        # the radius<=3sigma case stays windowed-EXACT (stride 1):
        # pinned by tests/test_crf.py::test_matches_dense_oracle
        from srbh_tpu.utils.cam import _bilateral_message

        rng = np.random.default_rng(0)
        q = rng.dirichlet(np.ones(2), (8, 8)).astype(np.float32)
        img = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
        a = _bilateral_message(q, img, 2.0, 30.0, radius=7, stride=1)
        b = _bilateral_message(q, img, 2.0, 30.0, radius=7)
        np.testing.assert_array_equal(a, b)


class TestDeviceNormGuards:
    def test_missing_stats_fails_loudly(self, tmp_path):
        import pandas as pd

        from srbh_tpu.data.dataset import S12GlobeDataset

        pd.DataFrame({0: ["t.tif"], 1: "s1c", 2: "s2c", 3: "bhc"}).to_csv(
            str(tmp_path / "dl.csv"), header=False, index=False)
        with pytest.raises(FileNotFoundError, match="stats tables"):
            S12GlobeDataset(str(tmp_path / "dl.csv"), str(tmp_path),
                            datastats=str(tmp_path), s1dir="s1c",
                            s2dir="s2c", heightdir="bhc", isaggre=True,
                            ishir=True, aug=False, device_aug=True,
                            device_norm=True)


class TestManifestQuoting:
    def test_paths_with_spaces_are_quoted(self, tmp_path):
        from srbh_tpu.data.shapefile import ShapeRecord, write_shapefile
        from srbh_tpu.tools.preprocess import build_sentinel12_manifest

        grid = str(tmp_path / "grid.shp")
        write_shapefile(grid, [ShapeRecord(
            (0, 30, 3, 33), {"ll_tile": "N30E000"})],
            [("ll_tile", "C", 16, 0)])
        query = str(tmp_path / "city.shp")
        write_shapefile(query, [ShapeRecord((1, 31, 2, 32), {})],
                        [("id", "N", 4, 0)])
        out = str(tmp_path / "my city")
        _, commands = build_sentinel12_manifest(
            query, grid, out, typelist=("landcover",))
        assert len(commands) == 1
        assert "'" in commands[0] and "my city" in commands[0]
        import shlex

        parts = shlex.split(commands[0])
        assert parts[-1] == "--no-sign-request"
        assert parts[-2].endswith("my city/landcover")
