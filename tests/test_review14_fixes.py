"""Regression tests for the fourteenth adversarial-review findings."""
import os

import numpy as np
import pytest


class TestPredictorAtomicArtifacts:
    """A kill during the city raster writes must never leave a truncated
    file at the final path — predict_city's resume check keys on existence
    and would skip (i.e. ship) the corrupt city forever."""

    class _FakeDataset:
        width, height = 32, 24
        geotrans = (0.0, 10.0, 0.0, 240.0, 0.0, -10.0)

        def __init__(self, tmp_path):
            from srbh_tpu.data.tiff import write_tiff

            self.s2path = str(tmp_path / "src.tif")
            write_tiff(self.s2path,
                       np.zeros((self.height, self.width), np.uint8),
                       geotransform=self.geotrans)

        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"image": np.zeros((8, 8, 8), np.float32),
                    "pos": np.array([8 * i, 0, 8, 8], np.int32)}

    @staticmethod
    def _fake_step(variables, sr_params, images):
        import jax.numpy as jnp

        n = images.shape[0]
        return (jnp.zeros((n, 32, 32), jnp.float32),
                jnp.zeros((n, 32, 32, 7), jnp.float32))

    def test_crash_during_write_leaves_no_final_artifact(self, tmp_path,
                                                         monkeypatch):
        from srbh_tpu.predict import predictor

        ds = self._FakeDataset(tmp_path)
        respath = str(tmp_path / "out")
        os.makedirs(respath)

        real = predictor.array2raster

        def dying(path, *a, **kw):
            # simulate a kill mid-height-write: partial bytes at the path
            with open(path, "wb") as f:
                f.write(b"II*\x00trunc")
            raise RuntimeError("killed")

        monkeypatch.setattr(predictor, "array2raster", dying)
        with pytest.raises(RuntimeError):
            predictor.predict_city(ds, self._fake_step, None, None,
                                   respath, "demo", batch_size=2)
        # neither final artifact may exist -> the resume check re-runs
        assert not os.path.exists(os.path.join(respath, "demo_build.tif"))
        assert not os.path.exists(os.path.join(respath, "demo_height.tif"))

        monkeypatch.setattr(predictor, "array2raster", real)
        b, h = predictor.predict_city(ds, self._fake_step, None, None,
                                      respath, "demo", batch_size=2)
        assert os.path.exists(b) and os.path.exists(h)
        # and no stray .tmp left behind
        assert not os.path.exists(b + ".tmp")
        assert not os.path.exists(h + ".tmp")


class TestCheckpointDoubleCrash:
    """In the crash-recovery state (live dir absent, .old present) a second
    crash before the final rename must still leave .old loadable — the old
    code rmtree'd .old first, opening a window with NO checkpoint."""

    def test_old_survives_crash_before_final_rename(self, tmp_path):
        from srbh_tpu.train.checkpoint import commit_payload, load_checkpoint

        path = str(tmp_path / "checkpoint")
        commit_payload(path, {"v": np.arange(3)})
        # enter the crash-recovery state: path absent, .old live
        os.replace(path, path + ".old")
        assert load_checkpoint(path)["v"].tolist() == [0, 1, 2]

        real_replace = os.replace

        def crash_on_final(src, dst):
            if os.path.abspath(dst) == os.path.abspath(path):
                raise RuntimeError("killed before rename")
            return real_replace(src, dst)

        os.replace = crash_on_final
        try:
            with pytest.raises(RuntimeError):
                commit_payload(path, {"v": np.arange(5)})
        finally:
            os.replace = real_replace
        # .old must have survived the failed commit
        got = load_checkpoint(path)
        assert got is not None and got["v"].tolist() == [0, 1, 2]
        # and a healthy commit afterwards converges to the new payload
        commit_payload(path, {"v": np.arange(5)})
        assert load_checkpoint(path)["v"].tolist() == [0, 1, 2, 3, 4]
        assert not os.path.exists(path + ".old")


class TestDbfTypeInference:
    def test_mixed_str_float_column_becomes_text(self, tmp_path):
        """str > float > int priority over ALL records: [1.5, 'n/a'] must
        produce a C column (the old first-typed-wins inference declared N
        from record 0 and write_shapefile crashed on float('n/a'))."""
        from srbh_tpu.data.shapefile import (ShapeRecord, read_shapefile,
                                             update_dbf_fields,
                                             write_shapefile)

        path = str(tmp_path / "g.shp")
        recs = [ShapeRecord((0.0, 0.0, 1.0, 1.0)),
                ShapeRecord((1.0, 0.0, 2.0, 1.0))]
        write_shapefile(path, recs)
        loaded = read_shapefile(path)
        loaded[0].attributes["mix"] = 1.5
        loaded[1].attributes["mix"] = "n/a"
        update_dbf_fields(path, [("isv", "N", 19, 0)], [[1, 0]],
                          records=loaded)
        back = read_shapefile(path)
        assert [r.attributes["isv"] for r in back] == [1, 0]
        vals = [r.attributes["mix"] for r in back]
        assert all(isinstance(v, str) for v in vals)
        assert vals[1] == "n/a" and "1.5" in vals[0]

    def test_none_then_float_stays_numeric(self, tmp_path):
        from srbh_tpu.data.shapefile import (ShapeRecord, read_shapefile,
                                             update_dbf_fields,
                                             write_shapefile)

        path = str(tmp_path / "g.shp")
        recs = [ShapeRecord((0.0, 0.0, 1.0, 1.0)),
                ShapeRecord((1.0, 0.0, 2.0, 1.0))]
        write_shapefile(path, recs)
        loaded = read_shapefile(path)
        loaded[0].attributes["h"] = None
        loaded[1].attributes["h"] = 2.25
        update_dbf_fields(path, [("isv", "N", 19, 0)], [[1, 1]],
                          records=loaded)
        back = read_shapefile(path)
        assert back[1].attributes["h"] == pytest.approx(2.25)

    def test_records_param_skips_reparse(self, tmp_path, monkeypatch):
        """update_dbf_fields(records=...) must not re-read the shapefile
        (fishgrid_stats was parsing every grid twice)."""
        from srbh_tpu.data import shapefile as shp

        path = str(tmp_path / "g.shp")
        recs = [shp.ShapeRecord((0.0, 0.0, 1.0, 1.0))]
        shp.write_shapefile(path, recs)
        loaded = shp.read_shapefile(path)

        def boom(*a, **kw):
            raise AssertionError("re-parse happened")

        monkeypatch.setattr(shp, "read_shapefile", boom)
        shp.update_dbf_fields(path, [("isv", "N", 19, 0)], [[1]],
                              records=loaded)


class TestNpzSeparatorMarker:
    def test_flat_tree_with_slash_leaf_roundtrips(self, tmp_path):
        """A NEW-format npz of a depth-1 tree whose leaf name contains '/'
        has no \\x1f in any key; without the marker the loader fell back to
        '/' splitting and re-nested it."""
        from srbh_tpu.train.convert import load_tree_npz, save_tree_npz

        tree = {"conv1/kernel/sigma": np.float32(0.5)}
        path = str(tmp_path / "flat.npz")
        save_tree_npz(path, tree)
        back = load_tree_npz(path)
        assert set(back) == {"conv1/kernel/sigma"}
        assert back["conv1/kernel/sigma"] == pytest.approx(0.5)

    def test_legacy_slash_files_still_load(self, tmp_path):
        from srbh_tpu.train.convert import load_tree_npz

        path = str(tmp_path / "legacy.npz")
        np.savez(path, **{"a/b": np.arange(2), "a/c": np.arange(3)})
        back = load_tree_npz(path)
        assert back["a"]["b"].tolist() == [0, 1]
        assert back["a"]["c"].tolist() == [0, 1, 2]


class TestLoaderPrefetchValidation:
    def test_prefetch_zero_rejected(self):
        """queue.Queue(maxsize=0) is UNBOUNDED — 'no prefetch' would mean
        'prefetch the whole epoch'."""
        from srbh_tpu.data.pipeline import DataLoader

        with pytest.raises(ValueError, match="prefetch"):
            DataLoader([{"x": np.zeros(2)}], prefetch=0)


class TestGridReaderHygiene:
    def test_fishgrid_stats_single_parse_and_close(self, tmp_path,
                                                   monkeypatch):
        from srbh_tpu.data import grid
        from srbh_tpu.data.tiff import write_tiff

        tif = str(tmp_path / "m.tif")
        write_tiff(tif, np.full((64, 64), 255, np.uint8),
                   geotransform=(0.0, 1.0, 0.0, 64.0, 0.0, -1.0))
        shp = grid.write_fishgrid(tif, 32, 32)

        calls = {"read": 0, "closed": 0}
        real_read = grid.read_shapefile
        real_reader = grid.TiffReader

        def counting_read(path):
            calls["read"] += 1
            return real_read(path)

        class CountingReader(real_reader):
            def close(self):
                calls["closed"] += 1
                return super().close()

        monkeypatch.setattr(grid, "read_shapefile", counting_read)
        monkeypatch.setattr(grid, "TiffReader", CountingReader)
        recs = grid.fishgrid_stats(tif, shp, condition=(0, 20, 1024))
        assert calls["read"] == 1, "grid shapefile parsed more than once"
        # >= 1: an explicit close happened (GC/__del__ may add another)
        assert calls["closed"] >= 1, "mask TiffReader left open"
        assert all(r.attributes["isv"] == 1 for r in recs)
