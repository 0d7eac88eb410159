"""Regression tests for the round-1 code-review findings (loader hangs,
single-column datalists, non-aggre training, EMA preference, CLI argv)."""
import os
import sys
import threading
import time

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.data.pipeline import DataLoader


class _ListDataset:
    def __init__(self, n, fail_at=None, slow=False):
        self.n, self.fail_at, self.slow = n, fail_at, slow

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError(f"boom at {i}")
        if self.slow:
            time.sleep(0.01)
        return {"x": np.full((2, 2), i, np.float32)}


class TestLoaderRobustness:
    def test_worker_exception_surfaces_instead_of_hanging(self):
        loader = DataLoader(_ListDataset(8, fail_at=5), batch_size=4,
                            num_workers=2)
        with pytest.raises(RuntimeError, match="boom at 5"):
            for _ in loader:
                pass

    def test_early_break_does_not_strand_producer(self):
        loader = DataLoader(_ListDataset(64, slow=True), batch_size=4,
                            num_workers=2, prefetch=1)
        before = threading.active_count()
        for _ in range(3):
            it = iter(loader)
            next(it)
            it.close()  # triggers the generator's finally -> stop.set()
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before + 1  # producers exited

    def test_shards_are_equal_length(self):
        ds = _ListDataset(101)
        a = DataLoader(ds, batch_size=10, shard_index=0, num_shards=2)
        b = DataLoader(ds, batch_size=10, shard_index=1, num_shards=2)
        assert len(a._indices()) == len(b._indices()) == 50
        assert len(a) == len(b)


class TestSingleColumnDatalist:
    def test_s12_dataset_single_column_csv(self, tmp_path):
        from srbh_tpu.data.dataset import S12GlobeDataset
        from srbh_tpu.data.tiff import write_tiff

        rng = np.random.default_rng(0)
        for d in ("s1c", "s2c", "bhc"):
            os.makedirs(tmp_path / d)
        write_tiff(str(tmp_path / "s2c" / "a.tif"),
                   rng.integers(0, 5000, (32, 32, 6)).astype(np.uint16))
        write_tiff(str(tmp_path / "s1c" / "a.tif"),
                   rng.uniform(-25, 5, (32, 32, 2)).astype(np.float32))
        write_tiff(str(tmp_path / "bhc" / "a.tif"),
                   rng.integers(0, 100, (128, 128)).astype(np.uint8))
        stats = tmp_path / "stats"
        os.makedirs(stats)
        np.savetxt(stats / "s2c_minmax.txt",
                   np.stack([np.zeros(6), np.full(6, 5000.0)]))
        np.savetxt(stats / "s1c_minmax.txt",
                   np.stack([np.full(2, -25.0), np.full(2, 5.0)]))
        # single-column list: the dirs come from the constructor args
        pd.DataFrame({0: ["a.tif"]}).to_csv(tmp_path / "dl.csv",
                                            header=False, index=False)
        ds = S12GlobeDataset(
            datalist=str(tmp_path / "dl.csv"), rootname=str(tmp_path),
            s1dir="s1c", s2dir="s2c", heightdir="bhc",
            datastats=str(stats))
        s = ds[0]
        assert s["image"].shape == (32, 32, 8)


class TestNonAggreTrainStep:
    def test_isaggre_false_trains(self):
        from srbh_tpu import models
        from srbh_tpu.train.state import TrainState
        from srbh_tpu.train.steps import make_train_step

        sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8,
                            dtype=jnp.float32)
        model = models.SRRegressClsFeature(
            encoder_name="efficientnet-test", super_mid=8, isaggre=False,
            chans_build=7, dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 32, 32, 8))
        sr_params = jax.jit(sr.init)(rng, x[..., :3])
        variables = jax.jit(model.init)(rng, x, jnp.zeros((2, 128, 128, 8)))
        state = TrainState.create(variables, n_log_vars=2, lr=1e-3)
        step = make_train_step(model, sr, isaggre=False)
        npr = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(npr.uniform(0, 1, (2, 32, 32, 8)),
                                 jnp.float32),
            "height": jnp.asarray(npr.uniform(0, 50, (2, 128, 128)),
                                  jnp.float32),
            "build": jnp.asarray(npr.integers(0, 7, (2, 128, 128))),
        }
        state, metrics = step(state, sr_params, batch, jnp.asarray(1e-3))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1


class TestTrainerWiring:
    def test_load_sr_params_prefers_ema(self, tmp_path):
        from srbh_tpu.train.checkpoint import _ckptr
        from srbh_tpu.train.config import TrainConfig
        from srbh_tpu.train.trainer import load_sr_params

        raw = {"params": {"w": np.ones((2,), np.float32)}}
        ema = {"params": {"w": np.full((2,), 7.0, np.float32)}}
        _ckptr().save(str(tmp_path / "sr"),
                      {"params": raw, "params_ema": ema})
        cfg = TrainConfig(logdirhr=str(tmp_path / "sr"))
        loaded, ok = load_sr_params(cfg, None)
        assert ok
        np.testing.assert_array_equal(
            np.asarray(loaded["params"]["w"]), ema["params"]["w"])

    def test_get_args_reads_sys_argv(self, monkeypatch):
        from srbh_tpu.train.config import get_args

        monkeypatch.setattr(sys, "argv", ["prog", "--maxepoch", "5"])
        cfg = get_args("globe")
        assert cfg.maxepoch == 5


class TestThirdPassFixes:
    def test_strip_window_clamps_at_edges(self, tmp_path):
        from srbh_tpu.data.tiff import TiffReader, write_tiff

        a = (np.arange(77 * 40) % 251).reshape(40, 77).astype(np.uint8)
        p = str(tmp_path / "s.tif")
        write_tiff(p, a, rows_per_strip=16)  # strip layout
        r = TiffReader(p)
        out = r.read((70, 0, 20, 10))[..., 0]
        np.testing.assert_array_equal(out[:, :7], a[:10, 70:])
        assert (out[:, 7:] == 0).all()  # zero fill past the right edge
        out = r.read((0, 35, 10, 10))[..., 0]
        np.testing.assert_array_equal(out[:5], a[35:, :10])
        assert (out[5:] == 0).all()  # zero fill past the bottom

    def test_confusion_masks_out_of_range_labels(self):
        from srbh_tpu.metrics.streaming import SegmentationMetric

        m = SegmentationMetric(3)
        m.add_batch(np.array([0, 1, 2, 0]), np.array([0, 1, -1, 3]))
        assert m.cm.dtype == np.float64
        assert m.cm.sum() == 2  # the -1 and 3 labels are dropped
        assert m.cm[0, 0] == 1 and m.cm[1, 1] == 1

    def test_height_metric_float64_totals(self):
        from srbh_tpu.metrics.streaming import HeightMetric

        m = HeightMetric(2)
        pred = np.full((1, 8, 8), 3.0, np.float32)
        ref = np.full((1, 8, 8), 1.0, np.float32)
        cls = np.zeros((1, 8, 8), np.int32)
        for _ in range(3):
            m.add_batch(pred, ref, cls)
        assert m.counts.dtype == np.float64
        assert m.counts[0, 0] == 3 * 64
        # rmse/mae/me all exactly 2.0 for the constant offset
        np.testing.assert_allclose(m.avg_each()[0], [2.0, 2.0, 2.0],
                                   atol=1e-6)

    def test_grid_shuffle_odd_size_keeps_border(self):
        from srbh_tpu.data.augment import grid_shuffle_2x2

        rng = np.random.default_rng(0)
        img = rng.random((65, 65, 3)).astype(np.float32)
        mask = rng.random((65, 65)).astype(np.float32)
        img2, mask2 = grid_shuffle_2x2(rng, img, mask)
        # the odd last row/col are outside the 2x2 cells: must carry input
        np.testing.assert_array_equal(img2[64], img[64])
        np.testing.assert_array_equal(img2[:, 64], img[:, 64])
        np.testing.assert_array_equal(mask2[64], mask[64])

    def test_addabspath_idempotent(self, tmp_path):
        from srbh_tpu.data.datalist import addabspath

        f = tmp_path / "datalist_china.csv"
        pd.DataFrame({0: ["a.tif", "b.tif"]}).to_csv(f, header=False,
                                                     index=False)
        addabspath(str(tmp_path), "china", flist=[f])
        n1 = len(pd.read_csv(f, header=None).columns)
        addabspath(str(tmp_path), "china", flist=[f])
        n2 = len(pd.read_csv(f, header=None).columns)
        assert n1 == n2 == 7
