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
