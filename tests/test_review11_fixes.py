"""Regression tests for the eleventh adversarial-review findings."""
import os

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from srbh_tpu.data.tiff import write_tiff


@pytest.fixture()
def pair_root(tmp_path):
    rng = np.random.default_rng(3)
    names = [f"p_{i}.tif" for i in range(8)]
    os.makedirs(tmp_path / "s2p")
    os.makedirs(tmp_path / "gep")
    gt = (0.0, 10.0, 0.0, 100.0, 0.0, -10.0)
    for n in names:
        write_tiff(str(tmp_path / "s2p" / n),
                   rng.integers(0, 3000, (16, 16, 3)).astype(np.uint16), gt)
        write_tiff(str(tmp_path / "gep" / n),
                   rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
                   (0.0, 2.5, 0.0, 100.0, 0.0, -2.5))
    pd.DataFrame({0: names}).to_csv(tmp_path / "list.csv", header=False,
                                    index=False)
    os.makedirs(tmp_path / "stats")
    np.savetxt(tmp_path / "stats" / "s2p_minmax.txt",
               np.stack([np.zeros(3), np.full(3, 3000.0)]))
    return tmp_path


class TestLRHRAugParity:
    def test_fused_aug_matches_reference_recipe(self):
        """augment_lrhr_pair must equal the reference's literal recipe
        (BH_loader.py:729-736): x4-nearest-up LR ++ HR, joint
        Flip/GridShuffle/Rotate (INTER_LINEAR for BOTH halves), LR
        nearest-subsampled back."""
        import cv2

        from srbh_tpu.data.augment import _warp, augment_lrhr_pair, \
            _grid_shuffle_apply

        base = np.random.default_rng(5)
        lr = base.uniform(0, 3000, (16, 16, 3)).astype(np.float32)
        hr = base.uniform(0, 255, (64, 64, 3)).astype(np.float32)

        for seed in range(12):  # covers all 8 fire combinations
            rng_f = np.random.default_rng(seed)
            lr_f, hr_f = augment_lrhr_pair(rng_f, lr.copy(), hr.copy())

            rng_l = np.random.default_rng(seed)
            up = np.repeat(np.repeat(lr, 4, axis=0), 4, axis=1)
            img = np.concatenate([up, hr], axis=-1)
            if rng_l.random() < 0.5:
                d = int(rng_l.integers(-1, 2))
                img = cv2.flip(img, d)
            if rng_l.random() < 0.5:
                img = _grid_shuffle_apply(img, rng_l.permutation(4))
            if rng_l.random() < 0.5:
                angle = float(rng_l.uniform(-90.0, 90.0))
                h, w = img.shape[:2]
                mat = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5),
                                              angle, 1.0)
                # warp each half in its own cv2 call, like the fused path:
                # cv2's fixed-point bilinear tables differ slightly across
                # channel groupings (measured ~1.8% of value range), so a
                # joint 6-channel warp is not bit-comparable — the
                # augmentation contract is distributional (SURVEY.md §7.1)
                img = np.concatenate(
                    [_warp(img[..., :3], mat, cv2.INTER_LINEAR),
                     _warp(img[..., 3:], mat, cv2.INTER_LINEAR)], axis=-1)
            np.testing.assert_allclose(lr_f, img[::4, ::4, :3], atol=2e-3,
                                       err_msg=f"LR seed {seed}")
            np.testing.assert_allclose(hr_f, img[..., 3:], atol=2e-3,
                                       err_msg=f"HR seed {seed}")

    def test_aug_produces_rotations_and_shuffles(self, pair_root):
        """The old path only ever flipped: rotated samples (non-grid pixel
        mixtures) must now occur."""
        from srbh_tpu.data.dataset import LRHRPairDataset

        ds = LRHRPairDataset(str(pair_root / "list.csv"), str(pair_root),
                             str(pair_root / "stats"), s2dir="s2p",
                             gedir="gep", aug=True)
        ds_plain = LRHRPairDataset(str(pair_root / "list.csv"),
                                   str(pair_root), str(pair_root / "stats"),
                                   s2dir="s2p", gedir="gep", aug=False)
        interpolated = False
        for ep in range(4):
            ds.set_epoch(ep)
            for i in range(len(ds)):
                gt_aug = ds[i]["gt"]
                raw = set(np.round(ds_plain[i]["gt"].reshape(-1), 5))
                vals = set(np.round(gt_aug.reshape(-1), 5))
                if len(vals - raw) > 100:  # many new values => interpolation
                    interpolated = True
        assert interpolated, "rotation branch never fired in 32 samples"


class TestLRHRNormalisation:
    def test_hr_uses_ge_stats_table(self, pair_root):
        from srbh_tpu.data.dataset import LRHRPairDataset

        np.savetxt(pair_root / "stats" / "gep_minmax.txt",
                   np.stack([np.full(3, 10.0), np.full(3, 210.0)]))
        ds = LRHRPairDataset(str(pair_root / "list.csv"), str(pair_root),
                             str(pair_root / "stats"), s2dir="s2p",
                             gedir="gep")
        from srbh_tpu.data.tiff import read_tiff

        raw = read_tiff(str(pair_root / "gep" / "p_0.tif"))[..., :3]
        want = (raw.astype(np.float32) - 10.0) / 200.0  # minmax: max-min
        np.testing.assert_allclose(ds[0]["gt"], want, atol=1e-6)

    def test_hr_fallback_is_255(self, pair_root):
        from srbh_tpu.data.dataset import LRHRPairDataset
        from srbh_tpu.data.tiff import read_tiff

        ds = LRHRPairDataset(str(pair_root / "list.csv"), str(pair_root),
                             str(pair_root / "stats"), s2dir="s2p",
                             gedir="gep")
        raw = read_tiff(str(pair_root / "gep" / "p_0.tif"))[..., :3]
        np.testing.assert_allclose(ds[0]["gt"],
                                   raw.astype(np.float32) / 255.0, atol=1e-6)

    def test_num_sample_is_seeded_random_subset(self, pair_root):
        """BH_loader.py:703-704: .sample(n, random_state=0), not [:n]."""
        from srbh_tpu.data.dataset import LRHRPairDataset

        ds = LRHRPairDataset(str(pair_root / "list.csv"), str(pair_root),
                             str(pair_root / "stats"), s2dir="s2p",
                             gedir="gep", num_sample=4)
        want = pd.read_csv(pair_root / "list.csv", header=None).sample(
            n=4, random_state=0)[0].tolist()
        assert [r[0] for r in ds._rows] == want


class TestMissingStatsFailLoudly:
    def test_s12_missing_s2_table_raises(self, tmp_path):
        from srbh_tpu.data.dataset import S12GlobeDataset

        rng = np.random.default_rng(0)
        for d in ("s2c", "s1c", "bhc"):
            os.makedirs(tmp_path / d)
        gt = (0.0, 10.0, 0.0, 100.0, 0.0, -10.0)
        write_tiff(str(tmp_path / "s2c" / "a.tif"),
                   rng.integers(0, 5000, (32, 32, 6)).astype(np.uint16), gt)
        write_tiff(str(tmp_path / "s1c" / "a.tif"),
                   rng.uniform(-25, 5, (32, 32, 2)).astype(np.float32), gt)
        write_tiff(str(tmp_path / "bhc" / "a.tif"),
                   rng.integers(0, 90, (128, 128)).astype(np.uint8), gt)
        pd.DataFrame({0: ["a.tif"], 1: "s1c", 2: "s2c", 3: "bhc"}).to_csv(
            tmp_path / "dl.csv", header=False, index=False)
        ds = S12GlobeDataset(str(tmp_path / "dl.csv"), str(tmp_path),
                             datastats=str(tmp_path), ishir=True)
        with pytest.raises(FileNotFoundError, match="S2 stats"):
            ds[0]


class TestCheckpointCrashSafety:
    def _payload(self, v):
        return {"params": {"w": np.full((2,), v, np.float32)},
                "batch_stats": {}, "log_vars": np.zeros(3),
                "step": 1, "epoch": 1, "best_rmse": 1.0}

    def test_old_fallback_covers_swap_window(self, tmp_path, monkeypatch):
        from srbh_tpu.train import checkpoint as ck

        path = str(tmp_path / "checkpoint")
        ck.commit_payload(path, self._payload(1.0))

        real_replace = os.replace
        calls = {"n": 0}

        def crashing_replace(src, dst):
            # key on the destination: orbax's internal saves also call
            # os.replace. The patch is active only for commit 2, so the
            # first rename INTO the live dir is its tmp->path — crash
            # there, after the old dir was parked.
            if os.path.abspath(dst) == os.path.abspath(path):
                calls["n"] += 1
                raise OSError("simulated crash mid-swap")
            return real_replace(src, dst)

        monkeypatch.setattr(ck.os, "replace", crashing_replace)
        with pytest.raises(OSError):
            ck.commit_payload(path, self._payload(2.0))
        monkeypatch.undo()
        # live dir is gone but .old still holds the previous checkpoint
        got = ck.load_checkpoint(path)
        assert got is not None
        np.testing.assert_allclose(got["params"]["w"], 1.0)

    def test_async_save_errors_propagate(self, tmp_path, monkeypatch):
        from srbh_tpu.train import checkpoint as ck

        class _State:
            params = {"w": np.zeros(2, np.float32)}
            batch_stats = {}
            log_vars = np.zeros(3)
            step = 1

        monkeypatch.setattr(
            ck, "commit_payload",
            lambda *a, **k: (_ for _ in ()).throw(OSError("disk full")))
        ck.save_checkpoint(str(tmp_path), _State(), 1, 1.0, async_save=True)
        with pytest.raises(RuntimeError, match="async checkpoint"):
            ck.wait_for_saves()


class TestPredictorResume:
    def test_completed_city_skips_before_inputs(self, tmp_path):
        """predict_cities must skip a finished city WITHOUT opening its
        rasters/grids (they may be archived), and only when BOTH artifacts
        exist."""
        from srbh_tpu.predict.predictor import predict_cities

        res = tmp_path / "res"
        os.makedirs(res)
        (res / "cityA_build.tif").write_bytes(b"x")
        (res / "cityA_height.tif").write_bytes(b"x")
        # wholeimgpath contains NO inputs: any dataset construction raises
        out = predict_cities(str(tmp_path / "empty"), ["cityA"],
                             model=None, sr_model=None, variables=None,
                             sr_params=None, datastats=str(tmp_path),
                             respath=str(res))
        assert out == [(str(res / "cityA_build.tif"),
                        str(res / "cityA_height.tif"))]

    def test_half_written_city_not_skipped(self, tmp_path):
        """A crash between the build and height writes must re-run the
        city (the reference skips on build alone and loses the height tif
        forever)."""
        from srbh_tpu.predict.predictor import predict_cities

        res = tmp_path / "res"
        os.makedirs(res)
        (res / "cityA_build.tif").write_bytes(b"x")  # height missing
        with pytest.raises(Exception):  # falls through to the (absent) data
            predict_cities(str(tmp_path / "empty"), ["cityA"],
                           model=None, sr_model=None, variables=None,
                           sr_params=None, datastats=str(tmp_path),
                           respath=str(res))


class TestLoaderEpochResume:
    def test_preset_epoch_is_consumed(self):
        from srbh_tpu.data.pipeline import DataLoader

        class _DS:
            def __init__(self):
                self.epochs = []

            def set_epoch(self, e):
                self.epochs.append(e)

            def __len__(self):
                return 2

            def __getitem__(self, i):
                return {"x": np.zeros(1, np.float32)}

        ds = _DS()
        loader = DataLoader(ds, batch_size=1, num_workers=1)
        loader.epoch = 15  # what trainer.main sets after resume
        for _ in loader:
            pass
        assert ds.epochs[0] == 15
