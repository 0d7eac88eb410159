"""Data-layer tests on synthetic GeoTIFF tiles (SURVEY.md §4 golden-file plan)."""
import os

import numpy as np
import pandas as pd
import pytest

from srbh_tpu.data import stats as dstats
from srbh_tpu.data.dataset import S12GlobeDataset, _aggregate_numpy
from srbh_tpu.data.datalist import concat_allfile, generate_allfile, split_data
from srbh_tpu.data.pipeline import DataLoader
from srbh_tpu.data.tiff import write_tiff


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    """A miniature region: 6 tiles of S2 (6-band u16, 64x64), S1 (2-band f32),
    height (u8, 256x256), plus stats tables."""
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(0)
    names = [f"city_{i}.tif" for i in range(6)]
    for d in ("s2x", "s1x", "bhx"):
        os.makedirs(root / d)
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    for n in names:
        s2 = rng.integers(0, 5000, (64, 64, 6)).astype(np.uint16)
        s1 = rng.uniform(-25, 5, (64, 64, 2)).astype(np.float32)
        bh = rng.integers(0, 100, (256, 256)).astype(np.uint8)
        write_tiff(str(root / "s2x" / n), s2, geotransform=gt)
        write_tiff(str(root / "s1x" / n), s1, geotransform=gt)
        write_tiff(str(root / "bhx" / n), bh,
                   geotransform=(gt[0], 2.5, 0, gt[3], 0, -2.5))
    pd.DataFrame({0: names, 1: "s1x", 2: "s2x", 3: "bhx"}).to_csv(
        root / "datalist.csv", header=False, index=False)
    # stats tables via the stats module itself
    dstats.main_stats(str(root), "s2x", 6, str(root / "stats"))
    dstats.main_stats(str(root), "s1x", 2, str(root / "stats"))
    dstats.height_histogram(str(root / "bhx"), str(root / "stats"), "bh_stats")
    return root


class TestStats:
    def test_mean_std_merge_math(self):
        # two "images" with known stats: merged std must be the population std
        rng = np.random.default_rng(1)
        a, b = rng.normal(0, 1, 5000), rng.normal(3, 2, 5000)
        stats_b = np.zeros((2, 4))
        stats_b[0] = [a.min(), a.max(), a.mean(), a.std()]
        stats_b[1] = [b.min(), b.max(), b.mean(), b.std()]
        mean, std = dstats.cal_mean_std([stats_b])
        full = np.concatenate([a, b])
        assert abs(mean[0] - full.mean()) < 1e-6
        assert abs(std[0] - full.std()) < 1e-6

    def test_tables_written(self, synth_root):
        t = np.loadtxt(synth_root / "stats" / "s2x_minmax.txt")
        assert t.shape == (2, 6)
        hist = np.loadtxt(synth_root / "stats" / "bh_stats.txt")
        assert hist.shape == (256,) and hist.sum() == 6 * 256 * 256
        # reference writes a bar-chart jpg alongside the tables
        # (stats_dataset_globe.py:166-175)
        assert (synth_root / "stats" / "bh_stats_plot.jpg").exists()

    def test_merge_histograms_writes_csv_and_plot(self, synth_root, tmp_path):
        import shutil
        sp = tmp_path / "m"
        sp.mkdir()
        shutil.copy(synth_root / "stats" / "bh_stats.txt", sp / "a.txt")
        shutil.copy(synth_root / "stats" / "bh_stats.txt", sp / "b.txt")
        total = dstats.merge_height_histograms(["a", "b"], str(sp), "globe")
        assert total.sum() == 2 * 6 * 256 * 256
        df = pd.read_csv(sp / "globe.csv", index_col=0)
        assert list(df.columns) == ["height", "number", "rate"]
        assert (sp / "globe_plot.jpg").exists()


class TestDataset:
    def make(self, root, **kw):
        args = dict(datalist=str(root / "datalist.csv"), rootname=str(root),
                    datastats=str(root / "stats"), normmethod="minmax",
                    datarange=(0, 1), s1dir="s1x", s2dir="s2x", heightdir="bhx",
                    preweight=str(root / "stats" / "bh_stats.txt"),
                    isaggre=True, ishir=True, nchans=6)
        args.update(kw)
        return S12GlobeDataset(**args)

    def test_sample_shapes_and_ranges(self, synth_root):
        ds = self.make(synth_root)
        s = ds[0]
        assert s["image"].shape == (64, 64, 8)
        assert s["image"].min() >= 0.0 and s["image"].max() <= 1.0
        assert s["height"].shape == (256, 256)
        assert s["build"].shape == (256, 256) and s["build"].max() <= 6
        assert s["height_aggre"].shape == (64, 64)
        assert s["weight"].shape == (256, 256)
        assert s["weight_aggre"].shape == (64, 64)

    def test_no_aug_roundtrip_identity(self, synth_root):
        """x4-nearest-up then x0.25-down must be the identity on the image."""
        from srbh_tpu.data.tiff import read_tiff
        from srbh_tpu.ops.normalize import load_stats_table, norm_offsets

        ds = self.make(synth_root, aug=False)
        s = ds[0]
        name = ds.datalist.iloc[0, 0]
        s2 = read_tiff(str(synth_root / "s2x" / name))[..., :6].astype(np.float32)
        off, sc = norm_offsets(
            load_stats_table(str(synth_root / "stats" / "s2x_minmax.txt"), 6),
            "minmax")
        want = ((s2 - off) / sc).clip(0, 1)
        np.testing.assert_allclose(s["image"][..., :6], want, atol=1e-6)

    def test_aggregate_matches_jax_op(self, synth_root):
        import jax.numpy as jnp

        from srbh_tpu.ops import aggregate

        h = np.random.default_rng(3).integers(0, 90, (256, 256)).astype(np.float32)
        np.testing.assert_allclose(
            _aggregate_numpy(h), np.asarray(aggregate(jnp.asarray(h), 0.25)),
            rtol=1e-5)

    def test_hier_weight_follows_height_class(self, synth_root):
        ds = self.make(synth_root)
        s = ds[0]
        lut = ds.buildhir
        np.testing.assert_array_equal(
            s["build"], lut[s["height"].astype(np.int64)])
        np.testing.assert_allclose(
            s["weight"], ds.heightweight[s["build"]], rtol=1e-6)

    def test_fused_lowres_path_bit_identical_to_literal_recipe(self, synth_root):
        """The dataset's fused low-res pipeline must reproduce the literal
        reference recipe (BH_loader.py:354-369: x4 nearest up -> augment at
        256 px -> normalise -> [::4] down -> clip) bit-for-bit, rotation
        branch included."""
        import cv2

        from srbh_tpu.data.augment import augment_pair
        from srbh_tpu.data.tiff import read_tiff

        ds = self.make(synth_root, aug=True, seed=11)
        literal_rng = np.random.default_rng(11)
        rot_seen = False
        for i in range(8):
            idx = i % len(ds)
            # literal recipe, consuming an identical generator stream
            basename = ds._rows[idx][0]
            s2 = read_tiff(str(synth_root / "s2x" / basename))[..., :6]
            s1 = read_tiff(str(synth_root / "s1x" / basename))
            img = np.concatenate([s2, s1], axis=-1).astype(np.float32)
            height = read_tiff(str(synth_root / "bhx" / basename))[..., 0]
            state0 = literal_rng.bit_generator.state
            img = cv2.resize(img, (256, 256), interpolation=cv2.INTER_NEAREST)
            img, height = augment_pair(literal_rng, img, height)
            img[..., :6] = (img[..., :6] - ds.s2_off) / ds.s2_scale
            img[..., 6:] = (img[..., 6:] - ds.s1_off) / ds.s1_scale
            img = img[::4, ::4, :].clip(0, 1)
            # replay the same stream through the dataset's fused path
            # (inject via the per-sample RNG hook: the dataset derives a
            # fresh (seed, epoch, index) generator per call, so hand it the
            # literal recipe's stream state instead)
            replay = np.random.default_rng(11)
            replay.bit_generator.state = state0
            ds._sample_rng = lambda index: replay
            s = ds[idx]
            np.testing.assert_array_equal(s["image"], img)
            np.testing.assert_array_equal(s["height"], height.astype(np.float32))
            # track that at least one iteration exercised the rotate branch
            probe = np.random.default_rng(11)
            probe.bit_generator.state = state0
            if probe.random() < 0.5:
                probe.integers(-1, 2)
            if probe.random() < 0.5:
                probe.permutation(4)
            rot_seen = rot_seen or probe.random() < 0.5
        assert rot_seen

    def test_augmentation_changes_pixels_and_stays_joint(self, synth_root):
        ds = self.make(synth_root, aug=True, seed=7)
        ds2 = self.make(synth_root, aug=False)
        changed = 0
        for i in range(4):  # each sample has a 1/8 chance of no-op aug
            s1, s2 = ds[i], ds2[i]
            changed += not np.allclose(s1["image"], s2["image"])
            # build mask must be the LUT of the augmented height (jointness)
            np.testing.assert_array_equal(
                s1["build"],
                ds.buildhir[s1["height"].astype(np.int64).clip(0, 255)])
        assert changed >= 1

    def test_missing_height_gives_ones(self, synth_root, tmp_path):
        df = pd.read_csv(synth_root / "datalist.csv", header=None)
        df[3] = "nonexistent"
        lst = tmp_path / "dl.csv"
        df.to_csv(lst, header=False, index=False)
        ds = self.make(synth_root, datalist=str(lst), heightdir="nonexistent")
        s = ds[0]
        assert (s["height"] == 1).all()  # BH_loader.py:346


class TestDataLoader:
    def test_batching_and_shuffle(self, synth_root):
        ds = TestDataset().make(synth_root)
        dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=5)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0]["image"].shape == (4, 64, 64, 8)
        assert batches[1]["image"].shape == (2, 64, 64, 8)
        assert len(batches[0]["path"]) == 4
        # next epoch reshuffles
        order1 = [p for b in batches for p in b["path"]]
        order2 = [p for b in dl for p in b["path"]]
        assert sorted(order1) == sorted(order2)
        assert order1 != order2

    def test_sharded_loaders_partition(self, synth_root):
        ds = TestDataset().make(synth_root)
        a = DataLoader(ds, batch_size=3, shard_index=0, num_shards=2)
        b = DataLoader(ds, batch_size=3, shard_index=1, num_shards=2)
        pa = [p for batch in a for p in batch["path"]]
        pb = [p for batch in b for p in batch["path"]]
        assert not set(pa) & set(pb)
        assert len(pa) + len(pb) == len(ds)

    def test_device_put_prefetch(self, synth_root):
        """The trainer's prefetch mode: batches arrive as committed device
        arrays (optionally data-axis sharded), never host numpy."""
        import jax
        import jax.numpy as jnp
        from srbh_tpu.parallel import mesh as pmesh

        ds = TestDataset().make(synth_root)
        mesh = pmesh.make_mesh(n_data=2)  # 6-sample dataset: batch 2 shards
        dl = DataLoader(ds, batch_size=2, num_workers=2, drop_last=True,
                        device_put=True, sharding=pmesh.batch_sharding(mesh))
        batch = next(iter(dl))
        assert isinstance(batch["image"], jax.Array)
        assert batch["image"].sharding.spec == pmesh.P(pmesh.DATA_AXIS)
        assert isinstance(batch["path"], list)  # strings stay on host
        assert jnp.isfinite(batch["image"]).all()


class TestDatalist:
    def test_generate_and_split_deterministic(self, tmp_path):
        root = tmp_path / "region"
        os.makedirs(root / "s1c_check")
        for i in range(20):
            write_tiff(str(root / "s1c_check" / f"t_{i}.tif"),
                       np.zeros((4, 4), np.uint8))
        generate_allfile(str(root), "s1c_check", invalid=None, suffix="c")
        train = pd.read_csv(root / "datalist_c_train_0.7.csv", header=None)
        val = pd.read_csv(root / "datalist_c_test_0.7_val_0.3.csv", header=None)
        test = pd.read_csv(root / "datalist_c_test_0.7_test_0.3.csv", header=None)
        assert len(train) == 14
        assert len(val) + len(test) == 6
        # identical RNG (pandas sample random_state=1) -> stable across runs
        train2 = pd.read_csv(root / "datalist_c_train_0.7.csv", header=None)
        assert list(train[0]) == list(train2[0])
        # no overlap
        assert not set(train[0]) & (set(val[0]) | set(test[0]))

    def test_concat(self, tmp_path):
        for c in ("a", "b"):
            pd.DataFrame({0: [f"{c}1.tif", f"{c}2.tif"]}).to_csv(
                tmp_path / f"datalist_{c}.csv", header=False, index=False)
        concat_allfile(str(tmp_path), ("a", "b"), "globe", "")
        df = pd.read_csv(tmp_path / "datalist_globe.csv", header=None)
        assert len(df) == 4
