"""Normalization-table goldens: run OUR merge math over the reference's
shipped per-image stats arrays (data artifacts, datasetglobe/*.npy) and
compare with its published globe tables (stats_dataset_globe.py:282-296)."""
import os

import numpy as np
import pandas as pd
import pytest

from srbh_tpu.data.stats import cal_mean_std, cal_min_max

REF = "/root/reference/datasetglobe"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference artifacts absent")


def merge(names, nband):
    stats = [[] for _ in range(nband)]
    for name in names:
        data = np.load(os.path.join(REF, name + ".npy"))
        for b, db in enumerate(data):
            stats[b].append(db)
    return [np.concatenate(b, 0) for b in stats]


class TestGlobeTables:
    def test_s1_globe_minmax_and_meanstd(self):
        stats = merge(["s1china_check", "s1usa_check", "s1eu_check"], 2)
        mean, std = cal_mean_std(stats)
        mn, mx = cal_min_max(stats)
        want_minmax = np.loadtxt(os.path.join(REF, "s1globe_check_minmax.txt"))
        np.testing.assert_allclose([mn, mx], want_minmax, rtol=1e-6)
        want_meanstd = np.loadtxt(os.path.join(REF, "s1globe_check_meanstd.txt"))
        np.testing.assert_allclose([mean, std], want_meanstd, rtol=1e-6)
        # the in-code goldens (stats_dataset_globe.py:282-285)
        np.testing.assert_allclose(mn, [-22.079342880249023, -28.524991188049317],
                                   rtol=1e-9)
        np.testing.assert_allclose(mx, [23.191689529418944, 12.922104854583715],
                                   rtol=1e-9)

    def test_s2_globe_minmax_and_meanstd(self):
        stats = merge(["s2china_check", "s2usa_check", "s2eu_check"], 6)
        mean, std = cal_mean_std(stats)
        mn, mx = cal_min_max(stats)
        want_minmax = np.loadtxt(os.path.join(REF, "s2globe_check_minmax.txt"))
        np.testing.assert_allclose([mn, mx], want_minmax, rtol=1e-6)
        want_meanstd = np.loadtxt(os.path.join(REF, "s2globe_check_meanstd.txt"))
        np.testing.assert_allclose([mean, std], want_meanstd, rtol=1e-6)
        np.testing.assert_allclose(mn[0], 66.0)
        np.testing.assert_allclose(mx[0], 7316.0)


class TestShippedSplitGoldens:
    """The reference ships its ACTUAL datalist splits (data/datalist_*.csv);
    regenerating them from the full region list with our split_data must be
    row-for-row identical — end-to-end split-RNG parity on real data, not a
    synthetic check."""

    REF_DATA = "/root/reference/data"

    SPLITS = ("_train_0.7", "_test_0.7", "_test_0.7_val_0.3",
              "_test_0.7_test_0.3")

    @pytest.mark.parametrize("region", ["china", "eu", "usa"])
    def test_regenerated_splits_match_shipped(self, region, tmp_path):
        import shutil

        from srbh_tpu.data.datalist import split_data

        src = os.path.join(self.REF_DATA, f"datalist_{region}.csv")
        if not os.path.exists(src):
            pytest.skip("reference datalists not mounted")
        dst = str(tmp_path / f"datalist_{region}.csv")
        shutil.copy(src, dst)
        split_data(dst, split_rate=0.7, id="_0.7", n1="train", n2="test")
        split_data(str(tmp_path / f"datalist_{region}_test_0.7.csv"),
                   split_rate=0.33, id="_0.3", n1="val", n2="test")
        for m in self.SPLITS:
            name = f"datalist_{region}{m}.csv"
            ours = pd.read_csv(str(tmp_path / name), header=None)
            ref = pd.read_csv(os.path.join(self.REF_DATA, name), header=None)
            assert ours.equals(ref), f"{name} differs from the shipped golden"

    def test_globe_lists_are_region_concats(self, tmp_path):
        """The shipped globe splits are CONCATS of the per-region split
        files in (china, eu, usa) order — not re-splits of the merged list
        (BH_dataset.py:141-165 + the commented-out split block). Our
        concat_allfile must reproduce them byte-for-row."""
        import shutil

        from srbh_tpu.data.datalist import concat_allfile

        if not os.path.exists(os.path.join(self.REF_DATA, "datalist_globe.csv")):
            pytest.skip("reference datalists not mounted")
        for m in ("",) + self.SPLITS:
            for region in ("china", "eu", "usa"):
                shutil.copy(os.path.join(self.REF_DATA,
                                         f"datalist_{region}{m}.csv"),
                            str(tmp_path / f"datalist_{region}{m}.csv"))
            concat_allfile(str(tmp_path), ("china", "eu", "usa"), "globe", m)
            ours = pd.read_csv(str(tmp_path / f"datalist_globe{m}.csv"),
                               header=None)
            ref = pd.read_csv(os.path.join(self.REF_DATA,
                                           f"datalist_globe{m}.csv"),
                              header=None)
            assert ours.equals(ref), f"globe{m} differs from the golden"
