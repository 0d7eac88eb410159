"""Normalization-table goldens: run OUR merge math over the reference's
shipped per-image stats arrays (data artifacts, datasetglobe/*.npy) and
compare with its published globe tables (stats_dataset_globe.py:282-296)."""
import os

import numpy as np
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
