"""Legacy dataset variants."""
import os

import numpy as np
import pandas as pd
import pytest

from srbh_tpu.data.legacy import SimpleTileDataset, WholeImageDataset, load_whole_s12
from srbh_tpu.data.tiff import write_tiff


@pytest.fixture(scope="module")
def legacy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("legacy")
    rng = np.random.default_rng(0)
    gt = (0.0, 10.0, 0.0, 1000.0, 0.0, -10.0)
    # simple tiles
    os.makedirs(root / "img")
    os.makedirs(root / "bh")
    rows = []
    for i in range(3):
        ip = str(root / "img" / f"t{i}.tif")
        hp = str(root / "bh" / f"t{i}.tif")
        write_tiff(ip, rng.integers(0, 255, (32, 32, 4)).astype(np.uint8), gt)
        write_tiff(hp, rng.integers(0, 60, (128, 128)).astype(np.uint8), gt)
        rows.append((ip, hp))
    pd.DataFrame(rows).to_csv(root / "simple.csv", header=False, index=False)
    # whole city
    write_tiff(str(root / "city_s2_rgbnir_clip.tif"),
               rng.integers(0, 3000, (70, 90, 4)).astype(np.uint16), gt)
    write_tiff(str(root / "city_s1_vvvhratio_clip.tif"),
               rng.uniform(-25, 5, (70, 90, 2)).astype(np.float32), gt)
    os.makedirs(root / "stats")
    np.savetxt(root / "stats" / "s2_rgbnir_minmax.txt",
               np.stack([np.zeros(4), np.full(4, 3000.0)]))
    np.savetxt(root / "stats" / "s1_vvvhratio_minmax.txt",
               np.stack([np.full(2, -25.0), np.full(2, 5.0)]))
    return root


class TestSimpleTiles:
    def test_basic_and_multiscale(self, legacy_root):
        ds = SimpleTileDataset(str(legacy_root / "simple.csv"))
        s = ds[0]
        assert s["image"].shape == (32, 32, 4)
        assert s["image"].max() <= 1.0
        assert s["height"].shape == (128, 128)
        ms = SimpleTileDataset(str(legacy_root / "simple.csv"),
                               multi_scale=True)[0]
        assert ms["height"]["stage1"].shape == (32, 32)
        assert ms["height"]["stage3"].shape == (128, 128)


class TestWholeImage:
    def test_windows_cover_and_pad(self, legacy_root):
        ds = WholeImageDataset(str(legacy_root), "city",
                               str(legacy_root / "stats"),
                               grid=64, stride=60)
        assert len(ds) == 2 * 2  # 90/60 -> x in {0,60}; 70/60 -> y in {0,60}
        s = ds[len(ds) - 1]  # ragged corner window, symmetric padded
        assert s["image"].shape == (64, 64, 6)
        assert s["pos"].tolist() == [60, 60, 30, 10]

    def test_load_whole(self, legacy_root):
        img, (h, w), pos = load_whole_s12(str(legacy_root), "city",
                                          str(legacy_root / "stats"),
                                          grid=64, stride=4)
        assert (h, w) == (70, 90)
        assert img.shape[0] % 60 == 4  # padded to step multiple + grid
        assert img.shape[2] == 6
        assert pos[0] == (0, 0)


class TestPreprocessSampleLoaders:
    """utils/preprocess.py:11-103 single-sample loader twins."""

    @pytest.fixture(scope="class")
    def sample_root(self, tmp_path_factory):
        import cv2

        root = tmp_path_factory.mktemp("samples")
        rng = np.random.default_rng(1)
        gt = (0.0, 10.0, 0.0, 1000.0, 0.0, -10.0)
        for d in ("img1", "sen1", "tlc", "tlc1", "img2", "tlc2", "lab"):
            os.makedirs(root / d)
        base = "img0007"
        write_tiff(str(root / "img1" / f"{base}.tif"),
                   rng.integers(0, 255, (16, 16, 4)).astype(np.uint8), gt)
        write_tiff(str(root / "sen1" / f"{base}.tif"),
                   rng.integers(0, 255, (16, 16, 2)).astype(np.uint8), gt)
        write_tiff(str(root / "tlc" / ("tlc" + f"{base}.tif"[3:])),
                   rng.integers(0, 255, (16, 16, 3)).astype(np.uint8), gt)
        write_tiff(str(root / "tlc1" / f"{base}.tif"),
                   rng.integers(0, 255, (16, 16, 3)).astype(np.uint8), gt)
        write_tiff(str(root / "img2" / f"{base}.tif"),
                   rng.integers(0, 255, (16, 16, 4)).astype(np.uint8), gt)
        write_tiff(str(root / "tlc2" / f"{base}.tif"),
                   rng.integers(0, 255, (16, 16, 3)).astype(np.uint8), gt)
        cv2.imwrite(str(root / "lab" / ("lab" + base[3:] + ".png")),
                    rng.integers(0, 2, (16, 16)).astype(np.uint8))
        rows = [(str(root / "img1" / f"{base}.tif"),
                 str(root / "lab" / ("lab" + base[3:] + ".png")))]
        return pd.DataFrame(rows)

    def test_imglab_and_s12(self, sample_root):
        from srbh_tpu.data.legacy import preprocess_imglab, preprocess_s12lab

        x, lab, raw = preprocess_imglab(sample_root, 0)
        assert x.shape == (1, 16, 16, 4) and x.max() <= 1.0
        assert lab.shape == (1, 16, 16) and raw.dtype == np.uint8
        x2, lab2, _ = preprocess_s12lab(sample_root, 0)
        assert x2.shape == (1, 16, 16, 6)  # 4 S2 + 2 S1 channels
        np.testing.assert_allclose(x2[..., :4], x)

    def test_tlc_and_t1t2_with_scale(self, sample_root):
        from srbh_tpu.data.legacy import preprocess_t1t2, preprocess_tlclab

        x, lab, rgb = preprocess_tlclab(sample_root, 0, scale=0.5)
        assert x.shape == (1, 8, 8, 7) and rgb.shape == (8, 8, 3)
        assert lab.shape == (1, 8, 8)
        x2, lab2, _ = preprocess_t1t2(sample_root, 0)
        assert x2.shape == (1, 16, 16, 14)  # img1(4)+tlc1(3)+img2(4)+tlc2(3)
        assert set(np.unique(lab2)) <= {0, 1}
