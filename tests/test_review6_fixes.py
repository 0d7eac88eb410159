"""Regression tests for the round-2 session-3 review findings:

1. trainer TB loop must not index log_vars[2] when isaggre=False (covered
   indirectly by the len-driven loop; exercised in test_train's e2e paths).
2. VirtualMosaic nodata transparency (gdal.BuildVRT srcNodata semantics).
3. write_shapefile handles None numeric attributes (empty DBF cells).
4. _read_dbf drops truncated tail records instead of decoding garbage.
5. TiffReader zero-fills tiled windows crossing the right/bottom edge
   (parity with the strip path) instead of raising.
6. Dataset augmentation RNG is per-(seed, epoch, index): reproducible
   under any num_workers and fresh per epoch.
"""
import struct

import numpy as np
import pytest

from srbh_tpu.data.shapefile import (
    ShapeRecord,
    read_shapefile,
    write_shapefile,
)
from srbh_tpu.data.tiff import TiffReader, write_tiff


def _write_tiled_tiff(path, img, tile=16):
    """Minimal uncompressed tiled little-endian TIFF (the reader's tile
    path has no writer twin — strips are the write format)."""
    h, w = img.shape
    tx = (w + tile - 1) // tile
    ty = (h + tile - 1) // tile
    tiles = []
    for yy in range(ty):
        for xx in range(tx):
            t = np.zeros((tile, tile), np.uint8)
            sub = img[yy * tile: (yy + 1) * tile, xx * tile: (xx + 1) * tile]
            t[: sub.shape[0], : sub.shape[1]] = sub
            tiles.append(t.tobytes())

    n_tags = 10
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + n_tags * 12 + 4
    data_start = 8 + ifd_size
    # offsets/bytecounts arrays live right after the IFD
    arr_off = data_start
    arr_bytes = 4 * len(tiles)
    tile_data_start = arr_off + 2 * arr_bytes
    offsets = [tile_data_start + i * tile * tile for i in range(len(tiles))]
    counts = [tile * tile] * len(tiles)

    def tag(code, typ, count, value):
        return struct.pack("<HHII", code, typ, count, value)

    tags = b"".join([
        tag(256, 3, 1, w), tag(257, 3, 1, h), tag(258, 3, 1, 8),
        tag(259, 3, 1, 1), tag(262, 3, 1, 1), tag(277, 3, 1, 1),
        tag(322, 3, 1, tile), tag(323, 3, 1, tile),
        tag(324, 4, len(tiles), arr_off if len(tiles) > 1 else offsets[0]),
        tag(325, 4, len(tiles), arr_off + arr_bytes
            if len(tiles) > 1 else counts[0]),
    ])
    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack("<H", n_tags) + tags + struct.pack("<I", 0))
        f.write(struct.pack(f"<{len(tiles)}I", *offsets))
        f.write(struct.pack(f"<{len(tiles)}I", *counts))
        for t in tiles:
            f.write(t)


class TestTiledEdgeWindows:
    def test_tiled_edge_window_zero_fills(self, tmp_path):
        img = (np.arange(24 * 24) % 251).astype(np.uint8).reshape(24, 24)
        p = str(tmp_path / "tiled.tif")
        _write_tiled_tiff(p, img, tile=16)
        r = TiffReader(p)
        assert r.tiled and (r.width, r.height) == (24, 24)
        # interior window round-trips
        np.testing.assert_array_equal(r.read((4, 4, 8, 8))[..., 0],
                                      img[4:12, 4:12])
        # window crossing right/bottom edge: zero-filled, not ValueError
        out = r.read((16, 16, 16, 16))[..., 0]
        np.testing.assert_array_equal(out[:8, :8], img[16:24, 16:24])
        assert (out[8:, :] == 0).all() and (out[:, 8:] == 0).all()
        # strip-path parity: same window contract on a striped copy
        ps = str(tmp_path / "striped.tif")
        write_tiff(ps, img)
        out_s = TiffReader(ps).read((16, 16, 16, 16))[..., 0]
        np.testing.assert_array_equal(out, out_s)
        r.close()  # idempotent release of the mmap
        r.close()


class TestMosaicNodataTransparency:
    def test_later_nodata_does_not_overwrite_valid(self, tmp_path):
        from srbh_tpu.tools.products import VirtualMosaic

        # two overlapping rasters; the later one's overlap strip is nodata=0
        a = np.full((8, 8), 7, np.uint8)
        b = np.full((8, 8), 3, np.uint8)
        b[:, :4] = 0  # nodata collar over the overlap with a
        pa, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
        write_tiff(pa, a, geotransform=(0, 1, 0, 8, 0, -1))
        write_tiff(pb, b, geotransform=(4, 1, 0, 8, 0, -1))  # shifted +4 east
        m = VirtualMosaic([pa, pb], nodata=0)
        out = m.read_window((0, 0, 12, 8), resolution=1.0)
        assert (out[:, :4] == 7).all()          # a only
        assert (out[:, 4:8] == 7).all()         # overlap: b's nodata is
        #                                         transparent, a shows through
        assert (out[:, 8:] == 3).all()          # b's valid half
        # sample() path: same transparency
        vals = m.sample(np.array([2.5, 6.5, 10.5]), np.array([4.5, 4.5, 4.5]))
        np.testing.assert_array_equal(vals, [7, 7, 3])


class TestShapefileNoneAttrs:
    def test_none_numeric_round_trips(self, tmp_path):
        p = str(tmp_path / "g.shp")
        recs = [
            ShapeRecord((0, 0, 1, 1), {"isv": 1, "h": 2.5}),
            ShapeRecord((2, 0, 3, 1), {"isv": None, "h": None}),
        ]
        write_shapefile(p, recs, [("isv", "N", 10, 0), ("h", "N", 19, 6)])
        back = read_shapefile(p)
        assert back[0].attributes["isv"] == 1
        assert back[0].attributes["h"] == pytest.approx(2.5)
        assert back[1].attributes["isv"] is None
        assert back[1].attributes["h"] is None

    def test_truncated_dbf_drops_partial_record(self, tmp_path):
        p = str(tmp_path / "t.shp")
        recs = [ShapeRecord((i, 0.0, i + 1.0, 1.0), {"isv": i})
                for i in (1, 2)]
        write_shapefile(p, recs, [("isv", "N", 10, 0)])
        dbf = str(tmp_path / "t.dbf")
        buf = open(dbf, "rb").read()
        open(dbf, "wb").write(buf[:-6])  # chop into the last record
        from srbh_tpu.data.shapefile import _read_dbf

        rows = _read_dbf(dbf)
        assert len(rows) == 1 and rows[0]["isv"] == 1  # no phantom record


class TestPerSampleAugRNG:
    def _dataset(self, tmp_path, seed=7):
        import cv2

        from srbh_tpu.data.dataset import S12GlobeDataset

        root = tmp_path / "root"
        for d in ("s1", "s2", "bh"):
            (root / d).mkdir(parents=True, exist_ok=True)
        names = []
        rng = np.random.default_rng(3)
        for i in range(6):
            name = f"t{i}.tif"
            cv2.imwrite(str(root / "s2" / name),
                        rng.integers(0, 255, (64, 64, 3), np.uint8)
                        .astype(np.uint8))
            cv2.imwrite(str(root / "s1" / name),
                        rng.integers(0, 255, (64, 64), np.uint8)
                        .astype(np.uint8))
            cv2.imwrite(str(root / "bh" / name),
                        rng.integers(0, 40, (64, 64), np.uint8)
                        .astype(np.uint8))
            names.append(name)
        lst = tmp_path / "list.csv"
        lst.write_text("\n".join(names) + "\n")
        # stats tables are mandatory now (missing ones raise, matching the
        # reference's np.loadtxt failure — review 11 normalisation parity)
        np.savetxt(tmp_path / "s2_minmax.txt",
                   np.stack([np.zeros(3), np.full(3, 255.0)]))
        np.savetxt(tmp_path / "s1_minmax.txt",
                   np.stack([np.zeros(1), np.full(1, 255.0)]))
        return S12GlobeDataset(str(lst), str(root), datastats=str(tmp_path),
                               aug=True, nchans=3, seed=seed)

    def test_deterministic_across_worker_counts(self, tmp_path):
        from srbh_tpu.data.pipeline import DataLoader

        def run(num_workers):
            ds = self._dataset(tmp_path)
            loader = DataLoader(ds, batch_size=3, shuffle=False,
                                num_workers=num_workers)
            return [np.asarray(b["image"]) for b in loader]

        a, b = run(0), run(4)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_augmentation_varies_per_epoch(self, tmp_path):
        from srbh_tpu.data.pipeline import DataLoader

        ds = self._dataset(tmp_path)
        loader = DataLoader(ds, batch_size=6, shuffle=False, num_workers=0)
        e1 = np.asarray(next(iter(loader))["image"])
        e2 = np.asarray(next(iter(loader))["image"])
        assert not np.array_equal(e1, e2)  # epoch advanced the aug stream
