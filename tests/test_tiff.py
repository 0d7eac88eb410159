"""GeoTIFF codec tests: roundtrips, windowed reads, and cross-validation
against PIL-written files (independent implementation)."""
import numpy as np
import pytest

from srbh_tpu.data.tiff import TiffReader, read_tiff, write_tiff

PIL = pytest.importorskip("PIL.Image")


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
@pytest.mark.parametrize("compress", [None, "DEFLATE", "PACKBITS"])
def test_roundtrip(tmp_path, dtype, compress):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        arr = rng.integers(0, np.iinfo(dtype).max, (70, 53, 3)).astype(dtype)
    else:
        arr = rng.normal(size=(70, 53, 3)).astype(dtype)
    p = str(tmp_path / "t.tif")
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    write_tiff(p, arr, geotransform=gt, compress=compress, rows_per_strip=17)
    r = TiffReader(p)
    np.testing.assert_array_equal(r.read(), arr)
    np.testing.assert_allclose(r.geotransform, gt)
    assert r.info().dtype == np.dtype("<" + np.dtype(dtype).str[1:])


def test_single_band_2d(tmp_path):
    arr = np.arange(100, dtype=np.uint16).reshape(10, 10)
    p = str(tmp_path / "b.tif")
    write_tiff(p, arr, compress="DEFLATE")
    out = read_tiff(p)
    np.testing.assert_array_equal(out[..., 0], arr)


def test_windowed_read_matches_full(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (100, 120, 2)).astype(np.uint8)
    p = str(tmp_path / "w.tif")
    write_tiff(p, arr, compress="PACKBITS", rows_per_strip=13)
    r = TiffReader(p)
    # the gridimgLoader access pattern (BH_loader.py:968-977)
    for (xo, yo, xs, ys) in [(0, 0, 10, 10), (50, 37, 64, 61), (110, 90, 10, 10)]:
        got = r.read((xo, yo, xs, ys))
        np.testing.assert_array_equal(got, arr[yo: yo + ys, xo: xo + xs])


def test_colormap_and_nodata(tmp_path):
    from srbh_tpu.predict.colormap import CMAP

    arr = np.random.default_rng(2).integers(0, 7, (32, 32)).astype(np.uint8)
    p = str(tmp_path / "c.tif")
    write_tiff(p, arr, compress="PACKBITS", colormap=CMAP, nodata=0)
    info = TiffReader(p).info()
    assert info.nodata == 0
    assert info.colormap[6][:3] == (127, 0, 0)  # red class, CMAP rounding
    np.testing.assert_array_equal(read_tiff(p)[..., 0], arr)


@pytest.mark.parametrize("pil_comp", ["raw", "tiff_deflate", "tiff_lzw", "packbits"])
def test_reads_pil_written_files(tmp_path, pil_comp):
    """Cross-validate the reader against an independent writer."""
    from PIL import Image

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (61, 47, 3)).astype(np.uint8)
    p = str(tmp_path / f"pil_{pil_comp}.tif")
    Image.fromarray(arr).save(p, compression=None if pil_comp == "raw" else pil_comp)
    np.testing.assert_array_equal(read_tiff(p), arr)


def test_pil_reads_our_files(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, (40, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "ours.tif")
    write_tiff(p, arr, compress="DEFLATE")
    np.testing.assert_array_equal(np.asarray(Image.open(p)), arr)


def test_reads_reference_shipped_tifs():
    """The reference ships predicted GeoTIFFs under weights/realesrgan/pred_2
    (written by rasterio with PACKBITS) — our reader must open them."""
    import glob

    files = sorted(glob.glob("/root/reference/weights/realesrgan/pred_2/*_rgb.tif"))
    if not files:
        pytest.skip("reference tifs not present")
    r = TiffReader(files[0])
    arr = r.read()
    assert arr.shape[0] > 0 and arr.shape[2] in (1, 3)
    gt = r.geotransform
    assert gt[1] != 0


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])  # none/LZW/deflate/packbits
def test_libtiff_interop_via_cv2(tmp_path, comp):
    """Third-party oracle: real libtiff (through cv2) encodes with each
    compression scheme; our decoder must bit-match — and libtiff must read
    our compressed writes back (codec symmetric against an independent
    implementation, beyond the PIL oracle)."""
    import cv2

    from srbh_tpu.data.tiff import read_tiff, write_tiff

    rng = np.random.default_rng(comp)
    # runs of equal values so PackBits/LZW actually compress
    img = np.repeat(rng.integers(0, 60000, (37, 23)), 2, axis=1).astype(np.uint16)
    p = str(tmp_path / f"cv{comp}.tif")
    assert cv2.imwrite(p, img, [cv2.IMWRITE_TIFF_COMPRESSION, comp])
    got = np.squeeze(read_tiff(p))
    np.testing.assert_array_equal(got, img)

    # our writer -> libtiff reader (our codec emits none/packbits/deflate)
    ours = {1: None, 8: "deflate", 32773: "packbits"}.get(comp, None)
    q = str(tmp_path / f"ours{comp}.tif")
    write_tiff(q, img, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0), compress=ours)
    back = cv2.imread(q, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back, img)


class TestCorruptFileHardening:
    """Corrupt/truncated/garbage TIFFs must fail with ValueError (never
    struct.error/KeyError/MemoryError or a stall). Found by fuzzing: a
    corrupted tag count built a 4-billion-char struct format string."""

    def _base(self, tmp_path):
        from srbh_tpu.data.tiff import write_tiff

        p = str(tmp_path / "a.tif")
        write_tiff(p, (np.arange(64 * 48) % 251).reshape(64, 48).astype(np.uint8),
                   (0.0, 1.0, 0.0, 0.0, 0.0, -1.0), compress="deflate")
        return p, open(p, "rb").read()

    def test_fuzzed_files_only_valueerror(self, tmp_path):
        import time

        from srbh_tpu.data.tiff import read_tiff

        _, data = self._base(tmp_path)
        rng = np.random.default_rng(0)
        q = str(tmp_path / "f.tif")
        t0 = time.time()
        for trial in range(150):
            buf = bytearray(data)
            mode = trial % 4
            if mode == 0:
                buf = bytes(buf[: rng.integers(4, len(buf))])
            elif mode == 1:
                for _ in range(rng.integers(1, 8)):
                    buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
                buf = bytes(buf)
            elif mode == 2:
                for _ in range(rng.integers(1, 4)):
                    buf[rng.integers(0, min(64, len(buf)))] = rng.integers(0, 256)
                buf = bytes(buf)
            else:
                buf = bytes(rng.integers(0, 256, rng.integers(0, 400),
                                         dtype=np.uint8))
            open(q, "wb").write(buf)
            try:
                read_tiff(q)
            except ValueError:
                pass  # the only acceptable failure type
        assert time.time() - t0 < 120, "fuzzed reads stalled"

    def test_huge_declared_image_rejected(self, tmp_path):
        from srbh_tpu.data.tiff import TiffReader, read_tiff

        p, data = self._base(tmp_path)
        r = TiffReader(p)
        # forge the ImageLength tag value to 2^27 rows in place
        buf = bytearray(data)
        # find the IFD entry for tag 257 (ImageLength) and overwrite value
        import struct as st

        (off,) = st.unpack("<I", buf[4:8])
        (n,) = st.unpack("<H", buf[off: off + 2])
        for i in range(n):
            ent = off + 2 + 12 * i
            tag, = st.unpack("<H", buf[ent: ent + 2])
            if tag == 257:
                buf[ent + 8: ent + 12] = st.pack("<I", 1 << 27)
        q = str(tmp_path / "huge.tif")
        open(q, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="corrupt TIFF"):
            read_tiff(q)


def test_corrupt_shapefile_only_valueerror(tmp_path):
    """Fuzzed .shp/.dbf must fail with ValueError, never stall (a fuzzed
    DBF uint32 record count span billions of empty iterations; a <=0 .shp
    content length stalled the record loop in place)."""
    import time

    from srbh_tpu.data.shapefile import (ShapeRecord, read_shapefile,
                                         write_shapefile)

    base = str(tmp_path / "g")
    write_shapefile(base + ".shp",
                    [ShapeRecord(bounds=(0.0, 0.0, 1.0, 1.0),
                                 attributes={"isv": 1})])
    files = {ext: open(base + ext, "rb").read() for ext in (".shp", ".dbf")}
    rng = np.random.default_rng(1)
    t0 = time.time()
    for trial in range(120):
        for ext, data in files.items():
            buf = bytearray(data)
            mode = trial % 3
            if mode == 0:
                buf = bytes(buf[: rng.integers(1, max(2, len(buf)))])
            elif mode == 1:
                for _ in range(rng.integers(1, 8)):
                    buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
                buf = bytes(buf)
            else:
                buf = bytes(rng.integers(0, 256, rng.integers(0, 300),
                                         dtype=np.uint8))
            open(base + "_f" + ext, "wb").write(buf)
        try:
            read_shapefile(base + "_f.shp")
        except ValueError:
            pass
    assert time.time() - t0 < 60, "fuzzed shapefile reads stalled"
