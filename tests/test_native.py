"""Native C++ codec vs pure-Python equivalence."""
import numpy as np
import pytest

from srbh_tpu import native
from srbh_tpu.data.tiff import _packbits_decode, _packbits_encode


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


class TestPackBits:
    def test_roundtrip_matches_python(self, lib):
        rng = np.random.default_rng(0)
        for _ in range(5):
            # runs + literals mix
            data = rng.choice([0, 0, 0, 1, 2, 3], size=rng.integers(1, 2000)
                              ).astype(np.uint8).tobytes()
            py_enc = _packbits_encode(data)
            c_enc = native.packbits_encode(data)
            assert c_enc == py_enc
            assert native.packbits_decode(c_enc, len(data)) == data
            assert _packbits_decode(c_enc, len(data)) == data

    def test_decode_cross(self, lib):
        data = bytes(range(256)) * 3
        enc = _packbits_encode(data)
        assert native.packbits_decode(enc, len(data)) == data


class TestBlend:
    def test_matches_numpy_path(self, lib):
        from srbh_tpu.predict.stitcher import MosaicAccumulator

        rng = np.random.default_rng(1)
        n, t, c, up = 4, 8, 3, 2
        h_tiles = rng.integers(0, 500, (n, t * up, t * up)).astype(np.uint16)
        b_tiles = rng.integers(0, 255, (n, t * up, t * up, c)).astype(np.uint16)
        pos = np.array([[0, 0, t, t], [4, 0, t, t], [0, 4, t, t],
                        [4, 4, t, t]], np.int32)

        a_native = MosaicAccumulator(16, 16, c, up)
        a_native.add_batch(h_tiles, b_tiles, pos)

        # reference accumulation in plain numpy
        a_py = MosaicAccumulator(16, 16, c, up)
        s = up
        for i in range(n):
            xo, yo, xc, yc = (int(v) * s for v in pos[i])
            a_py.height_sum[yo: yo + yc, xo: xo + xc] += h_tiles[i, :yc, :xc].astype(np.int64)
            a_py.build_sum[:, yo: yo + yc, xo: xo + xc] += \
                b_tiles[i, :yc, :xc].transpose(2, 0, 1).astype(np.int64)
            a_py.weight[yo: yo + yc, xo: xo + xc] += 1

        np.testing.assert_array_equal(a_native.height_sum, a_py.height_sum)
        np.testing.assert_array_equal(a_native.build_sum, a_py.build_sum)
        np.testing.assert_array_equal(a_native.weight, a_py.weight)

    def test_out_of_bounds_tiles_skipped(self, lib):
        from srbh_tpu.predict.stitcher import MosaicAccumulator

        acc = MosaicAccumulator(8, 8, 2, 1)
        h = np.ones((1, 8, 8), np.uint16)
        b = np.ones((1, 8, 8, 2), np.uint16)
        pos = np.array([[6, 6, 8, 8]], np.int32)  # would overrun
        acc.add_batch(h, b, pos)
        assert acc.weight.max() <= 1  # native path skips, no corruption


class TestTiffIntegration:
    def test_packbits_file_roundtrip_uses_native(self, lib, tmp_path):
        from srbh_tpu.data.tiff import read_tiff, write_tiff

        arr = np.random.default_rng(2).integers(0, 255, (64, 64, 3)).astype(np.uint8)
        p = str(tmp_path / "n.tif")
        write_tiff(p, arr, compress="PACKBITS")
        np.testing.assert_array_equal(read_tiff(p), arr)


def test_native_lzw_matches_python_and_libtiff(tmp_path):
    """C++ LZW decode = Python fallback = libtiff-encoded ground truth."""
    import cv2

    from srbh_tpu import native
    from srbh_tpu.data import tiff as T

    rng = np.random.default_rng(3)
    img = np.repeat(rng.integers(0, 60000, (64, 32)), 3, axis=1)[:, :64]
    img = img.astype(np.uint16)
    p = str(tmp_path / "l.tif")
    assert cv2.imwrite(p, img, [cv2.IMWRITE_TIFF_COMPRESSION, 5])
    np.testing.assert_array_equal(np.squeeze(T.read_tiff(p)), img)

    # raw-stream equality of the two decoders on the file's strips
    info = T.TiffReader(p)
    native_ok = native.get_lib() is not None
    if native_ok:
        import srbh_tpu.native as N

        full_native = T.read_tiff(p)
        saved = N._lib
        N._lib, N._build_failed = None, True
        try:
            full_python = T.read_tiff(p)
        finally:
            N._lib, N._build_failed = saved, False
        np.testing.assert_array_equal(full_native, full_python)
