"""Unit tests for the core op layer, cross-checked against torch oracles and
reference-shipped goldens (SURVEY.md §4 test plan)."""
import numpy as np
import pytest

import jax.numpy as jnp

from srbh_tpu import ops

torch = pytest.importorskip("torch")


class TestPixelShuffle:
    def test_matches_torch_pixel_shuffle(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 32, 3, 5)).astype(np.float32)  # NCHW, C=2*4^2
        want = torch.nn.PixelShuffle(4)(torch.from_numpy(x)).numpy()
        got = ops.pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 4)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want)

    def test_unshuffle_matches_esrgan_channel_order(self):
        # ESRGAN pixel_unshuffle: out channel = c*r*r + i*r + j
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
        b, c, hh, hw = x.shape
        r = 2
        xt = torch.from_numpy(x)
        want = (
            xt.view(b, c, hh // r, r, hw // r, r)
            .permute(0, 1, 3, 5, 2, 4)
            .reshape(b, c * r * r, hh // r, hw // r)
            .numpy()
        )
        got = ops.pixel_unshuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), r)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want)

    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(ops.pixel_shuffle(ops.pixel_unshuffle(x, 2), 2)), np.asarray(x)
        )


class TestAggregate:
    def _naive(self, data, scale, thresh_fn, eps):
        # independent re-derivation of the block aggregate definition
        r, c = data.shape
        step = int(1 / scale)
        out = np.zeros((r // step, c // step))
        for i in range(0, r, step):
            for j in range(0, c, step):
                patch = data[i: i + step, j: j + step].astype(float)
                out[i // step, j // step] = patch.sum() / (thresh_fn(patch).sum() + eps)
        return out

    def test_torch_variant_is_block_mean(self):
        rng = np.random.default_rng(3)
        data = rng.integers(0, 60, size=(32, 32)).astype(np.float32)
        got = np.asarray(ops.aggregate(jnp.asarray(data), 0.25))
        want = self._naive(data, 0.25, lambda p: p >= 0, 1e-10)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_numpy_variant_valid_pixels_only(self):
        rng = np.random.default_rng(4)
        data = rng.integers(0, 3, size=(16, 16)).astype(np.float32)
        got = np.asarray(
            ops.aggregate(jnp.asarray(data), 0.25, inclusive=False, eps=1e-6)
        )
        want = self._naive(data, 0.25, lambda p: p > 0, 1e-6)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_batched(self):
        rng = np.random.default_rng(5)
        data = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
        out = ops.aggregate(jnp.asarray(np.abs(data)), 0.5)
        assert out.shape == (2, 1, 4, 4)


class TestHierarchy:
    def test_lut(self):
        lut = ops.build_hierarchy_lut()
        assert lut[0] == 0 and lut[2] == 0
        assert lut[3] == 1 and lut[11] == 1
        assert lut[90] == 6 and lut[255] == 6
        assert lut.dtype == np.uint8

    def test_hierweight_golden(self):
        # Goldens printed in the reference's own smoke test
        # (BH_loader.py:1116-1133) for bh_stats_globe.txt, hir ending at 255.
        stats = np.loadtxt("datastats/bh_stats_globe.txt")
        hir = (0, 3, 12, 21, 30, 60, 90, 255)
        w = ops.hierweight(stats, hir)
        np.testing.assert_allclose(
            w,
            [0.08743518, 0.26821995, 0.32067124, 0.73515255, 0.98135007,
             1.60267172, 3.0044993],
            atol=1e-7,
        )
        ws = ops.hierweight_simple(stats, hir)
        np.testing.assert_allclose(
            ws,
            [4.02924542e-03, 3.79169577e-02, 5.41965148e-02, 2.84843482e-01,
             5.07573877e-01, 1.35375631e+00, 4.75768362e+00],
            rtol=1e-7,
        )
        np.testing.assert_allclose(ops.hierweight_equal(stats, hir), np.ones(7))


class TestNormalize:
    def test_minmax_against_loader_semantics(self):
        # BH_loader.py:300-306,361-369: row1 -> max-min, then clip to (0,1)
        table = ops.load_stats_table("datastats/s2globe_check_minmax.txt", nchans=6)
        offset, scale = ops.norm_offsets(table, "minmax")
        np.testing.assert_allclose(offset[0], 66.0)
        np.testing.assert_allclose(scale[0], 7316.0 - 66.0)
        img = np.full((4, 4, 6), 10000.0, np.float32)
        out = ops.normalize_tile(img, offset, scale, (0.0, 1.0))
        assert out.max() == 1.0  # clipped
        img = np.zeros((4, 4, 6), np.float32)
        out = ops.normalize_tile(img, offset, scale, (0.0, 1.0))
        assert out.min() == 0.0  # clipped below

    def test_meanstd(self):
        table = np.array([[10.0, 20.0], [2.0, 4.0]])
        offset, scale = ops.norm_offsets(table, "meanstd")
        out = ops.normalize_tile(np.array([[14.0, 28.0]]), offset, scale, None)
        np.testing.assert_allclose(out, [[2.0, 2.0]])


class TestResize:
    def test_nearest_matches_torch_interpolate(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
        xt = torch.from_numpy(x)
        up = torch.nn.functional.interpolate(xt, scale_factor=4, mode="nearest").numpy()
        got = ops.upsample_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), 4)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), up)
        down = torch.nn.functional.interpolate(xt, scale_factor=0.25, mode="nearest").numpy()
        got = ops.downsample_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), 4)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), down)

    def test_resize_nearest_arbitrary(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        out = ops.resize_nearest(x, 2, 2)
        np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], [[0, 2], [8, 10]])


class TestSSIM:
    def test_device_ssim_matches_host_f64(self):
        from srbh_tpu.metrics.image import calculate_ssim
        from srbh_tpu.ops import ssim as dev

        rng = np.random.default_rng(7)
        a = rng.integers(0, 255, size=(24, 24, 3)).astype(np.float64)
        b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255)
        want = calculate_ssim(a, b)
        got = float(dev.ssim(jnp.asarray(a[None]), jnp.asarray(b[None]))[0])
        # f32 E[x^2]-mu^2 cancellation bounds device accuracy to ~5e-4; the
        # golden-parity path uses the host f64 twin, device SSIM feeds losses.
        assert abs(got - want) < 1e-3

    def test_psnr_identical_and_noise(self):
        from srbh_tpu.metrics.image import calculate_psnr

        rng = np.random.default_rng(8)
        a = rng.integers(0, 255, size=(16, 16, 3)).astype(np.float64)
        assert calculate_psnr(a, a) == float("inf")
        b = np.clip(a + 10, 0, 255)
        p = calculate_psnr(a, b)
        assert 20 < p < 40

    def test_cpsnr_shift_invariance(self):
        from srbh_tpu.metrics.image import calculate_cpsnr, calculate_psnr

        rng = np.random.default_rng(9)
        a = rng.integers(0, 255, size=(40, 40, 1)).astype(np.float64)
        b = np.roll(a, 2, axis=0)  # pure translation
        # cPSNR recovers the shift; plain PSNR does not
        assert calculate_cpsnr(a, b) == float("inf")
        assert calculate_psnr(a, b) < 30

    def test_y_channel_conversion(self):
        # BT.601: mid-gray (128,128,128) -> Y = round((24.966+128.553+65.481)
        # * 128/255 + 16) = 126; regression for a scale bug caught in verify.
        from srbh_tpu.metrics.image import bgr2ycbcr, calculate_psnr

        px = np.full((1, 1, 3), 128, np.uint8)
        assert bgr2ycbcr(px, y_only=True)[0, 0] == 126
        rng = np.random.default_rng(11)
        a = rng.integers(0, 255, size=(20, 20, 3)).astype(np.float64)
        b = np.clip(a + rng.normal(0, 5, a.shape), 0, 255)
        p = calculate_psnr(a, b, test_y_channel=True)
        assert 25 < p < 50  # sane range; was hugely negative pre-fix

    def test_cpsnr_bias_invariance(self):
        from srbh_tpu.metrics.image import calculate_cpsnr

        rng = np.random.default_rng(10)
        a = rng.integers(0, 200, size=(32, 32, 1)).astype(np.float64)
        assert calculate_cpsnr(a, a + 17.0) == float("inf")
