"""Device-side augmentation (ops/device_aug.py) vs the host cv2 path
(data/augment.py): flips / grid shuffles / target building must be
bit-exact; rotation must match cv2's fixed-point bilinear within its
documented precision; the p=0.5 branch statistics must hold."""
import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.data.augment import _grid_shuffle_apply, _warp
from srbh_tpu.ops import device_aug as da


def _rand_pair(seed=0, h=16, w=16, c=8, scale=4):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h, w, c)).astype(np.float32)
    height = rng.integers(0, 120, (h * scale, w * scale)).astype(np.float32)
    return img, height


class TestPermutationOps:
    def test_flip_matches_cv2(self):
        img, height = _rand_pair()
        for d in (-1, 0, 1):
            got = np.asarray(da.flip(jnp.asarray(img), jnp.int32(d)))
            np.testing.assert_array_equal(got, cv2.flip(img, d))
            gotm = np.asarray(da.flip(jnp.asarray(height), jnp.int32(d)))
            np.testing.assert_array_equal(gotm, cv2.flip(height, d))

    def test_grid_shuffle_matches_host(self):
        img, height = _rand_pair(1)
        rng = np.random.default_rng(3)
        for _ in range(6):
            order = rng.permutation(4)
            np.testing.assert_array_equal(
                np.asarray(da.grid_shuffle_2x2(jnp.asarray(img),
                                               jnp.asarray(order))),
                _grid_shuffle_apply(img, order))
            np.testing.assert_array_equal(
                np.asarray(da.grid_shuffle_2x2(jnp.asarray(height),
                                               jnp.asarray(order))),
                _grid_shuffle_apply(height, order))


class TestRotation:
    """cv2.warpAffine uses 5-bit fixed-point bilinear weights; the device
    path is float32. CLAUDE.md documents ~1.8%-of-range worst-case per-pixel
    deltas between cv2 groupings alone, so tolerances are set accordingly."""

    @pytest.mark.parametrize("angle", [-73.4, -30.0, 12.7, 45.0, 88.9])
    def test_mask_nearest_agreement(self, angle):
        _, height = _rand_pair(2)
        h, w = height.shape
        mat = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        want = _warp(height, mat, cv2.INTER_NEAREST)
        got = np.asarray(da.rotate_mask_nearest(jnp.asarray(height),
                                                jnp.float32(angle)))
        # ties at .5 source coords may round differently (fixed point vs
        # float); everything else must agree exactly
        agree = (got == want).mean()
        assert agree > 0.98, f"nearest-rotation agreement {agree}"

    @pytest.mark.parametrize("angle", [-73.4, -30.0, 12.7, 45.0, 88.9])
    def test_image_bilinear_close_to_cv2(self, angle):
        img, _ = _rand_pair(4)
        scale = 4
        up = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
        h, w = up.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        want = _warp(up, mat, cv2.INTER_LINEAR)[::scale, ::scale]
        got = np.asarray(da.rotate_image_lowres(jnp.asarray(img),
                                                jnp.float32(angle), scale))
        err = np.abs(got - want)
        assert err.max() < 0.03, f"max err {err.max()}"  # 3% of [0,1] range
        assert err.mean() < 0.004, f"mean err {err.mean()}"

    def test_zero_angle_is_identity(self):
        img, height = _rand_pair(5)
        np.testing.assert_allclose(
            np.asarray(da.rotate_image_lowres(jnp.asarray(img),
                                              jnp.float32(0.0))),
            img, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(da.rotate_mask_nearest(jnp.asarray(height),
                                              jnp.float32(0.0))),
            height)

    def test_reflect101(self):
        n = 8
        idx = jnp.arange(-6, 20)
        got = np.asarray(da._reflect101(idx, n))
        want = np.array([cv2.borderInterpolate(int(i), n, cv2.BORDER_REFLECT_101)
                         for i in range(-6, 20)])
        np.testing.assert_array_equal(got, want)


class TestTargets:
    def test_build_targets_bit_exact_vs_host(self):
        from srbh_tpu.data.dataset import S12GlobeDataset, _aggregate_numpy
        from srbh_tpu.ops.hierarchy import (
            DEFAULT_HIR, build_hierarchy_lut, hierweight)

        rng = np.random.default_rng(7)
        height = rng.integers(0, 256, (64, 64)).astype(np.float32)
        lut = build_hierarchy_lut(DEFAULT_HIR)
        stats = rng.uniform(1, 100, 256)
        w = hierweight(stats, DEFAULT_HIR).astype(np.float32)

        lut_d, w_d = jnp.asarray(lut), jnp.asarray(w)  # concrete closures
        out = jax.jit(lambda h: da.build_targets(
            h, lut_d, w_d, isaggre=True))(jnp.asarray(height))

        build_host = lut[height.astype(np.int64).clip(0, 255)]
        np.testing.assert_array_equal(np.asarray(out["build"]), build_host)
        np.testing.assert_array_equal(np.asarray(out["weight"]),
                                      w[build_host])
        aggre_host = _aggregate_numpy(height, 0.25)
        np.testing.assert_allclose(np.asarray(out["height_aggre"]),
                                   aggre_host, atol=2e-5, rtol=0)
        np.testing.assert_array_equal(
            np.asarray(out["weight_aggre"]),
            w[lut[aggre_host.astype(np.int64).clip(0, 255)]])


class TestDatasetRawMode:
    def test_device_aug_dataset_ships_image_and_uint8_height(self, tmp_path):
        import pandas as pd

        from srbh_tpu.data.dataset import S12GlobeDataset
        from srbh_tpu.data.tiff import write_tiff

        rng = np.random.default_rng(0)
        gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
        for d in ("s2c", "s1c", "bhc"):
            (tmp_path / d).mkdir()
        write_tiff(str(tmp_path / "s2c" / "t.tif"),
                   rng.integers(0, 5000, (64, 64, 6)).astype(np.uint16), gt)
        write_tiff(str(tmp_path / "s1c" / "t.tif"),
                   rng.uniform(-25, 5, (64, 64, 2)).astype(np.float32), gt)
        write_tiff(str(tmp_path / "bhc" / "t.tif"),
                   rng.integers(0, 100, (256, 256)).astype(np.uint8),
                   (gt[0], 2.5, 0.0, gt[3], 0.0, -2.5))
        pd.DataFrame({0: ["t.tif"], 1: "s1c", 2: "s2c", 3: "bhc"}).to_csv(
            str(tmp_path / "dl.csv"), header=False, index=False)
        np.savetxt(str(tmp_path / "s2c_minmax.txt"),
                   np.stack([np.zeros(6), np.full(6, 5000.0)]))
        np.savetxt(str(tmp_path / "s1c_minmax.txt"),
                   np.stack([np.full(2, -25.0), np.full(2, 5.0)]))

        kw = dict(datastats=str(tmp_path), normmethod="minmax",
                  datarange=(0, 1), s1dir="s1c", s2dir="s2c",
                  heightdir="bhc", isaggre=True, ishir=True, seed=0)
        raw = S12GlobeDataset(str(tmp_path / "dl.csv"), str(tmp_path),
                              aug=False, device_aug=True, **kw)
        s = raw[0]
        assert set(s) == {"image", "height", "path"}
        assert s["height"].dtype == np.uint8  # 4x fewer relay bytes
        # the image matches the host path's un-augmented normalised image
        full = S12GlobeDataset(str(tmp_path / "dl.csv"), str(tmp_path),
                               aug=False, **kw)
        f = full[0]
        np.testing.assert_array_equal(s["image"], f["image"])
        np.testing.assert_array_equal(s["height"].astype(np.float32),
                                      f["height"])
        # in-jit target building reproduces the host targets bit-exactly
        out = da.build_targets(jnp.asarray(s["height"]),
                               jnp.asarray(raw.buildhir),
                               jnp.asarray(raw.heightweight), isaggre=True)
        np.testing.assert_array_equal(np.asarray(out["build"]), f["build"])
        np.testing.assert_array_equal(np.asarray(out["weight"]), f["weight"])
        np.testing.assert_allclose(np.asarray(out["height_aggre"]),
                                   f["height_aggre"], atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out["weight_aggre"]),
                                      f["weight_aggre"])
        # host aug + device_aug together is a config error
        with pytest.raises(ValueError, match="device_aug"):
            S12GlobeDataset(str(tmp_path / "dl.csv"), str(tmp_path),
                            aug=True, device_aug=True, **kw)

        # device_norm: raw DNs on the wire; in-jit normalise reproduces
        # the host image to <=1 float32 ulp (the host computes the affine
        # in float64 then rounds; the device is pure f32)
        rawn = S12GlobeDataset(str(tmp_path / "dl.csv"), str(tmp_path),
                               aug=False, device_aug=True, device_norm=True,
                               **kw)
        sn = rawn[0]
        assert set(sn) == {"s2", "s1", "height", "path"}
        assert sn["s2"].dtype == np.uint16
        s2n = ((jnp.asarray(sn["s2"]).astype(jnp.float32)
                - jnp.asarray(rawn.s2_off, jnp.float32))
               / jnp.asarray(rawn.s2_scale, jnp.float32))
        s1n = ((jnp.asarray(sn["s1"]).astype(jnp.float32)
                - jnp.asarray(rawn.s1_off, jnp.float32))
               / jnp.asarray(rawn.s1_scale, jnp.float32))
        img = np.asarray(jnp.clip(jnp.concatenate([s2n, s1n], -1), 0, 1))
        np.testing.assert_allclose(img, f["image"], atol=1.5e-7, rtol=0)
        with pytest.raises(ValueError, match="device_norm"):
            S12GlobeDataset(str(tmp_path / "dl.csv"), str(tmp_path),
                            aug=False, device_norm=True, **kw)


class TestBatchStatistics:
    def test_branch_probabilities_and_angle_law(self):
        """Each transform fires with p=0.5 and the angle is U(-90, 90) —
        checked by instrumenting the same key-split layout."""
        n = 400
        keys = jax.random.split(jax.random.PRNGKey(0), n)

        def draws(key):
            kf, kd, ks, kp, kr, ka = jax.random.split(key, 6)
            return (jax.random.uniform(kf) < 0.5,
                    jax.random.uniform(ks) < 0.5,
                    jax.random.uniform(kr) < 0.5,
                    jax.random.uniform(ka, (), minval=-90.0, maxval=90.0))

        f, s, r, a = jax.vmap(draws)(keys)
        for p in (np.mean(np.asarray(f)), np.mean(np.asarray(s)),
                  np.mean(np.asarray(r))):
            assert 0.4 < p < 0.6
        a = np.asarray(a)
        assert a.min() >= -90 and a.max() <= 90
        assert abs(a.mean()) < 10

    def test_augment_batch_shapes_and_untouched_prob(self):
        img, height = _rand_pair(8)
        imgs = jnp.asarray(np.stack([img] * 16))
        hts = jnp.asarray(np.stack([height] * 16))
        ai, ah = jax.jit(da.augment_batch)(jax.random.PRNGKey(1), imgs, hts)
        assert ai.shape == imgs.shape and ah.shape == hts.shape
        # with p=(1/2)^3 a sample passes through untouched; over 16 samples
        # at least one transform should have fired
        assert not np.allclose(np.asarray(ai), np.asarray(imgs))
        # heights stay integer-valued under flips/shuffles/nearest rotation
        ah = np.asarray(ah)
        np.testing.assert_array_equal(ah, np.round(ah))

    def test_uint8_height_path_matches_float(self):
        """device_aug ships heights as uint8 (4x fewer relay bytes); the
        augmented result must match the float path exactly (all height ops
        are gathers/permutations)."""
        img, height = _rand_pair(11)
        h8 = height.astype(np.uint8)
        for i in range(6):
            key = jax.random.fold_in(jax.random.PRNGKey(5), i)
            _, a8 = da.augment_sample(key, jnp.asarray(img), jnp.asarray(h8))
            _, af = da.augment_sample(key, jnp.asarray(img),
                                      jnp.asarray(height))
            assert np.asarray(a8).dtype == np.uint8
            np.testing.assert_array_equal(np.asarray(a8).astype(np.float32),
                                          np.asarray(af))

    def test_augment_sample_joint_geometry(self):
        """Image and mask must receive the SAME transform: augment a
        height-derived image and check it stays consistent with the mask."""
        scale = 4
        rng = np.random.default_rng(9)
        height = rng.integers(0, 250, (64, 64)).astype(np.float32)
        # image = block-mean of height (values in [0,250)) -> after a joint
        # block-aligned permutation, the relation is preserved exactly
        img = height.reshape(16, scale, 16, scale).mean((1, 3))[..., None]
        for i in range(8):
            key = jax.random.fold_in(jax.random.PRNGKey(2), i)
            kf, kd, ks, kp, kr, ka = jax.random.split(key, 6)
            if bool(jax.random.uniform(kr) < 0.5):
                continue  # rotation interpolates; relation only holds without
            ai, ah = da.augment_sample(key, jnp.asarray(img),
                                       jnp.asarray(height), scale)
            want = np.asarray(ah).reshape(16, scale, 16, scale).mean((1, 3))
            np.testing.assert_allclose(np.asarray(ai)[..., 0], want,
                                       atol=1e-4)
