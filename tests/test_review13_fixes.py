"""Regression tests for the thirteenth adversarial-review findings."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestNpzKeyRoundtrip:
    def test_spectral_norm_sigma_keys_survive(self, tmp_path):
        """SpectralNorm stats keys contain '/' ('conv1/kernel/sigma'); the
        old '/'-joined npz flattening silently re-nested them on load."""
        from srbh_tpu.train.convert import load_tree_npz, save_tree_npz

        tree = {"batch_stats": {"conv1_sn": {
            "conv1/kernel/sigma": np.float32(0.7),
            "conv1/kernel/u0": np.ones((1, 4), np.float32)}},
            "params": {"conv1": {"kernel": np.zeros((3, 3, 1, 4),
                                                    np.float32)}}}
        path = str(tmp_path / "t.npz")
        save_tree_npz(path, tree)
        back = load_tree_npz(path)
        assert set(back["batch_stats"]["conv1_sn"]) == {
            "conv1/kernel/sigma", "conv1/kernel/u0"}
        assert back["batch_stats"]["conv1_sn"]["conv1/kernel/sigma"] == \
            pytest.approx(0.7)


class TestNativeTruncatedChunks:
    def test_short_packbits_zero_fills(self):
        """A truncated chunk must zero-fill the tail like the Python path,
        not return uninitialised heap memory."""
        from srbh_tpu import native

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        # one literal run of 4 bytes, but 16 expected
        data = bytes([3, 1, 2, 3, 4])
        out = native.packbits_decode(data, 16)
        assert out is not None and len(out) == 16
        assert out[:4] == bytes([1, 2, 3, 4])
        assert out[4:] == bytes(12), "tail must be zero-filled"
        # determinism across calls (np.empty garbage would vary)
        assert out == native.packbits_decode(data, 16)


class TestStripWindowOverflow:
    def test_xoff_beyond_width_zero_fills(self, tmp_path):
        """Striped files raised a raw numpy broadcast error for windows
        starting past the right edge; tiled files zero-fill — both must."""
        from srbh_tpu.data.tiff import TiffReader, write_tiff

        path = str(tmp_path / "s.tif")
        write_tiff(path, np.arange(64, dtype=np.uint8).reshape(8, 8),
                   (0.0, 1.0, 0.0, 8.0, 0.0, -1.0))
        r = TiffReader(path)
        out = r.read((9, 0, 4, 4))
        assert out.shape == (4, 4, 1)
        assert (np.asarray(out) == 0).all()
        part = r.read((6, 0, 4, 4))  # straddles the right edge
        assert (np.asarray(part)[:, 2:] == 0).all()


class TestDbfSpecPreserved:
    def test_explicit_decimals_survive_none_first_value(self, tmp_path):
        from srbh_tpu.data.shapefile import (ShapeRecord, read_shapefile,
                                             update_dbf_fields,
                                             write_shapefile)

        shp = str(tmp_path / "g.shp")
        recs = [ShapeRecord((0.0, 0.0, 1.0, 1.0)),
                ShapeRecord((1.0, 0.0, 2.0, 1.0))]
        write_shapefile(shp, recs)
        update_dbf_fields(shp, [("score", "N", 19, 6)], [[None, 3.75]])
        back = read_shapefile(shp)
        assert back[0].attributes["score"] is None
        assert back[1].attributes["score"] == pytest.approx(3.75)


class TestLossReferenceSemantics:
    def test_explog_linear_ce_term(self):
        """dice_loss.py:480-503: exp-log applies to the dice term only."""
        from srbh_tpu.losses import segmentation as seg

        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 4, (2, 8, 8)))
        got = float(seg.explog_loss(logits, labels, gamma=0.3))
        dc = float(seg.soft_dice_loss(logits, labels))
        ce = float(seg.weighted_ce_loss(logits, labels))
        want = 0.8 * (-np.log(np.clip(-dc, 1e-6, None))) ** 0.3 + 0.2 * ce
        assert got == pytest.approx(want, rel=1e-5)

    def test_dist_penalized_ce_ignores_map(self):
        """ND_Crossentropy.py:205-208: the weighting is dead code — the
        reference returns the UNWEIGHTED mean."""
        from srbh_tpu.losses import segmentation as seg

        rng = np.random.default_rng(5)
        logits = jnp.asarray(rng.normal(size=(1, 6, 6, 2)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 2, (1, 6, 6)))
        base = float(seg.dist_penalized_ce(logits, labels,
                                           jnp.zeros((1, 6, 6))))
        heavy = float(seg.dist_penalized_ce(logits, labels,
                                            jnp.full((1, 6, 6), 9.0)))
        assert base == pytest.approx(heavy)
        assert base == pytest.approx(
            float(seg.weighted_ce_loss(logits, labels)), rel=1e-6)

    def test_log_ssim_same_padding_torch_oracle(self):
        """LOGSSIM twin vs an executed torch replica of
        losses_pytorch/ssim_loss.py:68-90 (SAME zero-pad, [0,1] consts)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from srbh_tpu.losses.ssim_loss import _window, log_ssim_loss

        rng = np.random.default_rng(7)
        x = rng.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

        win = np.asarray(_window(11, 1.5), np.float32)
        w = torch.from_numpy(win).reshape(1, 1, 11, 11)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
        mu1 = F.conv2d(xt, w, padding=5)
        mu2 = F.conv2d(yt, w, padding=5)
        s1 = F.conv2d(xt * xt, w, padding=5) - mu1 ** 2
        s2 = F.conv2d(yt * yt, w, padding=5) - mu2 ** 2
        s12 = F.conv2d(xt * yt, w, padding=5) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
        smap = (smap - smap.min()) / (smap.max() - smap.min())
        want = float((-torch.log(smap + 1e-8)).mean())

        got = float(log_ssim_loss(jnp.asarray(x), jnp.asarray(y)))
        assert got == pytest.approx(want, rel=1e-4)

    def test_path_regularize_layer_mean(self):
        """SR/srloss.py:317: path length = sqrt(mean over L of sum over D)
        — L layers of identical latents must give the SAME length as one."""
        from srbh_tpu.losses.sr import g_path_regularize

        def fake_fn(z):  # (B, L, D) -> image built from the layer mean
            v = z.mean(1)  # (B, D)
            return jnp.tile(v[:, None, None, :2], (1, 8, 8, 1))

        z1 = jnp.ones((2, 1, 4))
        z4 = jnp.ones((2, 4, 4))
        key = jax.random.PRNGKey(0)
        _, pl1, _ = g_path_regularize(
            lambda z: fake_fn(z.reshape(z.shape[0], 1, 4)),
            z1.reshape(2, 1, 4), jnp.float32(0.0), key=key)
        _, pl4, _ = g_path_regularize(
            lambda z: fake_fn(z), z4, jnp.float32(0.0), key=key)
        # grad wrt each of the L layers is 1/L of the single-layer grad;
        # sum over D then MEAN over L gives lengths scaled by 1/L (the old
        # flattened-sum form gave 1/sqrt(L) — distinguishable)
        assert float(pl4) == pytest.approx(float(pl1) / 4.0, rel=1e-4)
