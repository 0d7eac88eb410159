"""Aux components: trainable-SR model variants, ramps, poly-warmup AdamW,
numpy seg scores, sliding-window helper, CAM utils."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestSRRegressVariants:
    def test_decision_variant(self):
        from srbh_tpu.models.sr_regress import SRRegressClsDecision

        m = SRRegressClsDecision(encoder_name="efficientnet-test",
                                 super_in=4, super_mid=8)
        x = jnp.zeros((1, 32, 32, 8))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        sup, height, build = jax.jit(m.apply)(v, x)
        assert sup.shape == (1, 128, 128, 3)
        assert height.shape == (1, 128, 128, 1)
        assert build.shape == (1, 128, 128, 2)

    def test_sr_regress(self):
        from srbh_tpu.models.sr_regress import SRRegress

        m = SRRegress(encoder_name="efficientnet-test", super_channels=4)
        x = jnp.zeros((1, 16, 16, 8))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(m.apply)(v, x)
        assert out.shape == (1, 64, 64, 1)  # regression at SR resolution


class TestRampsAndOptim:
    def test_ramps(self):
        from srbh_tpu.utils.ramps import cosine_rampdown, linear_rampup, sigmoid_rampup

        assert sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5))
        assert sigmoid_rampup(10, 10) == 1.0
        assert linear_rampup(5, 10) == 0.5
        assert cosine_rampdown(0, 10) == 1.0
        assert cosine_rampdown(10, 10) == pytest.approx(0.0)

    def test_poly_warmup_schedule(self):
        from srbh_tpu.train.optimizers import poly_warmup_adamw, poly_warmup_schedule

        s = poly_warmup_schedule(1e-3, warmup_iter=10, max_iter=100, power=0.9)
        assert float(s(0)) == pytest.approx(1e-9, rel=0.05)  # f32 roundoff
        assert float(s(10)) == pytest.approx(1e-3 * (0.9**0.9), rel=1e-3)
        assert float(s(100)) == 0.0
        tx = poly_warmup_adamw(1e-3, 0.01)
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()

    def test_eval_seg_scores(self):
        from srbh_tpu.utils.eval_seg import scores

        gt = np.array([[0, 0], [1, 1]])
        pred = np.array([[0, 1], [1, 1]])
        r = scores([gt], [pred], num_classes=2)
        assert r["Pixel Accuracy"] == 0.75
        assert 0 < r["Mean IoU"] <= 1


class TestSlidingWindow:
    def test_blend_is_exact_for_identity(self):
        from srbh_tpu.predict.sliding import predict_whole_image, window_anchors

        assert window_anchors(100, 64, 60) == [0, 36]
        rng = np.random.default_rng(0)
        img = rng.random((100, 120, 2)).astype(np.float32)
        out = predict_whole_image(
            img, lambda b: b[..., :1], grid=64, stride=60, out_channels=1)
        np.testing.assert_allclose(out[..., 0], img[..., 0], atol=1e-6)

    def test_upscaled_output(self):
        from srbh_tpu.predict.sliding import predict_whole_image

        img = np.ones((64, 64, 1), np.float32)
        out = predict_whole_image(
            img, lambda b: np.repeat(np.repeat(b, 2, 1), 2, 2),
            grid=32, stride=30, out_scale=2)
        assert out.shape == (128, 128, 1)
        np.testing.assert_allclose(out, 1.0)


class TestCAM:
    def test_multi_scale_cam_and_label(self):
        from srbh_tpu.utils.cam import cam_to_label, multi_scale_cam

        rng = np.random.default_rng(0)
        img = rng.random((2, 32, 32, 3)).astype(np.float32)

        def cam_fn(x):  # a fake "model": channel-mean heatmaps, 3 classes
            base = x.mean(-1, keepdims=True)
            return np.concatenate([base, base * 0.5, base * 0.1], axis=-1)

        cams = multi_scale_cam(cam_fn, img)
        assert cams.shape == (2, 32, 32, 3)
        assert cams.min() >= 0 and cams.max() <= 1
        labels = cam_to_label(cams, bkg_thre=0.3)
        assert set(np.unique(labels)) <= {0, 1, 2, 3, 255}

    def test_crf_refine_sharpens(self):
        from srbh_tpu.utils.cam import crf_refine

        prob = np.full((16, 16, 2), 0.5, np.float32)
        prob[4:12, 4:12, 0] = 0.8
        prob[4:12, 4:12, 1] = 0.2
        img = np.zeros((16, 16, 3), np.float32)
        out = crf_refine(prob, img, iters=3)
        assert out.shape == prob.shape
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
        assert out[8, 8, 0] > 0.8  # confident interior got sharper


class TestCAMVariants:
    """camutils.py:27-175 multi-scale drivers + make_cam + compute_seg_label."""

    @staticmethod
    def _image(n=2, h=24, w=24, c=3, seed=0):
        return np.random.default_rng(seed).uniform(
            0, 1, (n, h, w, c)).astype(np.float32)

    @staticmethod
    def _cam_fn(images):
        # deterministic pseudo-CAM: per-class channel mixtures
        x = np.asarray(images, np.float32)
        return np.stack([x.mean(-1), x[..., 0] - x[..., 1]], axis=-1)

    def test_puzzle_and_seam(self):
        from srbh_tpu.utils.cam import multi_scale_puzzle, multi_scale_seam

        img = self._image()
        cam = multi_scale_puzzle(self._cam_fn, img, scales=(0.5, 1.5))
        assert cam.shape == (2, 24, 24, 2)
        assert float(cam.min()) >= 0 and float(cam.max()) <= 1.0 + 1e-6
        # seam: tuple-returning model, head selection
        fn = lambda x: (self._cam_fn(x), self._cam_fn(x) * 2)
        cam0 = multi_scale_seam(fn, img, scales=(0.5,), pos=0)
        cam1 = multi_scale_seam(fn, img, scales=(0.5,), pos=1)
        assert cam0.shape == cam1.shape == (2, 24, 24, 2)

    def test_multistage_variants(self):
        from srbh_tpu.utils.cam import (multi_scale_cam_multistage,
                                        multi_scale_cam_multistage_v2)

        img = self._image(seed=1)
        fn = lambda x: [self._cam_fn(x), self._cam_fn(x) * 0.5]
        cam = multi_scale_cam_multistage(fn, img, scales=(0.5,))
        v2 = multi_scale_cam_multistage_v2(fn, img, scales=(1.0, 0.5),
                                           weights=(1, 2, 1, 1))
        for c in (cam, v2):
            assert c.shape == (2, 24, 24, 2)
            assert float(c.min()) >= 0 and float(c.max()) <= 1.0 + 1e-6

    def test_make_cam_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from srbh_tpu.utils.cam import make_cam

        x = np.random.default_rng(2).normal(size=(2, 8, 8, 3)).astype(np.float32)
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tr = F.relu(t)
        mx = tr.reshape(2, 3, -1).max(-1)[0].view(2, 3, 1, 1)
        want = (F.relu(tr - 1e-5) / (mx + 1e-5)).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(make_cam(x), want, atol=1e-6)

    def test_compute_seg_label(self):
        pytest.importorskip("scipy")
        from srbh_tpu.utils.cam import compute_seg_label

        rng = np.random.default_rng(3)
        h = w = 24
        image = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        # graded class-1 blob: strict top-40% carving needs varied scores
        # (a constant blob is all-ignore in the reference too)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        blob = np.maximum(0.0, 1.0 - 0.18 * np.hypot(yy - 8, xx - 8))
        norm_cam = np.zeros((4, h, w), np.float32)
        norm_cam[1] = blob
        cam_label = np.array([0, 1, 0, 0], np.float32)
        lab = compute_seg_label(image, cam_label, norm_cam)
        assert lab.shape == (h, w)
        assert set(np.unique(lab)) <= {0, 2, 255}  # class 1 -> label 2
        # the blob core should be carved as the foreground class
        assert (lab[6:10, 6:10] == 2).any()
