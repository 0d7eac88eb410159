"""Dense-CRF refinement (utils/cam.py:crf_refine) validation.

pydensecrf is not installable here, so validation is two-pronged:
* the windowed bilateral message is checked against a brute-force dense
  O(N^2) mean-field oracle (explicit kernel matrix, same update rule) on
  a small image with sigmas where the window truncation is negligible;
* the defining BEHAVIOURAL property of the reference's crf_inference
  (utils/utils_rrm.py:6-92): the bilateral term is edge-preserving —
  label probabilities are sharpened up to a strong colour edge instead of
  blurring across it like the Gaussian-only term.
"""
import numpy as np
import pytest

from srbh_tpu.utils.cam import _bilateral_message, crf_refine


def _brute_force_mean_field(prob, image, iters, sxy, compat,
                            sxy_b, srgb, compat_b):
    """Dense O(N^2) oracle: explicit normalised kernel matrices, no self-
    message, Q = softmax(log p + sum_m compat_m * (K_m Q / K_m 1))."""
    h, w, k = prob.shape
    ys, xs = np.mgrid[0:h, 0:w]
    pos = np.stack([ys.ravel(), xs.ravel()], -1).astype(np.float64)
    rgb = image.reshape(-1, image.shape[-1]).astype(np.float64)
    d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    c2 = ((rgb[:, None] - rgb[None]) ** 2).sum(-1)
    kg = np.exp(-d2 / (2 * sxy * sxy))
    kb = np.exp(-d2 / (2 * sxy_b * sxy_b) - c2 / (2 * srgb * srgb))
    np.fill_diagonal(kg, 0.0)
    np.fill_diagonal(kb, 0.0)
    kg = kg / kg.sum(1, keepdims=True)
    kb = kb / kb.sum(1, keepdims=True)
    q = prob.reshape(-1, k).copy()
    logp = np.log(np.clip(prob.reshape(-1, k), 1e-8, 1.0))
    for _ in range(iters):
        logits = logp + compat * (kg @ q) + compat_b * (kb @ q)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        q = e / e.sum(-1, keepdims=True)
    return q.reshape(h, w, k)


class TestBilateralMessage:
    def test_matches_dense_oracle(self):
        rng = np.random.default_rng(0)
        h = w = 10
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        q = rng.dirichlet(np.ones(3), (h, w)).astype(np.float32)
        got = _bilateral_message(q, img, sxy=2.0, srgb=30.0, radius=9)
        # dense oracle of the same normalised message
        ys, xs = np.mgrid[0:h, 0:w]
        pos = np.stack([ys.ravel(), xs.ravel()], -1).astype(np.float64)
        rgb = img.reshape(-1, 3).astype(np.float64)
        d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
        c2 = ((rgb[:, None] - rgb[None]) ** 2).sum(-1)
        kb = np.exp(-d2 / (2 * 2.0 ** 2) - c2 / (2 * 30.0 ** 2))
        np.fill_diagonal(kb, 0.0)
        want = (kb @ q.reshape(-1, 3)) / kb.sum(1, keepdims=True)
        np.testing.assert_allclose(got.reshape(-1, 3), want, atol=1e-5)


class TestCrfRefine:
    def test_full_refine_matches_dense_oracle(self):
        """BOTH kernels active: the Gaussian spatial message (self-pixel
        excluded, per-pixel normalised — the pydensecrf convention) and the
        windowed bilateral message must reproduce the dense O(N^2) oracle.
        sxy=2.5 makes the ±3-sigma blur window (k=17) cover every pair of
        an 8x8 image, so the truncation is exactly zero."""
        rng = np.random.default_rng(1)
        h = w = 8
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        prob = rng.dirichlet(np.ones(4), (h, w)).astype(np.float32)
        got = crf_refine(prob, img, iters=3, sxy=2.5, compat=2.0,
                         bilateral=(2.0, 20.0, 10.0), radius=7)
        want = _brute_force_mean_field(prob, img, 3, 2.5, 2.0,
                                       2.0, 20.0, 10.0)
        np.testing.assert_allclose(got, want, atol=1e-4)
        assert (np.argmax(got, -1) == np.argmax(want, -1)).all()

    def test_bilateral_is_edge_preserving(self):
        """Two colour regions with a noisy label seed: the bilateral CRF
        must sharpen labels UP TO the edge; gaussian-only blurs across."""
        h, w = 16, 16
        img = np.zeros((h, w, 3), np.float32)
        img[:, 8:] = 200.0  # strong vertical colour edge
        rng = np.random.default_rng(2)
        prob = np.full((h, w, 2), 0.5, np.float32)
        # weak, noisy evidence: left leans class 0, right leans class 1
        prob[:, :8, 0] += rng.uniform(0, 0.2, (h, 8))
        prob[:, 8:, 1] += rng.uniform(0, 0.2, (h, 8))
        prob /= prob.sum(-1, keepdims=True)
        out = crf_refine(prob, img, iters=5, sxy=1.0, compat=1.0,
                         bilateral=(6.0, 13.0, 10.0))
        labels = np.argmax(out, -1)
        assert (labels[:, :8] == 0).mean() > 0.98
        assert (labels[:, 8:] == 1).mean() > 0.98
        # the boundary is SHARP: probabilities adjacent to the edge are
        # near-saturated, not blurred toward 0.5
        assert out[:, 7, 0].min() > 0.9
        assert out[:, 8, 1].min() > 0.9

    def test_probabilities_stay_normalised(self):
        rng = np.random.default_rng(3)
        prob = rng.dirichlet(np.ones(5), (12, 12)).astype(np.float32)
        img = rng.uniform(0, 255, (12, 12, 3)).astype(np.float32)
        out = crf_refine(prob, img, bilateral=(3.0, 13.0, 4.0))
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
        assert out.min() >= 0.0
