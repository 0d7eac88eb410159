"""Aux loss library: sanity + oracle checks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.losses import segmentation as seg
from srbh_tpu.losses import ssim_loss as sl

torch = pytest.importorskip("torch")


def rand_batch(seed=0, n=2, hw=8, c=4):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, hw, hw, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(n, hw, hw))
    return jnp.asarray(logits), jnp.asarray(labels)


class TestDiceFamily:
    def test_perfect_prediction_bounds(self):
        labels = jnp.asarray(np.random.default_rng(0).integers(0, 3, (2, 8, 8)))
        logits = jax.nn.one_hot(labels, 3) * 100.0  # near-certain
        assert float(seg.soft_dice_loss(logits, labels)) < -0.99
        assert float(seg.iou_loss(logits, labels)) < -0.99
        assert float(seg.tversky_loss(logits, labels)) < -0.99
        # reference GDiceLoss returns NEGATIVE dice (dice_loss.py:122-126)
        assert float(seg.gdice_loss(logits, labels)) < -0.99
        assert float(seg.lovasz_softmax(jax.nn.softmax(logits, -1), labels)) < 0.01

    def test_all_finite_on_random(self):
        logits, labels = rand_batch()
        fns = [
            lambda: seg.soft_dice_loss(logits, labels),
            lambda: seg.soft_dice_loss(logits, labels, batch_dice=True, do_bg=False),
            lambda: seg.iou_loss(logits, labels),
            lambda: seg.tversky_loss(logits, labels),
            lambda: seg.focal_tversky_loss(logits, labels),
            lambda: seg.asym_loss(logits, labels),
            lambda: seg.ss_loss(logits, labels),
            lambda: seg.gdice_loss(logits, labels),
            lambda: seg.focal_loss(logits, labels),
            lambda: seg.focal_loss(logits, labels, alpha=0.25),
            lambda: seg.focal_loss(logits, labels, alpha=[1, 2, 3, 4]),
            lambda: seg.lovasz_softmax(jax.nn.softmax(logits, -1), labels),
            lambda: seg.topk_ce_loss(logits, labels),
            lambda: seg.weighted_ce_loss(logits, labels, [1, 2, 1, 0.5]),
            lambda: seg.dc_and_ce_loss(logits, labels),
            lambda: seg.dc_and_topk_loss(logits, labels),
            lambda: seg.explog_loss(logits, labels),
        ]
        for fn in fns:
            assert np.isfinite(float(fn())), fn

    def test_tversky_reduces_to_dice(self):
        logits, labels = rand_batch(1)
        # equality holds only as smooth -> 0 (dice smooths numerator by s,
        # tversky by s; the /2 factor differs otherwise)
        tv = float(seg.tversky_loss(logits, labels, alpha=0.5, beta=0.5,
                                    smooth=1e-8))
        dc = float(seg.soft_dice_loss(logits, labels, smooth=1e-8))
        assert tv == pytest.approx(dc, abs=1e-5)

    def test_focal_gamma0_is_weighted_ce(self):
        # gamma=0, uniform alpha, no smoothing -> plain CE
        logits, labels = rand_batch(2)
        f = float(seg.focal_loss(logits, labels, gamma=0.0, smooth=None))
        ce = float(torch.nn.functional.cross_entropy(
            torch.from_numpy(np.array(logits)).permute(0, 3, 1, 2),
            torch.from_numpy(np.array(labels)).long()))
        assert f == pytest.approx(ce, abs=1e-5)

    def test_nll_loss_matches_torch(self):
        # nll_loss (ND_Crossentropy.py:211-220): mean of -log_probs picked
        # at the label indices.
        rng = np.random.default_rng(7)
        logp = np.log(rng.dirichlet(np.ones(5), size=16)).astype(np.float32)
        labels = rng.integers(0, 5, size=16)
        want = float(torch.nn.functional.nll_loss(
            torch.from_numpy(logp), torch.from_numpy(labels).long()))
        got = float(seg.nll_loss(jnp.asarray(logp), jnp.asarray(labels)))
        assert got == pytest.approx(want, abs=1e-6)

    def test_topk_matches_torch_topk(self):
        logits, labels = rand_batch(3)
        lt = torch.from_numpy(np.array(logits)).permute(0, 3, 1, 2)
        rt = torch.from_numpy(np.array(labels)).long()
        ce = torch.nn.functional.cross_entropy(lt, rt, reduction="none").view(-1)
        k = int(ce.numel() * 0.1)
        want = float(ce.topk(k)[0].mean())
        got = float(seg.topk_ce_loss(logits, labels, k=10.0))
        assert got == pytest.approx(want, abs=1e-5)


class TestBoundaryLosses:
    def test_distance_transform_and_bd(self):
        labels = np.zeros((1, 8, 8), np.int64)
        labels[0, 2:6, 2:6] = 1
        dt = seg.one_hot_distance_transform(labels, 2, signed=True)
        assert dt.shape == (1, 8, 8, 2)
        assert dt[0, 0, 0, 1] > 0        # outside class-1: positive
        assert dt[0, 4, 4, 1] < 0        # inside: negative
        logits = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 8, 8, 2)).astype(np.float32))
        v = float(seg.boundary_loss(logits, jnp.asarray(dt)))
        assert np.isfinite(v)
        v2 = float(seg.dc_and_bd_loss(logits, jnp.asarray(labels), jnp.asarray(dt)))
        assert np.isfinite(v2)

    def test_hausdorff_dt(self):
        labels = np.zeros((1, 8, 8), np.int64)
        labels[0, 2:6, 2:6] = 1
        dtg = seg.one_hot_distance_transform(labels, 2, signed=False)[..., 1]
        logits = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 8, 8, 2)).astype(np.float32))
        v = float(seg.hausdorff_dt_loss(logits, jnp.asarray(labels),
                                        jnp.asarray(dtg), jnp.asarray(dtg)))
        assert np.isfinite(v) and v >= 0


class TestComposites:
    def test_bce_family_and_hausdorff_er(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(1, 32, 32, 1)).astype(np.float32))
        t = jnp.asarray((rng.random((1, 32, 32, 1)) > 0.5).astype(np.float32))
        assert np.isfinite(float(seg.bce_ssim_iou_loss(logits, t)))
        assert np.isfinite(float(seg.bce_dice_loss(logits, t)))
        # BD term = MSE(pbd, rbd/255) on a separate boundary head
        # (myloss.py:73-90)
        pbd = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
        rbd = jnp.asarray((rng.random((1, 32, 32, 1)) > 0.5) * 255.0)
        assert np.isfinite(float(seg.bce_ssim_iou_bd_loss(logits, t, pbd, rbd)))
        ml = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
        lab = jnp.asarray(rng.integers(0, 3, (1, 16, 16)))
        assert np.isfinite(float(seg.ce_dice_iou_loss(ml, lab)))
        # hausdorff ER is a binary loss (class-1 prob vs labels > 0)
        lab2 = jnp.asarray(rng.integers(0, 2, (1, 16, 16)))
        ml2 = jnp.asarray(rng.normal(size=(1, 16, 16, 2)).astype(np.float32))
        v = float(seg.hausdorff_er_loss(ml2, lab2))
        assert np.isfinite(v) and v >= 0
        # perfect prediction -> near-zero erosion loss
        perfect = jax.nn.one_hot(lab2, 2) * 100.0
        assert float(seg.hausdorff_er_loss(perfect, lab2)) < 1e-4


class TestSSIMLosses:
    def test_identical_images_zero_loss(self):
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 255, (2, 32, 32, 3)).astype(np.float32))
        assert float(sl.ssim_loss(x, x)) == pytest.approx(0.0, abs=1e-5)

    def test_noise_increases_loss(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 255, (1, 64, 64, 1)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 30, x.shape), 0, 255).astype(np.float32)
        l_noisy = float(sl.ssim_loss(jnp.asarray(x), jnp.asarray(y)))
        assert 0 < l_noisy < 1

    def test_ms_ssim(self):
        x = jnp.asarray(np.random.default_rng(2).uniform(
            0, 255, (1, 192, 192, 1)).astype(np.float32))
        v = sl.ms_ssim(x, x)
        np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-4)
        assert float(sl.ms_ssim_loss(x, x)) == pytest.approx(0.0, abs=1e-4)

    def test_ssim_matches_reference_formula(self):
        # vs the f64 host implementation on the same scale
        from srbh_tpu.metrics.image import calculate_ssim

        rng = np.random.default_rng(3)
        a = rng.uniform(0, 255, (24, 24, 1)).astype(np.float64)
        b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)
        want = calculate_ssim(a, b)
        got = float(sl.ssim(jnp.asarray(a[None], jnp.float32),
                            jnp.asarray(b[None], jnp.float32))[0])
        assert abs(got - want) < 1e-3


class TestTorchParityOracles:
    """The review-fixed losses pinned against verbatim torch ports of the
    reference code (TVLoss srloss.py:251-274, GDiceLoss dice_loss.py:84-128,
    IOU iou_loss.py:6-28)."""

    def test_tv_gdice_iou_match_reference(self):
        torch = pytest.importorskip("torch")
        from srbh_tpu.losses.sr import tv_loss

        rng = np.random.RandomState(3)
        x = rng.random((4, 16, 16, 3)).astype(np.float32)
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        bs, c, h, w = t.shape
        h_tv = ((t[:, :, 1:] - t[:, :, :-1]) ** 2).sum()
        w_tv = ((t[..., 1:] - t[..., :-1]) ** 2).sum()
        ref = float(2 * (h_tv / (c * (h - 1) * w)
                         + w_tv / (c * h * (w - 1))) / bs)
        assert abs(ref - float(tv_loss(jnp.asarray(x)))) < 1e-6

        logits = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
        labels = rng.randint(0, 3, (4, 8, 8))
        probs = torch.softmax(torch.from_numpy(logits.transpose(0, 3, 1, 2)), 1)
        onehot = torch.nn.functional.one_hot(
            torch.from_numpy(labels).long(), 3).permute(0, 3, 1, 2).float()
        wt = 1.0 / (torch.einsum("bcxy->bc", onehot) + 1e-10) ** 2
        inter = wt * torch.einsum("bcxy,bcxy->bc", probs, onehot)
        union = wt * (torch.einsum("bcxy->bc", probs)
                      + torch.einsum("bcxy->bc", onehot))
        ref_gd = float((-2 * (inter.sum(1) + 1e-5)
                        / (union.sum(1) + 1e-5)).mean())
        got_gd = float(seg.gdice_loss(jnp.asarray(logits),
                                      jnp.asarray(labels)))
        assert abs(ref_gd - got_gd) < 1e-5

        p = rng.random((4, 8, 8, 1)).astype(np.float32)
        g = (rng.random((4, 8, 8, 1)) > 0.5).astype(np.float32)
        tp, tg = torch.from_numpy(p), torch.from_numpy(g)
        ref_iou = float(np.mean([
            float(1 - (tg[i] * tp[i]).sum()
                  / (tg[i].sum() + tp[i].sum() - (tg[i] * tp[i]).sum()))
            for i in range(4)]))
        got_iou = float(seg._binary_iou(jnp.asarray(p), jnp.asarray(g)))
        assert abs(ref_iou - got_iou) < 1e-6


class TestLongTailLosses:
    """The last reference losses: GDiceLossV2, PenaltyGDice, DistBinaryDice,
    BCE_IOU / BCE_SSIM, LOGSSIM."""

    def test_gdice_v2_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(7)
        logits = rng.normal(size=(3, 8, 8, 4)).astype(np.float32)
        labels = rng.randint(0, 4, (3, 8, 8))
        # verbatim torch port of GDiceLossV2 (dice_loss.py:143-190)
        probs = torch.softmax(torch.from_numpy(logits.transpose(0, 3, 1, 2)), 1)
        onehot = torch.nn.functional.one_hot(
            torch.from_numpy(labels).long(), 4).permute(0, 3, 1, 2).float()
        inp = probs.permute(1, 0, 2, 3).reshape(4, -1)
        tgt = onehot.permute(1, 0, 2, 3).reshape(4, -1)
        tsum = tgt.sum(-1)
        w = 1.0 / (tsum * tsum).clamp(min=1e-5)
        inter = ((inp * tgt).sum(-1) * w).sum()
        denom = (((inp + tgt).sum(-1) * w).sum()).clamp(min=1e-5)
        ref = float(-2.0 * inter / denom)
        got = float(seg.gdice_loss_v2(jnp.asarray(logits), jnp.asarray(labels)))
        assert abs(ref - got) < 1e-5

    def test_penalty_gdice_formula(self):
        logits, labels = rand_batch(5)
        gdc = float(seg.gdice_loss(logits, labels))
        want = gdc / (1 + 2.5 * (1 - gdc))
        got = float(seg.penalty_gdice_loss(logits, labels))
        assert abs(want - got) < 1e-6
        # a perfect prediction keeps gdc ~ -1 -> penalty ~ -1/6
        perfect = jax.nn.one_hot(labels, logits.shape[-1]) * 100.0
        assert abs(float(seg.penalty_gdice_loss(perfect, labels)) + 1 / 6) < 1e-2

    def test_dist_binary_dice_matches_reference_math(self):
        pytest.importorskip("scipy")
        rng = np.random.RandomState(9)
        labels = np.zeros((2, 12, 12), np.int64)
        labels[0, 3:9, 3:9] = 1
        labels[1, 1:5, 6:11] = 1
        logits = rng.normal(size=(2, 12, 12, 2)).astype(np.float32)
        dist = seg.edts_penalized_map(labels > 0) + 1.0
        # numpy port of DistBinaryDiceLoss.forward (boundary_loss.py:192-241)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = (e / e.sum(-1, keepdims=True))[..., 1]
        gt = (labels > 0).astype(np.float64)
        tp = (probs * gt * dist).sum((1, 2))
        dc = (2 * tp + 1e-5) / (probs.sum((1, 2)) + gt.sum((1, 2)) + 1e-5)
        ref = float(-dc.mean())
        got = float(seg.dist_binary_dice_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(dist)))
        assert abs(ref - got) < 1e-5
        # weight map: 1 at boundaries decaying to 0 inward, per side
        assert dist.min() >= 1.0 and dist.max() <= 2.0 + 1e-6

    def test_bce_composites_decompose(self):
        rng = np.random.default_rng(11)
        logits = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
        t = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32))
        bce = float(seg._bce_with_logits(logits, t))
        iou = float(seg._binary_iou(jax.nn.sigmoid(logits), t))
        assert float(seg.bce_iou_loss(logits, t)) == pytest.approx(
            bce + iou, abs=1e-6)
        got_ssim = float(seg.bce_ssim_loss(logits, t)) - bce
        assert 0 < got_ssim < 1.2  # 1 - SSIM of noise vs mask
        # the 3-term composite = BCE_SSIM + IOU exactly (myloss.py:20-35)
        assert float(seg.bce_ssim_iou_loss(logits, t)) == pytest.approx(
            float(seg.bce_ssim_loss(logits, t)) + iou, abs=1e-6)

    def test_log_ssim_loss(self):
        rng = np.random.default_rng(13)
        x = rng.uniform(0, 255, (1, 32, 32, 1)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 25, x.shape), 0, 255).astype(np.float32)
        v = float(sl.log_ssim_loss(jnp.asarray(x), jnp.asarray(y)))
        assert np.isfinite(v) and v > 0
        # worse structure -> larger penalty than 1-ssim on the same pair
        z = rng.uniform(0, 255, x.shape).astype(np.float32)
        v2 = float(sl.log_ssim_loss(jnp.asarray(x), jnp.asarray(z)))
        assert v2 > 0
