"""Losses and streaming metrics vs torch oracles and hand-derived values."""
import numpy as np
import pytest

import jax.numpy as jnp

from srbh_tpu import losses
from srbh_tpu.metrics import (
    AverageMeter,
    HeightMetric,
    SegmentationMetric,
)
from srbh_tpu.ops.hierarchy import build_hierarchy_lut

torch = pytest.importorskip("torch")


class TestAdaptiveLosses:
    def test_mse_adapt_weight_matches_formula(self):
        rng = np.random.default_rng(0)
        pred = rng.normal(size=(2, 8, 8)).astype(np.float32)
        tgt = rng.normal(size=(2, 8, 8)).astype(np.float32)
        w = rng.uniform(0.5, 2.0, size=(2, 8, 8)).astype(np.float32)
        log_var = 0.3
        # torch oracle of selfloss.py:81-90
        t = torch.nn.functional.mse_loss(
            torch.from_numpy(pred), torch.from_numpy(tgt), reduction="none")
        t = (t * torch.from_numpy(w)).mean()
        want = float(t * np.exp(-log_var) + log_var)
        got = float(losses.mse_adapt_weight(
            jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w),
            jnp.asarray(log_var)))
        assert abs(got - want) < 1e-5

    def test_ce_matches_torch(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(2, 4, 4, 7)).astype(np.float32)
        labels = rng.integers(0, 7, size=(2, 4, 4))
        want = float(torch.nn.functional.cross_entropy(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels)))
        got = float(losses.softmax_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels)))
        assert abs(got - want) < 1e-5

    def test_ce_dice_adapt_weight_matches_torch_oracle(self):
        rng = np.random.default_rng(2)
        logits = rng.normal(size=(2, 4, 4, 7)).astype(np.float32)
        labels = rng.integers(0, 7, size=(2, 4, 4))
        w = rng.uniform(0.5, 2.0, size=(2, 4, 4)).astype(np.float32)
        log_var = -0.2
        # oracle: selfloss.py:145-168 re-derived in torch
        lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
        rt = torch.from_numpy(labels)
        ce = torch.nn.functional.cross_entropy(lt, rt, reduction="none")
        ce = (ce * torch.from_numpy(w)).mean()
        pm = lt.softmax(dim=1)[:, 1:].sum(dim=1)
        m1 = pm.reshape(pm.shape[0], -1)
        m2 = (rt > 0).float().reshape(pm.shape[0], -1)
        inter = (m1 * m2).sum()
        dice = 1 - (2 * inter + 1.0) / (m1.sum() + m2.sum() + 1.0)
        want = float((ce + dice) * np.exp(-log_var) + log_var)
        got = float(losses.ce_dice_adapt_weight(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w),
            jnp.asarray(log_var)))
        assert abs(got - want) < 1e-5

    def test_mse_adapt_weight_hir(self):
        lut = jnp.asarray(build_hierarchy_lut())
        hw = jnp.asarray(np.linspace(0.1, 3.0, 7).astype(np.float32))
        pred = jnp.zeros((1, 4, 4))
        tgt = jnp.full((1, 4, 4), 15.0)  # class 2 (12..20)
        got = float(losses.mse_adapt_weight_hir(pred, tgt, 0.0, lut, hw))
        want = 15.0**2 * float(hw[2])
        assert abs(got - want) < 1e-4


class TestSegmentationMetric:
    def setup_method(self):
        # the reference's own smoke tensors (metrics.py:465-470)
        self.ref = np.array([0, 0, 1, 1, 2, 2, 2, 2, 2])
        self.pred = np.array([0, 1, 0, 1, 0, 2, 0, 0, 0])

    def test_against_sklearn_style_counts(self):
        m = SegmentationMetric(3)
        m.add_batch(self.pred, self.ref)
        cm = m.confusion_matrix()  # row=ref, col=pred
        want = np.zeros((3, 3))
        for r, p in zip(self.ref, self.pred):
            want[r, p] += 1
        np.testing.assert_array_equal(cm, want)
        assert abs(m.overall_accuracy() - 3 / 9) < 1e-12
        # iou class0: inter 1, union = row0(2) + col0(6) - 1 = 7
        np.testing.assert_allclose(m.iou()[0], 1 / 7)
        # fwiou sums, precision/recall finite
        assert 0 <= m.mfwiou() <= 1

    def test_accumulates(self):
        m = SegmentationMetric(3)
        m.add_batch(self.pred, self.ref)
        m.add_batch(self.pred, self.ref)
        assert m.confusion_matrix().sum() == 18


class TestHeightMetric:
    def test_matches_reference_accumulation(self):
        # Reference semantics: per-batch per-class rmse*count accumulation
        m = HeightMetric(num_class=7)
        pred = np.array([1.0, 2.0, 3.0, 10.0])
        ref = np.array([0.0, 2.0, 5.0, 8.0])
        cls = np.array([0, 0, 3, 3])
        m.add_batch(pred, ref, cls)
        each = m.avg_each()
        # class 0: rmse over [1,0]: sqrt(0.5); mae 0.5; me 0.5
        np.testing.assert_allclose(each[0], [np.sqrt(0.5), 0.5, 0.5], atol=1e-6)
        # class 3: diffs [-2, 2] -> rmse 2, mae 2, me 0
        np.testing.assert_allclose(each[3], [2.0, 2.0, 0.0], atol=1e-6)
        # absent classes untouched
        np.testing.assert_allclose(each[1], [0, 0, 0])
        np.testing.assert_allclose(m.count().ravel()[[0, 3]], [2, 2])
        # avg_all: count-weighted mean of batch metrics
        allr = m.avg_all()
        np.testing.assert_allclose(allr[0], (np.sqrt(0.5) * 2 + 2 * 2) / 4, atol=1e-6)

    def test_batch_order_dependence_preserved(self):
        # The reference accumulates per-batch RMSEs, so two half batches do
        # NOT equal one combined batch — replicate that quirk exactly.
        a_pred, a_ref = np.array([4.0]), np.array([0.0])
        b_pred, b_ref = np.array([0.0]), np.array([0.0])
        cls = np.array([0])
        m1 = HeightMetric(1)
        m1.add_batch(np.concatenate([a_pred, b_pred]),
                     np.concatenate([a_ref, b_ref]), np.array([0, 0]))
        m2 = HeightMetric(1)
        m2.add_batch(a_pred, a_ref, cls)
        m2.add_batch(b_pred, b_ref, cls)
        assert m1.avg_each()[0, 0] != m2.avg_each()[0, 0]
        np.testing.assert_allclose(m1.avg_each()[0, 0], np.sqrt(8.0))
        np.testing.assert_allclose(m2.avg_each()[0, 0], 2.0)


class TestWriters:
    def test_schema_matches_reference(self, tmp_path):
        from srbh_tpu.metrics import acc2file_height, acc2file_rmse, acc2file_seg

        m = SegmentationMetric(3)
        m.add_batch(np.array([0, 1, 2]), np.array([0, 1, 1]))
        seg_txt = str(tmp_path / "acc_seg.txt")
        acc2file_seg(m, seg_txt)
        import pandas as pd

        df = pd.read_csv(seg_txt[:-4] + ".csv", header=None)
        assert df.shape == (9, 4)  # 6 stat rows + 3 cm rows, 3 vals + name
        assert list(df.iloc[:, 3][:6]) == ["oa_miou_mfiou", "fiou", "iou", "f1", "ua", "pa"]

        h = HeightMetric(7)
        h.add_batch(np.array([1.0]), np.array([2.0]), np.array([0]))
        he_txt = str(tmp_path / "acc_he.txt")
        acc2file_height(h, he_txt)
        df = pd.read_csv(he_txt[:-4] + ".csv")
        assert list(df.columns) == ["rmse", "mae", "me", "count"]
        assert len(df) == 9  # 7 classes + balanced + all

        meter = AverageMeter()
        meter.update(10.586)
        rmse_txt = str(tmp_path / "acc.txt")
        acc2file_rmse(meter, rmse_txt)
        assert open(rmse_txt).read() == "10.586"


class TestMetricPrintersAndClsWriter:
    def _metric(self):
        from srbh_tpu.metrics.streaming import SegmentationMetric

        m = SegmentationMetric(2)
        pred = np.array([[0, 1, 1, 0]])
        ref = np.array([[0, 1, 0, 1]])
        m.add_batch(pred, ref)
        return m

    def test_accprint_and_plot(self, capsys):
        from srbh_tpu.metrics.streaming import accprint, plot_confusionmatrix

        m = self._metric()
        accprint(m)
        out = capsys.readouterr().out
        assert "oa, miou" in out and "numtotal: 4" in out
        plot_confusionmatrix(np.eye(2))
        out = capsys.readouterr().out
        assert "1.000 0.000" in out

    def test_acc2file_cls_schema(self, tmp_path):
        from srbh_tpu.metrics.writers import acc2file_cls

        m = self._metric()
        p = str(tmp_path / "cls.txt")
        acc2file_cls(m, p)
        lines = open(p).read().splitlines()
        assert lines[0] == "oa, miou, iou, f1, ua, pa, confusion_matrix"
        assert float(lines[1]) == pytest.approx(0.5)  # oa
        # trailing class-1 summary block: oa, f1[1], ua[1], pa[1]
        assert float(lines[-4]) == pytest.approx(0.5)
        assert float(lines[-3]) == pytest.approx(m.f1()[1])
        assert float(lines[-2]) == pytest.approx(m.precision()[1])
        assert float(lines[-1]) == pytest.approx(m.recall()[1])


class TestDeviceMetricTwins:
    """calculate_{psnr,ssim,cpsnr}_pt device twins vs host f64 metrics and
    a torch oracle of the reference code (SR/psnr_ssim.py:203-318,443-490)."""

    @staticmethod
    def _pair(seed=0, n=2, h=32, w=32, c=3):
        rng = np.random.default_rng(seed)
        a = rng.uniform(0, 1, (n, h, w, c)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
        return a, b

    def test_psnr_ssim_pt_match_host(self):
        import jax.numpy as jnp

        from srbh_tpu.metrics.image import (calculate_psnr, calculate_psnr_pt,
                                            calculate_ssim, calculate_ssim_pt)

        a, b = self._pair()
        p = np.asarray(calculate_psnr_pt(jnp.asarray(a), jnp.asarray(b)))
        s = np.asarray(calculate_ssim_pt(jnp.asarray(a), jnp.asarray(b)))
        for i in range(a.shape[0]):
            # host metric is on [0,255]; _pt reference is on [0,1] with the
            # same 255-scale formula -> identical values
            want_p = calculate_psnr(a[i] * 255.0, b[i] * 255.0)
            want_s = calculate_ssim(a[i] * 255.0, b[i] * 255.0)
            assert abs(p[i] - want_p) < 5e-3
            assert abs(s[i] - want_s) < 1e-3

    def test_cpsnr_pt_matches_torch_oracle(self):
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        from srbh_tpu.metrics.image import calculate_cpsnr_pt

        a, b = self._pair(seed=1, n=2, h=24, w=24, c=2)
        # verbatim port of calculate_cpsnr_pt (SR/psnr_ssim.py:443-490)
        i1 = torch.from_numpy(a.transpose(0, 3, 1, 2)).double()
        i2 = torch.from_numpy(b.transpose(0, 3, 1, 2)).double()
        mo = 8
        hh, ww = i1.shape[-2:]
        chh, cww = hh - mo, ww - mo
        best = None
        for ro in range(mo + 1):
            for co in range(mo + 1):
                c1 = i1[:, :, ro:, co:][:, :, :chh, :cww].clone()
                c2 = i2[:, :, mo - ro:, mo - co:][:, :, :chh, :cww].clone()
                for ci in range(i1.shape[1]):
                    c2[:, ci] += torch.mean(c1[:, ci] - c2[:, ci])
                mse = torch.mean(torch.square(c1 - c2))
                best = mse if best is None or mse < best else best
        want = float(10.0 * torch.log10(255.0 * 255.0 / best))
        got = float(calculate_cpsnr_pt(jnp.asarray(a), jnp.asarray(b)))
        assert abs(want - got) < 1e-3

    def test_y_channel_and_crop(self):
        import jax.numpy as jnp

        from srbh_tpu.metrics.image import calculate_psnr_pt

        a, b = self._pair(seed=2)
        v = np.asarray(calculate_psnr_pt(jnp.asarray(a), jnp.asarray(b),
                                         crop_border=4, test_y_channel=True))
        assert v.shape == (2,) and np.isfinite(v).all()
