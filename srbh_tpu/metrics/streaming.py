"""Streaming metric accumulators (confusion matrix, height stats, averages).

Functional twins of metrics.py:

* :class:`SegmentationMetric` (metrics.py:6-86) — streaming C x C confusion
  matrix with OA / precision (UA) / recall (PA) / F1 / IoU / mIoU / FWIoU.
* :class:`HeightMetric`       (metrics.py:163-234) — per-hierarchy-class
  RMSE/MAE/ME accumulated **reference-style**: each batch contributes
  ``batch_metric * count`` (i.e. a count-weighted mean of per-batch RMSEs, not
  a global RMSE) — reproduced exactly so the ``*_he.csv`` goldens match.
* :class:`AverageMeter`       (metrics.py:143-160).

Design: the device-side update is a pure jit-able function on an int64/f64
pytree, so metrics can be accumulated inside the eval step and ``psum``-ed
across a mesh (SURVEY.md §5.5); the host wrapper only stores the running
pytree and finalises in numpy float64.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- functional

def confusion_update(cm: jnp.ndarray, pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add a batch into a (C, C) count matrix (metrics.py:71-79):
    row = label (reference), col = prediction. Out-of-range entries (e.g.
    an ignore-index of -1) are masked out — JAX's negative-index scatter
    would otherwise silently wrap them into the last class."""
    c = cm.shape[0]
    label = label.reshape(-1)
    pred = pred.reshape(-1)
    valid = (label >= 0) & (label < c) & (pred >= 0) & (pred < c)
    idx = jnp.where(valid, label * c + pred, c * c).astype(jnp.int32)
    flat = jnp.zeros((c * c + 1,), cm.dtype).at[idx].add(1)
    return cm + flat[: c * c].reshape(c, c)


# one XLA dispatch per add_batch instead of ~10-30 eager ops (the relay's
# ~10 ms/dispatch floor would otherwise dominate evaluation wall-clock)
confusion_update = jax.jit(confusion_update)


def height_update(stats: jnp.ndarray, counts: jnp.ndarray,
                  pred: jnp.ndarray, ref: jnp.ndarray,
                  buildhir: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One batch of the reference HeightMetric.addBatch (metrics.py:186-200).

    stats: (C, 3) count-weighted [rmse, mae, me] sums; counts: (C, 1).
    Classes absent from the batch contribute nothing (count == 0 guard).
    """
    num_class = stats.shape[0]
    pred = pred.reshape(-1).astype(jnp.float32)
    ref = ref.reshape(-1).astype(jnp.float32)
    cls = buildhir.reshape(-1)

    def per_class(i):
        mask = (cls == i)
        count = jnp.sum(mask.astype(jnp.float32))
        safe = jnp.maximum(count, 1.0)
        diff = jnp.where(mask, pred - ref, 0.0)
        mse = jnp.sum(diff**2) / safe
        mae = jnp.sum(jnp.abs(diff)) / safe
        me = jnp.sum(diff) / safe
        row = jnp.stack([jnp.sqrt(mse), mae, me]) * count
        return jnp.where(count > 0, row, jnp.zeros(3)), count

    rows, cnts = jax.vmap(per_class)(jnp.arange(num_class))
    return stats + rows, counts + cnts[:, None]


height_update = jax.jit(height_update)


# ------------------------------------------------------------- host wrappers

class SegmentationMetric:
    """Streaming confusion-matrix metrics (metrics.py:6-86)."""

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.reset()

    def reset(self):
        # host-side float64 totals ("int 64 is important", metrics.py:86):
        # one batch's counts are exact in f32 on device (< 2^24 pixels), the
        # running sum is not — so each batch is accumulated on device and
        # added into an exact host total
        self.cm = np.zeros((self.num_class, self.num_class), np.float64)

    def add_batch(self, pred, label):
        batch_cm = confusion_update(
            jnp.zeros((self.num_class, self.num_class), jnp.float32),
            jnp.asarray(pred), jnp.asarray(label))
        self.cm = self.cm + np.asarray(batch_cm, np.float64)

    addBatch = add_batch  # reference-compatible alias

    # finalisers (host, float64)
    def _np(self):
        return self.cm

    # 0/0 on empty classes yields nan — same semantics as the reference's
    # torch divides (metrics.py:20-29), but without numpy's RuntimeWarning
    def overall_accuracy(self):
        cm = self._np()
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.diag(cm).sum() / cm.sum()

    def precision(self):  # UA (metrics.py:20-24)
        cm = self._np()
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.diag(cm) / cm.sum(axis=0)

    def recall(self):  # PA (metrics.py:26-29)
        cm = self._np()
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.diag(cm) / cm.sum(axis=1)

    def f1(self):
        p, r = self.precision(), self.recall()
        with np.errstate(invalid="ignore", divide="ignore"):
            return 2 * p * r / (p + r)

    def iou(self):
        cm = self._np()
        inter = np.diag(cm)
        union = cm.sum(axis=1) + cm.sum(axis=0) - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            return inter / union

    def miou(self):
        return np.mean(self.iou())

    def fwiou(self):  # per-class frequency-weighted IoU (metrics.py:55-63)
        cm = self._np()
        freq = cm.sum(axis=1) / (cm.sum() + 1e-8)
        iu = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm) + 1e-8)
        return freq * iu

    def mfwiou(self):
        return self.fwiou().sum()

    def confusion_matrix(self):
        return self._np()


class HeightMetric:
    """Per-hierarchy-class height error metrics (metrics.py:163-234)."""

    def __init__(self, num_class: int = 7):
        self.num_class = num_class
        self.reset()

    def reset(self):
        # float64 host totals, exact per-batch device accumulation (the
        # reference stores float64 on device, metrics.py:231-234)
        self.stats = np.zeros((self.num_class, 3), np.float64)
        self.counts = np.zeros((self.num_class, 1), np.float64)

    def add_batch(self, pred, ref, build_class):
        rows, cnts = height_update(
            jnp.zeros((self.num_class, 3), jnp.float32),
            jnp.zeros((self.num_class, 1), jnp.float32),
            jnp.asarray(pred), jnp.asarray(ref), jnp.asarray(build_class),
        )
        self.stats = self.stats + np.asarray(rows, np.float64)
        self.counts = self.counts + np.asarray(cnts, np.float64)

    addBatch = add_batch

    def avg_each(self):
        return self.stats / (self.counts + 1e-10)

    def avg_balance(self):
        return self.avg_each().mean(axis=0)

    def avg_all(self):
        s = np.asarray(self.stats, np.float64)
        c = np.asarray(self.counts, np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            return s.sum(axis=0) / c.sum()

    def count(self):
        return np.asarray(self.counts, np.float64)


# metrics.py:89-140 / 238-289 are confusion-matrix classes identical to
# SegmentationMetric minus the IoU family; alias them for API parity.
ClassificationMetric = SegmentationMetric
MultilabelMetric = SegmentationMetric


def plot_confusionmatrix(cm):
    """Console matrix dump, 3-decimal space-separated (metrics.py:335-341)."""
    for row in np.asarray(cm):
        print(" ".join(f"{v:.3f}" for v in row))


def accprint(metric: SegmentationMetric):
    """Console dump for the classification metric (metrics.py:292-309):
    the f1/ua/pa block and the transposed confusion matrix (no iou lines —
    they are commented out in the reference)."""
    print("oa, miou, iou, f1, ua, pa, confusion_matrix")
    print()
    plot_confusionmatrix(
        np.vstack([metric.f1(), metric.precision(), metric.recall()]))
    cm = metric.confusion_matrix().T
    plot_confusionmatrix(cm)
    print(f"numtotal: {int(cm.sum())}")


def accprint_seg(metric: SegmentationMetric):
    """Console dump (metrics.py:311-333): oa/miou/iou + f1/ua/pa + cm.T."""
    print("oa, miou, iou, f1, ua, pa, confusion_matrix")
    print(f"{metric.overall_accuracy():.3f}")
    print(f"{metric.miou():.3f}")
    print(" ".join(f"{v:.3f}" for v in metric.iou()))
    for row in np.vstack([metric.f1(), metric.precision(), metric.recall()]):
        print(" ".join(f"{v:.3f}" for v in row))
    cm = metric.confusion_matrix().T
    for row in cm:
        print(" ".join(f"{v:.3f}" for v in row))
    print(f"numtotal: {int(cm.sum())}")
    # trailing class-1 (building) summary block (metrics.py:328-333)
    print(f"{metric.overall_accuracy():.3f}")
    print(f"{metric.iou()[1]:.3f}")
    print(f"{metric.f1()[1]:.3f}")
    print(f"{metric.precision()[1]:.3f}")
    print(f"{metric.recall()[1]:.3f}")


class AverageMeter:
    """Running value/sum/count/average (metrics.py:143-160)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count
