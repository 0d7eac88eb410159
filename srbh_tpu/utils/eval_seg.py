"""Numpy segmentation scores (utils/eval_seg.py:3-28 twin)."""
from __future__ import annotations

import numpy as np


def fast_hist(label_true: np.ndarray, label_pred: np.ndarray,
              num_classes: int) -> np.ndarray:
    mask = (label_true >= 0) & (label_true < num_classes)
    return np.bincount(
        num_classes * label_true[mask].astype(int) + label_pred[mask],
        minlength=num_classes**2,
    ).reshape(num_classes, num_classes)


def scores(label_trues, label_preds, num_classes: int = 21) -> dict:
    hist = np.zeros((num_classes, num_classes))
    for lt, lp in zip(label_trues, label_preds):
        hist += fast_hist(lt.flatten(), lp.flatten(), num_classes)
    acc = np.diag(hist).sum() / hist.sum()
    acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
    iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
    valid = hist.sum(axis=1) > 0
    mean_iu = np.nanmean(iu[valid])
    return {
        "Pixel Accuracy": acc,
        "Mean Accuracy": acc_cls,
        "Mean IoU": mean_iu,
        "Class IoU": dict(zip(range(num_classes), iu)),
    }
