"""Segmentation loss library (the reference's ``losses_pytorch/`` catalogue).

Capability twins of losses_pytorch/dice_loss.py, boundary_loss.py,
focal_loss.py, lovasz_loss.py, iou_loss.py, ND_Crossentropy.py, hausdorff.py
and myloss.py composites — all as pure functions over channel-last logits
``(N, ..., C)`` and integer labels ``(N, ...)``.

Conventions: ``apply_nonlin`` defaults to softmax where the reference does;
``batch_dice`` pools statistics over the batch axis; ``do_bg=False`` drops
class 0 from the average (nnU-Net conventions, dice_loss.py:255-332).
Distance-transform-based losses (boundary, Hausdorff) take precomputed DT
maps — computed host-side with ``scipy.ndimage.distance_transform_edt``
(:func:`one_hot_distance_transform`) since there is no device EDT.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu.losses.adaptive import pick_class, softmax_cross_entropy


def _one_hot(labels, num_classes):
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def _tp_fp_fn(probs, onehot, batch_dice: bool, square: bool = False):
    """Per-class TP/FP/FN sums (dice_loss.py:31-80); axes = spatial (+batch)."""
    axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
    tp = probs * onehot
    fp = probs * (1 - onehot)
    fn = (1 - probs) * onehot
    if square:
        tp, fp, fn = tp**2, fp**2, fn**2
    return tp.sum(axes), fp.sum(axes), fn.sum(axes)


def soft_dice_loss(logits, labels, batch_dice: bool = False, do_bg: bool = True,
                   smooth: float = 1.0):
    """nnU-Net SoftDiceLoss (dice_loss.py:255-290): -mean dice."""
    probs = jax.nn.softmax(logits, -1)
    onehot = _one_hot(labels, logits.shape[-1])
    tp, fp, fn = _tp_fp_fn(probs, onehot, batch_dice)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
    if not do_bg:
        dc = dc[..., 1:] if batch_dice else dc[:, 1:]
    return -dc.mean()


def iou_loss(logits, labels, batch_dice: bool = False, do_bg: bool = True,
             smooth: float = 1.0):
    """IoULoss (dice_loss.py:293-330): -mean IoU."""
    probs = jax.nn.softmax(logits, -1)
    onehot = _one_hot(labels, logits.shape[-1])
    tp, fp, fn = _tp_fp_fn(probs, onehot, batch_dice)
    iou = (tp + smooth) / (tp + fp + fn + smooth)
    if not do_bg:
        iou = iou[..., 1:] if batch_dice else iou[:, 1:]
    return -iou.mean()


def tversky_loss(logits, labels, alpha: float = 0.3, beta: float = 0.7,
                 batch_dice: bool = False, do_bg: bool = True,
                 smooth: float = 1.0):
    """TverskyLoss (dice_loss.py:333-371)."""
    probs = jax.nn.softmax(logits, -1)
    onehot = _one_hot(labels, logits.shape[-1])
    tp, fp, fn = _tp_fp_fn(probs, onehot, batch_dice)
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    if not do_bg:
        tv = tv[..., 1:] if batch_dice else tv[:, 1:]
    return -tv.mean()


def focal_tversky_loss(logits, labels, gamma: float = 0.75, **tversky_kwargs):
    """FocalTversky (dice_loss.py:374-390): (1 + tversky_loss)^gamma."""
    tv = tversky_loss(logits, labels, **tversky_kwargs)
    return jnp.power(1 + tv, gamma)


def asym_loss(logits, labels, beta: float = 1.5, batch_dice: bool = False,
              smooth: float = 1.0):
    """AsymLoss (dice_loss.py:393-432): weighted FP/FN with beta^2/(1+beta^2)."""
    probs = jax.nn.softmax(logits, -1)
    onehot = _one_hot(labels, logits.shape[-1])
    tp, fp, fn = _tp_fp_fn(probs, onehot, batch_dice)
    w = (beta**2) / (1 + beta**2)
    asym = (tp + smooth) / (tp + w * fn + (1 - w) * fp + smooth)
    return -asym.mean()


def ss_loss(logits, labels, r: float = 0.1, batch_dice: bool = False,
            smooth: float = 1.0):
    """Sensitivity-specificity loss (dice_loss.py:192-252)."""
    probs = jax.nn.softmax(logits, -1)
    onehot = _one_hot(labels, logits.shape[-1])
    axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
    sq = (onehot - probs) ** 2
    spec_num = (sq * onehot).sum(axes)
    spec_den = onehot.sum(axes) + smooth
    sens_num = (sq * (1 - onehot)).sum(axes)
    sens_den = (1 - onehot).sum(axes) + smooth
    ss = r * spec_num / spec_den + (1 - r) * sens_num / sens_den
    return ss.mean()


def gdice_loss(logits, labels, smooth: float = 1e-5):
    """Generalised dice with per-sample 1/volume^2 class weights
    (dice_loss.py:84-128): w is per (batch, class) — einsum('bcxyz->bc') —
    dice is formed per sample and averaged, and the value is returned
    NEGATIVE (in [-1, 0]) exactly like the reference's ``-2(...)``."""
    probs = jax.nn.softmax(logits, -1)
    onehot = _one_hot(labels, logits.shape[-1])
    spatial = tuple(range(1, probs.ndim - 1))
    vol = onehot.sum(spatial)  # (B, C)
    w = 1.0 / (vol.astype(probs.dtype) + 1e-10) ** 2
    inter = w * (probs * onehot).sum(spatial)
    union = w * (probs.sum(spatial) + vol)
    divided = -2.0 * (inter.sum(-1) + smooth) / (union.sum(-1) + smooth)
    return divided.mean()


def gdice_loss_v2(logits, labels, smooth: float = 1e-5):
    """GDiceLossV2 (dice_loss.py:143-190): class weights pooled over the
    WHOLE batch (the reference flattens to (C, N*H*W)), ``1/sum^2`` clamped
    at ``smooth``, and one global ``-2 I / D`` ratio — unlike
    :func:`gdice_loss`, which forms a per-sample dice and averages."""
    probs = jax.nn.softmax(logits, -1)
    onehot = _one_hot(labels, logits.shape[-1])
    c = probs.shape[-1]
    inp = probs.reshape(-1, c).T  # (C, M)
    tgt = onehot.reshape(-1, c).T
    tsum = tgt.sum(-1)
    w = 1.0 / jnp.clip(tsum * tsum, smooth)
    intersect = ((inp * tgt).sum(-1) * w).sum()
    denom = ((inp + tgt).sum(-1) * w).sum()
    return -2.0 * intersect / jnp.clip(denom, smooth)


def penalty_gdice_loss(logits, labels, k: float = 2.5, smooth: float = 1e-5):
    """PenaltyGDiceLoss (dice_loss.py:445-459): ``gdc / (1 + k (1 - gdc))``
    over the generalised dice loss."""
    gdc = gdice_loss(logits, labels, smooth)
    return gdc / (1.0 + k * (1.0 - gdc))


def edts_penalized_map(mask: np.ndarray) -> np.ndarray:
    """compute_edts_forPenalizedLoss (ND_Crossentropy.py:151-165, identical
    copy at boundary_loss.py:175-190): per-sample boundary-decaying weight in
    [0, 1] on both sides — ``(max-EDT)*mask / max`` of the foreground plus
    the same of the background. Host-side (no device EDT); feed the result
    to :func:`dist_penalized_ce` (+0 — it adds the 1 itself) or +1.0 to
    :func:`dist_binary_dice_loss` as the reference does."""
    from scipy.ndimage import distance_transform_edt

    mask = np.asarray(mask).astype(bool)
    res = np.zeros(mask.shape, np.float32)
    for i in range(mask.shape[0]):
        pos, neg = mask[i], ~mask[i]
        pe = distance_transform_edt(pos)
        pe = (pe.max() - pe) * pos
        ne = distance_transform_edt(neg)
        ne = (ne.max() - ne) * neg
        if pe.max() > 0:
            res[i] += pe / pe.max()
        if ne.max() > 0:
            res[i] += ne / ne.max()
    return res


def dist_binary_dice_loss(logits, labels, dist, smooth: float = 1e-5):
    """DistBinaryDiceLoss (boundary_loss.py:192-241): binary dice whose TP
    sum is weighted by ``dist`` (= ``edts_penalized_map(gt > 0) + 1``);
    returns the negative mean dice like the reference."""
    probs = jax.nn.softmax(logits, -1)[..., 1]
    gt = (labels > 0).astype(probs.dtype)
    axes = tuple(range(1, probs.ndim))
    tp = jnp.sum(probs * gt * dist, axes)
    dc = (2 * tp + smooth) / (jnp.sum(probs, axes) + jnp.sum(gt, axes) + smooth)
    return -dc.mean()


def focal_loss(logits, labels, alpha=None, gamma: float = 2.0,
               balance_index: int = 0, smooth: float = 1e-5):
    """FocalLoss (focal_loss.py:7-93): -alpha_t (1 - p_t)^gamma log(p_t) with
    probability smoothing."""
    num_class = logits.shape[-1]
    probs = jax.nn.softmax(logits, -1).reshape(-1, num_class)
    target = labels.reshape(-1)
    if alpha is None:
        alpha_vec = jnp.ones((num_class,))
    elif isinstance(alpha, (list, tuple, np.ndarray)):
        a = jnp.asarray(alpha, jnp.float32)
        alpha_vec = a / a.sum()
    else:  # float
        alpha_vec = jnp.full((num_class,), 1 - float(alpha))
        alpha_vec = alpha_vec.at[balance_index].set(float(alpha))
    pt = pick_class(probs, target)
    if smooth:
        pt = jnp.clip(pt, smooth, 1.0 - smooth)
    logpt = jnp.log(pt)
    at = alpha_vec[target.astype(jnp.int32)]
    loss = -at * jnp.power(1 - pt, gamma) * logpt
    return loss.mean()


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors
    (lovasz_loss.py:7-19)."""
    p = gt_sorted.shape[0]
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted, 0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, 0)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(probs, labels):
    """LovaszSoftmax (lovasz_loss.py:22-69); ``probs`` (N, ..., C) softmax
    outputs, mean over classes."""
    num_classes = probs.shape[-1]
    flat = probs.reshape(-1, num_classes)
    target = labels.reshape(-1)

    def per_class(c):
        tc = (target == c).astype(jnp.float32)
        pc = flat[:, c] if num_classes > 1 else flat[:, 0]
        errors = jnp.abs(tc - pc)
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        tc_sorted = tc[order]
        return jnp.dot(errors_sorted, _lovasz_grad(tc_sorted))

    losses = jax.vmap(per_class)(jnp.arange(num_classes))
    return losses.mean()


def topk_ce_loss(logits, labels, k: float = 10.0):
    """TopKLoss (ND_Crossentropy.py:38-53): mean of the top k% pixel CEs."""
    logp = jax.nn.log_softmax(logits, -1)
    ce = -pick_class(logp, labels)
    flat = ce.reshape(-1)
    num = max(1, int(flat.shape[0] * k / 100))
    top, _ = jax.lax.top_k(flat, num)
    return top.mean()


def weighted_ce_loss(logits, labels, weight: Optional[Sequence[float]] = None):
    """WeightedCrossEntropyLoss (ND_Crossentropy.py:56-80)."""
    logp = jax.nn.log_softmax(logits, -1)
    ce = -pick_class(logp, labels)
    if weight is None:
        return ce.mean()
    w = jnp.asarray(weight, jnp.float32)[labels.astype(jnp.int32)]
    return (ce * w).sum() / jnp.clip(w.sum(), 1e-8)


def dist_penalized_ce(logits, labels, dist_map):
    """DisPenalizedCE (ND_Crossentropy.py:168-208). Reference quirk twinned
    exactly: the distance weighting is computed but DEAD — the module
    returns the plain ``loss.mean()`` (``weighted_loss`` at :205-206 is
    never used), so ``dist_map`` does not affect the value (kept in the
    signature for API parity; see edts_penalized_map for the map builder).
    """
    del dist_map  # computed-but-unused in the reference
    logp = jax.nn.log_softmax(logits, -1)
    ce = -pick_class(logp, labels)
    return ce.mean()


def nll_loss(log_probs, labels):
    """nll_loss (ND_Crossentropy.py:211-220): mean negative picked log-prob.

    ``log_probs``: (N, C) already-log-softmaxed scores; ``labels``: (N,) ints.
    """
    picked = pick_class(log_probs, labels)
    return -picked.mean()


def boundary_loss(logits, dist_map):
    """BDLoss (boundary_loss.py:82-109): mean of softmax-probability times
    the signed distance map of the non-background classes.

    ``dist_map``: (N, ..., C) signed DT (positive outside, negative inside).
    """
    probs = jax.nn.softmax(logits, -1)
    return jnp.mean(probs[..., 1:] * dist_map[..., 1:])


def hausdorff_dt_loss(logits, labels, dist_pred, dist_gt, alpha: float = 2.0):
    """HausdorffDTLoss (hausdorff.py:19-104): (p - g)^2 * (dt_p^a + dt_g^a)."""
    probs = jax.nn.softmax(logits, -1)[..., 1]
    gt = (labels > 0).astype(jnp.float32)
    err = (probs - gt) ** 2
    dist = jnp.power(dist_pred, alpha) + jnp.power(dist_gt, alpha)
    return (err * dist).mean()


def one_hot_distance_transform(labels: np.ndarray, num_classes: int,
                               signed: bool = True) -> np.ndarray:
    """Host-side EDT of each class mask -> (N, H, W, C); signed variant gives
    +outside/-inside (boundary_loss.py:35-79 semantics)."""
    from scipy.ndimage import distance_transform_edt

    n = labels.shape[0]
    out = np.zeros(labels.shape + (num_classes,), np.float32)
    for b in range(n):
        for c in range(num_classes):
            mask = labels[b] == c
            if not mask.any():
                continue
            pos = distance_transform_edt(~mask)
            if signed:
                neg = distance_transform_edt(mask)
                out[b, ..., c] = pos - neg
            else:
                out[b, ..., c] = pos
    return out


# ------------------------------------------------------------- composites

def dc_and_ce_loss(logits, labels, weight_ce: float = 1.0, weight_dice: float = 1.0):
    """DC_and_CE_loss (dice_loss.py:435-460)."""
    return (weight_ce * softmax_cross_entropy(logits, labels)
            + weight_dice * soft_dice_loss(logits, labels))


def dc_and_topk_loss(logits, labels, k: float = 10.0):
    """DC_and_topk_loss (dice_loss.py:481-507)."""
    return topk_ce_loss(logits, labels, k) + soft_dice_loss(logits, labels)


def dc_and_bd_loss(logits, labels, dist_map, alpha: float = 1.0):
    """DC_and_BD_loss (boundary_loss.py:112-137)."""
    return alpha * soft_dice_loss(logits, labels) + boundary_loss(logits, dist_map)


def explog_loss(logits, labels, gamma: float = 0.3, w_dice: float = 0.8,
                w_ce: float = 0.2):
    """ExpLog_loss (dice_loss.py:480-503): exp-log on the DICE term only —
    ``0.8 * (-log(clamp(-dc, 1e-6)))^gamma + 0.2 * wce`` with the CE term
    kept LINEAR (the paper applies the exp-log to both, but the reference
    code does not; behaviour is twinned, not intent)."""
    dc = soft_dice_loss(logits, labels)  # in [-1, 0]
    ce = weighted_ce_loss(logits, labels)
    expdice = jnp.power(-jnp.log(jnp.clip(-dc, 1e-6)), gamma)
    return w_dice * expdice + w_ce * ce


def ce_mse_loss(seg_logits, seg_labels, bd_pred, bd_target,
                beta: float = 0.7):
    """CE_MSE composite (myloss.py:8-18): cross-entropy on the mask plus
    ``beta`` x MSE of the boundary regression against ``rbd / 255``."""
    ce = softmax_cross_entropy(seg_logits, seg_labels)
    mse = jnp.mean((bd_pred - bd_target.astype(jnp.float32) / 255.0) ** 2)
    return ce + beta * mse


# shared with the GAN losses — one definition (losses/sr.py)
from srbh_tpu.losses.sr import _bce_with_logits  # noqa: E402


def _binary_iou(prob, target):
    """IOU term of the BCE composites (iou_loss.py:6-28): per-image
    unsmoothed 1 - I/U, averaged over the batch — a batch mixes tiny- and
    large-foreground tiles with equal weight, unlike a pooled global IoU."""
    p = prob.reshape(prob.shape[0], -1)
    t = target.reshape(target.shape[0], -1).astype(prob.dtype)
    inter = jnp.sum(p * t, axis=-1)
    union = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1) - inter
    return jnp.mean(1.0 - inter / union)


def bce_ssim_iou_loss(logits, target01, data_range: float = 1.0):
    """BCE + SSIM + IoU composite on binary maps (myloss.py:33-77).

    ``logits``: (N, H, W, 1) raw scores; ``target01``: same-shape 0/1 mask.
    """
    from srbh_tpu.losses.ssim_loss import ssim_same

    prob = jax.nn.sigmoid(logits)
    t = target01.astype(prob.dtype)
    bce = _bce_with_logits(logits, t)
    ssim = 1.0 - ssim_same(prob, t, data_range=data_range)
    iou = _binary_iou(prob, t)
    return bce + ssim + iou


def bce_iou_loss(logits, target01):
    """BCE + per-image IoU on binary maps (myloss.py:38-53 BCE_IOU)."""
    prob = jax.nn.sigmoid(logits)
    t = target01.astype(prob.dtype)
    return _bce_with_logits(logits, t) + _binary_iou(prob, t)


def bce_ssim_loss(logits, target01, data_range: float = 1.0):
    """BCE + (1 - SSIM) on binary maps (myloss.py:55-70 BCE_SSIM)."""
    from srbh_tpu.losses.ssim_loss import ssim_same

    prob = jax.nn.sigmoid(logits)
    t = target01.astype(prob.dtype)
    return _bce_with_logits(logits, t) + (
        1.0 - ssim_same(prob, t, data_range=data_range))


def bce_dice_loss(logits, target01):
    """BCE + binary dice (myloss.py BCE_DICE)."""
    from srbh_tpu.losses.adaptive import dice_binary

    prob = jax.nn.sigmoid(logits)
    t = target01.astype(prob.dtype)
    return _bce_with_logits(logits, t) + dice_binary(prob, t)


def ce_dice_iou_loss(logits, labels):
    """CE + dice + IoU on the foreground channel (myloss.py CE_DICE_IOU)."""
    from srbh_tpu.losses.adaptive import dice_binary

    ce = softmax_cross_entropy(logits, labels)
    prob_fg = jax.nn.softmax(logits, -1)[..., 1]
    t = (labels > 0)
    return ce + dice_binary(prob_fg, t) + _binary_iou(prob_fg, t)


def bce_ssim_iou_bd_loss(logits, target01, bd_pred, bd_target,
                         data_range: float = 1.0):
    """BCE+SSIM+IoU plus a boundary-REGRESSION term (myloss.py:73-90
    BCE_SSIM_IOU_BD): the fourth term is ``MSELoss(pbd, rbd / 255)`` between
    a predicted boundary map and the ground-truth boundary raster — not a
    distance-map integral."""
    base = bce_ssim_iou_loss(logits, target01, data_range)
    bd = jnp.mean((bd_pred - bd_target.astype(jnp.float32) / 255.0) ** 2)
    return base + bd


def hausdorff_er_loss(logits, labels, alpha: float = 2.0, erosions: int = 3):
    """Erosion-based Hausdorff loss (hausdorff.py:107-173 capability twin):
    repeatedly 'erode' the squared error map with a 3x3 mean filter, summing
    each level scaled by ``k^alpha`` — deeper surviving error (far inside a
    mis-segmented region) costs more."""
    probs = jax.nn.softmax(logits, -1)[..., 1]
    gt = (labels > 0).astype(probs.dtype)
    err = (probs - gt) ** 2  # (N, H, W)
    kernel = jnp.full((3, 3, 1, 1), 1.0 / 9.0, probs.dtype)
    loss = 0.0
    cur = err[..., None]
    for k in range(erosions):
        loss = loss + jnp.mean(cur) * ((k + 1) ** alpha)
        smoothed = jax.lax.conv_general_dilated(
            cur, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # soft erosion: keep only interior error mass
        cur = jax.nn.relu(smoothed * 2.0 - 1.0) * cur
    return loss
