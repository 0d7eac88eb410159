"""Adaptive homoscedastic-uncertainty multi-task losses.

Capability twins of losses_pytorch/selfloss.py. The reference keeps each
task's learnable ``log_var`` inside the loss ``nn.Module`` and feeds them to
the optimiser as a separate param group (train.py:178-179; in practice that
group trains exactly like the model — see train/state.py). Here the
losses are pure functions and the ``log_vars`` vector lives in the train
state (``srbh_tpu.train.state``), optimised via an optax ``multi_transform``
label — same math, idiomatic JAX.

Weighting recipe (selfloss.py:81-90): ``loss * exp(-log_var) + log_var``.
"""
from __future__ import annotations

import jax.nn
import jax.numpy as jnp
import optax


def _adapt(loss: jnp.ndarray, log_var: jnp.ndarray) -> jnp.ndarray:
    return loss * jnp.exp(-log_var) + log_var


def pick_class(values, labels):
    """``values[..., labels]`` along the trailing class axis WITHOUT a
    dynamic gather.

    ``jnp.take_along_axis`` on the minor-most (lane) dimension lowers to a
    per-element dynamic gather on TPU, which does not vectorise: at the
    flagship's loss shapes (128x256^2 pixels x 7 classes) the gather alone
    cost a measured ~120 ms/step — 4x the entire height-model forward.
    A compare+select+reduce touches Cx the data but is pure VPU work and
    is bitwise-identical for finite ``values`` (summing the single
    selected element with C-1 exact zeros). Labels are clamped to
    [0, C-1] first — exactly ``take_along_axis``'s jit-mode 'clip'
    semantics, so out-of-range labels behave as before the rewrite.
    """
    nc = values.shape[-1]
    classes = jnp.arange(nc, dtype=jnp.int32)
    lab = jnp.clip(labels.astype(jnp.int32), 0, nc - 1)
    mask = lab[..., None] == classes
    return jnp.sum(jnp.where(mask, values, 0), axis=-1)


def _softmax(logits):
    return jax.nn.softmax(logits, axis=-1)


def mse_adapt(pred, target, log_var):
    """MSE with uncertainty weighting (selfloss.py:71-79)."""
    return _adapt(jnp.mean((pred - target) ** 2), log_var)


def mse_adapt_weight(pred, target, weight, log_var):
    """Pixel-weighted MSE with uncertainty weighting (selfloss.py:81-90)."""
    loss = jnp.mean(((pred - target) ** 2) * weight)
    return _adapt(loss, log_var)


def mse_adapt_weight_hir(pred, target, log_var, buildhir, heightweight):
    """Variant deriving the pixel weight from the target's hierarchy class via
    LUTs (selfloss.py:93-108)."""
    cls = buildhir[target.astype(jnp.int32)]
    weight = heightweight[cls]
    return _adapt(jnp.mean(((pred - target) ** 2) * weight), log_var)


def weighted_mse(pred, target, weight):
    """Plain weighted MSE (selfloss.py:50-59)."""
    return jnp.mean(((pred - target) ** 2) * weight)


def smooth_l1(pred, target):
    """sigmoid + huber(delta=1) on logits (selfloss.py:40-48)."""
    return jnp.mean(optax.huber_loss(jax.nn.sigmoid(pred), target, delta=1.0))


def dice_binary(prob, target, smooth: float = 1.0):
    """Soft dice on a foreground-probability map (selfloss.py:6-17): a single
    global dice over the flattened batch."""
    p = prob.reshape(-1)
    t = target.reshape(-1).astype(prob.dtype)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def softmax_cross_entropy(logits, labels, weight=None):
    """Per-pixel CE over channel-last logits (..., C) with integer labels.

    Matches ``nn.CrossEntropyLoss(reduction='none')`` followed by
    ``mean(weight * ce)`` (or plain mean).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -pick_class(logp, labels)
    if weight is None:
        return jnp.mean(ce)
    return jnp.mean(ce * weight)


def ce_dice(logits, labels):
    """Unweighted CE + dice on the class-1 probability (selfloss.py:20-37)."""
    ce = softmax_cross_entropy(logits, labels)
    dice = dice_binary(_softmax(logits)[..., 1], labels)
    return ce + dice


def ce_dice_adapt(logits, labels, log_var):
    """CE + foreground dice with uncertainty weighting (selfloss.py:122-142).
    Foreground probability = sum of softmax over classes >= 1."""
    ce = softmax_cross_entropy(logits, labels)
    prob_fg = jnp.sum(_softmax(logits)[..., 1:], axis=-1)
    dice = dice_binary(prob_fg, labels > 0)
    return _adapt(ce + dice, log_var)


def ce_dice_adapt_weight(logits, labels, weight, log_var):
    """Weighted CE + foreground dice with uncertainty weighting
    (selfloss.py:145-168) — the build-segmentation loss of the main model."""
    ce = softmax_cross_entropy(logits, labels, weight)
    prob_fg = jnp.sum(_softmax(logits)[..., 1:], axis=-1)
    dice = dice_binary(prob_fg, labels > 0)
    return _adapt(ce + dice, log_var)
