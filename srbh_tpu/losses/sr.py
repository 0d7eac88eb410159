"""SR loss library: perceptual, GAN, TV, Charbonnier, regularisers.

Twin of SR/srloss.py:

* :func:`perceptual_loss`  (:106-139) — weighted L1 over VGG19 features at
  5 layers, default weights [0.1, 0.1, 1, 1, 1].
* :func:`gan_loss`         (:144-245) — 'vanilla' (BCE-with-logits),
  'lsgan' (MSE), 'wgan', 'wgan_softplus', 'hinge'; ``loss_weight`` applies
  to generator calls only.
* :func:`tv_loss`          (:251-274), :func:`charbonnier_loss` (:280-290).
* :func:`r1_penalty`       (:294-308), :func:`g_path_regularize` (:311-323),
  :func:`gradient_penalty_loss` (:326-360) — gradients via ``jax.grad``
  instead of torch autograd.grad.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

DEFAULT_PERCEPTUAL_WEIGHTS = (0.1, 0.1, 1.0, 1.0, 1.0)


def perceptual_loss(feats_x: Sequence[jnp.ndarray],
                    feats_gt: Sequence[jnp.ndarray],
                    weights: Sequence[float] = DEFAULT_PERCEPTUAL_WEIGHTS,
                    lossfn: str = "l1", loss_weight: float = 1.0) -> jnp.ndarray:
    """Weighted feature-space distance; gt features should be stop-gradiented
    by the caller (the trainer does)."""
    total = 0.0
    for w, a, b in zip(weights, feats_x, feats_gt):
        b = jax.lax.stop_gradient(b)
        if lossfn == "l1":
            total += w * jnp.mean(jnp.abs(a - b))
        else:
            total += w * jnp.mean((a - b) ** 2)
    return total * loss_weight


def _bce_with_logits(logits, target):
    import optax

    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, target))


def gan_loss(pred: jnp.ndarray, target_is_real: bool, gan_type: str = "vanilla",
             is_disc: bool = False, real_label: float = 1.0,
             fake_label: float = 0.0, loss_weight: float = 1.0) -> jnp.ndarray:
    if gan_type == "vanilla":
        target = real_label if target_is_real else fake_label
        loss = _bce_with_logits(pred, jnp.full_like(pred, target))
    elif gan_type == "lsgan":
        target = real_label if target_is_real else fake_label
        loss = jnp.mean((pred - target) ** 2)
    elif gan_type == "wgan":
        loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    elif gan_type == "wgan_softplus":
        loss = jnp.mean(jax.nn.softplus(-pred) if target_is_real
                        else jax.nn.softplus(pred))
    elif gan_type == "hinge":
        if is_disc:
            p = -pred if target_is_real else pred
            loss = jnp.mean(jax.nn.relu(1 + p))
        else:
            loss = -jnp.mean(pred)
    else:
        raise NotImplementedError(f"GAN type {gan_type}")
    return loss if is_disc else loss * loss_weight


def l1_loss(x, gt):
    return jnp.mean(jnp.abs(x - gt))


def tv_loss(x: jnp.ndarray, loss_weight: float = 1.0) -> jnp.ndarray:
    """Total variation over an NHWC batch (SR/srloss.py:251-274 semantics:
    squared diffs normalised by per-image element counts, x2, then
    batch-averaged). Our counts include the batch dim, which IS the
    reference's per-image count times its final /batch_size — dividing by
    the batch again would shrink the loss by N."""
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    count_h = x[:, 1:].size
    count_w = x[:, :, 1:].size
    return loss_weight * 2 * (h_tv / count_h + w_tv / count_w)


def charbonnier_loss(x, gt, eps: float = 1e-9) -> jnp.ndarray:
    """CharbonnierLoss (SR/srloss.py:280-290); the reference's default eps
    is 1e-9 (loss floor sqrt(eps) ~ 3.16e-5 at zero residual)."""
    return jnp.mean(jnp.sqrt((x - gt) ** 2 + eps))


def r1_penalty(disc_fn: Callable, real: jnp.ndarray) -> jnp.ndarray:
    """R1: E[|grad D(x)|^2] on real images (SR/srloss.py:294-308)."""
    grad = jax.grad(lambda img: jnp.sum(disc_fn(img)))(real)
    return jnp.sum(grad**2) / real.shape[0]


def g_path_regularize(fake_fn: Callable, latents: jnp.ndarray,
                      mean_path_length: jnp.ndarray, decay: float = 0.01,
                      key: Optional[jax.Array] = None):
    """StyleGAN2 path-length regulariser (SR/srloss.py:311-323)."""
    key = key if key is not None else jax.random.PRNGKey(0)

    def out_scalar(z, noise):
        img = fake_fn(z)
        scale = jnp.sqrt(img.shape[1] * img.shape[2])
        return jnp.sum(img * noise / scale)

    def per_example(z, k):
        # fresh independent noise per example: StyleGAN2's estimator needs
        # E||J^T n||^2 over random n; a shared/frozen n would regularise only
        # one fixed Jacobian direction
        img_shape = jax.eval_shape(fake_fn, z[None]).shape
        noise = jax.random.normal(k, img_shape)
        return jax.grad(lambda zz: out_scalar(zz[None], noise))(z)

    keys = jax.random.split(key, latents.shape[0])
    grads = jax.vmap(per_example)(latents, keys)
    if grads.ndim >= 3:
        # reference: sqrt(grad.pow(2).sum(2).mean(1)) over (B, L, D)
        # latents (SR/srloss.py:317) — MEAN over the layer axis, not a
        # flattened sum (they differ by sqrt(L))
        g2 = grads.reshape(latents.shape[0], latents.shape[1], -1)
        path_lengths = jnp.sqrt(jnp.mean(jnp.sum(g2 ** 2, 2), 1))
    else:  # (B, D): degenerate single-latent case
        path_lengths = jnp.sqrt(jnp.sum(grads ** 2, 1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return penalty, jnp.mean(path_lengths), path_mean


def gradient_penalty_loss(disc_fn: Callable, real: jnp.ndarray,
                          fake: jnp.ndarray, key: jax.Array,
                          weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """WGAN-GP on random interpolates (SR/srloss.py:326-360)."""
    alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
    interp = real + alpha * (fake - real)
    grad = jax.grad(lambda x: jnp.sum(disc_fn(x)))(interp)
    if weight is not None:
        grad = grad * weight
    # reference: gradients.norm(2, dim=1) — the PER-PIXEL channel-dim norm
    # (SR/srloss.py:356), not a per-sample flattened norm; NHWC here, so
    # the channel axis is last
    norm = jnp.sqrt(jnp.sum(grad ** 2, axis=-1))
    loss = jnp.mean((norm - 1.0) ** 2)
    if weight is not None:
        loss = loss / jnp.mean(weight)
    return loss
