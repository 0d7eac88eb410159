"""Real-ESRGAN GAN training on TPU.

Twin of the ``RealESRGAN`` wrapper (SR/rrdbnet_arch.py:437-633) and its
finetune recipe (SR/finetune_realesrgan_x4plus_pairdata.yml):

* generator RRDBNet-23 + EMA copy (decay 0.999), U-Net-SN discriminator,
* losses: L1(out, USM(gt)) + VGG19 perceptual (weights [.1,.1,1,1,1]) +
  0.1 x vanilla GAN; D trains on BCE(real=1)/BCE(fake=0),
* twin Adam(1e-4, betas (0.9, 0.99), no decay), MultiStep x0.5 @ 400k,
  linear warm-up support (rrdbnet_arch.py:612-633),
* 1-channel weight adaptation by channel-averaging first/last convs
  (rrdbnet_arch.py:450-456).

TPU design: ONE jitted ``gan_step`` runs USM sharpening, the G forward +
backward (D frozen via stop_gradient on its params path), the D forward +
backward on (gt, stop_gradient(output)), both optimiser updates, and the EMA
update — a single XLA program per iteration instead of the reference's four
separate launches. Spectral-norm power-iteration state updates inside the
same step (flax ``batch_stats`` mutation).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from srbh_tpu.losses.sr import gan_loss, l1_loss, perceptual_loss
from srbh_tpu.models.discriminators import UNetDiscriminatorSN
from srbh_tpu.models.rrdbnet import RRDBNet
from srbh_tpu.models.vgg import VGG19Features
from srbh_tpu.ops.usm import usm_sharp


def multistep_lr(base_lr: float, milestones=(400000,), gamma: float = 0.5,
                 warmup_iter: int = -1):
    """MultiStepLR + linear warm-up (rrdbnet_arch.py:612-633)."""

    def schedule(step):
        lr = base_lr
        for m in milestones:
            lr = jnp.where(step >= m, lr * gamma, lr)
        if warmup_iter > 0:
            lr = jnp.where(step < warmup_iter,
                           base_lr * step / warmup_iter, lr)
        return lr

    return schedule


class GANTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_ema: Any
    d_vars: Any          # {'params', 'batch_stats'(SN u/sigma)}
    g_opt: optax.OptState
    d_opt: optax.OptState
    g_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def adapt_weights_to_1ch(params: dict) -> dict:
    """Channel-average conv_first (in) and conv_last (out) kernels for 1-ch
    use (rrdbnet_arch.py:450-456); HWIO layout."""
    import jax.numpy as jnp

    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    cf = dict(p["conv_first"])
    cf["kernel"] = jnp.mean(cf["kernel"], axis=2, keepdims=True)
    p = {**p, "conv_first": cf}
    if "conv_last" in p:
        cl = dict(p["conv_last"])
        cl["kernel"] = jnp.mean(cl["kernel"], axis=3, keepdims=True)
        cl["bias"] = jnp.mean(cl["bias"], axis=0, keepdims=True)
        p = {**p, "conv_last": cl}
    return p


class RealESRGANTrainer:
    """Builds models, states and the fused jitted GAN step."""

    def __init__(self, out_ch: int = 3, num_block: int = 23, scale: int = 4,
                 num_feat: int = 64, num_grow_ch: int = 32,
                 ema_decay: float = 0.999, lr: float = 1e-4,
                 gan_weight: float = 0.1, perceptual: bool = True,
                 disc_feat: int = 64, dtype=jnp.float32,
                 milestones=(400000,), gamma: float = 0.5,
                 warmup_iter: int = -1, remat: bool = False,
                 l1_gt_usm: bool = True, percep_gt_usm: bool = True,
                 gan_gt_usm: bool = False):
        # remat=True checkpoints each RRDB in the generator's backward —
        # the HBM knob for large-batch GAN finetunes (SURVEY hard part #2)
        self.net_g = RRDBNet(num_out_ch=out_ch, scale=scale,
                             num_feat=num_feat, num_block=num_block,
                             num_grow_ch=num_grow_ch, dtype=dtype,
                             remat=remat)
        self.net_d = UNetDiscriminatorSN(num_feat=disc_feat, dtype=dtype)
        self.vgg = VGG19Features(dtype=dtype) if perceptual else None
        self.out_ch, self.scale = out_ch, scale
        self.vgg_variables = None  # set by init(); make_step requires it
        self.ema_decay = ema_decay
        self.gan_weight = gan_weight
        # per-loss USM-GT switches (finetune_realesrgan_x4plus_pairdata.yml
        # :9-11; BasicSR picks l1/percep/gan GT independently)
        self.l1_gt_usm = l1_gt_usm
        self.percep_gt_usm = percep_gt_usm
        self.gan_gt_usm = gan_gt_usm
        self.schedule = multistep_lr(lr, milestones, gamma=gamma,
                                     warmup_iter=warmup_iter)
        self.lr = lr

    def init(self, rng, lq_shape: Tuple[int, ...],
             vgg_variables: Optional[dict] = None,
             g_params: Optional[dict] = None,
             d_vars: Optional[dict] = None) -> GANTrainState:
        k1, k2, k3 = jax.random.split(rng, 3)
        lq = jnp.zeros(lq_shape)
        gt_shape = (lq_shape[0], lq_shape[1] * self.scale,
                    lq_shape[2] * self.scale, self.out_ch)
        if g_params is not None:  # finetune path: skip the expensive init
            g_vars = {"params": g_params}
        else:
            g_vars = jax.jit(self.net_g.init)(k1, lq)
        if d_vars is None:  # else: pretrain_network_d warm start
            # (finetune_realesrgan_x4plus_pairdata.yml:113; convert with
            # train/convert.py:convert_unet_discriminator_sn, which carries
            # the spectral-norm power-iteration state)
            d_vars = jax.jit(self.net_d.init)(k2, jnp.zeros(gt_shape))
        self.vgg_variables = vgg_variables
        if self.vgg is not None and vgg_variables is None:
            self.vgg_variables = jax.jit(self.vgg.init)(k3, jnp.zeros(gt_shape))
        adam = lambda: optax.adam(self.schedule, b1=0.9, b2=0.99)
        g_tx, d_tx = adam(), adam()
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"],
            g_ema=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
            d_vars=d_vars,
            g_opt=g_tx.init(g_vars["params"]),
            d_opt=d_tx.init(d_vars["params"]),
            g_tx=g_tx, d_tx=d_tx,
        )

    def make_step(self):
        net_g, net_d, vgg = self.net_g, self.net_d, self.vgg
        if self.vgg is not None and self.vgg_variables is None:
            raise RuntimeError(
                "make_step before init(): the perceptual VGG variables are "
                "created by init(); call init() (or pass vgg_variables to "
                "it) before building the step")
        vgg_vars = self.vgg_variables
        gan_w, ema_decay = self.gan_weight, self.ema_decay
        l1_usm, percep_usm, gan_usm = (self.l1_gt_usm, self.percep_gt_usm,
                                       self.gan_gt_usm)

        def step(state: GANTrainState, lq, gt):
            gt_usm = usm_sharp(gt) if (l1_usm or percep_usm or gan_usm) else gt
            l1_gt = gt_usm if l1_usm else gt
            percep_gt = gt_usm if percep_usm else gt
            gan_gt = gt_usm if gan_usm else gt

            d_stats = state.d_vars.get("batch_stats", {})

            def g_loss_fn(g_params):
                output = net_g.apply({"params": g_params}, lq)
                l_pix = l1_loss(output, l1_gt)
                l_percep = 0.0
                if vgg is not None:
                    fx = vgg.apply(vgg_vars, output)
                    fgt = vgg.apply(vgg_vars, percep_gt)
                    l_percep = perceptual_loss(fx, fgt)
                # D frozen for the G step (rrdbnet_arch.py:545-549)
                fake_pred = net_d.apply(
                    {"params": jax.lax.stop_gradient(state.d_vars["params"]),
                     "batch_stats": d_stats},
                    output, train=False)
                l_gan = gan_loss(fake_pred, True, "vanilla", is_disc=False,
                                 loss_weight=gan_w)
                total = l_pix + l_percep + l_gan
                return total, (output, l_pix, l_percep, l_gan)

            (g_total, (output, l_pix, l_percep, l_gan)), g_grads = \
                jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
            g_updates, g_opt = state.g_tx.update(g_grads, state.g_opt,
                                                 state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)

            def d_loss_fn(d_params):
                variables = {"params": d_params, "batch_stats": d_stats}
                real_pred, mut = net_d.apply(variables, gan_gt, train=True,
                                             mutable=["batch_stats"])
                l_real = gan_loss(real_pred, True, "vanilla", is_disc=True)
                fake_pred, mut = net_d.apply(
                    {"params": d_params, "batch_stats": mut["batch_stats"]},
                    jax.lax.stop_gradient(output), train=True,
                    mutable=["batch_stats"])
                l_fake = gan_loss(fake_pred, False, "vanilla", is_disc=True)
                return l_real + l_fake, (mut["batch_stats"], l_real, l_fake,
                                         jnp.mean(real_pred), jnp.mean(fake_pred))

            (d_total, (new_d_stats, l_real, l_fake, out_real, out_fake)), d_grads = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(
                    state.d_vars["params"])
            d_updates, d_opt = state.d_tx.update(d_grads, state.d_opt,
                                                 state.d_vars["params"])
            d_params = optax.apply_updates(state.d_vars["params"], d_updates)

            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay),
                state.g_ema, g_params)

            new_state = state.replace(
                step=state.step + 1, g_params=g_params, g_ema=g_ema,
                d_vars={"params": d_params, "batch_stats": new_d_stats},
                g_opt=g_opt, d_opt=d_opt)
            metrics = {"l_g_pix": l_pix, "l_g_percep": l_percep,
                       "l_g_gan": l_gan, "l_g_total": g_total,
                       "l_d_real": l_real, "l_d_fake": l_fake,
                       "out_d_real": out_real, "out_d_fake": out_fake}
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,))

    def ema_apply_fn(self):
        """Inference through the EMA generator (what the height pipeline
        consumes, train.py:137)."""

        def apply(state: GANTrainState, lq, features_only: bool = False):
            return self.net_g.apply({"params": state.g_ema}, lq,
                                    features_only=features_only)

        return apply
