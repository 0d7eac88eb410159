"""Jitted train / eval steps for the height model.

One XLA program per step: the frozen Real-ESRGAN feature pass
(train.py:244, no-grad), the height model forward/backward, the three
adaptive losses (train.py:251-253), and the optimiser update all fuse into a
single executable — there is no separate "feature extraction" launch like the
reference's two-model pipeline.

Sharding: steps are jitted with a ``data``-axis batch sharding and replicated
state (``srbh_tpu.parallel.mesh``); XLA inserts the gradient psum.

BatchNorm parity decision (pinned): statistics are computed over the
*global* batch (a plain mean under GSPMD). This matches the reference's
single-GPU BN exactly — torch computes stats over its whole batch of 16
(train.py:97), and the global batch here is that same batch regardless of
how many chips it is sharded over. Per-device ("local") stats would be the
semantics that *diverges* from the reference, so no local-stats mode is
offered. Pinned by ``tests/test_train.py::test_dp_matches_single_device``,
which asserts bit-level equal loss AND batch_stats between the 8-device
sharded step and the unsharded step.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from srbh_tpu.losses.adaptive import (
    ce_dice_adapt,
    ce_dice_adapt_weight,
    mse_adapt,
    mse_adapt_weight,
)
from srbh_tpu.train.state import TrainState


def make_train_step(model, sr_model, rgb_idx=(0, 1, 2), isaggre: bool = True,
                    seed: int = 0, device_aug: bool = False,
                    hir=None, class_weight=None, norm=None,
                    ishir: bool = True):
    """Build the jitted aggre+weight train step (train.py:225-271).

    Batch dict (NHWC): ``image`` (N,64,64,8), ``height`` (N,256,256),
    ``height_aggre`` (N,64,64), ``build`` (N,256,256) int, ``weight``
    (N,256,256), ``weight_aggre`` (N,64,64).
    ``seed`` roots the per-step dropout/drop-connect RNG (folded with
    ``state.step``), making seeded runs reproducible end-to-end like the
    reference's global seeding (train.py:86-90).

    ``device_aug=True`` moves augmentation + target building in-jit
    (ops/device_aug.py): the batch then carries only ``image`` (normalised)
    and ``height`` (raw 256x256); flips/shuffles/rotation and the
    hierarchy/weight/aggregation targets are computed on device from
    ``hir`` + ``class_weight`` (the dataset's ``heightweight``).

    ``norm`` (requires ``device_aug``) additionally moves normalisation
    in-jit: a dict ``{"s2_off", "s2_scale", "s1_off", "s1_scale"}`` (the
    dataset's tables); the batch then carries raw ``s2`` (uint16 DNs) +
    ``s1`` instead of ``image`` — within 1 f32 ulp of the host's per-band
    affine + [0,1] clip (XLA lowers f32 division via reciprocal, 1 ulp off
    numpy's exactly-rounded divide), and 2x fewer wire bytes for s2.
    The host augments RAW DNs and clips last (dataset.py:175-190):
    normalisation is affine and commutes with the bilinear rotation
    (BORDER_REFLECT_101, no constant fill), clip does not — so this branch
    normalises, augments, THEN clips, reproducing the host ordering. The
    plain ``device_aug`` mode (host-normalised ``image`` on the wire)
    cannot: the host already clipped at decode, so saturated pixels there
    rotate post-clip — a documented residual divergence of that mode.
    Returns ``(state, metrics)`` with loss / rmse / log_vars.
    """
    rgb = jnp.asarray(rgb_idx)
    base_rng = jax.random.PRNGKey(seed)
    if device_aug:
        from srbh_tpu.ops.device_aug import augment_batch, build_targets
        from srbh_tpu.ops.hierarchy import DEFAULT_HIR, build_hierarchy_lut

        if isaggre and not ishir:
            # mirror the dataset's guard (dataset.py: aggregated weights
            # index the hierarchy LUT)
            raise ValueError("isaggre=True requires ishir=True")
        lut = jnp.asarray(build_hierarchy_lut(hir or DEFAULT_HIR))
        cw = jnp.asarray(class_weight if class_weight is not None
                         else jnp.ones(len(hir or DEFAULT_HIR) - 1),
                         jnp.float32)
        # a stream distinct from the dropout RNG (which stays bit-identical
        # to the host-aug mode): fold a fixed tag, then the step counter
        aug_root = jax.random.fold_in(base_rng, 0x617567)  # 'aug'

    if norm is not None and not device_aug:
        raise ValueError("norm (in-jit normalisation) requires device_aug")

    def step(state: TrainState, sr_params, batch, lr):
        if device_aug:
            if norm is not None:
                # in-jit normalisation of raw DNs; <=1 f32 ulp vs numpy
                # (XLA's reciprocal-based f32 division). NOT clipped yet:
                # the host clips AFTER augmentation (dataset.py:175-190)
                s2 = ((batch["s2"].astype(jnp.float32)
                       - jnp.asarray(norm["s2_off"], jnp.float32))
                      / jnp.asarray(norm["s2_scale"], jnp.float32))
                s1 = ((batch["s1"].astype(jnp.float32)
                       - jnp.asarray(norm["s1_off"], jnp.float32))
                      / jnp.asarray(norm["s1_scale"], jnp.float32))
                image = jnp.concatenate([s2, s1], axis=-1)
            else:
                image = batch["image"]
            img, height = augment_batch(
                jax.random.fold_in(aug_root, state.step),
                image, batch["height"])
            if norm is not None:
                # host order: clip LAST — clip(rotate(x)) != rotate(clip(x))
                # for saturated pixels, and the host rotates raw DNs
                img = jnp.clip(img, 0, 1)
            if ishir:
                batch = {"image": img,
                         **build_targets(height, lut, cw, isaggre=isaggre)}
            else:
                # ishir=False host semantics (dataset.py:_finish_sample):
                # binary build mask, unit weights
                hf = height.astype(jnp.float32)
                batch = {"image": img, "height": hf,
                         "build": (hf > 0).astype(jnp.int32),
                         "weight": jnp.ones_like(hf)}
        if sr_model is not None:
            sr_fea = sr_model.apply(sr_params, batch["image"][..., rgb],
                                    features_only=True)
            fea_args = (jax.lax.stop_gradient(sr_fea),)
        else:  # nosuper ablation (mymodels.py:341-409): no HR feature input
            fea_args = ()

        def loss_fn(params, log_vars):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], *fea_args, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(base_rng, state.step)},
            )
            if isaggre:
                height, build, aggre = outs
                height = height[..., 0]
                aggre = aggre[..., 0]
                loss = (
                    mse_adapt_weight(height, batch["height"],
                                     batch["weight"], log_vars[0])
                    + mse_adapt_weight(aggre, batch["height_aggre"],
                                       batch["weight_aggre"], log_vars[1])
                    + ce_dice_adapt_weight(build, batch["build"],
                                           batch["weight"], log_vars[2])
                )
            else:
                # plain two-head epoch (train.py:274-312): MSE_adapt +
                # CE_DICE_adapt, no pixel weights, two log-vars
                height, build = outs[0], outs[1]
                height = height[..., 0]
                loss = (mse_adapt(height, batch["height"], log_vars[0])
                        + ce_dice_adapt(build, batch["build"], log_vars[1]))
            rmse = jnp.sqrt(jnp.mean((height - batch["height"]) ** 2))
            return loss, (mutated["batch_stats"], rmse)

        (loss, (new_stats, rmse)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, state.log_vars)
        state = state.apply_gradients(grads[0], grads[1], lr)
        state = state.replace(batch_stats=new_stats)
        metrics = {"loss": loss, "rmse": rmse, "log_vars": state.log_vars}
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, sr_model, rgb_idx=(0, 1, 2)):
    """Validation step (train.py:315-344): plain-MSE loss + RMSE on height."""
    rgb = jnp.asarray(rgb_idx)

    def step(state: TrainState, sr_params, batch):
        fea_args = ()
        if sr_model is not None:
            fea_args = (sr_model.apply(sr_params, batch["image"][..., rgb],
                                       features_only=True),)
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], *fea_args, train=False,
        )
        height = outs[0][..., 0]
        mse = jnp.mean((height - batch["height"]) ** 2)
        return {"loss": mse, "rmse": jnp.sqrt(mse)}

    return jax.jit(step)


def make_predict_step(model, sr_model, rgb_idx=(0, 1, 2)):
    """Inference step returning (height, build logits); the city-scale
    predictor wraps this with stitching (predict_…globe.py:170-177)."""
    rgb = jnp.asarray(rgb_idx)

    def step(state: TrainState, sr_params, image):
        fea_args = ()
        if sr_model is not None:
            fea_args = (sr_model.apply(sr_params, image[..., rgb],
                                       features_only=True),)
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            image, *fea_args, train=False,
        )
        return outs[0][..., 0], outs[1]

    return jax.jit(step)
