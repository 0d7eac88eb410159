"""Training and evaluation drivers.

Twins of the reference's train.py orchestration:

* :func:`main`       (train.py:84-223) — seeds, loaders, frozen SR model,
  height model, resume, epoch loop with step-LR, per-epoch validation,
  checkpoint/snapshot/best, TensorBoard scalars
  (lr, train/loss, train/rmse, val/loss, val/rmse, lossweight/w1-3).
* :func:`main_test`  (train.py:347-425 + vtest_epoch2 :427-486) — test-set
  evaluation producing ``acc{epoch}{suffix}_{num}.txt`` (RMSE),
  ``*_seg.csv`` and ``*_he.csv`` in the reference's exact schemas, plus
  optional per-tile prediction GeoTIFFs.

TPU shape: one jitted train step fuses the frozen-SR pass, model, losses and
optimiser; batches stream through the threaded DataLoader with device
prefetch; on a multi-chip mesh the same driver shards batches over ``data``.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu import models
from srbh_tpu.data.dataset import S12GlobeDataset
from srbh_tpu.data.pipeline import DataLoader
from srbh_tpu.metrics import (
    AverageMeter,
    HeightMetric,
    SegmentationMetric,
    acc2file_height,
    acc2file_rmse,
    acc2file_seg,
)
from srbh_tpu.parallel import mesh as pmesh
from srbh_tpu.train.checkpoint import (
    load_checkpoint,
    restore_into_state,
    save_checkpoint,
    wait_for_saves,
)
from srbh_tpu.train.config import TrainConfig
from srbh_tpu.train.schedule import step_decay_lr
from srbh_tpu.train.state import TrainState
from srbh_tpu.train.steps import make_eval_step, make_predict_step, make_train_step


def build_models(cfg: TrainConfig, dtype=None):
    dtype = dtype or (jnp.bfloat16 if cfg.bf16 else jnp.float32)
    if getattr(cfg, "model_variant", "feature") == "nosuper":
        # no-SR ablation (mymodels.py:341-409): no frozen feature extractor
        model = models.SRRegressClsNosuper(
            encoder_name=cfg.encoder_name, upscale=cfg.upscale,
            isaggre=cfg.isaggre, chans_build=cfg.chans_build, dtype=dtype)
        return model, None
    sr = models.RRDBNet(num_block=cfg.sr_num_block, num_feat=cfg.sr_num_feat,
                        num_grow_ch=cfg.sr_num_grow, dtype=dtype)
    model = models.SRRegressClsFeature(
        encoder_name=cfg.encoder_name, super_mid=cfg.super_mid,
        upscale=cfg.upscale, isaggre=cfg.isaggre, chans_build=cfg.chans_build,
        remat=getattr(cfg, "remat", False), dtype=dtype)
    return model, sr


def init_models(cfg: TrainConfig, model, sr, tile: Optional[int] = None):
    tile = tile or cfg.tile
    rng = jax.random.PRNGKey(cfg.seed)
    x = jnp.zeros((2, tile, tile, cfg.nchans))
    if sr is None:  # nosuper ablation
        return jax.jit(model.init)(rng, x), None
    sr_params = jax.jit(sr.init)(rng, x[..., : len(cfg.rgbseq)])
    fea = jnp.zeros((2, tile * 4, tile * 4, sr.num_feat))
    variables = jax.jit(model.init)(rng, x, fea)
    return variables, sr_params


def load_sr_params(cfg: TrainConfig, sr_params):
    """Load the frozen Real-ESRGAN EMA generator (train.py:133-140).

    Accepts an orbax checkpoint dir holding the SR param tree (the converted
    ``net_g_ema``); falls back to the random init when absent.
    """
    payload = load_checkpoint(cfg.logdirhr)
    if payload is None:
        return sr_params, False
    # prefer the EMA generator, like the reference's ['net_g_ema'] load
    # (train.py:137-138); sr_driver checkpoints carry both params/params_ema
    tree = payload.get("params_ema", payload.get("params", payload))
    return {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"])
            if "params" in tree else jax.tree_util.tree_map(jnp.asarray, tree)
            }, True


def _make_loader(cfg: TrainConfig, listname: str, aug: bool, isaggre: bool,
                 ishir: bool, num_sample: int = 0, shuffle: bool = True,
                 preweight: Optional[str] = None, sharding=None,
                 device_put: bool = True, drop_last: bool = False,
                 device_aug: bool = False, device_norm: bool = False,
                 batch_size: Optional[int] = None):
    """Loader with async device prefetch: batches are already on device
    (optionally data-axis sharded) when the step consumes them, so the jitted
    step never blocks on a synchronous host->device copy."""
    ds = S12GlobeDataset(
        os.path.join(cfg.datapath, listname), cfg.datapath,
        datastats=cfg.datastats, normmethod="minmax", datarange=(0, 1),
        aug=aug, num_sample=num_sample, s1dir=cfg.s1dir, s2dir=cfg.s2dir,
        heightdir=cfg.bhdir, preweight=preweight, isaggre=isaggre,
        ishir=ishir, hir=cfg.hir, nchans=cfg.nchanss2, seed=cfg.seed,
        device_aug=device_aug, device_norm=device_norm)
    return DataLoader(ds, batch_size=batch_size or cfg.batch_size,
                      shuffle=shuffle,
                      num_workers=cfg.num_workers, seed=cfg.seed,
                      drop_last=drop_last, device_put=device_put,
                      sharding=sharding)


def _to_device_batch(batch, isaggre=True, device_aug=False,
                     device_norm=False):
    if device_norm:
        keys = ["s2", "s1", "height"]  # raw DNs; normalise in-jit
    elif device_aug:
        keys = ["image", "height"]  # targets are built in-jit
    else:
        keys = ["image", "height", "build", "weight"]
        if isaggre:
            keys += ["height_aggre", "weight_aggre"]
    return {k: jnp.asarray(batch[k]) for k in keys}


def main(cfg: TrainConfig, writer=None, max_steps_per_epoch: Optional[int] = None,
         data_parallel: Optional[bool] = None, fsdp: bool = False):
    """The training driver; returns the final TrainState.

    ``data_parallel`` (default: auto when >1 device) shards batches over the
    mesh's ``data`` axis with replicated state — XLA inserts the gradient
    psum (SURVEY.md §2.5 TPU-native equivalent of the reference's absent DP).
    ``fsdp`` additionally shards params + optimizer moments over the same
    axis (ZeRO-3 style, ``parallel/mesh.py:shard_state_fsdp``): each chip
    stores 1/n of the train state and GSPMD inserts the transient param
    all-gathers / gradient reduce-scatters. Numerics match the replicated
    DP step (tests/test_fsdp.py). Implies ``data_parallel``.
    """
    np.random.seed(cfg.seed)
    fsdp = fsdp or getattr(cfg, "fsdp", False)
    if fsdp:
        if cfg.batch_size % jax.device_count() != 0:
            raise ValueError(
                f"fsdp requires batch_size divisible by the device count "
                f"(got batch_size={cfg.batch_size}, "
                f"devices={jax.device_count()}); pick a multiple or drop "
                f"--fsdp")
        data_parallel = True
    if data_parallel is None:
        # auto-DP only when every batch can shard evenly over the devices
        data_parallel = (jax.device_count() > 1
                         and cfg.batch_size % jax.device_count() == 0)
    mesh = pmesh.make_mesh() if data_parallel else None
    sharding = pmesh.batch_sharding(mesh) if mesh is not None else None

    # fixed-shape sharded batches on a mesh: drop ragged tails
    device_norm = getattr(cfg, "device_norm", False)
    # device_norm builds on the device_aug step (normalise -> aug -> targets)
    device_aug = getattr(cfg, "device_aug", False) or device_norm
    trainloader = _make_loader(cfg, cfg.trainlist, aug=not device_aug,
                               isaggre=cfg.isaggre, ishir=cfg.ishir,
                               num_sample=cfg.num_sample,
                               preweight=cfg.preweight, sharding=sharding,
                               drop_last=mesh is not None,
                               device_aug=device_aug,
                               device_norm=device_norm)
    valloader = _make_loader(cfg, cfg.vallist, aug=False, isaggre=False,
                             ishir=False, num_sample=cfg.num_sample // 2,
                             shuffle=False, sharding=sharding,
                             drop_last=mesh is not None)

    model, sr = build_models(cfg)
    variables, sr_params = init_models(cfg, model, sr)
    if sr is not None:
        sr_params, loaded = load_sr_params(cfg, sr_params)
        if not loaded:
            print("=> no SR checkpoint found; using random frozen features")
    resume = os.path.join(cfg.logdir, "checkpoint")
    payload = load_checkpoint(resume)
    if payload is None:
        # pretrained-encoder start: the reference ALWAYS trains from an
        # ImageNet B4 (mymodels.py:234,242-243 encoder_weights="imagenet");
        # its 20-epoch budget and accuracy goldens assume it. Only a FRESH
        # run grafts/warns — a resumed run takes its encoder from the
        # checkpoint restored below, so grafting here would be discarded
        # (and the random-encoder warning would be false).
        if getattr(cfg, "encoder_weights", None):
            from srbh_tpu.train.convert import graft_encoder_npz

            variables = graft_encoder_npz(variables, cfg.encoder_weights)
            print(f"=> encoder initialised from {cfg.encoder_weights}")
        else:
            print("WARNING: training starts from a RANDOM encoder — the "
                  "reference always uses ImageNet weights (mymodels.py:242). "
                  "Convert them offline with `python -m srbh_tpu.train.convert "
                  "effnet-b4.pth enc.npz --arch imagenet-encoder` and pass "
                  "--encoder_weights enc.npz.")

    state = TrainState.create(variables,
                              n_log_vars=3 if cfg.isaggre else 2,
                              lr=cfg.lr,
                              weight_decay=cfg.weight_decay)
    start_epoch, best_rmse = 0, float("inf")
    if payload is not None:
        state = restore_into_state(state, payload)
        start_epoch = payload["epoch"]
        best_rmse = payload.get("best_rmse", float("inf"))
        # advance the loaders to the resumed position so epochs N+1.. see
        # the SAME shuffle order / augmentation draws as an uninterrupted
        # run (DataLoader.__iter__ consumes-then-increments .epoch)
        trainloader.epoch = start_epoch
        valloader.epoch = start_epoch
        print(f"=> resumed epoch {start_epoch}")

    ds = trainloader.dataset
    train_step = make_train_step(
        model, sr, cfg.rgbseq, cfg.isaggre, seed=cfg.seed,
        device_aug=device_aug, hir=cfg.hir, class_weight=ds.heightweight,
        ishir=cfg.ishir,
        norm={"s2_off": ds.s2_off, "s2_scale": ds.s2_scale,
              "s1_off": ds.s1_off, "s1_scale": ds.s1_scale}
        if device_norm else None)
    eval_step = make_eval_step(model, sr, cfg.rgbseq)
    if mesh is not None:
        state = (pmesh.shard_state_fsdp(state, mesh) if fsdp
                 else pmesh.replicate(state, mesh))
        if sr_params is not None:
            # the frozen trunk has no optimizer state; FSDP-shard its params
            # too so each chip stores 1/n of the 16.7 M-param RRDBNet
            sr_params = (pmesh.shard_state_fsdp(sr_params, mesh) if fsdp
                         else pmesh.replicate(sr_params, mesh))

    os.makedirs(cfg.logdir, exist_ok=True)
    if writer is None:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(log_dir=cfg.logdir)
        except Exception:
            writer = None

    for epoch in range(start_epoch + 1, cfg.maxepoch + 1):
        lr = step_decay_lr(cfg.lr, epoch)
        losses, rmses = AverageMeter(), AverageMeter()
        for i, batch in enumerate(trainloader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            b = _to_device_batch(batch, cfg.isaggre, device_aug=device_aug,
                                 device_norm=device_norm)
            # height is present in every mode (device_norm batches carry
            # s2/s1 instead of image)
            n = b["height"].shape[0]
            state, m = train_step(state, sr_params, b, jnp.asarray(lr))
            losses.update(float(m["loss"]), n)
            rmses.update(float(m["rmse"]), n)
        log_vars = np.asarray(state.log_vars)

        val_losses, val_rmses = AverageMeter(), AverageMeter()
        for i, batch in enumerate(valloader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            # batches arrive pre-placed (and pre-sharded on a mesh) by the
            # loader's prefetch thread; this just selects the step's keys
            b = _to_device_batch(batch, isaggre=False)
            m = eval_step(state, sr_params, b)
            n = b["image"].shape[0]
            val_losses.update(float(m["loss"]), n)
            val_rmses.update(float(m["rmse"]), n)

        if val_rmses.count == 0:
            # an empty val loop (val set < batch with drop_last) would
            # otherwise report rmse 0.0 and pin model_best to this epoch
            print("warning: validation produced no batches; "
                  "val rmse not comparable this epoch")
            is_best = False
        else:
            is_best = val_rmses.avg < best_rmse
            best_rmse = min(val_rmses.avg, best_rmse)
        save_checkpoint(cfg.logdir, state, epoch, best_rmse,
                        snapshot_every=5, is_best=is_best,
                        save_opt_state=cfg.save_opt_state,
                        async_save=cfg.async_checkpoint)
        print(f"epoch {epoch}: lr {lr:.6f} train loss {losses.avg:.3f} "
              f"rmse {rmses.avg:.3f} | val rmse {val_rmses.avg:.3f}"
              f"{' *best*' if is_best else ''}")
        if writer is not None:
            writer.add_scalar("lr", lr, epoch)
            writer.add_scalar("train/loss", losses.avg, epoch)
            writer.add_scalar("train/rmse", rmses.avg, epoch)
            writer.add_scalar("val/loss", val_losses.avg, epoch)
            writer.add_scalar("val/rmse", val_rmses.avg, epoch)
            # 3 log_vars with isaggre, 2 without (train.py:214-222 logs w1-3)
            for k in range(int(np.asarray(log_vars).shape[0])):
                writer.add_scalar(f"lossweight/w{k + 1}", float(log_vars[k]), epoch)
    wait_for_saves()  # join any in-flight async checkpoint commit
    if writer is not None:
        writer.close()
    return state


def main_test(cfg: TrainConfig, num_sample: int = 100, suffix: str = "",
              issave: bool = False, max_batches: Optional[int] = None,
              batch_size: int = 1):
    """Test-set evaluation writing the reference's acc artifacts
    (train.py:347-425, vtest_epoch2 :427-486).

    ``batch_size`` defaults to 1 like the reference's main_test
    (train.py:349): the headline RMSE is an AverageMeter over per-BATCH
    RMSEs (vtest_epoch2 :444-446), so at batch 1 it is the MEAN of
    per-tile RMSEs — a different (Jensen-smaller) statistic than a
    pooled sqrt-of-mean over larger batches. Keep 1 for comparisons
    against the reference accuracy goldens; the seg/height-class CSVs
    are streaming-exact at any batch size.
    """
    loader = _make_loader(cfg, cfg.testlist, aug=False, isaggre=False,
                          ishir=True, num_sample=num_sample,
                          preweight=cfg.preweight, shuffle=True,
                          batch_size=batch_size)
    model, sr = build_models(cfg)
    variables, sr_params = init_models(cfg, model, sr)
    if sr is not None:
        sr_params, _ = load_sr_params(cfg, sr_params)

    state = TrainState.create(variables,
                              n_log_vars=3 if cfg.isaggre else 2,
                              lr=cfg.lr)
    resume = os.path.join(cfg.logdir, cfg.checkpoint)
    payload = load_checkpoint(resume)
    if payload is None:
        print(f"=> no checkpoint at {resume}; stopping")
        return None
    state = restore_into_state(state, payload)
    epoch = payload["epoch"]

    predict_step = make_predict_step(model, sr, cfg.rgbseq)
    acc_total = AverageMeter()
    acc_seg = SegmentationMetric(cfg.chans_build)
    acc_he = HeightMetric(cfg.chans_build)

    respath = os.path.join(cfg.logdir, f"pred_{epoch}_{suffix}")
    if issave:
        os.makedirs(respath, exist_ok=True)

    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        x = jnp.asarray(batch["image"])
        y_true = jnp.asarray(batch["height"])
        build = jnp.asarray(batch["build"])
        ypred, build_logits = predict_step(state, sr_params, x)
        rmse = float(jnp.sqrt(jnp.mean((ypred - y_true) ** 2)))
        acc_total.update(rmse, x.shape[0])
        build_pred = jnp.argmax(build_logits, axis=-1)
        acc_seg.add_batch(build_pred, build)
        acc_he.add_batch(ypred, y_true, build)
        if issave:
            from srbh_tpu.predict.writers import array2raster_rio

            hp = np.array(ypred)  # copy: jax buffers are read-only
            hp[hp < 0] = 0
            hp = np.round(hp * 10).astype(np.uint16)
            bp = np.asarray(build_pred).astype(np.uint8)
            for k, imgpath in enumerate(batch["path"]):
                ibase = os.path.basename(imgpath)[:-4]
                array2raster_rio(os.path.join(respath, ibase + "_predprob.tif"),
                                 hp[k], imgpath, iscmap=False,
                                 compress="PACKBITS")
                array2raster_rio(os.path.join(respath, ibase + "_build.tif"),
                                 bp[k], imgpath, iscmap=True,
                                 compress="PACKBITS")

    txtpath = os.path.join(cfg.logdir, f"acc{epoch}{suffix}_{num_sample}.txt")
    acc2file_rmse(acc_total, txtpath)
    acc2file_seg(acc_seg, txtpath[:-4] + "_seg.txt")
    acc2file_height(acc_he, txtpath[:-4] + "_he.txt")
    return {"rmse": acc_total.avg, "oa": acc_seg.overall_accuracy(),
            "txtpath": txtpath}
