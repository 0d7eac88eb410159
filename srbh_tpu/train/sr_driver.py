"""Real-ESRGAN finetune + evaluation drivers.

The reference finetunes its SR generator with the upstream BasicSR recipe
(SR/finetune_realesrgan_x4plus_pairdata.yml) on S2->GoogleEarth pairs and
evaluates PSNR/SSIM into ``weights/realesrgan/acc{N}.txt``. Here both live
in-framework:

* :func:`train_sr`   — iterate ``LRHRPairDataset`` batches through the fused
  GAN step (``srbh_tpu.train.sr_trainer``); periodic orbax checkpoints of
  ``{params, params_ema}`` (the ``net_g.tar`` payload,
  SR/rrdbnet_arch.py:511-522) + the discriminator.
* :func:`eval_sr`    — PSNR/SSIM (+cPSNR/LPIPS slots) of the EMA generator
  over a pair list, writing the reference's ``acc{N}.txt`` column format
  (header ``psnr, ssim`` then one metric per line).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu.data.dataset import LRHRPairDataset
from srbh_tpu.data.pipeline import DataLoader
from srbh_tpu.metrics.image import calculate_cpsnr, calculate_psnr, calculate_ssim
from srbh_tpu.train.checkpoint import load_checkpoint
from srbh_tpu.train.sr_trainer import GANTrainState, RealESRGANTrainer


def save_sr_checkpoint(logdir: str, state: GANTrainState, epoch: int):
    """net_g (params + params_ema) and net_d payloads (orbax dirs)."""
    from srbh_tpu.train.checkpoint import commit_payload

    for name, payload in (
        ("net_g", {"params": jax.device_get(state.g_params),
                   "params_ema": jax.device_get(state.g_ema),
                   "epoch": epoch, "current_iter": int(state.step)}),
        ("net_d", {"params": jax.device_get(state.d_vars["params"]),
                   "epoch": epoch, "current_iter": int(state.step)}),
    ):
        commit_payload(os.path.join(logdir, name), payload)
    return os.path.join(logdir, "net_g")


def train_sr(trainer: RealESRGANTrainer, dataset: LRHRPairDataset,
             logdir: str, epochs: int = 2, batch_size: int = 12,
             num_workers: int = 4, seed: int = 0,
             state: Optional[GANTrainState] = None,
             log_every: int = 50):
    """Paired GAN finetuning loop (yml recipe: batch 12, hflip aug in the
    dataset, L1+perceptual+0.1 GAN, EMA 0.999)."""
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True,
                        num_workers=num_workers, drop_last=True, seed=seed)
    sample = dataset[0]
    if state is None:
        state = trainer.init(jax.random.PRNGKey(seed),
                             (batch_size,) + sample["lq"].shape)
    step = trainer.make_step()
    os.makedirs(logdir, exist_ok=True)
    for epoch in range(1, epochs + 1):
        for i, batch in enumerate(loader):
            state, m = step(state, jnp.asarray(batch["lq"]),
                            jnp.asarray(batch["gt"]))
            if i % log_every == 0:
                print(f"sr epoch {epoch} iter {i}: "
                      f"g={float(m['l_g_total']):.4f} "
                      f"pix={float(m['l_g_pix']):.4f} "
                      f"d={float(m['l_d_real'] + m['l_d_fake']):.4f}")
        save_sr_checkpoint(logdir, state, epoch)
    return state


def eval_sr(trainer: RealESRGANTrainer, state: GANTrainState,
            dataset: LRHRPairDataset, txtpath: Optional[str] = None,
            batch_size: int = 8, max_batches: Optional[int] = None):
    """PSNR/SSIM of the EMA generator over LR/HR pairs; writes the
    ``acc{N}.txt`` schema (psnr, ssim, then zero-filled slots + cPSNR)."""
    # cache the jitted EMA forward on the trainer: a fresh lambda per call
    # would be a new jit cache key, recompiling the full generator on
    # every periodic eval
    fn = getattr(trainer, "_eval_sr_jit", None)
    if fn is None:
        apply = trainer.ema_apply_fn()
        fn = trainer._eval_sr_jit = jax.jit(
            lambda s, x: apply(s, x))
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        num_workers=2)
    psnrs, ssims, cpsnrs = [], [], []
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        out = np.asarray(fn(state, jnp.asarray(batch["lq"])))
        gt = np.asarray(batch["gt"])
        for k in range(out.shape[0]):
            o = (np.clip(out[k], 0, 1) * 255.0).round()
            g = (gt[k] * 255.0).round()
            psnrs.append(calculate_psnr(o, g))
            ssims.append(calculate_ssim(o, g))
            cpsnrs.append(calculate_cpsnr(o, g))
    if not psnrs:  # empty loader / max_batches=0: report empty, not NaN
        res = {"psnr": 0.0, "ssim": 0.0, "cpsnr": 0.0}
    else:
        res = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
               "cpsnr": float(np.mean(cpsnrs))}
    if txtpath:
        with open(txtpath, "w") as f:
            # reference schema (weights/realesrgan/acc2.txt): header then
            # psnr, ssim, two reserved slots (clipscore/lpips: optional
            # learned metrics), cpsnr
            f.write("psnr, ssim\n")
            f.write(f"{res['psnr']:.3f}\n{res['ssim']:.3f}\n")
            f.write("0.000\n0.000\n")
            f.write(f"{res['cpsnr']:.3f}\n")
    return res


def load_sr_generator(trainer: RealESRGANTrainer, logdir: str,
                      state: GANTrainState) -> GANTrainState:
    """Restore net_g (params + EMA) into a fresh GAN state."""
    payload = load_checkpoint(os.path.join(logdir, "net_g"))
    if payload is None:
        return state
    return state.replace(
        g_params=jax.tree_util.tree_map(jnp.asarray, payload["params"]),
        g_ema=jax.tree_util.tree_map(jnp.asarray, payload["params_ema"]))
