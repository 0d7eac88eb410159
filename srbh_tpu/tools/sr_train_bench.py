"""SR-GAN training-step throughput bench on one chip.

The reference's SECOND training workload (SR/rrdbnet_arch.py:538-592 +
finetune_realesrgan_x4plus_pairdata.yml: 400k iters, batch 12/GPU,
gt_size 256 => lq 64): full fused Real-ESRGAN step — USM-sharpened GT,
generator L1 + VGG19-perceptual + GAN losses, UNet-SN discriminator
real/fake passes with power-iteration updates, both Adam updates, EMA —
timed with the relay-honest recipe (N steps chained through the
GANTrainState carry inside one jit, scalar-transfer sync).

Measured (one v5e chip, bf16): **43.9 t/s @ b12** (273.3 ms/step; the
reference's 400k-iter recipe is ~30 h on one chip) and **58.4 t/s @ b16
at the SAME 273.8 ms/step** — batch 12 pads the MXU tiles, so the
TPU-native recipe should use 16. History: first reading was 37.9 t/s
with an invariant gt (XLA LICM hoisted the VGG19-on-GT pass, ~87 ms of
real per-batch work — lq/gt must be carry-dependent; see
train_bench.build_chained); the honest 29.7 t/s then broke down as USM
139 ms / G fwd 69.6 / rest — the 51-tap Gaussian ran as a 51x51
depthwise (grouped) conv off the MXU; the separable banded-matmul form
(ops/usm.py:separable_filter_reflect) is 6.8 ms => 273 ms/step.

Batch scaling (measured): b12 and b16 run at the SAME ~273 ms/step
(43.9 vs 58.4 t/s — b12 pads the MXU tiles); b24+ OOMs without remat
(21.4G > 15.75G HBM: the bwd keeps every RRDB activation).
``SRBH_SR_REMAT=1`` re-measures with per-RRDB rematerialisation
(RealESRGANTrainer(remat=True)) — the HBM-for-FLOPs knob for larger
batches.

Usage: python -m srbh_tpu.tools.sr_train_bench [batch] [chain_steps]
   or: python bench.py --sr-train [batch]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time


import jax
import jax.numpy as jnp


REPEATS = 3


def main(batch: int = 12, chain: int = 4, num_block: int = 23,
         num_feat: int = 64, num_grow_ch: int = 32, lq_size: int = 64,
         perceptual: bool = True, disc_feat: int = 64):
    from srbh_tpu.tools._cache import enable_compilation_cache
    enable_compilation_cache()
    from srbh_tpu.train.sr_trainer import RealESRGANTrainer

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    remat = os.environ.get("SRBH_SR_REMAT", "0") == "1"
    tr = RealESRGANTrainer(num_block=num_block, num_feat=num_feat,
                           num_grow_ch=num_grow_ch, perceptual=perceptual,
                           disc_feat=disc_feat, dtype=dtype, remat=remat)
    lq_shape = (batch, lq_size, lq_size, 3)
    state = tr.init(rng, lq_shape)
    step = tr.make_step()

    k1, k2 = jax.random.split(rng)
    lq = jax.random.uniform(k1, lq_shape, jnp.float32)
    gt = jax.random.uniform(k2, (batch, lq_size * 4, lq_size * 4, 3),
                            jnp.float32)

    @jax.jit
    def chained(state, lq, gt):
        def body(i, carry):
            state, metrics = carry
            # carry-dependent inputs: everything heavy already depends on
            # the per-step params, but the USM sharpen of gt is otherwise
            # loop-invariant and LICM-hoistable — keep it in the loop like
            # a real data stream would
            state, m = step(state, lq + 1e-12 * metrics["l_g_total"],
                            gt + 1e-12 * metrics["l_g_total"])
            return state, {k: jnp.asarray(v, jnp.float32)
                           for k, v in m.items()}
        zero = jnp.float32(0)
        init_metrics = {k: zero for k in (
            "l_g_pix", "l_g_percep", "l_g_gan", "l_g_total",
            "l_d_real", "l_d_fake", "out_d_real", "out_d_fake")}
        return jax.lax.fori_loop(0, chain, body, (state, init_metrics))

    st2, metrics = chained(state, lq, gt)
    total = float(metrics["l_g_total"])  # sync
    assert total == total, "non-finite generator loss"
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _, m = chained(state, lq, gt)
        float(m["l_g_total"])
        times.append(time.perf_counter() - t0)
    ms = statistics.median(times) / chain * 1000
    tiles = batch / (ms / 1000)
    print(json.dumps({
        "metric": "sr_gan_train_tiles_per_sec_per_chip",
        "value": round(tiles, 2), "unit": "tiles/sec",
        "batch": batch, "ms_per_step": round(ms, 1),
        "l_g_total": round(total, 3),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
