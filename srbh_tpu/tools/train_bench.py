"""Training-step throughput bench for the flagship height model on one chip.

Times the FULL fused train step — frozen RRDBNet-23 feature pass (no-grad),
EfficientNet-B4 U-Net forward/backward, three adaptive losses, torch-Adam
update (srbh_tpu/train/steps.py) — with the relay-honest recipe: N steps
chained through the train-state carry inside one jit (the state update is a
genuine data dependence, so no extra synthetic chaining is needed).

Reference point: the PyTorch reference trains batch 16 on a single CUDA GPU
(train.py:97); it publishes no throughput numbers (BASELINE.md), so the
figure here is the TPU-native record to track across rounds.

Measured sweep (one v5e chip, bf16, median of 3, LICM-proof chain — see
``build_chained``): 150.3 t/s @ b64 (425.8 ms — the frozen trunk alone
takes 277.9 ms at b64 vs 196.3 at b128: XLA's conv tiling is
pathological there, don't use it), **379.1 t/s @ b128 (337.7 ms/step,
default)**, 276.0 @ b192 (non-pow2 tiles badly), 377.8 t/s @ b256
(677.6 ms/step); remat @ b128 344.9 (a pure ~33 ms recompute cost
single-chip). At 379 t/s the reference's full training budget (45k
tiles x 0.7 train split x 20 epochs) is ~28 minutes on ONE chip.

HISTORY (two measurement/perf findings, round 5):
* Rounds 2-4 reported 226/404/375 t/s @ b64/128/256. Those chains had a
  loop-INVARIANT batch: XLA's while-loop LICM hoisted the frozen-SR pass
  (135 GFLOP/tile) out of the timed chain, so they covered only the
  height fwd+bwd+Adam slice. The apparent b128->b256 "drop" (404->375)
  was an artifact of that slice; the honest step is flat b128->b256.
  Guarded by tests/test_bench_chains.py.
* The honest step then measured 279.2/277.2 t/s — and per-stage
  attribution showed the adaptive LOSSES cost 120 ms/step @ b128, 4x the
  height-model forward: ``take_along_axis`` on the class (lane) axis is
  a per-pixel dynamic gather on TPU. Replacing it with a compare+select
  +reduce (losses/adaptive.py:pick_class, bitwise-identical) cut the
  loss to 3.5 ms => 279 -> 379 t/s (+36%).

Usage: python -m srbh_tpu.tools.train_bench [batch] [chain_steps]
Env: SRBH_TRAIN_REMAT=1 re-measures with the 256^2 fusion stack
rematerialised (jax.checkpoint) — the HBM-for-FLOPs tradeoff knob.
     SRBH_TRAIN_DEVICE_AUG=1 re-measures with in-jit augmentation +
target building (ops/device_aug.py) — quantifies what moving the host
pipeline's cv2 work onto the chip costs in device time.
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


def build_chained(step, chain: int):
    """Chain ``chain`` train steps through the state carry inside ONE jit.

    The previous step's loss is threaded into the image: the frozen-SR
    pass otherwise depends only on loop invariants and XLA's while-loop
    LICM hoists it clean out of the chain (measured on chip: the hoisted
    bench read 398 t/s @ b128 vs the honest number — the fwd-only timing
    EXCEEDING the "full step" was the smoking gun). The 1e-12 * loss
    perturbation is far below the data's quantisation noise but makes the
    input genuinely carry-dependent. tests/test_bench_chains.py compiles
    this exact chain and asserts every convolution stays inside the
    while-loop body.
    """
    @jax.jit
    def chained(state, sr_params, batch_dict):
        def body(i, carry):
            state, metrics = carry
            bd = dict(batch_dict)
            bd["image"] = batch_dict["image"] + 1e-12 * metrics["loss"]
            return step(state, sr_params, bd, jnp.float32(1e-3))
        state, metrics = jax.lax.fori_loop(
            0, chain, body, (state, {"loss": jnp.float32(0),
                                     "rmse": jnp.float32(0),
                                     "log_vars": state.log_vars}))
        return state, metrics
    return chained


def main(batch: int = 128, chain: int = 4):
    from srbh_tpu.tools._cache import enable_compilation_cache
    enable_compilation_cache()
    from srbh_tpu import models
    from srbh_tpu.train.state import TrainState
    from srbh_tpu.train.steps import make_train_step

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    sr = models.RRDBNet(num_block=23, num_feat=64, num_grow_ch=32, dtype=dtype)
    remat = os.environ.get("SRBH_TRAIN_REMAT", "0") == "1"
    model = models.SRRegressClsFeature(
        encoder_name="efficientnet-b4", super_mid=16, isaggre=True,
        chans_build=7, remat=remat, dtype=dtype)

    x = jax.random.uniform(rng, (batch, 64, 64, 8), jnp.float32)
    sr_params = jax.jit(sr.init)(rng, x[..., :3].astype(dtype))
    variables = jax.jit(model.init)(
        rng, x.astype(dtype), jnp.zeros((batch, 256, 256, 64), dtype))
    state = TrainState.create(variables, n_log_vars=3, lr=1e-3)

    ks = jax.random.split(rng, 6)
    device_aug = os.environ.get("SRBH_TRAIN_DEVICE_AUG", "0") == "1"
    if device_aug:
        batch_dict = {
            "image": x,
            "height": jax.random.randint(ks[0], (batch, 256, 256), 0, 120
                                         ).astype(jnp.uint8),
        }
        import numpy as np

        step = make_train_step(model, sr, isaggre=True, seed=1337,
                               device_aug=True, class_weight=np.ones(7))
    else:
        batch_dict = {
            "image": x,
            "height": jax.random.uniform(ks[0], (batch, 256, 256)) * 30,
            "height_aggre": jax.random.uniform(ks[1], (batch, 64, 64)) * 30,
            "build": jax.random.randint(ks[2], (batch, 256, 256), 0, 7),
            "weight": jnp.ones((batch, 256, 256)),
            "weight_aggre": jnp.ones((batch, 64, 64)),
        }
        step = make_train_step(model, sr, isaggre=True, seed=1337)

    chained = build_chained(step, chain)

    state2, metrics = chained(state, sr_params, batch_dict)
    loss = float(metrics["loss"])  # sync
    assert loss == loss, "non-finite loss"
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _, m = chained(state, sr_params, batch_dict)
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    ms = statistics.median(times) / chain * 1000
    tiles = batch / (ms / 1000)
    print(json.dumps({
        "metric": "height_train_tiles_per_sec_per_chip"
                  + ("_devaug" if device_aug else ""),
        "value": round(tiles, 2), "unit": "tiles/sec",
        "batch": batch, "ms_per_step": round(ms, 1),
        "loss": round(loss, 2),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
