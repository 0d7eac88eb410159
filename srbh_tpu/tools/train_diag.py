"""Per-stage diagnosis of train-step throughput vs batch.

Built for the b128->b256 drop flagged in round 4 (404 t/s @ b128 vs 375
@ b256) — and it found the real cause: those numbers came from a chain
whose batch was loop-invariant, so XLA's while-loop LICM hoisted the
frozen-SR pass out of the timed loop (the first run of this tool showed
the loss-FORWARD-only timing exceeding the "full step", which is
impossible for an honest chain). With the LICM-proof chain
(train_bench.build_chained) the honest step is flat: 279.2 t/s @ b128 vs
277.2 @ b256. See tests/test_bench_chains.py.

For each batch size this times, with the relay-honest chained recipe:
  * ``sr``      — the frozen RRDBNet-23 feature forward alone
  * ``fwd``     — the full loss forward incl. the SR pass (no grad)
  * ``step``    — the full fused train step (SR + fwd + bwd + Adam)
and reports the device memory_stats peak after the step where available
(the axon relay returns zeros), so an HBM-pressure explanation (spills /
defrag) is visible directly on real hardware. ``SRBH_TRAIN_REMAT=1``
re-measures with the 256^2 fusion stack rematerialised.

Usage: python -m srbh_tpu.tools.train_diag [batch ...]   (default 128 256)
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
CHAIN = 4


def _time_chained(fn, *args):
    """Median seconds per iteration of CHAIN data-dependent iterations."""
    out = fn(*args)
    # sync on a scalar that depends on the chain
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    float(jnp.asarray(leaves[0]).ravel()[0])
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        float(jnp.asarray(leaves[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    return statistics.median(times) / CHAIN


def run(batch: int):
    from srbh_tpu.tools._cache import enable_compilation_cache
    enable_compilation_cache()
    from srbh_tpu import models
    from srbh_tpu.train.state import TrainState
    from srbh_tpu.train.steps import make_train_step

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    sr = models.RRDBNet(num_block=23, num_feat=64, num_grow_ch=32,
                        dtype=dtype)
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
    batch_dict = {
        "image": x,
        "height": jax.random.uniform(ks[0], (batch, 256, 256)) * 30,
        "height_aggre": jax.random.uniform(ks[1], (batch, 64, 64)) * 30,
        "build": jax.random.randint(ks[2], (batch, 256, 256), 0, 7),
        "weight": jnp.ones((batch, 256, 256)),
        "weight_aggre": jnp.ones((batch, 64, 64)),
    }
    step = make_train_step(model, sr, isaggre=True, seed=1337)

    # --- sr features forward only (chained through a data dependence)
    @jax.jit
    def sr_chain(sr_params, img):
        def body(i, carry):
            fea = sr.apply(sr_params, carry[..., :3].astype(dtype),
                           features_only=True)
            # fold the result back into a 64x64x8 carry (data dependence)
            red = fea[:, ::4, ::4, :8].astype(img.dtype)
            return carry + 1e-12 * red
        return jax.lax.fori_loop(0, CHAIN, body, img)

    t_sr = _time_chained(sr_chain, sr_params, x)

    # --- full loss forward (train-mode BN, adaptive losses, NO grad),
    # chained via a scalar perturbation of the image (data dependence)
    from srbh_tpu.losses.adaptive import (ce_dice_adapt_weight,
                                          mse_adapt_weight)

    def loss_only(params, log_vars, batch_stats, img, key, sr_p, tgt):
        sr_fea = sr.apply(sr_p, img[..., :3].astype(dtype),
                          features_only=True)
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, jax.lax.stop_gradient(sr_fea), train=True,
            mutable=["batch_stats"], rngs={"dropout": key})
        height, build, aggre = outs
        return (mse_adapt_weight(height[..., 0], tgt["height"],
                                 tgt["weight"], log_vars[0])
                + mse_adapt_weight(aggre[..., 0], tgt["height_aggre"],
                                   tgt["weight_aggre"], log_vars[1])
                + ce_dice_adapt_weight(build, tgt["build"],
                                       tgt["weight"], log_vars[2]))

    # sr_params/targets are ARGS, not closures: a captured tree becomes
    # an XLA constant hashed through the relay per compile (CLAUDE.md)
    @jax.jit
    def fwd_chain(state, sr_p, tgt, img):
        def body(i, carry):
            loss = loss_only(state.params, state.log_vars,
                             state.batch_stats, carry,
                             jax.random.fold_in(rng, i), sr_p, tgt)
            return img + 1e-12 * loss.astype(img.dtype)
        return jax.lax.fori_loop(0, CHAIN, body, img)

    # f32 carry, exactly like the real step's batch["image"]
    t_fwd = _time_chained(fwd_chain, state, sr_params, batch_dict, x)

    # --- full train step chained via the state carry
    @jax.jit
    def step_chain(state, sr_params, batch_dict):
        def body(i, carry):
            st, metrics = carry
            # carry-dependent image: defeats while-loop LICM of the
            # frozen-SR pass (see train_bench.py — hoisting inflated the
            # step throughput ~60%)
            bd = dict(batch_dict)
            bd["image"] = batch_dict["image"] + 1e-12 * metrics["loss"]
            return step(st, sr_params, bd, jnp.float32(1e-3))
        return jax.lax.fori_loop(
            0, CHAIN, body,
            (state, {"loss": jnp.float32(0), "rmse": jnp.float32(0),
                     "log_vars": state.log_vars}))

    t_step = _time_chained(step_chain, state, sr_params, batch_dict)
    mem = jax.local_devices()[0].memory_stats() or {}
    rec = {
        "batch": batch, "remat": remat,
        "sr_fwd_ms": round(t_sr * 1000, 1),
        "loss_fwd_ms": round(t_fwd * 1000, 1),
        "step_ms": round(t_step * 1000, 1),
        "tiles_per_sec": round(batch / t_step, 1),
        "peak_bytes_in_use_gb": round(
            mem.get("peak_bytes_in_use", 0) / 2**30, 2),
        "bytes_in_use_gb": round(mem.get("bytes_in_use", 0) / 2**30, 2),
        "largest_alloc_gb": round(
            mem.get("largest_alloc_size", 0) / 2**30, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [128, 256]
    for b in batches:
        run(b)
