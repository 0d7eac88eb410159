"""Per-stage chained-timing profile of the flagship inference pipeline.

Breaks the bench.py pipeline (frozen RRDBNet-23 features + B4 U-Net height
model + predictor post-processing) into stages and times each with the same
relay-safe recipe bench.py uses: N data-dependent iterations chained through
a ``lax.fori_loop`` carry inside ONE jit, synchronised by a scalar transfer.

Stages
------
trunk     frozen RRDBNet features (64x64x3 -> 256x256x64)
hrfeat    HRFeature adapter (256x256x64 -> 256x256x16, 3 BasicBlocks)
encdec    EfficientNet-B4 encoder + both U-Net decoders (64x64x8 -> 2x 64x64x16)
heads     both HRFuseResidual heads (64x64x16 + 256x256x16 -> height/build)
aggre     the 64x64 aggregation conv
postproc  clip/round/softmax uint16 staging (predict_...globe.py:172-177)
full      everything (sanity: should be ~= sum of the parts)

Run on the real chip: ``python -m srbh_tpu.tools.profile_flagship [batch]
[stage,stage,...]``.

Implementation notes (relay-specific, hard-won):

* Every tensor a stage needs is an explicit jit ARGUMENT.  Closing over a
  large array turns it into an XLA constant that must be hashed/serialised
  through the relay on every compile — a 2 GB captured activation made a
  3-block kernel take >10 min to compile.
* ``JAX_COMPILATION_CACHE_DIR`` is enabled so repeat invocations skip the
  (minutes-long) init compiles.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time


import jax
import jax.numpy as jnp


CHAIN_ITERS = 4
REPEATS = 3


def _chain(fn, x, *extras):
    """Time ``fn(x, *extras) -> f32 scalar`` chained CHAIN_ITERS times.

    ``x`` is the carried tensor (data dependence across iterations defeats
    relay-side async reporting); ``extras`` ride along as jit arguments.
    """

    @jax.jit
    def chained(x, *extras):
        def body(i, carry):
            x, acc = carry
            delta = fn(x, *extras) * 1e-9
            return x + delta.astype(x.dtype), acc + delta
        _, acc = jax.lax.fori_loop(0, CHAIN_ITERS, body, (x, jnp.float32(0)))
        return acc

    float(chained(x, *extras))  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        s = float(chained(x, *extras))
        times.append(time.perf_counter() - t0)
        assert s == s
    return statistics.median(times) / CHAIN_ITERS


def main(batch: int = 256, only=None):
    from srbh_tpu.tools._cache import enable_compilation_cache
    enable_compilation_cache()
    from srbh_tpu import models

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    sr = models.RRDBNet(num_block=23, num_feat=64, num_grow_ch=32, dtype=dtype)
    model = models.SRRegressClsFeature(
        encoder_name="efficientnet-b4", super_mid=16, isaggre=True,
        chans_build=7, dtype=dtype)

    x8 = jax.random.uniform(rng, (batch, 64, 64, 8), jnp.float32).astype(dtype)
    fea = jax.random.uniform(rng, (batch, 256, 256, 64), jnp.float32).astype(dtype)
    hr16 = jax.random.uniform(rng, (batch, 256, 256, 16), jnp.float32).astype(dtype)
    dec16 = jax.random.uniform(rng, (batch, 64, 64, 16), jnp.float32).astype(dtype)

    sr_params = jax.jit(sr.init)(rng, x8[..., :3])
    variables = jax.jit(model.init)(rng, x8, fea)
    pk = model.clone(compute_mode="packed")

    def trunk(x, sr_params):
        return sr.apply(sr_params, x, features_only=True
                        ).astype(jnp.float32).mean()

    def hrfeat(x, variables):
        return model.apply(
            variables, x, False,
            method=lambda m, f, train: m.hrfeat(f, train),
        ).astype(jnp.float32).mean()

    def encdec(x, variables):
        def run(m, xx, train):
            feats = m.encoder(xx, train)
            return m.decoder1(*feats, train=train), m.decoder2(*feats, train=train)
        h, b = model.apply(variables, x, False, method=run)
        return h.astype(jnp.float32).mean() + b.astype(jnp.float32).mean()

    def heads(x, lr, variables):
        def run(m, lr, hr, train):
            return m.reg(lr, hr, train), m.seg(lr, hr, train)
        h, b = model.apply(variables, lr, x, False, method=run)
        return h.astype(jnp.float32).mean() + b.astype(jnp.float32).mean()

    def aggre(x, variables):
        return model.apply(
            variables, x, method=lambda m, f: m.aggre_height(f),
        ).astype(jnp.float32).mean()

    def postproc(x):
        h = jnp.round(jnp.clip(x[..., 0].astype(jnp.float32), 0, None) * 10
                      ).astype(jnp.uint16)
        b = jnp.round(jax.nn.softmax(x[..., 1:8].astype(jnp.float32), axis=-1)
                      * 255).astype(jnp.uint16)
        return h.astype(jnp.float32).mean() + b.astype(jnp.float32).mean()

    def full(x, sr_params, variables):
        f = sr.apply(sr_params, x[..., :3], features_only=True)
        height, build, ag = model.apply(variables, x, f, train=False)
        h = jnp.round(jnp.clip(height[..., 0].astype(jnp.float32), 0, None) * 10
                      ).astype(jnp.uint16)
        b = jnp.round(jax.nn.softmax(build.astype(jnp.float32), axis=-1) * 255
                      ).astype(jnp.uint16)
        return (h.astype(jnp.float32).mean() + b.astype(jnp.float32).mean()
                + ag.astype(jnp.float32).mean())

    def hrfeat_packed(x, variables):
        return pk.apply(
            variables, x, False,
            method=lambda m, f, train: m.hrfeat(f, train),
        ).astype(jnp.float32).mean()

    def heads_packed(x, lr, variables):
        from srbh_tpu.ops import s2d

        def run(m, lr, hrp, train):
            return m.reg(lr, hrp, train), m.seg(lr, hrp, train)
        h, b = pk.apply(variables, lr, s2d.pack(x), False, method=run)
        return h.astype(jnp.float32).mean() + b.astype(jnp.float32).mean()

    def heads_grouped(x, lr, variables):
        from srbh_tpu.models.dual_head import dual_head_apply

        h, b = dual_head_apply(variables["params"], variables["batch_stats"],
                               lr, lr, x)
        return h.astype(jnp.float32).mean() + b.astype(jnp.float32).mean()

    def full_packed(x, sr_params, variables):
        f = sr.apply(sr_params, x[..., :3], features_only=True)
        height, build, ag = pk.apply(variables, x, f, train=False)
        h = jnp.round(jnp.clip(height[..., 0].astype(jnp.float32), 0, None) * 10
                      ).astype(jnp.uint16)
        b = jnp.round(jax.nn.softmax(build.astype(jnp.float32), axis=-1) * 255
                      ).astype(jnp.uint16)
        return (h.astype(jnp.float32).mean() + b.astype(jnp.float32).mean()
                + ag.astype(jnp.float32).mean())

    stages = {
        "trunk": (trunk, x8[..., :3], sr_params),
        "hrfeat": (hrfeat, fea, variables),
        "encdec": (encdec, x8, variables),
        "heads": (heads, hr16, dec16, variables),
        "aggre": (aggre, dec16, variables),
        "postproc": (postproc, hr16[..., :8] if hr16.shape[-1] >= 8 else hr16,),
        "full": (full, x8, sr_params, variables),
        "hrfeat_packed": (hrfeat_packed, fea, variables),
        "heads_packed": (heads_packed, hr16, dec16, variables),
        "heads_grouped": (heads_grouped, hr16, dec16, variables),
        "full_packed": (full_packed, x8, sr_params, variables),
    }

    results = {}
    for name, (fn, *args) in stages.items():
        if only and name not in only:
            continue
        ms = _chain(fn, *args) * 1000
        results[name] = round(ms, 2)
        print(f"{name:9s} {ms:8.2f} ms/batch  ({batch / (ms / 1000):7.1f} t/s)",
              flush=True)
    if "full" in results and len(results) > 1:
        # only the literal pipeline stages sum to "full"; the packed/grouped
        # experiment stages are alternative implementations, not parts
        literal = ("trunk", "encoder", "decoders", "hrfeat", "heads",
                   "aggre", "postproc")
        parts = sum(v for k, v in results.items() if k in literal)
        print(f"{'sum':9s} {parts:8.2f} ms/batch (vs full {results['full']:.2f})")
    print(json.dumps({"batch": batch, "ms": results}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         only=sys.argv[2].split(",") if len(sys.argv) > 2 else None)
