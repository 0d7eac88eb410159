"""Pipeline parallelism (GPipe microbatching over the model axis).

The RRDB body splits into S contiguous stages with lax.ppermute hand-offs
(parallel/pipeline.py); the pipelined trunk must bit-match the
single-program forward.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.parallel import mesh as pmesh
from srbh_tpu.parallel.pipeline import (pipeline_apply, rrdb_pipeline_features,
                                        stack_stage_params)


@pytest.fixture(scope="module")
def tiny_sr():
    from srbh_tpu import models

    sr = models.RRDBNet(num_block=4, num_feat=16, num_grow_ch=8)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (8, 16, 16, 3)).astype(np.float32))
    params = jax.jit(sr.init)(jax.random.PRNGKey(0), x)
    ref = np.asarray(jax.jit(
        lambda p, im: sr.apply(p, im, features_only=True))(params, x))
    return sr, params, x, ref


class TestPipelineParallel:
    def test_generic_pipeline_matches_sequential(self):
        # stage = scaled affine; 4 stages x 2 data over the 8 CPU devices
        mesh = pmesh.make_mesh(n_model=4)
        w = jnp.asarray(np.random.default_rng(1).uniform(
            0.5, 1.5, (4, 1)).astype(np.float32))
        stage_params = {"w": w}
        mbs = jnp.asarray(np.random.default_rng(2).normal(
            size=(6, 2, 3)).astype(np.float32))
        out = pipeline_apply(lambda p, h: h * p["w"] + 1.0, stage_params,
                             mbs, mesh)
        want = mbs
        for s in range(4):
            want = want * w[s] + 1.0
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-6)

    def test_rrdb_pipeline_4stage(self, tiny_sr):
        sr, params, x, ref = tiny_sr
        mesh = pmesh.make_mesh(n_model=4)
        out = np.asarray(jax.jit(lambda p, im: rrdb_pipeline_features(
            sr, p, im, mesh, num_microbatches=4))(params, x))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_rrdb_pipeline_2stage_8mb(self, tiny_sr):
        sr, params, x, ref = tiny_sr
        mesh = pmesh.make_mesh(n_model=2)
        out = np.asarray(jax.jit(lambda p, im: rrdb_pipeline_features(
            sr, p, im, mesh, num_microbatches=8))(params, x))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_validation_errors(self, tiny_sr):
        sr, params, x, _ = tiny_sr
        mesh = pmesh.make_mesh(n_model=4)
        with pytest.raises(ValueError, match="not divisible"):
            rrdb_pipeline_features(sr, params, x, mesh, num_microbatches=3)
        bad = stack_stage_params([params["params"]["body_0"]] * 3)
        with pytest.raises(ValueError, match="leading dim"):
            pipeline_apply(lambda p, h: h, bad,
                           jnp.zeros((2, 1, 4)), mesh)
