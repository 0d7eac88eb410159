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

    def test_pipeline_gradients_match_sequential(self):
        """The scan schedule is reverse-differentiable: training through the
        pipelined stack must produce the same stage-weight gradients as the
        sequential program."""
        mesh = pmesh.make_mesh(n_model=4)
        w = jnp.asarray(np.random.default_rng(3).uniform(
            0.5, 1.5, (4, 1)).astype(np.float32))
        mbs = jnp.asarray(np.random.default_rng(4).normal(
            size=(4, 2, 3)).astype(np.float32))

        def loss_pipe(w):
            out = pipeline_apply(lambda p, h: jnp.tanh(h * p["w"]),
                                 {"w": w}, mbs, mesh)
            return (out ** 2).sum()

        def loss_seq(w):
            h = mbs
            for s in range(4):
                h = jnp.tanh(h * w[s])
            return (h ** 2).sum()

        gp = jax.grad(loss_pipe)(w)
        gs = jax.grad(loss_seq)(w)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), rtol=1e-5)

    def test_rrdb_pipeline_gradients(self, tiny_sr):
        """End-to-end: d(loss)/d(params) through the pipelined trunk matches
        the single-program gradients (spot-checked on conv_first + a block)."""
        sr, params, x, _ = tiny_sr
        mesh = pmesh.make_mesh(n_model=2)

        def loss_pipe(p):
            y = rrdb_pipeline_features(sr, p, x, mesh, num_microbatches=2)
            return (y.astype(jnp.float32) ** 2).mean()

        def loss_seq(p):
            y = sr.apply(p, x, features_only=True)
            return (y.astype(jnp.float32) ** 2).mean()

        gp = jax.grad(loss_pipe)(params)["params"]
        gs = jax.grad(loss_seq)(params)["params"]
        np.testing.assert_allclose(
            np.asarray(gp["conv_first"]["kernel"]),
            np.asarray(gs["conv_first"]["kernel"]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gp["body_1"]["rdb2"]["conv3"]["kernel"]),
            np.asarray(gs["body_1"]["rdb2"]["conv3"]["kernel"]), atol=1e-5)
