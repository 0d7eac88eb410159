"""FSDP (ZeRO-3 style fully-sharded data parallel) over the 8-device mesh.

The reference is single-GPU (SURVEY.md §2.5); FSDP is the TPU-native
memory-scaling mode on top of DP: params + Adam moments shard their largest
divisible dim over the ``data`` axis (parallel/mesh.py:shard_state_fsdp),
GSPMD inserts the param all-gathers and gradient reduce-scatters, and the
elementwise optimizer update stays sharded. These tests pin that the FSDP
step's numerics match the replicated DP step and that per-device parameter
storage actually shrinks.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from srbh_tpu.parallel import mesh as pmesh

from test_train import tiny_batch, tiny_setup


@pytest.fixture(scope="module")
def pipeline():
    from srbh_tpu.train.state import TrainState
    from srbh_tpu.train.steps import make_train_step

    model, sr, state, sr_params = tiny_setup()
    host_vars = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }

    def fresh_state():
        return TrainState.create(
            jax.tree_util.tree_map(jnp.asarray, host_vars),
            n_log_vars=3, lr=1e-3)

    step = make_train_step(model, sr)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
    return {"fresh_state": fresh_state, "sr_params": sr_params,
            "step": step, "batch": batch}


class TestFsdpSpec:
    def test_prefers_last_dim_for_kernels(self):
        x = np.zeros((3, 3, 16, 32))
        assert pmesh.fsdp_param_spec(x, 8) == P(None, None, None,
                                                pmesh.DATA_AXIS)

    def test_falls_back_to_dim0(self):
        # last dim 3 not divisible by 8, dim0 is
        x = np.zeros((8, 5, 3))
        assert pmesh.fsdp_param_spec(x, 8) == P(pmesh.DATA_AXIS, None, None)

    def test_indivisible_replicates(self):
        assert pmesh.fsdp_param_spec(np.zeros((3, 5)), 8) == P()
        assert pmesh.fsdp_param_spec(np.zeros(()), 8) == P()
        assert pmesh.fsdp_param_spec(np.zeros((16,)), 1) == P()

    def test_vector_shards_dim0(self):
        assert pmesh.fsdp_param_spec(np.zeros((16,)), 8) == P(pmesh.DATA_AXIS)


class TestFsdpStep:
    def test_matches_replicated_dp(self, pipeline):
        """One train step with fully-sharded state must match the replicated
        DP step: loss, updated params, and BN stats."""
        mesh = pmesh.make_mesh()
        assert mesh.devices.size == 8
        sharded_batch = pmesh.shard_batch(pipeline["batch"], mesh)
        sr_rep = pmesh.replicate(pipeline["sr_params"], mesh)

        s_dp = pmesh.replicate(pipeline["fresh_state"](), mesh)
        s_dp, m_dp = pipeline["step"](s_dp, sr_rep, sharded_batch,
                                      jnp.asarray(1e-3))

        s_fs = pmesh.shard_state_fsdp(pipeline["fresh_state"](), mesh)
        s_fs, m_fs = pipeline["step"](s_fs, sr_rep, sharded_batch,
                                      jnp.asarray(1e-3))

        np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]),
                                   rtol=2e-5)
        # Post-Adam params: FSDP's reduce-scatter sums gradients in a
        # different order than DP's all-reduce, and Adam's g/sqrt(v) at
        # step 1 amplifies a near-zero gradient's f32 reduction noise into
        # a sign flip of the whole +-lr update — so the elementwise bound
        # is 2*lr (the same bound the torch train oracle uses), with the
        # bulk of elements required to agree tightly.
        lr = 1e-3
        d = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree_util.tree_leaves(s_dp.params),
                            jax.tree_util.tree_leaves(s_fs.params))])
        assert d.max() <= 2 * lr + 1e-6, d.max()
        # the sign-flip population must be a sliver of the whole model
        assert np.mean(d > 1e-5) < 0.01, np.mean(d > 1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_dp.batch_stats),
                        jax.tree_util.tree_leaves(s_fs.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_state_is_actually_sharded(self, pipeline):
        """Per-device addressable storage of a shardable kernel is 1/8 of
        the full array, and the update preserves the sharding (the Adam
        step must not silently all-gather the state back)."""
        mesh = pmesh.make_mesh()
        s_fs = pmesh.shard_state_fsdp(pipeline["fresh_state"](), mesh)

        def check(tree):
            found = 0
            for leaf in jax.tree_util.tree_leaves(tree):
                if leaf.ndim >= 2 and leaf.shape[-1] % 8 == 0:
                    shard = leaf.addressable_shards[0].data
                    assert shard.size == leaf.size // 8, leaf.shape
                    found += 1
            assert found > 0
        check(s_fs.params)
        check(s_fs.opt_state)

        sharded_batch = pmesh.shard_batch(pipeline["batch"], mesh)
        sr_rep = pmesh.replicate(pipeline["sr_params"], mesh)
        s_fs, _ = pipeline["step"](s_fs, sr_rep, sharded_batch,
                                   jnp.asarray(1e-3))
        check(s_fs.params)
        check(s_fs.opt_state)

    def test_two_steps_stay_consistent(self, pipeline):
        """A second step from the updated sharded state matches the
        replicated path (sharding survives the donate/update cycle)."""
        mesh = pmesh.make_mesh()
        sharded_batch = pmesh.shard_batch(pipeline["batch"], mesh)
        sr_rep = pmesh.replicate(pipeline["sr_params"], mesh)
        s_dp = pmesh.replicate(pipeline["fresh_state"](), mesh)
        s_fs = pmesh.shard_state_fsdp(pipeline["fresh_state"](), mesh)
        for _ in range(2):
            s_dp, m_dp = pipeline["step"](s_dp, sr_rep, sharded_batch,
                                          jnp.asarray(1e-3))
            s_fs, m_fs = pipeline["step"](s_fs, sr_rep, sharded_batch,
                                          jnp.asarray(1e-3))
        np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]),
                                   rtol=5e-5)
