"""Multi-device correctness at the SHIPPED scale: B4 + RRDBNet-23.

Every other multi-device artifact runs toy configs (RRDBNet-1/2 +
efficientnet-test); this file pins the reference's real shapes
(train.py:133-148: efficientnet-b4 encoder, 23-block SR trunk):

* spec coverage (fast, eval_shape only — no FLOPs): at the real parameter
  shapes every big kernel must actually shard under
  ``fsdp_param_spec``/``tp_param_spec`` instead of hitting the silent
  replicate-fallback (parallel/mesh.py:127-162) — a divisibility surprise
  would degrade FSDP to DP with zero signal otherwise. Requires a
  >=(n-1)/n per-device byte reduction over the big-kernel subset.
* executed steps (slow): ONE DP train step and ONE FSDP train step of the
  full-scale model at batch 8, tile 32 on the 8-device CPU mesh, asserting
  the loss matches the single-device step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from srbh_tpu import models
from srbh_tpu.parallel import mesh as pmesh

N_DEV = 8
BIG = 64 * 1024  # bytes; "big kernel" threshold


def _flagship_shapes():
    """Parameter ShapeDtypeStructs of the shipped config, no compute."""
    sr = models.RRDBNet(num_block=23, num_feat=64, num_grow_ch=32)
    model = models.SRRegressClsFeature(
        encoder_name="efficientnet-b4", super_mid=16, isaggre=True,
        chans_build=7)
    rng = jax.random.PRNGKey(0)
    x = jax.ShapeDtypeStruct((8, 32, 32, 8), jnp.float32)
    fea = jax.ShapeDtypeStruct((8, 128, 128, 64), jnp.float32)
    sr_shapes = jax.eval_shape(sr.init, rng, jax.ShapeDtypeStruct(
        (8, 32, 32, 3), jnp.float32))
    var_shapes = jax.eval_shape(model.init, rng, x, fea)
    return var_shapes, sr_shapes


class TestFullScaleSpecCoverage:
    def test_fsdp_shards_every_big_kernel(self):
        var_shapes, sr_shapes = _flagship_shapes()
        leaves = (jax.tree_util.tree_leaves_with_path(var_shapes["params"])
                  + jax.tree_util.tree_leaves_with_path(sr_shapes["params"]))
        total = big_total = per_dev = 0
        n_big = 0
        for path, x in leaves:
            nbytes = x.size * x.dtype.itemsize
            total += nbytes
            spec = pmesh.fsdp_param_spec(x, N_DEV)
            if nbytes >= BIG:
                n_big += 1
                big_total += nbytes
                assert spec != P(), (
                    f"{jax.tree_util.keystr(path)} {x.shape} ({nbytes} B) "
                    f"hit the replicate-fallback under FSDP at n={N_DEV}")
                per_dev += nbytes // N_DEV
        assert n_big > 100, n_big  # the flagship really has big kernels
        # >=(n-1)/n reduction over the big-kernel subset
        assert per_dev <= big_total / N_DEV + 1
        # and the big kernels dominate the model (so FSDP pays off at all)
        assert big_total / total > 0.9, big_total / total

    def test_tp_shards_every_big_kernel(self):
        var_shapes, sr_shapes = _flagship_shapes()
        leaves = (jax.tree_util.tree_leaves_with_path(var_shapes["params"])
                  + jax.tree_util.tree_leaves_with_path(sr_shapes["params"]))
        replicated_big = []
        for path, x in leaves:
            nbytes = x.size * x.dtype.itemsize
            if nbytes >= BIG and pmesh.tp_param_spec(x, N_DEV) == P():
                replicated_big.append(
                    (jax.tree_util.keystr(path), x.shape, nbytes))
        assert not replicated_big, replicated_big

    def test_optimizer_moments_shard_like_params(self):
        """Adam moments reuse the param shapes; the fsdp spec must place
        them identically (shard_state_fsdp maps over the whole state)."""
        var_shapes, _ = _flagship_shapes()
        for _, x in jax.tree_util.tree_leaves_with_path(var_shapes["params"]):
            if x.size * x.dtype.itemsize >= BIG:
                assert (pmesh.fsdp_param_spec(x, N_DEV)
                        == pmesh.fsdp_param_spec(
                            jax.ShapeDtypeStruct(x.shape, x.dtype), N_DEV))


@pytest.mark.slow
class TestFullScaleExecutedSteps:
    @pytest.fixture(scope="class")
    def setup(self):
        from srbh_tpu.train.state import TrainState
        from srbh_tpu.train.steps import make_train_step

        rng = jax.random.PRNGKey(3)
        sr = models.RRDBNet(num_block=23, num_feat=64, num_grow_ch=32)
        model = models.SRRegressClsFeature(
            encoder_name="efficientnet-b4", super_mid=16, isaggre=True,
            chans_build=7, drop_connect_rate=0.0)
        batch, tile = 8, 32
        x = jnp.zeros((batch, tile, tile, 8))
        sr_params = jax.jit(sr.init)(rng, x[..., :3])
        variables = jax.jit(model.init)(
            rng, x, jnp.zeros((batch, tile * 4, tile * 4, 64)))
        host_vars = {"params": jax.device_get(variables["params"]),
                     "batch_stats": jax.device_get(variables["batch_stats"])}

        def fresh_state():
            return TrainState.create(
                jax.tree_util.tree_map(jnp.asarray, host_vars),
                n_log_vars=3, lr=1e-3)

        rngn = np.random.default_rng(4)
        h = rngn.integers(0, 50, (batch, tile * 4, tile * 4)
                          ).astype(np.float32)
        batch_np = {
            "image": rngn.uniform(0, 1, (batch, tile, tile, 8)
                                  ).astype(np.float32),
            "height": h,
            "height_aggre": h.reshape(batch, tile, 4, tile, 4).mean((2, 4)),
            "build": (h > 10).astype(np.int32) * 3,
            "weight": np.ones((batch, tile * 4, tile * 4), np.float32),
            "weight_aggre": np.ones((batch, tile, tile), np.float32),
        }
        step = make_train_step(model, sr)
        return {"step": step, "fresh_state": fresh_state,
                "sr_params": sr_params, "batch": batch_np}

    def test_dp_and_fsdp_match_single_device(self, setup):
        batch = {k: jnp.asarray(v) for k, v in setup["batch"].items()}
        _, m_single = setup["step"](setup["fresh_state"](),
                                    setup["sr_params"], batch,
                                    jnp.asarray(1e-3))
        loss_single = float(m_single["loss"])
        assert np.isfinite(loss_single)

        mesh = pmesh.make_mesh()
        assert mesh.devices.size == N_DEV
        sharded_batch = pmesh.shard_batch(
            {k: jnp.asarray(v) for k, v in setup["batch"].items()}, mesh)
        sr_rep = pmesh.replicate(setup["sr_params"], mesh)

        s_dp = pmesh.replicate(setup["fresh_state"](), mesh)
        _, m_dp = setup["step"](s_dp, sr_rep, sharded_batch,
                                jnp.asarray(1e-3))
        assert float(m_dp["loss"]) == pytest.approx(loss_single, rel=2e-5)

        s_fs = pmesh.shard_state_fsdp(setup["fresh_state"](), mesh)
        # the big B4/RRDB kernels must be truly 1/8-resident before the step
        found = 0
        for leaf in jax.tree_util.tree_leaves(s_fs.params):
            if leaf.size * 4 >= BIG:
                assert leaf.addressable_shards[0].data.size == \
                    leaf.size // N_DEV, leaf.shape
                found += 1
        assert found > 100, found
        s_fs, m_fs = setup["step"](s_fs, sr_rep, sharded_batch,
                                   jnp.asarray(1e-3))
        assert float(m_fs["loss"]) == pytest.approx(loss_single, rel=2e-5)
        # and the update kept the state sharded
        for leaf in jax.tree_util.tree_leaves(s_fs.params):
            if leaf.size * 4 >= BIG:
                assert leaf.addressable_shards[0].data.size == \
                    leaf.size // N_DEV
