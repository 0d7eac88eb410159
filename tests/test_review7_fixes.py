"""Regression tests for the seventh-review findings (device/jit territory):

1. The lossweight optimizer group follows the epoch LR schedule and carries
   weight_decay=1e-4 — the reference's apparent exemption never fires (its
   skip condition tests dict keys) and its group inherits Adam's decay.
2. make_mesh raises on indivisible device counts instead of silently
   dropping chips.
3. conv3x3_packed rejects the kin_perm + parity=1 combination (halo mask
   assumes the canonical packed layout).
4. rrdb_pipeline_features rejects quantized RRDBNets (head/tail would run
   in float and break the bit-match contract).
5. PixelShuffleUpsampler(scale=1, packed_output=True) returns the packed
   identity instead of silently falling through unpacked.
6. DeviceMosaicAccumulator shares one jitted step per upscale across
   instances (no per-city recompiles).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.train.state import TrainState, set_learning_rate


class TestLogVarsGroupParity:
    def _state(self):
        variables = {"params": {"w": jnp.ones((3,))}, "batch_stats": {}}
        return TrainState.create(variables, n_log_vars=3, lr=1e-3,
                                 weight_decay=1e-4)

    def test_schedule_reaches_log_vars_group(self):
        state = self._state()
        opt = set_learning_rate(state.opt_state, 1e-4)
        for group in ("model", "log_vars"):
            lr = opt.inner_states[group].inner_state.hyperparams["lr"]
            assert float(lr) == pytest.approx(1e-4)

    def test_log_vars_receive_weight_decay(self):
        """Zero gradients: any log_var movement comes from the coupled L2
        term (reference: add_param_group inherits weight_decay=1e-4)."""
        state = self._state()
        state = state.replace(log_vars=jnp.asarray([2.0, -1.0, 0.5]))
        # re-init opt for the replaced log_vars magnitudes
        state = state.replace(opt_state=state.tx.init(
            {"model": state.params, "log_vars": state.log_vars}))
        zero_model = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        new = state.apply_gradients(zero_model, jnp.zeros((3,)),
                                    jnp.asarray(1e-3))
        moved = np.asarray(new.log_vars) - np.asarray(state.log_vars)
        assert (np.abs(moved) > 0).all()
        # decay pulls toward zero
        assert np.sign(moved[0]) == -1 and np.sign(moved[1]) == 1

    def test_log_vars_lr_follows_schedule_magnitude(self):
        """With identical grads, a 10x smaller scheduled lr moves log_vars
        ~10x less — they are NOT pinned at 1e-3."""
        g = jnp.asarray([1.0, 1.0, 1.0])
        zero_model = jax.tree_util.tree_map(
            jnp.zeros_like, self._state().params)

        def step_delta(lr):
            s = self._state()
            n = s.apply_gradients(zero_model, g, jnp.asarray(lr))
            return float(np.abs(np.asarray(n.log_vars - s.log_vars)).mean())

        assert step_delta(1e-4) == pytest.approx(0.1 * step_delta(1e-3),
                                                 rel=1e-3)


def test_make_mesh_rejects_indivisible():
    from srbh_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    with pytest.raises(ValueError, match="divide"):
        make_mesh(n_model=3)
    # explicit subset remains allowed
    m = make_mesh(n_data=2, n_model=3)
    assert m.shape == {"data": 2, "model": 3}


def test_conv3x3_packed_rejects_kin_perm_parity1():
    from srbh_tpu.ops import s2d

    xp = jnp.zeros((1, 4, 4, 8))
    w = jnp.zeros((3, 3, 2, 2))
    perm = s2d.concat_perm([1, 1])
    with pytest.raises(NotImplementedError, match="kin_perm"):
        s2d.conv3x3_packed(xp, 1, w, kin_perm=perm)


def test_pipeline_rejects_quantized_trunk():
    from srbh_tpu.models.rrdbnet import RRDBNet
    from srbh_tpu.parallel.mesh import make_mesh
    from srbh_tpu.parallel.pipeline import rrdb_pipeline_features

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    sr = RRDBNet(num_block=2, num_feat=8, num_grow_ch=4, quantize=True)
    mesh = make_mesh(n_data=4, n_model=2)
    with pytest.raises(NotImplementedError, match="quantize"):
        rrdb_pipeline_features(sr, {"params": {}}, jnp.zeros((2, 8, 8, 3)),
                               mesh)


def test_pixel_shuffle_upsampler_scale1_packed_is_packed_identity():
    from srbh_tpu.models.layers import PixelShuffleUpsampler
    from srbh_tpu.ops import s2d

    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    m = PixelShuffleUpsampler(scale=1, n_feats=3, packed_output=True)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(s2d.pack(x)))


def test_device_accumulator_shares_step_fn():
    from srbh_tpu.predict.device_stitcher import DeviceMosaicAccumulator

    a = DeviceMosaicAccumulator(8, 8, 7, upscale=4)
    b = DeviceMosaicAccumulator(16, 16, 7, upscale=4)
    assert a._step is b._step
