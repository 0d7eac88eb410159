"""Rematerialisation option: ``SRRegressClsFeature(remat=True)`` wraps the
256^2 fusion stack (HRFeature + both HRFuseResidual heads) in jax.checkpoint.

jax.checkpoint is semantics-preserving — the backward pass recomputes the
same ops instead of reading stored activations — so forward outputs, loss
and gradients must match the plain model on identical parameters. (HBM
savings are a device-memory property; what CI can pin is the equivalence.)
No reference counterpart: the torch equivalent would be
``torch.utils.checkpoint`` and the reference never needs it (batch 16 on a
full GPU, train.py:97).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.models import SRRegressClsFeature


def _build(remat):
    return SRRegressClsFeature(
        encoder_name="efficientnet-test", super_mid=8, isaggre=True,
        chans_build=7, decoder_channels=(32, 24, 16, 12, 8),
        drop_connect_rate=0.0, remat=remat)


class TestRemat:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(31)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)), jnp.float32)
        fea = jnp.asarray(rng.normal(size=(2, 128, 128, 8)), jnp.float32)
        target = jnp.asarray(rng.normal(size=(2, 128, 128)), jnp.float32)
        variables = _build(False).init(jax.random.PRNGKey(0), x, fea,
                                       train=False)
        return x, fea, target, variables

    def test_param_tree_identical(self, setup):
        x, fea, _, variables = setup
        v2 = _build(True).init(jax.random.PRNGKey(0), x, fea, train=False)
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(v2))

    def test_forward_and_grads_match(self, setup):
        x, fea, target, variables = setup

        def loss_fn(model):
            def f(params):
                (h, b, a), _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, fea, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                return (jnp.mean((h[..., 0] - target) ** 2)
                        + jnp.mean(b ** 2) + jnp.mean(a ** 2))
            return jax.jit(jax.value_and_grad(f))

        loss_p, grads_p = loss_fn(_build(False))(variables["params"])
        loss_r, grads_r = loss_fn(_build(True))(variables["params"])
        np.testing.assert_allclose(float(loss_r), float(loss_p), rtol=1e-6)
        for (path, gp), (_, gr) in zip(
                jax.tree_util.tree_leaves_with_path(grads_p),
                jax.tree_util.tree_leaves_with_path(grads_r)):
            np.testing.assert_allclose(
                np.asarray(gr), np.asarray(gp), rtol=1e-5, atol=1e-6,
                err_msg=f"grad {jax.tree_util.keystr(path)}")

    def test_eval_forward_matches(self, setup):
        x, fea, _, variables = setup
        outs_p = jax.jit(lambda v: _build(False).apply(v, x, fea,
                                                       train=False))(variables)
        outs_r = jax.jit(lambda v: _build(True).apply(v, x, fea,
                                                      train=False))(variables)
        for op, orr in zip(outs_p, outs_r):
            np.testing.assert_allclose(np.asarray(orr), np.asarray(op),
                                       atol=1e-6)


class TestRRDBNetRemat:
    """remat=True checkpoints each RRDB block of the ESRGAN generator — the
    GAN trainer's HBM knob (rrdbnet_arch.py:113-167 trunk). Must be a pure
    backward-memory change: identical forward and gradients."""

    def test_forward_and_grads_match(self):
        from srbh_tpu.models import RRDBNet

        rng = np.random.default_rng(37)
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        kw = dict(num_feat=16, num_block=2, num_grow_ch=8)
        plain, rem = RRDBNet(**kw), RRDBNet(**kw, remat=True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(
                    rem.init(jax.random.PRNGKey(0), x)))

        def vg(model):
            return jax.jit(jax.value_and_grad(
                lambda p: jnp.mean(model.apply({"params": p}, x) ** 2)))

        loss_p, grads_p = vg(plain)(variables["params"])
        loss_r, grads_r = vg(rem)(variables["params"])
        np.testing.assert_allclose(float(loss_r), float(loss_p), rtol=1e-6)
        for (path, gp), (_, gr) in zip(
                jax.tree_util.tree_leaves_with_path(grads_p),
                jax.tree_util.tree_leaves_with_path(grads_r)):
            np.testing.assert_allclose(
                np.asarray(gr), np.asarray(gp), rtol=1e-5, atol=1e-7,
                err_msg=f"grad {jax.tree_util.keystr(path)}")
