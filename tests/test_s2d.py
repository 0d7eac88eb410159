"""Space-to-depth packed convolution (srbh_tpu/ops/s2d.py): exactness vs the
literal lax.conv path, at every level (primitive, block, module, full model).

The packed mode is the TPU fast path for the 16-channel 256^2 fusion stack
(SR/HRfuse.py:115-190 equivalents); its contract is bit-level parameter
compatibility and float-epsilon output equality with the literal mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbh_tpu.ops import s2d
from srbh_tpu.ops.shuffle import pixel_shuffle


def _lit_conv(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b if b is not None else y


class TestPrimitives:
    def test_pack_unpack_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 10, 3), jnp.float32)
        np.testing.assert_array_equal(np.asarray(s2d.unpack(s2d.pack(x))),
                                      np.asarray(x))

    def test_pack_rejects_odd(self):
        with pytest.raises(ValueError):
            s2d.pack(jnp.zeros((1, 7, 8, 3)))

    @pytest.mark.parametrize("ci,co", [(3, 5), (1, 1), (16, 16)])
    def test_conv_parity0(self, ci, co):
        r = np.random.RandomState(ci * 17 + co)
        x = jnp.asarray(r.randn(2, 8, 10, ci), jnp.float32)
        w = jnp.asarray(r.randn(3, 3, ci, co), jnp.float32)
        b = jnp.asarray(r.randn(co), jnp.float32)
        got = s2d.unpack(s2d.conv3x3_packed(s2d.pack(x), 0, w, b), parity=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(_lit_conv(x, w, b)),
                                   atol=1e-4, rtol=1e-4)

    def test_conv_chain_alternating_parity(self):
        """p0 -> p1 -> p0 -> p1: the halo masking must reproduce literal
        zero padding at every step."""
        r = np.random.RandomState(7)
        x = jnp.asarray(r.randn(2, 12, 8, 4), jnp.float32)
        ws = [jnp.asarray(r.randn(3, 3, c1, c2), jnp.float32)
              for c1, c2 in [(4, 6), (6, 5), (5, 3)]]
        ref, xp, parity = x, s2d.pack(x), 0
        for w in ws:
            ref = _lit_conv(ref, w)
            xp = s2d.conv3x3_packed(xp, parity, w)
            parity = 1 - parity
        got = s2d.unpack(xp, parity=parity)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_conv1x1(self):
        r = np.random.RandomState(3)
        x = jnp.asarray(r.randn(2, 8, 8, 3), jnp.float32)
        w = jnp.asarray(r.randn(1, 1, 3, 6), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = s2d.unpack(s2d.conv1x1_packed(s2d.pack(x), w), parity=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_concat_perm(self):
        """conv over concat-of-packs == conv over pack-of-concat."""
        r = np.random.RandomState(11)
        a = jnp.asarray(r.randn(2, 8, 10, 3), jnp.float32)
        b = jnp.asarray(r.randn(2, 8, 10, 4), jnp.float32)
        w = jnp.asarray(r.randn(3, 3, 7, 5), jnp.float32)
        cat_p = jnp.concatenate([s2d.pack(a), s2d.pack(b)], -1)
        got = s2d.unpack(
            s2d.conv3x3_packed(cat_p, 0, w, kin_perm=s2d.concat_perm([3, 4])),
            parity=1)
        ref = _lit_conv(jnp.concatenate([a, b], -1), w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_ps_to_pack_perm(self):
        """Channel gather == pack(pixel_shuffle(x, 2)) with zero data motion."""
        z = jnp.asarray(np.random.RandomState(5).randn(2, 4, 5, 16), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(z[..., s2d.ps_to_pack_perm(4)]),
            np.asarray(s2d.pack(pixel_shuffle(z, 2))))

    def test_tile_channel_param(self):
        v = jnp.arange(3.0)
        got = s2d.tile_channel_param(v)
        assert got.shape == (12,)
        # packed channel order is (d, e, c) with c minor
        np.testing.assert_array_equal(np.asarray(got),
                                      np.tile(np.arange(3.0), 4))


class TestModules:
    def _variables(self, module, *shapes):
        rng = jax.random.PRNGKey(0)
        args = [jax.random.uniform(jax.random.PRNGKey(i), s)
                for i, s in enumerate(shapes)]
        return jax.jit(module.init)(rng, *args), args

    def test_basicblock_packed_matches(self):
        from srbh_tpu.models.layers import BasicBlock

        lit = BasicBlock(16)
        pk = BasicBlock(16, packed=True)
        v, (x,) = self._variables(lit, (2, 8, 8, 24))
        ref = jax.jit(lambda v, x: lit.apply(v, x, train=False))(v, x)
        got = s2d.unpack(
            jax.jit(lambda v, x: pk.apply(v, x, train=False))(v, s2d.pack(x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_basicblock_packed_rejects_train(self):
        from srbh_tpu.models.layers import BasicBlock

        pk = BasicBlock(16, packed=True)
        with pytest.raises(ValueError):
            pk.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 64)), True)

    def test_hrfeature_packed_matches(self):
        from srbh_tpu.models.hrfuse import HRFeature

        lit = HRFeature(16, 16)
        pk = HRFeature(16, 16, packed=True)
        v, (x,) = self._variables(lit, (2, 16, 16, 64))
        ref = jax.jit(lambda v, x: lit.apply(v, x, False))(v, x)
        got = s2d.unpack(jax.jit(lambda v, x: pk.apply(v, x, False))(v, x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_hrfuse_residual_packed_matches(self):
        from srbh_tpu.models.hrfuse import HRFuseResidual

        lit = HRFuseResidual(16, 7, upscale=4)
        pk = HRFuseResidual(16, 7, upscale=4, packed=True)
        v, (lr, hr) = self._variables(lit, (2, 8, 8, 16), (2, 32, 32, 16))
        ref = jax.jit(lambda v, a, b: lit.apply(v, a, b, False))(v, lr, hr)
        got = jax.jit(lambda v, a, b: pk.apply(v, a, b, False))(v, lr, s2d.pack(hr))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_upsampler_packed_output(self):
        from srbh_tpu.models.layers import PixelShuffleUpsampler

        lit = PixelShuffleUpsampler(4, 16)
        pk = PixelShuffleUpsampler(4, 16, packed_output=True)
        v, (x,) = self._variables(lit, (2, 8, 8, 16))
        ref = jax.jit(lambda v, x: lit.apply(v, x))(v, x)
        got = s2d.unpack(jax.jit(lambda v, x: pk.apply(v, x))(v, x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


class TestFullModel:
    def test_flagship_packed_mode_matches_literal(self):
        """compute_mode='packed' shares the literal checkpoint layout and
        reproduces its outputs to float epsilon (eval mode)."""
        from srbh_tpu import models

        kw = dict(encoder_name="efficientnet-test", super_mid=16,
                  isaggre=True, chans_build=7, dtype=jnp.float32)
        lit = models.SRRegressClsFeature(**kw)
        pk = models.SRRegressClsFeature(compute_mode="packed", **kw)
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (2, 32, 32, 8))
        fea = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 64))
        v = jax.jit(lit.init)(rng, x, fea)
        # same param pytree in both modes
        v_p = jax.eval_shape(lambda: pk.init(rng, x, fea))
        lit_tree = jax.tree_util.tree_structure(v)
        assert jax.tree_util.tree_structure(v_p) == lit_tree
        out_l = jax.jit(lambda v, x, f: lit.apply(v, x, f, train=False))(v, x, fea)
        out_p = jax.jit(lambda v, x, f: pk.apply(v, x, f, train=False))(v, x, fea)
        for a, b in zip(out_l, out_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
