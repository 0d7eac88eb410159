"""Full-scale flagship smoke: the shipped B4 + RRDBNet-23 configuration
(train.py:133-148) must forward correctly — not just the tiny CI configs.

Marked slow: one batch-1 forward of the real 25.6 M + 16.7 M models on the
single-core CPU host takes minutes to compile. The TPU bench exercises the
same config at batch 128; this pins it in the suite so a stride/tap bug
that only manifests at full scale cannot pass unnoticed.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu import models

pytestmark = pytest.mark.slow


def test_full_scale_forward_shapes_and_finiteness():
    rng = jax.random.PRNGKey(0)
    sr = models.RRDBNet(num_block=23, num_feat=64, num_grow_ch=32)
    model = models.SRRegressClsFeature(
        encoder_name="efficientnet-b4", super_mid=16, isaggre=True,
        chans_build=7)
    x = jax.random.uniform(rng, (1, 64, 64, 8), jnp.float32)

    sr_params = jax.jit(sr.init)(rng, x[..., :3])
    fea_shape = jax.eval_shape(
        lambda p, v: sr.apply(p, v, features_only=True), sr_params, x[..., :3])
    assert fea_shape.shape == (1, 256, 256, 64)
    variables = jax.jit(model.init)(rng, x, jnp.zeros(fea_shape.shape))

    # param-count goldens at full scale (BASELINE.md: G 16.70 M; the height
    # model is 22.2 M of USED capacity — the reference's 25.6 M includes
    # smp's dead classifier head, see tests/test_models.py:test_height_model)
    n_sr = models.param_count(sr_params)
    n_model = models.param_count(variables["params"])
    assert n_sr == 16_697_987, n_sr
    assert abs(n_model / 1e6 - 22.2) < 0.5, n_model

    @jax.jit
    def forward(variables, sr_params, image):
        fea = sr.apply(sr_params, image[..., :3], features_only=True)
        return model.apply(variables, image, fea, train=False)

    height, build, aggre = forward(variables, sr_params, x)
    assert height.shape == (1, 256, 256, 1)
    assert build.shape == (1, 256, 256, 7)
    assert aggre.shape == (1, 64, 64, 1)
    for t in (height, build, aggre):
        assert bool(jnp.isfinite(t).all())
