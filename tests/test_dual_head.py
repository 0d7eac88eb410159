"""Grouped dual-head computation (models/dual_head.py) vs the literal heads.

The grouped form is a measured-negative perf experiment (see its module
docstring); this test pins its correctness contract — float-epsilon
equality against ``model.apply`` on the shared literal checkpoint — so the
experiment stays honest if revisited on a future XLA stack.
"""
import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu import models
from srbh_tpu.models.dual_head import dual_head_apply


def test_dual_head_matches_literal_heads():
    kw = dict(encoder_name="efficientnet-test", super_mid=16, isaggre=True,
              chans_build=7, dtype=jnp.float32)
    m = models.SRRegressClsFeature(**kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 32, 32, 8))
    fea = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 64))
    v = jax.jit(m.init)(rng, x, fea)

    hf = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 16))
    bf = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 16))
    hr = jax.random.uniform(jax.random.PRNGKey(4), (2, 128, 128, 16))

    def lit(v, hf, bf, hr):
        def run(mm, hf, bf, hr, train):
            return mm.reg(hf, hr, train), mm.seg(bf, hr, train)
        return m.apply(v, hf, bf, hr, False, method=run)

    h_l, b_l = jax.jit(lit)(v, hf, bf, hr)
    h_g, b_g = jax.jit(
        lambda v, hf, bf, hr: dual_head_apply(
            v["params"], v["batch_stats"], hf, bf, hr))(v, hf, bf, hr)
    np.testing.assert_allclose(np.asarray(h_l), np.asarray(h_g),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b_l), np.asarray(b_g),
                               atol=1e-5, rtol=1e-5)
