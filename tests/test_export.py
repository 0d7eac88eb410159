"""Serving export roundtrip: serialize -> deserialize -> numerically equal.

The artifact must be self-contained (no model code at load time) and, with
the symbolic batch dimension, serve multiple batch sizes from one export.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu import models
from srbh_tpu.tools.export_model import (
    export_flagship,
    load_exported,
    make_serving_fn,
)


@pytest.fixture(scope="module")
def tiny():
    sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8,
                        dtype=jnp.float32)
    model = models.SRRegressClsFeature(encoder_name="efficientnet-test",
                                       super_mid=8, isaggre=True,
                                       chans_build=7, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 8))
    sr_params = jax.jit(sr.init)(rng, x[..., :3])
    variables = jax.jit(model.init)(rng, x, jnp.zeros((1, 128, 128, 8)))
    return model, sr, variables, sr_params


def test_roundtrip_symbolic_batch(tiny):
    model, sr, variables, sr_params = tiny
    data = export_flagship(model, sr, variables, sr_params, tile=32,
                           platforms=("cpu",), dtype=jnp.float32)
    assert isinstance(data, bytes) and len(data) > 1000
    fn = load_exported(data)
    ref = jax.jit(make_serving_fn(model, sr, variables, sr_params,
                                  dtype=jnp.float32))
    for b in (1, 3):
        x = jax.random.uniform(jax.random.PRNGKey(b), (b, 32, 32, 8))
        h, bd = fn(x)
        h_ref, bd_ref = ref(x)
        assert h.shape == (b, 128, 128) and bd.shape == (b, 128, 128, 7)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(bd), np.asarray(bd_ref),
                                   atol=1e-6, rtol=1e-5)


def test_fixed_batch_rejects_other_sizes(tiny):
    model, sr, variables, sr_params = tiny
    data = export_flagship(model, sr, variables, sr_params, tile=32,
                           batch=2, platforms=("cpu",), dtype=jnp.float32)
    fn = load_exported(data)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 8))
    h, _ = fn(x)
    assert h.shape == (2, 128, 128)
    with pytest.raises(Exception):
        fn(jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32, 8)))
