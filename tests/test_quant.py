"""int8 serving mode: quantization ops + the opt-in quantized RRDBNet trunk.

No reference counterpart (the reference serves fp32); this is the
TPU-native throughput extra — v5e executes s8xs8->s32 on the MXU at ~2x
the bf16 rate. Tests pin correctness of the scheme and that the quantized
trunk stays a faithful approximation of the float one on realistic
activations, with an IDENTICAL parameter tree (same checkpoints load)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu import models
from srbh_tpu.ops.quant import int8_conv, quantize_activation, quantize_weight


class TestQuantOps:
    def test_weight_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 8)).astype(np.float32))
        w_q, s = quantize_weight(w)
        assert w_q.dtype == jnp.int8 and s.shape == (1, 1, 1, 8)
        back = w_q.astype(jnp.float32) * s
        # symmetric per-channel: error <= scale/2 everywhere
        assert float(jnp.abs(back - w).max()) <= float(s.max()) / 2 + 1e-9

    def test_activation_uses_full_range(self):
        x = jnp.asarray([[-2.0, 0.5, 1.0]])
        x_q, s = quantize_activation(x)
        assert int(x_q.min()) == -127
        assert s == pytest.approx(2.0 / 127.0)

    def test_int8_conv_approximates_float_conv(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.01, (16,)).astype(np.float32))
        got = int8_conv(x, w, b, out_dtype=jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        err = float(jnp.abs(got - want).max())
        ref = float(jnp.abs(want).max())
        assert err < 0.02 * ref + 0.01, (err, ref)


class TestQuantizedTrunk:
    def test_param_tree_identical_and_output_close(self):
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (1, 16, 16, 3))
        m_f = models.RRDBNet(num_block=2, num_feat=16, num_grow_ch=8)
        m_q = models.RRDBNet(num_block=2, num_feat=16, num_grow_ch=8,
                             quantize=True)
        p = jax.jit(m_f.init)(rng, x)
        p_q = jax.jit(m_q.init)(rng, x)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(p_q))
        # same float params through both paths: int8 is a close approximation
        fea_f = jax.jit(lambda p, v: m_f.apply(p, v, features_only=True))(p, x)
        fea_q = jax.jit(lambda p, v: m_q.apply(p, v, features_only=True))(p, x)
        num = float(jnp.sum((fea_f - fea_q) ** 2))
        den = float(jnp.sum(fea_f ** 2)) + 1e-12
        snr_db = 10 * np.log10(den / max(num, 1e-12))
        assert snr_db > 25, snr_db  # faithful approximation
        # and it is genuinely different bits (the int8 path actually ran)
        assert num > 0
