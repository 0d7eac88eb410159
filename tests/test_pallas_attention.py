"""Pallas fused window attention vs the XLA einsum reference (interpret mode
on the CPU mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.models.swinir import SwinIR, shift_attn_mask
from srbh_tpu.ops.pallas.window_attention import (
    HAVE_PALLAS,
    window_attention_pallas,
    window_attention_xla,
)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="no pallas")


def make_qkv(seed=0, h=2, b=16, n=64, d=16):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(h, b, n, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(h, n, n)).astype(np.float32))
    return mk(), mk(), mk(), bias


class TestKernel:
    def test_unmasked_matches_xla(self):
        q, k, v, bias = make_qkv()
        want = window_attention_xla(q, k, v, bias)
        got = window_attention_pallas(q, k, v, bias, chunk=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_masked_matches_xla_nw_multiple(self):
        # 16 windows per image, chunk 8 -> nW % chunk == 0
        q, k, v, bias = make_qkv(seed=1, b=32, n=64)
        mask = jnp.asarray(shift_attn_mask(32, 32, 8, 4))
        assert mask.shape[0] == 16
        want = window_attention_xla(q, k, v, bias, mask)
        got = window_attention_pallas(q, k, v, bias, mask, chunk=8,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_masked_chunk_multiple_of_nw(self):
        # 4 windows per image, chunk 8 -> chunk % nW == 0 (mask tiled)
        q, k, v, bias = make_qkv(seed=2, b=16, n=64)
        mask = jnp.asarray(shift_attn_mask(16, 16, 8, 4))
        assert mask.shape[0] == 4
        want = window_attention_xla(q, k, v, bias, mask)
        got = window_attention_pallas(q, k, v, bias, mask, chunk=8,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_incompatible_mask_raises(self):
        q, k, v, bias = make_qkv(seed=3, b=18, n=49, d=8)
        mask = jnp.zeros((9, 49, 49))
        with pytest.raises(ValueError):
            window_attention_pallas(q, k, v, bias, mask, chunk=6,
                                    interpret=True)


class TestModelIntegration:
    def test_swinir_pallas_flag_same_outputs(self):
        """Same params, pallas vs XLA attention -> same image (interpret)."""
        import srbh_tpu.ops.pallas.window_attention as wa

        m_x = SwinIR(upscale=2, embed_dim=8, depths=(2,), num_heads=(2,),
                     window_size=8, mlp_ratio=2,
                     upsampler="pixelshuffledirect", use_pallas=False)
        m_p = SwinIR(upscale=2, embed_dim=8, depths=(2,), num_heads=(2,),
                     window_size=8, mlp_ratio=2,
                     upsampler="pixelshuffledirect", use_pallas=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 32, 32, 3)).astype(np.float32))
        v = jax.jit(m_x.init)(jax.random.PRNGKey(0), x)
        want = jax.jit(m_x.apply)(v, x)
        # route the auto path through the interpreter for the CPU test
        orig = wa.window_attention_pallas
        try:
            wa_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
            wa.window_attention_pallas = wa_call
            got = m_p.apply(v, x)
        finally:
            wa.window_attention_pallas = orig
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5)
