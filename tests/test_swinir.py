"""SwinIR: window ops, attention masks, param-count goldens, forward shapes,
and the tiled-inference harness."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.models.swinir import (
    SwinIR,
    SwinTransformerBlock,
    WindowAttention,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)


def count_params(module, *args, **kwargs):
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    return sum(int(np.prod(p.shape)) for p in
               jax.tree_util.tree_leaves(shapes["params"]))


class TestWindowOps:
    def test_partition_reverse_roundtrip(self):
        x = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 16, 3)
        w = window_partition(x, 8)
        assert w.shape == (2 * 4, 64, 3)
        back = window_reverse(w, 8, 16, 16)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index_range(self):
        idx = relative_position_index(7)
        assert idx.shape == (49, 49)
        assert idx.min() == 0 and idx.max() == 13 * 13 - 1
        # self-relative position maps to the table centre
        assert (np.diag(idx) == (13 * 6 + 6)).all()

    def test_shift_mask_blocks_cross_region_attention(self):
        mask = shift_attn_mask(16, 16, 8, 4)
        assert mask.shape == (4, 64, 64)
        # top-left window: contiguous region, no masking
        np.testing.assert_array_equal(mask[0], 0)
        # bottom-right window mixes 4 regions: some -100 entries
        assert (mask[-1] == -100).any()


class TestSwinIRModel:
    def test_param_count_classical(self):
        from srbh_tpu.tools.swinir_harness import define_model

        m = define_model("classical_sr", scale=2)
        n = count_params(m, jnp.zeros((1, 48, 48, 3)))
        assert abs(n / 1e6 - 11.90) < 0.15  # network_swinir.py:881

    def test_param_count_lightweight(self):
        from srbh_tpu.tools.swinir_harness import define_model

        m = define_model("lightweight_sr", scale=4)
        n = count_params(m, jnp.zeros((1, 48, 48, 3)))
        assert abs(n / 1e6 - 0.93) < 0.05  # network_swinir.py:882

    def test_forward_non_window_multiple(self):
        # 20x22 input with window 8 must reflect-pad and crop back (x2 SR)
        m = SwinIR(upscale=2, embed_dim=8, depths=(2,), num_heads=(2,),
                   window_size=8, mlp_ratio=2, upsampler="pixelshuffledirect")
        x = jnp.zeros((1, 20, 22, 3))
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(m.apply)(variables, x)
        assert out.shape == (1, 40, 44, 3)

    def test_denoise_head_is_residual(self):
        m = SwinIR(upscale=1, in_chans=1, out_chans=1, embed_dim=8,
                   depths=(2,), num_heads=(2,), window_size=8, mlp_ratio=2,
                   upsampler="")
        x = jnp.full((1, 16, 16, 1), 0.5)
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(m.apply)(variables, x)
        assert out.shape == x.shape

    def test_realsr_head(self):
        m = SwinIR(upscale=4, embed_dim=8, depths=(2,), num_heads=(2,),
                   window_size=8, mlp_ratio=2, upsampler="nearest+conv",
                   num_feat=8)
        x = jnp.zeros((1, 16, 16, 3))
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(m.apply)(variables, x)
        assert out.shape == (1, 64, 64, 3)

    def test_shifted_block_changes_output(self):
        # same weights, shifted vs unshifted block must differ on structured input
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 16, 16, 8)).astype(np.float32))
        b0 = SwinTransformerBlock(8, 2, window_size=8, shift_size=0)
        b1 = SwinTransformerBlock(8, 2, window_size=8, shift_size=4)
        v = b0.init(jax.random.PRNGKey(0), x)
        o0 = b0.apply(v, x)
        o1 = b1.apply(v, x)
        assert not np.allclose(np.asarray(o0), np.asarray(o1))


class TestHarness:
    def _tiny_apply(self):
        m = SwinIR(upscale=2, embed_dim=8, depths=(2,), num_heads=(2,),
                   window_size=8, mlp_ratio=2, upsampler="pixelshuffledirect")
        x = jnp.zeros((1, 16, 16, 3))
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        return jax.jit(lambda v: m.apply(variables, v)), m

    def test_pad_to_window_multiple(self):
        from srbh_tpu.tools.swinir_harness import pad_to_window_multiple

        img = np.random.default_rng(0).random((20, 22, 3)).astype(np.float32)
        out = pad_to_window_multiple(img, 8)
        assert out.shape == (24, 24, 3)
        np.testing.assert_array_equal(out[:20, :22], img)
        # reflect-by-flip: row 20 is row 19 mirrored
        np.testing.assert_array_equal(out[20, :22], img[19])

    def test_tiled_matches_whole(self):
        from srbh_tpu.tools.swinir_harness import tiled_inference

        apply_fn, m = self._tiny_apply()
        img = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
        whole = tiled_inference(apply_fn, img, scale=2, tile=None)
        tiled = tiled_inference(apply_fn, img, scale=2, tile=16,
                                tile_overlap=8, window_size=8)
        assert whole.shape == tiled.shape == (64, 64, 3)
        # interiors agree; window-boundary effects stay small for a tiny net
        diff = np.abs(whole - tiled).mean()
        assert diff < 0.2

    def test_task_presets(self):
        from srbh_tpu.tools.swinir_harness import define_model, setup

        for task in ("classical_sr", "lightweight_sr", "real_sr", "gray_dn",
                     "color_dn", "jpeg_car", "color_jpeg_car"):
            m = define_model(task, scale=2 if "sr" in task else 1)
            border, ws = setup(task, 2)
            assert ws in (7, 8)
        with pytest.raises(ValueError):
            define_model("bogus")


class TestWindowAttentionTorchOracle:
    """Numeric oracle: torch replica of WindowAttention
    (SR/network_swinir.py:65-161) — qkv linear, scaled q@k^T + relative
    position bias (+shift mask), softmax, @v, proj — must match the einsum
    implementation under transposed-weight conversion."""

    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        import jax
        import torch.nn.functional as F

        from srbh_tpu.models.swinir import (WindowAttention,
                                            relative_position_index,
                                            shift_attn_mask)

        dim, ws, heads = 12, 4, 3
        n = ws * ws
        nW = 4  # windows of an 8x8 map
        b = 2
        torch.manual_seed(3)
        qkv_w = torch.randn(3 * dim, dim) * 0.2
        qkv_b = torch.randn(3 * dim) * 0.1
        proj_w = torch.randn(dim, dim) * 0.2
        proj_b = torch.randn(dim) * 0.1
        table = torch.randn((2 * ws - 1) ** 2, heads) * 0.5
        mask_np = shift_attn_mask(8, 8, ws, shift=2)  # (nW, n, n)
        x_np = np.random.default_rng(7).normal(
            size=(b * nW, n, dim)).astype(np.float32)

        with torch.no_grad():
            x = torch.from_numpy(x_np)
            B_ = x.shape[0]
            qkv = F.linear(x, qkv_w, qkv_b).reshape(
                B_, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            q = q * (dim // heads) ** -0.5
            attn = q @ k.transpose(-2, -1)
            idx = torch.from_numpy(
                relative_position_index(ws).reshape(-1).astype(np.int64))
            bias = table[idx].reshape(n, n, heads).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            m = torch.from_numpy(mask_np)
            attn = attn.view(B_ // nW, nW, heads, n, n) + m.unsqueeze(
                1).unsqueeze(0)
            attn = attn.view(-1, heads, n, n)
            attn = F.softmax(attn, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(B_, n, dim)
            want = F.linear(out, proj_w, proj_b).numpy()

        params = {
            "qkv": {"kernel": qkv_w.numpy().T, "bias": qkv_b.numpy()},
            "proj": {"kernel": proj_w.numpy().T, "bias": proj_b.numpy()},
            "relative_position_bias_table": table.numpy(),
        }
        m = WindowAttention(dim=dim, window_size=ws, num_heads=heads)
        got = m.apply({"params": params}, jnp.asarray(x_np),
                      mask=jnp.asarray(mask_np))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
