"""SwinIR: window-attention image restoration (SR / denoise / JPEG CAR).

Capability twin of SR/network_swinir.py, re-laid-out for TPU:

* features stay NHWC end-to-end; window partition/reverse are pure
  reshape+transpose (XLA layout ops) instead of the torch flatten dance,
* window attention is a batched einsum over (windows, heads, tokens, dim) —
  token count 49/64 keeps QK^T/AV on the MXU; the relative-position bias
  index is a static numpy gather baked at trace time
  (WindowAttention, :65-161),
* shifted windows use ``jnp.roll`` + the standard 9-region additive -100
  mask (SwinTransformerBlock, :216-279),
* RSTB residual groups with '1conv'/'3conv' tails (:419-493),
* heads: 'pixelshuffle' (classical SR), 'pixelshuffledirect' (lightweight),
  'nearest+conv' (real SR), and the denoise/CAR residual head (:740-840),
* reflect padding to window multiples + crop back (check_image_size,
  :783-788); RGB mean/img_range normalisation.

Param-count goldens: 11.90 M classical / 0.93 M lightweight (:881-882).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu.models.layers import Dtype, PixelShuffleUpsampler, tconv
from srbh_tpu.ops.resize import upsample_nearest
from srbh_tpu.ops.shuffle import pixel_shuffle

RGB_MEAN = (0.4488, 0.4371, 0.4040)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws^2, ws^2) indices into the (2ws-1)^2 bias table (static)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws^2, ws^2) additive mask (0 / -100) for shifted windows
    (SwinTransformerBlock :216-237)."""
    img_mask = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, vs] = cnt
            cnt += 1
    # pure-numpy window partition (this runs at trace time)
    mw = img_mask.reshape(h // ws, ws, w // ws, ws)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    use_pallas: bool = False  # fused VMEM kernel (ops/pallas/window_attention)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        """x: (B_, N, C) windows; mask: (nW, N, N) or None."""
        from srbh_tpu.ops.pallas.window_attention import (
            window_attention_auto,
            window_attention_xla,
        )

        b_, n, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, head_dim).transpose(2, 3, 0, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (heads, B_, N, d)
        if self.qk_scale is not None:
            q = q * (self.qk_scale * head_dim**0.5)  # fold custom scale in

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, heads))
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)

        fn = window_attention_auto if self.use_pallas else window_attention_xla
        out = fn(q, k, v, bias, mask)  # (heads, B_, N, d)
        out = out.transpose(1, 2, 0, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SwinTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_pallas: bool = False
    # the reference decides shift/window-clamp STATICALLY from the init
    # img_size (network_swinir.py:178-183), not the runtime feature size:
    # with img_size 64 it still shifts+masks a runtime 8x8 input. None
    # falls back to the runtime rule (back-compat for direct block use).
    static_size: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C) image-space features."""
        b, h, w, c = x.shape
        ref = self.static_size if self.static_size is not None else min(h, w)
        ws = min(self.window_size, ref)
        shift = 0 if ref <= self.window_size else self.shift_size

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, ws, shift))
        else:
            mask = None
        windows = window_partition(x, ws)
        attn = WindowAttention(c, ws, self.num_heads,
                               use_pallas=self.use_pallas, dtype=self.dtype,
                               name="attn")(windows, mask)
        x = window_reverse(attn, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))

        x = shortcut + self._drop_path(x, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")(y)
        return x + self._drop_path(y, train)

    def _drop_path(self, x, train):
        if not train or self.drop_path == 0.0:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
        return x / keep * mask.astype(x.dtype)


class RSTB(nn.Module):
    """Residual Swin Transformer block group (:419-493)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    drop_paths: Sequence[float] = ()
    resi_connection: str = "1conv"
    use_pallas: bool = False
    static_size: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        for i in range(self.depth):
            dp = self.drop_paths[i] if i < len(self.drop_paths) else 0.0
            x = SwinTransformerBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, drop_path=dp,
                use_pallas=self.use_pallas, static_size=self.static_size,
                dtype=self.dtype,
                name=f"block{i}")(x, train)
        if self.resi_connection == "1conv":
            x = tconv(self.dim, 3, dtype=self.dtype, name="conv")(x)
        else:  # '3conv': channel-squeezed 3-conv tail (:447-452)
            mid = self.dim // 4
            x = nn.leaky_relu(tconv(mid, 3, dtype=self.dtype, name="conv1")(x), 0.2)
            x = nn.leaky_relu(tconv(mid, 1, dtype=self.dtype, name="conv2")(x), 0.2)
            x = tconv(self.dim, 3, dtype=self.dtype, name="conv3")(x)
        return x + res


class SwinIR(nn.Module):
    in_chans: int = 3
    out_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ""  # '' | 'pixelshuffle' | 'pixelshuffledirect' | 'nearest+conv'
    resi_connection: str = "1conv"
    patch_norm: bool = True
    num_feat: int = 64
    use_pallas: bool = False  # fused Pallas window attention on TPU
    # init-time training patch size: fixes the shift decision like the
    # reference (every shipped preset has img_size > window_size, so the
    # shifted windows fire even for degenerate runtime inputs)
    img_size: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, in_chans) in [0, 1]; returns upscaled image."""
        h_in, w_in = x.shape[1], x.shape[2]
        ws = self.window_size
        pad_h = (ws - h_in % ws) % ws
        pad_w = (ws - w_in % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
        if self.in_chans == 3:
            mean = jnp.asarray(RGB_MEAN, x.dtype)
        else:
            mean = jnp.zeros((1,), x.dtype)
        x = (x - mean) * self.img_range

        def features(feat):
            if self.patch_norm:
                f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(feat)
            else:
                f = feat
            total = sum(self.depths)
            dpr = [float(v) for v in
                   np.linspace(0, self.drop_path_rate, total)]
            start = 0
            for li, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
                f = RSTB(self.embed_dim, depth, heads, ws,
                         mlp_ratio=self.mlp_ratio,
                         drop_paths=tuple(dpr[start: start + depth]),
                         resi_connection=self.resi_connection,
                         use_pallas=self.use_pallas,
                         static_size=self.img_size,
                         dtype=self.dtype, name=f"layer{li}")(f, train)
                start += depth
            f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(f)
            return f

        if self.upsampler == "pixelshuffle":
            feat = tconv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
            feat = tconv(self.embed_dim, 3, dtype=self.dtype,
                         name="conv_after_body")(features(feat)) + feat
            feat = nn.leaky_relu(tconv(self.num_feat, 3, dtype=self.dtype,
                                       name="conv_before_upsample")(feat), 0.01)
            feat = PixelShuffleUpsampler(self.upscale, self.num_feat,
                                         dtype=self.dtype, name="upsample")(feat)
            out = tconv(self.out_chans, 3, dtype=self.dtype, name="conv_last")(feat)
        elif self.upsampler == "pixelshuffledirect":
            feat = tconv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
            feat = tconv(self.embed_dim, 3, dtype=self.dtype,
                         name="conv_after_body")(features(feat)) + feat
            feat = tconv(self.out_chans * self.upscale**2, 3, dtype=self.dtype,
                         name="upsample_conv")(feat)
            out = pixel_shuffle(feat, self.upscale)
        elif self.upsampler == "nearest+conv":
            feat = tconv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
            feat = tconv(self.embed_dim, 3, dtype=self.dtype,
                         name="conv_after_body")(features(feat)) + feat
            feat = nn.leaky_relu(tconv(self.num_feat, 3, dtype=self.dtype,
                                       name="conv_before_upsample")(feat), 0.01)
            feat = nn.leaky_relu(tconv(self.num_feat, 3, dtype=self.dtype,
                                       name="conv_up1")(upsample_nearest(feat, 2)), 0.2)
            if self.upscale == 4:
                feat = nn.leaky_relu(tconv(self.num_feat, 3, dtype=self.dtype,
                                           name="conv_up2")(upsample_nearest(feat, 2)), 0.2)
            feat = nn.leaky_relu(tconv(self.num_feat, 3, dtype=self.dtype,
                                       name="conv_hr")(feat), 0.2)
            out = tconv(self.out_chans, 3, dtype=self.dtype, name="conv_last")(feat)
        else:  # denoise / JPEG CAR: global residual, upscale == 1
            feat = tconv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
            res = tconv(self.embed_dim, 3, dtype=self.dtype,
                        name="conv_after_body")(features(feat)) + feat
            out = x + tconv(self.out_chans, 3, dtype=self.dtype,
                            name="conv_last")(res)

        out = out / self.img_range + mean
        return out[:, : h_in * self.upscale, : w_in * self.upscale, :]
