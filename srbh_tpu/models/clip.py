"""CLIP vision transformer (image tower) for CLIPScore.

TPU-native twin of the encoder used by ``calculate_clipscore``
(SR/psnr_ssim.py:493-536, via ``clip.load("ViT-B/16")``): a pre-LN ViT with
class token, QuickGELU MLPs, and a final linear projection into the joint
embedding space. Only the image tower is needed — the reference computes the
cosine similarity of two *image* embeddings, never using the text tower.

Zero egress means the pretrained weights cannot be fetched here;
:func:`convert_clip_visual` maps an OpenAI-CLIP ``state_dict`` (the
``visual.*`` subtree, e.g. from ``clip.load(...)[0].state_dict()``) onto this
module so provided weights load exactly. The architecture is configurable
(patch/width/layers/heads/output_dim) so other ViT towers — e.g. CLIPA or
SigLIP variants with ``use_quick_gelu=False`` — are the same module with
different hyperparameters.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def quick_gelu(x):
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (ln_1 -> MHA -> +x, ln_2 -> MLP -> +x)."""

    width: int
    heads: int
    use_quick_gelu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, width)
        b, n, w = x.shape
        hd = w // self.heads
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1", dtype=self.dtype)(x)
        # torch nn.MultiheadAttention: fused in-projection then per-head SDPA
        qkv = nn.Dense(3 * w, name="attn_in", dtype=self.dtype)(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.heads, hd)
        k = k.reshape(b, n, self.heads, hd)
        v = v.reshape(b, n, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, q.dtype))
        attn = jax.nn.softmax(scores, axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, w)
        y = nn.Dense(w, name="attn_out", dtype=self.dtype)(y)
        x = x + y

        y = nn.LayerNorm(epsilon=1e-5, name="ln_2", dtype=self.dtype)(x)
        y = nn.Dense(4 * w, name="mlp_c_fc", dtype=self.dtype)(y)
        y = quick_gelu(y) if self.use_quick_gelu else nn.gelu(y, approximate=False)
        y = nn.Dense(w, name="mlp_c_proj", dtype=self.dtype)(y)
        return x + y


class CLIPVisionTransformer(nn.Module):
    """The ViT image tower (defaults = ViT-B/16, 224 px, 512-d output)."""

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    use_quick_gelu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC float in [0, 1]-ish; returns (B, output_dim)
        b = x.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", use_bias=False, name="conv1",
                    dtype=self.dtype)(x)
        x = x.reshape(b, -1, self.width)  # (B, grid*grid, width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width)), x], 1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (x.shape[1], self.width))
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre", dtype=self.dtype)(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       self.use_quick_gelu, self.dtype,
                                       name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post", dtype=self.dtype)(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim))
        return x @ proj.astype(x.dtype)


def convert_clip_visual(sd, layers: int = 12) -> dict:
    """OpenAI-CLIP ``state_dict`` -> this module's variables.

    Accepts keys with or without the ``visual.`` prefix (i.e. a full CLIP
    model state_dict or just its vision subtree). Dense kernels are the
    transposed torch weights; the patch conv goes OIHW -> HWIO.
    """
    sd = {k[len("visual."):] if k.startswith("visual.") else k: np.asarray(v)
          for k, v in sd.items()}
    p = {
        "conv1": {"kernel": sd["conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["class_embedding"],
        "positional_embedding": sd["positional_embedding"],
        "ln_pre": {"scale": sd["ln_pre.weight"], "bias": sd["ln_pre.bias"]},
        "ln_post": {"scale": sd["ln_post.weight"], "bias": sd["ln_post.bias"]},
        "proj": sd["proj"],
    }
    for i in range(layers):
        t = f"transformer.resblocks.{i}."
        p[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[t + "ln_1.weight"], "bias": sd[t + "ln_1.bias"]},
            "ln_2": {"scale": sd[t + "ln_2.weight"], "bias": sd[t + "ln_2.bias"]},
            "attn_in": {"kernel": sd[t + "attn.in_proj_weight"].T,
                        "bias": sd[t + "attn.in_proj_bias"]},
            "attn_out": {"kernel": sd[t + "attn.out_proj.weight"].T,
                         "bias": sd[t + "attn.out_proj.bias"]},
            "mlp_c_fc": {"kernel": sd[t + "mlp.c_fc.weight"].T,
                         "bias": sd[t + "mlp.c_fc.bias"]},
            "mlp_c_proj": {"kernel": sd[t + "mlp.c_proj.weight"].T,
                           "bias": sd[t + "mlp.c_proj.bias"]},
        }
    return {"params": p}
