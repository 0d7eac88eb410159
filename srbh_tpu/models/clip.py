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


def _sdpa(q, k, v, heads):
    """Per-head scaled dot-product attention over (B, N, width) tensors."""
    b, nq, w = q.shape
    nk = k.shape[1]
    hd = w // heads
    q = q.reshape(b, nq, heads, hd)
    k = k.reshape(b, nk, heads, hd)
    v = v.reshape(b, nk, heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, q.dtype))
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, nq, w)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (ln_1 -> MHA -> +x, ln_2 -> MLP -> +x)."""

    width: int
    heads: int
    use_quick_gelu: bool = True
    dtype: Dtype = jnp.float32
    mlp_dim: Optional[int] = None  # default 4x width (CLIPA bigG uses 8192)
    ln_eps: float = 1e-5  # timm (SigLIP) blocks use 1e-6

    @nn.compact
    def __call__(self, x):  # (B, N, width)
        b, n, w = x.shape
        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_1", dtype=self.dtype)(x)
        # torch nn.MultiheadAttention: fused in-projection then per-head SDPA
        qkv = nn.Dense(3 * w, name="attn_in", dtype=self.dtype)(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        y = _sdpa(q, k, v, self.heads)
        y = nn.Dense(w, name="attn_out", dtype=self.dtype)(y)
        x = x + y

        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_2", dtype=self.dtype)(x)
        y = nn.Dense(self.mlp_dim or 4 * w, name="mlp_c_fc", dtype=self.dtype)(y)
        y = quick_gelu(y) if self.use_quick_gelu else nn.gelu(y, approximate=False)
        y = nn.Dense(w, name="mlp_c_proj", dtype=self.dtype)(y)
        return x + y


class CLIPVisionTransformer(nn.Module):
    """The ViT image tower (defaults = ViT-B/16, 224 px, 512-d output).

    The CLIPA variants (open_clip ``ViT-bigG-14-CLIPA-336``,
    SR/psnr_ssim.py:500-502) are the same module with ``ln_pre=False``,
    ``pool='avg'``, ``final_ln_after_pool=True`` and a custom ``mlp_dim`` —
    matching open_clip's VisionTransformer options of the same names.
    """

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    use_quick_gelu: bool = True
    dtype: Dtype = jnp.float32
    mlp_dim: Optional[int] = None
    ln_pre: bool = True
    pool: str = "tok"  # "tok" = class token; "avg" = mean over patch tokens
    final_ln_after_pool: bool = False

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
        if self.ln_pre:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_pre", dtype=self.dtype)(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       self.use_quick_gelu, self.dtype,
                                       self.mlp_dim, name=f"resblock_{i}")(x)
        ln_post = nn.LayerNorm(epsilon=1e-5, name="ln_post", dtype=self.dtype)

        def _pool(t):
            return t[:, 1:].mean(axis=1) if self.pool == "avg" else t[:, 0]

        # open_clip: final_ln_after_pool pools first, then ln_post; OpenAI
        # CLIP norms the class token (equivalent to ln_post-then-pool).
        x = ln_post(_pool(x)) if self.final_ln_after_pool else _pool(ln_post(x))
        proj = self.param("proj", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim))
        return x @ proj.astype(x.dtype)


class MAPVisionTransformer(nn.Module):
    """SigLIP-style ViT image tower with attention-MAP pooling.

    Twin of the timm trunk inside open_clip's ``ViT-SO400M-14-SigLIP-384``
    (the reference's *default* CLIPScore encoder, SR/psnr_ssim.py:493,
    503-507): biased patch embed, learned position embedding with no class
    token, pre-LN GELU blocks, final LayerNorm, then an AttentionPoolLatent
    head (learned probe query -> MHA over tokens -> residual MLP). Returns
    the pooled feature (SigLIP's ``encode_image`` output, no projection).
    """

    image_size: int = 384
    patch_size: int = 14
    width: int = 1152
    layers: int = 27
    heads: int = 16
    mlp_dim: int = 4304
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC float; returns (B, width)
        b = x.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed",
                    dtype=self.dtype)(x)
        x = x.reshape(b, -1, self.width)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (x.shape[1], self.width))
        x = x + pos.astype(x.dtype)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, False,
                                       self.dtype, self.mlp_dim, ln_eps=1e-6,
                                       name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=self.dtype)(x)

        # AttentionPoolLatent (timm): probe query attends over all tokens
        w = self.width
        latent = self.param("latent", nn.initializers.normal(w ** -0.5),
                            (1, w))
        q = nn.Dense(w, name="pool_q", dtype=self.dtype)(
            jnp.broadcast_to(latent.astype(x.dtype), (b, 1, w)))
        kv = nn.Dense(2 * w, name="pool_kv", dtype=self.dtype)(x)
        k, v = jnp.split(kv, 2, axis=-1)
        y = _sdpa(q, k, v, self.heads)
        y = nn.Dense(w, name="pool_proj", dtype=self.dtype)(y)
        z = nn.LayerNorm(epsilon=1e-6, name="pool_norm", dtype=self.dtype)(y)
        z = nn.Dense(self.mlp_dim, name="pool_mlp_fc1", dtype=self.dtype)(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(w, name="pool_mlp_fc2", dtype=self.dtype)(z)
        return (y + z)[:, 0]


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
        "ln_post": {"scale": sd["ln_post.weight"], "bias": sd["ln_post.bias"]},
        "proj": sd["proj"],
    }
    if "ln_pre.weight" in sd:  # absent on CLIPA (no_ln_pre) checkpoints
        p["ln_pre"] = {"scale": sd["ln_pre.weight"], "bias": sd["ln_pre.bias"]}
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


def convert_siglip_visual(sd, layers: int = 27) -> dict:
    """timm/open_clip SigLIP image-trunk ``state_dict`` -> MAPVisionTransformer.

    Accepts keys with or without the ``visual.trunk.`` prefix (open_clip's
    SigLIP wraps a timm ViT there). Covers patch_embed / pos_embed / blocks
    (norm1, attn.qkv, attn.proj, norm2, mlp.fc1/fc2) / final norm / the
    attn_pool latent head.
    """
    def strip(k):
        for pre in ("visual.trunk.", "trunk."):
            if k.startswith(pre):
                return k[len(pre):]
        return k

    sd = {strip(k): np.asarray(v) for k, v in sd.items()}
    pos = sd["pos_embed"]
    if pos.ndim == 3:  # timm stores (1, N, C)
        pos = pos[0]
    p = {
        "patch_embed": {
            "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"]},
        "pos_embed": pos,
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        "latent": sd["attn_pool.latent"].reshape(1, -1),
        "pool_q": {"kernel": sd["attn_pool.q.weight"].T,
                   "bias": sd["attn_pool.q.bias"]},
        "pool_kv": {"kernel": sd["attn_pool.kv.weight"].T,
                    "bias": sd["attn_pool.kv.bias"]},
        "pool_proj": {"kernel": sd["attn_pool.proj.weight"].T,
                      "bias": sd["attn_pool.proj.bias"]},
        "pool_norm": {"scale": sd["attn_pool.norm.weight"],
                      "bias": sd["attn_pool.norm.bias"]},
        "pool_mlp_fc1": {"kernel": sd["attn_pool.mlp.fc1.weight"].T,
                         "bias": sd["attn_pool.mlp.fc1.bias"]},
        "pool_mlp_fc2": {"kernel": sd["attn_pool.mlp.fc2.weight"].T,
                         "bias": sd["attn_pool.mlp.fc2.bias"]},
    }
    for i in range(layers):
        t = f"blocks.{i}."
        p[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[t + "norm1.weight"],
                     "bias": sd[t + "norm1.bias"]},
            "ln_2": {"scale": sd[t + "norm2.weight"],
                     "bias": sd[t + "norm2.bias"]},
            "attn_in": {"kernel": sd[t + "attn.qkv.weight"].T,
                        "bias": sd[t + "attn.qkv.bias"]},
            "attn_out": {"kernel": sd[t + "attn.proj.weight"].T,
                         "bias": sd[t + "attn.proj.bias"]},
            "mlp_c_fc": {"kernel": sd[t + "mlp.fc1.weight"].T,
                         "bias": sd[t + "mlp.fc1.bias"]},
            "mlp_c_proj": {"kernel": sd[t + "mlp.fc2.weight"].T,
                           "bias": sd[t + "mlp.fc2.bias"]},
        }
    return {"params": p}
