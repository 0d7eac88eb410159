"""Learned image metrics: CLIPScore and LPIPS.

Twin of SR/psnr_ssim.py:493-602. The encoders are real Flax modules — all
three reference variants: the OpenAI CLIP ViT-B/16, the CLIPA bigG-336
avg-pool tower, and the default SigLIP SO400M attention-MAP tower
(``srbh_tpu.models.clip``), plus LPIPS-AlexNet
(``srbh_tpu.models.lpips``) — with converters for the published torch
weights; only the *pretrained weights* are gated (zero egress — they must be
converted from a local checkpoint), not the architecture.

Reference quirks reproduced faithfully:

* inputs are HWC uint8-range arrays divided by 255 and **nearest**-resized
  (torch ``F.interpolate`` default) to the encoder's input size
  (SR/psnr_ssim.py:510-517);
* no CLIP mean/std normalisation is applied before encoding (the reference
  skips the preprocess transform it unpacks from ``clip.load``);
* LPIPS is fed the [0, 1] tensors directly even though ``lpips.LPIPS``
  documents a [-1, 1] input range (SR/psnr_ssim.py:572-578) — the scaling
  layer sees [0, 1], same as upstream.

Weight acquisition (outside this image): ``clip.load("ViT-B/16")`` /
``lpips.LPIPS(net='alex')`` -> ``state_dict()`` -> ``torch.save`` -> convert
with :func:`srbh_tpu.models.clip.convert_clip_visual` /
:func:`srbh_tpu.models.lpips.convert_lpips_alex`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu.models.clip import CLIPVisionTransformer, MAPVisionTransformer
from srbh_tpu.models.lpips import LPIPS

# encoder presets of SR/psnr_ssim.py:496-507: the OpenAI CLIP ViT-B/16,
# open_clip's CLIPA bigG-336 (avg-pool, no ln_pre, final-LN-after-pool), and
# the reference's DEFAULT — the SigLIP SO400M attention-MAP-pooled tower.
_CLIP_PRESETS = {
    "clip-ViT-B/16": (CLIPVisionTransformer,
                      dict(image_size=224, patch_size=16, width=768,
                           layers=12, heads=12, output_dim=512,
                           use_quick_gelu=True)),
    "clipa-ViT-bigG-14": (CLIPVisionTransformer,
                          dict(image_size=336, patch_size=14, width=1664,
                               layers=48, heads=16, mlp_dim=8192,
                               output_dim=1280, use_quick_gelu=False,
                               ln_pre=False, pool="avg",
                               final_ln_after_pool=True)),
    "siglip-ViT-SO400M-14": (MAPVisionTransformer,
                             dict(image_size=384, patch_size=14, width=1152,
                                  layers=27, heads=16, mlp_dim=4304)),
}
# reference quirk: only the batched _pt variant maps 'resnet50' to the
# SigLIP tower (SR/psnr_ssim.py:539-542); the single-image function raises
# for it (:507-508), so the alias is applied in calculate_clipscore_pt only
_PT_ALIASES = {"resnet50": "siglip-ViT-SO400M-14"}


def clip_vision_model(clip_model: str = "siglip-ViT-SO400M-14"):
    if clip_model not in _CLIP_PRESETS:
        raise ValueError(
            f"{clip_model!r} is not supported for CLIPScore "
            f"(available: {sorted(_CLIP_PRESETS)}) — same error contract as "
            "SR/psnr_ssim.py:508")
    cls, kwargs = _CLIP_PRESETS[clip_model]
    return cls(**kwargs)


def _require(variables, what: str, converter: str):
    if variables is None:
        raise ValueError(
            f"{what} needs pretrained weights: convert a torch state_dict "
            f"with srbh_tpu.models.{converter} and pass the result as "
            "`variables` (zero-egress image — weights cannot be fetched "
            "here; PSNR/SSIM/cPSNR/PSNR-B need no weights).")


def _nearest_torch(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest')`` convention on NHWC: source
    index = floor(dst * float32(in / out)) — torch multiplies by the
    float32 scale, NOT exact integer floor(dst*in//out), and the two
    disagree at exact-boundary indices (e.g. 224->384 picks row 62 at dst
    108 under torch, 63 under integer math). Differs from
    jax.image.resize's half-pixel-centre nearest (3->4: torch [0,0,1,2],
    jax [0,1,1,2]) — the reference resizes with the torch rule
    (SR/psnr_ssim.py:515-517)."""
    sy = np.float32(x.shape[1] / size)
    sx = np.float32(x.shape[2] / size)
    iy = np.floor(np.arange(size, dtype=np.float32) * sy).astype(np.int32)
    ix = np.floor(np.arange(size, dtype=np.float32) * sx).astype(np.int32)
    iy = np.minimum(iy, x.shape[1] - 1)
    ix = np.minimum(ix, x.shape[2] - 1)
    return x[:, iy][:, :, ix]


def _prep(img, size: Optional[int] = None, dtype=jnp.float32):
    """HWC [0,255] -> (1,S,S,C) float [0,1]; if ``size`` is given,
    nearest-resize (the reference's F.interpolate default,
    SR/psnr_ssim.py:515-517)."""
    x = jnp.asarray(np.asarray(img), dtype) / 255.0
    if x.ndim == 2:
        x = x[..., None]
    if x.shape[-1] == 1:  # 1-ch inputs are channel-repeated (psnr_ssim.py:552)
        x = jnp.repeat(x, 3, axis=-1)
    x = x[None]
    if size is not None and (x.shape[1] != size or x.shape[2] != size):
        x = _nearest_torch(x, size)
    return x


def calculate_clipscore(img, img2, variables=None,
                        clip_model: str = "siglip-ViT-SO400M-14",
                        model=None) -> float:
    """Cosine similarity of CLIP image embeddings (SR/psnr_ssim.py:493-522;
    default encoder matches the reference's siglip-ViT-SO400M-14)."""
    model = model or clip_vision_model(clip_model)
    _require(variables, "CLIPScore",
             "clip.convert_siglip_visual (SigLIP) / clip.convert_clip_visual"
             " (CLIP, CLIPA)")
    size = model.image_size
    f1 = model.apply(variables, _prep(img, size))
    f2 = model.apply(variables, _prep(img2, size))
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)
    return float(jnp.sum(f1 * f2, axis=-1).mean())


def calculate_clipscore_pt(imgs, imgs2, variables=None,
                           clip_model: str = "siglip-ViT-SO400M-14",
                           model=None) -> float:
    """Batched-tensor CLIPScore (calculate_clipscore_pt,
    SR/psnr_ssim.py:525-560): inputs are float (B, H, W, C) arrays already
    in [0, 1] (no /255), single-channel batches are channel-repeated, and
    the per-image cosine similarities are averaged."""
    model = model or clip_vision_model(_PT_ALIASES.get(clip_model,
                                                       clip_model))
    _require(variables, "CLIPScore",
             "clip.convert_siglip_visual (SigLIP) / clip.convert_clip_visual"
             " (CLIP, CLIPA)")
    size = model.image_size

    def prep(x):
        x = jnp.asarray(np.asarray(x), jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if x.shape[1] != size or x.shape[2] != size:
            x = _nearest_torch(x, size)
        return x

    f1 = model.apply(variables, prep(imgs))
    f2 = model.apply(variables, prep(imgs2))
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)
    return float(jnp.sum(f1 * f2, axis=-1).mean())


def calculate_lpips_pt(imgs, imgs2, variables=None,
                       model: Optional[LPIPS] = None) -> float:
    """Batched-tensor LPIPS (calculate_lpips_pt, SR/psnr_ssim.py:584-602):
    float (B, H, W, C) inputs pass through unscaled (the reference feeds
    them as-is), 1-channel batches are repeated, distances are averaged."""
    model = model or LPIPS()
    _require(variables, "LPIPS", "lpips.convert_lpips_alex")

    def prep(x):
        x = jnp.asarray(np.asarray(x), jnp.float32)
        return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

    return float(model.apply(variables, prep(imgs), prep(imgs2)).mean())


def calculate_lpips(img, img2, variables=None, net: str = "alex",
                    model: Optional[LPIPS] = None) -> float:
    """LPIPS perceptual distance (SR/psnr_ssim.py:563-580).

    Like the reference, the [0, 1] tensors go straight into the network
    (upstream lpips' documented range is [-1, 1]; psnr_ssim.py:572-578 skips
    that remap, so we do too).
    """
    if net != "alex" and model is None:
        raise ValueError(
            f"net={net!r} not supported (only the 'alex' trunk is "
            "implemented; pass a custom `model` for other backbones)")
    model = model or LPIPS()
    _require(variables, "LPIPS", "lpips.convert_lpips_alex")
    # no resize: lpips runs at native resolution (SR/psnr_ssim.py:572-580)
    return float(model.apply(variables, _prep(img), _prep(img2))[0])
