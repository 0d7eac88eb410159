"""LPIPS perceptual distance (AlexNet backbone + learned linear heads).

TPU-native twin of the ``lpips.LPIPS(net='alex')`` network used by
``calculate_lpips`` (SR/psnr_ssim.py:563-602): an AlexNet feature trunk, a
fixed input scaling layer, per-layer channel-unit-normalisation, squared
differences weighted by learned 1x1 "lin" convolutions, and spatial
averaging summed over the five tap layers.

Zero egress: pretrained weights must be supplied; :func:`convert_lpips_alex`
maps a ``lpips.LPIPS(net='alex').state_dict()`` (or a torchvision ``alexnet``
features state_dict for the trunk alone) onto this module.
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any

# lpips.ScalingLayer constants (shift/scale applied channel-wise, RGB)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# torchvision AlexNet.features convs: (out_ch, kernel, stride, pad); a 3x3/2
# VALID max-pool precedes convs 1 and 2 (features indices 2 and 5).
_ALEX_CONVS = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1))
_POOL_BEFORE = (1, 2)  # conv indices preceded by a max-pool
ALEX_CHANNELS = tuple(c[0] for c in _ALEX_CONVS)


class AlexNetFeatures(nn.Module):
    """AlexNet trunk returning the five post-ReLU taps LPIPS uses
    (lpips/pretrained_networks.py slices: relu1..relu5)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CONVS):
            if i in _POOL_BEFORE:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv{i}",
                        dtype=self.dtype)(x)
            x = nn.relu(x)
            taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Full LPIPS-alex metric network. Input: NHWC pairs; the caller decides
    the input range (lpips expects [-1, 1]; the reference feeds [0, 1] —
    see :func:`srbh_tpu.metrics.learned.calculate_lpips`)."""

    dtype: Dtype = jnp.float32

    def setup(self):
        self.net = AlexNetFeatures(dtype=self.dtype)
        self.lins = [
            nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}",
                    dtype=self.dtype)
            for i in range(len(_ALEX_CONVS))
        ]

    def _scaled(self, x):
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        return (x - shift) / scale

    def __call__(self, x0, x1):  # NHWC -> (N,)
        f0 = self.net(self._scaled(x0))
        f1 = self.net(self._scaled(x1))
        total = 0.0
        for lin, a, b in zip(self.lins, f0, f1):
            # unit-normalise over channels. lpips.normalize_tensor puts the
            # eps OUTSIDE the sqrt — a/(sqrt(sum)+1e-10) — which matters for
            # near-dead post-ReLU regions (sum ~1e-10 still yields a
            # near-unit vector upstream)
            a = a / (jnp.sqrt(jnp.sum(a * a, -1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, -1, keepdims=True)) + 1e-10)
            d = lin((a - b) ** 2)  # (N, H, W, 1)
            total = total + jnp.mean(d, axis=(1, 2, 3))  # spatial average
        return total


def convert_lpips_alex(sd) -> dict:
    """``lpips.LPIPS(net='alex')`` state_dict -> this module's variables.

    lpips wraps the torchvision trunk in slices, so its conv keys are
    ``net.slice{s}.{features_idx}.weight`` with features indices
    (0, 3, 6, 8, 10); the learned heads are ``lin{i}.model.1.weight``
    (index 1 skips the Dropout). A bare torchvision ``features.{idx}.*``
    state_dict is also accepted (trunk only — lin heads must then already be
    trained/provided separately).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    feat_idx = (0, 3, 6, 8, 10)
    net = {}
    for i, fi in enumerate(feat_idx):
        for key in (f"net.slice{i + 1}.{fi}.weight", f"features.{fi}.weight"):
            if key in sd:
                net[f"conv{i}"] = {
                    "kernel": sd[key].transpose(2, 3, 1, 0),
                    "bias": sd[key[:-len("weight")] + "bias"],
                }
                break
        else:
            raise KeyError(f"no trunk weights for conv{i} (features.{fi})")
    params = {"net": net}
    for i in range(len(feat_idx)):
        key = f"lin{i}.model.1.weight"
        if key in sd:  # (1, C, 1, 1) -> HWIO (1, 1, C, 1)
            params[f"lin{i}"] = {"kernel": sd[key].transpose(2, 3, 1, 0)}
    return {"params": params}
