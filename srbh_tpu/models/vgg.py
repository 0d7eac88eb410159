"""VGG19 feature extractor for the perceptual loss.

Twin of SR/srloss.py:61-103: multi-stage VGG19 features at torchvision
indices [2, 7, 16, 25, 34] (conv1_2, conv2_2, conv3_4, conv4_4, conv5_4,
pre-ReLU), with ImageNet input normalisation.

ImageNet weights: this image has zero egress, so weights must be provided as
a converted checkpoint (``load_torchvision_vgg19`` converts a torchvision
``vgg19`` state_dict file when one is available); otherwise the extractor
runs with its random init — fine for tests, documented for training.
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from srbh_tpu.models.layers import Dtype, tconv

# (out_channels per conv, with 'M' = 2x2 max-pool) — the VGG19 feature stack
VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# torchvision nn.Sequential indices of the conv outputs used by the loss
DEFAULT_FEATURE_LAYERS = (2, 7, 16, 25, 34)


class VGG19Features(nn.Module):
    """Runs the VGG19 trunk, returning activations at the requested
    torchvision sequential indices (conv outputs, before their ReLU if the
    index points at a conv; after ReLU if at a ReLU — matching the slicing in
    SR/srloss.py:82-84 which includes children up to *and including* index)."""

    feature_layers: Sequence[int] = DEFAULT_FEATURE_LAYERS
    use_input_norm: bool = True
    use_range_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        if self.use_range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - jnp.asarray(IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                IMAGENET_STD, x.dtype)
        outputs = []
        seq_idx = 0  # torchvision sequential index
        conv_idx = 0
        wanted = set(self.feature_layers)
        max_wanted = max(self.feature_layers)
        for item in VGG19_CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if seq_idx in wanted:
                    outputs.append(x)
                seq_idx += 1
            else:
                x = tconv(item, 3, 1, dtype=self.dtype,
                          name=f"conv{conv_idx}")(x)
                if seq_idx in wanted:  # conv output (pre-ReLU)
                    outputs.append(x)
                seq_idx += 1
                x = nn.relu(x)
                if seq_idx in wanted:
                    outputs.append(x)
                seq_idx += 1
                conv_idx += 1
            if seq_idx > max_wanted:
                break
        return outputs


def load_torchvision_vgg19(state_dict) -> dict:
    """Convert a torchvision vgg19 ``state_dict`` (features.N.weight/bias,
    OIHW) into this module's param tree (conv{i}, HWIO)."""
    params = {}
    conv_idx = 0
    seq_idx = 0
    for item in VGG19_CFG:
        if item == "M":
            seq_idx += 1
            continue
        w = np.asarray(state_dict[f"features.{seq_idx}.weight"])
        b = np.asarray(state_dict[f"features.{seq_idx}.bias"])
        params[f"conv{conv_idx}"] = {
            "kernel": w.transpose(2, 3, 1, 0),  # OIHW -> HWIO
            "bias": b,
        }
        conv_idx += 1
        seq_idx += 2  # conv + relu
    return {"params": params}
