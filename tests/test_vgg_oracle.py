"""Torch numeric oracle for the VGG19 perceptual-feature path.

An independent torch VGG19 feature stack (cfg-E conv/relu/maxpool Sequential,
random init) is run with the reference extractor's documented semantics
(SR/srloss.py:61-139 — ImageNet input norm, taps at sequential indices
[2,7,16,25,34] *inclusive*, so conv outputs pre-ReLU) and compared against
``VGG19Features`` through ``load_torchvision_vgg19``, then through the full
``perceptual_loss`` weighting [.1,.1,1,1,1].
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from srbh_tpu.models.vgg import (  # noqa: E402
    DEFAULT_FEATURE_LAYERS,
    IMAGENET_MEAN,
    IMAGENET_STD,
    VGG19_CFG,
    VGG19Features,
    load_torchvision_vgg19,
)
from srbh_tpu.losses.sr import perceptual_loss  # noqa: E402


def _build_torch_features():
    layers = []
    in_ch = 3
    for item in VGG19_CFG:
        if item == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, item, 3, 1, 1))
            layers.append(torch.nn.ReLU())
            in_ch = item
    return torch.nn.Sequential(*layers)


def _torch_extract(feats, x):
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    x = (x - mean) / std
    outs = []
    for i, layer in enumerate(feats):
        x = layer(x)
        if i in DEFAULT_FEATURE_LAYERS:
            outs.append(x.clone())
    return outs


def test_vgg19_features_and_perceptual_loss_match_torch():
    torch.manual_seed(0)
    tfeats = _build_torch_features().eval()
    # small weights keep deep-stack activations in a comparable fp range
    for p in tfeats.parameters():
        p.data.mul_(0.3)
    x = torch.rand(1, 3, 64, 64)
    gt = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want = _torch_extract(tfeats, x)
        want_gt = _torch_extract(tfeats, gt)
        want_loss = sum(
            w * torch.nn.functional.l1_loss(a, b)
            for w, a, b in zip([0.1, 0.1, 1.0, 1.0, 1.0], want, want_gt)
        ).item()

    sd = {f"features.{k}": v for k, v in tfeats.state_dict().items()}
    variables = load_torchvision_vgg19(sd)
    m = VGG19Features()
    apply = jax.jit(m.apply)
    got = apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got_gt = apply(variables, jnp.asarray(gt.numpy().transpose(0, 2, 3, 1)))

    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(),
            atol=5e-5, rtol=1e-4)

    got_loss = float(perceptual_loss(got, got_gt))
    assert abs(got_loss - want_loss) < 5e-5
