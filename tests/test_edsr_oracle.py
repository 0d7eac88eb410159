"""Torch numeric oracle for the EDSR family.

An independent torch implementation of the documented EDSR topology
(SR/edsr.py:105-324 — head conv, res_scale-0.1 residual blocks without BN,
body conv + global skip, pixel-shuffle Upsampler tail) is evaluated with the
same weights via ``convert_edsr`` and must agree numerically on

* the SR image path (``EDSR``),
* the LR body-feature tap (``EDSR_fea``, ``return_features='lr'``),
* the HR pre-tail tap (``EDSR_feaHR``, ``return_features='hr'``),
* upscale 2 (single pixel-shuffle octave in the tail Sequential).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.train import convert

torch = pytest.importorskip("torch")


class _TorchResBlock(torch.nn.Module):
    def __init__(self, nf):
        super().__init__()
        self.body = torch.nn.Sequential(
            torch.nn.Conv2d(nf, nf, 3, 1, 1), torch.nn.ReLU(),
            torch.nn.Conv2d(nf, nf, 3, 1, 1))

    def forward(self, x):
        return x + self.body(x) * 0.1


def _torch_upsampler(nf, scale):
    mods = []
    s = scale
    while s % 2 == 0:
        mods += [torch.nn.Conv2d(nf, 4 * nf, 3, 1, 1),
                 torch.nn.PixelShuffle(2)]
        s //= 2
    assert s == 1
    return torch.nn.Sequential(*mods)


class _TorchEDSR(torch.nn.Module):
    def __init__(self, cin=4, nf=8, nb=2, nout=3, scale=4):
        super().__init__()
        self.head = torch.nn.Sequential(torch.nn.Conv2d(cin, nf, 3, 1, 1))
        self.body = torch.nn.Sequential(
            *[_TorchResBlock(nf) for _ in range(nb)],
            torch.nn.Conv2d(nf, nf, 3, 1, 1))
        self.tail = torch.nn.Sequential(_torch_upsampler(nf, scale),
                                        torch.nn.Conv2d(nf, nout, 3, 1, 1))

    def forward(self, x):
        x = self.head(x)
        res = self.body(x) + x          # LR body features (EDSR_fea tap)
        up = self.tail[0](res)          # HR pre-tail features (EDSR_feaHR tap)
        return self.tail[1](up), res, up


@pytest.mark.parametrize("scale", [4, 2])
def test_edsr_matches_torch(scale):
    from srbh_tpu.models import EDSR

    torch.manual_seed(0)
    tm = _TorchEDSR(nf=8, nb=2, scale=scale).eval()
    x = torch.rand(2, 4, 6, 6)
    with torch.no_grad():
        want_img, want_lr, want_hr = (t.numpy() for t in tm(x))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_edsr(sd, n_resblocks=2)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))

    def run(mode):
        m = EDSR(n_resblocks=2, n_feats=8, up_scale=scale,
                 return_features=mode)
        return jax.jit(m.apply)(variables, xj)

    img = run(None)
    img2, lr = run("lr")
    img3, hr = run("hr")
    for got, want in [(img, want_img), (img2, want_img), (img3, want_img),
                      (lr, want_lr), (hr, want_hr)]:
        np.testing.assert_allclose(
            np.asarray(got, np.float32).transpose(0, 3, 1, 2), want,
            atol=3e-5)
