"""Torch numeric oracle for RRDBNet — the flagship frozen SR trunk.

The converter roundtrip (tests/test_convert.py:test_rrdbnet_roundtrip) pins
the parameter mapping; this file pins the *math*: an independent torch
implementation of the documented topology (SR/rrdbnet_arch.py:113-240 —
5-conv dense blocks with LeakyReLU 0.2 and 0.2-scaled residuals, residual-in
-residual stacking, trunk skip, two nearest-x2 + conv stages) is evaluated
with the same weights via ``convert_rrdbnet`` and must agree numerically on

* the SR image path (``__call__``),
* the height model's feature path (``features_only=True`` — pre-``conv_last``,
  NO trailing LeakyReLU, SR/rrdbnet_arch.py:225-240),
* the scale-2 variant's pixel-unshuffle input packing
  (SR/rrdbnet_arch.py:208-213),
* both the literal and the regrouped (``fused=True``) compute modes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.train import convert

torch = pytest.importorskip("torch")
F = torch.nn.functional


class _TorchDenseBlock(torch.nn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        for i in range(1, 6):
            cin = nf + (i - 1) * gc
            cout = gc if i < 5 else nf
            setattr(self, f"conv{i}", torch.nn.Conv2d(cin, cout, 3, 1, 1))

    def forward(self, x):
        feats = [x]
        for i in range(1, 5):
            y = F.leaky_relu(getattr(self, f"conv{i}")(torch.cat(feats, 1)),
                             0.2)
            feats.append(y)
        return self.conv5(torch.cat(feats, 1)) * 0.2 + x


class _TorchRRDB(torch.nn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        self.rdb1 = _TorchDenseBlock(nf, gc)
        self.rdb2 = _TorchDenseBlock(nf, gc)
        self.rdb3 = _TorchDenseBlock(nf, gc)

    def forward(self, x):
        return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x


class _TorchRRDBNet(torch.nn.Module):
    def __init__(self, cin=3, cout=3, nf=8, nb=2, gc=8, scale=4):
        super().__init__()
        self.scale = scale
        eff_in = cin * (4 // scale) ** 2 if scale < 4 else cin
        self.conv_first = torch.nn.Conv2d(eff_in, nf, 3, 1, 1)
        self.body = torch.nn.ModuleList(
            [_TorchRRDB(nf, gc) for _ in range(nb)])
        self.conv_body = torch.nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_up1 = torch.nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_up2 = torch.nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_hr = torch.nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_last = torch.nn.Conv2d(nf, cout, 3, 1, 1)

    def features(self, x):
        if self.scale < 4:
            x = F.pixel_unshuffle(x, 4 // self.scale)
        feat = self.conv_first(x)
        body = feat
        for blk in self.body:
            body = blk(body)
        feat = feat + self.conv_body(body)
        feat = F.leaky_relu(
            self.conv_up1(F.interpolate(feat, scale_factor=2, mode="nearest")),
            0.2)
        feat = F.leaky_relu(
            self.conv_up2(F.interpolate(feat, scale_factor=2, mode="nearest")),
            0.2)
        return self.conv_hr(feat)

    def forward(self, x):
        return self.conv_last(F.leaky_relu(self.features(x), 0.2))


def _state_dict_numpy(tm):
    return {k: v.detach().numpy() for k, v in tm.state_dict().items()}


def _nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return np.asarray(a, np.float32).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("fused", [False, True])
def test_rrdbnet_forward_matches_torch(fused):
    from srbh_tpu.models import RRDBNet

    torch.manual_seed(0)
    tm = _TorchRRDBNet(nf=8, nb=2, gc=8).eval()
    x = torch.rand(2, 3, 8, 8)
    with torch.no_grad():
        want_img = tm(x).numpy()
        want_fea = tm.features(x).numpy()

    variables = convert.convert_rrdbnet(_state_dict_numpy(tm), num_block=2)
    m = RRDBNet(num_block=2, num_feat=8, num_grow_ch=8, fused=fused)
    apply = jax.jit(m.apply, static_argnames="features_only")
    got_img = apply(variables, _nhwc(x))
    got_fea = apply(variables, _nhwc(x), features_only=True)
    np.testing.assert_allclose(_nchw(got_img), want_img, atol=3e-5)
    np.testing.assert_allclose(_nchw(got_fea), want_fea, atol=3e-5)


class _TorchRRDBSimpleBlock(torch.nn.Module):
    """RRDB with the old generator's RDB1/RDB2/RDB3 naming
    (SR/RRDBNet.py:37-50)."""

    def __init__(self, nf, gc):
        super().__init__()
        self.RDB1 = _TorchDenseBlock(nf, gc)
        self.RDB2 = _TorchDenseBlock(nf, gc)
        self.RDB3 = _TorchDenseBlock(nf, gc)

    def forward(self, x):
        return self.RDB3(self.RDB2(self.RDB1(x))) * 0.2 + x


class _TorchRRDBNetSimple(torch.nn.Module):
    """Old 4-channel generator topology (SR/RRDBNet.py:53-78): no
    pixel-unshuffle, trunk_conv/upconv/HRconv naming, activated HR conv."""

    def __init__(self, cin=4, cout=3, nf=8, nb=2, gc=8):
        super().__init__()
        self.conv_first = torch.nn.Conv2d(cin, nf, 3, 1, 1)
        self.RRDB_trunk = torch.nn.Sequential(
            *[_TorchRRDBSimpleBlock(nf, gc) for _ in range(nb)])
        self.trunk_conv = torch.nn.Conv2d(nf, nf, 3, 1, 1)
        self.upconv1 = torch.nn.Conv2d(nf, nf, 3, 1, 1)
        self.upconv2 = torch.nn.Conv2d(nf, nf, 3, 1, 1)
        self.HRconv = torch.nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_last = torch.nn.Conv2d(nf, cout, 3, 1, 1)

    def forward(self, x):
        feat = self.conv_first(x)
        feat = feat + self.trunk_conv(self.RRDB_trunk(feat))
        for conv in (self.upconv1, self.upconv2):
            feat = F.leaky_relu(
                conv(F.interpolate(feat, scale_factor=2, mode="nearest")),
                0.2)
        return self.conv_last(F.leaky_relu(self.HRconv(feat), 0.2))


def test_rrdbnet_simple_matches_torch():
    from srbh_tpu.models import RRDBNetSimple

    torch.manual_seed(2)
    tm = _TorchRRDBNetSimple(nf=8, nb=2, gc=8).eval()
    x = torch.rand(2, 4, 8, 8)
    with torch.no_grad():
        want = tm(x).numpy()

    variables = convert.convert_rrdbnet_simple(_state_dict_numpy(tm),
                                               num_block=2)
    m = RRDBNetSimple(num_block=2, num_feat=8, num_grow_ch=8)
    got = jax.jit(m.apply)(variables, _nhwc(x))
    assert got.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(_nchw(got), want, atol=3e-5)


def test_rrdbnet_scale2_pixel_unshuffle_matches_torch():
    from srbh_tpu.models import RRDBNet

    torch.manual_seed(1)
    tm = _TorchRRDBNet(nf=8, nb=1, gc=8, scale=2).eval()
    x = torch.rand(1, 3, 8, 8)
    with torch.no_grad():
        want = tm(x).numpy()

    variables = convert.convert_rrdbnet(_state_dict_numpy(tm), num_block=1)
    m = RRDBNet(num_block=1, num_feat=8, num_grow_ch=8, scale=2)
    got = jax.jit(m.apply)(variables, _nhwc(x))
    assert got.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(_nchw(got), want, atol=3e-5)
