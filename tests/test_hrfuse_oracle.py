"""Torch numeric oracles for the remaining HRfuse-family blocks.

``HRfuse_residual`` (the main model's head) is already pinned in
tests/test_convert.py; this file pins the rest of SR/HRfuse.py against
independent torch implementations of the documented topologies:

* ``HRfuse``        (:47-66)  fuse(conv-BN-ReLU x2) -> upsample -> conv
* ``HRfuse_x2``     (:69-89)  upsample -> fuse -> conv
* ``HRupsample``    (:193-202) upsample -> conv (no-SR ablation)
* ``GeoNet``        (:205-213) 3 BasicBlocks (lon/lat/alt prior)
* ``Refine_residual`` (:216-228) concat -> 3 BasicBlocks -> conv

All BatchNorms run in eval mode with randomized running statistics so the
running-average math is actually exercised.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.train.convert import convert_basic_block

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)


class _TBasic(torch.nn.Module):
    """torchvision-style BasicBlock (SR/HRfuse.py:115-159)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(out)) + idt)


def _t_upsampler(nf, scale=4):
    mods = []
    s = scale
    while s % 2 == 0:
        mods += [torch.nn.Conv2d(nf, 4 * nf, 3, 1, 1),
                 torch.nn.PixelShuffle(2)]
        s //= 2
    return torch.nn.Sequential(*mods)


# ---- torch -> flax variable-tree helpers -----------------------------------

def _conv_p(c):
    p = {"kernel": c.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if c.bias is not None:
        p["bias"] = c.bias.detach().numpy()
    return p


def _bn_p(bn):
    return ({"scale": bn.weight.detach().numpy(),
             "bias": bn.bias.detach().numpy()},
            {"mean": bn.running_mean.detach().numpy(),
             "var": bn.running_var.detach().numpy()})


def _convbnact_p(conv, bn):
    bp, bs = _bn_p(bn)
    return {"conv": _conv_p(conv), "bn": bp}, {"bn": bs}


def _upsampler_p(seq):
    return {f"conv_{i}": _conv_p(c)
            for i, c in enumerate(m for m in seq
                                  if isinstance(m, torch.nn.Conv2d))}


def _basic_p(blk, prefix="b"):
    sd = {f"{prefix}.{k}": v.detach().numpy() for k, v in blk.state_dict().items()}
    return convert_basic_block(sd, prefix)


def _nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return np.asarray(a, np.float32).transpose(0, 3, 1, 2)


# ---- oracles ---------------------------------------------------------------

class _THRfuse(torch.nn.Module):
    def __init__(self, cin=32, mid=16, out=3, x2=False):
        super().__init__()
        self.x2 = x2
        self.fuse = torch.nn.Sequential(
            torch.nn.Conv2d(cin, mid, 3, 1, 1, bias=False),
            torch.nn.BatchNorm2d(mid), torch.nn.ReLU(),
            torch.nn.Conv2d(mid, mid, 3, 1, 1, bias=False),
            torch.nn.BatchNorm2d(mid), torch.nn.ReLU())
        self.upsampler = _t_upsampler(mid)
        self.conv_last = torch.nn.Conv2d(mid, out, 3, 1, 1)

    def forward(self, x_lr, x_hr):
        if self.x2:  # upsample-then-fuse (SR/HRfuse.py:69-89)
            x = self.fuse(torch.cat([self.upsampler(x_lr), x_hr], 1))
        else:        # fuse-then-upsample (SR/HRfuse.py:47-66)
            x = self.upsampler(self.fuse(torch.cat([x_lr, x_hr], 1)))
        return self.conv_last(x)


@pytest.mark.parametrize("x2", [False, True])
def test_hrfuse_conv_bn_variants_match_torch(x2):
    from srbh_tpu.models.hrfuse import HRFuse, HRFuseX2

    torch.manual_seed(0)
    tm = _THRfuse(x2=x2).eval()
    _randomize_bn(tm)
    if x2:
        x_lr, x_hr = torch.rand(2, 16, 8, 8), torch.rand(2, 16, 32, 32)
    else:
        x_lr, x_hr = torch.rand(2, 16, 8, 8), torch.rand(2, 16, 8, 8)
    with torch.no_grad():
        want = tm(x_lr, x_hr).numpy()

    p0, s0 = _convbnact_p(tm.fuse[0], tm.fuse[1])
    p1, s1 = _convbnact_p(tm.fuse[3], tm.fuse[4])
    variables = {
        "params": {"fuse0": p0, "fuse1": p1,
                   "upsampler": _upsampler_p(tm.upsampler),
                   "conv_last": _conv_p(tm.conv_last)},
        "batch_stats": {"fuse0": s0, "fuse1": s1},
    }
    m = (HRFuseX2 if x2 else HRFuse)(mid_chans=16, out_chans=3, upscale=4)
    got = jax.jit(m.apply)(variables, _nhwc(x_lr), _nhwc(x_hr))
    np.testing.assert_allclose(_nchw(got), want, atol=5e-5)


def test_hrupsample_matches_torch():
    from srbh_tpu.models.hrfuse import HRUpsample

    torch.manual_seed(1)
    ups = _t_upsampler(16).eval()
    conv_last = torch.nn.Conv2d(16, 3, 3, 1, 1).eval()
    x = torch.rand(2, 16, 8, 8)
    with torch.no_grad():
        want = conv_last(ups(x)).numpy()

    variables = {"params": {"upsampler": _upsampler_p(ups),
                            "conv_last": _conv_p(conv_last)}}
    got = jax.jit(HRUpsample(out_chans=3, upscale=4).apply)(
        variables, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, atol=5e-5)


def test_geonet_matches_torch():
    from srbh_tpu.models.hrfuse import GeoNet

    torch.manual_seed(2)
    blocks = [_TBasic(4, 16), _TBasic(16, 16), _TBasic(16, 16)]
    tm = torch.nn.Sequential(*blocks).eval()
    _randomize_bn(tm)
    x = torch.rand(2, 4, 16, 16)
    with torch.no_grad():
        want = tm(x).numpy()

    params, stats = {}, {}
    for i, blk in enumerate(blocks):
        params[f"block{i}"], stats[f"block{i}"] = _basic_p(blk)
    got = jax.jit(GeoNet(mid_chans=16).apply)(
        {"params": params, "batch_stats": stats}, _nhwc(x))
    np.testing.assert_allclose(_nchw(got), want, atol=5e-5)


def test_refine_residual_matches_torch():
    from srbh_tpu.models.hrfuse import RefineResidual

    torch.manual_seed(3)
    blocks = [_TBasic(32, 16), _TBasic(16, 16), _TBasic(16, 16)]
    fuse = torch.nn.Sequential(*blocks).eval()
    conv_last = torch.nn.Conv2d(16, 3, 3, 1, 1).eval()
    _randomize_bn(fuse)
    x_lr, x_hr = torch.rand(2, 16, 16, 16), torch.rand(2, 16, 16, 16)
    with torch.no_grad():
        want = conv_last(fuse(torch.cat([x_lr, x_hr], 1))).numpy()

    params = {"conv_last": _conv_p(conv_last)}
    stats = {}
    for i, blk in enumerate(blocks):
        params[f"fuse{i}"], stats[f"fuse{i}"] = _basic_p(blk)
    got = jax.jit(RefineResidual(mid_chans=16, out_chans=3).apply)(
        {"params": params, "batch_stats": stats}, _nhwc(x_lr), _nhwc(x_hr))
    np.testing.assert_allclose(_nchw(got), want, atol=5e-5)
