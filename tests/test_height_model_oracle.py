"""Full-composition torch oracle for the flagship height model.

Each stage of SRRegressClsFeature already has its own numeric torch oracle
(MBConv / UnetDecoder / HRfuse-family / BasicBlock in test_convert.py and
test_hrfuse_oracle.py).  This test pins the LAST remaining level: the whole
model composition (mymodels.py:233-293) AND convert_height_model's key map,
by assembling an in-test torch replica of the reference topology —
efficientnet-pytorch-named encoder, two smp UnetDecoders, HRfeature adapter,
two HRfuse_residual heads, aggre conv — at the `efficientnet-test` scale,
converting its state_dict, and requiring the jitted Flax forward to match
all three outputs numerically.

The torch side is written from the reference's documented topology
(SURVEY.md §2 #4, mymodels.py:233-337; efficientnet-pytorch MBConvBlock;
smp DecoderBlock; SR/HRfuse.py:164-190) — no reference code is copied.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from srbh_tpu.models import SRRegressClsFeature  # noqa: E402
from srbh_tpu.models.efficientnet import (  # noqa: E402
    _B0_STAGES,
    SCALING,
    round_filters,
    round_repeats,
)
from srbh_tpu.train import convert  # noqa: E402


def _tf_same_pad(x, k, s):
    """TF 'SAME' padding (asymmetric for even overhang), as
    efficientnet-pytorch's Conv2dStaticSamePadding applies."""
    ih, iw = x.shape[-2:]
    pad_h = max((-ih) % s + k - s, 0) if ih % s == 0 else max(k - ih % s, 0)
    pad_w = max((-iw) % s + k - s, 0) if iw % s == 0 else max(k - iw % s, 0)
    return F.pad(x, [pad_w // 2, pad_w - pad_w // 2,
                     pad_h // 2, pad_h - pad_h // 2])


def _randomize_bn(m):
    m.running_mean.normal_(0, 0.3)
    m.running_var.uniform_(0.5, 2.0)
    m.weight.data.normal_(1, 0.2)
    m.bias.data.normal_(0, 0.2)
    m.eval()


class _TorchMBConv(tnn.Module):
    """efficientnet-pytorch MBConvBlock with its parameter naming."""

    def __init__(self, in_ch, out_ch, expand, k, stride):
        super().__init__()
        self.in_ch, self.out_ch = in_ch, out_ch
        self.expand, self.k, self.stride = expand, k, stride
        mid = in_ch * expand
        if expand != 1:
            self._expand_conv = tnn.Conv2d(in_ch, mid, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(mid, eps=1e-3)
        self._depthwise_conv = tnn.Conv2d(mid, mid, k, stride=stride,
                                          groups=mid, bias=False)
        self._bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        se_ch = max(1, int(in_ch * 0.25))
        self._se_reduce = tnn.Conv2d(mid, se_ch, 1)
        self._se_expand = tnn.Conv2d(se_ch, mid, 1)
        self._project_conv = tnn.Conv2d(mid, out_ch, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(out_ch, eps=1e-3)
        for m in self.modules():
            if isinstance(m, tnn.BatchNorm2d):
                _randomize_bn(m)

    def forward(self, x):
        h = x
        if self.expand != 1:
            h = F.silu(self._bn0(self._expand_conv(h)))
        h = _tf_same_pad(h, self.k, self.stride)
        h = F.silu(self._bn1(self._depthwise_conv(h)))
        s = h.mean((2, 3), keepdim=True)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        h = h * torch.sigmoid(s)
        h = self._bn2(self._project_conv(h))
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x  # drop-connect disabled in eval
        return h


class _TorchEncoder(tnn.Module):
    """efficientnet-pytorch-named encoder trunk with smp's feature taps."""

    def __init__(self, name, in_ch):
        super().__init__()
        width, depth, _ = SCALING[name]
        stem = round_filters(32, width)
        self._conv_stem = tnn.Conv2d(in_ch, stem, 3, stride=2, bias=False)
        self._bn0 = tnn.BatchNorm2d(stem, eps=1e-3)
        _randomize_bn(self._bn0)
        self._blocks = tnn.ModuleList()
        self.stage_last = []  # index of each stage's last block
        ch = stem
        for si, (expand, k, stride, base_c, base_r) in enumerate(_B0_STAGES, 1):
            out_ch = round_filters(base_c, width)
            for bi in range(round_repeats(base_r, depth)):
                self._blocks.append(_TorchMBConv(
                    ch, out_ch, expand, k, stride if bi == 0 else 1))
                ch = out_ch
            self.stage_last.append(len(self._blocks) - 1)

    def forward(self, x):
        feats = [x]
        h = F.silu(self._bn0(self._conv_stem(_tf_same_pad(x, 3, 2))))
        feats.append(h)
        taps = {self.stage_last[si - 1] for si in (2, 3, 5, 7)}
        for i, blk in enumerate(self._blocks):
            h = blk(h)
            if i in taps:
                feats.append(h)
        return feats


class _TorchDecoder(tnn.Module):
    """smp UnetDecoder: per block nearest-x2 -> concat skip -> 2x
    (Conv3x3 no-bias + BN eps 1e-5 + ReLU); smp param naming."""

    def __init__(self, enc_ch, dec_ch):
        super().__init__()
        self.blocks = tnn.ModuleList()
        in_ch = enc_ch[-1]
        skips = list(enc_ch[1:-1][::-1]) + [0]
        for och, sch in zip(dec_ch, skips):
            blk = tnn.Module()
            blk.conv1 = tnn.Sequential(
                tnn.Conv2d(in_ch + sch, och, 3, padding=1, bias=False),
                tnn.BatchNorm2d(och, eps=1e-5))
            blk.conv2 = tnn.Sequential(
                tnn.Conv2d(och, och, 3, padding=1, bias=False),
                tnn.BatchNorm2d(och, eps=1e-5))
            _randomize_bn(blk.conv1[1])
            _randomize_bn(blk.conv2[1])
            self.blocks.append(blk)
            in_ch = och

    def forward(self, feats):
        x = feats[-1]
        skips = feats[1:-1][::-1]
        for i, blk in enumerate(self.blocks):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i < len(skips):
                x = torch.cat([x, skips[i]], dim=1)
            x = F.relu(blk.conv1[1](blk.conv1[0](x)))
            x = F.relu(blk.conv2[1](blk.conv2[0](x)))
        return x


def _torch_basic_block(inp, planes):
    blk = tnn.Module()
    blk.conv1 = tnn.Conv2d(inp, planes, 3, padding=1, bias=False)
    blk.bn1 = tnn.BatchNorm2d(planes)
    blk.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
    blk.bn2 = tnn.BatchNorm2d(planes)
    if inp != planes:
        blk.downsample = tnn.Sequential(tnn.Conv2d(inp, planes, 1, bias=False),
                                        tnn.BatchNorm2d(planes))
    else:
        blk.downsample = None
    for m in blk.modules():
        if isinstance(m, tnn.BatchNorm2d):
            _randomize_bn(m)
    return blk


def _run_basic_block(blk, x):
    idn = x if blk.downsample is None else blk.downsample(x)
    out = F.relu(blk.bn1(blk.conv1(x)))
    out = blk.bn2(blk.conv2(out))
    return F.relu(out + idn)


class _TorchHRFuseResidual(tnn.Module):
    def __init__(self, lr_ch, hr_ch, mid, out_ch, upscale=4):
        super().__init__()
        layers = []
        for _ in range(upscale // 2):
            layers += [tnn.Conv2d(lr_ch, 4 * lr_ch, 3, padding=1),
                       tnn.PixelShuffle(2)]
        self.upsampler = tnn.Sequential(*layers)
        self.fuse = tnn.Sequential(_torch_basic_block(lr_ch + hr_ch, mid),
                                   _torch_basic_block(mid, mid),
                                   _torch_basic_block(mid, mid))
        self.conv_last = tnn.Conv2d(mid, out_ch, 3, padding=1)

    def forward(self, x_lr, x_hr):
        h = torch.cat([self.upsampler(x_lr), x_hr], dim=1)
        for blk in self.fuse:
            h = _run_basic_block(blk, h)
        return self.conv_last(h)


class _TorchHeightModel(tnn.Module):
    """Reference SRRegress_Cls_feature topology with converter-compatible
    state_dict naming (mymodels.py:233-293)."""

    def __init__(self, encoder_name, in_ch, super_ch, super_mid, dec_ch,
                 chans_build):
        super().__init__()
        self.encoder = _TorchEncoder(encoder_name, in_ch)
        width, _, _ = SCALING[encoder_name]
        stages = [round_filters(c, width) for _, _, _, c, _ in _B0_STAGES]
        enc_ch = [in_ch, round_filters(32, width),
                  stages[1], stages[2], stages[4], stages[6]]
        self.decoder1 = _TorchDecoder(enc_ch, dec_ch)
        self.decoder2 = _TorchDecoder(enc_ch, dec_ch)
        self.hrfeat = tnn.Sequential(
            _torch_basic_block(super_ch, super_mid),
            _torch_basic_block(super_mid, super_mid),
            _torch_basic_block(super_mid, super_mid))
        mid = dec_ch[-1]
        self.reg = _TorchHRFuseResidual(mid, super_mid, mid, 1)
        self.seg = _TorchHRFuseResidual(mid, super_mid, mid, chans_build)
        self.aggre_height = tnn.Conv2d(mid, 1, 3, padding=1)

    def forward(self, x, super_fea):
        feats = self.encoder(x)
        hr = super_fea
        for blk in self.hrfeat:
            hr = _run_basic_block(blk, hr)
        height_fea = self.decoder1(feats)
        height = self.reg(height_fea, hr)
        build = self.seg(self.decoder2(feats), hr)
        aggre = self.aggre_height(height_fea)
        return height, build, aggre


class TestHeightModelFullOracle:
    def test_full_forward_matches_torch(self):
        torch.manual_seed(7)
        enc = "efficientnet-test"
        dec_ch = (32, 24, 16, 12, 8)
        tm = _TorchHeightModel(enc, in_ch=8, super_ch=8, super_mid=8,
                               dec_ch=dec_ch, chans_build=7)
        tm.eval()

        rng = np.random.default_rng(11)
        x_np = rng.normal(size=(2, 32, 32, 8)).astype(np.float32)
        fea_np = rng.normal(size=(2, 128, 128, 8)).astype(np.float32)
        with torch.no_grad():
            h_t, b_t, a_t = tm(
                torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
                torch.from_numpy(fea_np.transpose(0, 3, 1, 2)))
        want = [t.numpy().transpose(0, 2, 3, 1) for t in (h_t, b_t, a_t)]

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        variables = convert.convert_height_model(sd, isaggre=True,
                                                 encoder_name=enc)

        m = SRRegressClsFeature(encoder_name=enc, super_mid=8, isaggre=True,
                                chans_build=7, decoder_channels=dec_ch)
        height, build, aggre = jax.jit(
            lambda v, a, b: m.apply(v, a, b, train=False)
        )(variables, jnp.asarray(x_np), jnp.asarray(fea_np))

        assert height.shape == want[0].shape == (2, 128, 128, 1)
        assert build.shape == want[1].shape == (2, 128, 128, 7)
        assert aggre.shape == want[2].shape == (2, 32, 32, 1)
        np.testing.assert_allclose(np.asarray(height), want[0], atol=5e-4)
        np.testing.assert_allclose(np.asarray(build), want[1], atol=5e-4)
        np.testing.assert_allclose(np.asarray(aggre), want[2], atol=5e-4)
