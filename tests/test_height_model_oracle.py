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


# ---------------------------------------------------------------------------
# Variant compositions: geo / refine / nosuper (mymodels.py:341-650)
# ---------------------------------------------------------------------------

def _convert_decoder(sd, dname):
    from srbh_tpu.train.convert import _bn, _conv

    dp, ds = {}, {}
    for bi in range(5):
        blk_p, blk_s = {}, {}
        for ci in (1, 2):
            cname = f"conv{ci}"
            blk_p[cname] = {"conv": _conv(sd, f"{dname}.blocks.{bi}.{cname}.0")}
            bp, bs = _bn(sd, f"{dname}.blocks.{bi}.{cname}.1")
            blk_p[cname]["bn"] = bp
            blk_s[cname] = {"bn": bs}
        dp[f"block{bi}"], ds[f"block{bi}"] = blk_p, blk_s
    return dp, ds


class _TorchHRUpsample(tnn.Module):
    """HRupsample head (SR/HRfuse.py:193-202): x4 pixel-shuffle + 3x3."""

    def __init__(self, n_feats, out_ch):
        super().__init__()
        self.upsampler = tnn.Sequential(
            tnn.Conv2d(n_feats, 4 * n_feats, 3, padding=1), tnn.PixelShuffle(2),
            tnn.Conv2d(n_feats, 4 * n_feats, 3, padding=1), tnn.PixelShuffle(2))
        self.conv_last = tnn.Conv2d(n_feats, out_ch, 3, padding=1)

    def forward(self, x):
        return self.conv_last(self.upsampler(x))


class TestVariantCompositionOracles:
    """Numeric composition pins for the ablation/prior/refine variants.
    Param trees are hand-assembled from the torch state dicts (the shipped
    converter targets the flagship only; the reference never trained the
    variants to checkpoints)."""

    def _encoder_and_decoders(self, sd, enc):
        params, stats = {}, {}
        params["encoder"], stats["encoder"] = convert._convert_encoder(
            sd, "encoder.", enc)
        for dname in ("decoder1", "decoder2"):
            params[dname], stats[dname] = _convert_decoder(sd, dname)
        return params, stats

    def test_geo_variant_matches_torch(self):
        from srbh_tpu.models import SRRegressClsFeatureGeo
        from srbh_tpu.train.convert import _conv, convert_basic_block, \
            convert_hrfuse_residual

        torch.manual_seed(9)
        enc, dec_ch, gm, sm = "efficientnet-test", (32, 24, 16, 12, 8), 4, 8
        mid = dec_ch[-1]

        tm = tnn.Module()
        tm.encoder = _TorchEncoder(enc, 8)
        width, _, _ = SCALING[enc]
        stages = [round_filters(c, width) for _, _, _, c, _ in _B0_STAGES]
        enc_ch = [8, round_filters(32, width),
                  stages[1], stages[2], stages[4], stages[6]]
        tm.decoder1 = _TorchDecoder(enc_ch, dec_ch)
        tm.decoder2 = _TorchDecoder(enc_ch, dec_ch)
        tm.hrfeat = tnn.Sequential(_torch_basic_block(8, sm),
                                   _torch_basic_block(sm, sm),
                                   _torch_basic_block(sm, sm))
        tm.geoprior = tnn.Sequential(_torch_basic_block(3, gm),
                                     _torch_basic_block(gm, gm),
                                     _torch_basic_block(gm, gm))
        tm.reg = _TorchHRFuseResidual(mid + gm, sm, mid, 1)
        tm.seg = _TorchHRFuseResidual(mid + gm, sm, mid, 7)
        tm.aggre_height = tnn.Conv2d(mid + gm, 1, 3, padding=1)
        tm.eval()

        rng = np.random.default_rng(13)
        x_np = rng.normal(size=(1, 32, 32, 11)).astype(np.float32)  # 8+3 geo
        fea_np = rng.normal(size=(1, 128, 128, 8)).astype(np.float32)

        with torch.no_grad():
            xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
            ft = torch.from_numpy(fea_np.transpose(0, 3, 1, 2))
            geo = xt[:, 8:]
            for blk in tm.geoprior:
                geo = _run_basic_block(blk, geo)
            feats = tm.encoder(xt[:, :8])
            hr = ft
            for blk in tm.hrfeat:
                hr = _run_basic_block(blk, hr)
            hf = torch.cat([tm.decoder1(feats), geo], dim=1)
            height = tm.reg(hf, hr)
            bf = torch.cat([tm.decoder2(feats), geo], dim=1)
            build = tm.seg(bf, hr)
            aggre = tm.aggre_height(hf)
        want = [t.numpy().transpose(0, 2, 3, 1) for t in (height, build, aggre)]

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params, stats = self._encoder_and_decoders(sd, enc)
        hp, hs = {}, {}
        for i in range(3):
            hp[f"block{i}"], hs[f"block{i}"] = convert_basic_block(
                sd, f"hrfeat.{i}")
        params["hrfeat"], stats["hrfeat"] = hp, hs
        gp, gs = {}, {}
        for i in range(3):
            gp[f"block{i}"], gs[f"block{i}"] = convert_basic_block(
                sd, f"geoprior.{i}")
        params["geoprior"], stats["geoprior"] = gp, gs
        for head in ("reg", "seg"):
            params[head], stats[head] = convert_hrfuse_residual(sd, head)
        params["aggre_height"] = _conv(sd, "aggre_height")

        m = SRRegressClsFeatureGeo(encoder_name=enc, in_chans=8, super_mid=sm,
                                   geo_mid=gm, isaggre=True, chans_build=7,
                                   decoder_channels=dec_ch)
        h, b, a = jax.jit(lambda v, p, q: m.apply(v, p, q, train=False))(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x_np), jnp.asarray(fea_np))
        np.testing.assert_allclose(np.asarray(h), want[0], atol=5e-4)
        np.testing.assert_allclose(np.asarray(b), want[1], atol=5e-4)
        np.testing.assert_allclose(np.asarray(a), want[2], atol=5e-4)

    def test_refine_variant_matches_torch(self):
        from srbh_tpu.models import SRRegressClsFeatureRefine
        from srbh_tpu.train.convert import _conv, convert_basic_block, \
            convert_hrfuse_residual

        torch.manual_seed(10)
        enc, dec_ch, sm = "efficientnet-test", (32, 24, 16, 12, 8), 8
        mid = dec_ch[-1]

        tm = tnn.Module()
        tm.encoder = _TorchEncoder(enc, 8)
        width, _, _ = SCALING[enc]
        stages = [round_filters(c, width) for _, _, _, c, _ in _B0_STAGES]
        enc_ch = [8, round_filters(32, width),
                  stages[1], stages[2], stages[4], stages[6]]
        tm.decoder1 = _TorchDecoder(enc_ch, dec_ch)
        tm.decoder2 = _TorchDecoder(enc_ch, dec_ch)
        tm.hrfeat = tnn.Sequential(_torch_basic_block(8, sm),
                                   _torch_basic_block(sm, sm),
                                   _torch_basic_block(sm, sm))
        tm.reg = _TorchHRFuseResidual(mid, sm, mid, 1)
        tm.seg = _TorchHRFuseResidual(mid, sm, mid, 7)
        tm.refine = tnn.Module()
        tm.refine.fuse = tnn.Sequential(_torch_basic_block(1 + 7 + sm, 8),
                                        _torch_basic_block(8, 8),
                                        _torch_basic_block(8, 8))
        tm.refine.conv_last = tnn.Conv2d(8, 1, 3, padding=1)
        tm.eval()

        rng = np.random.default_rng(17)
        x_np = rng.normal(size=(1, 32, 32, 8)).astype(np.float32)
        fea_np = rng.normal(size=(1, 128, 128, 8)).astype(np.float32)

        with torch.no_grad():
            xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
            ft = torch.from_numpy(fea_np.transpose(0, 3, 1, 2))
            feats = tm.encoder(xt)
            hr = ft
            for blk in tm.hrfeat:
                hr = _run_basic_block(blk, hr)
            hf = tm.decoder1(feats)
            height = tm.reg(hf, hr)
            build = tm.seg(tm.decoder2(feats), hr)
            rf = torch.cat([torch.cat([height, build], dim=1), hr], dim=1)
            for blk in tm.refine.fuse:
                rf = _run_basic_block(blk, rf)
            refined = tm.refine.conv_last(rf)
        want = [t.numpy().transpose(0, 2, 3, 1)
                for t in (height, build, refined)]

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params, stats = self._encoder_and_decoders(sd, enc)
        hp, hs = {}, {}
        for i in range(3):
            hp[f"block{i}"], hs[f"block{i}"] = convert_basic_block(
                sd, f"hrfeat.{i}")
        params["hrfeat"], stats["hrfeat"] = hp, hs
        for head in ("reg", "seg"):
            params[head], stats[head] = convert_hrfuse_residual(sd, head)
        rp, rs = {}, {}
        for i in range(3):
            rp[f"fuse{i}"], rs[f"fuse{i}"] = convert_basic_block(
                sd, f"refine.fuse.{i}")
        rp["conv_last"] = _conv(sd, "refine.conv_last")
        params["refine"], stats["refine"] = rp, rs

        m = SRRegressClsFeatureRefine(encoder_name=enc, super_mid=sm,
                                      chans_build=7, decoder_channels=dec_ch)
        h, b, r = jax.jit(lambda v, p, q: m.apply(v, p, q, train=False))(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x_np), jnp.asarray(fea_np))
        np.testing.assert_allclose(np.asarray(h), want[0], atol=5e-4)
        np.testing.assert_allclose(np.asarray(b), want[1], atol=5e-4)
        np.testing.assert_allclose(np.asarray(r), want[2], atol=5e-4)

    def test_nosuper_variant_matches_torch(self):
        from srbh_tpu.models import SRRegressClsNosuper
        from srbh_tpu.train.convert import _conv

        torch.manual_seed(11)
        enc, dec_ch = "efficientnet-test", (32, 24, 16, 12, 8)
        mid = dec_ch[-1]

        tm = tnn.Module()
        tm.encoder = _TorchEncoder(enc, 8)
        width, _, _ = SCALING[enc]
        stages = [round_filters(c, width) for _, _, _, c, _ in _B0_STAGES]
        enc_ch = [8, round_filters(32, width),
                  stages[1], stages[2], stages[4], stages[6]]
        tm.decoder1 = _TorchDecoder(enc_ch, dec_ch)
        tm.decoder2 = _TorchDecoder(enc_ch, dec_ch)
        tm.reg = _TorchHRUpsample(mid, 1)
        tm.seg = _TorchHRUpsample(mid, 7)
        tm.aggre_height = tnn.Conv2d(mid, 1, 3, padding=1)
        tm.eval()

        rng = np.random.default_rng(19)
        x_np = rng.normal(size=(1, 32, 32, 8)).astype(np.float32)
        with torch.no_grad():
            xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
            feats = tm.encoder(xt)
            hf = tm.decoder1(feats)
            height = tm.reg(hf)
            build = tm.seg(tm.decoder2(feats))
            aggre = tm.aggre_height(hf)
        want = [t.numpy().transpose(0, 2, 3, 1) for t in (height, build, aggre)]

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params, stats = self._encoder_and_decoders(sd, enc)
        for head in ("reg", "seg"):
            params[head] = {
                "upsampler": {"conv_0": _conv(sd, f"{head}.upsampler.0"),
                              "conv_1": _conv(sd, f"{head}.upsampler.2")},
                "conv_last": _conv(sd, f"{head}.conv_last"),
            }
        params["aggre_height"] = _conv(sd, "aggre_height")

        m = SRRegressClsNosuper(encoder_name=enc, isaggre=True, chans_build=7,
                                decoder_channels=dec_ch)
        h, b, a = jax.jit(lambda v, p: m.apply(v, p, train=False))(
            {"params": params, "batch_stats": stats}, jnp.asarray(x_np))
        np.testing.assert_allclose(np.asarray(h), want[0], atol=5e-4)
        np.testing.assert_allclose(np.asarray(b), want[1], atol=5e-4)
        np.testing.assert_allclose(np.asarray(a), want[2], atol=5e-4)
