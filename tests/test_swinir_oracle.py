"""Full-forward torch numeric oracle for SwinIR.

Components (window attention, shift masks) are pinned individually in
tests/test_swinir.py; this file pins the ENTIRE forward — patch norm, RSTB
residual groups with shifted blocks, final norm, conv_after_body residual,
heads, RGB mean/img_range normalisation and the reflect-pad/crop path
(SR/network_swinir.py:618-840) — against an independent torch
implementation of the documented topology, through ``convert_swinir``.

Tiny config: embed 8, depths (2,2), heads (2,2), window 4 (so block 1 of
each group runs the shifted-window mask path).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.train import convert

torch = pytest.importorskip("torch")
F = torch.nn.functional

from srbh_tpu.models.swinir import RGB_MEAN, relative_position_index  # noqa: E402

WS = 4
DIM = 8
HEADS = 2
DEPTHS = (2, 2)
MLP_RATIO = 2.0
NUM_FEAT = 8


class _TWinAttn(torch.nn.Module):
    def __init__(self, dim=DIM, ws=WS, heads=HEADS):
        super().__init__()
        self.heads = heads
        self.ws = ws
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=True)
        self.proj = torch.nn.Linear(dim, dim)
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)

    def forward(self, x, mask=None):  # x: (B_, N, C)
        b_, n, c = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(b_, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (c // h) ** -0.5) @ k.transpose(-2, -1)
        idx = torch.from_numpy(relative_position_index(self.ws)).reshape(-1)
        bias = self.relative_position_bias_table[idx].reshape(n, n, h)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, h, n, n) + mask[:, None]
            attn = attn.view(b_, h, n, n)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(out)


class _TBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(DIM)
        self.attn = _TWinAttn()
        self.norm2 = torch.nn.LayerNorm(DIM)
        self.mlp = torch.nn.ModuleDict({
            "fc1": torch.nn.Linear(DIM, int(DIM * MLP_RATIO)),
            "fc2": torch.nn.Linear(int(DIM * MLP_RATIO), DIM)})

    def forward(self, x, shift):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = WS
        shortcut = x
        x = self.norm1(x)
        mask = None
        if shift:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            from srbh_tpu.models.swinir import shift_attn_mask
            mask = torch.from_numpy(shift_attn_mask(h, w, ws, shift))
        win = x.view(b, h // ws, ws, w // ws, ws, c).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        win = self.attn(win, mask)
        x = win.view(b, h // ws, w // ws, ws, ws, c).permute(
            0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if shift:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = shortcut + x
        y = self.mlp["fc2"](F.gelu(self.mlp["fc1"](self.norm2(x))))
        return x + y


class _TLayer(torch.nn.Module):
    """RSTB with the reference's residual_group.blocks / conv key names."""

    def __init__(self, depth):
        super().__init__()
        self.residual_group = torch.nn.Module()
        self.residual_group.blocks = torch.nn.ModuleList(
            [_TBlock() for _ in range(depth)])
        self.conv = torch.nn.Conv2d(DIM, DIM, 3, 1, 1)

    def forward(self, x):  # NHWC
        res = x
        for i, blk in enumerate(self.residual_group.blocks):
            x = blk(x, 0 if i % 2 == 0 else WS // 2)
        x = self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        return x + res


class _TSwinIR(torch.nn.Module):
    def __init__(self, upsampler="pixelshuffle", upscale=2):
        super().__init__()
        self.upsampler_kind = upsampler
        self.upscale = upscale
        self.conv_first = torch.nn.Conv2d(3, DIM, 3, 1, 1)
        self.patch_embed = torch.nn.Module()
        self.patch_embed.norm = torch.nn.LayerNorm(DIM)
        self.layers = torch.nn.ModuleList([_TLayer(d) for d in DEPTHS])
        self.norm = torch.nn.LayerNorm(DIM)
        self.conv_after_body = torch.nn.Conv2d(DIM, DIM, 3, 1, 1)
        if upsampler == "pixelshuffle":
            self.conv_before_upsample = torch.nn.Sequential(
                torch.nn.Conv2d(DIM, NUM_FEAT, 3, 1, 1))
            self.upsample = torch.nn.Sequential(
                torch.nn.Conv2d(NUM_FEAT, 4 * NUM_FEAT, 3, 1, 1),
                torch.nn.PixelShuffle(2))
            self.conv_last = torch.nn.Conv2d(NUM_FEAT, 3, 3, 1, 1)
        else:  # denoise / CAR residual head
            self.conv_last = torch.nn.Conv2d(DIM, 3, 3, 1, 1)

    def forward(self, x):  # NCHW in [0, 1]
        h_in, w_in = x.shape[2:]
        pad_h = (WS - h_in % WS) % WS
        pad_w = (WS - w_in % WS) % WS
        if pad_h or pad_w:
            x = F.pad(x, (0, pad_w, 0, pad_h), mode="reflect")
        mean = torch.tensor(RGB_MEAN).view(1, 3, 1, 1)
        x = x - mean
        feat = self.conv_first(x)
        f = self.patch_embed.norm(feat.permute(0, 2, 3, 1))
        for layer in self.layers:
            f = layer(f)
        f = self.norm(f)
        body = self.conv_after_body(f.permute(0, 3, 1, 2)) + feat
        if self.upsampler_kind == "pixelshuffle":
            y = F.leaky_relu(self.conv_before_upsample[0](body), 0.01)
            y = self.upsample(y)
            out = self.conv_last(y)
        else:
            out = x + self.conv_last(body)
        out = out + mean
        return out[:, :, : h_in * self.upscale, : w_in * self.upscale]


def _run_pair(upsampler, upscale, size):
    from srbh_tpu.models import SwinIR

    torch.manual_seed(0)
    tm = _TSwinIR(upsampler, upscale).eval()
    x = torch.rand(2, 3, *size)
    with torch.no_grad():
        want = tm(x).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_swinir(sd, depths=DEPTHS, upsampler=upsampler)
    m = SwinIR(embed_dim=DIM, depths=DEPTHS, num_heads=(HEADS,) * 2,
               window_size=WS, mlp_ratio=MLP_RATIO, upscale=upscale,
               upsampler=upsampler, num_feat=NUM_FEAT, drop_path_rate=0.0)
    got = jax.jit(m.apply)(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    return np.asarray(got, np.float32).transpose(0, 3, 1, 2), want


def test_swinir_pixelshuffle_head_matches_torch():
    # float-ulp agreement once LayerNorm eps matches torch's 1e-5
    got, want = _run_pair("pixelshuffle", 2, (8, 8))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_swinir_denoise_head_and_reflect_pad_matches_torch():
    # 10x6 forces reflect-pad to 12x8 and the crop-back path
    got, want = _run_pair("", 1, (10, 6))
    np.testing.assert_allclose(got, want, atol=1e-5)
