"""Full-step torch oracle for the fused Real-ESRGAN GAN trainer.

The last composition without a numeric pin: one complete
``RealESRGANTrainer`` step (USM-sharpened GT, G forward, L1 + VGG perceptual
+ 0.1x vanilla GAN, frozen-D G update, two-forward D update with SN power
iteration, twin Adam, EMA) is compared against an in-test torch replica of
the reference's ``optimize_parameters`` (SR/rrdbnet_arch.py:524-592) built
from the same converted weights.

Semantics note (documented divergence): during the G step the reference
keeps net_d in train mode, so torch's spectral norm advances one extra
power iteration there; this framework applies D with ``train=False`` in the
G step (no state mutation inside a grad trace). The torch replica mirrors
the framework (net_d.eval() for the G forward); the SN state is warmed to
convergence first so the residual effect is << test tolerance either way.

Adam's first-step update is ~lr*sign(grad); elements whose true gradient is
at float-noise scale can flip sign between frameworks, so parameter
comparisons bound the *fraction* of mismatching elements instead of using a
uniform allclose.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import cv2  # noqa: E402
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from srbh_tpu.models.vgg import VGG19_CFG, load_torchvision_vgg19  # noqa: E402
from srbh_tpu.train import convert  # noqa: E402
from srbh_tpu.train.sr_trainer import RealESRGANTrainer  # noqa: E402

NF, GC, NB, DNF = 8, 4, 1, 8
LR = 1e-4


# ---------------------------------------------------------------- torch twins
class _TRDB(tnn.Module):
    def __init__(self):
        super().__init__()
        for c in range(1, 6):
            i = NF + (c - 1) * GC
            o = GC if c < 5 else NF
            setattr(self, f"conv{c}", tnn.Conv2d(i, o, 3, 1, 1))

    def forward(self, x):
        feats = [x]
        for c in range(1, 5):
            feats.append(F.leaky_relu(
                getattr(self, f"conv{c}")(torch.cat(feats, 1)), 0.2))
        return self.conv5(torch.cat(feats, 1)) * 0.2 + x


class _TRRDB(tnn.Module):
    def __init__(self):
        super().__init__()
        self.rdb1, self.rdb2, self.rdb3 = _TRDB(), _TRDB(), _TRDB()

    def forward(self, x):
        return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x


class _TG(tnn.Module):
    """Reference RRDBNet topology + naming (SR/rrdbnet_arch.py:170-240)."""

    def __init__(self):
        super().__init__()
        self.conv_first = tnn.Conv2d(3, NF, 3, 1, 1)
        self.body = tnn.ModuleList([_TRRDB() for _ in range(NB)])
        self.conv_body = tnn.Conv2d(NF, NF, 3, 1, 1)
        self.conv_up1 = tnn.Conv2d(NF, NF, 3, 1, 1)
        self.conv_up2 = tnn.Conv2d(NF, NF, 3, 1, 1)
        self.conv_hr = tnn.Conv2d(NF, NF, 3, 1, 1)
        self.conv_last = tnn.Conv2d(NF, 3, 3, 1, 1)

    def forward(self, x):
        fea = self.conv_first(x)
        body = fea
        for b in self.body:
            body = b(body)
        fea = fea + self.conv_body(body)
        up = lambda v: F.interpolate(v, scale_factor=2, mode="nearest")
        fea = F.leaky_relu(self.conv_up1(up(fea)), 0.2)
        fea = F.leaky_relu(self.conv_up2(up(fea)), 0.2)
        return self.conv_last(F.leaky_relu(self.conv_hr(fea), 0.2))


class _TD(tnn.Module):
    """Reference UNetDiscriminatorSN (SR/rrdbnet_arch.py:244-303)."""

    def __init__(self):
        super().__init__()
        SN = tnn.utils.spectral_norm
        self.conv0 = tnn.Conv2d(3, DNF, 3, 1, 1)
        self.conv1 = SN(tnn.Conv2d(DNF, DNF * 2, 4, 2, 1, bias=False))
        self.conv2 = SN(tnn.Conv2d(DNF * 2, DNF * 4, 4, 2, 1, bias=False))
        self.conv3 = SN(tnn.Conv2d(DNF * 4, DNF * 8, 4, 2, 1, bias=False))
        self.conv4 = SN(tnn.Conv2d(DNF * 8, DNF * 4, 3, 1, 1, bias=False))
        self.conv5 = SN(tnn.Conv2d(DNF * 4, DNF * 2, 3, 1, 1, bias=False))
        self.conv6 = SN(tnn.Conv2d(DNF * 2, DNF, 3, 1, 1, bias=False))
        self.conv7 = SN(tnn.Conv2d(DNF, DNF, 3, 1, 1, bias=False))
        self.conv8 = SN(tnn.Conv2d(DNF, DNF, 3, 1, 1, bias=False))
        self.conv9 = tnn.Conv2d(DNF, 1, 3, 1, 1)

    def forward(self, x):
        lr = lambda v: F.leaky_relu(v, 0.2)
        up = lambda v: F.interpolate(v, scale_factor=2, mode="bilinear",
                                     align_corners=False)
        x0 = lr(self.conv0(x))
        x1 = lr(self.conv1(x0))
        x2 = lr(self.conv2(x1))
        x3 = lr(self.conv3(x2))
        x4 = lr(self.conv4(up(x3))) + x2
        x5 = lr(self.conv5(up(x4))) + x1
        x6 = lr(self.conv6(up(x5))) + x0
        out = lr(self.conv8(lr(self.conv7(x6))))
        return self.conv9(out)


def _build_torch_vgg():
    layers, in_ch = [], 3
    for item in VGG19_CFG:
        if item == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, item, 3, 1, 1))
            layers.append(tnn.ReLU())
            in_ch = item
    m = tnn.Sequential(*layers)
    for p in m.parameters():
        p.data.mul_(0.3)  # keep deep activations in a comparable fp range
    return m.eval()


_IMNET_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
_IMNET_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
_VGG_TAPS = (2, 7, 16, 25, 34)
_PERCEP_W = (0.1, 0.1, 1.0, 1.0, 1.0)


def _t_vgg_feats(vgg, x):
    x = (x - _IMNET_MEAN) / _IMNET_STD
    outs = []
    for i, layer in enumerate(vgg):
        x = layer(x)
        if i in _VGG_TAPS:
            outs.append(x)
    return outs


_W51 = None


def _t_usm(img, weight=0.5, threshold=10.0):
    """Reference USMSharp (SR/rrdbnet_arch.py:414-434) in torch."""
    global _W51
    if _W51 is None:
        k = cv2.getGaussianKernel(51, 0)
        _W51 = torch.tensor((k @ k.T).astype(np.float32))

    def filt(x):
        c = x.shape[1]
        w = _W51.view(1, 1, 51, 51).repeat(c, 1, 1, 1)
        return F.conv2d(F.pad(x, (25, 25, 25, 25), mode="reflect"),
                        w, groups=c)

    blur = filt(img)
    residual = img - blur
    mask = ((residual.abs() * 255.0) > threshold).float()
    soft = filt(mask)
    sharp = (img + weight * residual).clamp(0.0, 1.0)
    return soft * sharp + (1.0 - soft) * img


def _sign_flip_fraction(tree_a, tree_b, thresh):
    """Fraction of elements whose values differ by more than ``thresh``
    across the whole tree (Adam sign-flip-tolerant comparison)."""
    paths_a = [jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(tree_a)]
    paths_b = [jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(tree_b)]
    assert paths_a == paths_b, \
        "param trees diverged structurally; comparison would be misaligned"
    flat_a = jax.tree_util.tree_leaves(tree_a)
    flat_b = jax.tree_util.tree_leaves(tree_b)
    bad = total = 0
    for a, b in zip(flat_a, flat_b):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        bad += int((d > thresh).sum())
        total += d.size
    return bad / total


class TestGANStepOracle:
    def test_one_step_matches_torch(self):
        torch.manual_seed(3)
        net_g, net_d, vgg = _TG(), _TD(), _build_torch_vgg()
        # converge the SN power iteration so the stored (u, v) pair matches
        # the converter's v = normalize(W^T u) reconstruction
        net_d.train()
        with torch.no_grad():
            for _ in range(50):
                net_d(torch.randn(1, 3, 32, 32))

        # snapshot the pre-step weights NOW (torch optimizers mutate
        # in place); the framework step consumes these converted copies
        g_sd = {k: v.detach().clone().numpy()
                for k, v in net_g.state_dict().items()}
        d_sd = {k: v.detach().clone().numpy()
                for k, v in net_d.state_dict().items()}

        rng = np.random.default_rng(5)
        lq_np = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
        gt_np = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        lq_t = torch.from_numpy(lq_np.transpose(0, 3, 1, 2))
        gt_t = torch.from_numpy(gt_np.transpose(0, 3, 1, 2))

        # ---------------- torch reference step (optimize_parameters twin)
        opt_g = torch.optim.Adam(net_g.parameters(), lr=LR, betas=(0.9, 0.99))
        opt_d = torch.optim.Adam(net_d.parameters(), lr=LR, betas=(0.9, 0.99))
        gt_usm = _t_usm(gt_t)

        net_d.eval()  # framework semantics: no SN update in the G step
        for p in net_d.parameters():
            p.requires_grad_(False)
        output = net_g(lq_t)
        l_pix = F.l1_loss(output, gt_usm)
        fx = _t_vgg_feats(vgg, output)
        with torch.no_grad():
            fgt = _t_vgg_feats(vgg, gt_usm)
        l_percep = sum(w * F.l1_loss(a, b)
                       for w, a, b in zip(_PERCEP_W, fx, fgt))
        fake_g_pred = net_d(output)
        l_gan = 0.1 * F.binary_cross_entropy_with_logits(
            fake_g_pred, torch.ones_like(fake_g_pred))
        l_g_total = l_pix + l_percep + l_gan
        opt_g.zero_grad()
        l_g_total.backward()
        opt_g.step()

        net_d.train()
        for p in net_d.parameters():
            p.requires_grad_(True)
        real_pred = net_d(gt_t)
        l_d_real = F.binary_cross_entropy_with_logits(
            real_pred, torch.ones_like(real_pred))
        fake_pred = net_d(output.detach())
        l_d_fake = F.binary_cross_entropy_with_logits(
            fake_pred, torch.zeros_like(fake_pred))
        opt_d.zero_grad()
        (l_d_real + l_d_fake).backward()
        opt_d.step()

        # ---------------- framework step from the SAME converted weights
        tr = RealESRGANTrainer(num_block=NB, num_feat=NF, num_grow_ch=GC,
                               disc_feat=DNF, lr=LR)
        vgg_sd = {f"features.{k}": v for k, v in vgg.state_dict().items()}
        vgg_vars = load_torchvision_vgg19(vgg_sd)
        state = tr.init(jax.random.PRNGKey(0), (2, 8, 8, 3),
                        vgg_variables=vgg_vars)
        g_tree = convert.convert_rrdbnet(g_sd, num_block=NB)
        d_tree = convert.convert_unet_discriminator_sn(d_sd)
        state = state.replace(
            g_params=g_tree["params"],
            g_ema=jax.tree_util.tree_map(np.copy, g_tree["params"]),
            d_vars=d_tree,
            g_opt=state.g_tx.init(g_tree["params"]),
            d_opt=state.d_tx.init(d_tree["params"]))
        step = tr.make_step()
        new_state, metrics = step(state, jnp.asarray(lq_np),
                                  jnp.asarray(gt_np))

        # ---------------- losses (the composition pin)
        assert float(metrics["l_g_pix"]) == pytest.approx(
            float(l_pix.detach()), rel=1e-3, abs=1e-5)
        assert float(metrics["l_g_percep"]) == pytest.approx(
            float(l_percep.detach()), rel=1e-3, abs=1e-5)
        assert float(metrics["l_g_gan"]) == pytest.approx(
            float(l_gan.detach()), rel=1e-3, abs=1e-5)
        assert float(metrics["l_d_real"]) == pytest.approx(
            float(l_d_real.detach()), rel=1e-3, abs=1e-5)
        assert float(metrics["l_d_fake"]) == pytest.approx(
            float(l_d_fake.detach()), rel=1e-3, abs=1e-5)

        # ---------------- updated parameters (sign-flip-tolerant)
        g_after = convert.convert_rrdbnet(
            {k: v.detach().numpy() for k, v in net_g.state_dict().items()},
            num_block=NB)["params"]
        frac = _sign_flip_fraction(new_state.g_params, g_after, thresh=1e-5)
        assert frac < 0.01, f"{frac:.4%} of G params diverged beyond 1e-5"

        d_after = convert.convert_unet_discriminator_sn(
            {k: v.detach().numpy() for k, v in net_d.state_dict().items()}
        )["params"]
        frac_d = _sign_flip_fraction(new_state.d_vars["params"], d_after,
                                     thresh=1e-5)
        assert frac_d < 0.01, f"{frac_d:.4%} of D params diverged beyond 1e-5"

        # ---------------- EMA: 0.999 * init + 0.001 * new
        ema_want = jax.tree_util.tree_map(
            lambda old, new: 0.999 * np.asarray(old) + 0.001 * np.asarray(new),
            g_tree["params"], jax.tree_util.tree_map(np.asarray,
                                                     new_state.g_params))
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(new_state.g_ema)[0]),
            jax.tree_util.tree_leaves(ema_want)[0], atol=1e-7)
