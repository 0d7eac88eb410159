"""SR GAN-training stack: discriminators, VGG features, SR losses, USM, and
the fused Real-ESRGAN step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.losses import sr as srl
from srbh_tpu.models.discriminators import UNetDiscriminatorSN, VGGStyleDiscriminator
from srbh_tpu.models.vgg import VGG19Features, load_torchvision_vgg19
from srbh_tpu.ops.usm import cv2_gaussian_kernel, usm_sharp

torch = pytest.importorskip("torch")


class TestDiscriminators:
    def test_unet_sn_shapes_and_param_count(self):
        m = UNetDiscriminatorSN(num_feat=64)
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == (1, 64, 64, 1)
        n = sum(int(np.prod(p.shape)) for p in
                jax.tree_util.tree_leaves(variables["params"]))
        assert abs(n / 1e6 - 4.38) < 0.05  # rrdbnet_arch.py:659

    def test_spectral_norm_state_updates(self):
        m = UNetDiscriminatorSN(num_feat=8)
        x = jnp.ones((1, 32, 32, 3))
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        _, mut = m.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(before, after))

    def test_vgg_style_disc(self):
        m = VGGStyleDiscriminator(num_feat=8, input_size=128)
        x = jnp.zeros((2, 128, 128, 3))
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 1)


class TestVGG19:
    def test_feature_shapes(self):
        m = VGG19Features()
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        feats = m.apply(variables, x)
        # layers [2,7,16,25,34]: channels 64,128,256,512,512 at /1,/2,/4,/8,/16
        assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]
        assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4]

    def test_torchvision_conversion_layout(self):
        # fake state dict with recognisable values
        sd = {}
        cfg_channels = [64, 64, 128, 128, 256, 256, 256, 256,
                        512, 512, 512, 512, 512, 512, 512, 512]
        seq = 0
        in_ch = 3
        import itertools

        layer_iter = iter(cfg_channels)
        # build indices like torchvision: conv at 0,2, 5,7, 10,12,14,16, ...
        seq_indices = []
        idx = 0
        from srbh_tpu.models.vgg import VGG19_CFG

        for item in VGG19_CFG:
            if item == "M":
                idx += 1
            else:
                seq_indices.append(idx)
                idx += 2
        prev = 3
        for i, (si, ch) in enumerate(zip(seq_indices, cfg_channels)):
            sd[f"features.{si}.weight"] = torch.arange(
                ch * prev * 9, dtype=torch.float32).reshape(ch, prev, 3, 3)
            sd[f"features.{si}.bias"] = torch.zeros(ch)
            prev = ch
        variables = load_torchvision_vgg19(sd)
        k0 = variables["params"]["conv0"]["kernel"]
        assert k0.shape == (3, 3, 3, 64)  # HWIO
        # OIHW->HWIO: element [o=1,i=0,kh=0,kw=0] must land at [0,0,0,1]
        assert k0[0, 0, 0, 1] == 27.0  # 1*3*9 + 0 + 0


class TestSRLosses:
    def test_gan_loss_matches_torch_bce(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
        want = float(torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.ones(2, 8, 8, 1)))
        got = float(srl.gan_loss(jnp.asarray(logits), True, "vanilla",
                                 is_disc=True))
        assert abs(got - want) < 1e-6
        # generator-side applies loss_weight
        got_g = float(srl.gan_loss(jnp.asarray(logits), True, "vanilla",
                                   is_disc=False, loss_weight=0.1))
        assert abs(got_g - 0.1 * want) < 1e-6

    def test_gan_loss_variants(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4)).astype(np.float32))
        for t in ("lsgan", "wgan", "wgan_softplus", "hinge"):
            v = float(srl.gan_loss(x, True, t, is_disc=True))
            assert np.isfinite(v)
        with pytest.raises(NotImplementedError):
            srl.gan_loss(x, True, "bogus")

    def test_charbonnier_and_tv(self):
        x = jnp.ones((1, 4, 4, 1))
        # reference default eps=1e-9 (SR/srloss.py:282) -> floor sqrt(1e-9)
        assert float(srl.charbonnier_loss(x, x)) == pytest.approx(
            31.6228e-6, rel=1e-3)
        assert float(srl.tv_loss(x)) == 0.0
        ramp = jnp.arange(16.0).reshape(1, 4, 4, 1)
        assert float(srl.tv_loss(ramp)) > 0

    def test_r1_penalty(self):
        # D(x) = sum(3x) -> grad = 3 -> penalty = 9 * numel / batch
        real = jnp.ones((2, 4, 4, 1))
        p = float(srl.r1_penalty(lambda x: 3.0 * jnp.sum(x, axis=(1, 2, 3)), real))
        assert p == pytest.approx(9.0 * real.size / 2)

    def test_gradient_penalty(self):
        real = jnp.zeros((2, 4, 4, 1))
        fake = jnp.ones((2, 4, 4, 1))
        # reference semantics (SR/srloss.py:356): PER-PIXEL channel-dim
        # norm. D = sum(x) has gradient 1 per pixel -> per-pixel norm 1 over
        # the single channel -> zero penalty.
        p = float(srl.gradient_penalty_loss(
            lambda x: jnp.sum(x, axis=(1, 2, 3)), real, fake,
            jax.random.PRNGKey(0)))
        assert p == pytest.approx(0.0, abs=1e-6)
        # 4 channels of gradient g: per-pixel norm = 2g -> (2g-1)^2
        g = 0.75
        p4 = float(srl.gradient_penalty_loss(
            lambda x: g * jnp.sum(x, axis=(1, 2, 3)),
            jnp.zeros((2, 4, 4, 4)), jnp.ones((2, 4, 4, 4)),
            jax.random.PRNGKey(0)))
        assert p4 == pytest.approx((2 * g - 1.0) ** 2, rel=1e-5)


class TestUSM:
    def test_gaussian_kernel_matches_cv2(self):
        import cv2

        for ksize, sigma in ((51, 0.0), (11, 1.5)):
            want = cv2.getGaussianKernel(ksize, sigma).ravel()
            got = cv2_gaussian_kernel(ksize, sigma)
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_usm_sharpens_edges(self):
        # mid-range step so the sharpened overshoot isn't clipped away
        img = np.full((1, 64, 64, 3), 0.3, np.float32)
        img[:, :, 32:, :] = 0.7
        out = np.asarray(usm_sharp(jnp.asarray(img)))
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 1
        # flat regions unchanged, edge region overshoots (sharpening)
        np.testing.assert_allclose(out[0, 0, :5], img[0, 0, :5], atol=1e-5)
        assert out[0, 32, 28:36].min() < 0.3 - 1e-3
        assert out[0, 32, 28:36].max() > 0.7 + 1e-3


class TestGANStep:
    def test_fused_step_trains(self):
        from srbh_tpu.train.sr_trainer import RealESRGANTrainer

        tr = RealESRGANTrainer(num_block=1, num_feat=8, num_grow_ch=8,
                               disc_feat=8, perceptual=False)
        state = tr.init(jax.random.PRNGKey(0), (2, 16, 16, 3))
        step = tr.make_step()
        rng = np.random.default_rng(0)
        lq = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
        pix = []
        for _ in range(5):
            state, m = step(state, lq, gt)
            pix.append(float(m["l_g_pix"]))
        assert all(np.isfinite(v) for v in pix)
        assert pix[-1] < pix[0]  # pixel loss decreasing
        assert int(state.step) == 5
        # EMA differs from the live params after updates
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params,
            state.g_ema)
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    def test_ema_inference_path(self):
        from srbh_tpu.train.sr_trainer import RealESRGANTrainer

        tr = RealESRGANTrainer(num_block=1, num_feat=8, num_grow_ch=8,
                               disc_feat=8, perceptual=False)
        state = tr.init(jax.random.PRNGKey(0), (1, 16, 16, 3))
        apply = tr.ema_apply_fn()
        out = apply(state, jnp.zeros((1, 16, 16, 3)))
        assert out.shape == (1, 64, 64, 3)
        fea = apply(state, jnp.zeros((1, 16, 16, 3)), features_only=True)
        assert fea.shape == (1, 64, 64, 8)

    def test_1ch_weight_adaptation(self):
        from srbh_tpu.models.rrdbnet import RRDBNet
        from srbh_tpu.train.sr_trainer import adapt_weights_to_1ch

        m = RRDBNet(num_block=1, num_feat=8, num_grow_ch=8)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        p1 = adapt_weights_to_1ch(v["params"])
        assert p1["conv_first"]["kernel"].shape[2] == 1
        assert p1["conv_last"]["kernel"].shape[3] == 1
        # the adapted tree drives a 1-in/1-out generator (rrdbnet_arch.py:450)
        m1 = RRDBNet(num_out_ch=1, num_block=1, num_feat=8, num_grow_ch=8)
        out = m1.apply({"params": p1}, jnp.zeros((1, 8, 8, 1)))
        assert out.shape == (1, 32, 32, 1)


class TestMultistepLR:
    def test_schedule(self):
        from srbh_tpu.train.sr_trainer import multistep_lr

        s = multistep_lr(1e-4, milestones=(10,), gamma=0.5, warmup_iter=4)
        assert float(s(0)) == 0.0
        assert float(s(2)) == pytest.approx(5e-5)
        assert float(s(5)) == pytest.approx(1e-4)
        assert float(s(10)) == pytest.approx(5e-5)
