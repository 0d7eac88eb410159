"""torch->flax checkpoint conversion: numeric equivalence on generic torch
conv stacks + structural roundtrips for the larger models."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.train import convert

torch = pytest.importorskip("torch")


class TestESPCNNumeric:
    def test_forward_equivalence(self):
        """A generic torch conv/tanh/pixel-shuffle stack (the ESPCN topology)
        must produce identical outputs through the converted flax model."""
        tm = torch.nn.ModuleDict({
            "conv1": torch.nn.Conv2d(4, 64, 5, 1, 2),
            "conv2": torch.nn.Conv2d(64, 32, 3, 1, 1),
            "conv3": torch.nn.Conv2d(32, 48, 3, 1, 1),
        })
        x = torch.randn(1, 4, 16, 16)
        with torch.no_grad():
            h = torch.tanh(tm["conv1"](x))
            h = torch.tanh(tm["conv2"](h))
            want = torch.nn.functional.pixel_shuffle(tm["conv3"](h), 4).numpy()

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = convert.convert_espcn(sd)
        from srbh_tpu.models import ESPCN

        m = ESPCN(upscale_factor=4)
        got = m.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=2e-5)


class TestStructuralRoundtrips:
    def _fake_sd_from_flax(self, params, prefix="", sd=None):
        """Inverse mapping: flax tree -> torch-style flat dict (HWIO->OIHW)."""
        sd = {} if sd is None else sd
        for k, v in params.items():
            name = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if isinstance(v, dict):
                self._fake_sd_from_flax(v, name, sd)
            elif k == "kernel":
                sd[prefix + ".weight" if False else f"{prefix}.weight"] = (
                    np.asarray(v).transpose(3, 2, 0, 1))
            elif k == "bias":
                sd[f"{prefix}.bias"] = np.asarray(v)
        return sd

    def test_rrdbnet_roundtrip(self):
        from srbh_tpu.models import RRDBNet

        m = RRDBNet(num_block=2, num_feat=8, num_grow_ch=8)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        # build a torch-style state dict with the reference's key names
        sd = {}
        p = v["params"]
        def put(tname, tree):
            sd[f"{tname}.weight"] = np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{tname}.bias"] = np.asarray(tree["bias"])
        put("conv_first", p["conv_first"])
        for i in range(2):
            for r in (1, 2, 3):
                for c in (1, 2, 3, 4, 5):
                    put(f"body.{i}.rdb{r}.conv{c}", p[f"body_{i}"][f"rdb{r}"][f"conv{c}"])
        for n in ("conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
            put(n, p[n])
        back = convert.convert_rrdbnet(sd, num_block=2)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 8, 8, 3)).astype(np.float32))
        a = m.apply(v, x)
        b = m.apply(back, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_edsr_partial_load_skips_tail(self):
        sd = {}
        rng = np.random.default_rng(0)
        def fake_conv(name, cin, cout, k=3):
            sd[f"{name}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
            sd[f"{name}.bias"] = rng.normal(size=(cout,)).astype(np.float32)
        fake_conv("head.0", 4, 8)
        for i in range(2):
            fake_conv(f"body.{i}.body.0", 8, 8)
            fake_conv(f"body.{i}.body.2", 8, 8)
        fake_conv("body.2", 8, 8)
        # NO tail in the checkpoint
        with pytest.raises(KeyError):
            convert.convert_edsr(sd, n_resblocks=2, strict=True)
        tree = convert.convert_edsr(sd, n_resblocks=2, strict=False)
        assert "tail" not in tree["params"]
        assert "head" in tree["params"]

    def test_unet_discriminator_conversion_applies(self):
        from srbh_tpu.models.discriminators import UNetDiscriminatorSN

        m = UNetDiscriminatorSN(num_feat=8)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        rng = np.random.default_rng(1)
        sd = {}
        p = v["params"]
        sd["conv0.weight"] = np.asarray(p["conv0"]["kernel"]).transpose(3, 2, 0, 1)
        sd["conv0.bias"] = np.asarray(p["conv0"]["bias"])
        sd["conv9.weight"] = np.asarray(p["conv9"]["kernel"]).transpose(3, 2, 0, 1)
        sd["conv9.bias"] = np.asarray(p["conv9"]["bias"])
        for i in range(1, 9):
            k = np.asarray(p[f"conv{i}"]["kernel"])
            sd[f"conv{i}.weight_orig"] = k.transpose(3, 2, 0, 1)
            u = rng.normal(size=(k.shape[-1],)).astype(np.float32)
            sd[f"conv{i}.weight_u"] = u / np.linalg.norm(u)
        back = convert.convert_unet_discriminator_sn(sd)
        # the converter now carries the checkpoint's SN power-iteration
        # state: u seeds flax SpectralNorm and sigma is recomputed from it
        assert "batch_stats" in back
        np.testing.assert_allclose(
            np.asarray(back["batch_stats"]["conv1_sn"]["conv1/kernel/u"])[0],
            sd["conv1.weight_u"], atol=1e-6)
        assert float(back["batch_stats"]["conv1_sn"]["conv1/kernel/sigma"]) > 0
        out = m.apply(back, jnp.zeros((1, 32, 32, 3)))
        assert out.shape == (1, 32, 32, 1)

    def test_height_model_conversion_structure(self):
        """Build a fake smp-style state dict by inverse-mapping our own init,
        convert it back, and check the trees match exactly."""
        from srbh_tpu.models import SRRegressClsFeature

        m = SRRegressClsFeature(encoder_name="efficientnet-b4", super_mid=16,
                                isaggre=True, chans_build=7)
        shapes = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 8)),
                           jnp.zeros((1, 256, 256, 64))))

        # inverse-map the expected flax tree into smp/torch names
        sd = {}
        rng = np.random.default_rng(0)

        def fill(tree, name_fn, path=()):
            for k, v in tree.items():
                if hasattr(v, "shape") :
                    tname, role = name_fn(path + (k,))
                    if tname is None:
                        continue
                    shape = tuple(v.shape)
                    if role == "conv":
                        arr = rng.normal(size=(shape[3], shape[2], shape[0],
                                               shape[1])).astype(np.float32)
                        sd[f"{tname}.weight"] = arr
                    elif role == "bias":
                        sd[f"{tname}.bias"] = rng.normal(size=shape).astype(np.float32)
                    elif role == "bn":
                        sd[f"{tname}.weight"] = rng.normal(size=shape).astype(np.float32)
                        sd[f"{tname}.bias"] = rng.normal(size=shape).astype(np.float32)
                        sd[f"{tname}.running_mean"] = rng.normal(size=shape).astype(np.float32)
                        sd[f"{tname}.running_var"] = np.abs(rng.normal(size=shape)).astype(np.float32) + 1
                else:
                    fill(v, name_fn, path + (k,))

        # use the converter's own inverse documented mapping to build names
        mapping = _smp_name_map()

        def name_fn(path):
            return mapping(path)

        fill(shapes["params"], name_fn)
        tree = convert.convert_height_model(sd, isaggre=True)

        want_paths = {jax.tree_util.keystr(p) for p, _ in
                      jax.tree_util.tree_flatten_with_path(shapes["params"])[0]}
        got_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(tree["params"])[0]}
        missing = want_paths - got_paths
        assert not missing, sorted(missing)[:10]
        # shapes agree leaf-by-leaf
        flat_want = dict(jax.tree_util.tree_flatten_with_path(shapes["params"])[0])
        flat_got = dict(jax.tree_util.tree_flatten_with_path(tree["params"])[0])
        for k, v in flat_want.items():
            assert tuple(flat_got[k].shape) == tuple(v.shape), k


def _smp_name_map():
    """flax param path -> (torch name, role) for the height model."""
    def mapping(path):
        keys = [str(k) for k in path]
        leaf = keys[-1]
        role = {"kernel": "conv", "bias": "bias", "scale": "bn"}.get(leaf)
        if role is None:
            return None, None
        if leaf == "scale":
            tname_role = "bn"
        # encoder
        if keys[0] == "encoder":
            if keys[1] == "stem_conv":
                return "encoder._conv_stem", "conv"
            if keys[1] == "stem_bn":
                return ("encoder._bn0", "bn") if leaf == "scale" else (None, None)
            if keys[1].startswith("blocks_"):
                si, bi = map(int, keys[1].split("_")[1:])
                from srbh_tpu.models.efficientnet import _B0_STAGES, SCALING, round_repeats

                _w, depth, _ = SCALING["efficientnet-b4"]
                tn = sum(round_repeats(s[4], depth) for s in _B0_STAGES[: si - 1]) + bi
                t = f"encoder._blocks.{tn}"
                part = keys[2]
                torch_names = {
                    "expand_conv": (f"{t}._expand_conv", "conv"),
                    "expand_bn": (f"{t}._bn0", "bn"),
                    "dw_conv": (f"{t}._depthwise_conv", "conv"),
                    "dw_bn": (f"{t}._bn1", "bn"),
                    "se_reduce": (f"{t}._se_reduce", "conv" if leaf == "kernel" else "bias"),
                    "se_expand": (f"{t}._se_expand", "conv" if leaf == "kernel" else "bias"),
                    "project_conv": (f"{t}._project_conv", "conv"),
                    "project_bn": (f"{t}._bn2", "bn"),
                }
                tname, trole = torch_names[part]
                if trole == "bn" and leaf != "scale":
                    return None, None
                if trole == "bn":
                    return tname, "bn"
                if leaf == "bias":
                    return tname, "bias"
                return tname, "conv"
        # decoders
        if keys[0] in ("decoder1", "decoder2"):
            bi = int(keys[1][5:])
            ci = keys[2]
            t = f"{keys[0]}.blocks.{bi}.{ci}"
            if keys[3] == "conv":
                return (f"{t}.0", "conv" if leaf == "kernel" else "bias")
            if leaf == "scale":
                return f"{t}.1", "bn"
            return None, None
        # hrfeat / heads
        def basic_block(prefix, part):
            name = {"conv1": "conv1", "conv2": "conv2", "bn1": "bn1",
                    "bn2": "bn2", "down_conv": "downsample.0",
                    "down_bn": "downsample.1"}[part]
            return f"{prefix}.{name}"

        if keys[0] == "hrfeat":
            i = int(keys[1][5:])
            t = basic_block(f"hrfeat.{i}", keys[2])
            if leaf == "scale":
                return t, "bn"
            if keys[2].endswith("bn") or "bn" in keys[2]:
                return None, None
            return (t, "conv" if leaf == "kernel" else "bias")
        if keys[0] in ("reg", "seg"):
            if keys[1] == "upsampler":
                idx = int(keys[2].split("_")[1])
                return (f"{keys[0]}.upsampler.{idx * 2}",
                        "conv" if leaf == "kernel" else "bias")
            if keys[1] == "conv_last":
                return (f"{keys[0]}.conv_last",
                        "conv" if leaf == "kernel" else "bias")
            i = int(keys[1][4:])
            t = basic_block(f"{keys[0]}.fuse.{i}", keys[2])
            if leaf == "scale":
                return t, "bn"
            if "bn" in keys[2]:
                return None, None
            return (t, "conv" if leaf == "kernel" else "bias")
        if keys[0] == "aggre_height":
            return ("aggre_height", "conv" if leaf == "kernel" else "bias")
        return None, None

    return mapping


class TestImageNetEncoderConverter:
    """Encoder-only ImageNet init (mymodels.py:242-243 encoder_weights=
    'imagenet'): raw efficientnet-pytorch state_dict -> EfficientNetEncoder."""

    def _fake_effnet_sd(self, variables, model_name):
        from srbh_tpu.models.efficientnet import (
            _B0_STAGES, SCALING, round_repeats)

        p, s = variables["params"], variables["batch_stats"]
        sd = {}

        def put_conv(tname, tree):
            sd[f"{tname}.weight"] = np.asarray(
                tree["kernel"]).transpose(3, 2, 0, 1)
            if "bias" in tree:
                sd[f"{tname}.bias"] = np.asarray(tree["bias"])

        def put_bn(tname, ptree, stree):
            sd[f"{tname}.weight"] = np.asarray(ptree["scale"])
            sd[f"{tname}.bias"] = np.asarray(ptree["bias"])
            sd[f"{tname}.running_mean"] = np.asarray(stree["mean"])
            sd[f"{tname}.running_var"] = np.asarray(stree["var"])

        put_conv("_conv_stem", p["stem_conv"])
        put_bn("_bn0", p["stem_bn"], s["stem_bn"])
        _w, depth, _ = SCALING[model_name]
        tn = 0
        for si, (expand, _k, _s, _c, base_r) in enumerate(_B0_STAGES, 1):
            for bi in range(round_repeats(base_r, depth)):
                bp, bs = p[f"blocks_{si}_{bi}"], s[f"blocks_{si}_{bi}"]
                t = f"_blocks.{tn}"
                if expand != 1:
                    put_conv(f"{t}._expand_conv", bp["expand_conv"])
                    put_bn(f"{t}._bn0", bp["expand_bn"], bs["expand_bn"])
                put_conv(f"{t}._depthwise_conv", bp["dw_conv"])
                put_bn(f"{t}._bn1", bp["dw_bn"], bs["dw_bn"])
                put_conv(f"{t}._se_reduce", bp["se_reduce"])
                put_conv(f"{t}._se_expand", bp["se_expand"])
                put_conv(f"{t}._project_conv", bp["project_conv"])
                put_bn(f"{t}._bn2", bp["project_bn"], bs["project_bn"])
                tn += 1
        return sd

    def test_numeric_roundtrip(self):
        from srbh_tpu.models import EfficientNetEncoder

        enc = EfficientNetEncoder(model_name="efficientnet-test")
        x = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (1, 32, 32, 3)).astype(np.float32))
        v = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
        sd = self._fake_effnet_sd(v, "efficientnet-test")
        back = convert.convert_efficientnet_imagenet(
            sd, "efficientnet-test")
        a = jax.jit(lambda v, x: enc.apply(v, x))(v, x)
        b = jax.jit(lambda v, x: enc.apply(v, x))(back, x)
        for fa, fb in zip(a, b):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       atol=1e-6)

    def test_stem_widening_to_8_channels(self):
        from srbh_tpu.models import EfficientNetEncoder

        enc = EfficientNetEncoder(model_name="efficientnet-test")
        v = jax.jit(enc.init)(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)))
        sd = self._fake_effnet_sd(v, "efficientnet-test")
        wide = convert.convert_efficientnet_imagenet(
            sd, "efficientnet-test", in_channels=8)
        k = wide["params"]["stem_conv"]["kernel"]
        assert k.shape[2] == 8
        # smp patch_first_conv: cycled RGB kernels scaled by 3/8
        k3 = v["params"]["stem_conv"]["kernel"]
        np.testing.assert_allclose(k[:, :, 0, :],
                                   np.asarray(k3[:, :, 0, :]) * (3 / 8),
                                   atol=1e-7)
        np.testing.assert_allclose(k[:, :, 5, :],
                                   np.asarray(k3[:, :, 2, :]) * (3 / 8),
                                   atol=1e-7)

    def test_graft_into_height_model(self):
        from srbh_tpu.models import EfficientNetEncoder, SRRegressClsFeature

        m = SRRegressClsFeature(encoder_name="efficientnet-test",
                                super_mid=8, isaggre=True, chans_build=7)
        hv = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 8)),
                           jnp.zeros((1, 128, 128, 8))))
        hv = jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, a.dtype), hv)
        enc = EfficientNetEncoder(model_name="efficientnet-test")
        ev = jax.jit(enc.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1, 32, 32, 3)))
        sd = self._fake_effnet_sd(ev, "efficientnet-test")
        out = convert.load_imagenet_encoder(hv, sd, "efficientnet-test")
        # encoder subtree replaced (stem widened to 8ch), heads untouched
        assert out["params"]["encoder"]["stem_conv"]["kernel"].shape[2] == 8
        assert (jax.tree_util.tree_structure(out["params"])
                == jax.tree_util.tree_structure(hv["params"]))
        assert float(np.abs(
            out["params"]["encoder"]["blocks_2_0"]["dw_conv"]["kernel"]).sum()
            ) > 0


class TestEncoderWeightsNpzWiring:
    """The runtime half of the reference's encoder_weights='imagenet' start
    (mymodels.py:234,242-243): a converted encoder npz grafts into fresh
    height-model variables via TrainConfig.encoder_weights."""

    def _height_vars(self):
        from srbh_tpu.models import SRRegressClsFeature

        m = SRRegressClsFeature(encoder_name="efficientnet-test",
                                super_mid=8, isaggre=True, chans_build=7)
        hv = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 8)),
                           jnp.zeros((1, 128, 128, 8))))
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, a.dtype), hv)

    def _encoder_npz(self, path, seed=1):
        from srbh_tpu.models import EfficientNetEncoder

        enc = EfficientNetEncoder(model_name="efficientnet-test")
        ev = jax.jit(enc.init)(jax.random.PRNGKey(seed),
                               jnp.zeros((1, 32, 32, 3)))
        tree = {"params": jax.tree_util.tree_map(np.asarray, ev["params"]),
                "batch_stats": jax.tree_util.tree_map(
                    np.asarray, ev["batch_stats"])}
        convert.save_tree_npz(path, tree)
        return tree

    def test_graft_widens_3ch_stem_and_keeps_weights(self, tmp_path):
        hv = self._height_vars()
        npz = str(tmp_path / "enc.npz")
        tree = self._encoder_npz(npz)
        out = convert.graft_encoder_npz(hv, npz)
        k = out["params"]["encoder"]["stem_conv"]["kernel"]
        assert k.shape[2] == 8
        k3 = tree["params"]["stem_conv"]["kernel"]
        np.testing.assert_allclose(np.asarray(k[:, :, 4, :]),
                                   k3[:, :, 1, :] * (3 / 8), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(out["params"]["encoder"]["blocks_2_0"]["dw_conv"]
                       ["kernel"]),
            tree["params"]["blocks_2_0"]["dw_conv"]["kernel"], atol=0)
        np.testing.assert_allclose(
            np.asarray(out["batch_stats"]["encoder"]["stem_bn"]["mean"]),
            tree["batch_stats"]["stem_bn"]["mean"], atol=0)
        # heads untouched, structure preserved
        assert (jax.tree_util.tree_structure(out["params"])
                == jax.tree_util.tree_structure(hv["params"]))

    def test_wrong_architecture_fails_loudly(self, tmp_path):
        hv = self._height_vars()
        npz = str(tmp_path / "enc.npz")
        tree = self._encoder_npz(npz)
        # simulate an npz converted for a wider encoder: double one conv's
        # output channels
        k = tree["params"]["blocks_2_0"]["dw_conv"]["kernel"]
        tree["params"]["blocks_2_0"]["dw_conv"]["kernel"] = (
            np.concatenate([k, k], axis=-1))
        convert.save_tree_npz(npz, tree)
        with pytest.raises(ValueError, match="does not match"):
            convert.graft_encoder_npz(hv, npz)

    def test_not_an_encoder_npz(self, tmp_path):
        hv = self._height_vars()
        npz = str(tmp_path / "junk.npz")
        convert.save_tree_npz(npz, {"params": {"x": np.zeros(3)}})
        with pytest.raises(ValueError, match="not an encoder npz"):
            convert.graft_encoder_npz(hv, npz)

    def test_config_flag_exists_and_parses(self):
        from srbh_tpu.train.config import get_args

        cfg = get_args("globe", argv=["--encoder_weights", "/tmp/enc.npz"])
        assert cfg.encoder_weights == "/tmp/enc.npz"
        assert get_args("globe", argv=[]).encoder_weights is None


class TestUnetDecoderTorchOracle:
    """Numeric forward oracle for the smp UnetDecoder topology
    (mymodels.py:244-258 dependency): an in-test torch replica of smp's
    DecoderBlock chain (nearest x2 upsample -> concat skip -> 2x
    Conv3x3-BN-ReLU, BN eps 1e-5) must match our Flax UnetDecoder under
    converted weights."""

    def test_decoder_forward_matches_torch(self):
        import torch.nn as tnn
        import torch.nn.functional as F

        from srbh_tpu.models.unet_decoder import UnetDecoder
        from srbh_tpu.train.convert import _bn, _conv

        torch.manual_seed(0)
        enc_ch = [8, 6, 5, 4, 3, 2]   # input tap + 5 encoder stages (tiny)
        dec_ch = [16, 12, 10, 8, 6]

        # torch replica with smp parameter naming
        blocks = []
        in_ch = enc_ch[-1]
        skips = enc_ch[1:-1][::-1] + [0]
        sd = {}
        for i, (och, sch) in enumerate(zip(dec_ch, skips)):
            c1 = tnn.Conv2d(in_ch + sch, och, 3, padding=1, bias=False)
            b1 = tnn.BatchNorm2d(och, eps=1e-5)
            c2 = tnn.Conv2d(och, och, 3, padding=1, bias=False)
            b2 = tnn.BatchNorm2d(och, eps=1e-5)
            for m in (b1, b2):  # non-trivial running stats
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.data.normal_(1, 0.2)
                m.bias.data.normal_(0, 0.2)
            blocks.append((c1, b1, c2, b2))
            for tag, mod in (("conv1.0", c1), ("conv1.1", b1),
                             ("conv2.0", c2), ("conv2.1", b2)):
                for k, v in mod.state_dict().items():
                    sd[f"blocks.{i}.{tag}.{k}"] = v.numpy()
            in_ch = och

        feats_np = [np.random.default_rng(i).normal(
            size=(2, 32 >> s, 32 >> s, c)).astype(np.float32)
            for s, c in enumerate(enc_ch)]

        with torch.no_grad():
            x = torch.from_numpy(feats_np[-1].transpose(0, 3, 1, 2))
            tskips = [torch.from_numpy(f.transpose(0, 3, 1, 2))
                      for f in feats_np[1:-1][::-1]]
            for i, (c1, b1, c2, b2) in enumerate(blocks):
                for m in (b1, b2):
                    m.eval()
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                if i < len(tskips):
                    x = torch.cat([x, tskips[i]], dim=1)
                x = F.relu(b1(c1(x)))
                x = F.relu(b2(c2(x)))
            want = x.numpy().transpose(0, 2, 3, 1)

        # convert into the flax tree
        params, stats = {}, {}
        for i in range(len(dec_ch)):
            bp = {}
            bs = {}
            for cname in ("conv1", "conv2"):
                conv = _conv(sd, f"blocks.{i}.{cname}.0")
                bnp, bns = _bn(sd, f"blocks.{i}.{cname}.1")
                bp[cname] = {"conv": conv, "bn": bnp}
                bs[cname] = {"bn": bns}
            params[f"block{i}"] = bp
            stats[f"block{i}"] = bs

        dec = UnetDecoder(decoder_channels=tuple(dec_ch))
        out = dec.apply({"params": params, "batch_stats": stats},
                        *[jnp.asarray(f) for f in feats_np], train=False)
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)


class TestMBConvTorchOracle:
    """Numeric forward oracle for MBConv (efficientnet-pytorch's
    MBConvBlock): expand -> TF-same-padded depthwise (stride 2 pads
    asymmetrically, as Conv2dStaticSamePadding does) -> SE (reduction from
    block INPUT channels, biased 1x1s) -> project -> residual. BN eps 1e-3."""

    @staticmethod
    def _tf_same_pad(x, k, s):
        import torch.nn.functional as F

        ih, iw = x.shape[-2:]
        pad_h = max((-ih) % s + k - s, 0) if ih % s == 0 else max(k - ih % s, 0)
        pad_w = max((-iw) % s + k - s, 0) if iw % s == 0 else max(k - iw % s, 0)
        return F.pad(x, [pad_w // 2, pad_w - pad_w // 2,
                         pad_h // 2, pad_h - pad_h // 2])

    @pytest.mark.parametrize("in_ch,out_ch,expand,k,stride", [
        (8, 8, 1, 3, 1),    # stage-1 style: no expansion, residual
        (8, 12, 6, 5, 2),   # strided k5: asymmetric TF padding path
    ])
    def test_mbconv_matches_torch(self, in_ch, out_ch, expand, k, stride):
        import torch.nn as tnn
        import torch.nn.functional as F

        from srbh_tpu.models.efficientnet import MBConv

        torch.manual_seed(1)
        mid = in_ch * expand
        se_ch = max(1, int(in_ch * 0.25))
        mods = {}
        if expand != 1:
            mods["expand_conv"] = tnn.Conv2d(in_ch, mid, 1, bias=False)
            mods["expand_bn"] = tnn.BatchNorm2d(mid, eps=1e-3)
        mods["dw_conv"] = tnn.Conv2d(mid, mid, k, stride=stride, groups=mid,
                                     bias=False)
        mods["dw_bn"] = tnn.BatchNorm2d(mid, eps=1e-3)
        mods["se_reduce"] = tnn.Conv2d(mid, se_ch, 1)
        mods["se_expand"] = tnn.Conv2d(se_ch, mid, 1)
        mods["project_conv"] = tnn.Conv2d(mid, out_ch, 1, bias=False)
        mods["project_bn"] = tnn.BatchNorm2d(out_ch, eps=1e-3)
        for m in mods.values():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.data.normal_(1, 0.2)
                m.bias.data.normal_(0, 0.2)
                m.eval()

        x_np = np.random.default_rng(2).normal(
            size=(2, 17, 17, in_ch)).astype(np.float32)  # odd size: pad quirks
        with torch.no_grad():
            h = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
            inp = h
            if expand != 1:
                h = F.silu(mods["expand_bn"](mods["expand_conv"](h)))
            h = self._tf_same_pad(h, k, stride)
            h = F.silu(mods["dw_bn"](mods["dw_conv"](h)))
            s = h.mean((2, 3), keepdim=True)
            s = mods["se_expand"](F.silu(mods["se_reduce"](s)))
            h = h * torch.sigmoid(s)
            h = mods["project_bn"](mods["project_conv"](h))
            if stride == 1 and in_ch == out_ch:
                h = h + inp
            want = h.numpy().transpose(0, 2, 3, 1)

        from srbh_tpu.train.convert import _bn, _conv

        sd = {f"{mname}.{kk}": vv.numpy() for mname, m in mods.items()
              for kk, vv in m.state_dict().items()}
        params, stats = {}, {}
        for cname in mods:
            if cname.endswith("_bn"):
                params[cname], stats[cname] = _bn(sd, cname)
            else:
                params[cname] = _conv(sd, cname)

        blk = MBConv(out_ch=out_ch, expand_ratio=expand, kernel=k,
                     stride=stride)
        out = blk.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x_np), train=False)
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)


class TestHRFuseResidualTorchOracle:
    """Numeric forward oracle for the flagship's fusion head
    (SR/HRfuse.py:173-190): torch replica of Upsampler (conv->PixelShuffle
    x2 octaves) + 3 BasicBlocks + conv_last, mapped through
    convert_hrfuse_residual — pins the pixel-shuffle channel ordering and
    the cat([x_lr, x_hr]) fusion order."""

    def test_forward_matches_torch(self):
        import torch.nn as tnn
        import torch.nn.functional as F

        from srbh_tpu.models.hrfuse import HRFuseResidual
        from srbh_tpu.train.convert import convert_hrfuse_residual

        torch.manual_seed(2)
        lr_ch = hr_ch = mid = 16

        def basic_block(inp, planes):
            blk = tnn.Module()
            blk.conv1 = tnn.Conv2d(inp, planes, 3, padding=1, bias=False)
            blk.bn1 = tnn.BatchNorm2d(planes)
            blk.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
            blk.bn2 = tnn.BatchNorm2d(planes)
            if inp != planes:
                blk.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes, 1, bias=False),
                    tnn.BatchNorm2d(planes))
            else:
                blk.downsample = None
            for m in blk.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.3)
                    m.running_var.uniform_(0.5, 2.0)
                    m.weight.data.normal_(1, 0.2)
                    m.bias.data.normal_(0, 0.2)
                    m.eval()
            return blk

        head = tnn.Module()
        head.upsampler = tnn.Sequential(
            tnn.Conv2d(lr_ch, 4 * lr_ch, 3, padding=1), tnn.PixelShuffle(2),
            tnn.Conv2d(lr_ch, 4 * lr_ch, 3, padding=1), tnn.PixelShuffle(2))
        head.fuse = tnn.Sequential(basic_block(lr_ch + hr_ch, mid),
                                   basic_block(mid, mid),
                                   basic_block(mid, mid))
        head.conv_last = tnn.Conv2d(mid, 1, 3, padding=1)

        rng = np.random.default_rng(5)
        x_lr = rng.normal(size=(2, 8, 8, lr_ch)).astype(np.float32)
        x_hr = rng.normal(size=(2, 32, 32, hr_ch)).astype(np.float32)

        def tblock(blk, x):
            idn = x if blk.downsample is None else blk.downsample(x)
            out = F.relu(blk.bn1(blk.conv1(x)))
            out = blk.bn2(blk.conv2(out))
            return F.relu(out + idn)

        with torch.no_grad():
            t_lr = torch.from_numpy(x_lr.transpose(0, 3, 1, 2))
            t_hr = torch.from_numpy(x_hr.transpose(0, 3, 1, 2))
            up = head.upsampler(t_lr)
            h = torch.cat([up, t_hr], dim=1)
            for blk in head.fuse:
                h = tblock(blk, h)
            want = head.conv_last(h).numpy().transpose(0, 2, 3, 1)

        sd = {f"head.{k}": v.numpy() for k, v in head.state_dict().items()}
        params, stats = convert_hrfuse_residual(sd, "head")
        m = HRFuseResidual(mid_chans=mid, out_chans=1, upscale=4)
        out = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x_lr), jnp.asarray(x_hr), train=False)
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)


class TestConvertCLI:
    def test_espcn_tar_to_npz_roundtrip(self, tmp_path):
        """CLI end-to-end: torch tar -> npz -> load_tree_npz applies and
        matches the direct converter output."""
        tm = torch.nn.ModuleDict({
            "conv1": torch.nn.Conv2d(4, 64, 5, 1, 2),
            "conv2": torch.nn.Conv2d(64, 32, 3, 1, 1),
            "conv3": torch.nn.Conv2d(32, 48, 3, 1, 1),
        })
        tar = tmp_path / "espcn.tar"
        torch.save({"state_dict": tm.state_dict()}, tar)
        out = tmp_path / "espcn.npz"
        convert.main([str(tar), str(out), "--arch", "espcn"])

        tree = convert.load_tree_npz(str(out))
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        want = convert.convert_espcn(sd)
        for i in (1, 2, 3):
            np.testing.assert_array_equal(
                tree["params"][f"conv{i}"]["kernel"],
                want["params"][f"conv{i}"]["kernel"])

        from srbh_tpu.models import ESPCN
        x = jnp.zeros((1, 8, 8, 4))
        y = jax.jit(lambda v, x: ESPCN(upscale_factor=4).apply(v, x))(tree, x)
        assert y.shape == (1, 32, 32, 48 // 16)

    def test_height_tar_carries_log_vars(self, tmp_path):
        """--arch height stashes the reference tar's log_vars (train.py:199)
        in the npz. Uses a tiny fake 'height' sd via the espcn arch guard —
        here we only exercise the log_vars path with a real height sd being
        too heavy, so assert the CLI surfaces a KeyError-free conversion on
        a minimal synthetic state dict is out of scope; instead check
        save/load of log_vars through the tree helpers."""
        lv = [torch.tensor(0.5), torch.tensor(-1.0), torch.tensor(2.0)]
        tree = {"log_vars": {f"w{i+1}": np.float32(float(v))
                             for i, v in enumerate(lv)}}
        p = tmp_path / "lv.npz"
        convert.save_tree_npz(str(p), tree)
        back = convert.load_tree_npz(str(p))
        assert back["log_vars"]["w2"] == np.float32(-1.0)

    def test_auto_key_detection_net_g_ema(self, tmp_path):
        tm = torch.nn.ModuleDict({
            "conv1": torch.nn.Conv2d(4, 8, 5, 1, 2),
            "conv2": torch.nn.Conv2d(8, 8, 3, 1, 1),
            "conv3": torch.nn.Conv2d(8, 48, 3, 1, 1),
        })
        tar = tmp_path / "g.tar"
        torch.save({"net_g_ema": tm.state_dict(), "iter": 3}, tar)
        out = tmp_path / "g.npz"
        convert.main([str(tar), str(out), "--arch", "espcn"])
        tree = convert.load_tree_npz(str(out))
        assert tree["params"]["conv3"]["kernel"].shape == (3, 3, 8, 48)
