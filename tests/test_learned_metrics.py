"""CLIPScore / LPIPS: numerical parity of the Flax towers + converters
against torch reference implementations built in-test (torch is available on
CPU; the *pretrained packages* clip/open_clip/lpips are not — so the torch
side here re-implements their documented forward passes with random weights,
which is exactly what the converters must map correctly).

Reference: SR/psnr_ssim.py:493-602.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srbh_tpu.metrics.learned import (
    calculate_clipscore,
    calculate_lpips,
    clip_vision_model,
)
from srbh_tpu.models.clip import CLIPVisionTransformer, convert_clip_visual
from srbh_tpu.models.lpips import LPIPS, convert_lpips_alex

torch = pytest.importorskip("torch")

WIDTH, HEADS, LAYERS, PATCH, IMG = 64, 4, 2, 8, 24


def _torch_clip_visual_sd(rng):
    """Random weights in the OpenAI CLIP ``visual.*`` state_dict layout."""
    n_tok = (IMG // PATCH) ** 2 + 1
    sd = {
        "conv1.weight": rng.normal(0, 0.02, (WIDTH, 3, PATCH, PATCH)),
        "class_embedding": rng.normal(0, 0.02, (WIDTH,)),
        "positional_embedding": rng.normal(0, 0.02, (n_tok, WIDTH)),
        "ln_pre.weight": rng.uniform(0.5, 1.5, (WIDTH,)),
        "ln_pre.bias": rng.normal(0, 0.02, (WIDTH,)),
        "ln_post.weight": rng.uniform(0.5, 1.5, (WIDTH,)),
        "ln_post.bias": rng.normal(0, 0.02, (WIDTH,)),
        "proj": rng.normal(0, 0.02, (WIDTH, 32)),
    }
    for i in range(LAYERS):
        t = f"transformer.resblocks.{i}."
        sd.update({
            t + "ln_1.weight": rng.uniform(0.5, 1.5, (WIDTH,)),
            t + "ln_1.bias": rng.normal(0, 0.02, (WIDTH,)),
            t + "ln_2.weight": rng.uniform(0.5, 1.5, (WIDTH,)),
            t + "ln_2.bias": rng.normal(0, 0.02, (WIDTH,)),
            t + "attn.in_proj_weight": rng.normal(0, 0.05, (3 * WIDTH, WIDTH)),
            t + "attn.in_proj_bias": rng.normal(0, 0.02, (3 * WIDTH,)),
            t + "attn.out_proj.weight": rng.normal(0, 0.05, (WIDTH, WIDTH)),
            t + "attn.out_proj.bias": rng.normal(0, 0.02, (WIDTH,)),
            t + "mlp.c_fc.weight": rng.normal(0, 0.05, (4 * WIDTH, WIDTH)),
            t + "mlp.c_fc.bias": rng.normal(0, 0.02, (4 * WIDTH,)),
            t + "mlp.c_proj.weight": rng.normal(0, 0.05, (WIDTH, 4 * WIDTH)),
            t + "mlp.c_proj.bias": rng.normal(0, 0.02, (WIDTH,)),
        })
    return {k: v.astype(np.float32) for k, v in sd.items()}


def _torch_clip_forward(sd, x_nchw):
    """OpenAI CLIP VisionTransformer.forward, verbatim semantics
    (conv -> tokens -> pre-LN blocks with QuickGELU -> ln_post[cls] @ proj)."""
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    x = torch.from_numpy(x_nchw)
    x = F.conv2d(x, t["conv1.weight"], stride=PATCH)
    b = x.shape[0]
    x = x.reshape(b, WIDTH, -1).permute(0, 2, 1)  # (B, N, W)
    cls = t["class_embedding"].expand(b, 1, WIDTH)
    x = torch.cat([cls, x], dim=1) + t["positional_embedding"]
    x = F.layer_norm(x, (WIDTH,), t["ln_pre.weight"], t["ln_pre.bias"])
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}."
        y = F.layer_norm(x, (WIDTH,), t[p + "ln_1.weight"], t[p + "ln_1.bias"])
        y, _ = F.multi_head_attention_forward(
            y.transpose(0, 1), y.transpose(0, 1), y.transpose(0, 1),
            WIDTH, HEADS, t[p + "attn.in_proj_weight"],
            t[p + "attn.in_proj_bias"], None, None, False, 0.0,
            t[p + "attn.out_proj.weight"], t[p + "attn.out_proj.bias"],
            need_weights=False)
        x = x + y.transpose(0, 1)
        y = F.layer_norm(x, (WIDTH,), t[p + "ln_2.weight"], t[p + "ln_2.bias"])
        y = y @ t[p + "mlp.c_fc.weight"].T + t[p + "mlp.c_fc.bias"]
        y = y * torch.sigmoid(1.702 * y)  # QuickGELU
        y = y @ t[p + "mlp.c_proj.weight"].T + t[p + "mlp.c_proj.bias"]
        x = x + y
    x = F.layer_norm(x[:, 0], (WIDTH,), t["ln_post.weight"], t["ln_post.bias"])
    return (x @ t["proj"]).numpy()


class TestCLIPTower:
    def test_matches_torch_forward(self):
        rng = np.random.default_rng(0)
        sd = _torch_clip_visual_sd(rng)
        model = CLIPVisionTransformer(image_size=IMG, patch_size=PATCH,
                                      width=WIDTH, layers=LAYERS, heads=HEADS,
                                      output_dim=32)
        variables = convert_clip_visual(sd, layers=LAYERS)
        x = rng.uniform(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
        got = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
        want = _torch_clip_forward(sd, x.transpose(0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_converter_accepts_visual_prefix(self):
        rng = np.random.default_rng(1)
        sd = {"visual." + k: v for k, v in _torch_clip_visual_sd(rng).items()}
        v = convert_clip_visual(sd, layers=LAYERS)
        assert v["params"]["conv1"]["kernel"].shape == (PATCH, PATCH, 3, WIDTH)

    def test_vit_b16_structure(self):
        """The real preset initialises with CLIP ViT-B/16's parameter count
        (OpenAI visual tower: 86.19 M incl. the 512-d projection)."""
        model = clip_vision_model("clip-ViT-B/16")
        variables = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32))
        n = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(variables))
        assert n == 86_192_640, n

    def test_unknown_preset_raises(self):
        with pytest.raises(ValueError, match="not supported"):
            clip_vision_model("resnet50")


def _torch_lpips_sd(rng):
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    feat_idx = (0, 3, 6, 8, 10)
    sd = {}
    for i, (shape, fi) in enumerate(zip(shapes, feat_idx)):
        sd[f"net.slice{i + 1}.{fi}.weight"] = rng.normal(
            0, 0.05, shape).astype(np.float32)
        sd[f"net.slice{i + 1}.{fi}.bias"] = rng.normal(
            0, 0.02, (shape[0],)).astype(np.float32)
        sd[f"lin{i}.model.1.weight"] = rng.uniform(
            0, 0.1, (1, shape[0], 1, 1)).astype(np.float32)
    return sd


def _torch_lpips_forward(sd, x0_nchw, x1_nchw):
    """lpips.LPIPS(net='alex').forward with explicit ops."""
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        taps = []
        specs = [("net.slice1.0", 4, 2, False), ("net.slice2.3", 1, 2, True),
                 ("net.slice3.6", 1, 1, True), ("net.slice4.8", 1, 1, False),
                 ("net.slice5.10", 1, 1, False)]
        for name, stride, pad, pool in specs:
            if pool:
                x = F.max_pool2d(x, 3, 2)
            x = F.conv2d(x, t[name + ".weight"], t[name + ".bias"],
                         stride=stride, padding=pad)
            x = F.relu(x)
            taps.append(x)
        return taps

    f0, f1 = feats(torch.from_numpy(x0_nchw)), feats(torch.from_numpy(x1_nchw))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = F.conv2d((a - b) ** 2, t[f"lin{i}.model.1.weight"])
        total = total + d.mean((1, 2, 3))
    return total.numpy()


class TestLPIPS:
    def test_matches_torch_forward(self):
        rng = np.random.default_rng(2)
        sd = _torch_lpips_sd(rng)
        variables = convert_lpips_alex(sd)
        x0 = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        x1 = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        got = np.asarray(jax.jit(LPIPS().apply)(
            variables, jnp.asarray(x0), jnp.asarray(x1)))
        want = _torch_lpips_forward(sd, x0.transpose(0, 3, 1, 2),
                                    x1.transpose(0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)

    def test_torchvision_key_style_trunk(self):
        rng = np.random.default_rng(3)
        sd = _torch_lpips_sd(rng)
        tv = {}
        for i, fi in enumerate((0, 3, 6, 8, 10)):
            tv[f"features.{fi}.weight"] = sd[f"net.slice{i + 1}.{fi}.weight"]
            tv[f"features.{fi}.bias"] = sd[f"net.slice{i + 1}.{fi}.bias"]
        v = convert_lpips_alex(tv)
        assert set(v["params"]["net"]) == {f"conv{i}" for i in range(5)}


class TestMetricFunctions:
    def test_lpips_identical_images_is_zero(self):
        rng = np.random.default_rng(4)
        variables = convert_lpips_alex(_torch_lpips_sd(rng))
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        assert calculate_lpips(img, img, variables) == pytest.approx(0.0,
                                                                     abs=1e-6)

    def test_clipscore_identical_images_is_one(self):
        rng = np.random.default_rng(5)
        sd = _torch_clip_visual_sd(rng)
        model = CLIPVisionTransformer(image_size=IMG, patch_size=PATCH,
                                      width=WIDTH, layers=LAYERS, heads=HEADS,
                                      output_dim=32)
        variables = convert_clip_visual(sd, layers=LAYERS)
        img = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
        score = calculate_clipscore(img, img, variables, model=model)
        assert score == pytest.approx(1.0, abs=1e-5)

    def test_clipscore_grayscale_is_channel_repeated(self):
        rng = np.random.default_rng(6)
        sd = _torch_clip_visual_sd(rng)
        model = CLIPVisionTransformer(image_size=IMG, patch_size=PATCH,
                                      width=WIDTH, layers=LAYERS, heads=HEADS,
                                      output_dim=32)
        variables = convert_clip_visual(sd, layers=LAYERS)
        g = rng.integers(0, 255, (IMG, IMG)).astype(np.uint8)
        s1 = calculate_clipscore(g, g[..., None], variables, model=model)
        rgb = np.repeat(g[..., None], 3, -1)
        s2 = calculate_clipscore(rgb, rgb, variables, model=model)
        assert s1 == pytest.approx(s2, abs=1e-6)

    def test_missing_weights_raises_helpfully(self):
        img = np.zeros((24, 24, 3), np.uint8)
        with pytest.raises(ValueError, match="convert_clip_visual"):
            calculate_clipscore(img, img)
        with pytest.raises(ValueError, match="convert_lpips_alex"):
            calculate_lpips(img, img)
        with pytest.raises(ValueError, match="alex"):
            calculate_lpips(img, img, {}, net="vgg")


# ---- SigLIP MAP tower + CLIPA avg-pool variant (SR/psnr_ssim.py:496-507) ----

MLP = 96  # non-4x to exercise the explicit mlp_dim


def _attn_torch(y, qkv_w, qkv_b, out_w, out_b, heads):
    b, n, w = y.shape
    hd = w // heads
    qkv = y @ qkv_w.T + qkv_b
    q, k, v = qkv.chunk(3, dim=-1)
    q = q.reshape(b, n, heads, hd).permute(0, 2, 1, 3)
    k = k.reshape(b, n, heads, hd).permute(0, 2, 1, 3)
    v = v.reshape(b, n, heads, hd).permute(0, 2, 1, 3)
    a = torch.softmax(q @ k.transpose(-2, -1) / (hd ** 0.5), dim=-1)
    o = (a @ v).permute(0, 2, 1, 3).reshape(b, n, w)
    return o @ out_w.T + out_b


def _torch_siglip_sd(rng):
    n_tok = (IMG // PATCH) ** 2
    sd = {
        "patch_embed.proj.weight": rng.normal(0, 0.02, (WIDTH, 3, PATCH, PATCH)),
        "patch_embed.proj.bias": rng.normal(0, 0.02, (WIDTH,)),
        "pos_embed": rng.normal(0, 0.02, (1, n_tok, WIDTH)),
        "norm.weight": rng.uniform(0.5, 1.5, (WIDTH,)),
        "norm.bias": rng.normal(0, 0.02, (WIDTH,)),
        "attn_pool.latent": rng.normal(0, 0.02, (1, 1, WIDTH)),
        "attn_pool.q.weight": rng.normal(0, 0.05, (WIDTH, WIDTH)),
        "attn_pool.q.bias": rng.normal(0, 0.02, (WIDTH,)),
        "attn_pool.kv.weight": rng.normal(0, 0.05, (2 * WIDTH, WIDTH)),
        "attn_pool.kv.bias": rng.normal(0, 0.02, (2 * WIDTH,)),
        "attn_pool.proj.weight": rng.normal(0, 0.05, (WIDTH, WIDTH)),
        "attn_pool.proj.bias": rng.normal(0, 0.02, (WIDTH,)),
        "attn_pool.norm.weight": rng.uniform(0.5, 1.5, (WIDTH,)),
        "attn_pool.norm.bias": rng.normal(0, 0.02, (WIDTH,)),
        "attn_pool.mlp.fc1.weight": rng.normal(0, 0.05, (MLP, WIDTH)),
        "attn_pool.mlp.fc1.bias": rng.normal(0, 0.02, (MLP,)),
        "attn_pool.mlp.fc2.weight": rng.normal(0, 0.05, (WIDTH, MLP)),
        "attn_pool.mlp.fc2.bias": rng.normal(0, 0.02, (WIDTH,)),
    }
    for i in range(LAYERS):
        t = f"blocks.{i}."
        sd.update({
            t + "norm1.weight": rng.uniform(0.5, 1.5, (WIDTH,)),
            t + "norm1.bias": rng.normal(0, 0.02, (WIDTH,)),
            t + "norm2.weight": rng.uniform(0.5, 1.5, (WIDTH,)),
            t + "norm2.bias": rng.normal(0, 0.02, (WIDTH,)),
            t + "attn.qkv.weight": rng.normal(0, 0.05, (3 * WIDTH, WIDTH)),
            t + "attn.qkv.bias": rng.normal(0, 0.02, (3 * WIDTH,)),
            t + "attn.proj.weight": rng.normal(0, 0.05, (WIDTH, WIDTH)),
            t + "attn.proj.bias": rng.normal(0, 0.02, (WIDTH,)),
            t + "mlp.fc1.weight": rng.normal(0, 0.05, (MLP, WIDTH)),
            t + "mlp.fc1.bias": rng.normal(0, 0.02, (MLP,)),
            t + "mlp.fc2.weight": rng.normal(0, 0.05, (WIDTH, MLP)),
            t + "mlp.fc2.bias": rng.normal(0, 0.02, (WIDTH,)),
        })
    return {k: v.astype(np.float32) for k, v in sd.items()}


def _torch_siglip_forward(sd, x_nchw):
    """timm SigLIP trunk + AttentionPoolLatent, verbatim semantics."""
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    ln = lambda x, p: F.layer_norm(x, (WIDTH,), t[p + ".weight"],
                                   t[p + ".bias"], eps=1e-6)
    x = torch.from_numpy(x_nchw)
    x = F.conv2d(x, t["patch_embed.proj.weight"],
                 t["patch_embed.proj.bias"], stride=PATCH)
    b = x.shape[0]
    x = x.reshape(b, WIDTH, -1).permute(0, 2, 1) + t["pos_embed"]
    for i in range(LAYERS):
        p = f"blocks.{i}."
        x = x + _attn_torch(ln(x, p + "norm1"), t[p + "attn.qkv.weight"],
                            t[p + "attn.qkv.bias"], t[p + "attn.proj.weight"],
                            t[p + "attn.proj.bias"], HEADS)
        y = ln(x, p + "norm2") @ t[p + "mlp.fc1.weight"].T + t[p + "mlp.fc1.bias"]
        x = x + F.gelu(y) @ t[p + "mlp.fc2.weight"].T + t[p + "mlp.fc2.bias"]
    x = ln(x, "norm")
    # AttentionPoolLatent
    hd = WIDTH // HEADS
    q = (t["attn_pool.latent"].expand(b, 1, WIDTH)
         @ t["attn_pool.q.weight"].T + t["attn_pool.q.bias"])
    kv = x @ t["attn_pool.kv.weight"].T + t["attn_pool.kv.bias"]
    k, v = kv.chunk(2, dim=-1)
    q = q.reshape(b, 1, HEADS, hd).permute(0, 2, 1, 3)
    k = k.reshape(b, -1, HEADS, hd).permute(0, 2, 1, 3)
    v = v.reshape(b, -1, HEADS, hd).permute(0, 2, 1, 3)
    a = torch.softmax(q @ k.transpose(-2, -1) / (hd ** 0.5), dim=-1)
    o = (a @ v).permute(0, 2, 1, 3).reshape(b, 1, WIDTH)
    o = o @ t["attn_pool.proj.weight"].T + t["attn_pool.proj.bias"]
    z = ln(o, "attn_pool.norm")
    z = F.gelu(z @ t["attn_pool.mlp.fc1.weight"].T
               + t["attn_pool.mlp.fc1.bias"])
    z = z @ t["attn_pool.mlp.fc2.weight"].T + t["attn_pool.mlp.fc2.bias"]
    return (o + z)[:, 0].numpy()


def test_siglip_map_tower_matches_torch():
    from srbh_tpu.models.clip import MAPVisionTransformer, convert_siglip_visual

    rng = np.random.RandomState(7)
    sd = _torch_siglip_sd(rng)
    x = rng.uniform(0, 1, (2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_siglip_forward(sd, x)
    m = MAPVisionTransformer(image_size=IMG, patch_size=PATCH, width=WIDTH,
                             layers=LAYERS, heads=HEADS, mlp_dim=MLP)
    variables = convert_siglip_visual(sd, layers=LAYERS)
    got = np.asarray(jax.jit(m.apply)(variables,
                                      jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_clipa_avg_pool_tower_matches_torch():
    """CLIPA variant: no ln_pre, avg pool over patch tokens, ln_post after
    pooling, exact GELU, custom mlp_dim (open_clip ViT-bigG-14-CLIPA)."""
    import torch.nn.functional as F
    from srbh_tpu.models.clip import CLIPVisionTransformer, convert_clip_visual

    rng = np.random.RandomState(11)
    sd = _torch_clip_visual_sd(rng)
    del sd["ln_pre.weight"], sd["ln_pre.bias"]  # no_ln_pre checkpoints
    # reshape the MLP to the custom width
    for i in range(LAYERS):
        t = f"transformer.resblocks.{i}."
        sd[t + "mlp.c_fc.weight"] = rng.normal(0, 0.05, (MLP, WIDTH)).astype(np.float32)
        sd[t + "mlp.c_fc.bias"] = rng.normal(0, 0.02, (MLP,)).astype(np.float32)
        sd[t + "mlp.c_proj.weight"] = rng.normal(0, 0.05, (WIDTH, MLP)).astype(np.float32)

    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    x = rng.uniform(0, 1, (2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        h = F.conv2d(torch.from_numpy(x), t["conv1.weight"], stride=PATCH)
        b = h.shape[0]
        h = h.reshape(b, WIDTH, -1).permute(0, 2, 1)
        h = torch.cat([t["class_embedding"].expand(b, 1, WIDTH), h], 1)
        h = h + t["positional_embedding"]
        for i in range(LAYERS):
            p = f"transformer.resblocks.{i}."
            y = F.layer_norm(h, (WIDTH,), t[p + "ln_1.weight"], t[p + "ln_1.bias"])
            h = h + _attn_torch(y, t[p + "attn.in_proj_weight"],
                                t[p + "attn.in_proj_bias"],
                                t[p + "attn.out_proj.weight"],
                                t[p + "attn.out_proj.bias"], HEADS)
            y = F.layer_norm(h, (WIDTH,), t[p + "ln_2.weight"], t[p + "ln_2.bias"])
            y = F.gelu(y @ t[p + "mlp.c_fc.weight"].T + t[p + "mlp.c_fc.bias"])
            h = h + y @ t[p + "mlp.c_proj.weight"].T + t[p + "mlp.c_proj.bias"]
        pooled = h[:, 1:].mean(dim=1)
        pooled = F.layer_norm(pooled, (WIDTH,), t["ln_post.weight"],
                              t["ln_post.bias"])
        ref = (pooled @ t["proj"]).numpy()

    m = CLIPVisionTransformer(image_size=IMG, patch_size=PATCH, width=WIDTH,
                              layers=LAYERS, heads=HEADS, output_dim=32,
                              use_quick_gelu=False, mlp_dim=MLP,
                              ln_pre=False, pool="avg",
                              final_ln_after_pool=True)
    variables = convert_clip_visual(sd, layers=LAYERS)
    got = np.asarray(jax.jit(m.apply)(variables,
                                      jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_clipscore_preset_contract():
    from srbh_tpu.metrics.learned import clip_vision_model

    m = clip_vision_model("siglip-ViT-SO400M-14")
    assert m.width == 1152 and m.layers == 27 and m.mlp_dim == 4304
    m = clip_vision_model("clipa-ViT-bigG-14")
    assert m.pool == "avg" and not m.ln_pre and m.final_ln_after_pool
    with pytest.raises(ValueError):
        clip_vision_model("resnet50")


def test_pt_variants_match_single_image_paths():
    """The batched _pt twins (SR/psnr_ssim.py:525-560,584-602) agree with
    the single-image functions on a duplicated batch, and 'resnet50'
    aliases the SigLIP tower like the reference."""
    from srbh_tpu.metrics.learned import (
        calculate_clipscore,
        calculate_clipscore_pt,
        calculate_lpips,
        calculate_lpips_pt,
        clip_vision_model,
    )
    from srbh_tpu.models.clip import MAPVisionTransformer
    from srbh_tpu.models.lpips import LPIPS

    rng = np.random.RandomState(0)
    # 64 px: AlexNet's stride/pool ladder collapses smaller inputs to an
    # empty spatial extent (upstream lpips has the same minimum)
    a = rng.randint(0, 256, (64, 64, 3)).astype(np.float32)
    b = rng.randint(0, 256, (64, 64, 3)).astype(np.float32)

    m = MAPVisionTransformer(image_size=64, patch_size=16, width=32,
                             layers=1, heads=4, mlp_dim=64)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    s1 = calculate_clipscore(a, b, variables=v, model=m)
    sb = calculate_clipscore_pt(np.stack([a, a]) / 255.0,
                                np.stack([b, b]) / 255.0,
                                variables=v, model=m)
    assert abs(s1 - sb) < 1e-5

    lp = LPIPS()
    lv = jax.jit(lp.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                          jnp.zeros((1, 64, 64, 3)))
    d1 = calculate_lpips(a, b, variables=lv, model=lp)
    db = calculate_lpips_pt(np.stack([a, a]) / 255.0,
                            np.stack([b, b]) / 255.0,
                            variables=lv, model=lp)
    assert abs(d1 - db) < 1e-5

    # 'resnet50' aliases SigLIP only in the _pt variant (psnr_ssim.py:539-542);
    # the single-image path keeps the reference's raise (:507-508)
    from srbh_tpu.metrics.learned import _PT_ALIASES
    assert _PT_ALIASES["resnet50"] == "siglip-ViT-SO400M-14"
    with pytest.raises(ValueError):
        clip_vision_model("resnet50")
