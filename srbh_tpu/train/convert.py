"""PyTorch state_dict -> Flax param-tree converters.

The reference ships/consumes torch ``.tar`` checkpoints (train.py:199-212,
SR/rrdbnet_arch.py:511-522). These converters map their key layouts onto
this framework's module trees so trained reference weights can be evaluated
for output-fidelity parity (SURVEY.md §5.4). Layout rules:

* Conv2d ``weight`` OIHW -> HWIO; Linear ``weight`` (out, in) -> (in, out).
* BatchNorm: weight/bias -> scale/bias params; running_mean/var ->
  ``batch_stats`` mean/var.
* Spectral-norm convs store ``weight_orig`` (+ ``weight_u``); the original
  kernel maps to the wrapped conv's param and u seeds the power iteration.
* EDSR checkpoints may omit the scale-specific ``tail`` — mirrored by
  ``strict=False`` skipping missing keys (SR/edsr.py:157-174).

State dicts are accepted as any mapping of name -> array-like (a torch
``state_dict`` loaded with ``torch.load(..., map_location='cpu')`` works;
values are converted with ``np.asarray``).
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np


def _conv(sd, name) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _dense(sd, name) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _bn(sd, name) -> Tuple[dict, dict]:
    params = {"scale": np.asarray(sd[f"{name}.weight"]),
              "bias": np.asarray(sd[f"{name}.bias"])}
    stats = {"mean": np.asarray(sd[f"{name}.running_mean"]),
             "var": np.asarray(sd[f"{name}.running_var"])}
    return params, stats


def convert_espcn(sd: Mapping) -> dict:
    """ESPC (SR/espcn.py:9-23): conv1/conv2/conv3."""
    return {"params": {f"conv{i}": _conv(sd, f"conv{i}") for i in (1, 2, 3)}}


def convert_edsr(sd: Mapping, n_resblocks: int = 16, strict: bool = True) -> dict:
    """EDSR (SR/edsr.py:105-174): head.0 / body.N.body.{0,2} / body.N_last /
    tail.0.N (upsampler convs) / tail.1. ``strict=False`` skips a missing
    tail (partial load, SR/edsr.py:157-174)."""
    p: dict = {"head": _conv(sd, "head.0")}
    for i in range(n_resblocks):
        p[f"body_{i}"] = {"conv1": _conv(sd, f"body.{i}.body.0"),
                          "conv2": _conv(sd, f"body.{i}.body.2")}
    p["body_conv"] = _conv(sd, f"body.{n_resblocks}")
    ups = {}
    # tail.0 is the Upsampler Sequential: conv at even indices (0, 2, ...)
    idx = 0
    while f"tail.0.{idx * 2}.weight" in sd:
        ups[f"conv_{idx}"] = _conv(sd, f"tail.0.{idx * 2}")
        idx += 1
    if ups:
        p["upsampler"] = ups
    if "tail.1.weight" in sd:
        p["tail"] = _conv(sd, "tail.1")
    elif strict:
        raise KeyError("tail.1 missing from EDSR state_dict (use strict=False)")
    return {"params": p}


def convert_rrdbnet(sd: Mapping, num_block: int = 23) -> dict:
    """RRDBNet (SR/rrdbnet_arch.py:170-240): conv_first / body.N.rdbM.convK /
    conv_body / conv_up1 / conv_up2 / conv_hr / conv_last. Accepts the
    ``net_g_ema`` / ``params_ema`` flat dicts directly."""
    p: dict = {"conv_first": _conv(sd, "conv_first")}
    for i in range(num_block):
        blk = {}
        for r in (1, 2, 3):
            blk[f"rdb{r}"] = {f"conv{c}": _conv(sd, f"body.{i}.rdb{r}.conv{c}")
                              for c in (1, 2, 3, 4, 5)}
        p[f"body_{i}"] = blk
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
        if f"{name}.weight" in sd:
            p[name] = _conv(sd, name)
    return {"params": p}


def convert_rrdbnet_simple(sd: Mapping, num_block: int = 23) -> dict:
    """Older ESRGAN generator (SR/RRDBNet.py:53-78): conv_first /
    RRDB_trunk.N.RDBM.convK / trunk_conv / upconv1 / upconv2 / HRconv /
    conv_last."""
    p: dict = {"conv_first": _conv(sd, "conv_first")}
    for i in range(num_block):
        p[f"body_{i}"] = {
            f"rdb{r}": {f"conv{c}": _conv(sd, f"RRDB_trunk.{i}.RDB{r}.conv{c}")
                        for c in (1, 2, 3, 4, 5)}
            for r in (1, 2, 3)}
    for name in ("trunk_conv", "upconv1", "upconv2", "HRconv", "conv_last"):
        p[name] = _conv(sd, name)
    return {"params": p}


def convert_unet_discriminator_sn(sd: Mapping) -> dict:
    """UNetDiscriminatorSN (SR/rrdbnet_arch.py:244-303): conv0/conv9 plain,
    conv1..conv8 spectral-normalised. The checkpoint's ``weight_u`` seeds
    flax SpectralNorm's power-iteration state (torch's u over W=(cout, -1)
    is flax's u over the transposed matrix), and sigma is recomputed from
    (W, u) so the first converted forward matches the torch scaling."""
    params: dict = {"conv0": _conv(sd, "conv0"), "conv9": _conv(sd, "conv9")}
    stats: dict = {}
    for i in range(1, 9):
        w_t = np.asarray(sd[f"conv{i}.weight_orig"])  # (cout, cin, kh, kw)
        params[f"conv{i}"] = {"kernel": w_t.transpose(2, 3, 1, 0)}
        u = np.asarray(sd[f"conv{i}.weight_u"]).reshape(-1)
        mat = w_t.reshape(w_t.shape[0], -1)  # (cout, cin*k*k)
        v = mat.T @ u
        v = v / (np.linalg.norm(v) + 1e-12)
        sigma = float(u @ (mat @ v))
        stats[f"conv{i}_sn"] = {
            f"conv{i}/kernel/sigma": np.asarray(sigma, np.float32),
            f"conv{i}/kernel/u": u[None, :].astype(np.float32),
        }
    return {"params": params, "batch_stats": stats}


def convert_swinir(sd: Mapping, depths=(6, 6, 6, 6),
                   upsampler: str = "pixelshuffle") -> dict:
    """SwinIR (SR/network_swinir.py): layers.N.residual_group.blocks.M.* ->
    layerN.blockM.*; linear weights transposed; biases/tables copied."""
    p: dict = {}
    if "conv_first.weight" in sd:
        p["conv_first"] = _conv(sd, "conv_first")
    for li, depth in enumerate(depths):
        layer: dict = {}
        for bi in range(depth):
            base = f"layers.{li}.residual_group.blocks.{bi}"
            blk = {
                "norm1": {"scale": np.asarray(sd[f"{base}.norm1.weight"]),
                          "bias": np.asarray(sd[f"{base}.norm1.bias"])},
                "norm2": {"scale": np.asarray(sd[f"{base}.norm2.weight"]),
                          "bias": np.asarray(sd[f"{base}.norm2.bias"])},
                "attn": {
                    "qkv": _dense(sd, f"{base}.attn.qkv"),
                    "proj": _dense(sd, f"{base}.attn.proj"),
                    "relative_position_bias_table": np.asarray(
                        sd[f"{base}.attn.relative_position_bias_table"]),
                },
                "mlp": {"fc1": _dense(sd, f"{base}.mlp.fc1"),
                        "fc2": _dense(sd, f"{base}.mlp.fc2")},
            }
            layer[f"block{bi}"] = blk
        if f"layers.{li}.conv.weight" in sd:
            layer["conv"] = _conv(sd, f"layers.{li}.conv")
        p[f"layer{li}"] = layer
    for tname, fname in (("norm", "norm"), ("patch_embed.norm", "patch_norm")):
        if f"{tname}.weight" in sd:
            p[fname] = {"scale": np.asarray(sd[f"{tname}.weight"]),
                        "bias": np.asarray(sd[f"{tname}.bias"])}
    for name in ("conv_after_body", "conv_last", "conv_up1", "conv_up2",
                 "conv_hr"):
        if f"{name}.weight" in sd:
            p[name] = _conv(sd, name)
    if "conv_before_upsample.0.weight" in sd:
        p["conv_before_upsample"] = _conv(sd, "conv_before_upsample.0")
    # classical-SR Upsample Sequential vs lightweight UpsampleOneStep:
    # both store "upsample.0.weight", so the upsampler type disambiguates
    if upsampler == "pixelshuffledirect":
        if "upsample.0.weight" in sd:
            p["upsample_conv"] = _conv(sd, "upsample.0")
    else:
        idx = 0
        ups = {}
        while f"upsample.{idx * 2}.weight" in sd:
            ups[f"conv_{idx}"] = _conv(sd, f"upsample.{idx * 2}")
            idx += 1
        if ups:
            p["upsample"] = ups
    return {"params": p}


def convert_basic_block(sd: Mapping, prefix: str) -> Tuple[dict, dict]:
    """torchvision-style BasicBlock (SR/HRfuse.py:115-159) -> params+stats."""
    params: dict = {}
    stats: dict = {}
    for cname in ("conv1", "conv2"):
        params[cname] = _conv(sd, f"{prefix}.{cname}")
    for bname in ("bn1", "bn2"):
        bp, bs = _bn(sd, f"{prefix}.{bname}")
        params[bname], stats[bname] = bp, bs
    if f"{prefix}.downsample.0.weight" in sd:
        params["down_conv"] = _conv(sd, f"{prefix}.downsample.0")
        bp, bs = _bn(sd, f"{prefix}.downsample.1")
        params["down_bn"], stats["down_bn"] = bp, bs
    return params, stats


def convert_hrfuse_residual(sd: Mapping, prefix: str) -> Tuple[dict, dict]:
    """HRfuse_residual (SR/HRfuse.py:173-190): upsampler.N convs + 3 fuse
    BasicBlocks + conv_last."""
    params: dict = {}
    stats: dict = {}
    ups = {}
    idx = 0
    while f"{prefix}.upsampler.{idx * 2}.weight" in sd:
        ups[f"conv_{idx}"] = _conv(sd, f"{prefix}.upsampler.{idx * 2}")
        idx += 1
    params["upsampler"] = ups
    for i in range(3):
        bp, bs = convert_basic_block(sd, f"{prefix}.fuse.{i}")
        params[f"fuse{i}"], stats[f"fuse{i}"] = bp, bs
    params["conv_last"] = _conv(sd, f"{prefix}.conv_last")
    return params, stats


def _convert_encoder(sd: Mapping, prefix: str = "",
                     encoder_name: str = "efficientnet-b4"
                     ) -> Tuple[dict, dict]:
    """EfficientNet encoder mapping (efficientnet-pytorch naming):
    ``{prefix}_conv_stem``, ``{prefix}_bn0``, ``{prefix}_blocks.N.
    {_expand_conv,_depthwise_conv,_se_reduce,_se_expand,_project_conv,
    _bn0,_bn1,_bn2}``; the classification head (``_conv_head``/``_bn1``/
    ``_fc``) is dropped — the U-Net consumes stage features only."""
    from srbh_tpu.models.efficientnet import _B0_STAGES, SCALING, round_repeats

    enc_p: dict = {"stem_conv": _conv(sd, f"{prefix}_conv_stem")}
    enc_s: dict = {}
    bp, bs = _bn(sd, f"{prefix}_bn0")
    enc_p["stem_bn"], enc_s["stem_bn"] = bp, bs
    _width, depth, _ = SCALING[encoder_name]
    tn = 0
    for si, (expand, _k, _s, _c, base_r) in enumerate(_B0_STAGES, 1):
        for bi in range(round_repeats(base_r, depth)):
            t = f"{prefix}_blocks.{tn}"
            blk_p: dict = {}
            blk_s: dict = {}
            if expand != 1:
                blk_p["expand_conv"] = _conv(sd, f"{t}._expand_conv")
                bp, bs = _bn(sd, f"{t}._bn0")
                blk_p["expand_bn"], blk_s["expand_bn"] = bp, bs
            blk_p["dw_conv"] = _conv(sd, f"{t}._depthwise_conv")
            bp, bs = _bn(sd, f"{t}._bn1")
            blk_p["dw_bn"], blk_s["dw_bn"] = bp, bs
            blk_p["se_reduce"] = _conv(sd, f"{t}._se_reduce")
            blk_p["se_expand"] = _conv(sd, f"{t}._se_expand")
            blk_p["project_conv"] = _conv(sd, f"{t}._project_conv")
            bp, bs = _bn(sd, f"{t}._bn2")
            blk_p["project_bn"], blk_s["project_bn"] = bp, bs
            enc_p[f"blocks_{si}_{bi}"] = blk_p
            enc_s[f"blocks_{si}_{bi}"] = blk_s
            tn += 1
    return enc_p, enc_s


def convert_efficientnet_imagenet(sd: Mapping,
                                  encoder_name: str = "efficientnet-b4",
                                  in_channels: Optional[int] = None) -> dict:
    """Raw efficientnet-pytorch ImageNet ``state_dict`` -> EfficientNetEncoder
    variables — the reference's ``encoder_weights="imagenet"`` init
    (mymodels.py:242-243, smp get_encoder).

    Acquisition (off-device, zero egress here):
    ``EfficientNet.from_pretrained('efficientnet-b4').state_dict()`` ->
    ``torch.save`` -> convert with this function. When ``in_channels``
    differs from the checkpoint's 3 (the height model uses 8), the stem conv
    is widened by cycling the RGB kernels and rescaling by 3/in_channels —
    smp's ``patch_first_conv`` policy for in_channels > 3.
    """
    enc_p, enc_s = _convert_encoder(sd, "", encoder_name)
    stem = enc_p["stem_conv"]["kernel"]  # HWIO, I == 3
    if in_channels and in_channels != stem.shape[2]:
        enc_p["stem_conv"]["kernel"] = _widen_stem(stem, in_channels)
    return {"params": enc_p, "batch_stats": enc_s}


def load_imagenet_encoder(variables: Mapping, sd: Mapping,
                          encoder_name: str = "efficientnet-b4") -> dict:
    """Graft ImageNet encoder weights into freshly-initialised height-model
    variables, adapting the stem to the model's input channel count."""
    in_ch = variables["params"]["encoder"]["stem_conv"]["kernel"].shape[2]
    enc = convert_efficientnet_imagenet(sd, encoder_name, in_channels=in_ch)
    return _graft_encoder_tree(variables, enc)


def _widen_stem(kernel: np.ndarray, in_channels: int) -> np.ndarray:
    """smp ``patch_first_conv`` policy (utils.py in smp; used via
    mymodels.py:242-243): cycle the pretrained input-channel kernels and
    rescale by old/new so activations keep their pretrained magnitude."""
    old = kernel.shape[2]
    reps = [kernel[:, :, i % old: i % old + 1, :] for i in range(in_channels)]
    return np.concatenate(reps, axis=2) * (old / in_channels)


def _graft_encoder_tree(variables: Mapping, enc: Mapping) -> dict:
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    params["encoder"] = enc["params"]
    stats["encoder"] = enc["batch_stats"]
    return {"params": params, "batch_stats": stats}


def graft_encoder_npz(variables: Mapping, path: str) -> dict:
    """Graft a converted ImageNet-encoder ``.npz`` (written by
    ``python -m srbh_tpu.train.convert effnet.pth enc.npz --arch
    imagenet-encoder``) into freshly-initialised height-model variables —
    the runtime half of the reference's ``encoder_weights="imagenet"``
    start (mymodels.py:234,242-243 via smp ``get_encoder``).

    The npz may carry a 3-channel stem (raw ImageNet) or be pre-widened;
    a mismatched stem is widened here with smp's patch_first_conv policy.
    Any other shape mismatch fails loudly — it means the npz was converted
    for a different ``encoder_name``.
    """
    import jax

    enc = load_tree_npz(path)
    if "params" not in enc or "batch_stats" not in enc:
        raise ValueError(
            f"{path} is not an encoder npz (expected params/batch_stats "
            "top-level keys; convert with --arch imagenet-encoder)")
    enc = dict(enc)
    enc["params"] = dict(enc["params"])
    want = variables["params"]["encoder"]
    stem = np.asarray(enc["params"]["stem_conv"]["kernel"])
    want_in = want["stem_conv"]["kernel"].shape[2]
    if stem.shape[2] != want_in:
        enc["params"]["stem_conv"] = {
            "kernel": _widen_stem(stem, want_in)}
    ref_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), want)
    got_shapes = jax.tree_util.tree_map(
        lambda a: tuple(np.asarray(a).shape), enc["params"])
    if ref_shapes != got_shapes:
        raise ValueError(
            f"encoder npz {path} does not match the model's encoder "
            "architecture (wrong --encoder-name at conversion time?)")
    return _graft_encoder_tree(variables, enc)


def convert_height_model(sd: Mapping, isaggre: bool = True,
                         encoder_name: str = "efficientnet-b4") -> dict:
    """SRRegressClsFeature (mymodels.py:233-337): smp EfficientNet encoder +
    two UnetDecoders + hrfeat/reg/seg heads (+ aggre conv).

    Encoder mapping: see :func:`_convert_encoder`; smp's unused
    ``_conv_head``/``_bn1`` head weights are dropped.
    """
    params: dict = {}
    stats: dict = {}
    params["encoder"], stats["encoder"] = _convert_encoder(
        sd, "encoder.", encoder_name)

    # ---- decoders (smp UnetDecoder: blocks.N.conv1/conv2, each .0 conv .1 bn)
    for dname in ("decoder1", "decoder2"):
        dp: dict = {}
        ds: dict = {}
        for bi in range(5):
            blk_p: dict = {}
            blk_s: dict = {}
            for ci in (1, 2):
                cname = f"conv{ci}"
                blk_p[cname] = {"conv": _conv(sd, f"{dname}.blocks.{bi}.{cname}.0")}
                bp, bs = _bn(sd, f"{dname}.blocks.{bi}.{cname}.1")
                blk_p[cname]["bn"] = bp
                blk_s[cname] = {"bn": bs}
            dp[f"block{bi}"] = blk_p
            ds[f"block{bi}"] = blk_s
        params[dname], stats[dname] = dp, ds

    # ---- hrfeat (3 BasicBlocks named 0/1/2 in the torch Sequential)
    hp: dict = {}
    hs: dict = {}
    for i in range(3):
        bp, bs = convert_basic_block(sd, f"hrfeat.{i}")
        hp[f"block{i}"], hs[f"block{i}"] = bp, bs
    params["hrfeat"], stats["hrfeat"] = hp, hs

    # ---- fusion heads
    for head in ("reg", "seg"):
        hp2, hs2 = convert_hrfuse_residual(sd, head)
        params[head], stats[head] = hp2, hs2
    if isaggre and "aggre_height.weight" in sd:
        params["aggre_height"] = _conv(sd, "aggre_height")
    return {"params": params, "batch_stats": stats}


def load_torch_tar(path: str, key: Optional[str] = None) -> Mapping:
    """Load a torch .tar checkpoint on CPU and return (a sub-dict of) it."""
    import torch

    payload = torch.load(path, map_location="cpu")
    if key is not None:
        payload = payload[key]
    return {k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in payload.items()}


# ---------------------------------------------------------------------------
# npz tree round-trip + CLI
# ---------------------------------------------------------------------------

# path separator for the flat npz keys. NOT '/': flax SpectralNorm stores
# stats under leaf names that themselves contain '/' (e.g.
# 'conv1/kernel/sigma'), which a '/' join+split would silently re-nest.
_NPZ_SEP = "\x1f"
# format marker: new-format files always carry this key, so the loader
# never has to guess the separator from key contents (a flat tree whose
# only keys contain no \x1f would otherwise be mistaken for legacy
# '/'-joined and have '/'-bearing leaf names re-nested)
_NPZ_MARKER = "__srbh-npz-sep-1f__"


def save_tree_npz(path: str, tree: Mapping) -> None:
    """Save a nested variables tree as a flat ``.npz`` — a
    framework-agnostic interchange file (no orbax/torch needed to read).
    Keys are joined with the unit separator ``\\x1f`` (cannot occur in
    flax module/param names, unlike '/')."""
    from flax.traverse_util import flatten_dict

    flat = {_NPZ_SEP.join(k): np.asarray(v)
            for k, v in flatten_dict(tree).items()}
    flat[_NPZ_MARKER] = np.zeros(0, np.uint8)
    np.savez(path, **flat)


def load_tree_npz(path: str) -> dict:
    """Inverse of :func:`save_tree_npz`. Files written by older versions
    ('/'-joined, no marker key) load too, with the caveat that
    '/'-containing leaf names (SpectralNorm sigma state) come back
    re-nested in those."""
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        keys = [k for k in z.files if k != _NPZ_MARKER]
        new_format = (_NPZ_MARKER in z.files
                      or any(_NPZ_SEP in k for k in keys))
        sep = _NPZ_SEP if new_format else "/"
        return unflatten_dict({tuple(k.split(sep)): z[k] for k in keys})


_WRAPPER_KEYS = ("state_dict", "net_g_ema", "params_ema", "params", "net_g")


def _load_state_dict_auto(path: str, key: Optional[str]):
    """torch.load + unwrap: explicit ``key``, else the first of
    ``state_dict/net_g_ema/params_ema/params/net_g`` present, else the
    payload itself. Returns (state_dict, full_payload)."""
    import torch

    payload = torch.load(path, map_location="cpu")
    sd = payload
    if key is not None:
        sd = payload[key]
    elif isinstance(payload, Mapping):
        for k in _WRAPPER_KEYS:
            if k in payload and isinstance(payload[k], Mapping):
                sd = payload[k]
                break
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return sd, payload


def main(argv=None) -> str:
    """CLI: convert a reference torch ``.tar`` checkpoint to a Flax ``.npz``.

    Twin of the reference's implicit checkpoint contract (train.py:199-212
    writes {'epoch','state_dict','log_vars','best_acc'};
    SR/rrdbnet_arch.py:511-522 writes {'params','params_ema'}): reference
    users run e.g.

        python -m srbh_tpu.train.convert checkpoint20.tar height.npz \
            --arch height
        python -m srbh_tpu.train.convert checkpoint2.tar sr.npz \
            --arch rrdbnet --key net_g_ema

    and load the result with ``load_tree_npz`` (a plain variables tree for
    ``Model.apply``). ``--arch height`` also stashes the tar's ``log_vars``
    (adaptive-loss weights) under ``log_vars/`` in the npz.
    """
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m srbh_tpu.train.convert", description=main.__doc__)
    ap.add_argument("input", help="torch .tar/.pth checkpoint")
    ap.add_argument("output", help="output .npz path")
    ap.add_argument("--arch", required=True, choices=[
        "height", "rrdbnet", "rrdbnet-simple", "edsr", "espcn", "swinir",
        "unet-sn", "imagenet-encoder"])
    ap.add_argument("--key", default=None,
                    help="sub-dict key in the tar (default: auto-detect "
                         f"{'/'.join(_WRAPPER_KEYS)})")
    ap.add_argument("--num-block", type=int, default=23,
                    help="RRDB blocks (rrdbnet[-simple])")
    ap.add_argument("--n-resblocks", type=int, default=16, help="EDSR blocks")
    ap.add_argument("--no-strict", action="store_true",
                    help="EDSR: skip missing tail keys (partial load)")
    ap.add_argument("--no-aggre", action="store_true",
                    help="height: model without the aggre_height conv")
    ap.add_argument("--depths", type=int, nargs="+", default=[6, 6, 6, 6],
                    help="SwinIR RSTB depths")
    ap.add_argument("--upsampler", default="pixelshuffle",
                    help="SwinIR head mode")
    ap.add_argument("--encoder-name", default="efficientnet-b4")
    ap.add_argument("--in-channels", type=int, default=None,
                    help="imagenet-encoder: widen the stem to this many "
                         "input channels (height model uses 8)")
    args = ap.parse_args(argv)

    sd, payload = _load_state_dict_auto(args.input, args.key)
    if args.arch == "height":
        tree = convert_height_model(sd, isaggre=not args.no_aggre,
                                    encoder_name=args.encoder_name)
        if isinstance(payload, Mapping) and "log_vars" in payload:
            lv = payload["log_vars"]
            tree["log_vars"] = {
                f"w{i + 1}": np.asarray(
                    v.detach().numpy() if hasattr(v, "detach") else v,
                    np.float32)
                for i, v in enumerate(lv)}
        # carry the tar's bookkeeping (train.py:202-208 writes epoch /
        # best_acc alongside state_dict) so a converted checkpoint drives
        # main_test with the reference's artifact naming (acc{epoch}…)
        if isinstance(payload, Mapping):
            meta = {}
            if "epoch" in payload:
                meta["epoch"] = np.asarray(int(payload["epoch"]), np.int32)
            if "best_acc" in payload:
                ba = payload["best_acc"]
                meta["best_acc"] = np.asarray(
                    float(ba.detach() if hasattr(ba, "detach") else ba),
                    np.float32)
            if meta:
                tree["meta"] = meta
    elif args.arch == "rrdbnet":
        tree = convert_rrdbnet(sd, num_block=args.num_block)
    elif args.arch == "rrdbnet-simple":
        tree = convert_rrdbnet_simple(sd, num_block=args.num_block)
    elif args.arch == "edsr":
        tree = convert_edsr(sd, n_resblocks=args.n_resblocks,
                            strict=not args.no_strict)
    elif args.arch == "espcn":
        tree = convert_espcn(sd)
    elif args.arch == "swinir":
        tree = convert_swinir(sd, depths=tuple(args.depths),
                              upsampler=args.upsampler)
    elif args.arch == "unet-sn":
        tree = convert_unet_discriminator_sn(sd)
    else:  # imagenet-encoder
        tree = convert_efficientnet_imagenet(
            sd, encoder_name=args.encoder_name, in_channels=args.in_channels)
    save_tree_npz(args.output, tree)
    print(f"wrote {args.output} ({args.arch})")
    return args.output


if __name__ == "__main__":  # pragma: no cover
    main()
