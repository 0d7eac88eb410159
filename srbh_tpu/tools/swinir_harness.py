"""SwinIR test harness: task presets, tiled inference, metric report.

Twin of SR/main_test_swinir.py: seven task presets (classical/lightweight/
real SR, gray/color denoise, gray/color JPEG CAR), window-multiple padding
via flip-concat, tiled inference with overlap-average stitching, and
PSNR/SSIM/PSNR-B reporting. (Weight auto-download is gated: this image has
zero egress — pass a converted checkpoint path instead.)
"""
from __future__ import annotations

import glob
import os
from collections import OrderedDict
from typing import Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu.metrics.image import bgr2ycbcr, calculate_psnr, calculate_psnrb, calculate_ssim
from srbh_tpu.models.swinir import SwinIR

TASKS = ("classical_sr", "lightweight_sr", "real_sr", "gray_dn", "color_dn",
         "jpeg_car", "color_jpeg_car")


def define_model(task: str, scale: int = 1, training_patch_size: int = 128,
                 large_model: bool = False, dtype=jnp.float32) -> SwinIR:
    """Model presets (SR/main_test_swinir.py:128-192)."""
    if task == "classical_sr":
        return SwinIR(upscale=scale, in_chans=3, embed_dim=180,
                      depths=(6,) * 6, num_heads=(6,) * 6, window_size=8,
                      mlp_ratio=2, img_range=1.0, upsampler="pixelshuffle",
                      resi_connection="1conv", dtype=dtype)
    if task == "lightweight_sr":
        return SwinIR(upscale=scale, in_chans=3, embed_dim=60,
                      depths=(6,) * 4, num_heads=(6,) * 4, window_size=8,
                      mlp_ratio=2, img_range=1.0,
                      upsampler="pixelshuffledirect",
                      resi_connection="1conv", dtype=dtype)
    if task == "real_sr":
        if large_model:
            return SwinIR(upscale=scale, in_chans=3, embed_dim=240,
                          depths=(6,) * 9, num_heads=(8,) * 9, window_size=8,
                          mlp_ratio=2, img_range=1.0, upsampler="nearest+conv",
                          resi_connection="3conv", dtype=dtype)
        return SwinIR(upscale=scale, in_chans=3, embed_dim=180,
                      depths=(6,) * 6, num_heads=(6,) * 6, window_size=8,
                      mlp_ratio=2, img_range=1.0, upsampler="nearest+conv",
                      resi_connection="1conv", dtype=dtype)
    if task in ("gray_dn", "color_dn"):
        chans = 1 if task == "gray_dn" else 3
        return SwinIR(upscale=1, in_chans=chans, out_chans=chans,
                      embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                      window_size=8, mlp_ratio=2, img_range=1.0,
                      upsampler="", resi_connection="1conv", dtype=dtype)
    if task in ("jpeg_car", "color_jpeg_car"):
        chans = 1 if task == "jpeg_car" else 3
        return SwinIR(upscale=1, in_chans=chans, out_chans=chans,
                      embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                      window_size=7, mlp_ratio=2, img_range=255.0,
                      upsampler="", resi_connection="1conv", dtype=dtype)
    raise ValueError(f"unknown task {task!r}")


def setup(task: str, scale: int = 1) -> Tuple[int, int]:
    """(crop border, window size) per task (SR/main_test_swinir.py:195-226)."""
    if task in ("classical_sr", "lightweight_sr"):
        return scale, 8
    if task in ("real_sr", "gray_dn", "color_dn"):
        return 0, 8
    if task in ("jpeg_car", "color_jpeg_car"):
        return 0, 7
    raise ValueError(task)


def get_image_pair(task: str, path: str, folder_lq: Optional[str] = None,
                   scale: int = 1, noise: int = 15, jpeg: int = 40):
    """(name, lq HWC float [0,1], gt or None) — SR/main_test_swinir.py:229-275."""
    name, ext = os.path.splitext(os.path.basename(path))
    if task in ("classical_sr", "lightweight_sr"):
        gt = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32) / 255.0
        lq = cv2.imread(f"{folder_lq}/{name}x{scale}{ext}",
                        cv2.IMREAD_COLOR).astype(np.float32) / 255.0
    elif task == "real_sr":
        gt = None
        lq = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32) / 255.0
    elif task == "gray_dn":
        gt = cv2.imread(path, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        np.random.seed(0)
        lq = gt + np.random.normal(0, noise / 255.0, gt.shape)
        gt, lq = gt[..., None], lq[..., None]
    elif task == "color_dn":
        gt = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32) / 255.0
        np.random.seed(0)
        lq = gt + np.random.normal(0, noise / 255.0, gt.shape)
    elif task == "jpeg_car":
        gt = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if gt.ndim != 2:
            gt = bgr2ycbcr(gt, y_only=True)
        _, enc = cv2.imencode(".jpg", gt, [int(cv2.IMWRITE_JPEG_QUALITY), jpeg])
        lq = cv2.imdecode(enc, 0)
        gt = gt[..., None].astype(np.float32) / 255.0
        lq = lq[..., None].astype(np.float32) / 255.0
    elif task == "color_jpeg_car":
        gt = cv2.imread(path)
        _, enc = cv2.imencode(".jpg", gt, [int(cv2.IMWRITE_JPEG_QUALITY), jpeg])
        lq = cv2.imdecode(enc, 1)
        gt = gt.astype(np.float32) / 255.0
        lq = lq.astype(np.float32) / 255.0
    else:
        raise ValueError(task)
    return name, lq, gt


def pad_to_window_multiple(img: np.ndarray, window_size: int) -> np.ndarray:
    """Flip-concat padding to the NEXT window multiple
    (SR/main_test_swinir.py:100-110 — always pads at least one window)."""
    h, w = img.shape[:2]
    h_pad = (h // window_size + 1) * window_size - h
    w_pad = (w // window_size + 1) * window_size - w
    img = np.concatenate([img, img[::-1]], axis=0)[: h + h_pad]
    img = np.concatenate([img, img[:, ::-1]], axis=1)[:, : w + w_pad]
    return img


def tiled_inference(apply_fn, img_lq: np.ndarray, scale: int,
                    tile: Optional[int] = None, tile_overlap: int = 32,
                    window_size: int = 8) -> np.ndarray:
    """Whole-image or overlap-average tiled inference
    (SR/main_test_swinir.py:278-306). ``apply_fn`` maps (1,H,W,C)->(1,sH,sW,C)."""
    x = img_lq[None]
    if tile is None:
        return np.asarray(apply_fn(jnp.asarray(x)))[0]
    h, w = x.shape[1:3]
    tile = min(tile, h, w)
    assert tile % window_size == 0, "tile size must be a multiple of window_size"
    stride = tile - tile_overlap
    h_idx = list(range(0, h - tile, stride)) + [h - tile]
    w_idx = list(range(0, w - tile, stride)) + [w - tile]
    E = np.zeros((h * scale, w * scale, x.shape[3]), np.float32)
    W = np.zeros_like(E)
    for hi in h_idx:
        for wi in w_idx:
            patch = x[:, hi: hi + tile, wi: wi + tile]
            out = np.asarray(apply_fn(jnp.asarray(patch)))[0]
            E[hi * scale: (hi + tile) * scale,
              wi * scale: (wi + tile) * scale] += out
            W[hi * scale: (hi + tile) * scale,
              wi * scale: (wi + tile) * scale] += 1
    return E / W


def run_folder(task: str, folder: str, variables, scale: int = 1,
               folder_lq: Optional[str] = None, noise: int = 15,
               jpeg: int = 40, tile: Optional[int] = None,
               tile_overlap: int = 32, save_dir: Optional[str] = None,
               large_model: bool = False,
               shape_bucket: Optional[int] = None):
    """Evaluate a folder; returns the averaged metric dict.

    Whole-image mode (``tile=None``) jit-compiles once per distinct padded
    shape — expensive on mixed-size sets (XLA recompile per size, unlike
    the torch harness). ``shape_bucket=N`` (a multiple of the window size)
    pads every image up to a multiple of N via the same flip-concat rule,
    collapsing the shape set; outputs are cropped back so metrics are
    computed on identical pixels up to the border padding's influence."""
    model = define_model(task, scale, large_model=large_model)
    border, window_size = setup(task, scale)
    apply_fn = jax.jit(lambda x: model.apply(variables, x))
    results = OrderedDict((k, []) for k in
                          ("psnr", "ssim", "psnr_y", "ssim_y", "psnrb", "psnrb_y"))
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(folder, "*"))):
        name, lq, gt = get_image_pair(task, path, folder_lq, scale, noise, jpeg)
        h_old, w_old = lq.shape[:2]
        # cv2 reads BGR; the models are RGB-trained — flip in, flip out
        # (main_test_swinir.py:63,80). Metrics/saves stay BGR like the
        # reference (bgr2ycbcr expects BGR).
        is_color = lq.ndim == 3 and lq.shape[2] == 3
        if is_color:
            lq = lq[:, :, ::-1]
        if shape_bucket:
            if shape_bucket % window_size:
                raise ValueError("shape_bucket must be a multiple of the "
                                 f"window size {window_size}")
            lq = pad_to_window_multiple(lq, shape_bucket)
        else:
            lq = pad_to_window_multiple(lq, window_size)
        out = tiled_inference(apply_fn, lq.astype(np.float32), scale, tile,
                              tile_overlap, window_size)
        out = out[: h_old * scale, : w_old * scale]
        if is_color:
            out = out[..., ::-1]
        out8 = (np.clip(out, 0, 1) * 255.0).round().astype(np.uint8)
        if save_dir:
            cv2.imwrite(os.path.join(save_dir, f"{name}_SwinIR.png"),
                        np.squeeze(out8))
        if gt is not None:
            gt8 = (gt * 255.0).round().astype(np.uint8)
            gt8 = np.squeeze(gt8[: h_old * scale, : w_old * scale])
            o = np.squeeze(out8)
            results["psnr"].append(calculate_psnr(o, gt8, crop_border=border))
            results["ssim"].append(calculate_ssim(o, gt8, crop_border=border))
            if gt8.ndim == 3:
                results["psnr_y"].append(calculate_psnr(
                    o, gt8, crop_border=border, test_y_channel=True))
                results["ssim_y"].append(calculate_ssim(
                    o, gt8, crop_border=border, test_y_channel=True))
            if task in ("jpeg_car", "color_jpeg_car"):
                results["psnrb"].append(calculate_psnrb(
                    o, gt8, crop_border=border))
                if gt8.ndim == 3:  # PSNRB_Y for color CAR (:103-104)
                    results["psnrb_y"].append(calculate_psnrb(
                        o, gt8, crop_border=border, test_y_channel=True))
    return {k: (sum(v) / len(v) if v else None) for k, v in results.items()}


def main(argv=None):
    """CLI twin of SR/main_test_swinir.py:14-45 (weights from a converted
    checkpoint dir instead of a release download — zero egress)."""
    import argparse

    from srbh_tpu.train.checkpoint import load_checkpoint

    p = argparse.ArgumentParser()
    p.add_argument("--task", default="color_dn", choices=TASKS)
    p.add_argument("--scale", type=int, default=1)
    p.add_argument("--noise", type=int, default=15)
    p.add_argument("--jpeg", type=int, default=40)
    p.add_argument("--large_model", action="store_true")
    p.add_argument("--model_path", default=None,
                   help="orbax dir of converted SwinIR params")
    p.add_argument("--folder_lq", default=None)
    p.add_argument("--folder_gt", default=None)
    p.add_argument("--tile", type=int, default=None)
    p.add_argument("--tile_overlap", type=int, default=32)
    args = p.parse_args(argv)

    folder = args.folder_gt if args.task != "real_sr" else args.folder_lq
    model = define_model(args.task, args.scale, large_model=args.large_model)
    if args.model_path:
        payload = load_checkpoint(args.model_path)
        if payload is None:
            p.error(f"--model_path {args.model_path}: no checkpoint found")
        variables = {"params": payload["params"]}
    else:
        import jax as _jax
        import jax.numpy as _jnp

        print("no --model_path: random init (smoke mode)")
        variables = _jax.jit(model.init)(
            _jax.random.PRNGKey(0),
            _jnp.zeros((1, 64, 64, 1 if "gray" in args.task
                        or args.task == "jpeg_car" else 3)))
    save_dir = f"results/swinir_{args.task}_x{args.scale}"
    res = run_folder(args.task, folder, variables, args.scale,
                     args.folder_lq, args.noise, args.jpeg, args.tile,
                     args.tile_overlap, save_dir, args.large_model)
    for k, v in res.items():
        if v is not None:
            print(f"-- Average {k.upper()}: {v:.4f}")
    return res


if __name__ == "__main__":
    main()
