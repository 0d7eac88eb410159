"""Full-scale city-predictor stress run on the device stitcher.

Drives ``predict_city`` end to end on ONE synthetic big city — default
2048x2048 10 m S2/S1 (a real metro extent) -> 8192x8192 2.5 m canvases,
~1.4k fishnet windows — through BOTH stitchers with the full-scale models
(RRDBNet-23 + EfficientNet-B4, bf16), and reports wall-clock, the canvas
HBM footprint, and byte-equivalence of the two outputs
(predict_realesanet_feature_globe.py:138-210 at production scale; the
round-2 proof was a 400x300 toy).

The device stitcher keeps the int32 sum canvases in HBM (2.4 GiB at
8192^2 x 7 classes) and ships ONE compact mosaic at the end;
``predict_city`` guards the canvas footprint against
SRBH_DEVICE_CANVAS_BUDGET (default 6 GiB) and falls back to the host
accumulator above it.

Usage: python -m srbh_tpu.tools.predict_stress [--size 2048] [--batch 32]
           [--test-scale]
Prints one JSON line per stitcher plus an equivalence line.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time


import numpy as np


def build_synth_city(root: str, size: int) -> None:
    from srbh_tpu.data.grid import fishgrid_stats, write_fishgrid
    from srbh_tpu.data.tiff import write_tiff

    rng = np.random.default_rng(0)
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    # strip-wise generation keeps host memory flat for big cities
    write_tiff(os.path.join(root, "stress_s2.tif"),
               rng.integers(0, 5000, (size, size, 6)).astype(np.uint16), gt)
    write_tiff(os.path.join(root, "stress_s1.tif"),
               rng.uniform(-25, 5, (size, size, 2)).astype(np.float32), gt)
    write_tiff(os.path.join(root, "stress_wsf.tif"),
               (rng.random((size, size)) < 0.5).astype(np.uint8) * 255, gt)
    write_fishgrid(os.path.join(root, "stress_s2.tif"), 64, 56)
    fishgrid_stats(os.path.join(root, "stress_wsf.tif"),
                   os.path.join(root, "stress_s2_grid.shp"),
                   condition=(0, 20, 4096))
    os.makedirs(os.path.join(root, "stats"), exist_ok=True)
    np.savetxt(os.path.join(root, "stats", "s2x_minmax.txt"),
               np.stack([np.full(6, 0.0), np.full(6, 5000.0)]))
    np.savetxt(os.path.join(root, "stats", "s1x_minmax.txt"),
               np.stack([np.full(2, -25.0), np.full(2, 5.0)]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048,
                    help="city raster side at 10 m (canvas = 4x)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--test-scale", action="store_true",
                    help="tiny models (plumbing check)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from srbh_tpu.tools._cache import enable_compilation_cache
    enable_compilation_cache()

    import __graft_entry__ as g
    from srbh_tpu.data.grid import GridImageDataset
    from srbh_tpu.data.tiff import TiffReader
    from srbh_tpu.predict.predictor import (
        _canvas_bytes, make_city_step, predict_city)

    model, sr, variables, sr_params, _ = g._flagship(
        tile=64, batch=args.batch, dtype=jnp.bfloat16,
        tiny=args.test_scale)
    step = make_city_step(model, sr, dtype=jnp.bfloat16)

    root = tempfile.mkdtemp(prefix="srbh_stress_")
    try:
        build_synth_city(root, args.size)
        ds = GridImageDataset(root, "stress", os.path.join(root, "stats"),
                              s1dir="s1x", s2dir="s2x", gridvalid="isv",
                              nchans=6)
        cb = _canvas_bytes(ds.width, ds.height, 7, 4)
        print(json.dumps({
            "metric": "stress_city", "windows": len(ds),
            "canvas_px": ds.width * 4,
            "canvas_hbm_gib": round(cb / 2**30, 2)}), flush=True)
        outs = {}
        for stitch in ("device", "host"):
            respath = os.path.join(root, f"pred_{stitch}")
            os.makedirs(respath, exist_ok=True)
            t0 = time.perf_counter()
            btif, htif = predict_city(ds, step, variables, sr_params,
                                      respath, "stress",
                                      batch_size=args.batch, stitch=stitch)
            dt = time.perf_counter() - t0
            mem = None
            try:
                stats = jax.devices()[0].memory_stats()
                mem = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
            except Exception:
                pass
            print(json.dumps({
                "metric": f"stress_predict_{stitch}_wallclock",
                "value": round(dt, 1), "unit": "s",
                "windows_per_sec": round(len(ds) / dt, 1),
                "peak_hbm_gib": mem}), flush=True)
            outs[stitch] = (TiffReader(btif).read().copy(),
                            TiffReader(htif).read().copy())
        eq_b = bool(np.array_equal(outs["device"][0], outs["host"][0]))
        eq_h = bool(np.array_equal(outs["device"][1], outs["host"][1]))
        print(json.dumps({"metric": "stress_equivalence",
                          "build_equal": eq_b, "height_equal": eq_h}),
              flush=True)
        if not (eq_b and eq_h):
            raise SystemExit("device/host stitcher outputs diverged")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
