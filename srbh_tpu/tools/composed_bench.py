"""COMPOSED host+device training throughput: one end-to-end tiles/sec.

bench.py (612 t/s inference) and train_bench.py (279 t/s train step) are
device-only; loader_bench.py (~225 t/s/worker) is host-only. This tool runs
the REAL pipeline end to end — synthetic GeoTIFF tiles on disk, the
threaded prefetching DataLoader (decode + normalise [+ aug + targets]),
host->device transfer, and the full fused train step on the chip — and
prints ONE composed tiles/sec per (mode, num_workers), plus the measured
host->device bandwidth and bytes/tile so the binding constraint is
attributable.

Modes:
* ``host``   — reference-faithful: cv2 augmentation + hierarchy/weight/
  aggregation targets built by the workers (BH_loader.py:331-397);
  ~950 KB/tile shipped to the device.
* ``device`` — ``device_aug``: workers only decode+normalise; augmentation
  and target building run in-jit (ops/device_aug.py); ~196 KB/tile shipped
  (image f32 + height uint8) — 4.8x fewer bytes AND no cv2 rotation.
* ``device_norm`` — also normalise in-jit: workers only decode; raw
  uint16 s2 DNs + f32 s1 on the wire (~147 KB/tile), bit-equal to
  ``device``.

Environment note (axon relay): host->device sustains only ~10-40 MB/s
here vs GB/s of real TPU-VM DMA, so through the relay the composed number
is TRANSFER-bound, not host- or device-bound; the mode comparison (bytes/
tile) and the host-rate scaling per worker are the transferable results.

Usage: python -m srbh_tpu.tools.composed_bench [--batch 128] [--tiles 768]
           [--workers 0 2 4] [--modes host device] [--test-scale]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time


import numpy as np


def _measure_h2d_mb_s(nbytes: int = 32 << 20) -> float:
    import jax

    a = np.random.default_rng(0).standard_normal(nbytes // 4
                                                 ).astype(np.float32)
    dev = jax.devices()[0]
    f = jax.jit(lambda x: x.sum())
    float(f(jax.device_put(a, dev)))  # compile + first-transfer costs
    t0 = time.perf_counter()
    float(f(jax.device_put(a[::-1].copy(), dev)))
    return a.nbytes / 1e6 / (time.perf_counter() - t0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tiles", type=int, default=768)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2, 4])
    ap.add_argument("--modes", nargs="*",
                    default=["host", "device", "device_norm"],
                    help="host = reference-faithful worker aug+targets; "
                         "device = in-jit aug+targets (image f32 + uint8 "
                         "height on the wire); device_norm = also "
                         "normalise in-jit (raw uint16 s2 + f32 s1)")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--test-scale", action="store_true",
                    help="tiny models (CPU-runnable sanity mode)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from srbh_tpu.tools._cache import enable_compilation_cache
    enable_compilation_cache()

    from srbh_tpu import models
    from srbh_tpu.data.dataset import S12GlobeDataset
    from srbh_tpu.data.pipeline import DataLoader
    from srbh_tpu.tools.loader_bench import _build_synthetic
    from srbh_tpu.train.state import TrainState
    from srbh_tpu.train.steps import make_train_step
    from srbh_tpu.train.trainer import _to_device_batch

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    if args.test_scale:
        sr = models.RRDBNet(num_block=1, num_feat=8, num_grow_ch=8,
                            dtype=dtype)
        model = models.SRRegressClsFeature(
            encoder_name="efficientnet-test", super_mid=8, isaggre=True,
            chans_build=7, dtype=dtype)
    else:
        sr = models.RRDBNet(num_block=23, num_feat=64, num_grow_ch=32,
                            dtype=dtype)
        model = models.SRRegressClsFeature(
            encoder_name="efficientnet-b4", super_mid=16, isaggre=True,
            chans_build=7, dtype=dtype)

    x = jnp.zeros((args.batch, 64, 64, 8), jnp.float32)
    sr_params = jax.jit(sr.init)(rng, x[..., :3].astype(dtype))
    variables = jax.jit(model.init)(
        rng, x.astype(dtype), jnp.zeros((args.batch, 256, 256, sr.num_feat),
                                        dtype))
    host_vars = jax.device_get(variables)

    bw = _measure_h2d_mb_s()
    print(json.dumps({"metric": "h2d_bandwidth", "value": round(bw, 1),
                      "unit": "MB/s"}), flush=True)

    root = tempfile.mkdtemp(prefix="srbh_composed_")
    try:
        _build_synthetic(root, args.tiles)
        for mode in args.modes:
            device_aug = mode in ("device", "device_norm")
            device_norm = mode == "device_norm"
            ds = S12GlobeDataset(
                os.path.join(root, "dl.csv"), root, datastats=root,
                normmethod="minmax", datarange=(0, 1), aug=not device_aug,
                s1dir="s1c", s2dir="s2c", heightdir="bhc",
                preweight=os.path.join(root, "bh_stats.txt"),
                isaggre=True, ishir=True, seed=0, device_aug=device_aug,
                device_norm=device_norm)
            step = make_train_step(
                model, sr, isaggre=True, seed=1337, device_aug=device_aug,
                class_weight=ds.heightweight,
                norm={"s2_off": ds.s2_off, "s2_scale": ds.s2_scale,
                      "s1_off": ds.s1_off, "s1_scale": ds.s1_scale}
                if device_norm else None)
            sample = ds[0]
            bpt = sum(v.nbytes for k, v in sample.items() if k != "path")
            for workers in args.workers:
                loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                                    num_workers=workers, seed=0,
                                    drop_last=True, device_put=True)
                state = TrainState.create(
                    jax.tree_util.tree_map(jnp.asarray, host_vars),
                    n_log_vars=3, lr=1e-3)
                # warm epoch: compile + codec caches + thread spin-up
                for batch in loader:
                    b = _to_device_batch(batch, True, device_aug=device_aug,
                                         device_norm=device_norm)
                    state, m = step(state, sr_params, b, jnp.asarray(1e-3))
                float(m["loss"])
                tiles = 0
                t0 = time.perf_counter()
                for _ in range(args.epochs):
                    for batch in loader:
                        b = _to_device_batch(batch, True,
                                             device_aug=device_aug,
                                             device_norm=device_norm)
                        state, m = step(state, sr_params, b,
                                        jnp.asarray(1e-3))
                        tiles += args.batch
                float(m["loss"])  # drain the async tail
                dt = time.perf_counter() - t0
                print(json.dumps({
                    "metric": "composed_train_tiles_per_sec",
                    "mode": mode, "num_workers": workers,
                    "value": round(tiles / dt, 2), "unit": "tiles/sec",
                    "batch": args.batch,
                    "bytes_per_tile": int(bpt),
                    "transfer_bound_tiles_per_sec":
                        round(bw * 1e6 / bpt, 1),
                }), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
