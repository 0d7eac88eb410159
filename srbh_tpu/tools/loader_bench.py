"""Host input-pipeline throughput bench: decoded+augmented tiles/sec.

The device consumes ~600 inference tiles/sec/chip (bench.py) and ~400
train tiles/sec (train_bench.py); this measures whether the HOST side —
own-codec GeoTIFF decode (C++ fast path when built), per-region min-max
normalisation, augmentation, hierarchy mask/weight build, aggregation
targets, batch assembly (data/dataset.py + data/pipeline.py) — can keep
that fed, and how it scales with worker threads.

Reference twin: the torch `DataLoader(num_workers=8, pin_memory=True)`
input path (train.py:113-130) — which likewise has no published number.

Usage: python -m srbh_tpu.tools.loader_bench [n_tiles] [epochs]
Writes one JSON line per worker count; real full-scale tile shapes
(64x64 uint16 S2 + float32 S1, 256x256 uint8 height).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np


def _build_synthetic(root: str, n: int) -> None:
    import pandas as pd

    from srbh_tpu.data.tiff import write_tiff

    rng = np.random.default_rng(0)
    names = [f"t_{i}.tif" for i in range(n)]
    for d in ("s2c", "s1c", "bhc"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    for name in names:
        write_tiff(os.path.join(root, "s2c", name),
                   rng.integers(0, 5000, (64, 64, 6)).astype(np.uint16), gt)
        write_tiff(os.path.join(root, "s1c", name),
                   rng.uniform(-25, 5, (64, 64, 2)).astype(np.float32), gt)
        write_tiff(os.path.join(root, "bhc", name),
                   rng.integers(0, 100, (256, 256)).astype(np.uint8),
                   (gt[0], 2.5, 0.0, gt[3], 0.0, -2.5))
    pd.DataFrame({0: names, 1: "s1c", 2: "s2c", 3: "bhc"}).to_csv(
        os.path.join(root, "dl.csv"), header=False, index=False)
    np.savetxt(os.path.join(root, "s2c_minmax.txt"),
               np.stack([np.zeros(6), np.full(6, 5000.0)]))
    np.savetxt(os.path.join(root, "s1c_minmax.txt"),
               np.stack([np.full(2, -25.0), np.full(2, 5.0)]))
    hist = np.zeros(256)
    hist[:100] = 1000
    np.savetxt(os.path.join(root, "bh_stats.txt"), hist)


def main(n_tiles: int = 256, epochs: int = 2) -> None:
    from srbh_tpu.data.dataset import S12GlobeDataset
    from srbh_tpu.data.pipeline import DataLoader

    root = tempfile.mkdtemp(prefix="srbh_loaderbench_")
    try:
        _build_synthetic(root, n_tiles)
        ds = S12GlobeDataset(
            os.path.join(root, "dl.csv"), root, datastats=root,
            normmethod="minmax", datarange=(0, 1), aug=True,
            s1dir="s1c", s2dir="s2c", heightdir="bhc",
            preweight=os.path.join(root, "bh_stats.txt"),
            isaggre=True, ishir=True, seed=0)
        for workers in (0, 1, 2, 4, 8):
            loader = DataLoader(ds, batch_size=16, shuffle=True,
                                num_workers=workers, seed=0, drop_last=True)
            # warm epoch (codec caches, thread spin-up), then timed epochs
            for _ in loader:
                pass
            tiles = 0
            t0 = time.perf_counter()
            for _ in range(epochs):  # the loader advances its epoch itself
                for batch in loader:
                    tiles += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": "loader_tiles_per_sec",
                "num_workers": workers,
                "value": round(tiles / dt, 2),
                "unit": "tiles/s",
            }), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
