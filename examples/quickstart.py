"""End-to-end quickstart: synthetic data -> train -> evaluate -> predict.

The whole reference workflow (README.md:22-61 of the upstream repo) in one
runnable script, sized to finish on a laptop CPU in a few minutes — swap
the synthetic dataset for real Sentinel-1/2 tiles and the tiny config for
the flagship (``encoder_name='efficientnet-b4'``, ``sr_num_block=23``,
``bf16=True``) to reproduce the paper pipeline on a TPU.

Run: ``python examples/quickstart.py [workdir]``
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

try:  # running from a checkout without pip-installing the package
    import srbh_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def build_synthetic_dataset(root: str, n_tiles: int = 8, tile: int = 32):
    """Write S2 (6-band uint16), S1 (2-band float), 2.5 m height tiles,
    split CSVs, and normalisation tables — the artifacts the reference's
    BH_dataset.py / stats_dataset_globe.py steps produce."""
    from srbh_tpu.data.tiff import write_tiff

    data = os.path.join(root, "data")
    rng = np.random.default_rng(0)
    names = [f"t_{i}.tif" for i in range(n_tiles)]
    for d in ("s2c", "s1c", "bhc"):
        os.makedirs(os.path.join(data, d), exist_ok=True)
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    for n in names:
        write_tiff(os.path.join(data, "s2c", n),
                   rng.integers(0, 5000, (tile, tile, 6)).astype(np.uint16),
                   geotransform=gt)
        write_tiff(os.path.join(data, "s1c", n),
                   rng.uniform(-25, 5, (tile, tile, 2)).astype(np.float32),
                   geotransform=gt)
        write_tiff(os.path.join(data, "bhc", n),
                   rng.integers(0, 100, (tile * 4, tile * 4)).astype(np.uint8),
                   geotransform=(gt[0], 2.5, 0.0, gt[3], 0.0, -2.5))
    for split in ("train", "val", "test"):
        pd.DataFrame({0: names, 1: "s1c", 2: "s2c", 3: "bhc"}).to_csv(
            os.path.join(data, f"dl_{split}.csv"), header=False, index=False)
    stats = os.path.join(root, "stats")
    os.makedirs(stats, exist_ok=True)
    np.savetxt(os.path.join(stats, "s2c_minmax.txt"),
               np.stack([np.zeros(6), np.full(6, 5000.0)]))
    np.savetxt(os.path.join(stats, "s1c_minmax.txt"),
               np.stack([np.full(2, -25.0), np.full(2, 5.0)]))
    hist = np.zeros(256)
    hist[:100] = 1000
    np.savetxt(os.path.join(stats, "bh_stats.txt"), hist)
    return data, stats


def tiny_config(root: str, data: str, stats: str):
    """The smallest runnable config (reference flags, test-scale model)."""
    from srbh_tpu.train.config import TrainConfig

    return TrainConfig(
        datapath=data, trainlist="dl_train.csv", vallist="dl_val.csv",
        testlist="dl_test.csv", logdir=os.path.join(root, "logs"),
        logdirhr=os.path.join(root, "no_sr_ckpt"), datastats=stats,
        preweight=os.path.join(stats, "bh_stats.txt"),
        s1dir="s1c", s2dir="s2c", bhdir="bhc",
        maxepoch=2, batch_size=4, num_workers=0,
        encoder_name="efficientnet-test", super_mid=8,
        sr_num_block=1, sr_num_feat=8, sr_num_grow=8, tile=32,
    )


def predict_demo_city(root: str, cfg):
    """Fishnet-grid prediction over a synthetic whole-city raster
    (the predict_realesanet_feature_globe.py stage)."""
    import jax
    import jax.numpy as jnp

    from srbh_tpu import models
    from srbh_tpu.data.grid import GridImageDataset, fishgrid_stats, write_fishgrid
    from srbh_tpu.data.tiff import write_tiff
    from srbh_tpu.predict.predictor import make_city_step, predict_city

    city = os.path.join(root, "city")
    os.makedirs(city, exist_ok=True)
    rng = np.random.default_rng(1)
    gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
    w, h = 130, 100
    write_tiff(os.path.join(city, "demo_s2.tif"),
               rng.integers(0, 5000, (h, w, 6)).astype(np.uint16),
               geotransform=gt)
    write_tiff(os.path.join(city, "demo_s1.tif"),
               rng.uniform(-25, 5, (h, w, 2)).astype(np.float32),
               geotransform=gt)
    write_tiff(os.path.join(city, "demo_wsf.tif"),
               (rng.random((h, w)) < 0.5).astype(np.uint8) * 255,
               geotransform=gt)
    write_fishgrid(os.path.join(city, "demo_s2.tif"), 64, 56)
    fishgrid_stats(os.path.join(city, "demo_wsf.tif"),
                   os.path.join(city, "demo_s2_grid.shp"))

    sr = models.RRDBNet(num_block=cfg.sr_num_block, num_feat=cfg.sr_num_feat,
                        num_grow_ch=cfg.sr_num_grow, dtype=jnp.float32)
    model = models.SRRegressClsFeature(
        encoder_name=cfg.encoder_name, super_mid=cfg.super_mid,
        isaggre=True, chans_build=cfg.chans_build, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 64, 64, 8))
    sr_params = jax.jit(sr.init)(key, x[..., :3])
    fea = jnp.zeros((4, 256, 256, cfg.sr_num_feat))
    variables = jax.jit(model.init)(key, x, fea)
    # in a real run: variables/sr_params come from the trained checkpoint
    # (srbh_tpu.train.checkpoint.restore / train/convert.py)
    step = make_city_step(model, sr, dtype=jnp.float32)
    ds = GridImageDataset(city, "demo", cfg.datastats,
                          s1dir="s1c", s2dir="s2c", gridvalid="isv",
                          nchans=cfg.nchanss2)
    return predict_city(ds, step, variables, sr_params,
                        os.path.join(root, "pred"), "demo", batch_size=4)


def main(root: str = "quickstart_out"):
    from srbh_tpu.train import trainer

    os.makedirs(root, exist_ok=True)
    data, stats = build_synthetic_dataset(root)
    cfg = tiny_config(root, data, stats)

    print("== train (2 tiny epochs) ==")
    state = trainer.main(cfg, writer=None)
    print(f"   trained {int(state.step)} steps; checkpoints in {cfg.logdir}")

    print("== evaluate (acc/seg/he artifacts) ==")
    trainer.main_test(cfg, suffix="demo")
    accs = sorted(f for f in os.listdir(cfg.logdir) if f.startswith("acc"))
    print("   wrote", accs)

    print("== predict a city mosaic ==")
    build_tif, height_tif = predict_demo_city(root, cfg)
    print("   wrote", build_tif, "and", height_tif)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "quickstart_out")
