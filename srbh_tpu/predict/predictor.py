"""City-scale sliding-window height/build prediction.

Twin of predict_realesanet_feature_globe.py:68-233: for each city, iterate
the WSF-valid fishnet grids, run the frozen-SR + height model on fixed-shape
64x64 batches, blend overlaps, and write ``{city}_build.tif`` (uint8,
colormap, 2.5 m) and ``{city}_height.tif`` (uint16 decimetres, DEFLATE).

TPU design: the whole per-batch path — RRDBNet features, height model,
clamp/round/softmax scaling (predict_…globe.py:172-177) — is ONE jitted
program with fixed (batch, 64, 64, 8) shapes; ragged tail batches are padded
and masked out at accumulation time. Cities with an existing build tif are
skipped (idempotent resume, predict_…globe.py:130-131).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from srbh_tpu.data.grid import GridImageDataset
from srbh_tpu.predict.stitcher import MosaicAccumulator
from srbh_tpu.predict.writers import array2raster, array2raster_rio


def make_city_step(model, sr_model, rgb_idx=(0, 1, 2), dtype=jnp.bfloat16,
                   mesh=None, partition: str = "data"):
    """Jitted batch step: image -> (uint16 height dm, uint16 build softmax).

    With ``mesh``, the batch is sharded over the mesh's data axis and the
    params replicated (GSPMD data-parallel inference — the multi-chip form
    of the 301-city sweep; keep ``batch_size`` a multiple of the axis size
    so padded tail batches split evenly).

    ``partition="spatial"`` additionally shards the image ROWS over the
    mesh's model axis (parallel/mesh.py:spatial_sharding): GSPMD partitions
    every conv spatially and inserts the halo exchanges — the mode for
    FEWER, BIGGER windows (e.g. whole 1024-px blocks instead of the 64-px
    fishnet) whose activations exceed one chip's HBM (SURVEY.md §5.7).
    """
    rgb = jnp.asarray(rgb_idx)

    def step(variables, sr_params, image):
        img = image.astype(dtype)
        fea = sr_model.apply(sr_params, img[..., rgb], features_only=True)
        outs = model.apply(variables, img, fea, train=False)
        height, build = outs[0], outs[1]
        h = jnp.round(jnp.clip(height[..., 0].astype(jnp.float32), 0, None)
                      * 10).astype(jnp.uint16)
        # scaled softmax fits uint8 (values <= 255): halves the device->host
        # transfer vs the reference's uint16 staging; the mosaic accumulates
        # in int64 so nothing is lost (predict_…globe.py:176 semantics)
        b = jnp.round(jax.nn.softmax(build.astype(jnp.float32), axis=-1)
                      * 255).astype(jnp.uint8)
        return h, b

    if mesh is None:
        return jax.jit(step)
    from srbh_tpu.parallel.mesh import (batch_sharding, replicated,
                                        spatial_sharding)

    rep = replicated(mesh)
    data = spatial_sharding(mesh) if partition == "spatial" \
        else batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, rep, data),
                   out_shardings=(data, data))


def _canvas_bytes(width: int, height: int, n_classes: int,
                  upscale: int) -> int:
    """int32 height-sum + build-sum + weight canvases at x``upscale``."""
    hw = width * upscale * height * upscale
    return hw * 4 * (2 + n_classes)


def _device_canvas_fits(width: int, height: int, n_classes: int,
                        upscale: int) -> bool:
    """HBM guard for stitch='device': the scatter-add canvases (plus one
    transient copy at the donation boundary) must fit the budget.
    Default budget 6 GiB — half a v5e's 16 GiB, leaving room for the model
    + batch activations; override with SRBH_DEVICE_CANVAS_BUDGET (bytes)."""
    budget = float(os.environ.get("SRBH_DEVICE_CANVAS_BUDGET", 6 * 2**30))
    return 2.0 * _canvas_bytes(width, height, n_classes, upscale) <= budget


def predict_city(
    dataset: GridImageDataset,
    step,
    variables,
    sr_params,
    respath: str,
    cityname: str,
    chans_build: int = 7,
    batch_size: int = 32,
    upscale: int = 4,
    stitch: str = "host",
):
    """Predict one city mosaic and write build/height GeoTIFFs.

    ``stitch='device'`` keeps the canvases in HBM and scatter-adds the model
    outputs without any per-batch device->host transfer (SURVEY.md §5.7's
    TPU-native blending; one compact mosaic transfer per city). The host
    accumulator stays the default — city canvases at 2.5 m can exceed HBM.
    """
    build_tif = os.path.join(respath, f"{cityname}_build.tif")
    height_tif = os.path.join(respath, f"{cityname}_height.tif")
    # resume: skip only when BOTH artifacts exist (build is written first,
    # so a crash between the two writes must re-run the city — the
    # reference keys on build alone and can lose the height tif forever,
    # predict_…globe.py:129-131)
    if os.path.exists(build_tif) and os.path.exists(height_tif):
        return build_tif, height_tif

    from srbh_tpu.data.pipeline import DataLoader

    if stitch == "device" and not _device_canvas_fits(
            dataset.width, dataset.height, chans_build, upscale):
        print(f"predict_city[{cityname}]: device canvases "
              f"({_canvas_bytes(dataset.width, dataset.height, chans_build, upscale) / 2**30:.1f} GiB) "
              "exceed the HBM budget; falling back to the host stitcher")
        stitch = "host"
    if stitch == "device":
        from srbh_tpu.predict.device_stitcher import DeviceMosaicAccumulator

        acc = DeviceMosaicAccumulator(dataset.width, dataset.height,
                                      chans_build, upscale)
    else:
        acc = MosaicAccumulator(dataset.width, dataset.height, chans_build,
                                upscale)
    # threaded decode overlaps the host window reads with device compute
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        num_workers=4, prefetch=2)
    for batch in loader:
        images, pos = batch["image"], batch["pos"]
        n_real = images.shape[0]
        if n_real < batch_size:  # pad tail batch to fixed shape
            pad = batch_size - n_real
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
        h, b = step(variables, sr_params, jnp.asarray(images))
        if stitch == "device":
            # zero-count windows mask out the padded tail on device
            pos_full = np.zeros((batch_size, 4), np.int32)
            pos_full[:n_real] = pos
            acc.add_batch(h, b, pos_full)
        else:
            # slice the padded tail on DEVICE before the host transfer —
            # np.asarray(h)[:n_real] would ship the whole padded batch
            # (~18 MB of discarded rows per city tail at batch 32)
            h = np.asarray(h[:n_real])
            b = np.asarray(b[:n_real])
            acc.add_batch(h, b, pos)

    height, build_cls, weight = acc.finalize()
    nres = dataset.geotrans[1] / upscale
    os.makedirs(respath, exist_ok=True)
    # atomic artifact commits: the resume check above keys on existence, so
    # a kill mid-write must never leave a truncated raster at the final
    # path (it would be skipped — i.e. shipped — on every later resume)
    array2raster_rio(build_tif + ".tmp", build_cls, dataset.s2path,
                     nresolution=nres, iscmap=True)
    array2raster(height_tif + ".tmp", height, dataset.s2path,
                 nresolution=nres, compress="DEFLATE")
    os.replace(build_tif + ".tmp", build_tif)
    os.replace(height_tif + ".tmp", height_tif)
    return build_tif, height_tif


def predict_cities(
    wholeimgpath: str,
    citynames: Sequence[str],
    model, sr_model, variables, sr_params,
    datastats: str,
    respath: str,
    s1dir: str = "s1globe_check", s2dir: str = "s2globe_check",
    gridvalid: Optional[str] = "isv",
    nchans: int = 6, chans_build: int = 7, batch_size: int = 32,
    stitch: str = "host",
    **step_kwargs,
):
    """The per-region driver loop (predict_…globe.py:122-133,221-233).

    ``step_kwargs`` forward to :func:`make_city_step` (``dtype`` for an
    f32-parity sweep, ``mesh``/``partition`` for a sharded step)."""
    step = make_city_step(model, sr_model, **step_kwargs)
    results = []
    for cityname in citynames:
        # resume check BEFORE touching the city's inputs: completed cities
        # must skip even if their rasters/grids were archived since
        # (the reference checks first too, predict_…globe.py:129-131)
        build_tif = os.path.join(respath, f"{cityname}_build.tif")
        height_tif = os.path.join(respath, f"{cityname}_height.tif")
        if os.path.exists(build_tif) and os.path.exists(height_tif):
            results.append((build_tif, height_tif))
            continue
        ds = GridImageDataset(wholeimgpath, cityname, datastats,
                              s1dir=s1dir, s2dir=s2dir,
                              gridvalid=gridvalid, nchans=nchans)
        results.append(predict_city(ds, step, variables, sr_params,
                                    respath, cityname, chans_build,
                                    batch_size, stitch=stitch))
    return results


def city_names_from_dir(wholeimgpath: str) -> list:
    """getcitynamelist (predict_…globe.py:213-218): *_s2.tif stems."""
    import pathlib

    return [p.stem[:-3] for p in sorted(
        pathlib.Path(wholeimgpath).glob("*_s2.tif"))]
