"""srbh_tpu — TPU-native super-resolution building-height estimation framework.

A from-scratch JAX / Flax / XLA / Pallas rebuild of the capabilities of
`lauraset/Super-resolution-building-height-estimation` (Cao & Weng, RSE 2024):
per-pixel building height + 7-class hierarchical footprint segmentation at
2.5 m from 10 m Sentinel-2 (6-band) + Sentinel-1 (2-band) tiles, via a frozen
Real-ESRGAN feature extractor fused into an EfficientNet-B4 U-Net.

Layout conventions
------------------
* Arrays are **NHWC** (channels-last) on device — the TPU-native layout.
  The reference is NCHW torch; converters live at I/O boundaries only.
* Parameters are float32; compute dtype is configurable (bf16 on TPU).
* All device code is jit-able: static shapes, `lax` control flow.

Subpackages
-----------
ops        pure-function image/math ops (pixel shuffle, aggregation, SSIM, ...)
models     Flax module zoo (ESPCN, EDSR, RRDBNet, SwinIR, HRfuse, height model)
losses     adaptive multi-task, SSIM, GAN, perceptual, seg-loss library
metrics    streaming confusion-matrix / height metrics + CSV writers
data       host-side GeoTIFF pipeline, datalists, stats, augmentation
train      pjit train/eval steps, schedules, checkpointing, CLI drivers
predict    city-scale sliding-window inference with on-device stitching
parallel   device mesh / sharding helpers
"""

__version__ = "0.1.0"
