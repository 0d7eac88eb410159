"""Metrics: streaming accumulators, image quality, and result writers."""
from srbh_tpu.metrics.image import (
    bgr2ycbcr,
    calculate_cpsnr,
    calculate_psnr,
    calculate_psnrb,
    calculate_ssim,
    to_y_channel,
)
from srbh_tpu.metrics.streaming import (
    AverageMeter,
    HeightMetric,
    SegmentationMetric,
    confusion_update,
    height_update,
)
from srbh_tpu.metrics.writers import acc2file_height, acc2file_rmse, acc2file_seg
from srbh_tpu.metrics.learned import (
    calculate_clipscore,
    calculate_clipscore_pt,
    calculate_lpips,
    calculate_lpips_pt,
)

__all__ = [
    "bgr2ycbcr", "calculate_cpsnr", "calculate_psnr", "calculate_psnrb",
    "calculate_ssim", "to_y_channel",
    "AverageMeter", "HeightMetric", "SegmentationMetric",
    "confusion_update", "height_update",
    "acc2file_height", "acc2file_rmse", "acc2file_seg",
    "calculate_clipscore", "calculate_clipscore_pt", "calculate_lpips",
    "calculate_lpips_pt",
]
