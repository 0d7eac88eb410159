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

_LEARNED = ("calculate_clipscore", "calculate_clipscore_pt",
            "calculate_lpips", "calculate_lpips_pt")


def __getattr__(name):
    # the learned metrics pull in the full CLIP/LPIPS Flax towers; import
    # them only when actually used so `import srbh_tpu.metrics` for
    # PSNR/SSIM stays light (the documented optional gating)
    if name in _LEARNED:
        from srbh_tpu.metrics import learned

        return getattr(learned, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "bgr2ycbcr", "calculate_cpsnr", "calculate_psnr", "calculate_psnrb",
    "calculate_ssim", "to_y_channel",
    "AverageMeter", "HeightMetric", "SegmentationMetric",
    "confusion_update", "height_update",
    "acc2file_height", "acc2file_rmse", "acc2file_seg",
    "calculate_clipscore", "calculate_clipscore_pt", "calculate_lpips",
    "calculate_lpips_pt",
]
