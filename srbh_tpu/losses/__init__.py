"""Loss library."""
from srbh_tpu.losses.adaptive import (
    ce_dice,
    ce_dice_adapt,
    ce_dice_adapt_weight,
    dice_binary,
    mse_adapt,
    mse_adapt_weight,
    mse_adapt_weight_hir,
    smooth_l1,
    softmax_cross_entropy,
    weighted_mse,
)

from srbh_tpu.losses import segmentation, sr, ssim_loss  # noqa: F401 (submodule re-exports)

__all__ = [
    "ce_dice", "ce_dice_adapt", "ce_dice_adapt_weight", "dice_binary",
    "mse_adapt", "mse_adapt_weight", "mse_adapt_weight_hir", "smooth_l1",
    "softmax_cross_entropy", "weighted_mse",
    "segmentation", "sr", "ssim_loss",
]
