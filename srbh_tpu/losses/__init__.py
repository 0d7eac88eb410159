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

__all__ = [
    "ce_dice", "ce_dice_adapt", "ce_dice_adapt_weight", "dice_binary",
    "mse_adapt", "mse_adapt_weight", "mse_adapt_weight_hir", "smooth_l1",
    "softmax_cross_entropy", "weighted_mse",
]
