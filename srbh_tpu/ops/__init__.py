"""Pure-function op layer: the contract between models, losses and metrics."""
from srbh_tpu.ops.aggregate import aggregate, aggregate_mean
from srbh_tpu.ops.hierarchy import (
    DEFAULT_HIR,
    WEIGHT_METHODS,
    build_hierarchy_lut,
    hierweight,
    hierweight_equal,
    hierweight_simple,
)
from srbh_tpu.ops.normalize import load_stats_table, norm_offsets, normalize_tile
from srbh_tpu.ops.resize import downsample_nearest, resize_nearest, upsample_nearest
from srbh_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

__all__ = [
    "aggregate",
    "aggregate_mean",
    "DEFAULT_HIR",
    "WEIGHT_METHODS",
    "build_hierarchy_lut",
    "hierweight",
    "hierweight_equal",
    "hierweight_simple",
    "load_stats_table",
    "norm_offsets",
    "normalize_tile",
    "downsample_nearest",
    "resize_nearest",
    "upsample_nearest",
    "pixel_shuffle",
    "pixel_unshuffle",
]
