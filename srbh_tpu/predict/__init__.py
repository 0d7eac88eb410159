"""City-scale prediction: jitted steps, mosaics, writers."""
from srbh_tpu.predict.colormap import CMAP
from srbh_tpu.predict.predictor import (
    city_names_from_dir,
    make_city_step,
    predict_cities,
    predict_city,
)
from srbh_tpu.predict.device_stitcher import (
    DeviceMosaicAccumulator,
    finalize_mosaic,
    stitch_tiles,
    stitch_tiles_sharded,
)
from srbh_tpu.predict.sliding import predict_whole_image, window_anchors
from srbh_tpu.predict.stitcher import MosaicAccumulator
from srbh_tpu.predict.writers import array2raster, array2raster_rio

__all__ = [
    "CMAP", "city_names_from_dir", "make_city_step", "predict_cities",
    "predict_city", "predict_whole_image", "window_anchors",
    "MosaicAccumulator", "DeviceMosaicAccumulator", "stitch_tiles",
    "stitch_tiles_sharded", "finalize_mosaic", "array2raster",
    "array2raster_rio",
]
