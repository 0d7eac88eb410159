"""Host-side data layer: raster/vector codecs, datasets, pipelines, grids."""
from srbh_tpu.data.dataset import (
    LRHRPairDataset,
    S1GlobeDataset,
    S2GlobeDataset,
    S12GlobeDataset,
)
from srbh_tpu.data import crs
from srbh_tpu.data.grid import (
    GridImageDataset,
    count_fishgrid_valid,
    fishgrid_bounds_cells,
    fishgrid_cells,
    fishgrid_stats,
    generate_index,
    write_fishgrid,
    write_fishgrid_bounds,
    write_fishgrid_tif,
)
from srbh_tpu.data.legacy import SimpleTileDataset, WholeImageDataset, load_whole_s12
from srbh_tpu.data.pipeline import DataLoader
from srbh_tpu.data.shapefile import ShapeRecord, read_shapefile, write_shapefile
from srbh_tpu.data.tiff import TiffInfo, TiffReader, read_tiff, write_tiff

__all__ = [
    "crs",
    "LRHRPairDataset", "S1GlobeDataset", "S2GlobeDataset", "S12GlobeDataset",
    "GridImageDataset", "count_fishgrid_valid", "fishgrid_bounds_cells",
    "fishgrid_cells", "fishgrid_stats", "generate_index", "write_fishgrid",
    "write_fishgrid_bounds", "write_fishgrid_tif",
    "SimpleTileDataset", "WholeImageDataset", "load_whole_s12",
    "DataLoader", "ShapeRecord", "read_shapefile", "write_shapefile",
    "TiffInfo", "TiffReader", "read_tiff", "write_tiff",
]
