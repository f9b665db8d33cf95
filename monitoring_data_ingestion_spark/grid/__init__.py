from .model import GRID_SCHEMA
from .ops import (
    anomaly,
    bbox_filter,
    clip_polygon,
    climatological_normal,
    nodata_to_null,
    scale_values,
)

__all__ = [
    "GRID_SCHEMA",
    "anomaly",
    "bbox_filter",
    "clip_polygon",
    "climatological_normal",
    "nodata_to_null",
    "scale_values",
]
