"""Series derived from the geometry field itself: Area.

Contract follows reference dask_geomodeling/geometry/geom_operations.py —
the area is computed after transforming into the requested projection (an
equal-area CRS gives physical areas; the request CRS may not).
"""
import pandas as pd

from dask_geomodeling_tpu.geometry.base import GeometryBlock, SeriesBlock
from dask_geomodeling_tpu.core import arg
from dask_geomodeling_tpu.core.validate import expect_instance

__all__ = ["Area"]

_EMPTY = pd.Series([], dtype=float)


class Area(SeriesBlock):
    """The area of each feature, computed in the given projection."""

    def __init__(self, source, projection):
        expect_instance(source, GeometryBlock, "source")
        if not isinstance(projection, str):
            raise TypeError("Argument 'projection' must be a str.")
        super().__init__(source, projection)

    source = arg(0)
    projection = arg(1)

    @staticmethod
    def process(data, projection):
        frame = data.get("features")
        if frame is None or not len(frame):
            return _EMPTY.copy()
        shapes = frame.geometry
        shapes.crs = data["projection"]
        return shapes.to_crs(projection).area
