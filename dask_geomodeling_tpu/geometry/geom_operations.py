"""Operations returning series from geometry fields: Area.

Semantics match the reference (dask_geomodeling/geometry/geom_operations.py).
"""
import pandas as pd

from dask_geomodeling_tpu.geometry.base import GeometryBlock, SeriesBlock

__all__ = ["Area"]


class Area(SeriesBlock):
    """The area of each feature, computed in the given projection."""

    def __init__(self, source, projection):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        if not isinstance(projection, str):
            raise TypeError("Argument 'projection' must be a str.")
        super().__init__(source, projection)

    @property
    def source(self):
        return self.args[0]

    @property
    def projection(self):
        return self.args[1]

    @staticmethod
    def process(data, projection):
        if "features" not in data or len(data["features"]) == 0:
            return pd.Series([], dtype=float)
        geometry = data["features"].geometry
        geometry.crs = data["projection"]
        return geometry.to_crs(projection).area
