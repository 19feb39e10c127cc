"""Geometry set operations: Difference and Intersection.

Semantics match the reference (dask_geomodeling/geometry/set_operations.py):
Difference pre-flights the source's extent to scope the other's request,
aligns features by index, and passes geometries missing in 'other' through
unchanged; Intersection clips features to the request geometry.
"""
from dask_geomodeling_tpu.geo.features import GeoDataFrame
from dask_geomodeling_tpu.geo.geometry import box

from dask_geomodeling_tpu.geometry.base import BaseSingle, GeometryBlock

__all__ = ["Difference", "Intersection"]


class Difference(BaseSingle):
    """Subtract the same-index geometries of 'other' from 'source'."""

    def __init__(self, source, other):
        if not isinstance(other, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(other)))
        super().__init__(source, other)

    @property
    def other(self):
        return self.args[1]

    def get_sources_and_requests(self, **request):
        if request["mode"] == "extent":
            # the true extent could shrink, but that requires evaluation
            return [(self.source, request)]

        # pre-flight the source extent to scope the other's request
        extent_request = request.copy()
        extent_request["mode"] = "extent"
        extent = self.source.get_data(**extent_request)["extent"]

        if extent is None:
            projection = request["projection"]
            return [({"empty": True, "projection": projection}, None)]

        other_request = request.copy()
        other_request["geometry"] = box(*extent)
        return [(self.source, request), (self.other, other_request)]

    @staticmethod
    def process(source_data, other_data=None):
        if other_data is None:
            if source_data.get("empty"):
                return {
                    "features": GeoDataFrame([]),
                    "projection": source_data["projection"],
                }
            return source_data

        a = source_data["features"]
        b = other_data["features"]
        if len(a) == 0 or len(b) == 0:
            return source_data

        a_series = a.geometry
        b_series = b.geometry.reindex(a_series.index)
        result_series = a_series.difference(b_series)

        # A - None = A: restore geometries missing in b
        missing_in_b = b_series.isna()
        result_series = result_series.where(~missing_in_b.values, a_series)
        result = a.set_geometry(result_series)
        return {"features": result, "projection": source_data["projection"]}


class Intersection(BaseSingle):
    """Clip each feature to the request geometry."""

    def __init__(self, source, other=None):
        if isinstance(other, GeometryBlock):
            raise NotImplementedError(
                "Cannot compare geometries with another geometry datasource"
            )
        if other is not None:
            raise NotImplementedError(
                "Cannot compare geometries with a constant geometry"
            )
        super().__init__(source, other)

    @property
    def other(self):
        return self.args[1]

    def get_sources_and_requests(self, **request):
        return [(self.source, request), (request["geometry"], None)]

    @staticmethod
    def process(data, geometry):
        # features arrive in the projection of the request geometry
        if "features" in data:
            features = data["features"]
            features = features.set_geometry(
                features.geometry.intersection(geometry)
            )
            return {"features": features, "projection": data["projection"]}
        if "extent" in data:
            bbox1 = data["extent"]
            bbox2 = geometry.bounds
            bbox = (
                max(bbox1[0], bbox2[0]),
                max(bbox1[1], bbox2[1]),
                min(bbox1[2], bbox2[2]),
                min(bbox1[3], bbox2[3]),
            )
            return {"extent": bbox, "projection": data["projection"]}
        return data
