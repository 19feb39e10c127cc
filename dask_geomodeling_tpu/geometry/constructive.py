"""Constructive geometry operations: Buffer and Simplify.

Semantics match the reference (dask_geomodeling/geometry/constructive.py):
buffering happens in a chosen projection (transform → buffer → transform
back); simplification tolerance defaults to the request's ``min_size``.
"""
import numbers

from dask_geomodeling_tpu.geo import Extent
from dask_geomodeling_tpu.geometry.base import BaseSingle

__all__ = ["Buffer", "Simplify"]


class Buffer(BaseSingle):
    """Buffer features by a distance measured in the given projection.

    Args:
      source (GeometryBlock): features to buffer
      distance (float): buffer distance in projection units
      projection (str): projection the buffering is computed in
      resolution (int): points per quarter circle (default 16)
    """

    def __init__(self, source, distance, projection, resolution=16):
        if not isinstance(distance, numbers.Real):
            raise TypeError("Argument 'distance' must be a float or int.")
        if not isinstance(projection, str):
            raise TypeError("Argument 'projection' must be a str.")
        if not isinstance(resolution, int):
            raise TypeError("Argument 'resolution' must be an int.")
        super().__init__(source, distance, projection, resolution)

    @property
    def distance(self):
        return self.args[1]

    @property
    def projection(self):
        return self.args[2]

    @property
    def resolution(self):
        return self.args[3]

    def get_sources_and_requests(self, **request):
        process_kwargs = {
            "distance": self.distance,
            "buf_srs": self.projection,
            "resolution": self.resolution,
        }
        return [(self.source, request), (process_kwargs, None)]

    @staticmethod
    def process(data, kwargs):
        if "features" in data:
            if len(data["features"]) == 0:
                return data
            req_srs = data["projection"]
            buf_srs = kwargs["buf_srs"]
            features = data["features"].set_geometry(
                data["features"]
                .geometry.to_crs(buf_srs)
                .buffer(kwargs["distance"], kwargs["resolution"])
                .to_crs(req_srs)
            )
            return {"features": features, "projection": req_srs}
        if "extent" in data:
            if not data["extent"]:
                return data
            req_srs = data["projection"]
            buf_srs = kwargs["buf_srs"]
            extent = (
                Extent(data["extent"], req_srs)
                .transformed(buf_srs)
                .buffered(kwargs["distance"])
                .transformed(req_srs)
            )
            return {"extent": extent.bbox, "projection": req_srs}
        raise NotImplementedError("Unknown mode in Buffer.process")


class Simplify(BaseSingle):
    """Simplify feature geometries with a tolerance (default: the request's
    ``min_size``)."""

    def __init__(self, source, tolerance=None, preserve_topology=True):
        if tolerance is not None:
            tolerance = float(tolerance)
        super().__init__(source, tolerance, bool(preserve_topology))

    @property
    def tolerance(self):
        return self.args[1]

    @property
    def preserve_topology(self):
        return self.args[2]

    def get_sources_and_requests(self, **request):
        process_kwargs = {
            "tolerance": self.tolerance or request.get("min_size") or 0.0,
            "preserve_topology": self.preserve_topology,
        }
        return [(self.source, request), (process_kwargs, None)]

    @staticmethod
    def process(data, kwargs):
        if "features" not in data:
            # the extent is assumed unchanged by simplification
            return data
        features = data["features"].set_geometry(
            data["features"].geometry.simplify(
                kwargs["tolerance"], preserve_topology=kwargs["preserve_topology"]
            )
        )
        return {"features": features, "projection": data["projection"]}
