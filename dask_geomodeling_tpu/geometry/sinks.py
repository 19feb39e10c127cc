"""Geometry sinks: GeometryFileSink and the tiled ``to_file`` export.

Semantics match the reference (dask_geomodeling/geometry/sinks.py):
per-request-hash files, JSON-serialized nested columns, categorical
conversion, GeoJSON reprojection to EPSG:4326, merge_files gathering
partials.  Formats come from the native codecs (io/vectorfile.py:
geojson, gpkg).
"""
import glob
import json
import logging
import os
import shutil
import tempfile
from contextlib import contextmanager

import pandas as pd

from dask_geomodeling_tpu import utils
from dask_geomodeling_tpu.config import config
from dask_geomodeling_tpu.core.tokens import tokenize
from dask_geomodeling_tpu.geo.features import GeoDataFrame
from dask_geomodeling_tpu.geo.geometry import box
from dask_geomodeling_tpu.geometry.base import BaseSingle
from dask_geomodeling_tpu.geometry.parallelize import GeometryTiler

__all__ = ["GeometryFileSink", "to_file"]

logger = logging.getLogger(__name__)


def _to_json(value):
    if isinstance(value, (list, dict)):
        try:
            return json.dumps(value)
        except TypeError:
            return "<unable to export>"
    return value


def _rename_columns(gdf, fields, index_name):
    """Keep only the geometry + mapped columns, renaming per ``fields``."""
    result = GeoDataFrame(
        pd.DataFrame(index=gdf.index), geometry=list(gdf.geometry), crs=gdf.crs
    )
    for new_col, old_col in fields.items():
        if old_col not in gdf.columns and old_col == index_name:
            result[new_col] = gdf.index
        else:
            result[new_col] = gdf[old_col]
    return result


class GeometryFileSink(BaseSingle):
    """Write feature data to hash-named files in a directory.

    Args:
      source (GeometryBlock): block the data comes from
      url (str): target directory (relative to ``geomodeling.root``)
      extension (str): output format; see ``supported_extensions``
      fields (dict): {output field name: column name} mapping
    """

    supported_extensions = {
        "geojson": "GeoJSON",
        "gpkg": "GPKG",
        "shp": "ESRI Shapefile",
        "gml": "GML",
        # beyond the reference's four sink drivers (sinks.py:30-35):
        "parquet": "GeoParquet",
        "fgb": "FlatGeobuf",
    }

    def __init__(self, source, url, extension="geojson", fields=None):
        safe_url = utils.safe_file_url(url)
        if not isinstance(extension, str):
            raise TypeError("'{}' object is not allowed".format(type(extension)))
        if len(extension) > 0 and extension[0] == ".":
            extension = extension[1:]
        if extension not in self.supported_extensions:
            raise ValueError("Format '{}' is unsupported".format(extension))
        if fields is None:
            fields = {x: x for x in source.columns if x != "geometry"}
        elif not isinstance(fields, dict):
            raise TypeError("'{}' object is not allowed".format(type(fields)))
        else:
            missing = set(fields.values()) - source.columns
            if missing:
                raise ValueError("Columns {} are not available".format(missing))
        super().__init__(source, safe_url, extension, fields)

    @property
    def url(self):
        return self.args[1]

    @property
    def extension(self):
        return self.args[2]

    @property
    def fields(self):
        return self.args[3]

    @property
    def columns(self):
        return {"saved"}

    def get_sources_and_requests(self, **request):
        process_kwargs = {
            "url": self.url,
            "fields": self.fields,
            "extension": self.extension,
            "hash": tokenize(request)[:7],
        }
        return [(self.source, request), (process_kwargs, None)]

    @staticmethod
    def process(data, process_kwargs):
        from dask_geomodeling_tpu.io.vectorfile import write_vector

        if "features" not in data or len(data["features"]) == 0:
            return data

        features = data["features"].copy()
        features.crs = data["projection"]
        projection = data["projection"]
        path = utils.safe_abspath(process_kwargs["url"])
        fields = process_kwargs["fields"]
        extension = process_kwargs["extension"]

        os.makedirs(path, exist_ok=True)
        filename = ".".join([process_kwargs["hash"], extension])

        features = _rename_columns(features, fields, features.index.name)

        # serialize nested values, convert categoricals to plain dtypes
        for col in fields.keys():
            series = features[col]
            if series.dtype == object or (
                str(series.dtype) == "category"
                and series.cat.categories.dtype == object
            ):
                features[col] = series.map(_to_json)
        for col in fields.keys():
            series = features[col]
            if str(series.dtype) == "category":
                features[col] = series.astype(series.cat.categories.dtype)

        if extension == "geojson" and projection.upper() != "EPSG:4326":
            features = features.to_crs("EPSG:4326")

        write_vector(features, os.path.join(path, filename))

        result = GeoDataFrame(pd.DataFrame(index=features.index))
        result["saved"] = True
        return {"features": result, "projection": projection}

    @staticmethod
    def merge_files(path, target, remove_source=False):
        """Merge the sink's partial files into one file."""
        from dask_geomodeling_tpu.io.vectorfile import read_vector, write_vector

        path = utils.safe_abspath(path)
        target = utils.safe_abspath(target)

        if os.path.exists(target):
            raise IOError("Target '{}' already exists".format(target))

        ext = os.path.splitext(target)[1]
        source_paths = sorted(glob.glob(os.path.join(path, "*" + ext)))
        if len(source_paths) == 0:
            raise IOError(
                "No source files found with matching extension '{}'".format(ext)
            )
        if len(source_paths) == 1:
            move_or_copy = shutil.move if remove_source else shutil.copy
            move_or_copy(source_paths[0], target)
            if remove_source:
                try:
                    os.rmdir(path)
                except OSError:
                    pass
            return

        frames = [read_vector(p) for p in source_paths]
        crs = frames[0].crs
        merged = GeoDataFrame(pd.concat([pd.DataFrame(f) for f in frames]), crs=crs)
        merged._geometry_column_name = "geometry"
        write_vector(merged, target)
        if remove_source:
            for source_path in source_paths:
                os.remove(source_path)
            try:
                os.rmdir(path)
            except OSError:
                pass


@contextmanager
def DryRunTempDir(*args, **kwargs):
    """Stand-in temporary directory that never touches the filesystem."""
    yield "/tmp/dummy"


def to_file(source, url, fields=None, tile_size=None, dry_run=False, **request):
    """Export a GeometryBlock to a file; optionally tiled via GeometryTiler.

    Args:
      source (GeometryBlock): block the data comes from
      url (str): target path; extension selects the format
      fields (dict): output field mapping
      tile_size (float): optional tiling size (projection units)
      dry_run (bool): only validate the arguments
      **request: geometry request fields (mode defaults to 'centroid')
    """
    if "mode" not in request:
        request["mode"] = "centroid"
    if "geometry" not in request:
        result = source.get_data(mode="extent", projection=request["projection"])
        request["geometry"] = box(*result["extent"])

    path = utils.safe_abspath(url)
    extension = os.path.splitext(path)[1]

    TmpDir = DryRunTempDir if dry_run else tempfile.TemporaryDirectory
    with TmpDir(dir=config.get("temporary_directory", None)) as tmpdir:
        sink = GeometryFileSink(source, tmpdir, extension=extension, fields=fields)

        if tile_size is not None:
            sink = GeometryTiler(sink, tile_size, request["projection"])

        if dry_run:
            return

        sink.get_data(**request)
        GeometryFileSink.merge_files(tmpdir, path)
