"""Raster sinks: RasterFileSink and the tiled ``to_file`` export.

Covers the reference's sink surface (dask_geomodeling/raster/sinks.py):
each vals request writes one deflate-compressed tiled GeoTIFF named by a
hash of the request (idempotent re-runs — this doubles as resumable
export state, SURVEY §5 "Checkpoint / resume"); ``to_file`` runs the
sink under a RasterTiler and merges the tiles into a VRT.
"""
import glob
import logging
import os
from collections import namedtuple

import numpy as np

from dask_geomodeling_tpu import utils
from dask_geomodeling_tpu.core import arg
from dask_geomodeling_tpu.core.tokens import tokenize
from dask_geomodeling_tpu.geo.geotransform import GeoTransform
from dask_geomodeling_tpu.raster.base import BaseSingle, RasterBlock
from dask_geomodeling_tpu.raster.parallelize import RasterTiler
from dask_geomodeling_tpu.core.validate import expect_instance

__all__ = ["RasterFileSink", "to_file", "to_cog", "to_zarr"]

logger = logging.getLogger(__name__)

#: everything one tile write needs, planned at request-rewrite time
_TileWriteSpec = namedtuple(
    "_TileWriteSpec", ["directory", "stem", "bbox", "projection"]
)


class RasterFileSink(BaseSingle):
    """Write raster data to hash-named GeoTIFF files in a directory.

    Args:
      source (RasterBlock): block the data comes from
      url (str): target directory (relative to ``geomodeling.root``)
    """

    def __init__(self, source, url):
        expect_instance(source, RasterBlock, "source")
        super().__init__(source, utils.safe_file_url(url))

    url = arg(1, "sandboxed target directory URL")

    def get_sources_and_requests(self, **request):
        spec = None
        if request["mode"] == "vals":
            spec = _TileWriteSpec(
                directory=self.url,
                stem=tokenize(request)[:7],
                bbox=request["bbox"],
                projection=request["projection"],
            )
        return [(self.store, request), (spec, None)]

    @staticmethod
    def process(data, spec=None):
        from dask_geomodeling_tpu.io.geotiff import write_geotiff

        if spec is None:
            return data  # non-vals mode passes through
        if data is None or "values" not in data:
            return None
        spec = _TileWriteSpec(*spec)

        values = np.asarray(data["values"])
        if values.ndim != 3 or values.shape[0] != 1:
            raise ValueError(
                "Expected a single-band raster (shape (1, H, W)), got shape "
                "{}".format(values.shape)
            )
        fill = data["no_data_value"]
        if fill is not None and not np.any(values != fill):
            return None  # an all-nodata tile leaves no file behind

        directory = utils.safe_abspath(spec.directory)
        os.makedirs(directory, exist_ok=True)
        height, width = values.shape[1:]
        if values.dtype == bool:
            values = values.astype(np.uint8)
        write_geotiff(
            os.path.join(directory, spec.stem + ".tif"),
            values,
            geo_transform=tuple(
                GeoTransform.from_bbox(spec.bbox, height, width)
            ),
            projection=spec.projection,
            no_data_value=None if fill is None else float(fill),
            compress="deflate",
            tiled=True,
        )
        return None

    @staticmethod
    def merge_files(path, target):
        """Merge the sink's GeoTIFF tiles into a VRT file."""
        from dask_geomodeling_tpu.io.vrt import build_vrt

        path = utils.safe_abspath(path)
        target = utils.safe_abspath(target)

        if os.path.exists(target):
            raise IOError("Target '{}' already exists".format(target))

        source_paths = glob.glob(os.path.join(path, "*.tif"))
        if len(source_paths) == 0:
            raise IOError("No source .tif files found in '{}'".format(path))

        build_vrt(target, sorted(source_paths))


def to_file(source, url, tile_size, **request):
    """Export a RasterBlock to tiled GeoTIFFs merged into a VRT at ``url``.

    Missing request fields (projection, bbox, width, height) default to the
    source raster's native values.
    """
    request = _native_request(source, request)

    path = utils.safe_abspath(url)
    if os.path.isdir(path):
        path = os.path.join(path, "output.vrt")
    tiles_dir = os.path.join(os.path.split(path)[0], "tiles")

    tiler = RasterTiler(RasterFileSink(source, tiles_dir), tile_size)
    tiler.get_data(**request)

    RasterFileSink.merge_files(tiles_dir, path)


def to_cog(source, url, overviews=None, overview_resampling="nearest",
           **request):
    """Export a RasterBlock as a single cloud-optimized GeoTIFF.

    The modern single-file counterpart of :func:`to_file`'s tiles+VRT
    layout: tiled pixel data, an overview pyramid (auto-generated unless
    ``overviews`` decimation factors are given), and all IFDs at the
    head of the file so remote range-readers resolve the header and
    previews cheaply (``overview_resampling``: "nearest" or the
    nodata-aware "average").  Missing request fields default to the source's
    native grid exactly like :func:`to_file`; the admission-control
    raster limit bounds the request like any other ``get_data`` call
    (oversized requests go through the batched tile runtime).
    """
    from dask_geomodeling_tpu.io.geotiff import write_geotiff

    request = _native_request(source, request)
    path = utils.safe_abspath(url)
    data = source.get_data(**request)
    if data is None or "values" not in data:
        raise ValueError("The source returned no data for this request")
    height, width = np.asarray(data["values"]).shape[1:]
    fill = data["no_data_value"]
    write_geotiff(
        path,
        np.asarray(data["values"]),
        geo_transform=tuple(
            GeoTransform.from_bbox(request["bbox"], height, width)
        ),
        projection=request["projection"],
        no_data_value=None if fill is None else float(fill),
        compress="deflate",
        cog=True,
        overviews=overviews,
        overview_resampling=overview_resampling,
    )


def to_zarr(source, url, **request):
    """Export a RasterBlock as a consolidated Zarr v2 group store (the
    cloud-native xarray interchange layout; see :func:`to_cog` for the
    request-defaulting rules shared by all single-file exports)."""
    from dask_geomodeling_tpu.io.zarr import write_zarr

    request = _native_request(source, request)
    path = utils.safe_abspath(url)
    data = source.get_data(**request)
    if data is None or "values" not in data:
        raise ValueError("The source returned no data for this request")
    height, width = np.asarray(data["values"]).shape[1:]
    fill = data["no_data_value"]
    write_zarr(
        path,
        np.asarray(data["values"]),
        geo_transform=tuple(
            GeoTransform.from_bbox(request["bbox"], height, width)
        ),
        projection=request["projection"],
        no_data_value=None if fill is None else float(fill),
    )


#: export request fields derivable from a source raster's native grid:
#: field -> (source attribute to derive from, derivation)
_NATIVE_FIELDS = (
    ("projection", "projection", lambda source: source.projection),
    ("bbox", "extent", lambda source: source.geometry.bounds),
)


def _native_request(source, overrides):
    """A full vals request: the source's native grid + user overrides.

    Inverted flow vs. filling blanks in place: the request is *built*
    from the native-grid table, then user-supplied fields replace the
    derived ones, so each derivation only runs (and only needs to be
    derivable) when the user left that field out.
    """
    request = dict(overrides, mode="vals")
    for field, label, derive in _NATIVE_FIELDS:
        if field in request:
            continue
        try:
            derived = derive(source)
            if derived is None:
                raise ValueError(label)
        except (AttributeError, ValueError):
            raise ValueError(
                "Cannot determine the {} from the source raster. "
                "Please provide a '{}' argument.".format(label, field)
            )
        request[field] = derived
    if not ("width" in request and "height" in request):
        grid = source.geo_transform
        if grid is None:
            raise ValueError(
                "Cannot determine the pixel size from the source raster. "
                "Please provide 'width' and 'height' arguments."
            )
        x1, y1, x2, y2 = request["bbox"]
        request["width"] = int(round((x2 - x1) / abs(float(grid[1]))))
        request["height"] = int(round((y2 - y1) / abs(float(grid[5]))))
    return request
