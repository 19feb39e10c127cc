"""Raster sinks: RasterFileSink and the tiled ``to_file`` export.

Semantics match the reference (dask_geomodeling/raster/sinks.py): each vals
request writes one deflate-compressed tiled GeoTIFF named by a hash of the
request (idempotent re-runs — this doubles as resumable export state,
SURVEY §5 "Checkpoint / resume"); ``to_file`` runs the sink under a
RasterTiler and merges the tiles into a VRT.
"""
import glob
import logging
import os

import numpy as np

from dask_geomodeling_tpu import utils
from dask_geomodeling_tpu.core.tokens import tokenize
from dask_geomodeling_tpu.raster.base import BaseSingle, RasterBlock
from dask_geomodeling_tpu.raster.parallelize import RasterTiler

__all__ = ["RasterFileSink", "to_file"]

logger = logging.getLogger(__name__)


class RasterFileSink(BaseSingle):
    """Write raster data to hash-named GeoTIFF files in a directory.

    Args:
      source (RasterBlock): block the data comes from
      url (str): target directory (relative to ``geomodeling.root``)
    """

    def __init__(self, source, url):
        if not isinstance(source, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        safe_url = utils.safe_file_url(url)
        super().__init__(source, safe_url)

    @property
    def url(self):
        return self.args[1]

    def get_sources_and_requests(self, **request):
        if request["mode"] != "vals":
            return [(self.store, request), ({}, None)]

        process_kwargs = {
            "url": self.url,
            "hash": tokenize(request)[:7],
            "bbox": request["bbox"],
            "projection": request["projection"],
        }
        return [(self.store, request), (process_kwargs, None)]

    @staticmethod
    def process(data, process_kwargs):
        from dask_geomodeling_tpu.io.geotiff import write_geotiff

        if not process_kwargs:
            return data  # non-vals mode passes through

        if data is None or "values" not in data:
            return None

        values = data["values"]
        no_data_value = data["no_data_value"]

        if values.ndim != 3 or values.shape[0] != 1:
            raise ValueError(
                "Expected a single-band raster (shape (1, H, W)), got shape "
                "{}".format(values.shape)
            )

        band_data = values[0]
        if no_data_value is not None and np.all(band_data == no_data_value):
            return None  # skip all-nodata tiles

        height, width = band_data.shape
        path = utils.safe_abspath(process_kwargs["url"])
        os.makedirs(path, exist_ok=True)
        filepath = os.path.join(path, process_kwargs["hash"] + ".tif")

        x1, y1, x2, y2 = process_kwargs["bbox"]
        geo_transform = (
            x1,
            (x2 - x1) / width,
            0,
            y2,
            0,
            -(y2 - y1) / height,
        )

        write_geotiff(
            filepath,
            band_data[np.newaxis].astype(
                band_data.dtype if band_data.dtype != bool else np.uint8
            ),
            geo_transform=geo_transform,
            projection=process_kwargs["projection"],
            no_data_value=(
                float(no_data_value) if no_data_value is not None else None
            ),
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
    request["mode"] = "vals"
    _complete_request_from_source(request, source)

    path = utils.safe_abspath(url)
    if os.path.isdir(path):
        path = os.path.join(path, "output.vrt")
    tiles_dir = os.path.join(os.path.split(path)[0], "tiles")

    tiler = RasterTiler(RasterFileSink(source, tiles_dir), tile_size)
    tiler.get_data(**request)

    RasterFileSink.merge_files(tiles_dir, path)


def _complete_request_from_source(request, source):
    """Fill projection/bbox/width/height from the source's native grid."""
    if "projection" not in request:
        if source.projection is None:
            raise ValueError(
                "Cannot determine the projection from the source raster. "
                "Please provide a 'projection' argument."
            )
        request["projection"] = source.projection
    if "bbox" not in request:
        if source.geometry is None:
            raise ValueError(
                "Cannot determine the extent from the source raster. "
                "Please provide a 'bbox' argument."
            )
        request["bbox"] = source.geometry.bounds
    if "width" in request and "height" in request:
        return
    grid = source.geo_transform
    if grid is None:
        raise ValueError(
            "Cannot determine the pixel size from the source raster. "
            "Please provide 'width' and 'height' arguments."
        )
    x1, y1, x2, y2 = request["bbox"]
    request["width"] = int(round((x2 - x1) / abs(float(grid[1]))))
    request["height"] = int(round((y2 - y1) / abs(float(grid[5]))))
