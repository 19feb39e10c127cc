"""JPEG raster reader (world-file georeferencing).

The reference opens JPEG rasters through GDAL's JPEG driver (reference
raster/sources.py:66-71), which links libjpeg; here the entropy decode
rides Pillow (baked into this image) — the geospatial layer (world-file
``.jgw``/``.wld`` sidecar, ``.prj`` CRS, RasterData contract) is this
module's.  Grayscale loads as one band, RGB as three; CMYK/YCbCr
converts to RGB, matching the driver's default.
"""
import os

import numpy as np

__all__ = ["read_jpeg"]


def read_jpeg(path):
    """Read a JPEG file into a RasterData payload."""
    from PIL import Image

    from dask_geomodeling_tpu.io.asciigrid import _sidecar_projection
    from dask_geomodeling_tpu.io.png import _world_file
    from dask_geomodeling_tpu.raster.sources import RasterData

    with Image.open(path) as image:
        if image.mode not in ("L", "RGB"):
            image = image.convert("RGB" if len(image.getbands()) > 1 else "L")
        pixels = np.asarray(image)
    if pixels.ndim == 2:
        array = pixels[None]
    else:
        array = np.ascontiguousarray(pixels.transpose(2, 0, 1))

    # world files share the PNG conventions (.jgw preferred, .wld too)
    geo_transform = _world_file(
        path, extensions=(".jgw", ".JGW", ".wld", ".WLD")
    )

    return RasterData(
        array=np.ascontiguousarray(array),
        projection=_sidecar_projection(path),
        geo_transform=geo_transform,
        # JPEG has no transparency concept: no nodata (white pixels are
        # data, as GDAL's JPEG driver reports)
        no_data_value=None,
        metadata=[""] * array.shape[0],
    )
