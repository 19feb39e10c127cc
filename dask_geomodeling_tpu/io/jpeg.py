"""Pillow-backed raster readers: JPEG, BMP, GIF (world-file georeferencing).

The reference opens these through GDAL's JPEG/BMP/GIF drivers (reference
raster/sources.py:66-71), which link the format libraries; here the
pixel decode rides Pillow (baked into this image) — the geospatial layer
(world-file sidecars, ``.prj`` CRS, RasterData contract) is this
module's.  Grayscale loads as one band, RGB as three; palette/CMYK/YCbCr
convert to RGB, matching the drivers' defaults.  World-file suffixes
follow the GDAL convention: ``.jgw`` (JPEG), ``.bpw`` (BMP), ``.gfw``
(GIF), with ``.wld`` accepted everywhere.
"""
import os

import numpy as np

__all__ = ["read_jpeg", "read_pillow_raster"]


def read_pillow_raster(path, world_extensions=(".wld", ".WLD")):
    """Read any Pillow-decodable image into a RasterData payload."""
    from PIL import Image

    from dask_geomodeling_tpu.io.asciigrid import _sidecar_projection
    from dask_geomodeling_tpu.io.png import _world_file
    from dask_geomodeling_tpu.raster.sources import RasterData

    with Image.open(path) as image:
        if image.mode not in ("L", "RGB"):
            # palettes are color even though they hold a single band
            color = image.mode == "P" or len(image.getbands()) > 1
            image = image.convert("RGB" if color else "L")
        pixels = np.asarray(image)
    if pixels.ndim == 2:
        array = pixels[None]
    else:
        array = np.ascontiguousarray(pixels.transpose(2, 0, 1))

    geo_transform = _world_file(path, extensions=world_extensions)

    from dask_geomodeling_tpu.io.geotiff import _pam_overrides

    return RasterData(
        array=np.ascontiguousarray(array),
        projection=_sidecar_projection(path),
        geo_transform=geo_transform,
        # these formats carry no nodata concept themselves (GDAL reports
        # none), but a PAM sidecar can declare one
        no_data_value=_pam_overrides(path)[1],
        metadata=[""] * array.shape[0],
    )


#: GDAL-convention world-file suffixes per extension
_WORLD_SUFFIXES = {
    ".jpg": (".jgw", ".JGW", ".wld", ".WLD"),
    ".jpeg": (".jgw", ".JGW", ".wld", ".WLD"),
    ".bmp": (".bpw", ".BPW", ".wld", ".WLD"),
    ".gif": (".gfw", ".GFW", ".wld", ".WLD"),
}


def read_jpeg(path):
    """Read a JPEG/BMP/GIF file into a RasterData payload."""
    ext = os.path.splitext(path)[1].lower()
    return read_pillow_raster(
        path, _WORLD_SUFFIXES.get(ext, (".wld", ".WLD"))
    )
