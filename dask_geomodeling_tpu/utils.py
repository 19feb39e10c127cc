"""Flat utils namespace mirroring the reference's ``dask_geomodeling.utils``.

All functionality lives in the :mod:`dask_geomodeling_tpu.geo` subpackage;
this module re-exports it so code written against the reference's layout
ports over mechanically.
"""
from dask_geomodeling_tpu.geo import *  # noqa: F401,F403
from dask_geomodeling_tpu.geo import (  # noqa: F401 (not in geo's __all__)
    shapely_transform,
    shapely_from_wkt,
)


def create_dataset(array, geo_transform=None, projection=None, no_data_value=None):
    """An in-memory raster dataset over a numpy array.

    Replacement for the reference's gdal MEM-dataset factory
    (reference utils.py:550-607): returns an object exposing the small
    GDAL-dataset surface this framework uses (geo transform, projection,
    nodata, array access).  The array is referenced, not copied.
    """
    import numpy as np

    array = np.asarray(array)
    if array.ndim != 3:
        raise ValueError("Expected a (bands, height, width) array")

    class _MemoryDataset:
        RasterCount = array.shape[0]
        RasterYSize = array.shape[1]
        RasterXSize = array.shape[2]

        def __init__(self):
            self.array = array

        def ReadAsArray(self):
            return self.array

        def GetGeoTransform(self):
            return tuple(geo_transform) if geo_transform else (0, 1, 0, 0, 0, -1)

        def GetProjection(self):
            from dask_geomodeling_tpu.geo.crs import get_sr

            return get_sr(projection).ExportToWkt() if projection else ""

        def GetNoDataValue(self):
            return no_data_value

        def FlushCache(self):
            pass

    return _MemoryDataset()


class Dataset:
    """Context manager around :func:`create_dataset`.

    Usage::

        with Dataset(array, geo_transform=..., projection=...) as dataset:
            ...
    """

    def __init__(self, array, **kwargs):
        self.array = array
        self.dataset = create_dataset(array, **kwargs)

    def __enter__(self):
        return self.dataset

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()

    def close(self):
        self.dataset.FlushCache()
