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
