"""Geo foundation: transforms, CRS, geometry engine, rasterization."""
from dask_geomodeling_tpu.geo.dtypes import (  # noqa
    get_index,
    get_index_jax,
    get_dtype_max,
    get_dtype_min,
    get_int_dtype,
    get_uint_dtype,
    get_footprint,
    get_rounded_repr,
    parse_percentile_statistic,
    dtype_for_statistic,
)
from dask_geomodeling_tpu.geo.geotransform import GeoTransform, Extent  # noqa
from dask_geomodeling_tpu.geo.crs import (  # noqa
    SpatialReference,
    TransformException,
    get_sr,
    get_crs,
    crs_to_srs,
    get_projection,
    get_epsg_or_wkt,
    get_transform_func,
    transform_points,
    transform_extent,
    transform_min_size,
)
from dask_geomodeling_tpu.geo.timeutils import (  # noqa
    snap_start_stop,
    find_neigbours,
    dt_to_ms,
    ms_to_dt,
    filter_none,
    offset_to_timedelta,
    normalize_offset,
)
from dask_geomodeling_tpu.geo.safefiles import safe_file_url, safe_abspath  # noqa
from dask_geomodeling_tpu.geo.measurements import percentile  # noqa
from dask_geomodeling_tpu.geo.rasterize import rasterize_geoseries  # noqa
from dask_geomodeling_tpu.geo.features import GeoSeries, GeoDataFrame  # noqa
from dask_geomodeling_tpu.geo import geometry  # noqa
from dask_geomodeling_tpu.geo.geometry import WKTReadingError  # noqa


def shapely_transform(geom, src_srs, dst_srs):
    """Transform a geometry between CRSes (name kept for reference parity;
    reference utils.py:452-473)."""
    if src_srs.upper() == dst_srs.upper():
        return geom
    func = get_transform_func(src_srs, dst_srs)
    result = geometry.transform(func, geom)
    result.srs = dst_srs
    return result


def shapely_from_wkt(wkt):
    """Parse WKT (name kept for reference parity)."""
    return geometry.from_wkt(wkt)
