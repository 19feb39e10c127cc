from dask_geomodeling_tpu.geometry.base import (  # noqa
    GeometryBlock,
    SeriesBlock,
    GetSeriesBlock,
    SetSeriesBlock,
)
