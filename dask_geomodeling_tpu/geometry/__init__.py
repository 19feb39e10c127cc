from dask_geomodeling_tpu.geometry.base import (  # noqa
    GeometryBlock,
    SeriesBlock,
    GetSeriesBlock,
    SetSeriesBlock,
)
from dask_geomodeling_tpu.geometry.sources import (  # noqa
    GeometryFileSource,
    GeometryWKTSource,
)
from dask_geomodeling_tpu.geometry.field_operations import (  # noqa
    Classify,
    ClassifyFromColumns,
    Add,
    Subtract,
    Multiply,
    Divide,
    FloorDivide,
    Power,
    Modulo,
    Equal,
    NotEqual,
    Greater,
    GreaterEqual,
    Less,
    LessEqual,
    And,
    Or,
    Xor,
    Invert,
    Where,
    Mask,
    Round,
    Interp,
    Choose,
)
from dask_geomodeling_tpu.geometry.set_operations import (  # noqa
    Difference,
    Intersection,
)
from dask_geomodeling_tpu.geometry.constructive import Buffer, Simplify  # noqa
from dask_geomodeling_tpu.geometry.geom_operations import Area  # noqa
from dask_geomodeling_tpu.geometry.merge import MergeGeometryBlocks  # noqa
from dask_geomodeling_tpu.geometry.text import ParseTextColumn  # noqa
from dask_geomodeling_tpu.geometry.parallelize import GeometryTiler  # noqa
from dask_geomodeling_tpu.geometry.aggregate import (  # noqa
    AggregateRaster,
    AggregateRasterAboveThreshold,
)
from dask_geomodeling_tpu.geometry.sinks import GeometryFileSink  # noqa
