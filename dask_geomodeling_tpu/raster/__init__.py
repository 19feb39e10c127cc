from dask_geomodeling_tpu.raster.base import RasterBlock, BaseSingle  # noqa
from dask_geomodeling_tpu.raster.sources import MemorySource, RasterFileSource  # noqa
from dask_geomodeling_tpu.raster.elemwise import (  # noqa
    Add,
    Subtract,
    Multiply,
    Divide,
    Power,
    FillNoData,
    Equal,
    NotEqual,
    Greater,
    GreaterEqual,
    Less,
    LessEqual,
    Invert,
    And,
    Or,
    Xor,
    IsData,
    IsNoData,
    Exp,
    Log,
    Log10,
)
from dask_geomodeling_tpu.raster.reduction import Max, reduce_rasters  # noqa
from dask_geomodeling_tpu.raster.parallelize import RasterTiler  # noqa
from dask_geomodeling_tpu.raster.combine import Group  # noqa
from dask_geomodeling_tpu.raster.sinks import (  # noqa
    RasterFileSink,
    to_cog,
    to_file,
    to_zarr,
)
from dask_geomodeling_tpu.raster.temporal import (  # noqa
    Snap,
    Shift,
    TemporalSum,
    TemporalAggregate,
    Cumulative,
    Resample,
)
from dask_geomodeling_tpu.raster.spatial import (  # noqa
    Dilate,
    Smooth,
    MovingMax,
    HillShade,
    Place,
)
from dask_geomodeling_tpu.raster.misc import (  # noqa
    Clip,
    Classify,
    Reclassify,
    Mask,
    MaskBelow,
    Step,
    Rasterize,
    RasterizeWKT,
)
