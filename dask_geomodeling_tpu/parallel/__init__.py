"""Device-mesh parallelism: tile sharding, halo exchange, distributed init."""
from dask_geomodeling_tpu.parallel.mesh import (  # noqa
    make_mesh,
    shard_tile_batch,
    sharded_pipeline,
)
from dask_geomodeling_tpu.parallel.halo import exchange_halo_y  # noqa
