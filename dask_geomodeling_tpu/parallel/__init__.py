"""Parallelism: device-mesh tile sharding, halo exchange, distributed
device init, and the multi-machine host-plane worker pool."""
from dask_geomodeling_tpu.parallel.mesh import (  # noqa
    make_mesh,
    shard_tile_batch,
    sharded_pipeline,
)
from dask_geomodeling_tpu.parallel.halo import exchange_halo_y  # noqa
from dask_geomodeling_tpu.parallel.hostpool import HostPool  # noqa
