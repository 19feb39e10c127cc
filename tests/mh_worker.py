"""Worker for the 2-process multi-host test (tests/test_distributed_multihost.py).

Each process is launched with ``JAX_PLATFORMS=cpu`` and a forced 4-device
CPU platform, then joins a 2-process ``jax.distributed`` cluster (DCN stands
in for the TPU pod's data-center network; collectives ride Gloo).  The
global (dp, sp) mesh spans all 8 devices.  Both processes run the flagship
sharded tile pipeline on their local half of the tile batch and assert the
allgathered result bit-matches the single-process numpy ground truth.

Usage: ``python tests/mh_worker.py <process_id> <coordinator_port>``
(the caller must set the platform env vars before interpreter start).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    from dask_geomodeling_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address="localhost:%s" % port,
        num_processes=2,
        process_id=process_id,
    )
    assert distributed.is_initialized()
    info = distributed.global_device_info()
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 8, info

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    import __graft_entry__ as graft
    from dask_geomodeling_tpu.parallel.mesh import make_mesh, sharded_pipeline
    from dask_geomodeling_tpu.runtime.executor import _ensure_x64

    _ensure_x64()  # the pipeline's Reclassify carries int64 sentinels

    # dp=4 tiles x sp=2 row shards over the 8 global devices; each process
    # contributes its 4 local devices (two dp rows, both sp columns)
    mesh = make_mesh((4, 2))
    program = sharded_pipeline(graft._pipeline_fn(), mesh, halo_radius=7)

    tiles, bands, h, w = 8, 2, 64, 64
    batch = np.random.RandomState(7).rand(tiles, bands, h, w).astype(np.float32)
    nodata = np.float32(np.finfo(np.float32).max)
    batch[:, 0, 5, 9] = batch[:, 1, h - 2, 1] = nodata

    # this process's host-local slice of the dp (tile) axis
    local = batch[process_id * (tiles // 2) : (process_id + 1) * (tiles // 2)]
    spec = P("dp", None, "sp", None)
    global_batch = multihost_utils.host_local_array_to_global_array(
        local, mesh, spec
    )

    out = program(global_batch)
    gathered = multihost_utils.process_allgather(out, tiled=True)

    expected = np.stack([graft._pipeline_numpy(tile) for tile in batch])
    assert gathered.dtype == np.int64, gathered.dtype
    np.testing.assert_array_equal(gathered, expected)
    assert (gathered == np.iinfo(np.int64).max).any(), "sentinel not exercised"
    print("MULTIHOST-OK process=%d" % process_id, flush=True)

    _public_api_phase(process_id, mesh)


def _public_api_phase(process_id, mesh):
    """The PUBLIC API across processes: every host issues the same
    ``get_data`` on a real view; the tile batch shards over the global
    (dp, sp) mesh, sp halo collectives cross the process boundary, and
    ``TileProgram.fetch`` allgathers so each host holds the full
    response — the reference's dask.distributed semantics (any worker
    answers whole, reference core/graphs.py:224-228)."""
    from datetime import datetime, timedelta

    import numpy as np

    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import (
        Add,
        Classify,
        MemorySource,
        MovingMax,
        Reclassify,
    )

    rng = np.random.RandomState(11)  # same seed => same view on all hosts
    data = (rng.rand(1, 256, 256) * 200).astype(np.float32)
    data[0, :8, :8] = np.float32(np.finfo(np.float32).max)
    source = MemorySource(
        data=data,
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )
    # a stencil in the chain makes the sp (row-shard) halo collectives
    # load-bearing (MovingMax is bit-exact on device, unlike Smooth's
    # approximate gaussian); Reclassify exercises the packed fetch codec
    view = Reclassify(
        Classify(MovingMax(Add(source, 1.0), 3), bins=[50.0, 100.0, 150.0]),
        data=[[0, 1], [1, 5], [2, 9], [3, 13]],
        select=True,
    )
    request = dict(
        mode="vals",
        bbox=(135000, 455744, 135256, 456000),
        projection="EPSG:28992",
        width=256,
        height=256,
        start=datetime(2000, 1, 1),
    )
    with config.set({"geomodeling.executor": "numpy"}):
        expected = view.get_data(**request)

    with config.set(
        {
            "geomodeling.executor": "jax",
            "geomodeling.mesh-shape": tuple(
                mesh.shape[name] for name in ("dp", "sp")
            ),
            "geomodeling.tile-size": 64,
            "geomodeling.tile-batch": 8,
            "geomodeling.auto-tile": True,
        }
    ):
        actual = view.get_data(**request)

    np.testing.assert_array_equal(actual["values"], expected["values"])
    assert actual["no_data_value"] == expected["no_data_value"]
    print("MULTIHOST-API-OK process=%d" % process_id, flush=True)


if __name__ == "__main__":
    main()
