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


if __name__ == "__main__":
    main()
