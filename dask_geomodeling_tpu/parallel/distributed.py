"""Multi-host launch: jax.distributed initialization.

The reference's multi-machine story is dask.distributed shipping pickled
Block graphs to workers (SURVEY §2.9).  Here the equivalent is: every host
runs the same program under ``jax.distributed``; the global device mesh
spans all hosts (ICI within a slice, DCN across), view graphs are
serialized/shipped exactly as before (Block.to_json / pickle), and the
sharded tile programs (parallel/mesh.py) run unchanged — XLA places the
collectives.

Typical use on each host::

    from dask_geomodeling_tpu.parallel import distributed
    distributed.initialize()           # env-driven (TPU pods auto-detect)
    mesh = make_mesh()                 # now spans all hosts' devices
"""
import logging

logger = logging.getLogger(__name__)

__all__ = ["initialize", "is_initialized", "global_device_info"]

_initialized = False


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed (idempotent).

    With no arguments, jax auto-detects the cluster environment (TPU pods,
    GKE, Slurm).  Pass explicit values for manual clusters.
    """
    global _initialized
    if _initialized:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_initialized():
    """True when jax.distributed has been initialized in this process."""
    return _initialized


def global_device_info():
    """Summary of the process/device topology for logging and diagnostics."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "platform": jax.devices()[0].platform,
    }
