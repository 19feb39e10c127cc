"""Device-mesh tile sharding.

Scaling model (SURVEY §2.8): the tile axis is data-parallel ("dp") and the
spatial y-axis of each tile block can additionally be sharded ("sp") with
halo exchange for stencils.  Programs are jitted once over the mesh with
``NamedSharding`` annotations; XLA inserts the collectives and they ride
the ICI.  Multi-host launches reuse the same program under
``jax.distributed`` — nothing in the view graphs changes.
"""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_tile_batch", "sharded_pipeline"]


def make_mesh(mesh_shape=None, axis_names=("dp", "sp")):
    """Create a device mesh; default: all devices on the dp (tile) axis."""
    devices = jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices), 1)
    n_needed = int(np.prod(mesh_shape))
    if n_needed > len(devices):
        raise ValueError(
            "mesh_shape %r does not match %d devices" % (mesh_shape, len(devices))
        )
    device_grid = np.array(devices[:n_needed]).reshape(mesh_shape)
    return Mesh(device_grid, axis_names)


def shard_tile_batch(batch, mesh):
    """Put a (tiles, bands, h, w) batch with tiles sharded over dp and the
    tile rows sharded over sp."""
    sharding = NamedSharding(mesh, P("dp", None, "sp", None))
    return jax.device_put(batch, sharding)


def sharded_pipeline(tile_fn, mesh, halo_radius=0, boundary="zeros"):
    """Wrap a per-shard tile function into a mesh-sharded jitted program.

    ``tile_fn(values) -> values`` operates on a (tiles, bands, h, w) array
    shard.  With ``halo_radius > 0`` the shard is padded with neighbour rows
    over the sp axis (ICI ppermute) before ``tile_fn`` runs, and the result
    is cropped back — ``tile_fn`` must accept the padded height and return
    the same padded height (the crop removes the halo).

    ``boundary`` controls the global top/bottom edge:
      - "zeros": constant fill (a cheap approximation)
      - "pads": the returned program takes ``(batch, top_pad, bottom_pad)``
        where the pads are (tiles, bands, radius, w) arrays of REAL source
        rows beyond the request window — bitwise parity with the
        reference's per-request over-fetch.
    """
    from jax import shard_map

    from dask_geomodeling_tpu.parallel.halo import exchange_halo_y

    with_pads = boundary == "pads" and halo_radius > 0

    def _run(values, top_pad, bottom_pad):
        # values: (tiles_shard, bands, h_shard, w)
        t, b, h, w = values.shape
        merged = values.reshape(t * b, h, w)
        if halo_radius:
            merged = exchange_halo_y(
                merged,
                halo_radius,
                "sp",
                None if top_pad is None else top_pad.reshape(t * b, -1, w),
                None if bottom_pad is None else bottom_pad.reshape(t * b, -1, w),
            )
        out = tile_fn(merged)
        if halo_radius:
            out = out[:, halo_radius:-halo_radius, :]
        return out.reshape(t, b, h, w)

    spec = P("dp", None, "sp", None)
    if with_pads:
        # pads are only consumed by the first/last sp shard; they are small
        # (radius rows), so replicate over sp and shard over dp only
        sharded = shard_map(
            _run,
            mesh=mesh,
            in_specs=(spec, P("dp", None, None, None), P("dp", None, None, None)),
            out_specs=spec,
        )
        return jax.jit(sharded)

    sharded = shard_map(
        lambda values: _run(values, None, None),
        mesh=mesh,
        in_specs=spec,
        out_specs=spec,
    )
    return jax.jit(sharded)
