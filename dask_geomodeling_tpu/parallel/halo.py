"""Halo exchange between neighbouring spatial shards.

The reference avoids communication by over-fetching halo pixels per tile
(reference raster/spatial.py:27-108 — recompute, not communicate).  On a
device mesh that over-fetch becomes duplicated HBM reads and host traffic;
instead, stencil programs running under ``shard_map`` exchange their edge
rows with mesh neighbours via ``ppermute`` over ICI — the nearest-neighbour
collective pattern (the ring-attention analog for rasters, SURVEY §5).
"""
import jax
import jax.numpy as jnp

__all__ = ["exchange_halo_y"]


def exchange_halo_y(values, radius, axis_name, top_pad=None, bottom_pad=None):
    """Pad a (b, h, w) shard with ``radius`` rows from its y-neighbours.

    Must run inside ``shard_map`` with ``axis_name`` mapping the spatial
    y-axis of the global raster.  At the global boundary, shards receive
    ``top_pad`` / ``bottom_pad`` (real out-of-request source rows of shape
    (b, radius, w), matching the reference's request over-fetch,
    reference raster/spatial.py:27-47) or zeros when no pads are given.

    Returns an array of shape (b, h + 2*radius, w).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    # my top rows go to the neighbour above (index-1); bottom rows go down
    top_edge = values[:, :radius, :]
    bottom_edge = values[:, -radius:, :]

    # receive the bottom edge of the shard above (to pad my top) and the
    # top edge of the shard below (to pad my bottom)
    from_above = jax.lax.ppermute(
        bottom_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_below = jax.lax.ppermute(
        top_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )

    # the wrapped-around edges at the global boundary see real source
    # pixels (when supplied) instead of the neighbour across the wrap
    if top_pad is None:
        top_pad = jnp.zeros_like(from_above)
    if bottom_pad is None:
        bottom_pad = jnp.zeros_like(from_below)
    from_above = jnp.where(idx == 0, top_pad, from_above)
    from_below = jnp.where(idx == n - 1, bottom_pad, from_below)

    return jnp.concatenate([from_above, values, from_below], axis=1)
