"""Reprojection / resampling warp (replaces ``gdal.ReprojectImage``).

Design (SURVEY §2.4): the warp is a *gather*.  For every target pixel center
we compute the corresponding source array index — an affine map when source
and target share a CRS, otherwise a host-side CRS transform of the target
coordinate grid — then gather with nearest-neighbour or bilinear sampling.

Two implementations with identical semantics:

- :func:`warp_numpy` — host reference path
- :func:`warp_indices` + :func:`gather_jax` — the device path: indices are
  precomputed on host (cheap, metadata-sized for affine; grid-sized for
  cross-CRS), the gather runs on TPU inside the jitted tile program.

Nearest-neighbour convention matches GDAL: the source pixel *containing* the
transformed target pixel center (floor of fractional index).  Cells falling
outside the source raster become nodata.
"""
import contextlib
import threading

import numpy as np

from dask_geomodeling_tpu.geo.crs import get_projection, transform_points
from dask_geomodeling_tpu.geo.geotransform import GeoTransform

__all__ = [
    "warp_indices",
    "warp_numpy",
    "gather_numpy",
    "warp_jax",
    "gather_mode",
    "collect_warp_sites",
]

# Trace-time gather-mode plumbing: the tile runtime decides per batch
# whether the cross-CRS warp may use the MXU matmul gather (see
# ops/matmul_gather.py — exact only inside a host-checked smoothness
# domain).  The decision cannot be a traced branch (vmap would execute
# both sides), so the runtime re-traces its program under this
# threadlocal; warp_jax reads it at trace time only.
_LOCAL = threading.local()


@contextlib.contextmanager
def gather_mode(mode):
    """Trace with the given cross-CRS gather mode ("plain"/"matmul")."""
    previous = getattr(_LOCAL, "gather", "plain")
    _LOCAL.gather = mode
    try:
        yield
    finally:
        _LOCAL.gather = previous


@contextlib.contextmanager
def collect_warp_sites():
    """Collect the static parameters of every warp traced in this block
    (one entry per cross-CRS warp_jax call) for host-side domain checks."""
    previous = getattr(_LOCAL, "sites", None)
    _LOCAL.sites = sites = []
    try:
        yield sites
    finally:
        _LOCAL.sites = previous


def _approx_stride():
    """Coarse-grid stride of the approximate transformer.

    A stride of 8 keeps the interpolation error well below gdalwarp's
    default 0.125 px for the supported conformal projections; 1 disables
    the approximation (exact per-pixel transform)."""
    from dask_geomodeling_tpu.config import config

    return int(config.get("geomodeling.warp-approx-stride", 8))


def _fractional_indices(src_gt, src_srs, src_shape, bbox, projection, width, height):
    """Fractional source (row, col) grids at target pixel centers, with
    the nearest-containment inside mask.

    Out-of-domain CRS transforms (e.g. a Lambert grid asked for a point
    past the pole) yield NaN coordinates; those cells are explicitly
    OUTSIDE (NaN comparisons are False, and the mask also guards the
    NaN->int cast on the device path).
    """
    gt = GeoTransform.from_bbox(bbox, height, width)
    p, a, b, q, c, d = gt
    xs = p + a * (np.arange(width) + 0.5)
    ys = q + d * (np.arange(height) + 0.5)
    tx, ty = np.meshgrid(xs, ys)
    if get_projection(src_srs).upper() != get_projection(projection).upper():
        tx, ty = transform_points(tx, ty, projection, src_srs)
    sp, sa, sb, sq, sc, sd = src_gt
    frac_cols = (tx - sp) / sa
    frac_rows = (ty - sq) / sd
    src_h, src_w = src_shape[-2], src_shape[-1]
    rows = np.floor(frac_rows)
    cols = np.floor(frac_cols)
    inside = (rows >= 0) & (rows < src_h) & (cols >= 0) & (cols < src_w)
    return frac_rows - 0.5, frac_cols - 0.5, inside


def coarse_grid_shape(width, height, stride):
    """Coarse-node grid shape of the approximate transformer."""
    return (-(-height // stride) + 1, -(-width // stride) + 1)


def host_coarse_grid(src_gt, src_srs, bbox, projection, width, height, stride):
    """The approximate transformer's coarse grid of *fractional source
    indices* at target pixel centers, computed on HOST numpy, as a
    compact (2, ch, cw) float32 array (rows stacked as [cols, rows]).

    Shipped into the traced tile program as a per-tile input so the
    heavy transcendental CRS math runs vectorized on the host instead of
    as emulated-f64 device code (measured: the coarse transform was
    ~0.4 s of a 64-tile batch on TPU vs milliseconds on host — the
    dominant device cost of a cross-CRS warp after the matmul gather).
    float32 fractional indices have ~6e-8 relative precision: ~6e-4 px
    at a 10k-px source, ~0.006 px at 100k, staying inside the
    transformer's 0.125 px model for any source up to ~2M px across
    (beyond that the f32 ULP alone would exceed the model; no real
    source approaches it).  The device-side interpolation becomes pure
    f32 as well.  Out-of-domain transforms carry NaN, which the warp's
    finite mask already handles.
    """
    gt = GeoTransform.from_bbox(bbox, height, width)
    p, a, b, q, c, d = gt
    ch, cw = coarse_grid_shape(width, height, stride)
    cxs = p + a * (np.arange(cw) * stride + 0.5)
    cys = q + d * (np.arange(ch) * stride + 0.5)
    tx, ty = np.meshgrid(cxs, cys)
    with np.errstate(all="ignore"):
        sx, sy = transform_points(tx, ty, projection, src_srs)
        sp, sa, sb, sq, sc, sd = src_gt
        frac_cols = (sx - sp) / sa
        frac_rows = (sy - sq) / sd
    return np.stack([frac_cols, frac_rows]).astype(np.float32)


def warp_indices(src_gt, src_srs, src_shape, bbox, projection, width, height):
    """Compute source (row, col) int64 index grids for a target raster.

    Returns ``(rows, cols, inside)`` each of shape (height, width); ``inside``
    marks target cells whose source index is within bounds.
    """
    fr, fc, inside = _fractional_indices(
        src_gt, src_srs, src_shape, bbox, projection, width, height
    )
    # NaN floors to INT64_MIN here, which `inside` already excludes
    with np.errstate(invalid="ignore"):
        rows = np.floor(fr + 0.5).astype(np.int64)
        cols = np.floor(fc + 0.5).astype(np.int64)
    return rows, cols, inside


def gather_numpy(values, rows, cols, inside, fillvalue, dtype):
    """Gather source values at (rows, cols); outside cells get fillvalue."""
    bands = values.shape[0]
    out = np.full((bands, rows.shape[0], rows.shape[1]), fillvalue, dtype=dtype)
    safe_rows = np.where(inside, rows, 0)
    safe_cols = np.where(inside, cols, 0)
    gathered = values[:, safe_rows, safe_cols]
    out[:, inside] = gathered[:, inside]
    return out


def _bilinear_sample(
    values, fr, fc, inside, no_data_value, fillvalue, dtype, xp, gather=None
):
    """Bilinear sample of (bands, h, w) at fractional indices (fr, fc).

    Edge neighbours clamp; a cell is nodata when it falls outside the
    source or when ANY participating neighbour is nodata (GDAL-like:
    never interpolate across the nodata boundary).

    ``gather`` optionally replaces the element-gather of the four corner
    fields (``values[:, r, c]``) with a faster implementation returning
    bit-identical values (the candidate-slice engine for cross-CRS, axis
    gathers for same-CRS); blending is unchanged either way.  ``fr``/
    ``fc`` may be broadcastable (e.g. (h, 1) and (1, w) for separable
    same-CRS maps).
    """
    src_h, src_w = values.shape[-2], values.shape[-1]
    # out-of-domain cells carry NaN indices; `inside` already excludes
    # them, but the gather indices must still be in bounds
    fr = xp.where(xp.isfinite(fr), fr, 0.0)
    fc = xp.where(xp.isfinite(fc), fc, 0.0)
    r0 = xp.clip(xp.floor(fr), 0, src_h - 1).astype(np.int32)
    c0 = xp.clip(xp.floor(fc), 0, src_w - 1).astype(np.int32)
    r1 = xp.clip(r0 + 1, 0, src_h - 1)
    c1 = xp.clip(c0 + 1, 0, src_w - 1)
    wr = xp.clip(fr - r0, 0.0, 1.0)
    wc = xp.clip(fc - c0, 0.0, 1.0)

    if gather is None:
        def gather(r, c):
            return values[:, r, c]

    v00 = gather(r0, c0).astype(np.float64)
    v01 = gather(r0, c1).astype(np.float64)
    v10 = gather(r1, c0).astype(np.float64)
    v11 = gather(r1, c1).astype(np.float64)

    top = v00 + (v01 - v00) * wc
    bottom = v10 + (v11 - v10) * wc
    blended = top + (bottom - top) * wr

    valid = inside[None]
    if no_data_value is not None:
        def is_nodata(v):
            if np.dtype(values.dtype).kind == "f":
                return xp.isclose(v, no_data_value)
            return v == no_data_value

        touched = (
            is_nodata(v00) | is_nodata(v01) | is_nodata(v10) | is_nodata(v11)
        )
        valid = valid & ~touched
    dtype = np.dtype(dtype)
    if dtype.kind in "iub":
        blended = xp.rint(blended)
    return xp.where(valid, blended.astype(dtype), dtype.type(fillvalue))


def warp_jax(
    values,
    src_gt,
    src_srs,
    no_data_value,
    bbox,
    projection,
    width,
    height,
    dtype,
    fillvalue,
    interpolation="nearest",
    coarse_grid=None,
):
    """On-device warp: CRS transform of the target pixel-center grid plus a
    nearest-neighbour (or bilinear) gather, all traced into one XLA program.

    ``values`` is a (bands, h, w) traced array; ``bbox`` may be a traced
    length-4 array (so one compiled program serves every tile of a request);
    shapes, CRS pair and dtypes are static.  Semantically identical to
    :func:`warp_numpy`.

    ``coarse_grid`` optionally carries :func:`host_coarse_grid`'s
    (2, ch, cw) per-tile array as a traced input, replacing the in-trace
    transcendental CRS transform (emulated f64 on TPU, the dominant
    device cost of a cross-CRS tile) with vectorized host math.
    """
    import jax.numpy as jnp

    bbox = jnp.asarray(bbox, dtype=jnp.float64)
    x1, y1, x2, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
    pixel_w = (x2 - x1) / width
    pixel_h = (y1 - y2) / height  # negative: y decreases with the row index

    cross_crs = get_projection(src_srs).upper() != get_projection(projection).upper()
    stride = _approx_stride() if cross_crs else 1

    sites = getattr(_LOCAL, "sites", None)
    if sites is not None and cross_crs:
        from dask_geomodeling_tpu.ops.matmul_gather import gather_matmul_eligible

        sites.append(
            dict(
                src_gt=tuple(float(v) for v in src_gt),
                src_srs=src_srs,
                projection=projection,
                src_shape=tuple(values.shape),
                eligible=gather_matmul_eligible(
                    values.dtype, values.shape, height, width
                ),
            )
        )

    host_frac = None
    if cross_crs and stride > 1 and width > stride and height > stride:
        # GDAL-style approximate transformer (gdalwarp's 0.125 px error
        # model, reference raster/sources.py:141-144): transform a coarse
        # grid of pixel centers exactly, then bilinearly interpolate the
        # source coordinates.  This cuts the transcendental (float64) CRS
        # math by stride^2 — the dominant compile+run cost on TPU.
        cw = -(-width // stride) + 1  # coarse grid nodes (+1 to cover edge)
        ch = -(-height // stride) + 1
        use_host_grid = (
            coarse_grid is not None
            and tuple(coarse_grid.shape) == (2, ch, cw)
        )

        # fractional coarse-grid positions of every output pixel
        fdtype = jnp.float32 if use_host_grid else jnp.float64
        fx = jnp.arange(width, dtype=fdtype) / stride
        fy = jnp.arange(height, dtype=fdtype) / stride
        ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, cw - 2)
        iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ch - 2)
        wx = (fx - ix)[None, :]
        wy = (fy - iy)[:, None]

        def interp(coarse):
            c00 = coarse[iy][:, ix]
            c01 = coarse[iy][:, ix + 1]
            c10 = coarse[iy + 1][:, ix]
            c11 = coarse[iy + 1][:, ix + 1]
            top = c00 + (c01 - c00) * wx
            bottom = c10 + (c11 - c10) * wx
            return top + (bottom - top) * wy

        if use_host_grid:
            # host-computed fractional source indices (host_coarse_grid):
            # the transcendental CRS math never enters the device program
            host_frac = (
                interp(coarse_grid[0].astype(jnp.float32)),
                interp(coarse_grid[1].astype(jnp.float32)),
            )
        else:
            cxs = x1 + pixel_w * (
                jnp.arange(cw, dtype=jnp.float64) * stride + 0.5
            )
            cys = y2 + pixel_h * (
                jnp.arange(ch, dtype=jnp.float64) * stride + 0.5
            )
            ctx, cty = jnp.meshgrid(cxs, cys)
            ctx, cty = transform_points(ctx, cty, projection, src_srs, xp=jnp)
            tx = interp(ctx)
            ty = interp(cty)
    elif not cross_crs:
        # same-CRS warps: the index map is an outer product of two 1-D
        # affine maps, so nearest gathers decompose into one row gather
        # plus one column gather (TPU lowers those axis gathers ~an order
        # of magnitude faster than a general 2-D gather; the floor of the
        # broadcast 1-D f64 values is bit-identical to the 2-D path) and
        # bilinear corners decompose the same way.
        xs = x1 + pixel_w * (jnp.arange(width, dtype=jnp.float64) + 0.5)
        ys = y2 + pixel_h * (jnp.arange(height, dtype=jnp.float64) + 0.5)
        sp, sa, sb, sq, sc, sd = src_gt
        fcols = (xs - sp) / sa
        frows = (ys - sq) / sd
        cols1 = jnp.floor(fcols).astype(jnp.int32)
        rows1 = jnp.floor(frows).astype(jnp.int32)
        src_h, src_w = values.shape[-2], values.shape[-1]
        in_c = jnp.isfinite(fcols) & (cols1 >= 0) & (cols1 < src_w)
        in_r = jnp.isfinite(frows) & (rows1 >= 0) & (rows1 < src_h)
        inside = in_r[:, None] & in_c[None, :]
        dtype = np.dtype(dtype)

        if interpolation == "bilinear":
            # the corner index fields are outer products of 1-D maps too,
            # so each of the four corner gathers decomposes into axis
            # gathers; broadcastable 1-D fracs keep the f64 blend
            # bit-identical to the 2-D meshgrid formulation
            def gather(r, c):
                return values[:, r[:, 0], :][:, :, c[0, :]]

            return _bilinear_sample(
                values,
                (frows - 0.5)[:, None],
                (fcols - 0.5)[None, :],
                inside,
                no_data_value,
                fillvalue,
                dtype,
                jnp,
                gather=gather,
            )

        gathered = values[:, jnp.where(in_r, rows1, 0), :][
            :, :, jnp.where(in_c, cols1, 0)
        ].astype(dtype)
        out = jnp.where(inside[None], gathered, dtype.type(fillvalue))
        if no_data_value is not None and no_data_value != fillvalue:
            if dtype.kind == "f":
                src_nodata = jnp.isclose(out, no_data_value)
            else:
                src_nodata = out == no_data_value
            out = jnp.where(src_nodata, dtype.type(fillvalue), out)
        return out
    else:
        xs = x1 + pixel_w * (jnp.arange(width, dtype=jnp.float64) + 0.5)
        ys = y2 + pixel_h * (jnp.arange(height, dtype=jnp.float64) + 0.5)
        tx, ty = jnp.meshgrid(xs, ys)
        if cross_crs:
            tx, ty = transform_points(tx, ty, projection, src_srs, xp=jnp)

    if host_frac is not None:
        frac_cols, frac_rows = host_frac
    else:
        sp, sa, sb, sq, sc, sd = src_gt
        frac_cols = (tx - sp) / sa
        frac_rows = (ty - sq) / sd
    cols = jnp.floor(frac_cols).astype(jnp.int32)
    rows = jnp.floor(frac_rows).astype(jnp.int32)

    src_h, src_w = values.shape[-2], values.shape[-1]
    # out-of-domain CRS transforms produce NaN, which XLA casts to int32
    # ZERO (not a sentinel like numpy's INT64_MIN) — mask them explicitly
    # or pixel [0, 0] would leak into out-of-domain cells
    finite = jnp.isfinite(frac_rows) & jnp.isfinite(frac_cols)
    inside = (
        finite & (rows >= 0) & (rows < src_h) & (cols >= 0) & (cols < src_w)
    )

    dtype = np.dtype(dtype)
    mode = getattr(_LOCAL, "gather", "plain")
    use_matmul = cross_crs and mode != "plain"
    amp = None
    if use_matmul:
        from dask_geomodeling_tpu.ops.matmul_gather import (
            GATHER_MODES,
            gather_matmul_eligible,
            gather_matmul_jax,
        )

        block, amp = GATHER_MODES[mode]
        use_matmul = gather_matmul_eligible(
            values.dtype, values.shape, height, width
        )
    if interpolation == "bilinear":
        # the four corner fields are smooth index fields with the same
        # residual structure as the nearest map, so the candidate-slice
        # engine serves them too (bit-identical corner values -> the f64
        # blend is unchanged); element gathers remain the fallback
        gather = None
        if use_matmul:
            def gather(r, c):
                return gather_matmul_jax(
                    values, r, c, inside, amp=amp, block=block
                )

        return _bilinear_sample(
            values,
            frac_rows - 0.5,
            frac_cols - 0.5,
            inside,
            no_data_value,
            fillvalue,
            dtype,
            jnp,
            gather=gather,
        )
    if use_matmul:
        # fast path: exact inside the host-verified smoothness domain
        # (the runtime only traces with this mode for checked batches)
        gathered = gather_matmul_jax(
            values, rows, cols, inside, amp=amp, block=block
        ).astype(dtype)
    else:
        safe_rows = jnp.where(inside, rows, 0)
        safe_cols = jnp.where(inside, cols, 0)
        gathered = values[:, safe_rows, safe_cols].astype(dtype)
    out = jnp.where(inside[None], gathered, dtype.type(fillvalue))
    if no_data_value is not None and no_data_value != fillvalue:
        if dtype.kind == "f":
            src_nodata = jnp.isclose(out, no_data_value)
        else:
            src_nodata = out == no_data_value
        out = jnp.where(src_nodata, dtype.type(fillvalue), out)
    return out


def warp_numpy(
    values,
    src_gt,
    src_srs,
    no_data_value,
    bbox,
    projection,
    width,
    height,
    dtype=None,
    fillvalue=None,
    interpolation="nearest",
):
    """Full host warp of a (bands, h, w) array into the requested grid."""
    dtype = np.dtype(dtype) if dtype is not None else values.dtype
    fillvalue = no_data_value if fillvalue is None else fillvalue
    if interpolation == "bilinear":
        fr, fc, inside = _fractional_indices(
            src_gt, src_srs, values.shape, bbox, projection, width, height
        )
        return _bilinear_sample(
            values, fr, fc, inside, no_data_value, fillvalue, dtype, np
        )
    rows, cols, inside = warp_indices(
        src_gt, src_srs, values.shape, bbox, projection, width, height
    )
    result = gather_numpy(values, rows, cols, inside, fillvalue, dtype)
    # replace source nodata with the target fillvalue
    if no_data_value is not None and no_data_value != fillvalue:
        src_nodata = (
            np.isclose(result, no_data_value)
            if dtype.kind == "f"
            else result == no_data_value
        )
        result[src_nodata] = fillvalue
    return result
