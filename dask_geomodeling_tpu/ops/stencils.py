"""Stencil kernels: dilation, moving max, separable Gaussian.

JAX implementations of the scipy.ndimage stencils the reference uses
(reference raster/spatial.py:153,206,288).  These are written to map onto
the TPU VPU: ``lax.reduce_window`` lowers to vectorized sliding-window ops,
and the Gaussian is two 1-D convolutions (XLA fuses the elementwise pre/post
processing around them).  Numpy variants with identical conventions back the
host executor and the tests.

The circular-footprint moving max is decomposed into per-row run-length
window maxima (O(size) sliding windows instead of O(size²) shifts).
"""
import numpy as np

__all__ = [
    "binary_dilation_jax",
    "moving_max_jax",
    "gaussian_blur_jax",
    "gaussian_kernel_1d",
]


def gaussian_kernel_1d(sigma, truncate=4.0):
    """The exact kernel scipy.ndimage.gaussian_filter1d uses."""
    radius = int(truncate * sigma + 0.5)
    if radius < 1 or sigma <= 0:
        return np.array([1.0]), 0
    x = np.arange(-radius, radius + 1)
    weights = np.exp(-0.5 * (x / sigma) ** 2)
    return weights / weights.sum(), radius


def binary_dilation_jax(mask, connectivity=2, rank3=False):
    """Binary dilation of (b, h, w) data.

    connectivity=1 is the cross-shaped structuring element (scipy's
    ``binary_dilation`` default, which the reference uses at
    raster/spatial.py:153); connectivity=2 is the full 3x3 window over
    the last two axes.  scipy's default structure for a rank-3 array is
    the rank-THREE cross — it dilates across the band/time axis too;
    ``rank3=True`` reproduces that (Dilate's multi-band semantics).
    """
    import jax.numpy as jnp
    from jax import lax

    x = mask.astype(jnp.uint8)
    if connectivity == 1:
        # cross-shaped: max over the centre + 4 spatial neighbours
        up = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        down = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
        left = jnp.pad(x, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        right = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]
        out = jnp.maximum(
            x, jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))
        )
        if rank3:
            before = jnp.pad(x, ((1, 0), (0, 0), (0, 0)))[:-1]
            after = jnp.pad(x, ((0, 1), (0, 0), (0, 0)))[1:]
            out = jnp.maximum(out, jnp.maximum(before, after))
        return out.astype(bool)
    # full 3x3 window
    out = lax.reduce_window(
        x,
        np.uint8(0),
        lax.max,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return out.astype(bool)


def _footprint_runs(size):
    """For a circular footprint of ``size``, the (dy, half_run) per row."""
    from dask_geomodeling_tpu.geo.dtypes import get_footprint

    footprint = get_footprint(size)
    radius = size // 2
    runs = []
    for row in range(footprint.shape[0]):
        cols = np.nonzero(footprint[row])[0]
        if len(cols):
            runs.append((row - radius, int(cols[0] - radius), int(cols[-1] - radius)))
    return runs


def moving_max_jax(values, size):
    """Circular-footprint maximum filter over (b, h, w) data.

    On TPU the fused Pallas kernel handles fitting tiles
    (ops/pallas_stencils.py, gated by ``geomodeling.pallas-stencils``);
    otherwise decomposed per footprint row: a 1-D window max over x (run
    length of that row), shifted in y, then a max over rows.
    """
    import jax.numpy as jnp
    from jax import lax

    from dask_geomodeling_tpu.config import config
    from dask_geomodeling_tpu.ops.pallas_stencils import (
        moving_max_pallas,
        moving_max_pallas_fits,
        pallas_available,
    )

    if (
        config.get("geomodeling.pallas-stencils", True)
        and pallas_available()
        and moving_max_pallas_fits(
            values.shape[1], values.shape[2], size, values.dtype
        )
    ):
        return moving_max_pallas(values, size)

    dtype = np.dtype(values.dtype)
    neg_inf = dtype.type(
        np.finfo(dtype).min if dtype.kind == "f" else np.iinfo(dtype).min
    )
    out = None
    for dy, dx_lo, dx_hi in _footprint_runs(size):
        run = dx_hi - dx_lo + 1
        # window max over x with the row's run length (centered since the
        # footprint is symmetric: dx_lo == -dx_hi)
        row_max = lax.reduce_window(
            values,
            neg_inf,
            lax.max,
            window_dimensions=(1, 1, run),
            window_strides=(1, 1, 1),
            padding=((0, 0), (0, 0), (-dx_lo, dx_hi)),
        )
        # shift in y by dy (gather from row y+dy)
        if dy > 0:
            shifted = jnp.pad(
                row_max, ((0, 0), (0, dy), (0, 0)), constant_values=neg_inf
            )[:, dy:, :]
        elif dy < 0:
            shifted = jnp.pad(
                row_max, ((0, 0), (-dy, 0), (0, 0)), constant_values=neg_inf
            )[:, :dy, :]
        else:
            shifted = row_max
        out = shifted if out is None else jnp.maximum(out, shifted)
    return out


def gaussian_blur_jax(values, sigma_y, sigma_x, fill):
    """Separable Gaussian with scipy-compatible kernels on (b, h, w) data,
    constant boundary ``fill``.  Computed in the input's float dtype
    (float32 minimum).  On TPU, float32 tiles that fit VMEM use the fused
    Pallas kernel (ops/pallas_stencils.py)."""
    import jax.numpy as jnp

    compute_dtype = np.result_type(values.dtype, np.float32)
    if compute_dtype == np.float32:
        from dask_geomodeling_tpu.config import config
        from dask_geomodeling_tpu.ops.pallas_stencils import (
            gaussian_blur_pallas,
            pallas_available,
            pallas_fits,
        )

        if (
            config.get("geomodeling.pallas-smooth", True)
            and pallas_available()
            and pallas_fits(values.shape[1], values.shape[2], sigma_y, sigma_x)
        ):
            return gaussian_blur_pallas(values, sigma_y, sigma_x, fill)
    out = values.astype(compute_dtype)

    for axis, sigma in ((1, sigma_y), (2, sigma_x)):
        weights, radius = gaussian_kernel_1d(sigma)
        if radius == 0:
            continue
        kernel = jnp.asarray(weights, dtype=compute_dtype)
        pad = [(0, 0), (0, 0), (0, 0)]
        pad[axis] = (radius, radius)
        padded = jnp.pad(out, pad, constant_values=compute_dtype.type(fill))
        # correlate along `axis` via shifted weighted sum (radius is small);
        # XLA fuses this into one loop over the window
        acc = None
        for i, w in enumerate(weights):
            idx = [slice(None)] * 3
            idx[axis] = slice(i, i + out.shape[axis])
            term = padded[tuple(idx)] * compute_dtype.type(w)
            acc = term if acc is None else acc + term
        out = acc
    return out
