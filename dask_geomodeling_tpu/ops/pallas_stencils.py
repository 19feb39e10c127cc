"""Pallas TPU kernels for the hot stencils.

``gaussian_blur_pallas`` fuses the separable Gaussian into one kernel: the
padded band is DMA'd to VMEM once, both 1-D passes run against VMEM scratch,
and only the result returns to HBM — one HBM round trip instead of two
convolution round trips.  The row pass accumulates sublane-shifted slices,
the column pass lane-shifted slices; both are VPU elementwise work with
static trip counts, so Mosaic unrolls them fully.

``moving_max_pallas`` does the same for the circular-footprint maximum
filter behind MovingMax/Dilate: the footprint decomposes into statically
shifted VMEM slices folded with ``maximum`` — one HBM round trip instead
of one reduce_window per footprint row.

Grid: one program per band; the whole padded band lives in VMEM (a 512²
float32 tile with a typical Gaussian radius is ~1.2 MB, far under the
16 MB VMEM).  Callers fall back to the XLA implementation (ops/stencils.py)
off-TPU or when the tile would not fit.
"""
import numpy as np

from dask_geomodeling_tpu.ops.stencils import gaussian_kernel_1d

__all__ = [
    "gaussian_blur_pallas",
    "moving_max_pallas",
    "pallas_available",
    "pallas_fits",
    "moving_max_pallas_fits",
]

_VMEM_BUDGET = 12 * 1024 * 1024


def pallas_available():
    """True when the Pallas TPU backend can run fused kernels here."""
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pallas_fits(height, width, sigma_y, sigma_x):
    """Whether one padded float32 band plus scratch fits the VMEM budget."""
    _, radius_y = gaussian_kernel_1d(sigma_y)
    _, radius_x = gaussian_kernel_1d(sigma_x)
    ph = height + 2 * radius_y
    pw = width + 2 * radius_x
    # input band + scratch + output, all float32
    return (ph * pw + ph * width + height * width) * 4 <= _VMEM_BUDGET


def gaussian_blur_pallas(values, sigma_y, sigma_x, fill, interpret=False):
    """Separable Gaussian over (bands, h, w) data, constant-fill boundary,
    scipy-compatible kernels; computes and returns float32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    weights_y, radius_y = gaussian_kernel_1d(sigma_y)
    weights_x, radius_x = gaussian_kernel_1d(sigma_x)
    bands, height, width = values.shape
    values = values.astype(jnp.float32)

    if radius_y == 0 and radius_x == 0:
        return values

    padded = jnp.pad(
        values,
        ((0, 0), (radius_y, radius_y), (radius_x, radius_x)),
        constant_values=np.float32(fill),
    )
    ph, pw = padded.shape[1], padded.shape[2]
    wy = [np.float32(w) for w in weights_y]
    wx = [np.float32(w) for w in weights_x]

    def kernel(in_ref, out_ref, scratch):
        # accumulate IN PLACE through the refs: a single unrolled add
        # chain makes Mosaic stack-allocate every shifted slice at once,
        # blowing the 16 MB scoped VMEM at larger radii (especially under
        # vmap); ref accumulation keeps the live set at one slice

        # row (y) pass into scratch: (height, pw)
        scratch[:, :] = in_ref[0, 0:height, :] * wy[0]
        for i in range(1, 2 * radius_y + 1):
            scratch[:, :] = scratch[:, :] + in_ref[0, i : i + height, :] * wy[i]

        # column (x) pass: (height, width)
        out_ref[0, :, :] = scratch[:, 0:width] * wx[0]
        for j in range(1, 2 * radius_x + 1):
            out_ref[0, :, :] = (
                out_ref[0, :, :] + scratch[:, j : j + width] * wx[j]
            )

    return pl.pallas_call(
        kernel,
        grid=(bands,),
        in_specs=[
            # index-map components must share the program id's int32 type:
            # literal 0 becomes int64 under x64 and Mosaic rejects the mix
            pl.BlockSpec(
                (1, ph, pw), lambda b: (b, b * 0, b * 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, height, width),
            lambda b: (b, b * 0, b * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bands, height, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((height, pw), jnp.float32)],
        interpret=interpret,
    )(padded)


def moving_max_pallas_fits(height, width, size, dtype):
    """Whether the padded band + output fit VMEM and the dtype maps onto
    a 32-bit VPU type losslessly."""
    dtype = np.dtype(dtype)
    if dtype.kind == "f" and dtype.itemsize > 4:
        return False
    if dtype.kind == "i" and dtype.itemsize > 4:
        return False
    if dtype.kind == "u" and dtype.itemsize > 2:
        return False  # uint32 does not fit int32 losslessly
    if dtype.kind not in "iufb":
        return False
    radius = int(size) // 2
    ph, pw = height + 2 * radius, width + 2 * radius
    return (ph * pw + height * width) * 4 <= _VMEM_BUDGET


def moving_max_pallas(values, size, interpret=False):
    """Circular-footprint maximum filter over (bands, h, w) data: the
    footprint unrolls into statically shifted VMEM slices folded with
    ``maximum`` (one kernel, one HBM round trip).  Semantics identical to
    ops/stencils.py:moving_max_jax."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dask_geomodeling_tpu.ops.stencils import _footprint_runs

    dtype = np.dtype(values.dtype)
    bands, height, width = values.shape
    radius = int(size) // 2
    runs = _footprint_runs(size)

    if dtype.kind == "f":
        compute = jnp.float32
        pad_value = np.float32(-np.inf)
    else:
        compute = jnp.int32
        pad_value = np.int32(np.iinfo(np.int32).min)

    padded = jnp.pad(
        values.astype(compute),
        ((0, 0), (radius, radius), (radius, radius)),
        constant_values=pad_value,
    )
    ph, pw = padded.shape[1], padded.shape[2]

    def kernel(in_ref, out_ref):
        # accumulate through out_ref: folding in VMEM keeps the live set
        # at one slice + the accumulator instead of materializing every
        # shifted slice of the unrolled footprint at once
        first = True
        for dy, dx_lo, dx_hi in runs:
            y0 = radius + dy
            for dx in range(dx_lo, dx_hi + 1):
                x0 = radius + dx
                piece = in_ref[0, y0 : y0 + height, x0 : x0 + width]
                if first:
                    out_ref[0, :, :] = piece
                    first = False
                else:
                    out_ref[0, :, :] = jnp.maximum(out_ref[0, :, :], piece)

    result = pl.pallas_call(
        kernel,
        grid=(bands,),
        in_specs=[
            pl.BlockSpec(
                (1, ph, pw), lambda b: (b, b * 0, b * 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, height, width),
            lambda b: (b, b * 0, b * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bands, height, width), compute),
        interpret=interpret,
    )(padded)
    return result.astype(dtype)
