"""Pallas TPU kernels for the hot stencils.

``gaussian_blur_pallas`` fuses the separable Gaussian into one kernel: the
padded band is DMA'd to VMEM once, both 1-D passes run against VMEM scratch,
and only the result returns to HBM — one HBM round trip instead of two
convolution round trips.  The row pass accumulates sublane-shifted slices,
the column pass lane-shifted slices; both are VPU elementwise work with
static trip counts, so Mosaic unrolls them fully.

Grid: one program per band; the whole padded band lives in VMEM (a 512²
float32 tile with a typical Gaussian radius is ~1.2 MB, far under the
16 MB VMEM).  Callers fall back to the XLA implementation (ops/stencils.py)
off-TPU or when the tile would not fit.
"""
import numpy as np

from dask_geomodeling_tpu.ops.stencils import gaussian_kernel_1d

__all__ = ["gaussian_blur_pallas", "pallas_available", "pallas_fits"]

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
        # row (y) pass into scratch: (height, pw)
        acc = in_ref[0, 0:height, :] * wy[0]
        for i in range(1, 2 * radius_y + 1):
            acc = acc + in_ref[0, i : i + height, :] * wy[i]
        scratch[:, :] = acc

        # column (x) pass: (height, width)
        acc2 = scratch[:, 0:width] * wx[0]
        for j in range(1, 2 * radius_x + 1):
            acc2 = acc2 + scratch[:, j : j + width] * wx[j]
        out_ref[0, :, :] = acc2

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
