"""Reduction raster blocks: nodata-aware stacked statistics.

Semantics match the reference (dask_geomodeling/raster/reduction.py:38-119):
``reduce_rasters`` reduces a list of {"values", "no_data_value"} dicts along
a new axis, skipping nodata; first/last/count have dedicated paths, the rest
go through NaN-aware numpy reductions.
"""
import functools
from functools import partial

import numpy as np

from dask_geomodeling_tpu.geo import (
    get_index_jax,
    Extent,
    filter_none,
    get_index,
    parse_percentile_statistic,
)
from dask_geomodeling_tpu.raster.base import RasterBlock
from dask_geomodeling_tpu.raster.elemwise import BaseElementwise
from dask_geomodeling_tpu.core.validate import expect_instance

__all__ = ["Max", "reduce_rasters", "check_statistic", "STATISTICS"]

STATISTICS = {
    "first": None,
    "last": None,
    "count": None,
    "sum": np.nansum,
    "mean": np.nanmean,
    "min": np.nanmin,
    "max": np.nanmax,
    "argmin": np.nanargmin,
    "argmax": np.nanargmax,
    "std": np.nanstd,
    "var": np.nanvar,
    "median": np.nanmedian,
    "product": np.nanprod,
    # "p<number>" uses np.nanpercentile
}


def check_statistic(statistic):
    """Raise ValueError for statistics outside STATISTICS / p<number>."""
    if statistic not in STATISTICS:
        statistic, percentile = parse_percentile_statistic(statistic)
        if percentile is None:
            raise ValueError('Unknown statistic "{}"'.format(statistic))


def _overwrite_with_data(out, layers):
    """Later layers overwrite earlier ones wherever they hold data."""
    for layer in layers:
        has_data = get_index(layer["values"], layer["no_data_value"])
        out[has_data] = layer["values"][has_data]
    return out


def _nan_stacked(layers, shape, dtype):
    """Stack layers into one float array with nodata translated to NaN."""
    lifted = np.result_type(dtype, np.float16)  # must be able to hold NaN
    stacked = np.full((len(layers),) + shape, np.nan, lifted)
    for axis0, layer in enumerate(layers):
        has_data = get_index(layer["values"], layer["no_data_value"])
        stacked[axis0, has_data] = layer["values"][has_data]
    return stacked


def reduce_rasters(stack, statistic, no_data_value=None, dtype=None):
    """Apply a nodata-skipping statistic along a stack of raster dicts.

    Args:
      stack (list of dicts): each with "values" and "no_data_value"; all
        values must share one shape
      statistic (str): one of STATISTICS or "p<number>"
      no_data_value (number): output nodata; defaults to the first element's
      dtype: output dtype; defaults to the first element's
    """
    percentile = None
    if statistic not in STATISTICS:
        statistic, percentile = parse_percentile_statistic(statistic)
        if percentile is None:
            raise KeyError('Unknown statistic "{}"'.format(statistic))

    if len(stack) == 0:
        raise ValueError("Cannot reduce a zero-length stack")

    if dtype is None:
        dtype = stack[0]["values"].dtype
    if no_data_value is None:
        no_data_value = stack[0]["no_data_value"]
    shape = stack[0]["values"].shape

    # sum and count never produce nodata: their neutral fill is zero
    fill = 0 if statistic in {"sum", "count"} else no_data_value
    out = np.full(shape, fill, dtype)

    if statistic == "last":
        return {
            "values": _overwrite_with_data(out, stack),
            "no_data_value": no_data_value,
        }
    if statistic == "first":
        return {
            "values": _overwrite_with_data(out, stack[::-1]),
            "no_data_value": no_data_value,
        }
    if statistic == "count":
        for layer in stack:
            out += get_index(layer["values"], layer["no_data_value"])
        return {"values": out, "no_data_value": no_data_value}

    if statistic == "percentile":
        reducer = partial(np.nanpercentile, q=percentile)
    else:
        reducer = STATISTICS[statistic]
    stacked = _nan_stacked(stack, shape, dtype)
    some_data = ~np.all(np.isnan(stacked), axis=0)
    out[some_data] = reducer(stacked[:, some_data], axis=0)
    return {"values": out, "no_data_value": no_data_value}


def reduce_rasters_jax(stack, statistic, no_data_value, dtype):
    """Device twin of :func:`reduce_rasters` for the statistics used on the
    hot paths (first/last/count/sum/mean/min/max/product/std/var)."""
    import jax.numpy as jnp

    check_statistic(statistic)
    statistic, percentile = parse_percentile_statistic(statistic)
    if dtype is None:
        dtype = stack[0]["values"].dtype
    if no_data_value is None:
        # boolean views carry no fill value: default to the first
        # element's nodata, exactly like the numpy twin above
        no_data_value = stack[0]["no_data_value"]
    dtype = np.dtype(dtype)

    def fill_scalar():
        # numpy's np.full(shape, None, bool) quietly casts None -> False
        # (boolean rasters have no nodata); mirror that scalar here while
        # the returned dict still carries no_data_value=None.  Deferred so
        # sum/count (whose neutral fill is zero, like the numpy twin) never
        # materialize a None fill for integer stacks.
        return np.full((), no_data_value, dtype)[()]

    def data_mask(data):
        return get_index_jax(data["values"], data["no_data_value"])

    if statistic == "last":
        out = jnp.full(stack[0]["values"].shape, fill_scalar(), dtype)
        for data in stack:
            out = jnp.where(data_mask(data), data["values"].astype(dtype), out)
        return {"values": out, "no_data_value": no_data_value}
    if statistic == "first":
        out = jnp.full(stack[0]["values"].shape, fill_scalar(), dtype)
        for data in stack[::-1]:
            out = jnp.where(data_mask(data), data["values"].astype(dtype), out)
        return {"values": out, "no_data_value": no_data_value}
    if statistic == "count":
        out = jnp.zeros(stack[0]["values"].shape, dtype)
        for data in stack:
            out = out + data_mask(data).astype(dtype)
        return {"values": out, "no_data_value": no_data_value}

    float_dtype = np.result_type(dtype, np.float32)
    arrays = jnp.stack(
        [
            jnp.where(
                data_mask(data), data["values"].astype(float_dtype), jnp.nan
            )
            for data in stack
        ]
    )
    funcs = {
        "sum": jnp.nansum,
        "mean": jnp.nanmean,
        "min": jnp.nanmin,
        "max": jnp.nanmax,
        "std": jnp.nanstd,
        "var": jnp.nanvar,
        "product": jnp.nanprod,
        "median": lambda a, axis: jnp.nanmedian(a, axis=axis),
        "argmin": jnp.nanargmin,
        "argmax": jnp.nanargmax,
    }
    if statistic == "percentile":
        result = jnp.nanpercentile(arrays, percentile, axis=0)
    else:
        result = funcs[statistic](arrays, axis=0)
    not_all_nan = ~jnp.all(jnp.isnan(arrays), axis=0)
    fill = 0 if statistic == "sum" else fill_scalar()
    result = jnp.where(not_all_nan, result, fill).astype(dtype)
    return {"values": result, "no_data_value": no_data_value}


class BaseReduction(BaseElementwise):
    """Base for reductions over multiple rasters; extent is the union."""

    def __init__(self, *args):
        for arg in args:
            expect_instance(arg, RasterBlock, "arg")
        super().__init__(*args)

    def get_sources_and_requests(self, **request):
        period = self.period
        process_kwargs = {"dtype": self.dtype.name, "fillvalue": self.fillvalue}
        if period is None:
            return [(process_kwargs, None)]

        start = request.get("start", None)
        stop = request.get("stop", None)
        if start is not None:
            if stop is not None:
                request["start"] = max(start, period[0])
                request["stop"] = min(stop, period[1])
            else:
                request["start"] = min(max(start, period[0]), period[1])
        else:
            request["start"] = period[1]

        return [(process_kwargs, None)] + [
            (source, request) for source in self.args
        ]

    @property
    def extent(self):
        extents = filter_none([x.extent for x in self.args])
        if not extents:
            return None
        if len(extents) == 1:
            return extents[0]
        x1, y1 = (min(e[axis] for e in extents) for axis in (0, 1))
        x2, y2 = (max(e[axis] for e in extents) for axis in (2, 3))
        return x1, y1, x2, y2

    @property
    def geometry(self):
        geometries = filter_none([x.geometry for x in self.args])
        if not geometries:
            return None
        if len(geometries) == 1:
            return geometries[0]
        union = functools.reduce(
            lambda grown, geom: grown.union(Extent.from_geometry(geom)),
            geometries[1:],
            Extent.from_geometry(geometries[0]),
        )
        return union.as_geometry()


class _FunctionNamespace:
    """Pickle anchor for factory-made reduction process functions (see
    elemwise._FunctionNamespace)."""


reduction = _FunctionNamespace()
reduction_jax = _FunctionNamespace()


def wrap_reduction_function(statistic):
    """Build the nodata-skipping process function for one statistic."""
    def reduction_function(process_kwargs, *args):
        stack = []
        for arg in args:
            if arg is None:
                continue
            if "time" in arg or "meta" in arg:
                return arg
            stack.append(arg)
        if len(stack) == 0:
            return None
        return reduce_rasters(
            stack, statistic, process_kwargs["fillvalue"], process_kwargs["dtype"]
        )

    def jax_impl(process_kwargs, *args):
        stack = []
        for arg in args:
            if arg is None:
                continue
            if "time" in arg or "meta" in arg:
                return arg
            stack.append(arg)
        if len(stack) == 0:
            return None
        return reduce_rasters_jax(
            stack, statistic, process_kwargs["fillvalue"], process_kwargs["dtype"]
        )

    reduction_function.__name__ = "reduce_" + statistic
    reduction_function.__qualname__ = "reduction.reduce_" + statistic
    jax_impl.__qualname__ = "reduction_jax.reduce_" + statistic
    setattr(reduction, "reduce_" + statistic, reduction_function)
    setattr(reduction_jax, "reduce_" + statistic, jax_impl)
    reduction_function.jax_impl = jax_impl
    return reduction_function


class Max(BaseReduction):
    """Maximum of two or more rasters, ignoring nodata."""

    process = staticmethod(wrap_reduction_function("max"))

    def out_value_set(self):
        # a nodata-ignoring maximum only picks values a source holds —
        # after the NaN-capable float lift the stacking works in
        from dask_geomodeling_tpu.raster.base import union_value_set

        return union_value_set(
            self.args, self.dtype, self.fillvalue,
            lift=np.result_type(self.dtype, np.float32),
        )

    @property
    def dtype(self):
        # unlike elementwise math, reductions keep the input dtype
        return np.result_type(*self.args)
