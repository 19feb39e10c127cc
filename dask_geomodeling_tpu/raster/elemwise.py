"""Elementwise raster blocks (map algebra).

Semantics match the reference (dask_geomodeling/raster/elemwise.py): nodata
propagates from any input; comparisons map nodata to False (NotEqual: True);
non-finite results become nodata; dtype promotion is int→≥int32,
float→≥float32, Divide/Exp/Log→≥float32; boolean rasters carry no nodata.

TPU-native: every process function carries a ``jax_impl`` attribute — a pure
functional twin operating on jax arrays — which the runtime executor fuses
into a single jitted XLA program per view (runtime/executor.py).  The numpy
path below is the host reference used by the default executor and the tests.
"""
import numpy as np

from dask_geomodeling_tpu.geo import (
    Extent,
    GeoTransform,
    get_dtype_max,
    get_index,
    get_index_jax,
)
from dask_geomodeling_tpu.raster.base import BaseSingle, RasterBlock

__all__ = [
    "Add",
    "Subtract",
    "Multiply",
    "Divide",
    "Power",
    "FillNoData",
    "Equal",
    "NotEqual",
    "Greater",
    "GreaterEqual",
    "Less",
    "LessEqual",
    "Invert",
    "And",
    "Or",
    "Xor",
    "IsData",
    "IsNoData",
    "Exp",
    "Log",
    "Log10",
]


class BaseElementwise(RasterBlock):
    """Base for elementwise blocks; extent/period are intersections of the
    sources', so non-overlapping sources yield an empty block."""

    def __init__(self, *args):
        super().__init__(*args)
        if len(self._sources) > 1:
            temporal = self._sources[0].temporal
            delta = self._sources[0].timedelta
            if any(s.temporal != temporal for s in self._sources[1:]):
                raise ValueError("Temporal properties of input rasters do not match.")
            if temporal and delta is not None:
                if not all(
                    s.timedelta in (None, delta) for s in self._sources[1:]
                ):
                    raise ValueError("Time resolutions of input rasters are not equal.")

    @property
    def _sources(self):
        return [arg for arg in self.args if isinstance(arg, RasterBlock)]

    def get_sources_and_requests(self, **request):
        start = request.get("start", None)
        stop = request.get("stop", None)

        if start is not None and stop is not None:
            # clamp to the common period so the sources' frames align
            period = self.period
            if period is not None:
                request["start"] = max(start, period[0])
                request["stop"] = min(stop, period[1])

        process_kwargs = {"dtype": self.dtype.name, "fillvalue": self.fillvalue}
        return [(process_kwargs, None)] + [(source, request) for source in self.args]

    @property
    def timedelta(self):
        if len(self._sources) == 1:
            return self._sources[0].timedelta
        timedeltas = [s.timedelta for s in self._sources]
        if any(x is None for x in timedeltas):
            return None
        return timedeltas[0]

    @property
    def temporal(self):
        return self._sources[0].temporal

    @property
    def period(self):
        if len(self._sources) == 1:
            return self._sources[0].period
        periods = [s.period for s in self._sources]
        if any(period is None for period in periods):
            return None
        start = max(p[0] for p in periods)
        stop = min(p[1] for p in periods)
        if stop < start:
            return None
        return start, stop

    @property
    def extent(self):
        if len(self._sources) == 1:
            return self._sources[0].extent
        extents = [s.extent for s in self._sources]
        if any(extent is None for extent in extents):
            return None
        x1 = max(e[0] for e in extents)
        y1 = max(e[1] for e in extents)
        x2 = min(e[2] for e in extents)
        y2 = min(e[3] for e in extents)
        if x2 <= x1 or y2 <= y1:
            return None
        return x1, y1, x2, y2

    @property
    def dtype(self):
        dtype = np.result_type(*self.args)
        if np.issubdtype(dtype, np.integer) or dtype == bool:
            return np.result_type(dtype, np.int32)
        if np.issubdtype(dtype, np.floating):
            return np.result_type(dtype, np.float32)
        return dtype

    @property
    def fillvalue(self):
        dtype = self.dtype
        if dtype == bool:
            return None
        return get_dtype_max(dtype)

    @property
    def geometry(self):
        geometries = [x.geometry for x in self._sources]
        if any(x is None for x in geometries):
            return None
        if len(geometries) == 1:
            return geometries[0]
        extent = Extent.from_geometry(geometries[0])
        for geometry in geometries[1:]:
            extent = extent.intersection(Extent.from_geometry(geometry))
            if extent is None:
                return None
        return extent.as_geometry()

    @property
    def projection(self):
        projection = self._sources[0].projection
        if projection is None:
            return None
        for arg in self._sources[1:]:
            if projection != arg.projection:
                return None
        return projection

    @property
    def geo_transform(self):
        geo_transform = self._sources[0].geo_transform
        if geo_transform is None:
            return None
        geo_transform = GeoTransform(geo_transform)
        for arg in self._sources[1:]:
            other = arg.geo_transform
            if other is None or not geo_transform.aligns_with(other):
                return None
        return geo_transform


class BaseMath(BaseElementwise):
    """Elementwise math on two raster-or-number operands."""

    def __init__(self, a, b):
        for x in (a, b):
            if not isinstance(x, (RasterBlock, np.ndarray, float, int)):
                raise TypeError("'{}' object is not allowed".format(type(x)))
        super().__init__(a, b)


class BaseComparison(BaseMath):
    """Base for raster-vs-raster/constant comparisons (bool results)."""
    @property
    def dtype(self):
        return np.dtype("bool")


class BaseLogic(BaseElementwise):
    """Elementwise logic on two boolean operands."""

    def __init__(self, a, b):
        for x in (a, b):
            if isinstance(x, (RasterBlock, np.ndarray)):
                if x.dtype != np.dtype("bool"):
                    raise TypeError("inputs must have boolean dtypes")
            elif not isinstance(x, bool):
                raise TypeError("'{}' object is not allowed".format(type(x)))
        super().__init__(a, b)

    @property
    def dtype(self):
        return np.dtype("bool")

    @property
    def fillvalue(self):
        return None


def _unpack_math_args(process_kwargs, args):
    """Shared pre-processing: collect compute operands and a nodata mask.

    Returns None to propagate empties, a dict to short-circuit time/meta, or
    a tuple (compute_args, nodata_mask_parts).
    """
    compute_args = []
    mask_parts = []
    for data in args:
        if data is None:
            return None
        if not isinstance(data, dict):
            compute_args.append(data)
        elif "time" in data or "meta" in data:
            return data
        elif "values" in data:
            compute_args.append(data["values"])
            if data["values"].dtype == np.dtype("bool"):
                continue  # booleans carry no nodata
            if "no_data_value" not in data:
                continue
            mask_parts.append((data["values"], data["no_data_value"]))
        else:
            raise TypeError("Cannot apply math function to value {}".format(data))
    return compute_args, mask_parts


class _FunctionNamespace:
    """Pickle anchor: factory-made process functions register themselves
    here under their ufunc name, so that their dotted ``__qualname__``
    resolves via attribute lookup (multiprocessing schedulers pickle the
    compute graph, including the process functions)."""


elemwise = _FunctionNamespace()
elemwise_jax = _FunctionNamespace()


def wrap_math_process_func(func, jnp_func_name=None):
    """Build a process function applying ``func`` to the data values only.

    Nodata propagates; comparisons map nodata to False (NotEqual: True).
    The returned callable carries a ``jax_impl`` twin for the TPU executor.
    """

    def math_process_func(process_kwargs, *args):
        if not args:
            return None
        unpacked = _unpack_math_args(process_kwargs, args)
        if unpacked is None or isinstance(unpacked, dict):
            return unpacked
        compute_args, mask_parts = unpacked

        nodata_mask = None
        for values, no_data_value in mask_parts:
            part = values == no_data_value
            nodata_mask = part if nodata_mask is None else (nodata_mask | part)

        dtype = np.dtype(process_kwargs["dtype"])
        fillvalue = process_kwargs["fillvalue"]

        if dtype == np.dtype("bool"):
            no_data_value = None
            fillvalue = func is np.not_equal
            func_kwargs = {}
        else:
            func_kwargs = {"dtype": dtype}
            no_data_value = fillvalue

        with np.errstate(all="ignore"):
            result_values = func(*compute_args, **func_kwargs)

        result_values[~np.isfinite(result_values)] = fillvalue
        if nodata_mask is not None:
            result_values[nodata_mask] = fillvalue
        return {"no_data_value": no_data_value, "values": result_values}

    def jax_impl(process_kwargs, *args):
        import jax.numpy as jnp

        jfunc = getattr(jnp, jnp_func_name or func.__name__)
        unpacked = _unpack_math_args(process_kwargs, args)
        if unpacked is None or isinstance(unpacked, dict):
            return unpacked
        compute_args, mask_parts = unpacked

        nodata_mask = None
        for values, no_data_value in mask_parts:
            part = values == no_data_value
            nodata_mask = part if nodata_mask is None else (nodata_mask | part)

        dtype = np.dtype(process_kwargs["dtype"])
        fillvalue = process_kwargs["fillvalue"]
        if dtype == np.dtype("bool"):
            no_data_value = None
            fillvalue = func is np.not_equal
            result = jfunc(*compute_args)
        else:
            no_data_value = fillvalue
            # numpy's ufunc(dtype=...) promotes operands before computing;
            # match that to avoid wraparound in narrow input dtypes
            result = jfunc(*[jnp.asarray(a).astype(dtype) for a in compute_args])

        if dtype.kind == "f":
            result = jnp.where(jnp.isfinite(result), result, fillvalue)
        if nodata_mask is not None:
            result = jnp.where(nodata_mask, dtype.type(fillvalue), result)
        return {"no_data_value": no_data_value, "values": result}

    # distinct (qual)names per ufunc: the executor's program-cache
    # signature is keyed on them, and the factory-generic qualname would
    # collide different operations with equal arguments
    math_process_func.__name__ = func.__name__
    math_process_func.__qualname__ = "elemwise." + func.__name__
    jax_impl.__qualname__ = "elemwise_jax." + func.__name__
    setattr(elemwise, func.__name__, math_process_func)
    setattr(elemwise_jax, func.__name__, jax_impl)
    math_process_func.jax_impl = jax_impl
    # numeric constants become traced inputs: Add(x, 10) and Add(x, 20)
    # share one compiled program (the impl casts operands to the result
    # dtype, so a float64-traced constant keeps integer semantics)
    math_process_func.jax_dynamic = {"__scalars__"}
    return math_process_func


class Add(BaseMath):
    """Add two rasters or a raster and a constant (nodata-propagating)."""

    process = staticmethod(wrap_math_process_func(np.add))


class Subtract(BaseMath):
    """Subtract two rasters or a constant from a raster."""

    process = staticmethod(wrap_math_process_func(np.subtract))


class Multiply(BaseMath):
    """Multiply two rasters or a raster by a constant."""

    process = staticmethod(wrap_math_process_func(np.multiply))


class Divide(BaseMath):
    """Divide two rasters or a raster by a constant; result ≥ float32."""

    process = staticmethod(wrap_math_process_func(np.divide))

    @property
    def dtype(self):
        return np.result_type(np.float32, *self.args)


class Power(BaseMath):
    """Raise a raster to a power (or a power raster)."""

    process = staticmethod(wrap_math_process_func(np.power))

    def __init__(self, a, b):
        # negative integer exponents fail for integer bases; cast to float
        if isinstance(b, int) and b < 0:
            b = float(b)
        super().__init__(a, b)


class Equal(BaseComparison):
    """a == b; nodata compares as False."""

    process = staticmethod(wrap_math_process_func(np.equal))


class NotEqual(BaseComparison):
    """a != b; nodata compares as True."""

    process = staticmethod(wrap_math_process_func(np.not_equal))


class Greater(BaseComparison):
    """a > b; nodata compares as False."""

    process = staticmethod(wrap_math_process_func(np.greater))


class GreaterEqual(BaseComparison):
    """a >= b; nodata compares as False."""

    process = staticmethod(wrap_math_process_func(np.greater_equal))


class Less(BaseComparison):
    """a < b; nodata compares as False."""

    process = staticmethod(wrap_math_process_func(np.less))


class LessEqual(BaseComparison):
    """a <= b; nodata compares as False."""

    process = staticmethod(wrap_math_process_func(np.less_equal))


def _invert_process(data):
    if "values" in data:
        return {"values": ~data["values"], "no_data_value": None}
    return data


def _invert_jax(data):
    if "values" in data:
        return {"values": ~data["values"], "no_data_value": None}
    return data


_invert_process.jax_impl = _invert_jax


class Invert(BaseSingle):
    """Logically invert a boolean raster (swap True and False)."""

    def __init__(self, x):
        super().__init__(x)
        if x.dtype != np.dtype("bool"):
            raise TypeError("input block must have boolean dtype")

    process = staticmethod(_invert_process)

    @property
    def dtype(self):
        return np.dtype("bool")


def _is_data_process(data):
    if data is None or "values" not in data:
        return data
    return {
        "values": data["values"] != data["no_data_value"],
        "no_data_value": None,
    }


_is_data_process.jax_impl = _is_data_process


def _is_no_data_process(data):
    if data is None or "values" not in data:
        return data
    return {
        "values": data["values"] == data["no_data_value"],
        "no_data_value": None,
    }


_is_no_data_process.jax_impl = _is_no_data_process


class IsData(BaseSingle):
    """True where the raster has data."""

    def __init__(self, store):
        if store.dtype == np.dtype("bool"):
            raise TypeError("input block must not have boolean dtype")
        super().__init__(store)

    process = staticmethod(_is_data_process)

    @property
    def dtype(self):
        return np.dtype("bool")

    @property
    def fillvalue(self):
        return None


class IsNoData(IsData):
    """True where the raster has no data."""

    process = staticmethod(_is_no_data_process)


class And(BaseLogic):
    """Boolean AND of two boolean rasters/constants."""

    process = staticmethod(wrap_math_process_func(np.logical_and))


class Or(BaseLogic):
    """Boolean OR of two boolean rasters/constants."""

    process = staticmethod(wrap_math_process_func(np.logical_or))


class Xor(BaseLogic):
    """Boolean XOR of two boolean rasters/constants."""

    process = staticmethod(wrap_math_process_func(np.logical_xor))


def _fill_no_data_process(process_kwargs, *args):
    data_list = []
    no_data_values = []
    for data in args:
        if data is None:
            continue
        if "time" in data or "meta" in data:
            return data
        if "values" in data and "no_data_value" in data:
            data_list.append(data["values"])
            no_data_values.append(data["no_data_value"])

    dtype = process_kwargs["dtype"]
    fillvalue = get_dtype_max(dtype)

    if not data_list:
        return None

    values = np.full(data_list[0].shape, fillvalue, dtype=dtype)
    for data, no_data_value in zip(data_list, no_data_values):
        index = get_index(data, no_data_value)
        values[index] = data[index]
    return {"values": values, "no_data_value": fillvalue}


def _fill_no_data_jax(process_kwargs, *args):
    import jax.numpy as jnp

    data_list = []
    no_data_values = []
    for data in args:
        if data is None:
            continue
        if "time" in data or "meta" in data:
            return data
        if "values" in data and "no_data_value" in data:
            data_list.append(data["values"])
            no_data_values.append(data["no_data_value"])

    dtype = np.dtype(process_kwargs["dtype"])
    fillvalue = get_dtype_max(dtype)
    if not data_list:
        return None

    values = jnp.full(data_list[0].shape, fillvalue, dtype=dtype)
    for data, no_data_value in zip(data_list, no_data_values):
        has_data = get_index_jax(data, no_data_value)
        values = jnp.where(has_data, data.astype(dtype), values)
    return {"values": values, "no_data_value": fillvalue}


_fill_no_data_process.jax_impl = _fill_no_data_jax


class FillNoData(BaseElementwise):
    """Combine rasters, filling nodata from left to right (rightmost wins)."""

    def __init__(self, *args):
        for arg in args:
            if not isinstance(arg, RasterBlock):
                raise TypeError("'{}' object is not allowed".format(type(arg)))
        super().__init__(*args)

    process = staticmethod(_fill_no_data_process)


class BaseLogExp(BaseSingle):
    """Base for Exp / Log / Log10."""

    def __init__(self, x):
        if x.dtype == np.dtype("bool"):
            raise TypeError("input block must not have boolean dtype")
        super().__init__(x)

    def get_sources_and_requests(self, **request):
        process_kwargs = {"dtype": self.dtype.name, "fillvalue": self.fillvalue}
        return [(process_kwargs, None), (self.args[0], request)]

    @property
    def dtype(self):
        return np.result_type(np.float32, *self.args)

    @property
    def fillvalue(self):
        return get_dtype_max(self.dtype)


class Exp(BaseLogExp):
    """e ** x; out-of-range results become nodata."""

    process = staticmethod(wrap_math_process_func(np.exp))


class Log(BaseLogExp):
    """Natural logarithm; results of x < 0 become nodata."""

    process = staticmethod(wrap_math_process_func(np.log))


class Log10(BaseLogExp):
    """Base-10 logarithm; results of x < 0 become nodata."""

    process = staticmethod(wrap_math_process_func(np.log10))
