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
from dask_geomodeling_tpu.core.validate import expect_instance

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


class _combined:
    """Descriptor deriving a block attribute by folding the sources' values.

    A single-source block passes its source's attribute straight through
    (via ``single``, identity by default); with several sources the
    per-source values go through ``fold``, whose ``None`` means "undefined
    for this combination of sources".
    """

    def __init__(self, fold, single=None, doc=None):
        self.fold = fold
        self.single = single
        self.__doc__ = doc

    def __set_name__(self, owner, name):
        self.attr = name

    def __get__(self, block, owner=None):
        if block is None:
            return self
        values = [getattr(source, self.attr) for source in block._sources]
        if len(values) == 1:
            return values[0] if self.single is None else self.single(values[0])
        return self.fold(values)


def _when_all(fold):
    """Lift ``fold`` over possibly-missing values: any None wins."""

    def lifted(values):
        if any(value is None for value in values):
            return None
        return fold(values)

    return lifted


def _interval_overlap(periods):
    lo = max(period[0] for period in periods)
    hi = min(period[1] for period in periods)
    return None if hi < lo else (lo, hi)


def _box_overlap(extents):
    x_lo, y_lo = (max(e[axis] for e in extents) for axis in (0, 1))
    x_hi, y_hi = (min(e[axis] for e in extents) for axis in (2, 3))
    if x_hi <= x_lo or y_hi <= y_lo:
        return None
    return (x_lo, y_lo, x_hi, y_hi)


def _geometry_overlap(geometries):
    if any(geometry is None for geometry in geometries):
        return None
    overlap = Extent.from_geometry(geometries[0])
    for geometry in geometries[1:]:
        overlap = overlap.intersection(Extent.from_geometry(geometry))
        if overlap is None:
            return None
    return overlap.as_geometry()


def _common_value(values):
    head = values[0]
    return head if all(value == head for value in values[1:]) else None


def _aligned_grid(grids):
    if any(grid is None for grid in grids):
        return None
    head = GeoTransform(grids[0])
    return head if all(head.aligns_with(g) for g in grids[1:]) else None


#: narrowest result dtype per input-dtype kind (reference promotion rules:
#: bool/int at least int32, float at least float32)
_DTYPE_FLOOR = {"b": np.int32, "i": np.int32, "u": np.int32, "f": np.float32}


class BaseElementwise(RasterBlock):
    """Base for elementwise blocks; extent/period are intersections of the
    sources', so non-overlapping sources yield an empty block."""

    def __init__(self, *args):
        super().__init__(*args)
        sources = self._sources
        if len(sources) < 2:
            return
        head, rest = sources[0], sources[1:]
        if any(s.temporal != head.temporal for s in rest):
            raise ValueError("Temporal properties of input rasters do not match.")
        delta = head.timedelta
        if head.temporal and delta is not None:
            if any(s.timedelta not in (None, delta) for s in rest):
                raise ValueError("Time resolutions of input rasters are not equal.")

    @property
    def _sources(self):
        return [arg for arg in self.args if isinstance(arg, RasterBlock)]

    def get_sources_and_requests(self, **request):
        period = self.period
        if (
            period is not None
            and request.get("start") is not None
            and request.get("stop") is not None
        ):
            # clamp to the common period so the sources' frames align
            request["start"] = max(request["start"], period[0])
            request["stop"] = min(request["stop"], period[1])

        process_kwargs = {"dtype": self.dtype.name, "fillvalue": self.fillvalue}
        return [(process_kwargs, None)] + [(source, request) for source in self.args]

    timedelta = _combined(
        _when_all(lambda deltas: deltas[0]),
        doc="common time resolution; None for mixed or nontemporal stacks",
    )
    period = _combined(
        _when_all(_interval_overlap), doc="intersection of the sources' periods"
    )
    extent = _combined(
        _when_all(_box_overlap), doc="intersection of the sources' extents"
    )
    geometry = _combined(
        _geometry_overlap, doc="intersection of the sources' footprints"
    )
    projection = _combined(
        _common_value, doc="the shared native projection, if any"
    )
    geo_transform = _combined(
        _aligned_grid,
        single=lambda grid: None if grid is None else GeoTransform(grid),
        doc="the shared native grid when all sources align",
    )

    @property
    def temporal(self):
        return self._sources[0].temporal

    @property
    def dtype(self):
        joint = np.result_type(*self.args)
        floor = _DTYPE_FLOOR.get(joint.kind)
        return joint if floor is None else np.result_type(joint, floor)

    @property
    def fillvalue(self):
        dtype = self.dtype
        return None if dtype == bool else get_dtype_max(dtype)


def _check_operands(operands, allowed):
    """Every operand is an ``allowed`` instance, or TypeError."""
    for operand in operands:
        expect_instance(operand, allowed, "operand")


class BaseMath(BaseElementwise):
    """Elementwise math on two raster-or-number operands."""

    OPERAND_TYPES = (RasterBlock, np.ndarray, float, int)

    def __init__(self, a, b):
        _check_operands((a, b), self.OPERAND_TYPES)
        super().__init__(a, b)

    #: float palettes may only propagate through exactly-rounded ops:
    #: XLA TPU divide/power use reciprocal/exp-log approximations that can
    #: land 1 ulp off numpy, and the packed-fetch palette match is exact
    #: equality — a near-miss silently encodes as the next palette entry.
    #: add/subtract/multiply are correctly rounded on both sides.
    _EXACT_FLOAT_UFUNCS = (np.add, np.subtract, np.multiply)

    def out_value_set(self):
        # raster (op) scalar keeps a discrete alphabet discrete: apply the
        # ufunc to each member the way the process would (operands cast to
        # the result dtype), nodata and non-finite results to the fill
        ufunc = getattr(self.process, "np_func", None)
        a, b = self.args
        raster, scalar = (a, b) if isinstance(a, RasterBlock) else (b, a)
        if (
            ufunc is None
            or not isinstance(raster, RasterBlock)
            or not isinstance(scalar, (int, float))
        ):
            return None
        child = raster.out_value_set()
        dtype = self.dtype
        from dask_geomodeling_tpu.raster.base import VALUE_SET_LIMIT

        if child is None or len(child) > VALUE_SET_LIMIT or dtype == bool:
            return None
        if (
            np.issubdtype(dtype, np.floating)
            and ufunc not in self._EXACT_FLOAT_UFUNCS
        ):
            return None  # device float result may be 1 ulp off the palette
        child_fill = raster.fillvalue
        # vectorized member map: the ufunc sees operands cast to the
        # result dtype, exactly like the process does per pixel
        members = np.array(
            [v for v in child if child_fill is None or v != child_fill],
            dtype,
        )
        scalar_arr = np.asarray(scalar, dtype)
        operands = (
            (members, scalar_arr) if raster is a else (scalar_arr, members)
        )
        with np.errstate(all="ignore"):
            mapped = ufunc(operands[0], operands[1], dtype=dtype)
        out = {self.fillvalue}  # nodata cells and non-finite results
        out.update(np.asarray(mapped)[np.isfinite(mapped)].tolist())
        return out


class BaseComparison(BaseMath):
    """Base for raster-vs-raster/constant comparisons (bool results)."""
    @property
    def dtype(self):
        return np.dtype("bool")


class BaseLogic(BaseElementwise):
    """Elementwise logic on two boolean operands."""

    def __init__(self, a, b):
        for operand in (a, b):
            if isinstance(operand, (RasterBlock, np.ndarray)):
                if operand.dtype != np.dtype("bool"):
                    raise TypeError("inputs must have boolean dtypes")
            else:
                _check_operands((operand,), bool)
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
            continue
        if "time" in data or "meta" in data:
            return data
        if "values" not in data:
            raise TypeError("Cannot apply math function to value {}".format(data))
        values = data["values"]
        compute_args.append(values)
        # booleans carry no nodata; frames without one contribute no mask
        if values.dtype != np.dtype("bool") and "no_data_value" in data:
            mask_parts.append((values, data["no_data_value"]))
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

        # one combined fill write: non-finite results and input-nodata cells
        bad = ~np.isfinite(result_values)
        if nodata_mask is not None:
            bad |= nodata_mask
        result_values[bad] = fillvalue
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
    math_process_func.np_func = func  # BaseMath.out_value_set propagation
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


for _comparison in (Equal, NotEqual, Greater, GreaterEqual, Less, LessEqual):
    # discrete (boolean) outputs: f64 operands can flip under the chip's
    # emulated float64 — the executor guards these pipelines host-side
    # by default (geomodeling.device-f64-discrete)
    _comparison.process.jax_f64_sensitive = True
del _comparison


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


def _frame_stack(args):
    """Collect (values, no_data_value) pairs from frame dicts.

    A time/meta response short-circuits (returned as-is); missing frames
    are dropped; an all-missing stack collapses to an empty list.
    """
    stack = []
    for data in args:
        if data is None:
            continue
        if "time" in data or "meta" in data:
            return data
        if "values" in data and "no_data_value" in data:
            stack.append((data["values"], data["no_data_value"]))
    return stack


def _fill_no_data_process(process_kwargs, *args):
    stack = _frame_stack(args)
    if isinstance(stack, dict):
        return stack
    if not stack:
        return None
    dtype = process_kwargs["dtype"]
    fillvalue = get_dtype_max(dtype)

    values = np.full(stack[0][0].shape, fillvalue, dtype=dtype)
    for frame, no_data_value in stack:
        index = get_index(frame, no_data_value)
        values[index] = frame[index]
    return {"values": values, "no_data_value": fillvalue}


def _fill_no_data_jax(process_kwargs, *args):
    import jax.numpy as jnp

    stack = _frame_stack(args)
    if isinstance(stack, dict):
        return stack
    if not stack:
        return None
    dtype = np.dtype(process_kwargs["dtype"])
    fillvalue = get_dtype_max(dtype)

    values = jnp.full(stack[0][0].shape, fillvalue, dtype=dtype)
    for frame, no_data_value in stack:
        has_data = get_index_jax(frame, no_data_value)
        values = jnp.where(has_data, frame.astype(dtype), values)
    return {"values": values, "no_data_value": fillvalue}


_fill_no_data_process.jax_impl = _fill_no_data_jax


class FillNoData(BaseElementwise):
    """Combine rasters, filling nodata from left to right (rightmost wins)."""

    def __init__(self, *args):
        for arg in args:
            expect_instance(arg, RasterBlock, "arg")
        super().__init__(*args)

    def out_value_set(self):
        from dask_geomodeling_tpu.raster.base import union_value_set

        return union_value_set(self.args, self.dtype, self.fillvalue)

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
