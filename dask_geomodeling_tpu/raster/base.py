"""RasterBlock base classes.

Attribute and request/response contract identical to the reference
(dask_geomodeling/raster/base.py:9-228); see SURVEY §1 "The two protocols".
"""
from datetime import datetime as Datetime

from dask_geomodeling_tpu.core import arg, Block
from dask_geomodeling_tpu.core.validate import expect_instance

__all__ = ["RasterBlock", "BaseSingle"]


def _operator(block_name, reflected=False, unary=False, const=None):
    """An operator overload that builds the named elemwise block lazily
    (the elemwise module imports this one)."""
    if unary:

        def method(self):
            import dask_geomodeling_tpu.raster as blocks

            cls = getattr(blocks, block_name)
            return cls(self) if const is None else cls(self, const)

    elif reflected:

        def method(self, other):
            import dask_geomodeling_tpu.raster as blocks

            return getattr(blocks, block_name)(other, self)

    else:

        def method(self, other):
            import dask_geomodeling_tpu.raster as blocks

            return getattr(blocks, block_name)(self, other)

    method.__doc__ = "Build a %s block from this raster." % block_name
    return method


#: value-set propagation cap: the widest alphabet any packed fetch codec
#: can express is 65536 (uint16 palette codes, runtime/fetchcodec.py);
#: past that a declared set is dead weight.  Derived chains cap here —
#: the (cheaper) source scans have their own, tighter default
#: (``geomodeling.source-alphabet-max``).
VALUE_SET_LIMIT = 65536


class RasterBlock(Block):
    """The base block for temporal rasters.

    Required attributes on every RasterBlock (None when empty):

    - ``period``: (datetime, datetime) or None
    - ``timedelta``: datetime.timedelta or None (non-equidistant/static)
    - ``extent``: (x1, y1, x2, y2) in WGS84
    - ``dtype``: numpy dtype
    - ``fillvalue``: number (None for boolean rasters)
    - ``geometry``: Geometry in the native projection (with ``srs`` set)
    - ``projection``: projection user string (EPSG:xxxx or WKT)
    - ``geo_transform``: 6-tuple
    - ``temporal``: bool

    Request fields: ``mode`` ('vals'|'time'|'meta'), ``bbox``, ``projection``,
    ``width``, ``height``, ``start``, ``stop``.  Response: None or a dict
    with ``values`` (bands, height, width) + ``no_data_value``, or ``time``,
    or ``meta``.
    """

    DEFAULT_ORIGIN = Datetime(1970, 1, 1, 0, 0)

    def get_data(self, **request):
        """Evaluate the request.

        With the jax executor active, vals requests larger than one tile
        automatically route through the batched tile runtime
        (runtime/tiles.py): the whole view compiles to ONE vmapped XLA
        program and B tiles ship per device dispatch.  Views containing
        host-only nodes fall back to the staged executor transparently.

        With ``geomodeling.result-cache-size`` > 0, whole responses are
        LRU-cached across requests by (view token, request token) — the
        serving-workload reuse layer (runtime/results.py).
        """
        from dask_geomodeling_tpu.config import config

        cache_bytes = config.get("geomodeling.result-cache-size", 0)
        if cache_bytes:
            from dask_geomodeling_tpu.runtime import results

            return results.get_or_compute(
                self, request, lambda: self._get_data_uncached(**request),
                int(cache_bytes),
            )
        return self._get_data_uncached(**request)

    def _get_data_uncached(self, **request):
        from dask_geomodeling_tpu.config import config

        executor = config.get("geomodeling.executor", "numpy")
        mode_vals = request.get("mode") == "vals"
        tile_size = config.get("geomodeling.tile-size", 512)
        width = request.get("width") or 0
        height = request.get("height") or 0
        if (
            executor == "jax"
            and mode_vals
            and config.get("geomodeling.auto-tile", True)
            and max(width, height) > tile_size
        ):
            from dask_geomodeling_tpu.runtime.tiles import (
                NotLowerable,
                evaluate_tiled,
            )

            try:
                # batch resolves inside evaluate_tiled from
                # geomodeling.tile-batch (single source of truth)
                return evaluate_tiled(self, request, tile_size=tile_size)
            except NotLowerable:
                pass  # host nodes present: the staged executor handles it
        if executor == "auto" and mode_vals:
            # per-request host/device routing by measured rates
            # (runtime/router.py); the host path stays the safe default
            from dask_geomodeling_tpu.runtime import router

            eligible = width * height >= config.get(
                "geomodeling.auto-min-device-px", 65536
            )
            if router.choose(self, request, eligible) == "jax":
                try:
                    from dask_geomodeling_tpu.runtime.executor import (
                        compute_jax,
                    )

                    with router.timed_route(self, request, "jax"):
                        if max(width, height) > tile_size:
                            from dask_geomodeling_tpu.runtime.tiles import (
                                NotLowerable,
                                evaluate_tiled,
                            )

                            try:
                                return evaluate_tiled(
                                    self, request, tile_size=tile_size
                                )
                            except NotLowerable:
                                # host nodes present: the staged executor
                                # handles them (exactly the executor=jax
                                # fallback) — often still a device win,
                                # so the route must measure it rather
                                # than pin the key host-only
                                pass
                        # sub-tile request or non-tileable view: the
                        # staged executor (avoids tile padding waste,
                        # stages device runs around host nodes)
                        return compute_jax(
                            *self.get_compute_graph(**request)
                        )
                except Exception:
                    # any device failure (tunnel RPC, compile OOM, ...)
                    # serves this request from the host path; repeated
                    # failures pin the key to the host route
                    import logging

                    logging.getLogger(__name__).warning(
                        "device route failed; serving from the host path",
                        exc_info=True,
                    )
                    router.record_error(self, request)
            with router.timed_route(self, request, "numpy"):
                return super().get_data(**request)
        return super().get_data(**request)

    def to_file(self, *args, **kwargs):
        """Export data from this block to a file on disk; see
        :func:`dask_geomodeling_tpu.raster.sinks.to_file`."""
        from dask_geomodeling_tpu.raster.sinks import to_file

        return to_file(self, *args, **kwargs)

    def out_value_set(self):
        """Every value this block's output array can contain (data values
        AND nodata fills), as a set — or None when the output is
        continuous/unbounded.

        Discrete-output blocks (Mask, Classify, Reclassify, Step, ...)
        override this, propagating through their wrapped stores, so the
        tile runtime can derive a packed fetch codec for whole *chains*
        (e.g. ``Reclassify(Classify(...))`` without ``select``) instead
        of only roots that declare their alphabet standalone.  A
        declared set MUST be a superset of the truth — extra values only
        cost codec symbols, missing values silently corrupt the packed
        fetch.  The reference has no analog (it ships raw ndarrays
        between dask workers); this feeds runtime/fetchcodec.py.
        """
        return None

    def __len__(self):
        """Number of temporal bands."""
        span = self.period
        if span is None:
            return 0
        first, last = span
        if first == last:
            return 1
        step = self.timedelta
        if step is None:
            # non-equidistant: the data itself knows its time axis
            time_axis = self.get_data(mode="time", start=first, stop=last)
            return len(time_axis["time"])
        return 1 + int((last - first).total_seconds() // step.total_seconds())

    __add__ = __radd__ = _operator("Add")
    __mul__ = __rmul__ = _operator("Multiply")
    __neg__ = _operator("Multiply", unary=True, const=-1)
    __sub__ = _operator("Subtract")
    __truediv__ = _operator("Divide")
    __pow__ = _operator("Power")
    __eq__ = _operator("Equal")
    __ne__ = _operator("NotEqual")
    __gt__ = _operator("Greater")
    __ge__ = _operator("GreaterEqual")
    __lt__ = _operator("Less")
    __le__ = _operator("LessEqual")
    __invert__ = _operator("Invert", unary=True)
    __and__ = _operator("And")
    __or__ = _operator("Or")
    __xor__ = _operator("Xor")

    # Equal/NotEqual overload __eq__; keep Blocks hashable by identity-ish
    __hash__ = Block.__hash__


class BaseSingle(RasterBlock):
    """Base class for raster blocks wrapping a single raster ("store");
    every raster attribute delegates to the wrapped store unless a
    subclass overrides it."""

    def __init__(self, store, *args):
        expect_instance(store, RasterBlock, "store")
        super().__init__(store, *args)

    store = arg(0)

    def __len__(self):
        return len(self.store)


def _delegate(attribute):
    return property(lambda self: getattr(self.store, attribute))


for _attribute in (
    "extent",
    "period",
    "timedelta",
    "temporal",
    "dtype",
    "fillvalue",
    "geometry",
    "projection",
    "geo_transform",
):
    setattr(BaseSingle, _attribute, _delegate(_attribute))
del _attribute


def union_value_set(sources, dtype, fillvalue, lift=None):
    """The combined alphabet of value-picking multi-source blocks (Group,
    FillNoData, Max-style reductions): every source's data values cast to
    the output dtype, each source's own fill excluded (those cells either
    show another source's value or the combined fill), plus ``fillvalue``.
    ``lift`` names an intermediate working dtype (min/max reductions
    stack through a NaN-capable float) — members round-trip through it
    exactly the way the process would.  None when any source is
    unbounded or the union grows past any codec's use."""
    import numpy as np

    dtype = np.dtype(dtype)
    out = {fillvalue} if fillvalue is not None else set()
    for source in sources:
        if not isinstance(source, RasterBlock):
            if isinstance(source, (int, float)):
                out.add(dtype.type(source).item())
                continue
            return None
        child = source.out_value_set()
        if child is None:
            return None
        child_fill = source.fillvalue
        for v in child:
            if child_fill is not None and v == child_fill:
                continue
            try:
                if lift is not None:
                    v = np.dtype(lift).type(v)
                out.add(dtype.type(v).item())
            except (TypeError, ValueError, OverflowError):
                return None
        if len(out) > VALUE_SET_LIMIT:
            return None
    return out
