"""Miscellaneous raster blocks: Clip, Mask, Step, Classify, Reclassify,
Rasterize, RasterizeWKT.

Semantics match the reference (dask_geomodeling/raster/misc.py).  The
pixel-wise blocks (Clip/Mask/MaskBelow/Step/Classify/Reclassify) carry
``jax_impl`` twins so the TPU executor can fuse them into jitted XLA tile
programs; Rasterize/RasterizeWKT consume host-side geometry sources and burn
with the native rasterizer (geo/rasterize.py).
"""
import numpy as np

from dask_geomodeling_tpu import utils
from dask_geomodeling_tpu.config import config
from dask_geomodeling_tpu.core import arg
from dask_geomodeling_tpu.geo.features import GeoSeries
from dask_geomodeling_tpu.geo.geometry import Point, box
from dask_geomodeling_tpu.raster.base import BaseSingle, RasterBlock
from dask_geomodeling_tpu.core.validate import expect_instance

__all__ = [
    "Clip",
    "Classify",
    "Reclassify",
    "Mask",
    "MaskBelow",
    "Step",
    "Rasterize",
    "RasterizeWKT",
]


def _data_cells(frame):
    """Boolean index of a frame's data-carrying cells (boolean frames:
    the True cells).  Works on numpy and traced jax arrays alike — the
    dtype test is static."""
    values = frame["values"]
    if values.dtype == np.dtype("bool"):
        return values
    return values != frame["no_data_value"]


def _clip_process(data, source_data):
    """Keep store cells only where the clip source has data (or True).

    Pass-throughs first: empty stores, time/meta responses, and frames
    that are already all-nodata (nothing left to clip away).  Behavior
    matches the reference Clip (dask_geomodeling/raster/misc.py)."""
    if data is None or "values" not in data:
        return data
    fill = data["no_data_value"]
    if not (data["values"] != fill).any():
        return data
    if source_data is None:
        return None
    clipped = data["values"].copy()
    clipped[~_data_cells(source_data)] = fill
    return {"values": clipped, "no_data_value": fill}


def _clip_jax(data, source_data):
    import jax.numpy as jnp

    if data is None or "values" not in data:
        return data
    if source_data is None:
        return None
    fill = data["no_data_value"]
    clipped = jnp.where(
        _data_cells(source_data),
        data["values"],
        # boolean stores have no nodata sentinel; numpy casts None to False
        False if fill is None else fill,
    )
    return {"values": clipped, "no_data_value": fill}


_clip_process.jax_impl = _clip_jax


class Clip(BaseSingle):
    """Clip one raster ('store') to the data/True extent of another
    ('source'); inputs must share time resolution."""

    def __init__(self, store, source):
        expect_instance(source, RasterBlock, "source")
        if store.temporal and not source.temporal:
            raise ValueError(
                "The values raster is temporal while the clipping mask is "
                "not. Consider using Snap."
            )
        if not store.temporal and source.temporal:
            raise ValueError(
                "The clipping mask is temporal while the values raster is "
                "not. Consider using Snap."
            )
        if store.temporal and (store.timedelta != source.timedelta):
            raise ValueError(
                "Time resolution of the clipping mask does not match that "
                "of the values raster. Consider using Snap."
            )
        super().__init__(store, source)

    source = arg(1)

    def get_sources_and_requests(self, **request):
        # clamp start/stop into the common period so frames align
        period = self.period
        if period is None:
            return [(None, None), (None, None)]
        lo, hi = period

        def clamp(instant):
            return min(max(instant, lo), hi)

        start = request.get("start")
        if start is None:
            start = hi
        stop = request.get("stop")
        if stop is not None:
            if stop < lo or start > hi:
                return [(None, None), (None, None)]  # no overlap at all
            request["stop"] = clamp(stop)
        request["start"] = clamp(start)
        return [(source, request) for source in self.args]

    def out_value_set(self):
        # store values pass through; cells outside the mask become nodata
        child = self.store.out_value_set()
        if child is None:
            return None
        return child | {self.fillvalue}

    process = staticmethod(_clip_process)

    @property
    def extent(self):
        boxes = [s.extent for s in self.args]
        if any(b is None for b in boxes):
            return None
        # the clipped extent is the overlap of store and mask
        x1, y1 = (max(b[axis] for b in boxes) for axis in (0, 1))
        x2, y2 = (min(b[axis] for b in boxes) for axis in (2, 3))
        if x2 <= x1 or y2 <= y1:
            return None
        return x1, y1, x2, y2

    @property
    def geometry(self):
        result, mask = [x.geometry for x in self.args]
        if result is None or mask is None:
            return None
        extent = utils.Extent.from_geometry(result).intersection(
            utils.Extent.from_geometry(mask)
        )
        if extent is None:
            return None
        return extent.as_geometry()

    @property
    def period(self):
        periods = [x.period for x in self.args]
        if any(period is None for period in periods):
            return None
        start = max(p[0] for p in periods)
        stop = min(p[1] for p in periods)
        if stop < start:
            return None
        return start, stop


def _mask_dtype_from_value(value):
    if isinstance(value, float):
        return np.dtype("float32")
    if value >= 0:
        return utils.get_uint_dtype(value)
    return utils.get_int_dtype(value)


def _mask_process(data, value):
    if data is None or "values" not in data:
        return data
    index = utils.get_index(data["values"], data["no_data_value"])
    fillvalue = 1 if value == 0 else 0
    dtype = _mask_dtype_from_value(value)
    values = np.full_like(data["values"], fillvalue, dtype=dtype)
    values[index] = value
    return {"values": values, "no_data_value": fillvalue}


def _mask_jax(data, value):
    import jax.numpy as jnp

    if data is None or "values" not in data:
        return data
    fillvalue = 1 if value == 0 else 0
    dtype = _mask_dtype_from_value(value)
    arr = data["values"]
    has_data = utils.get_index_jax(arr, data["no_data_value"])
    values = jnp.where(has_data, dtype.type(value), dtype.type(fillvalue))
    return {"values": values, "no_data_value": fillvalue}


_mask_process.jax_impl = _mask_jax


def _mask_out_range(data, value):
    if isinstance(value, float):
        return None  # float32 output: not packable
    return (min(value, 1 if value == 0 else 0), max(value, 1 if value == 0 else 0))


_mask_process.jax_out_range = _mask_out_range


class Mask(BaseSingle):
    """Replace data values with a constant; nodata is preserved."""

    def __init__(self, store, value):
        expect_instance(value, (float, int), "value")
        super().__init__(store, value)

    value = arg(1)

    @property
    def fillvalue(self):
        return 1 if self.value == 0 else 0

    @property
    def dtype(self):
        return _mask_dtype_from_value(self.value)

    def out_value_set(self):
        # data cells all become `value`, nodata cells the fill — exactly
        # two possible outputs whatever the store holds (float included)
        return {self.value, self.fillvalue}

    process = staticmethod(_mask_process)


def _mask_below_process(data, value):
    if data is None or "values" not in data:
        return data
    values, no_data_value = data["values"].copy(), data["no_data_value"]
    values[values < value] = no_data_value
    return {"values": values, "no_data_value": no_data_value}


def _mask_below_jax(data, value):
    import jax.numpy as jnp

    if data is None or "values" not in data:
        return data
    values = data["values"]
    no_data_value = data["no_data_value"]
    values = jnp.where(values < value, np.dtype(values.dtype).type(no_data_value), values)
    return {"values": values, "no_data_value": no_data_value}


_mask_below_process.jax_impl = _mask_below_jax
_mask_below_process.jax_f64_sensitive = True  # threshold comparison


class MaskBelow(BaseSingle):
    """Convert cells below a value to 'no data'."""

    def __init__(self, store, value):
        expect_instance(value, (float, int), "value")
        super().__init__(store, value)

    def out_value_set(self):
        child = self.store.out_value_set()
        if child is None:
            return None
        value = self.args[1]
        # below-threshold cells become nodata; the rest pass through
        return {v for v in child if not v < value} | {self.fillvalue}

    process = staticmethod(_mask_below_process)


def _step_process(data, left, right, location, at):
    """Three-way threshold as a where-ladder (the same shape as the jax
    twin below); nodata cells are re-stamped last so a sentinel that
    happens to compare against ``location`` cannot leak through.
    Behavior matches the reference Step (dask_geomodeling/raster/misc.py)."""
    if data is None or "values" not in data:
        return data
    values = data["values"]
    fill = data["no_data_value"]
    dtype = values.dtype
    out = np.where(values < location, dtype.type(left), values)
    out = np.where(values == location, dtype.type(at), out)
    out = np.where(values > location, dtype.type(right), out)
    out = np.where(values == fill, dtype.type(fill), out)
    return {"values": out, "no_data_value": fill}


def _step_jax(data, left, right, location, at):
    import jax.numpy as jnp

    if data is None or "values" not in data:
        return data
    values = data["values"]
    no_data_value = data["no_data_value"]
    dtype = np.dtype(values.dtype)
    mask = values == no_data_value
    out = jnp.where(values < location, dtype.type(left), values)
    out = jnp.where(values == location, dtype.type(at), out)
    out = jnp.where(values > location, dtype.type(right), out)
    out = jnp.where(mask, dtype.type(no_data_value), out)
    return {"values": out, "no_data_value": no_data_value}


_step_process.jax_impl = _step_jax


def _step_out_range(data, left, right, location, at):
    if any(isinstance(x, float) for x in (left, right, at)):
        return None
    return (min(left, right, at), max(left, right, at))


_step_process.jax_out_range = _step_out_range
_step_process.jax_f64_sensitive = True  # three-way threshold


class Step(BaseSingle):
    """Three-way step function: left if x < value, at if x == value, right
    if x > value."""

    def __init__(self, store, left=0, right=1, value=0, at=None):
        at = (left + right) / 2 if at is None else at
        for x in left, right, value, at:
            expect_instance(x, (float, int), "x")
        super().__init__(store, left, right, value, at)

    left = arg(1)
    right = arg(2)
    value = arg(3)
    at = arg(4)

    def out_value_set(self):
        # every data cell maps to left/at/right; nodata passes through
        # the store's fill (which fillvalue delegates to)
        return {self.left, self.at, self.right, self.fillvalue}

    process = staticmethod(_step_process)


def _classify_process(data, bins, right):
    if data is None or "values" not in data:
        return data
    values = data["values"]
    dtype = utils.get_uint_dtype(len(bins) + 2)
    fillvalue = utils.get_dtype_max(dtype)
    result_values = np.digitize(values, bins, right).astype(dtype)
    result_values[values == data["no_data_value"]] = fillvalue
    return {"values": result_values, "no_data_value": fillvalue}


def _classify_jax(data, bins, right):
    import jax.numpy as jnp

    if data is None or "values" not in data:
        return data
    values = data["values"]
    dtype = utils.get_uint_dtype(len(bins) + 2)
    fillvalue = utils.get_dtype_max(dtype)
    bins_arr = jnp.asarray(bins)
    side = "left" if right else "right"  # np.digitize(right=False) == 'right'
    result = jnp.searchsorted(bins_arr, values, side=side).astype(dtype)
    result = jnp.where(values == data["no_data_value"], dtype.type(fillvalue), result)
    return {"values": result, "no_data_value": fillvalue}


_classify_process.jax_impl = _classify_jax
# every non-nodata output is a bin index in [0, len(bins)] — lets the
# tile runtime pack the fetch (runtime/fetchcodec.py)
_classify_process.jax_out_range = lambda data, bins, right: (0, len(bins))
# discrete output: emulated f64 on real chips can flip bin-edge cells
# (guarded host-side by default, geomodeling.device-f64-discrete)
_classify_process.jax_f64_sensitive = True


class Classify(BaseSingle):
    """Classify values into bins given by increasing edges; the output is
    the bin index (0 = below the first edge)."""

    def __init__(self, store, bins, right=False):
        expect_instance(store, RasterBlock, "store")
        if not hasattr(bins, "__iter__"):
            raise TypeError(
                "bins must be an iterable of edges, got '%s'"
                % type(bins).__name__
            )
        edges = np.asarray(bins)
        for ok, message in (
            (edges.ndim == 1, "'bins' should be one-dimensional"),
            (np.issubdtype(edges.dtype, np.number), "'bins' should be numeric"),
        ):
            if not ok:
                raise TypeError(message)
        steps = np.diff(edges)
        if np.all(steps < 0) or not np.all(steps > 0):
            raise TypeError("'bins' should be monotonic")
        super().__init__(store, edges.tolist(), right)

    bins = arg(1)
    right = arg(2)

    @property
    def dtype(self):
        return utils.get_uint_dtype(len(self.bins) + 2)

    def out_value_set(self):
        if len(self.bins) > 255:
            return None  # more symbols than any packed codec could use
        return set(range(len(self.bins) + 1)) | {self.fillvalue}

    @property
    def fillvalue(self):
        return utils.get_dtype_max(self.dtype)

    process = staticmethod(_classify_process)


def _reclassify_table(data):
    source, target = zip(*data)
    return np.asarray(source), np.asarray(target)


def _reclassify_lookup(process_kwargs, no_data_value):
    """Sorted (source, target) lookup arrays, with the store's nodata
    sentinel mapped onto the output fill; shared by both twins."""
    source, target = _reclassify_table(process_kwargs["data"])
    if no_data_value is not None and no_data_value not in source:
        source = np.append(source, no_data_value)
        target = np.append(target, process_kwargs["fillvalue"])
    order = np.argsort(source)
    return source[order], target[order]


def _reclassify_process(store_data, process_kwargs):
    """Table lookup: searchsorted into the sorted source alphabet, then a
    hit test (a miss past either end lands on a non-equal slot).  Missed
    cells keep their value, or become the fill when ``select``.  Behavior
    matches the reference Reclassify (dask_geomodeling/raster/misc.py)."""
    if store_data is None or "values" not in store_data:
        return store_data
    values = store_data["values"]
    dtype = np.dtype(process_kwargs["dtype"])
    fill = process_kwargs["fillvalue"]
    source, target = _reclassify_lookup(
        process_kwargs, store_data["no_data_value"]
    )

    slots = np.minimum(np.searchsorted(source, values), len(source) - 1)
    hit = source[slots] == values
    base = (
        np.full(values.shape, fill, dtype)
        if process_kwargs["select"]
        else values.astype(dtype)
    )
    result = np.where(hit, target[slots].astype(dtype), base)
    return {"values": result, "no_data_value": fill}


def _reclassify_jax(store_data, process_kwargs):
    import jax.numpy as jnp

    if store_data is None or "values" not in store_data:
        return store_data

    values = store_data["values"]
    dtype = np.dtype(process_kwargs["dtype"])
    fillvalue = process_kwargs["fillvalue"]
    source, target = _reclassify_lookup(
        process_kwargs, store_data["no_data_value"]
    )
    source = jnp.asarray(source)
    target = jnp.asarray(target.astype(dtype))

    if process_kwargs["select"]:
        base = jnp.full(values.shape, fillvalue, dtype=dtype)
    else:
        base = values.astype(dtype)

    idx = jnp.searchsorted(source, values)
    idx_clipped = jnp.clip(idx, 0, len(source) - 1 if len(source) else 0)
    matched = source[idx_clipped] == values
    result = jnp.where(matched, target[idx_clipped], base)
    return {"values": result, "no_data_value": fillvalue}


_reclassify_process.jax_impl = _reclassify_jax
_reclassify_process.jax_f64_sensitive = True  # exact-match table lookup


def _reclassify_out_range(store_data, process_kwargs):
    # bounded only with select=True: otherwise unmapped source values
    # pass through and the output range is the store's, unknown here
    if not process_kwargs["select"]:
        return None
    targets = [t for _, t in process_kwargs["data"]]
    if any(isinstance(t, float) and not float(t).is_integer() for t in targets):
        return None
    return (int(min(targets)), int(max(targets)))


def _reclassify_out_values(store_data, process_kwargs):
    # the exact discrete output alphabet (select=True): the fetch codec
    # packs sparse target lists by count, not by value span
    if _reclassify_out_range(store_data, process_kwargs) is None:
        return None
    return sorted({int(t) for _, t in process_kwargs["data"]})


_reclassify_process.jax_out_range = _reclassify_out_range
_reclassify_process.jax_out_values = _reclassify_out_values


class Reclassify(BaseSingle):
    """Reclassify integer/boolean rasters via [from, to] pairs; with
    ``select`` unmapped cells become nodata."""

    def __init__(self, store, data, select=False):
        dtype = store.dtype
        if dtype != bool and not np.issubdtype(dtype, np.integer):
            raise TypeError("The store must be of boolean or integer datatype")

        if not hasattr(data, "__iter__"):
            raise TypeError(
                "data must be an iterable of [from, to] pairs, got '%s'"
                % type(data).__name__
            )
        try:
            source, target = _reclassify_table(data)
        except ValueError:
            raise ValueError("Please supply a list of [from, to] values")
        if source.dtype != bool and not np.issubdtype(source.dtype, np.integer):
            raise TypeError(
                "Cannot reclassify from value with type '{}'".format(source.dtype)
            )
        if len(np.unique(source)) != len(source):
            raise ValueError("There are duplicates in the reclassify values")
        if not np.issubdtype(target.dtype, np.number):
            raise TypeError(
                "Cannot reclassify to value with type '{}'".format(target.dtype)
            )
        data = [list(x) for x in zip(source.tolist(), target.tolist())]

        if select is not True and select is not False:
            raise TypeError(
                "select must be a bool, got '%s'" % type(select).__name__
            )
        super().__init__(store, data, select)

    data = arg(1)
    select = arg(2)

    @property
    def dtype(self):
        _, target = _reclassify_table(self.data)
        return target.dtype

    @property
    def fillvalue(self):
        return utils.get_dtype_max(self.dtype)

    def out_value_set(self):
        source, target = zip(*self.data)
        if self.select:
            # unmapped cells become nodata: the alphabet is the targets
            return set(target) | {self.fillvalue}
        # without select, unmapped store values pass through — bounded
        # only when the store's own alphabet is (e.g. a Classify chain)
        child = self.store.out_value_set()
        if child is None:
            return None
        mapping = dict(zip(source, target))
        child_fill = self.store.fillvalue
        out = {self.fillvalue}
        for v in child:
            if v in mapping:
                out.add(mapping[v])
            elif child_fill is not None and v == child_fill:
                out.add(self.fillvalue)  # nodata maps onto the new fill
            else:
                out.add(v)
        return out

    def get_sources_and_requests(self, **request):
        process_kwargs = {
            "dtype": self.dtype.str,
            "fillvalue": self.fillvalue,
            "data": self.data,
            "select": self.select,
        }
        return [(self.store, request), (process_kwargs, None)]

    process = staticmethod(_reclassify_process)


class _GeometryRaster(RasterBlock):
    """Base for rasters burned from vector data: static in time, with no
    intrinsic grid, projection, or extent of their own."""

    @property
    def period(self):
        return (self.DEFAULT_ORIGIN,) * 2

    extent = None
    timedelta = None
    temporal = False
    geometry = None
    projection = None
    geo_transform = None

    @staticmethod
    def _static_answer(mode, instant):
        """The time/meta response of a single static frame."""
        if mode == "time":
            return {"time": [instant]}
        return {"meta": [None]}


class Rasterize(_GeometryRaster):
    """Rasterize a GeometryBlock, burning values from ``column_name`` (or a
    boolean presence raster when no column is given)."""

    def __init__(self, source, column_name=None, dtype=None, limit=None):
        from dask_geomodeling_tpu.geometry.base import GeometryBlock

        expect_instance(source, GeometryBlock, "source")
        if column_name is not None:
            expect_instance(column_name, str, "column_name")
        if dtype is None:
            dtype = "bool" if column_name is None else "int32"
        else:
            dtype = str(np.dtype(dtype))
        if limit:
            expect_instance(limit, int, "limit")
        if limit and limit < 1:
            raise ValueError("Limit should be greater than 1")
        super().__init__(source, column_name, dtype, limit)

    source = arg(0)
    column_name = arg(1)
    limit = arg(3)

    @property
    def dtype(self):
        return np.dtype(self.args[2])

    @property
    def fillvalue(self):
        return None if self.dtype == bool else utils.get_dtype_max(self.dtype)

    @staticmethod
    def _cell_floor(bbox, width, height):
        """The smallest cell edge of the target grid; None for points."""
        x1, y1, x2, y2 = bbox
        if x2 == x1 and y2 == y1:
            return None
        if not (x1 < x2 and y1 < y2):
            raise ValueError("Invalid bbox ({})".format(bbox))
        return min((x2 - x1) / width, (y2 - y1) / height)

    def get_sources_and_requests(self, **request):
        mode = request["mode"]
        if mode in ("time", "meta"):
            instant = self.period[-1] if mode == "time" else None
            return [(instant, None), ({"mode": mode}, None)]
        if mode != "vals":
            raise ValueError("Unknown mode '{}'".format(mode))

        width, height = request["width"], request["height"]
        geom_request = {
            "mode": "intersects",
            "geometry": box(*request["bbox"]),
            "projection": request["projection"],
            "min_size": self._cell_floor(request["bbox"], width, height),
            "limit": self.limit
            if self.limit is not None
            else config.get("geomodeling.geometry-limit"),
            "start": request.get("start"),
            "stop": request.get("stop"),
        }
        burn_kwargs = {
            "mode": "vals",
            "column_name": self.column_name,
            "dtype": self.dtype,
            "no_data_value": self.fillvalue,
            "width": width,
            "height": height,
            "bbox": request["bbox"],
        }
        return [(self.source, geom_request), (burn_kwargs, None)]

    @staticmethod
    def _burn_values(features, column_name):
        """The per-feature burn values, None (presence mask), or False
        (missing column)."""
        if column_name is None:
            return None
        if column_name in features:
            return features[column_name]
        if features.index.name == column_name:
            return features.index.to_series()
        return False

    @staticmethod
    def process(data, burn_kwargs):
        mode = burn_kwargs["mode"]
        if mode in ("time", "meta"):
            return _GeometryRaster._static_answer(mode, data)

        dtype = burn_kwargs["dtype"]
        fill = burn_kwargs["no_data_value"]
        shape = (1, burn_kwargs["height"], burn_kwargs["width"])
        features = data["features"]
        burn = Rasterize._burn_values(features, burn_kwargs["column_name"])
        if len(features) == 0 or burn is False:
            return {
                "values": np.full(shape, fill, dtype=dtype),
                "no_data_value": fill,
            }

        burned = utils.rasterize_geoseries(
            geoseries=features["geometry"] if "geometry" in features else None,
            values=burn,
            bbox=burn_kwargs["bbox"],
            projection=data["projection"],
            height=shape[1],
            width=shape[2],
        )
        raw = burned["values"]
        with np.errstate(over="ignore", under="ignore"):
            values = raw.astype(dtype)
        if burned["no_data_value"] != fill:
            values[raw == burned["no_data_value"]] = fill
        return {"values": values, "no_data_value": fill}


class RasterizeWKT(_GeometryRaster):
    """Rasterize a single WKT geometry into a boolean mask."""

    def __init__(self, wkt, projection):
        expect_instance(wkt, str, "wkt")
        expect_instance(projection, str, "projection")
        try:
            utils.shapely_from_wkt(wkt)
        except utils.WKTReadingError:
            raise ValueError("The provided geometry is not a valid WKT")
        try:
            utils.get_sr(projection)
        except (TypeError, utils.TransformException):
            raise ValueError("The provided projection is not valid")
        super().__init__(wkt, projection)

    wkt = arg(0)
    projection = arg(1)
    dtype = np.dtype("bool")
    fillvalue = None

    @property
    def extent(self):
        return tuple(
            utils.shapely_transform(
                utils.shapely_from_wkt(self.wkt), self.projection, "EPSG:4326"
            ).bounds
        )

    @property
    def geometry(self):
        geom = utils.shapely_from_wkt(self.wkt)
        geom.srs = self.projection
        return geom

    def get_sources_and_requests(self, **request):
        mode = request["mode"]
        if mode not in ("time", "meta", "vals"):
            raise ValueError("Unknown mode '{}'".format(mode))
        if mode == "vals":
            data = {"wkt": self.wkt, "projection": self.projection}
        else:
            data = self.period[-1] if mode == "time" else None
        return [(data, None), (request, None)]

    @staticmethod
    def process(data, request):
        mode = request["mode"]
        if mode in ("time", "meta"):
            return _GeometryRaster._static_answer(mode, data)

        geometry = utils.shapely_from_wkt(data["wkt"])
        if data["projection"] != request["projection"]:
            geometry = utils.shapely_transform(
                geometry, data["projection"], request["projection"]
            )

        x1, y1, x2, y2 = request["bbox"]
        probe = Point(x1, y1) if (x1 == x2 and y1 == y2) else box(x1, y1, x2, y2)
        if not geometry.intersects(probe):
            empty = np.full(
                (1, request["height"], request["width"]), False, dtype=bool
            )
            return {"values": empty, "no_data_value": None}

        return utils.rasterize_geoseries(
            geoseries=GeoSeries([geometry]) if not geometry.is_empty else None,
            bbox=request["bbox"],
            projection=request["projection"],
            height=request["height"],
            width=request["width"],
        )


def _rasterize_wkt_jax_capable(data, request):
    from dask_geomodeling_tpu.geo.geometry import MultiPolygon, Polygon

    if not isinstance(request, dict) or request.get("mode") != "vals":
        return False
    x1, y1, x2, y2 = request["bbox"]
    if x1 == x2 or y1 == y2:
        return False  # point request: host path
    geometry = utils.shapely_from_wkt(data["wkt"])
    if geometry.is_empty or not isinstance(geometry, (Polygon, MultiPolygon)):
        return False
    # the (E, h, w) crossing tensor must stay small enough to fuse
    n_vertices = sum(
        sum(len(ring) for ring in polygon._rings())
        for polygon in getattr(geometry, "geoms", [geometry])
    )
    return n_vertices <= 2048


def _rasterize_wkt_jax(data, request):
    """Device twin of RasterizeWKT.process: even-odd crossing-number test
    at pixel centers, identical parity conventions to the host scanline
    (geo/rasterize.py:30-63).  The geometry is static; the bbox traces."""
    import jax.numpy as jnp

    geometry = utils.shapely_from_wkt(data["wkt"])
    if data["projection"] != request["projection"]:
        geometry = utils.shapely_transform(
            geometry, data["projection"], request["projection"]
        )

    starts, ends = [], []
    for polygon in getattr(geometry, "geoms", [geometry]):
        for ring in polygon._rings():
            ring = np.asarray(ring, dtype=np.float64)
            starts.append(ring[:-1])
            ends.append(ring[1:])
    starts = np.concatenate(starts, axis=0)
    ends = np.concatenate(ends, axis=0)

    width, height = request["width"], request["height"]
    bbox = jnp.asarray(request["bbox"], jnp.float64)
    x1, y1, x2, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
    x_centers = x1 + (jnp.arange(width) + 0.5) * (x2 - x1) / width
    y_centers = y2 - (jnp.arange(height) + 0.5) * (y2 - y1) / height

    ax = starts[:, 0][:, None]  # (E, 1)
    ay = starts[:, 1][:, None]
    bx = ends[:, 0][:, None]
    by = ends[:, 1][:, None]
    crosses_row = (ay > y_centers) != (by > y_centers)  # (E, h)
    denom = np.where(ends[:, 1] == starts[:, 1], 1.0, ends[:, 1] - starts[:, 1])
    xint = ax + (y_centers - ay) * (bx - ax) / denom[:, None]  # (E, h)
    # pixel inside iff the count of strictly-greater crossings is odd
    crossings = (
        crosses_row[:, :, None] & (xint[:, :, None] > x_centers[None, None, :])
    )
    inside = (jnp.sum(crossings, axis=0) % 2).astype(bool)
    return {"values": inside[None], "no_data_value": None}


RasterizeWKT.process.jax_impl = _rasterize_wkt_jax
RasterizeWKT.process.jax_capable = _rasterize_wkt_jax_capable
RasterizeWKT.process.jax_dynamic = {"bbox"}
