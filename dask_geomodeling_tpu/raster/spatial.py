"""Spatial raster blocks: Dilate, Smooth, MovingMax, HillShade, Place.

Semantics match the reference (dask_geomodeling/raster/spatial.py): stencils
declare a static halo and expand their source request by it
(``expand_request_pixels`` / ``expand_request_meters``), compute on the
over-fetched array and slice the margins off.  On a single device the
over-fetch is the halo strategy; the sharded runtime exchanges halos between
neighbour tiles with collectives instead (parallel/halo.py).

Each stencil process carries a ``jax_impl`` twin built on the kernels in
ops/stencils.py so whole stencil pipelines fuse into one XLA program.
"""
import math

import numpy as np
from scipy import ndimage

from dask_geomodeling_tpu.geo import (
    Extent,
    get_dtype_min,
    get_footprint,
    get_index,
    get_sr,
    shapely_transform,
)
from dask_geomodeling_tpu.geo.geometry import Point, box
from dask_geomodeling_tpu.raster.base import BaseSingle, RasterBlock
from dask_geomodeling_tpu.raster.reduction import check_statistic, reduce_rasters
from dask_geomodeling_tpu.core import arg
from dask_geomodeling_tpu.core.validate import expect_instance

__all__ = ["Dilate", "Smooth", "MovingMax", "HillShade", "Place"]


def expand_request_pixels(request, radius=1):
    """A copy of a vals request grown by ``radius`` pixels on every side.

    Returns None for non-vals requests and for degenerate (point) bboxes,
    which have no pixel size to grow by.
    """
    if request["mode"] != "vals":
        return None
    x1, y1, x2, y2 = request["bbox"]
    if x2 == x1 or y2 == y1:
        return None
    dx = (x2 - x1) / request["width"] * radius
    dy = (y2 - y1) / request["height"] * radius
    grown = dict(request)
    grown["bbox"] = (x1 - dx, y1 - dy, x2 + dx, y2 + dy)
    grown["width"] = request["width"] + 2 * radius
    grown["height"] = request["height"] + 2 * radius
    return grown


def expand_request_meters(request, radius_m=1):
    """A copy of a vals request grown by ``radius_m`` meters on every side,
    snapped outward to a whole number of pixels.

    Returns ``(grown_request, radius_px)`` with ``radius_px`` the unsnapped
    (y, x) radius expressed in pixels — the kernel builders consume that.
    """
    sr = get_sr(request["projection"])
    geographic = sr.IsGeographic()
    bbox = request["bbox"]
    if geographic:
        # grow in the web-mercator frame so "meters" means meters
        bbox = Extent(bbox, request["projection"]).transformed("EPSG:3857").bbox
    x1, y1, x2, y2 = bbox

    span_y, span_x = y2 - y1, x2 - x1
    if span_y > 0 and span_x > 0:
        # pixel density (px per meter) along each axis
        density = (request["height"] / span_y, request["width"] / span_x)
        radius_px = [radius_m * d for d in density]
        snap_px = [int(round(r)) for r in radius_px]
        snap_m = [px / d for px, d in zip(snap_px, density)]
    else:
        radius_px = snap_px = [Smooth.MARGIN_THRESHOLD] * 2
        snap_m = [radius_m] * 2

    grown = dict(request)
    grown["bbox"] = (x1 - snap_m[1], y1 - snap_m[0], x2 + snap_m[1], y2 + snap_m[0])
    if geographic:
        grown["bbox"] = (
            Extent(grown["bbox"], "EPSG:3857")
            .transformed(request["projection"])
            .bbox
        )
    grown["height"] = request["height"] + 2 * snap_px[0]
    grown["width"] = request["width"] + 2 * snap_px[1]
    return grown, radius_px


def _dilate_process(data, values=None):
    if data is None or values is None or "values" not in data:
        return data
    original = data["values"]
    dilated = original.copy()
    for value in np.asarray(values, dtype=original.dtype):
        dilated[ndimage.binary_dilation(original == value)] = value
    dilated = dilated[:, 1:-1, 1:-1]
    return {"values": dilated, "no_data_value": data["no_data_value"]}


def _dilate_jax(data, values=None):
    import jax.numpy as jnp

    from dask_geomodeling_tpu.ops.stencils import binary_dilation_jax

    if data is None or values is None or "values" not in data:
        return data
    original = data["values"]
    dilated = original
    for value in np.asarray(values, dtype=np.dtype(original.dtype)):
        # rank3: scipy's default structure on the (b, h, w) host array
        # dilates across the band axis as well
        grown = binary_dilation_jax(original == value, connectivity=1,
                                    rank3=True)
        dilated = jnp.where(grown, value, dilated)
    dilated = dilated[:, 1:-1, 1:-1]
    return {"values": dilated, "no_data_value": data["no_data_value"]}


_dilate_process.jax_impl = _dilate_jax


class Dilate(BaseSingle):
    """Dilate cells with the given values by one cell in each (non-diagonal)
    direction, in the order of the values list."""

    def __init__(self, store, values):
        values = np.asarray(values, dtype=store.dtype)
        super().__init__(store, values.tolist())

    values = arg(1)

    def get_sources_and_requests(self, **request):
        new_request = expand_request_pixels(request, radius=1)
        if new_request is None:
            return [(self.store, request)]
        return [(self.store, new_request), (self.values, None)]

    def out_value_set(self):
        # dilation only spreads existing values into neighbours
        child = self.store.out_value_set()
        if child is None:
            return None
        return child | set(self.values) | {self.fillvalue}

    process = staticmethod(_dilate_process)


def _crop_margin(values, radius):
    """Drop the halo pixels the request expansion added (bands stay whole);
    shared by the host and device moving-max twins."""
    return values[:, radius:-radius, radius:-radius]


def _moving_max_process(data, size=None):
    """Circular-footprint max filter.  Nodata cells participate as the
    dtype minimum so any real neighbour wins; a cell stays nodata only
    where it was nodata AND no data reached it.  Behavior matches the
    reference MovingMax (dask_geomodeling/raster/spatial.py)."""
    if data is None or size is None or "values" not in data:
        return data
    values = data["values"]
    fill = data["no_data_value"]
    floor = values.dtype.type(get_dtype_min(values.dtype))
    gaps = values == fill

    peaks = ndimage.maximum_filter(
        np.where(gaps, floor, values), footprint=get_footprint(size)[None]
    )
    unreached = gaps & (peaks == floor)
    if unreached.any():
        peaks[unreached] = fill
    return {
        "values": _crop_margin(peaks, int(size // 2)),
        "no_data_value": fill,
    }


def _moving_max_jax(data, size=None):
    import jax.numpy as jnp

    from dask_geomodeling_tpu.ops.stencils import moving_max_jax

    if data is None or size is None or "values" not in data:
        return data
    radius = int(size // 2)
    values = data["values"]
    dtype = np.dtype(values.dtype)
    minimum = get_dtype_min(dtype)
    no_data_mask = values == data["no_data_value"]
    array = jnp.where(no_data_mask, dtype.type(minimum), values)

    filtered = moving_max_jax(array, size)
    filtered = jnp.where(
        (filtered == minimum) & no_data_mask,
        dtype.type(data["no_data_value"]),
        filtered,
    )
    return {
        "values": _crop_margin(filtered, radius),
        "no_data_value": data["no_data_value"],
    }


_moving_max_process.jax_impl = _moving_max_jax


class MovingMax(BaseSingle):
    """Circular-footprint spatial maximum filter (for sparse-data display)."""

    def __init__(self, store, size):
        size = int(2 * round((size - 1) / 2) + 1)
        if size < 3:
            raise ValueError("The size should be odd and larger than 1")
        super().__init__(store, size)

    size = arg(1)

    def get_sources_and_requests(self, **request):
        size = self.size
        new_request = expand_request_pixels(request, radius=int(size // 2))
        if new_request is None:
            return [(self.store, request)]
        return [(self.store, new_request), (size, None)]

    def out_value_set(self):
        # a maximum filter only ever picks values the store already holds
        child = self.store.out_value_set()
        if child is None:
            return None
        return child | {self.fillvalue}

    process = staticmethod(_moving_max_process)


def _smooth_process(data, process_kwargs=None):
    """Gaussian blur with sigma = size/3 per axis, nodata cells first
    replaced by the constant ``fill``.  "exact" mode crops the expanded
    margin afterwards; "zoom" mode resamples the blurred array back onto
    the request grid (order-0).  Behavior matches the reference Smooth
    (dask_geomodeling/raster/spatial.py)."""
    if data is None or process_kwargs is None:
        return data
    size_y, size_x = process_kwargs["size"]
    fill = process_kwargs["fill"]
    frame = data["values"]
    blurred = np.where(
        frame == data["no_data_value"], frame.dtype.type(fill), frame
    )
    ndimage.gaussian_filter(
        blurred,
        (0, size_y / 3, size_x / 3),
        output=blurred,
        mode="constant",
        cval=fill,
    )

    if process_kwargs["smooth_mode"] == "exact":
        my, mx = int(round(size_y)), int(round(size_x))
        blurred = blurred[
            :, my : blurred.shape[1] - my, mx : blurred.shape[2] - mx
        ]
    else:
        _, ny, nx = blurred.shape
        blurred = ndimage.affine_transform(
            blurred,
            order=0,
            matrix=np.diag([1, 1 - 2 * size_y / ny, 1 - 2 * size_x / nx]),
            offset=[0, size_y, size_x],
        )

    return {"values": blurred, "no_data_value": data["no_data_value"]}


def _smooth_jax(data, process_kwargs=None):
    import jax.numpy as jnp

    from dask_geomodeling_tpu.ops.stencils import gaussian_blur_jax

    if data is None or process_kwargs is None:
        return data
    smooth_mode = process_kwargs["smooth_mode"]
    size_px = process_kwargs["size"]
    fill = process_kwargs["fill"]

    values = data["values"]
    dtype = np.dtype(values.dtype)
    no_data_value = data["no_data_value"]
    values = jnp.where(values == no_data_value, dtype.type(fill), values)

    blurred = gaussian_blur_jax(values, size_px[0] / 3, size_px[1] / 3, fill)
    blurred = blurred.astype(dtype)

    if smooth_mode == "exact":
        my, mx = [int(round(s)) for s in size_px]
        blurred = blurred[
            :, my : blurred.shape[1] - my, mx : blurred.shape[2] - mx
        ]
    else:
        # nearest-neighbour zoom back to the original shape (order 0)
        _, ny, nx = blurred.shape
        zy, zx = 1 - 2 * size_px[0] / ny, 1 - 2 * size_px[1] / nx
        rows = (jnp.arange(ny) * zy + size_px[0] + 0.5).astype(jnp.int32)
        cols = (jnp.arange(nx) * zx + size_px[1] + 0.5).astype(jnp.int32)
        rows = jnp.clip(rows, 0, ny - 1)
        cols = jnp.clip(cols, 0, nx - 1)
        blurred = blurred[:, rows, :][:, :, cols]

    return {"values": blurred, "no_data_value": no_data_value}


_smooth_process.jax_impl = _smooth_jax


class Smooth(BaseSingle):
    """Gaussian smoothing with an extent given in meters (sigma = size/3).

    Above MARGIN_THRESHOLD pixels of margin the computation switches to a
    zoomed (downsampled) mode, like the reference (raster/spatial.py:235).
    """

    MARGIN_THRESHOLD = 6

    def __init__(self, store, size, fill=0):
        for x in (size, fill):
            expect_instance(x, (int, float), "x")
        super().__init__(store, size, fill)

    size = arg(1)
    fill = arg(2)

    def get_sources_and_requests(self, **request):
        if request["mode"] != "vals":
            return [(self.store, request)]

        grown, size = expand_request_meters(request, self.size)

        zoomed = any(s > self.MARGIN_THRESHOLD for s in size)
        if zoomed:
            # big margins: fetch downsampled at the request's own pixel
            # count; sigma shrinks by the per-axis zoom factor
            for px, axis in enumerate(("height", "width")):
                size[px] *= request[axis] / grown[axis]
                grown[axis] = request[axis]

        plan = {
            "smooth_mode": "zoom" if zoomed else "exact",
            "fill": self.fill,
            "size": size,
        }
        return [(self.store, grown), (plan, None)]

    process = staticmethod(_smooth_process)


def _hillshade_math(array, resolution, altitude, azimuth, xp):
    """Shared hillshade math (GDAL-dem style 3x3 gradient + illumination)."""
    xres, yres = resolution
    alt = math.radians(altitude)
    az = math.radians(azimuth)
    zsf = 1.0 / 8.0
    square_zsf = zsf * zsf

    a = array
    s0 = a[:, :-2, :-2]
    s1 = a[:, :-2, 1:-1]
    s2 = a[:, :-2, 2:]
    s3 = a[:, 1:-1, :-2]
    s5 = a[:, 1:-1, 2:]
    s6 = a[:, 2:, :-2]
    s7 = a[:, 2:, 1:-1]
    s8 = a[:, 2:, 2:]

    y = (s0 + 2 * s1 + s2 - s6 - 2 * s7 - s8) / yres
    x = (s0 + 2 * s3 + s6 - s2 - 2 * s5 - s8) / xres

    xx_plus_yy = x * x + y * y
    aspect = xp.arctan2(y, x)
    cang = (
        math.sin(alt)
        - math.cos(alt) * zsf * xp.sqrt(xx_plus_yy) * xp.sin(aspect - az)
    ) / xp.sqrt(1 + square_zsf * xx_plus_yy)
    return cang


def _hillshade_process(data, process_kwargs=None):
    if process_kwargs is None:
        return data

    array = data["values"].copy().astype("f4")
    array[data["values"] == data["no_data_value"]] = process_kwargs["fill"]

    with np.errstate(all="ignore"):
        cang = _hillshade_math(
            array,
            process_kwargs["resolution"],
            process_kwargs["altitude"],
            process_kwargs["azimuth"],
            np,
        )
    result = np.where(cang <= 0, 0, 255 * cang).astype("u1")
    return {"values": result, "no_data_value": 256}


def _hillshade_jax(data, process_kwargs=None):
    import jax.numpy as jnp

    if process_kwargs is None:
        return data

    values = data["values"]
    array = jnp.where(
        values == data["no_data_value"],
        jnp.float32(process_kwargs["fill"]),
        values.astype(jnp.float32),
    )
    cang = _hillshade_math(
        array,
        process_kwargs["resolution"],
        process_kwargs["altitude"],
        process_kwargs["azimuth"],
        jnp,
    )
    result = jnp.where(cang <= 0, 0, 255 * cang).astype("uint8")
    return {"values": result, "no_data_value": 256}


_hillshade_process.jax_impl = _hillshade_jax


class HillShade(BaseSingle):
    """GDAL-dem style hillshade; uint8 output with fillvalue 256."""

    def __init__(self, store, altitude=45, azimuth=315, fill=0):
        for x in (altitude, azimuth, fill):
            expect_instance(x, (int, float), "x")
        super().__init__(store, float(altitude), float(azimuth), fill)

    altitude = arg(1)
    azimuth = arg(2)
    fill = arg(3)

    @property
    def dtype(self):
        return np.dtype("u1")

    @property
    def fillvalue(self):
        return 256  # intentionally not representable in uint8

    process = staticmethod(_hillshade_process)

    def get_sources_and_requests(self, **request):
        grown = expand_request_pixels(request, radius=1)
        if grown is None:
            return [(self.store, request)]

        x1, y1, x2, y2 = request["bbox"]
        plan = {
            "resolution": (
                (x2 - x1) / request["width"],
                (y2 - y1) / request["height"],
            ),
            "altitude": self.altitude,
            "azimuth": self.azimuth,
            "fill": self.fill,
        }
        return [(self.store, grown), (plan, None)]


class Place(BaseSingle):
    """Place the source raster at each of the given coordinates, merging
    overlaps with a statistic.

    Args:
      store (RasterBlock): raster to place
      place_projection (str): projection of anchor and coordinates
      anchor (2 numbers): the point in the source placed at each coordinate
      coordinates (list of (x, y)): target positions
      statistic (str): overlap merge statistic (see reduction.STATISTICS)
    """

    def __init__(self, store, place_projection, anchor, coordinates, statistic="last"):
        expect_instance(store, RasterBlock, "store")
        try:
            get_sr(place_projection)
        except Exception:
            raise ValueError(
                "'{}' is not a valid projection string".format(place_projection)
            )
        check_statistic(statistic)
        super().__init__(
            store,
            place_projection,
            self._coerce_point(anchor, "anchor"),
            self._coerce_points(coordinates),
            statistic,
        )

    @staticmethod
    def _coerce_point(value, name):
        point = list(value)
        if len(point) != 2:
            raise ValueError("Expected 2 numbers in the '%s' parameter" % name)
        for x in point:
            expect_instance(x, (int, float), "x")
        return point

    @staticmethod
    def _coerce_points(coordinates):
        if coordinates is None or len(coordinates) == 0:
            return []
        coordinates = np.asarray(coordinates, dtype=float)
        if coordinates.ndim != 2 or coordinates.shape[1] != 2:
            raise ValueError(
                "Expected a list of lists of 2 numbers in the "
                "'coordinates' parameter"
            )
        return coordinates.tolist()

    place_projection = arg(1)
    anchor = arg(2)
    coordinates = arg(3)
    statistic = arg(4)

    def out_value_set(self):
        # value-picking merge statistics rearrange store values; the
        # averaging ones (mean/median/...) synthesize new ones
        if self.statistic not in ("last", "first", "min", "max"):
            return None
        from dask_geomodeling_tpu.raster.base import union_value_set

        lift = (
            np.result_type(self.dtype, np.float32)
            if self.statistic in ("min", "max")
            else None  # first/last are pure selections, no float lift
        )
        return union_value_set(
            [self.store], self.dtype, self.fillvalue, lift=lift
        )

    @property
    def projection(self):
        store_projection = self.store.projection
        if store_projection is None:
            return None
        if get_sr(self.place_projection) == get_sr(store_projection):
            return store_projection
        return None

    @property
    def geo_transform(self):
        if self.projection is not None:
            return self.store.geo_transform
        return None

    @property
    def extent(self):
        geometry = self.geometry
        if geometry is None:
            return None
        return Extent.from_geometry(geometry).transformed("EPSG:4326").bbox

    @property
    def geometry(self):
        store_geometry = self.store.geometry
        if store_geometry is None:
            return None
        extent = Extent.from_geometry(store_geometry).transformed(
            self.place_projection
        )
        _x1, _y1, _x2, _y2 = extent.bbox
        p, q = self.anchor
        if not self.coordinates:
            return None
        P, Q = zip(*self.coordinates)
        x1, x2 = _x1 + min(P) - p, _x2 + max(P) - p
        y1, y2 = _y1 + min(Q) - q, _y2 + max(Q) - q
        geom = box(x1, y1, x2, y2)
        geom.srs = extent.srs
        return geom

    def _points_in(self, projection):
        """Anchor and target coordinates transformed to ``projection``."""
        anchor = shapely_transform(
            Point(self.anchor), self.place_projection, projection
        ).coords[0]
        coordinates = [
            shapely_transform(
                Point(coord), self.place_projection, projection
            ).coords[0]
            for coord in self.coordinates
        ]
        return anchor, coordinates

    @staticmethod
    def _warp_mode_plan(request, anchor, coordinates, source_box, cell):
        """One full-extent fetch shifted on the output grid, when that is
        cheaper than per-coordinate requests; None otherwise."""
        xmin, ymin, xmax, ymax = source_box
        size_x, size_y = cell
        full_height = math.ceil((ymax - ymin) / size_y)
        full_width = math.ceil((xmax - xmin) / size_x)
        if full_height * full_width > request["width"] * request["height"]:
            return None
        source_request = dict(
            request,
            width=full_width,
            height=full_height,
            bbox=(
                xmin,
                ymin,
                xmin + full_width * size_x,
                ymin + full_height * size_y,
            ),
        )
        plan = {
            "mode": "warp",
            "anchor": anchor,
            "coordinates": coordinates,
            "src_bbox": source_request["bbox"],
            "dst_bbox": request["bbox"],
            "dst_shape": (request["height"], request["width"]),
            "cellsize": cell,
            "statistic": None,  # filled by the caller
        }
        return plan, source_request

    def get_sources_and_requests(self, **request):
        if request["mode"] != "vals":
            return ({"mode": request["mode"]}, None), (self.store, request)

        anchor, coordinates = self._points_in(request["projection"])

        extent_geometry = self.store.geometry
        if extent_geometry is None:
            return (({"mode": "null"}, None),)
        xmin, ymin, xmax, ymax = (
            Extent.from_geometry(extent_geometry)
            .transformed(request["projection"])
            .bbox
        )

        x1, y1, x2, y2 = request["bbox"]
        size_x = (x2 - x1) / request["width"]
        size_y = (y2 - y1) / request["height"]

        if size_x > 0 and size_y > 0:
            warp = self._warp_mode_plan(
                request,
                anchor,
                coordinates,
                (xmin, ymin, xmax, ymax),
                (size_x, size_y),
            )
            if warp is not None:
                plan, source_request = warp
                plan["statistic"] = self.statistic
                return [(plan, None), (self.store, source_request)]

        # per-coordinate shifted requests ("group" mode)
        sources_and_requests = []
        for _x, _y in coordinates:
            bbox = [
                x1 + anchor[0] - _x,
                y1 + anchor[1] - _y,
                x2 + anchor[0] - _x,
                y2 + anchor[1] - _y,
            ]
            # cells span [xmin, xmax) and (ymin, ymax]
            if bbox[0] >= xmax or bbox[1] > ymax or bbox[2] < xmin or bbox[3] <= ymin:
                continue
            _request = request.copy()
            _request["bbox"] = tuple(bbox)
            sources_and_requests.append((self.store, _request))
        if not sources_and_requests:
            # no coordinate overlaps; a time request provides the band depth
            empty_plan = dict(
                mode="empty",
                dtype=self.dtype,
                fillvalue=self.fillvalue,
                width=request["width"],
                height=request["height"],
                statistic=self.statistic,
            )
            return [
                (empty_plan, None),
                (self.store, dict(request, mode="time")),
            ]
        group_plan = dict(mode="group", statistic=self.statistic)
        return [(group_plan, None)] + sources_and_requests

    @staticmethod
    def process(process_kwargs, *multi):
        mode = process_kwargs["mode"]
        if mode in {"meta", "time"}:
            return multi[0]
        if mode == "null":
            return None
        if mode == "group":
            # shifted copies already arrived as separate frames: just merge
            stack = [frame for frame in multi if frame is not None]
            if not stack:
                return None
            return reduce_rasters(stack, process_kwargs["statistic"])
        if mode == "empty":
            data = multi[0]
            if data is None:
                return None
            return _nodata_raster(
                (
                    len(data["time"]),
                    process_kwargs["height"],
                    process_kwargs["width"],
                ),
                process_kwargs["fillvalue"],
                process_kwargs["dtype"],
            )
        if mode != "warp":
            raise ValueError("Unknown mode '{}'".format(mode))

        data = multi[0]
        if data is None:
            return None
        out_shape, stack = _paste_placements(process_kwargs, data)
        if not stack:
            return _nodata_raster(
                out_shape, data["no_data_value"], data["values"].dtype
            )
        return reduce_rasters(stack, process_kwargs["statistic"])


def _nodata_raster(shape, no_data_value, dtype):
    """An all-nodata raster response of the given shape."""
    return {
        "values": np.full(shape, no_data_value, dtype),
        "no_data_value": no_data_value,
    }


def _paste_placements(process_kwargs, data):
    """Warp-mode placements as whole-rectangle pastes.

    Each coordinate shifts the source block over the destination canvas;
    the overlap rectangle is pasted in bulk (copying source nodata cells
    onto a nodata canvas is a no-op, so this equals the reference's
    sparse data-cell scatter, raster/spatial.py:640-725).  Returns
    ``(out_shape, stack)``; an all-nodata source yields an empty stack so
    the caller's nodata fill preserves the reference's shortcut
    semantics for sum/count.
    """
    no_data_value = data["no_data_value"]
    source = data["values"]
    src_d, src_h, src_w = source.shape

    x1, y1, x2, y2 = process_kwargs["dst_bbox"]
    size_x, size_y = process_kwargs["cellsize"]
    dst_h = round((y2 - y1) / size_y)
    dst_w = round((x2 - x1) / size_x)
    out_shape = (src_d, dst_h, dst_w)

    if not np.any(get_index(source, no_data_value)):
        return out_shape, []

    anchor = process_kwargs["anchor"]
    src_bbox = process_kwargs["src_bbox"]
    anchor_px = (
        (anchor[0] - src_bbox[0]) / size_x,
        (anchor[1] - src_bbox[1]) / size_y,
    )

    stack = []
    for x, y in process_kwargs["coordinates"]:
        di = round((x - x1) / size_x - anchor_px[0])
        dj = round((y - y1) / size_y - anchor_px[1])
        # the row axis counts down from the top of the canvas
        dj = dst_h - src_h - dj

        # overlap rectangle between the shifted source and the canvas
        row0, row1 = max(dj, 0), min(dj + src_h, dst_h)
        col0, col1 = max(di, 0), min(di + src_w, dst_w)
        if row0 >= row1 or col0 >= col1:
            continue
        window = source[:, row0 - dj : row1 - dj, col0 - di : col1 - di]
        if not np.any(get_index(window, no_data_value)):
            # the visible part of this placement is all nodata: skipping it
            # keeps the empty-stack shortcut exact for sum/count, whose
            # reduction treats an all-nodata frame as zero-data, not nodata
            continue
        canvas = np.full(out_shape, no_data_value, source.dtype)
        canvas[:, row0:row1, col0:col1] = window
        stack.append({"values": canvas, "no_data_value": no_data_value})
    return out_shape, stack


def _place_jax_capable(process_kwargs, *rest):
    if not isinstance(process_kwargs, dict):
        return False
    mode = process_kwargs.get("mode")
    if mode == "group":
        return True
    if mode == "warp":
        # an out-of-range placement lowers to an all-nodata frame, which is
        # a reduce no-op for every nodata-skipping statistic — but not for
        # sum/count's zero-fill semantics, so those stay on host
        return process_kwargs["statistic"] not in ("sum", "count")
    return False


def _place_jax(process_kwargs, *multi):
    """Device twin of Place.process for warp and group modes.

    Warp mode pastes the source block once per coordinate with
    ``lax.dynamic_update_slice`` into a halo-padded canvas (so clipped and
    out-of-range placements fall off the cropped border instead of
    clamping), then merges the placements with the nodata-skipping
    statistic. The dst bbox traces; placements shift per tile in one
    cached program."""
    import jax
    import jax.numpy as jnp

    from dask_geomodeling_tpu.raster.reduction import reduce_rasters_jax

    mode = process_kwargs["mode"]
    if mode in {"meta", "time"}:
        return multi[0]
    if mode == "null":
        return None
    if mode == "group":
        stack = [data for data in multi if data is not None]
        if len(stack) == 0:
            return None
        return reduce_rasters_jax(
            stack,
            process_kwargs["statistic"],
            stack[0]["no_data_value"],
            stack[0]["values"].dtype,
        )

    data = multi[0]
    if data is None:
        return None
    ndv = data["no_data_value"]
    source = data["values"]
    dtype = source.dtype
    src_d, src_h, src_w = source.shape
    dst_h, dst_w = process_kwargs["dst_shape"]

    anchor = process_kwargs["anchor"]
    src_bbox = process_kwargs["src_bbox"]
    size_x, size_y = process_kwargs["cellsize"]
    anchor_px = (
        (anchor[0] - src_bbox[0]) / size_x,
        (anchor[1] - src_bbox[1]) / size_y,
    )
    dst_bbox = jnp.asarray(process_kwargs["dst_bbox"], jnp.float64).reshape(-1)
    x1, y1 = dst_bbox[0], dst_bbox[1]

    stack = []
    for x, y in process_kwargs["coordinates"]:
        di = jnp.round((x - x1) / size_x - anchor_px[0]).astype(jnp.int32)
        dj = jnp.round((y - y1) / size_y - anchor_px[1]).astype(jnp.int32)
        dj = dst_h - src_h - dj
        # clip into the halo so fully-out placements crop away entirely
        di = jnp.clip(di, -src_w, dst_w)
        dj = jnp.clip(dj, -src_h, dst_h)
        canvas = jnp.full(
            (src_d, dst_h + 2 * src_h, dst_w + 2 * src_w), ndv, dtype
        )
        canvas = jax.lax.dynamic_update_slice(
            canvas, source, (jnp.int32(0), dj + src_h, di + src_w)
        )
        placed = canvas[:, src_h : src_h + dst_h, src_w : src_w + dst_w]
        stack.append({"values": placed, "no_data_value": ndv})

    if len(stack) == 0:
        return {
            "values": jnp.full((src_d, dst_h, dst_w), ndv, dtype),
            "no_data_value": ndv,
        }
    return reduce_rasters_jax(stack, process_kwargs["statistic"], ndv, dtype)


Place.process.jax_impl = _place_jax
Place.process.jax_capable = _place_jax_capable
Place.process.jax_dynamic = {"dst_bbox"}
