"""Raster sources: MemorySource and RasterFileSource.

Behavioral parity with the reference sources (dask_geomodeling/raster/
sources.py:38-564): the requested time window snaps onto the band axis,
point requests read the single containing pixel, and data warps into the
requested grid (nearest-neighbour, GDAL's 0.125 px error model).  The
warp is this framework's own gather-based implementation (ops/warp.py)
instead of gdal.ReprojectImage; file I/O is the native GeoTIFF codec
(io/geotiff.py) instead of gdal.Open; and the vals path carries a device
twin so source reads fuse into XLA tile programs.
"""
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np

from dask_geomodeling_tpu import utils
from dask_geomodeling_tpu.core import arg
from dask_geomodeling_tpu.ops.warp import warp_jax, warp_numpy
from dask_geomodeling_tpu.raster.base import RasterBlock

__all__ = ["MemorySource", "RasterFileSource"]

_EMPTY_ANSWERS = {
    "empty_vals": None,
    "empty_time": {"time": []},
    "empty_meta": {"meta": []},
}


def _source_jax_capable(process_kwargs):
    """The device warp handles in-memory vals requests with a real bbox."""
    if not isinstance(process_kwargs, dict):
        return False
    if process_kwargs.get("mode") != "vals":
        return False
    if process_kwargs.get("raster_data") is None:
        return False
    bbox = process_kwargs["bbox"]
    if bbox[0] == bbox[2] or bbox[1] == bbox[3]:
        return False  # point request: host single-pixel read
    return process_kwargs["width"] > 0 and process_kwargs["height"] > 0


def _source_process_jax(process_kwargs):
    """Device twin of RasterSourceBase.process for the vals path: the CRS
    transform of the target grid, the gather, and the nodata handling all
    trace into the XLA program (ops/warp.py:warp_jax); the source payload is
    a device-resident traced input."""
    import jax.numpy as jnp

    raster_data = process_kwargs["raster_data"]
    bands = process_kwargs["bands"]
    dtype = np.dtype(process_kwargs["dtype"])
    fillvalue = np.dtype(dtype).type(process_kwargs["fillvalue"]).item()

    from dask_geomodeling_tpu.config import config

    values = raster_data.array[bands[0] : bands[1]]
    result = warp_jax(
        values,
        tuple(raster_data.geo_transform),
        raster_data.projection,
        raster_data.no_data_value,
        process_kwargs["bbox"],
        process_kwargs["projection"],
        process_kwargs["width"],
        process_kwargs["height"],
        dtype,
        fillvalue,
        interpolation=config.get("geomodeling.warp-interpolation", "nearest"),
        coarse_grid=process_kwargs.get("warp_grid"),
    )
    if dtype.kind == "f":
        result = jnp.where(jnp.isfinite(result), result, dtype.type(fillvalue))
    return {"values": result, "no_data_value": fillvalue}


@dataclass
class RasterData:
    """In-memory raster payload shipped in process_kwargs."""

    array: np.ndarray
    projection: str
    geo_transform: tuple
    no_data_value: float
    metadata: list


def _scan_alphabet(array, max_values):
    """The set of distinct values in ``array`` (python scalars), or None
    past ``max_values``.  Chunked with an early exit: truly continuous
    data blows the cap within the first chunk, so the scan only pays its
    full O(n log n) on data that actually is quantized."""
    flat = array.reshape(-1)
    found = None
    step = 1 << 20
    for start in range(0, flat.size, step):
        chunk = np.unique(flat[start : start + step])
        found = chunk if found is None else np.union1d(found, chunk)
        if len(found) > max_values:
            return None
    if found is None:
        return set()
    return {value.item() for value in found}


def _source_alphabet_config():
    """(max_values, scan_px_limit) when source alphabet scans are on and
    value-preserving (nearest warp), else None."""
    from dask_geomodeling_tpu.config import config

    if config.get("geomodeling.warp-interpolation", "nearest") != "nearest":
        return None  # bilinear mixes values: the scan would be a LIE
    max_values = config.get("geomodeling.source-alphabet-max", 4096)
    if not max_values:
        return None
    return (
        int(max_values),
        int(config.get("geomodeling.source-alphabet-scan-px", 64 * 1024**2)),
    )


def utc_from_ms_timestamp(timestamp):
    """Naive UTC datetime from a milliseconds POSIX timestamp."""
    return datetime.fromtimestamp(timestamp / 1000, tz=timezone.utc).replace(
        tzinfo=None
    )


def _as_ms(value, default=None):
    """Milliseconds from a datetime/timedelta/number timestamp or spacing."""
    if isinstance(value, datetime):
        return utils.dt_to_ms(value)
    if isinstance(value, timedelta):
        return int(value.total_seconds() * 1000)
    if value is None:
        return default
    return int(value)


class RasterSourceBase(RasterBlock):
    """Shared process() and temporal/extent attributes for memory- and
    file-backed sources."""

    @staticmethod
    def process(process_kwargs):
        mode = process_kwargs["mode"]
        if mode in _EMPTY_ANSWERS:
            return _EMPTY_ANSWERS[mode]

        bands = process_kwargs["bands"]
        if mode == "time":
            start = process_kwargs["start"]
            delta = process_kwargs["delta"]
            return {
                "time": [start + i * delta for i in range(bands[1] - bands[0])]
            }

        # memory and file paths converge on a RasterData payload
        raster_data = process_kwargs.get("raster_data")
        if raster_data is None:
            from dask_geomodeling_tpu.runtime.pipeline import read_geotiff_cached

            raster_data = read_geotiff_cached(
                utils.safe_abspath(process_kwargs["url"])
            )

        if mode == "meta":
            metadata = raster_data.metadata or [None] * len(raster_data.array)
            return {"meta": list(metadata[bands[0] : bands[1]])}
        return RasterSourceBase._answer_vals(process_kwargs, raster_data)

    @staticmethod
    def _answer_vals(process_kwargs, raster_data):
        bands = process_kwargs["bands"]
        dtype = np.dtype(process_kwargs["dtype"])
        bbox = process_kwargs["bbox"]
        width, height = process_kwargs["width"], process_kwargs["height"]
        fill = np.dtype(dtype).type(process_kwargs["fillvalue"]).item()

        if width == 0 or height == 0:
            return {
                "values": np.empty(
                    (bands[1] - bands[0], height, width), dtype=dtype
                ),
                "no_data_value": fill,
            }

        if bbox[0] == bbox[2] or bbox[1] == bbox[3]:
            result = RasterSourceBase._read_point(
                raster_data, bbox, process_kwargs["projection"], dtype, fill
            )[bands[0] : bands[1]]
        else:
            from dask_geomodeling_tpu.config import config

            # slice the band window BEFORE the warp (the device twin does
            # the same): reprojecting unrequested bands is pure waste
            result = warp_numpy(
                raster_data.array[bands[0] : bands[1]],
                utils.GeoTransform(raster_data.geo_transform),
                raster_data.projection,
                raster_data.no_data_value,
                bbox,
                process_kwargs["projection"],
                width,
                height,
                dtype=dtype,
                fillvalue=fill,
                interpolation=config.get(
                    "geomodeling.warp-interpolation", "nearest"
                ),
            )
        if result.dtype.kind == "f":
            result[~np.isfinite(result)] = fill
        return {"values": result, "no_data_value": fill}

    @staticmethod
    def _read_point(raster_data, bbox, projection, dtype, fill):
        """A 1x1 read of the pixel containing the (reprojected) point."""
        array = raster_data.array
        (x,), (y,) = utils.transform_points(
            np.array([bbox[0]]),
            np.array([bbox[1]]),
            projection,
            raster_data.projection,
        )
        gt = utils.GeoTransform(raster_data.geo_transform)
        (i,), (j,) = gt.get_indices(((x, y),))
        result = np.full((len(array), 1, 1), fill, dtype=dtype)
        if 0 <= i < array.shape[1] and 0 <= j < array.shape[2]:
            result[:, 0, 0] = array[:, i, j]
        return result

    process.__func__.jax_impl = _source_process_jax
    process.__func__.jax_capable = _source_jax_capable
    process.__func__.jax_dynamic = {"bbox", "warp_grid"}

    def _snap_bands(self, request):
        """Snap start/stop onto the band axis; None if empty."""
        start, stop, band1, band2 = utils.snap_start_stop(
            request.get("start"),
            request.get("stop"),
            utc_from_ms_timestamp(self.time_first),
            self.timedelta,
            len(self),
        )
        if start is None:
            return None
        return start, stop, (band1, band2 + 1)

    # --- planning, shared by both sources ---

    def get_sources_and_requests(self, **request):
        mode = request["mode"]
        if mode not in ("vals", "meta", "time"):
            raise RuntimeError("Unknown mode '{}'".format(mode))
        snapped = self._snap_bands(request)
        if snapped is None:
            return [({"mode": "empty_" + mode}, None)]
        start, stop, bands = snapped

        if mode == "time":
            plan = {
                "mode": "time",
                "start": start,
                "delta": self.timedelta or timedelta(0),
                "bands": bands,
            }
        else:
            plan = self._payload_plan(mode, request)
            plan["bands"] = bands
            if mode == "vals":
                plan.update(
                    mode="vals",
                    bbox=request["bbox"],
                    width=request["width"],
                    height=request["height"],
                    projection=request["projection"],
                    dtype=self.dtype,
                    fillvalue=self.fillvalue,
                )
                grid = self._host_warp_grid(
                    request, plan.get("raster_data")
                )
                if grid is not None:
                    plan["warp_grid"] = grid
        return [(plan, None)]

    def _host_warp_grid(self, request, raster_data=None):
        """Host-precomputed coarse fractional-index grid for a cross-CRS
        vals request (ops/warp.py:host_coarse_grid), or None.

        The grid ships as a per-tile traced input of the device program
        so the transcendental CRS math runs as vectorized host numpy
        instead of emulated-f64 TPU code (the dominant device cost of a
        cross-CRS tile).  The host executor's warp stays exact
        per-pixel and ignores it.  Mirrors warp_jax's approximate-
        transformer branch condition exactly; cheap (memoized with the
        rest of staging by the tile runtime).
        """
        from dask_geomodeling_tpu.config import config
        from dask_geomodeling_tpu.geo.crs import get_projection
        from dask_geomodeling_tpu.ops.warp import host_coarse_grid

        if not config.get("geomodeling.warp-host-grid", True):
            return None
        width, height = request["width"], request["height"]
        bbox = request["bbox"]
        if width <= 0 or height <= 0 or bbox[0] == bbox[2] or bbox[1] == bbox[3]:
            return None
        stride = int(config.get("geomodeling.warp-approx-stride", 8))
        if stride <= 1 or width <= stride or height <= stride:
            return None
        try:
            if (
                get_projection(self.projection).upper()
                == get_projection(request["projection"]).upper()
            ):
                return None
            # the payload may be a WINDOW of the file: its indices (and
            # hence the fractional-index grid) start at the window origin
            geo_transform = (
                tuple(raster_data.geo_transform)
                if raster_data is not None
                else tuple(self.geo_transform)
            )
            return host_coarse_grid(
                geo_transform,
                self.projection,
                bbox,
                request["projection"],
                width,
                height,
                stride,
            )
        except Exception:
            return None  # unparseable CRS etc.: the device path decides

    def _payload_plan(self, mode, request=None):
        """How this source ships its pixels/metadata (subclass hook);
        ``request`` (vals only) lets file sources read just the window a
        request touches."""
        raise NotImplementedError

    # --- temporal/extent attributes, shared by both sources ---

    @property
    def period(self):
        count = len(self)
        if count == 0:
            return None
        first = utc_from_ms_timestamp(self.time_first)
        if count == 1:
            return (first, first)
        return first, first + (count - 1) * self.timedelta

    @property
    def extent(self):
        extent = self._get_extent()
        return None if extent is None else extent.transformed("EPSG:4326").bbox

    @property
    def geometry(self):
        extent = self._get_extent()
        return None if extent is None else extent.as_geometry()


class MemorySource(RasterSourceBase):
    """A raster source interfacing data from memory.

    Args:
      data (ndarray or number): pixel values, coerced to a 3D (t, y, x) array
      no_data_value (number): the 'no data' marker
      projection (str): projection of the data
      pixel_size (float or (x, y)): pixel size in projection units
      pixel_origin ((x, y)): location of pixel (0, 0)
      time_first (int or datetime): timestamp of the first frame (ms)
      time_delta (int, timedelta or None): frame spacing (ms)
      metadata (list or None): per-frame metadata
    """

    def __init__(
        self,
        data,
        no_data_value,
        projection,
        pixel_size,
        pixel_origin,
        time_first=0,
        time_delta=None,
        metadata=None,
    ):
        data = self._coerce_data(data)
        no_data_value = data.dtype.type(no_data_value)
        projection = utils.get_epsg_or_wkt(projection)
        pixel_size = self._coerce_pair(pixel_size, "pixel_size")
        pixel_origin = self._coerce_pair(pixel_origin, "pixel_origin")
        time_first = _as_ms(time_first, 0)
        time_delta = _as_ms(time_delta)
        if time_delta is None and data.shape[0] > 1:
            raise ValueError("time_delta is required for temporal data")
        if metadata is not None:
            metadata = list(metadata)
            if len(metadata) != data.shape[0]:
                raise ValueError("Metadata length should match data length")
        super().__init__(
            data,
            no_data_value,
            projection,
            pixel_size,
            pixel_origin,
            time_first,
            time_delta,
            metadata,
        )

    @staticmethod
    def _coerce_data(data):
        data = np.asarray(data)
        if data.dtype == "i8":
            data = data.astype("i4")  # parity with the reference's GDAL limit
        if data.ndim == 2:
            data = data[np.newaxis]
        if data.ndim != 3:
            raise ValueError("data should be two- or three-dimensional.")
        return data

    @staticmethod
    def _coerce_pair(value, name):
        pair = [value] * 2 if not hasattr(value, "__iter__") else list(value)
        if len(pair) != 2:
            raise ValueError("%s should have length 2" % name)
        return [float(x) for x in pair]

    @property
    def data(self):
        data = self.args[0]
        if not isinstance(data, np.ndarray):
            # views deserialized without validation carry plain lists
            # (e.g. arrived as WMS 'layers' JSON); coerce once and cache
            data = np.asarray(data)
            if data.ndim == 2:
                data = data[np.newaxis]
            self.args = (data,) + tuple(self.args[1:])
        return data

    no_data_value = arg(1)
    projection = arg(2)
    pixel_size = arg(3)
    pixel_origin = arg(4)
    time_first = arg(5)
    time_delta = arg(6)
    metadata = arg(7)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def fillvalue(self):
        return self.no_data_value

    @property
    def geo_transform(self):
        p, q = self.pixel_origin
        a, d = self.pixel_size
        return utils.GeoTransform((p, a, 0, q, 0, -d))

    def _get_extent(self):
        if not self.data.size:
            return None
        bbox = self.geo_transform.get_bbox((0, 0), self.data.shape[1:])
        return utils.Extent(bbox, self.projection)

    def __len__(self):
        return self.data.shape[0]

    @property
    def timedelta(self):
        if self.time_delta is None:
            return None
        return timedelta(milliseconds=self.time_delta)

    @property
    def temporal(self):
        return self.time_delta is not None

    def get_sources_and_requests(self, **request):
        if request["mode"] == "meta" and self.metadata is None:
            return [({"mode": "empty_meta"}, None)]
        return super().get_sources_and_requests(**request)

    def out_value_set(self):
        """Data-dependent alphabet: scan the in-memory array once (cached
        on the instance) and declare its distinct values ∪ {fill} when
        small enough.  Sound because the vals path is a nearest-neighbour
        warp — a pure gather of stored values, never arithmetic on them —
        plus the fill for out-of-extent cells; gated off entirely for
        non-nearest interpolation.  This is what lets *continuous-dtype*
        views of quantized data (the overwhelming real-world GIS case)
        ride the packed fetch codec (runtime/fetchcodec.py)."""
        gate = _source_alphabet_config()
        if gate is None:
            return None
        max_values, _ = gate
        cached = getattr(self, "_alphabet_cache", None)
        if cached is None or cached[0] != max_values:
            values = _scan_alphabet(self.data, max_values)
            self._alphabet_cache = cached = (max_values, values)
        values = cached[1]
        if values is None:
            return None
        return values | {self.fillvalue.item()}

    def _payload_plan(self, mode, request=None):
        raster_data = RasterData(
            array=self.data,
            metadata=self.metadata,
            geo_transform=tuple(self.geo_transform),
            no_data_value=float(self.no_data_value),
            projection=self.projection,
        )
        return {"mode": mode, "raster_data": raster_data}


class RasterFileSource(RasterSourceBase):
    """A raster source reading a raster file from a path.

    Formats (all decoded natively — reference raster/sources.py:66-71
    reads via ``gdal.Open``): GeoTIFF (classic + BigTIFF, deflate/LZW/
    PackBits, both endiannesses), VRT mosaics, Esri ASCII grids
    (``.asc``/``.agr``), XYZ gridded text (``.xyz``), PNG with world
    file (``.png`` + ``.pgw``/``.wld``/``.prj``), JPEG/BMP/GIF with
    world files (``io/jpeg.py``), CF netCDF classic
    (``.nc``/``.cdf``/``.nc3``), netCDF-4/HDF5 (``.nc4``/``.h5``/
    ``.hdf5``, via the image's h5py when available), ENVI pairs
    (``.hdr`` + bsq/bil/bip binary, ``io/envi.py``), SRTM ``.hgt``
    tiles and DTED ``.dt0``/``.dt1``/``.dt2`` (``io/dem.py``),
    ERDAS Imagine ``.img`` (HFA node tree with dictionary-driven
    layouts, uncompressed + ESRI-GRID-RLE blocks, ``io/hfa.py``), and
    GRIB2 (``.grib2``/``.grb2``: simple/complex/spatially-differenced/
    PNG packing, lat-lon + Lambert grids, bitmaps, ``io/grib.py``).

    Args:
      url (str): path to the file, sandboxed by ``geomodeling.root``
      time_first (int or datetime): timestamp of the first frame (ms)
      time_delta (int or timedelta): frame spacing (ms), default 5 minutes
      variable (str): data variable/array for multi-variable containers
        (netCDF, Zarr) — GDAL's subdataset role; other formats ignore it
    """

    def __init__(self, url, time_first=0, time_delta=300000, variable=None):
        if variable is not None:
            from dask_geomodeling_tpu.core.validate import expect_instance

            expect_instance(variable, str, "variable")
        super().__init__(
            utils.safe_file_url(url),
            _as_ms(time_first, 0),
            _as_ms(time_delta, 300000),
            variable,
        )

    url = arg(0)
    time_first = arg(1)
    time_delta = arg(2)
    variable = arg(3, "data variable for multi-variable containers", default=None)

    @property
    def info(self):
        """Cached header info of the GeoTIFF (no pixel data read)."""
        try:
            return self._info
        except AttributeError:
            path = utils.safe_abspath(self.url)
            if path.lower().endswith(".zarr"):
                # metadata-only: large chunked stores must not decode
                # whole just to answer attribute queries
                from dask_geomodeling_tpu.io.zarr import read_zarr_info

                self._info = read_zarr_info(path, self.variable)
            elif path.lower().endswith(
                (".nc", ".cdf", ".nc3", ".nc4", ".h5", ".hdf5")
            ):
                from dask_geomodeling_tpu.io.netcdf import read_netcdf_info

                self._info = read_netcdf_info(path, self.variable)
            elif path.lower().endswith((".ntf", ".nitf")):
                from dask_geomodeling_tpu.io.nitf import read_nitf_info

                self._info = read_nitf_info(path)
            elif path.lower().endswith(".vrt"):
                from dask_geomodeling_tpu.io.vrt import read_vrt_info

                self._info = read_vrt_info(path)
            elif path.lower().endswith((".hdf", ".h4", ".hdf4")):
                from dask_geomodeling_tpu.io.hdf4 import (
                    is_hdf4,
                    read_hdf4_info,
                )

                if is_hdf4(path):
                    # metadata-only: large granules must not decode
                    # whole just to answer attribute queries
                    self._info = read_hdf4_info(path)
                else:
                    from dask_geomodeling_tpu.io.netcdf import (
                        read_netcdf_info,
                    )

                    self._info = read_netcdf_info(path, self.variable)
            elif path.lower().endswith(
                (
                    ".asc", ".agr", ".xyz", ".png", ".jpg", ".jpeg",
                    ".bmp", ".gif", ".gpkg", ".hgt", ".dt0", ".dt1", ".dt2",
                    ".hdr", ".bsq", ".bil", ".bip", ".envi", ".img", ".dat",
                    ".raw", ".grib", ".grib2", ".grb", ".grb2", ".gb2",
                    ".mbtiles", ".grd", ".sgrd", ".sdat", ".rst",
                    ".jp2", ".j2k", ".jpx",
                )
            ):
                from dask_geomodeling_tpu.io.geotiff import GeoTIFFInfo
                from dask_geomodeling_tpu.runtime.pipeline import (
                    read_geotiff_cached,
                )

                data = read_geotiff_cached(path, variable=self.variable)
                self._info = GeoTIFFInfo(
                    width=data.array.shape[2],
                    height=data.array.shape[1],
                    bands=data.array.shape[0],
                    dtype=str(data.array.dtype),
                    projection=data.projection,
                    geo_transform=data.geo_transform,
                    no_data_value=data.no_data_value,
                    metadata=data.metadata,
                )
            else:
                from dask_geomodeling_tpu.io.geotiff import read_geotiff_info

                self._info = read_geotiff_info(path)
            return self._info

    def close_dataset(self):
        for attribute in ("_info", "_overviews", "_alphabet_cache"):
            if hasattr(self, attribute):
                delattr(self, attribute)

    @property
    def projection(self):
        return utils.get_epsg_or_wkt(self.info.projection)

    @property
    def dtype(self):
        return np.dtype(self.info.dtype)

    @property
    def fillvalue(self):
        # foreign files may omit the nodata tag; default to the framework
        # convention (dtype max) like the reference's dtype rules
        no_data = self.info.no_data_value
        if no_data is not None:
            try:
                cast = self.dtype.type(no_data)
                if float(cast) == float(no_data):
                    return cast
            except (OverflowError, ValueError):
                pass
            # a nodata outside the dtype's range (e.g. SAGA's -99999
            # default on byte grids) cannot occur in the data: treat it
            # as "no nodata cells" rather than crashing
        from dask_geomodeling_tpu.geo import get_dtype_max

        return self.dtype.type(get_dtype_max(self.dtype))

    @property
    def geo_transform(self):
        return utils.GeoTransform(self.info.geo_transform)

    def _get_extent(self):
        bbox = self.geo_transform.get_bbox(
            (0, 0), (self.info.height, self.info.width)
        )
        return utils.Extent(bbox, self.projection)

    def __len__(self):
        return self.info.bands

    @property
    def timedelta(self):
        if len(self) <= 1:
            return None
        return timedelta(milliseconds=self.time_delta)

    @property
    def temporal(self):
        return len(self) > 1

    def out_value_set(self):
        """Data-dependent alphabet for file sources: scan the decoded
        payload once (cached on the instance like ``info``) and declare
        distinct values ∪ {fill, file nodata} when small enough.  Sound
        for the same reason as MemorySource (nearest warp is a gather);
        additionally gated off when overview reads are enabled and the
        file has a pyramid — overview levels hold RESAMPLED values that
        may lie outside the base alphabet."""
        gate = _source_alphabet_config()
        if gate is None:
            return None
        max_values, scan_px = gate
        from dask_geomodeling_tpu.config import config

        if config.get("geomodeling.use-overviews", False):
            try:
                if self._overview_sizes():
                    return None
            except Exception:
                return None
        try:
            import os

            path = utils.safe_abspath(self.url)
            stat = os.stat(path)
            stamp = (max_values, stat.st_mtime_ns, stat.st_size)
        except Exception:
            return None
        cached = getattr(self, "_alphabet_cache", None)
        if cached is None or cached[0] != stamp:
            values = None
            try:
                info = self.info
                if info.width * info.height * info.bands <= scan_px:
                    from dask_geomodeling_tpu.runtime.pipeline import (
                        read_geotiff_cached,
                    )

                    payload = read_geotiff_cached(path, variable=self.variable)
                    values = _scan_alphabet(payload.array, max_values)
            except Exception:
                values = None
            self._alphabet_cache = cached = (stamp, values)
        values = cached[1]
        if values is None:
            return None
        out = set(values) | {self.fillvalue.item()}
        no_data = self.info.no_data_value
        if no_data is not None:
            try:
                out.add(self.dtype.type(no_data).item())
            except (OverflowError, ValueError):
                pass  # out-of-range nodata cannot occur in the data
        return out

    def _payload_plan(self, mode, request=None):
        if mode == "meta":
            return {"mode": "meta", "url": self.url}
        # load through the host read cache at plan time: the payload
        # becomes a device-resident traced input of the fused program,
        # exactly like MemorySource (one decode + one HBM upload per file)
        from dask_geomodeling_tpu.runtime.pipeline import read_geotiff_cached

        plan = self._file_read_plan(request)
        if plan is not None:
            from dask_geomodeling_tpu.runtime.pipeline import (
                read_geotiff_window_cached,
            )

            level, window = plan
            return {
                "mode": mode,
                "raster_data": read_geotiff_window_cached(
                    utils.safe_abspath(self.url), *window, level=level,
                    variable=self.variable,
                ),
            }
        return {
            "mode": mode,
            "raster_data": read_geotiff_cached(
                utils.safe_abspath(self.url), variable=self.variable
            ),
        }

    def _file_read_plan(self, request):
        """``(level, (row0, row1, col0, col1))`` for a vals request, or
        None for the plain whole-file read.

        Two GDAL-style access patterns compose here: large GeoTIFFs
        decode block-wise (only the strips/tiles the target bbox maps
        to — the reference's warp reads through GDAL's block cache,
        reference raster/sources.py:133-144), and with
        ``geomodeling.use-overviews`` on, requests at coarse resolution
        read from the best reduced-resolution IFD instead of the full
        grid (``gdalwarp -ovr AUTO``).  Other formats and small files
        keep the one-decode whole-file cache.
        """
        from dask_geomodeling_tpu.config import config

        if request is None:
            return None
        path = utils.safe_abspath(self.url)
        # GeoTIFFs decode block-wise; Zarr stores and netCDF-4/HDF5 files
        # chunk-wise (no pyramid levels there — overviews are a TIFF
        # concept)
        chunked_store = path.lower().endswith(
            (".zarr", ".nc", ".cdf", ".nc3", ".nc4", ".h5", ".hdf5", ".vrt",
             ".hdf", ".h4", ".hdf4")
        )
        if not (chunked_store or path.lower().endswith((".tif", ".tiff"))):
            return None
        info = self.info

        # 1. source-CRS bbox of the request (densified across CRSes)
        bbox = request["bbox"]
        try:
            if (
                utils.get_projection(self.projection).upper()
                != utils.get_projection(request["projection"]).upper()
            ):
                bbox = self._densified_extent(
                    bbox, request["projection"], self.projection
                )
                if bbox is None:
                    return None
        except Exception:
            return None  # unparseable CRS etc.: whole-file fallback

        # 2. overview selection: coarse requests read the pyramid
        level = 0
        level_w, level_h = info.width, info.height
        gt = tuple(self.geo_transform)
        if not chunked_store and config.get("geomodeling.use-overviews", False):
            level, level_w, level_h = self._overview_choice(bbox, request)
            if level:
                fx = info.width / float(level_w)
                fy = info.height / float(level_h)
                gt = (gt[0], gt[1] * fx, gt[2], gt[3], gt[4], gt[5] * fy)

        # 3. window gate: only files above the limit decode block-wise
        limit = config.get("geomodeling.windowed-read-limit", 64 * 1024**2)
        if limit is None or level_w * level_h <= int(limit):
            if level == 0:
                return None
            return level, (0, level_h, 0, level_w)

        try:
            (row0, row1), (col0, col1) = utils.GeoTransform(
                gt
            ).get_indices_for_bbox(bbox)
        except Exception:
            return (level, (0, level_h, 0, level_w)) if level else None
        # nearest/bilinear sampling margin + half-open upper edge
        margin = 2
        row0, col0 = row0 - margin, col0 - margin
        row1, col1 = row1 + margin + 1, col1 + margin + 1
        if row1 <= 0 or col1 <= 0 or row0 >= level_h or col0 >= level_w:
            # no overlap: a minimal corner window keeps the plan shape
            return level, (0, 1, 0, 1)
        return level, (
            max(0, row0),
            min(level_h, row1),
            max(0, col0),
            min(level_w, col1),
        )

    def _overview_choice(self, bbox, request):
        """(level, width, height) of the coarsest overview still finer
        than the request resolution, or (0, full_w, full_h)."""
        info = self.info
        full = (0, info.width, info.height)
        width, height = request["width"], request["height"]
        if width <= 0 or height <= 0:
            return full
        req_cell_x = abs(bbox[2] - bbox[0]) / float(width)
        req_cell_y = abs(bbox[3] - bbox[1]) / float(height)
        gt = self.geo_transform
        src_cell_x, src_cell_y = abs(gt[1]), abs(gt[5])
        if req_cell_x <= 0 or req_cell_y <= 0:
            return full
        ratio = min(req_cell_x / src_cell_x, req_cell_y / src_cell_y)
        if ratio < 2.0:
            return full
        try:
            overviews = self._overview_sizes()
        except Exception:
            return full
        best = full
        best_factor = 1.0
        for index, (ov_w, ov_h) in enumerate(overviews):
            factor = info.width / float(ov_w)
            if factor <= ratio and factor > best_factor:
                best = (index + 1, ov_w, ov_h)
                best_factor = factor
        return best

    def _overview_sizes(self):
        try:
            return self._overviews
        except AttributeError:
            from dask_geomodeling_tpu.io.geotiff import read_geotiff_overviews

            self._overviews = read_geotiff_overviews(
                utils.safe_abspath(self.url)
            )
            return self._overviews

    @staticmethod
    def _densified_extent(bbox, src_proj, dst_proj, points_per_edge=21):
        """Transform ``bbox`` to ``dst_proj`` sampling every edge densely.

        Corner-only transforms under-cover the curved preimage of a bbox
        (GDAL densifies 21 points per edge for the same reason); any
        non-finite sample falls back to a whole-file read (None).
        """
        from dask_geomodeling_tpu.geo.crs import get_transform_func

        x1, y1, x2, y2 = bbox
        t = np.linspace(0.0, 1.0, points_per_edge)
        xs = np.concatenate(
            [x1 + (x2 - x1) * t, np.full_like(t, x2),
             x2 + (x1 - x2) * t, np.full_like(t, x1)]
        )
        ys = np.concatenate(
            [np.full_like(t, y1), y1 + (y2 - y1) * t,
             np.full_like(t, y2), y2 + (y1 - y2) * t]
        )
        tx, ty = get_transform_func(src_proj, dst_proj)(xs, ys)
        tx, ty = np.asarray(tx, float), np.asarray(ty, float)
        if not (np.isfinite(tx).all() and np.isfinite(ty).all()):
            return None
        return (tx.min(), ty.min(), tx.max(), ty.max())
