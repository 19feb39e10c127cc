"""Host-side data feeding: read caching and asynchronous prefetch.

The reference keeps a GDAL dataset handle open per file source (reference
raster/sources.py:449-459) and relies on the OS page cache.  Here:

- :func:`read_geotiff_cached` — an mtime-validated LRU of decoded rasters,
  so evaluating many tiles against one file decodes it once
- :class:`TilePrefetcher` — a small thread pool that overlaps host work
  (file decode, request planning) with device execution; used to stage the
  next tile batch while the current one computes (double buffering)
"""
import os
import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor

__all__ = [
    "read_geotiff_cached",
    "read_geotiff_window_cached",
    "clear_read_cache",
    "TilePrefetcher",
]

_CACHE_LOCK = threading.Lock()
_READ_CACHE = OrderedDict()
_READ_CACHE_SIZE = 8
_WINDOW_CACHE = OrderedDict()
_WINDOW_CACHE_SIZE = 64


def _is_envi_pair(path):
    from dask_geomodeling_tpu.io.envi import has_envi_header

    return has_envi_header(path)


def _is_hfa(path):
    try:
        with open(path, "rb") as stream:
            return stream.read(16) == b"EHFA_HEADER_TAG\x00"
    except OSError:
        return False


def _raster_stamp(key):
    """Cache-invalidation stamp; ENVI pairs fold in both pair members;
    Zarr directory stores fold in a recursive walk of entry mtimes
    (chunk rewrites inside subdirectories bump neither the root
    directory's mtime nor any metadata document)."""
    stamp = _file_stamp(key)
    if key.lower().endswith(".zarr") and os.path.isdir(key):
        return (stamp, _zarr_stamp(key))
    try:
        from dask_geomodeling_tpu.io.envi import _paths_of

        header_path, data_path = _paths_of(key)
    except IOError:
        return stamp
    other = data_path if os.path.abspath(header_path) == key else header_path
    try:
        return (stamp, _file_stamp(other))
    except OSError:
        return stamp


#: entry budget for the zarr stamp walk; stores with more files fold a
#: coarse per-directory stamp instead of per-entry mtimes
_ZARR_STAMP_LIMIT = 8192


def _zarr_stamp(root):
    """(count, newest mtime_ns, total size) over the store's files.

    A bounded os.scandir walk: for everyday stores (the whole-read LRU
    only admits them below ``windowed-read-limit`` pixels anyway) this
    is a few stats.  Enormous chunk trees stop at the entry budget and
    return a coarse directory-level stamp — creations and deletions are
    still detected there; only in-place chunk rewrites beyond the budget
    can go unseen.
    """
    count = 0
    newest = 0
    total = 0
    stack = [root]
    while stack:
        directory = stack.pop()
        try:
            with os.scandir(directory) as entries:
                for entry in entries:
                    count += 1
                    if count > _ZARR_STAMP_LIMIT:
                        return ("coarse", count, newest, total)
                    try:
                        st = entry.stat(follow_symlinks=False)
                    except OSError:
                        continue
                    newest = max(newest, st.st_mtime_ns)
                    total += st.st_size
                    if entry.is_dir(follow_symlinks=False):
                        stack.append(entry.path)
        except OSError:
            continue
    return (count, newest, total)


def read_geotiff_cached(path, variable=None):
    """Read a GeoTIFF (or VRT mosaic) with an mtime-validated LRU cache.

    ``variable`` selects the data variable of multi-variable containers
    (netCDF, Zarr) and is part of the cache key; other formats ignore
    it."""
    from dask_geomodeling_tpu.io.geotiff import read_geotiff
    from dask_geomodeling_tpu.io.vrt import read_vrt

    path = os.path.abspath(path)
    key = (path, variable)
    stamp = _raster_stamp(path)
    with _CACHE_LOCK:
        entry = _READ_CACHE.get(path)
        if entry is not None and entry[0] == stamp:
            _READ_CACHE.move_to_end(path)
            return entry[1]
    lower = path.lower()
    if lower.endswith(".vrt"):
        data = read_vrt(path)
    elif lower.endswith((".asc", ".agr")):
        from dask_geomodeling_tpu.io.asciigrid import read_ascii_grid

        data = read_ascii_grid(path)
    elif lower.endswith(".xyz"):
        from dask_geomodeling_tpu.io.asciigrid import read_xyz

        data = read_xyz(path)
    elif lower.endswith(".png"):
        from dask_geomodeling_tpu.io.png import read_png

        data = read_png(path)
    elif lower.endswith((".jp2", ".j2k", ".jpx")):
        from dask_geomodeling_tpu.io.jp2 import read_jp2

        data = read_jp2(path)
    elif lower.endswith((".jpg", ".jpeg", ".bmp", ".gif")):
        from dask_geomodeling_tpu.io.jpeg import read_jpeg

        data = read_jpeg(path)
    elif lower.endswith((".ntf", ".nitf")):
        from dask_geomodeling_tpu.io.nitf import read_nitf

        data = read_nitf(path)
    elif lower.endswith((".nc", ".cdf", ".nc3", ".nc4", ".h5", ".hdf5")):
        from dask_geomodeling_tpu.io.netcdf import read_netcdf

        data = read_netcdf(path, variable)
    elif lower.endswith((".hdf", ".h4", ".hdf4")):
        # ".hdf" is ambiguous in the wild: HDF4 by magic, HDF5 otherwise
        from dask_geomodeling_tpu.io.hdf4 import is_hdf4, read_hdf4

        if is_hdf4(path):
            data = read_hdf4(path)
        else:
            from dask_geomodeling_tpu.io.netcdf import read_netcdf

            data = read_netcdf(path, variable)
    elif lower.endswith(".hgt"):
        from dask_geomodeling_tpu.io.dem import read_hgt

        data = read_hgt(path)
    elif lower.endswith((".dt0", ".dt1", ".dt2")):
        from dask_geomodeling_tpu.io.dem import read_dted

        data = read_dted(path)
    elif lower.endswith((".grib", ".grib2", ".grb", ".grb2", ".gb2")):
        from dask_geomodeling_tpu.io.grib import read_grib

        data = read_grib(path)
    elif lower.endswith(".zarr"):
        from dask_geomodeling_tpu.io.zarr import read_zarr

        data = read_zarr(path, variable)
    elif lower.endswith(".grd"):
        from dask_geomodeling_tpu.io.simplegrids import read_surfer

        data = read_surfer(path)
    elif lower.endswith((".sgrd", ".sdat")):
        from dask_geomodeling_tpu.io.simplegrids import read_saga

        data = read_saga(path)
    elif lower.endswith(".rst"):
        from dask_geomodeling_tpu.io.simplegrids import read_idrisi

        data = read_idrisi(path)
    elif lower.endswith(".mbtiles"):
        from dask_geomodeling_tpu.io.mbtiles import read_mbtiles

        data = read_mbtiles(path)
    elif lower.endswith(".gpkg"):
        from dask_geomodeling_tpu.io.gpkg_raster import read_gpkg_raster

        data = read_gpkg_raster(path)
    elif lower.endswith(".img") and _is_hfa(path):
        from dask_geomodeling_tpu.io.hfa import read_hfa

        data = read_hfa(path)
    elif lower.endswith((".hdr", ".bsq", ".bil", ".bip", ".envi")) or (
        lower.endswith((".img", ".dat", ".raw")) and _is_envi_pair(path)
    ):
        from dask_geomodeling_tpu.io.envi import read_envi

        data = read_envi(path)
    else:
        data = read_geotiff(path)
    with _CACHE_LOCK:
        _READ_CACHE[key] = (stamp, data)
        _READ_CACHE.move_to_end(key)
        while len(_READ_CACHE) > _READ_CACHE_SIZE:
            _READ_CACHE.popitem(last=False)
    return data


def read_geotiff_window_cached(path, row0, row1, col0, col1, level=0,
                               variable=None):
    """Read one pixel window of a large GeoTIFF (block-level decode,
    optionally of an overview level) with an mtime-validated LRU keyed
    by (path, window, level) — repeated tile requests against the same
    window decode once."""
    from dask_geomodeling_tpu.io.geotiff import read_geotiff_window

    key = (
        os.path.abspath(path), int(row0), int(row1), int(col0), int(col1),
        int(level), variable,
    )
    stamp = _raster_stamp(key[0])
    with _CACHE_LOCK:
        entry = _WINDOW_CACHE.get(key)
        if entry is not None and entry[0] == stamp:
            _WINDOW_CACHE.move_to_end(key)
            return entry[1]
    if key[0].lower().endswith(".zarr"):
        from dask_geomodeling_tpu.io.zarr import read_zarr_window

        data = read_zarr_window(key[0], row0, row1, col0, col1,
                                variable=variable)
    elif key[0].lower().endswith(
        (".nc", ".cdf", ".nc3", ".nc4", ".h5", ".hdf5")
    ):
        from dask_geomodeling_tpu.io.netcdf import read_netcdf_window

        data = read_netcdf_window(key[0], row0, row1, col0, col1,
                                  variable=variable)
    elif key[0].lower().endswith(".vrt"):
        from dask_geomodeling_tpu.io.vrt import read_vrt_window

        data = read_vrt_window(key[0], row0, row1, col0, col1)
    elif key[0].lower().endswith((".hdf", ".h4", ".hdf4")):
        from dask_geomodeling_tpu.io.hdf4 import is_hdf4, read_hdf4_window

        if is_hdf4(key[0]):
            data = read_hdf4_window(key[0], row0, row1, col0, col1)
        else:  # HDF5-named-.hdf: the netCDF-4 chunk slicer handles it
            from dask_geomodeling_tpu.io.netcdf import read_netcdf_window

            data = read_netcdf_window(key[0], row0, row1, col0, col1,
                                      variable=variable)
    else:
        data = read_geotiff_window(key[0], row0, row1, col0, col1, level=level)
    with _CACHE_LOCK:
        _WINDOW_CACHE[key] = (stamp, data)
        _WINDOW_CACHE.move_to_end(key)
        while len(_WINDOW_CACHE) > _WINDOW_CACHE_SIZE:
            _WINDOW_CACHE.popitem(last=False)
    return data


_VECTOR_CACHE = OrderedDict()
_VECTOR_CACHE_SIZE = 16


def _file_stamp(path):
    # (mtime_ns, size): plain mtime has 1 s granularity on some filesystems,
    # so a rewrite within the same tick would serve the stale parse.
    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


def read_vector_cached(path, layer=None):
    """Read a vector file with an mtime-validated LRU cache.

    The raster side has had this since round 1 (``read_geotiff_cached``);
    without it a Rasterize-over-features pipeline re-parses the whole
    vector file once per tile request.  Callers must treat the returned
    frame as read-only (GeometryFileSource hands out shallow copies).
    """
    from dask_geomodeling_tpu.io.vectorfile import read_vector

    key = (os.path.abspath(path), layer)
    stamp = _file_stamp(key[0])
    with _CACHE_LOCK:
        entry = _VECTOR_CACHE.get(key)
        if entry is not None and entry[0] == stamp:
            _VECTOR_CACHE.move_to_end(key)
            return entry[1]
    frame = read_vector(key[0], layer=layer)
    with _CACHE_LOCK:
        _VECTOR_CACHE[key] = (stamp, frame)
        _VECTOR_CACHE.move_to_end(key)
        while len(_VECTOR_CACHE) > _VECTOR_CACHE_SIZE:
            _VECTOR_CACHE.popitem(last=False)
    return frame


def clear_read_cache():
    """Drop all cached decoded rasters and vector frames."""
    with _CACHE_LOCK:
        _READ_CACHE.clear()
        _WINDOW_CACHE.clear()
        _VECTOR_CACHE.clear()


class TilePrefetcher:
    """Double-buffered staging: submit host work for batch k+1 while the
    device runs batch k.

    Usage::

        with TilePrefetcher() as prefetch:
            pending = prefetch.map(stage_fn, batches)   # host thread pool
            for staged in pending:                       # in order
                device_result = dispatch(staged.result())
    """

    def __init__(self, workers=2):
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def map(self, func, items):
        return [self._pool.submit(func, item) for item in items]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._pool.shutdown(wait=True)
        return False
