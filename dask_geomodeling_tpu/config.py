"""Global configuration for dask_geomodeling_tpu.

The reference piggybacks on ``dask.config`` with a ``geomodeling`` namespace
(reference: dask_geomodeling/config.py:4-12).  This framework has no dask, so
it ships a small thread-safe config object with the same keys plus TPU-
specific additions (tile size, device batch, HBM budget, mesh shape).

Usage::

    from dask_geomodeling_tpu import config
    config.set({"geomodeling.raster-limit": 16 * 1024 * 1024})
    with config.set({"geomodeling.root": "/tmp/data"}):
        ...
"""
import os
import threading
from contextlib import ContextDecorator

__all__ = ["config", "defaults"]

defaults = {
    # parity with the reference (dask_geomodeling/config.py:4-12)
    "geomodeling.root": "/",
    "geomodeling.strict-file-paths": False,
    # default maximum number of pixels in a raster request (~100 MB float64)
    "geomodeling.raster-limit": 12 * (1024**2),
    # default maximum number of timesteps in a raster request
    "geomodeling.raster-limit-timesteps": 2**16,
    # default maximum number of geometries in a geometry request
    "geomodeling.geometry-limit": 10000,
    # scheduler used by ``compute``: sync | threads | processes
    "scheduler": None,
    # in-memory byte budget for the pooled schedulers' intermediate
    # results; beyond it, least-recently-used results spill to disk
    # (parallel/spill.py, the dask.distributed spilling analog).
    # None/0 = unlimited (results are still released after last use)
    "geomodeling.scheduler-memory-limit": None,
    "temporary_directory": None,
    # --- TPU runtime additions ---
    # executor for raster vals requests: "numpy" (host reference path),
    # "jax" (always lower to a jitted XLA program), or "auto" (route each
    # request by measured host/device rates, runtime/router.py)
    "geomodeling.executor": "auto",
    # minimum request pixels before "auto" considers the device path
    # (below this a dispatch cannot amortize over a tunneled TPU)
    "geomodeling.auto-min-device-px": 65536,
    # the measured device rate must exceed margin * host rate before
    # "auto" routes a request kind to the device (hysteresis: close
    # calls stay on the safe host default)
    "geomodeling.auto-margin": 1.15,
    # NTv2 grid-shift files per datum name, e.g. {"NZGD49": ".../nz.gsb"}:
    # upgrades that datum's WGS84 leg from Helmert (~0.5 m) to grid
    # interpolation (geo/ntv2.py)
    "geomodeling.ntv2-grids": None,
    # fixed tile edge for the tiled TPU runtime (pixels)
    "geomodeling.tile-size": 512,
    # number of tiles evaluated per device program invocation (measured
    # sweep at the 10240^2 north-star shape: 64 > 50 > 100 — enough
    # fetch/compute overlap without per-batch fixed costs dominating;
    # bench.py uses the same value so auto-tiled get_data requests share
    # its warm compilation cache)
    "geomodeling.tile-batch": 64,
    # overlap host staging of batch k+1 with device work on batch k; off by
    # default: over a tunneled TPU the extra host threads can contend with
    # the transfer stream (measured 17.7 -> ~12-14 Mpx/s on the bench view)
    "geomodeling.tile-prefetch": False,
    # logical device mesh shape used by the sharded executor, e.g. (8,)
    "geomodeling.mesh-shape": None,
    # per-batch HBM budget in bytes for admission control of tile batches
    "geomodeling.hbm-budget": 2 * (1024**3),
    # max compiled tile programs kept (LRU); bounds long-running services
    "geomodeling.tile-program-cache": 64,
    # directory for XLA's persistent compilation cache (None = disabled);
    # makes process restarts warm-start instead of recompiling for minutes
    "geomodeling.compilation-cache": None,
    # coarse-grid stride of the approximate warp transformer (GDAL's
    # 0.125 px error model); 1 = exact per-pixel CRS transform
    "geomodeling.warp-approx-stride": 8,
    # warp resampling: "nearest" (GDAL GRA_NearestNeighbour, the
    # reference's choice) or "bilinear"
    "geomodeling.warp-interpolation": "nearest",
    # zonal statistics as device segment reductions (ops/segment.py):
    # "auto" (default, measured policy — BASELINE.md round-3 zonal table)
    # routes only sort-based statistics (median/percentile, 2.0-2.2x
    # wins) to the device and only when the frames are ALREADY
    # device-resident (executor=jax staging); True forces the device
    # for every supported statistic, False pins the host
    "geomodeling.aggregate-device": "auto",
    # "auto" takes the device only for frame stacks at least this many
    # pixels (t*h*w): below it, dispatch latency dominates the sort win
    "geomodeling.aggregate-device-min-px": 2**22,
    # allow float64 pipelines through DISCRETE device ops (Classify,
    # Reclassify, Step, MaskBelow, comparisons): XLA:TPU emulates f64 at
    # ~1e-14 relative error, which can flip cells whose values sit within
    # that noise of a bin edge / comparison threshold.  Off by default:
    # such pipelines route to the (bit-exact) host path on real chips;
    # opt in per deployment when approximate bin edges are acceptable.
    # CPU backends are bit-exact and never guarded.
    "geomodeling.device-f64-discrete": False,
    # use the fused Pallas kernel for Gaussian smoothing on TPU
    "geomodeling.pallas-smooth": True,
    # use the fused Pallas kernel for the moving-max footprint filter
    # (MovingMax/Dilate) on TPU
    "geomodeling.pallas-stencils": True,
    # with the jax executor, route vals requests larger than one tile
    # through the batched tile runtime (runtime/tiles.py) automatically
    "geomodeling.auto-tile": True,
    # pack small-range integer/boolean tile outputs to 2-8 pixels per
    # byte before the device->host fetch (runtime/fetchcodec.py)
    "geomodeling.fetch-pack": True,
    # concurrent device->host batch fetches: one blocking copy runs well
    # under the tunnel's wire rate, a few in-flight RPCs pipeline
    # (measured 22 -> 30 MB/s with 4); 1 disables the fetch pool
    "geomodeling.fetch-workers": 4,
    # precompute the approximate transformer's coarse grid on host and
    # ship it as a per-tile input (vectorized numpy beats emulated-f64
    # TPU transcendentals by >10x; ~35 KB f32 per 512^2 tile)
    "geomodeling.warp-host-grid": True,
    # cross-CRS warp gather implementation in the tile runtime: "auto"
    # lowers the gather to MXU one-hot matmuls (ops/matmul_gather.py,
    # bit-exact, ~8x faster than XLA's gather on TPU) for batches inside
    # the host-checked smoothness domain; "plain" always uses the
    # general gather
    "geomodeling.warp-gather": "auto",
    # file persisting the auto-router's measured routing table
    # (runtime/router.py): restarted services keep their routes instead
    # of re-exploring host/device rates per view (the round-4 verdict's
    # "exploration tax").  Default: a per-user cache file; None disables
    # persistence (the test suite nulls it)
    "geomodeling.router-state": os.path.join(
        os.path.expanduser("~"),
        ".cache",
        "dask_geomodeling_tpu",
        "router-state.json",
    ),
    # FlatGeobuf files above this many BYTES answer bbox-filtered
    # requests through their packed R-tree index (decode only touched
    # features) instead of the parse-whole-file LRU.  None disables
    "geomodeling.vector-windowed-read-limit": 16 * 1024 * 1024,
    # byte budget for the cross-request result cache at the raster
    # get_data boundary (runtime/results.py): whole responses are
    # LRU-cached by (view token, request token) — the tile-server reuse
    # layer.  0 = off (the default: file-backed responses can go stale)
    "geomodeling.result-cache-size": 0,
    # GeoTIFFs above this pixel count are read through the block-level
    # window reader (only the strips/tiles a request touches decode —
    # GDAL's block-cache access pattern for large/cloud-optimized files);
    # smaller files decode whole into the mtime-validated LRU cache
    "geomodeling.windowed-read-limit": 64 * (1024**2),
    # accept raw view JSON in the WMS ``layers``/``coverage`` parameter
    # (the reference's ship-the-view pattern, handy in notebooks).  The
    # production entry point ``wms_serve.main`` turns this OFF whenever
    # named layers are registered: an unauthenticated client that can
    # construct arbitrary views can read any file on disk through
    # RasterFileSource + GetMap/GetFeatureInfo
    "geomodeling.wms-json-layers": True,
    # opt-in: requests at >= 2x-coarser resolution read the best
    # reduced-resolution (overview) IFD of a pyramided GeoTIFF instead
    # of the full grid (gdalwarp -ovr AUTO semantics; the reference's
    # plain ReprojectImage always reads full resolution, hence off by
    # default for bit-parity)
    "geomodeling.use-overviews": False,
    # with device-resident zonal aggregation, rasterize the bucket label
    # planes ON DEVICE from polygon edge arrays (ops/segment.py
    # rasterize_labels_scan) instead of uploading host-burned label tiles
    # — polygon features only; lines/points fall back to host labels
    "geomodeling.aggregate-device-labels": True,
    # data-dependent source alphabets: MemorySource/RasterFileSource scan
    # their pixel data once (cached) and, with at most this many distinct
    # values, declare the exact output alphabet — nearest-neighbour warps
    # are value-preserving, so whole warped/elemwise chains derive a
    # packed fetch codec (1-8 px per wire byte instead of 4-8 raw bytes).
    # 0/None disables the scan
    "geomodeling.source-alphabet-max": 4096,
    # skip the alphabet scan for file sources above this pixel count
    # (whole-file decode would be needed just to scan; windowed-read
    # files never decode whole)
    "geomodeling.source-alphabet-scan-px": 64 * (1024**2),
}


class Config:
    """Thread-safe key/value configuration with context-manager overrides."""

    def __init__(self, values):
        self._lock = threading.RLock()
        self._values = dict(values)

    def get(self, key, default=KeyError):
        with self._lock:
            if key in self._values:
                return self._values[key]
        if default is KeyError:
            raise KeyError(key)
        return default

    def set(self, values=None, **kwargs):
        """Set config values; returns a context manager restoring old values.

        Accepts a dict of dotted keys (``{"geomodeling.root": ...}``) and/or
        keyword arguments with ``__`` as the dot separator.
        """
        updates = dict(values or {})
        for key, val in kwargs.items():
            updates[key.replace("__", ".")] = val
        with self._lock:
            old = {k: self._values.get(k, _MISSING) for k in updates}
            self._values.update(updates)
        return _ConfigRestore(self, old)

    def __contains__(self, key):
        with self._lock:
            return key in self._values

    def _restore(self, old):
        with self._lock:
            for key, val in old.items():
                if val is _MISSING:
                    self._values.pop(key, None)
                else:
                    self._values[key] = val


class _ConfigRestore(ContextDecorator):
    def __init__(self, cfg, old):
        self._cfg = cfg
        self._old = old

    def __enter__(self):
        return self._cfg

    def __exit__(self, *exc):
        self._cfg._restore(self._old)
        return False


_MISSING = object()


def _env_overrides(environ=None):
    """Environment overrides, dask.config's convention (the reference
    rides dask.config, reference config.py:1-12, so deployments set
    ``DASK_GEOMODELING__RASTER_LIMIT=...``-style variables): strip the
    ``DASK_`` prefix, lowercase, ``__`` nests, ``_`` maps to ``-``;
    values parse as Python literals with a plain-string fallback.
    ``DASK_SCHEDULER`` sets the top-level ``scheduler`` key."""
    import ast
    import os

    out = {}
    for key, raw in (os.environ if environ is None else environ).items():
        if key == "DASK_SCHEDULER":
            out["scheduler"] = raw
            continue
        if not key.startswith("DASK_GEOMODELING__"):
            continue
        name = (
            key[len("DASK_GEOMODELING__"):]
            .lower()
            .replace("__", ".")
            .replace("_", "-")
        )
        if not name:
            continue
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        out["geomodeling." + name] = value
    return out


config = Config({**defaults, **_env_overrides()})
