"""Benchmark: the BASELINE.json headline view on real hardware.

View: Reclassify(Classify(Smooth(source + 1))) requested across a CRS
boundary (EPSG:28992 source, EPSG:3857 request) — reproject + map algebra +
stencil, the north-star pipeline — evaluated over a 10000x10000 px request
as 512^2 tiles.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"} — a
provisional host-baseline line as soon as the baseline is measured, then
one final line that supersedes it (consumers take the LAST line).  This
way an external kill mid-device-phase still leaves a parsed result.

value        = megapixels/sec/chip with the XLA executor
vs_baseline  = speedup over the numpy host executor (the stand-in for the
               reference's dask synchronous scheduler: same numpy/scipy
               compute path, same tiling; dask itself is not installed in
               this image).  Measured, not cited — the reference publishes
               no numbers (BASELINE.md).
"""
import json
import os
import sys
import time
from datetime import datetime, timedelta

import numpy as np


def build_view(source_px=8192):
    from dask_geomodeling_tpu.raster import Classify, MemorySource, Reclassify, Smooth

    rng = np.random.RandomState(42)
    data = (rng.rand(1, source_px, source_px) * 250).astype(np.float32)
    data[0, :64, :64] = np.float32(np.finfo(np.float32).max)  # nodata patch

    source = MemorySource(
        data=data,
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(85000, 455000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )
    view = Classify(
        # the final Classify gives a compact uint8 output (fetch-friendly)
        Reclassify(
            Classify(Smooth(source + 1, size=3), bins=[50.0, 100.0, 150.0, 200.0]),
            data=[[0, 1], [1, 5], [2, 9], [3, 13], [4, 17]],
        ),
        bins=[4, 8, 12, 16],
    )
    return source, view


def tile_requests(source, out_px, tile):
    """Tile the reprojected full extent into tile x tile requests."""
    from dask_geomodeling_tpu.geo import Extent

    x1, y1, x2, y2 = (
        Extent(
            source.geo_transform.get_bbox((0, 0), source.data.shape[1:]),
            source.projection,
        )
        .transformed("EPSG:3857")
        .bbox
    )
    n = out_px // tile
    dx = (x2 - x1) / n
    dy = (y2 - y1) / n
    requests = []
    for j in range(n):
        for i in range(n):
            requests.append(
                dict(
                    mode="vals",
                    bbox=(x1 + i * dx, y1 + j * dy, x1 + (i + 1) * dx, y1 + (j + 1) * dy),
                    projection="EPSG:3857",
                    width=tile,
                    height=tile,
                    start=datetime(2000, 1, 1),
                )
            )
    return requests


def run_numpy(view, requests):
    from dask_geomodeling_tpu import config

    with config.set({"geomodeling.executor": "numpy"}):
        t0 = time.perf_counter()
        for request in requests:
            result = view.get_data(**request)
        elapsed = time.perf_counter() - t0
    assert result is not None
    return elapsed


def full_request(source, out_px):
    from dask_geomodeling_tpu.geo import Extent

    bbox = (
        Extent(
            source.geo_transform.get_bbox((0, 0), source.data.shape[1:]),
            source.projection,
        )
        .transformed("EPSG:3857")
        .bbox
    )
    return dict(
        mode="vals",
        bbox=bbox,
        projection="EPSG:3857",
        width=out_px,
        height=out_px,
        start=datetime(2000, 1, 1),
    )


def main():
    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.runtime.tiles import evaluate_tiled

    # warm-start repeated runs: XLA's persistent compilation cache lives
    # next to the repo so the minutes-long tunnel compile happens once
    config.set(
        {
            "geomodeling.compilation-cache": os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".xla_cache"
            )
        }
    )

    # 10240 px = 400 tiles of 512^2 (the north-star 10k x 10k shape): 7
    # batches of 64 reach steady-state compute/fetch pipelining, measured
    # ~30% above the 2-batch 5120 default (BASELINE.md round-2 sweep).
    # The repo-local .xla_cache warm-starts the otherwise ~5 min tunnel
    # compile of the batched program.
    def note(message):
        # phase timestamps on stderr: the tunnel can stall for minutes,
        # and the driver's log should show WHERE (stdout stays one JSON)
        print(
            "# %s %s" % (time.strftime("%H:%M:%S"), message),
            file=sys.stderr,
            flush=True,
        )

    out_px = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    tile = 512
    source, view = build_view()
    requests = tile_requests(source, out_px, tile)
    request = full_request(source, out_px)
    total_mpx = out_px * out_px / 1e6

    # numpy baseline (the reference's dask-sync equivalent) on a subset
    note("host baseline starting")
    run_numpy(view, requests[:1])  # warmup
    n_base = max(len(requests) // 20, 4)
    base_elapsed = run_numpy(view, requests[:n_base]) * (len(requests) / n_base)
    baseline = total_mpx / base_elapsed
    note("host baseline done (%.1f Mpx/s); device warmup next" % baseline)

    def emit(value, telemetry):
        print(
            json.dumps(
                {
                    "metric": "mpx_per_sec_per_chip_reclassify_smooth_reproject_512tiles",
                    "value": round(value, 2),
                    "unit": "megapixel/s",
                    "vs_baseline": round(value / baseline, 2),
                    **telemetry,
                }
            ),
            flush=True,
        )

    # Provisional line FIRST: if the driver (or an 11-hour tunnel outage)
    # kills this process before the device phase finishes, the host
    # baseline is already on record instead of `parsed: null` (round-3
    # artifact failure).  The final line below supersedes it — the driver
    # takes the last JSON line on stdout.
    emit(baseline, {"note": "host-provisional"})

    # The device phase runs in a daemon thread under a wall-clock deadline:
    # a tunnel outage manifests as a HANG (jax re-claims the backend every
    # ~25 min without raising), and an externally killed bench leaves the
    # driver without its JSON line.  The watchdog converts a stall into the
    # host-fallback data point.  2400 s covers the worst healthy case: a
    # fresh 6-10 min tunnel compile + a 300 s first fetch + 9 timed runs.
    outcome = {}

    def device_phase():
        # warmup with the REAL request shape (jit compile of the batched
        # program + source HBM upload + tunnel initialization), then time
        # several steady-state runs; the number of record is the MEDIAN
        # (tunneled fetch rates swing up to 3x with time of day — the
        # min/max spread and a raw fetch-bandwidth probe ship as telemetry
        # so regressions separate from tunnel weather)
        result = evaluate_tiled(view, request, tile_size=tile, batch=64)
        note("device warmup done; spot check next")
        # correctness spot check: a host-path crop must match bit-exactly
        check = dict(request)
        x1, y1, x2, y2 = request["bbox"]
        n = 64
        frac_x = (x2 - x1) * n / out_px
        frac_y = (y2 - y1) * n / out_px
        check.update(
            bbox=(x1, y2 - frac_y, x1 + frac_x, y2), width=n, height=n
        )
        from dask_geomodeling_tpu import config as _cfg

        with _cfg.set({"geomodeling.executor": "numpy"}):
            expected = view.get_data(**check)
        np.testing.assert_array_equal(
            result["values"][:, :n, :n], expected["values"]
        )
        runs = []
        # tunnel throughput jitters up to 3x run to run (same-session
        # swings of 27-86 Mpx/s measured); nine samples keep the median
        # robust against a slow-transfer cluster
        for index in range(9):
            t0 = time.perf_counter()
            result = evaluate_tiled(view, request, tile_size=tile, batch=64)
            runs.append(time.perf_counter() - t0)
            note(
                "timed run %d/9: %.1f Mpx/s"
                % (index + 1, total_mpx / runs[-1])
            )
        assert result["values"].shape[-1] == out_px
        runs.sort()
        median = total_mpx / runs[len(runs) // 2]
        probe = round(measure_fetch_bandwidth(), 2)
        outcome["value"] = median
        outcome["telemetry"] = {
            "mpx_per_sec_min": round(total_mpx / runs[-1], 2),
            "mpx_per_sec_max": round(total_mpx / runs[0], 2),
            "tunnel_fetch_mb_per_sec": probe,
            # Mpx/s per probed MB/s: the tunnel-weather-independent
            # regression metric (stable at ~1.76 across rounds 2-4 while
            # absolute Mpx/s swung 3x with time of day)
            "wire_efficiency_mpx_per_mb": round(median / max(probe, 1e-9), 3),
        }

    import threading

    worker = threading.Thread(target=_guarded(device_phase, outcome), daemon=True)
    worker.start()
    # 1200 s default: beats any plausible driver timeout (round 3's 2400 s
    # did not), while still covering a cached-compile run; a FRESH tunnel
    # compile won't fit — the provisional line above is the safety net.
    worker.join(float(os.environ.get("BENCH_DEVICE_DEADLINE", "1200")))
    telemetry = outcome.get("telemetry", {})
    if worker.is_alive():
        # never leave the driver without a data point: report the host path
        note("device phase still running at deadline; host fallback")
        value = baseline
        telemetry = {"note": "device-deadline"}
    elif "error" in outcome:
        print("# jax path failed: %r" % outcome["error"], file=sys.stderr)
        value = baseline
        telemetry = {"note": "device-error"}
    else:
        value = outcome["value"]
    emit(value, telemetry)
    if worker.is_alive():
        # a stuck tunnel fetch would wedge interpreter teardown (jax's
        # atexit handlers talk to the broken backend) — exit hard, the
        # JSON line above is already flushed
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


def _guarded(fn, outcome):
    """Wrap the device phase so thread exceptions land in `outcome`."""

    def runner():
        try:
            fn()
        except BaseException as e:  # the watchdog decides what to report
            outcome["error"] = e

    return runner


def measure_fetch_bandwidth(nbytes=4 * 1024 * 1024):
    """Raw device->host tunnel bandwidth (MB/s) via a dummy fetch."""
    import jax
    import jax.numpy as jnp

    buf = jax.jit(lambda: jnp.arange(nbytes, dtype=jnp.uint8))()
    buf.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(buf)
    return nbytes / (time.perf_counter() - t0) / 1e6


if __name__ == "__main__":
    main()
