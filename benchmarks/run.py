"""The five BASELINE.json benchmark configs, host executor vs jax executor.

Usage::

    python benchmarks/run.py [--px 1024]

Prints one line per config with megapixels/second for the host (numpy,
reference-semantics) path and the jax path, plus the speedup. Runs on
whatever jax backend is active (CPU in CI, TPU when attached); on a
tunneled TPU the jax numbers are fetch-bound — see bench.py for the
headline tile-batched measurement.
"""
import argparse
import os
import sys
import time
from datetime import datetime, timedelta

import numpy as np

# runnable as `python benchmarks/run.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.geo.geometry import box
from dask_geomodeling_tpu.geometry import AggregateRaster
from dask_geomodeling_tpu.raster import (
    Add,
    Classify,
    Cumulative,
    Dilate,
    HillShade,
    Mask,
    MaskBelow,
    MemorySource,
    MovingMax,
    Multiply,
    Reclassify,
    Smooth,
    TemporalAggregate,
)
from tests.factories import MockGeometry


def make_source(px, bands=1, seed=0, levels=None):
    """A float32 source; ``levels`` quantizes the data onto that many
    distinct values (uint8/int16-style data stored as float — the
    overwhelming real-world case, and what the data-dependent source
    alphabet scan detects)."""
    rng = np.random.RandomState(seed)
    if levels:
        data = (rng.randint(0, levels, (bands, px, px)) * 0.5).astype(
            np.float32
        )
    else:
        data = (rng.rand(bands, px, px) * 200).astype(np.float32)
    return MemorySource(
        data=data,
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000.0, 456000.0),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1) if bands > 1 else None,
    )


def vals_request(px, projection="EPSG:28992", out_px=None):
    out_px = out_px or px
    return dict(
        mode="vals",
        bbox=(135000.0, 456000.0 - px, 135000.0 + px, 456000.0),
        projection=projection,
        width=out_px,
        height=out_px,
        start=datetime(2000, 1, 1),
        stop=datetime(2000, 1, 2),
    )


def configs(px):
    source = make_source(px)
    temporal = make_source(px // 4, bands=8, seed=1)
    request = vals_request(px)

    # 4: cross-CRS warp request (EPSG:3857 bbox over the same source)
    from dask_geomodeling_tpu.geo import Extent

    warp_request = dict(
        request,
        projection="EPSG:3857",
        bbox=Extent(request["bbox"], "EPSG:28992").transformed("EPSG:3857").bbox,
    )

    geom = MockGeometry(
        [
            [(135000 + i * 40, 455800), (135000 + i * 40 + 30, 455800),
             (135000 + i * 40 + 30, 455900), (135000 + i * 40, 455900)]
            for i in range(8)
        ],
        properties=[{"id": i} for i in range(8)],
        projection="EPSG:28992",
    )

    return [
        ("elemwise", Mask(Multiply(Add(source, 1.0), 2.0), 7.0), request),
        (
            "reclassify-chain",
            Reclassify(
                Classify(MaskBelow(source, 10.0), bins=[50.0, 100.0, 150.0]),
                data=[[0, 1], [1, 5], [2, 9], [3, 13]],
            ),
            request,
        ),
        ("stencils", HillShade(Smooth(MovingMax(source, 3), 5)), request),
        ("reproject", Add(source, 1.0), warp_request),
        # the same warp over quantized data: the source alphabet scan
        # (raster/sources.py) hands the float32 output a palette codec,
        # so the fetch ships 1 byte/px instead of 4 (runtime/fetchcodec)
        (
            "reproject-discrete",
            Add(make_source(px, seed=3, levels=250), 1.0),
            warp_request,
        ),
        (
            "temporal+zonal",
            TemporalAggregate(temporal, "4h", statistic="mean"),
            vals_request(px // 4),
        ),
    ]


def time_once(view, request):
    t0 = time.perf_counter()
    data = view.get_data(**request)
    elapsed = time.perf_counter() - t0
    assert data is not None
    return elapsed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--px", type=int, default=1024)
    args = parser.parse_args()
    px = args.px

    # warm-start repeated runs (same cache dir as bench.py)
    config.set(
        {
            "geomodeling.compilation-cache": os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".xla_cache",
            )
        }
    )

    from dask_geomodeling_tpu.runtime import router

    # benchmark hygiene: explore from scratch and never read from or
    # write into the user's persistent routing cache
    config.set({"geomodeling.router-state": None})

    print(
        "%-18s %12s %12s %12s %8s %9s"
        % ("config", "host Mpx/s", "jax Mpx/s", "auto Mpx/s", "jax/host", "auto/host")
    )
    for name, view, request in configs(px):
        mpx = request["width"] * request["height"] / 1e6
        with config.set({"geomodeling.executor": "numpy"}):
            view.get_data(**request)  # host warmup
        with config.set({"geomodeling.executor": "jax"}):
            view.get_data(**request)  # compile warmup
        # auto: run the exploration phase (host, compile, device measure)
        router.reset(reseed=False)
        with config.set({"geomodeling.executor": "auto"}):
            for _ in range(4):
                view.get_data(**request)
        # paired timing: columns interleave within each round so drift
        # hits them equally; auto runs before jax so a jax run's
        # background cleanup never drags the auto measurement
        host_times, jax_times, auto_times = [], [], []
        for _ in range(4):
            with config.set({"geomodeling.executor": "numpy"}):
                host_times.append(time_once(view, request))
            with config.set({"geomodeling.executor": "auto"}):
                auto_times.append(time_once(view, request))
            with config.set({"geomodeling.executor": "jax"}):
                jax_times.append(time_once(view, request))
        host = mpx / min(host_times)
        jax_v = mpx / min(jax_times)
        auto_v = mpx / min(auto_times)
        routes = {
            ("jax" if s["jax"] is not None
             and s["jax"] >= 1.15 * (s["numpy"] or 1e9) else "host")
            for s in router.stats().values()
            if s["numpy"] is not None
        }
        print(
            "%-18s %12.2f %12.2f %12.2f %7.1fx %8.1fx  route=%s"
            % (
                name, host, jax_v, auto_v, jax_v / host, auto_v / host,
                ",".join(sorted(routes)) or "host",
            )
        )

    # zonal statistics on host (scipy) vs the single-dispatch batched
    # device segment reductions: a temporal stack and a realistic feature
    # count, so the (buckets x frames) batching has something to amortize.
    # Capped at 2048 px: above that the aggregation grid would trip the
    # reference-semantics raster-limit admission check (the temporal
    # config caps at px//4 for the same reason)
    px = min(px, 2048)
    n_geom = 64
    grid = int(np.ceil(np.sqrt(n_geom)))
    cell = px // grid
    geom = MockGeometry(
        [
            [
                (135000 + (i % grid) * cell, 456000 - px + (i // grid) * cell),
                (135000 + (i % grid) * cell + cell - 2, 456000 - px + (i // grid) * cell),
                (135000 + (i % grid) * cell + cell - 2, 456000 - px + (i // grid) * cell + cell - 2),
                (135000 + (i % grid) * cell, 456000 - px + (i // grid) * cell + cell - 2),
            ]
            for i in range(n_geom)
        ],
        properties=[{"id": i} for i in range(n_geom)],
        projection="EPSG:28992",
    )
    zonal_source = make_source(px, bands=8, seed=2)
    geo_request = dict(
        mode="intersects",
        geometry=box(135000, 456000 - px, 135000 + px, 456000),
        projection="EPSG:28992",
        start=datetime(2000, 1, 1),
        stop=datetime(2000, 1, 2),
    )
    print(
        "%-18s %10s %10s %10s %10s %9s %9s %9s"
        % ("zonal (s/req)", "host", "upload", "resident", "auto",
           "host/up", "host/res", "host/auto")
    )
    for statistic in ("mean", "median", "std", "p90"):
        agg = AggregateRaster(geom, zonal_source, statistic=statistic)
        with config.set({"geomodeling.executor": "numpy"}):
            agg.get_data(**geo_request)
            host = min(time_once(agg, geo_request) for _ in range(2))
        # device masks + stats, frames uploaded from host
        with config.set(
            {
                "geomodeling.aggregate-device": True,
                "geomodeling.executor": "numpy",
            }
        ):
            agg.get_data(**geo_request)
            upload = min(time_once(agg, geo_request) for _ in range(2))
        # device-RESIDENT: the raster subtree stages on device and the
        # frames never cross the host link (jax_accepts_device_arrays)
        with config.set(
            {
                "geomodeling.aggregate-device": True,
                "geomodeling.executor": "jax",
            }
        ):
            agg.get_data(**geo_request)
            resident = min(time_once(agg, geo_request) for _ in range(2))
        # the DEFAULT policy: device only where the rows above say it wins
        with config.set(
            {
                "geomodeling.aggregate-device": "auto",
                "geomodeling.executor": "jax",
            }
        ):
            agg.get_data(**geo_request)
            auto = min(time_once(agg, geo_request) for _ in range(2))
        print(
            "%-18s %10.3f %10.3f %10.3f %10.3f %8.1fx %8.1fx %8.1fx"
            % (
                statistic, host, upload, resident, auto,
                host / upload, host / resident, host / auto,
            )
        )


if __name__ == "__main__":
    main()
