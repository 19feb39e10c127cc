"""Bilinear warp resampling: host vs scipy ground truth, device vs host,
nearest default unchanged."""
from datetime import datetime, timedelta

import numpy as np
import pytest
from scipy import ndimage

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.ops.warp import warp_jax, warp_numpy


SRC_GT = (135000.0, 2.0, 0.0, 456000.0, 0.0, -2.0)


def _source(bands=1, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(bands, 30, 30) * 200).astype(np.float32)


def _warp_kwargs(**overrides):
    kwargs = dict(
        src_gt=SRC_GT,
        src_srs="EPSG:28992",
        no_data_value=None,
        bbox=(135010.0, 455930.0, 135050.0, 455990.0),
        projection="EPSG:28992",
        width=20,
        height=30,
        dtype=np.float32,
        fillvalue=-9999.0,
    )
    kwargs.update(overrides)
    return kwargs


def test_bilinear_matches_scipy_affine():
    """Same-CRS bilinear equals scipy map_coordinates(order=1) for
    in-extent windows (outside cells get fill, scipy clamps instead)."""
    values = _source()
    kwargs = _warp_kwargs(bbox=(135010.0, 455945.0, 135050.0, 455985.0), height=20)
    result = warp_numpy(values, interpolation="bilinear", **kwargs)

    # build the fractional index grids scipy expects
    x1, y1, x2, y2 = kwargs["bbox"]
    w, h = kwargs["width"], kwargs["height"]
    xs = x1 + (np.arange(w) + 0.5) * (x2 - x1) / w
    ys = y2 - (np.arange(h) + 0.5) * (y2 - y1) / h
    tx, ty = np.meshgrid(xs, ys)
    fc = (tx - SRC_GT[0]) / SRC_GT[1] - 0.5
    fr = (ty - SRC_GT[3]) / SRC_GT[5] - 0.5
    expected = ndimage.map_coordinates(
        values[0].astype(np.float64), [fr, fc], order=1, mode="nearest"
    ).astype(np.float32)
    np.testing.assert_allclose(result[0], expected, rtol=1e-6)


def test_bilinear_device_matches_host():
    from dask_geomodeling_tpu.runtime.executor import _ensure_x64

    _ensure_x64()
    values = _source(bands=2, seed=1)
    values[0, :5, :5] = 255.0
    for projection in ("EPSG:28992", "EPSG:3857"):
        from dask_geomodeling_tpu.geo import Extent

        bbox = (
            Extent((135010.0, 455930.0, 135050.0, 455990.0), "EPSG:28992")
            .transformed(projection)
            .bbox
        )
        kwargs = _warp_kwargs(
            bbox=bbox, projection=projection, no_data_value=255.0
        )
        with config.set({"geomodeling.warp-approx-stride": 1}):
            host = warp_numpy(values, interpolation="bilinear", **kwargs)
            device = np.asarray(
                warp_jax(values, interpolation="bilinear", **kwargs)
            )
        np.testing.assert_allclose(device, host, rtol=1e-5, atol=1e-3)


def test_bilinear_nodata_never_interpolated():
    """Cells adjacent to nodata become nodata instead of blending it in."""
    values = _source()
    values[0, 10:15, 10:15] = 255.0
    kwargs = _warp_kwargs(no_data_value=255.0)
    result = warp_numpy(values, interpolation="bilinear", **kwargs)
    # the fill never appears diluted: every output is either a clean blend
    # of valid neighbours or exactly the fillvalue
    assert ((result == -9999.0) | (result < 250.0)).all()
    assert (result == -9999.0).any()


def test_source_config_knob():
    """The warp-interpolation knob routes MemorySource reads through the
    bilinear path on both executors, with matching results."""
    from dask_geomodeling_tpu.raster import MemorySource

    source = MemorySource(
        data=_source(seed=2),
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=2.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=None,
    )
    # a half-pixel-shifted request forces real interpolation
    request = dict(
        mode="vals",
        bbox=(135001.0, 455941.0, 135041.0, 455981.0),
        projection="EPSG:28992",
        width=40,
        height=40,
        start=datetime(2000, 1, 1),
    )
    nearest = source.get_data(**request)
    with config.set({"geomodeling.warp-interpolation": "bilinear"}):
        host = source.get_data(**request)
        with config.set({"geomodeling.executor": "jax"}):
            device = source.get_data(**request)
    assert not np.array_equal(host["values"], nearest["values"])
    np.testing.assert_allclose(
        device["values"], host["values"], rtol=1e-5, atol=1e-3
    )


def test_out_of_domain_transform_yields_fill():
    """Regression: coordinates past the projection domain transform to
    NaN; XLA casts NaN->int32 as ZERO, which used to gather source pixel
    [0, 0] instead of returning fill (host numpy's NaN->INT64_MIN path
    was already outside).  Both paths and both interpolations must agree
    on fill."""
    from dask_geomodeling_tpu.runtime.executor import _ensure_x64

    _ensure_x64()
    values = np.full((1, 20, 20), 100.0, dtype=np.float32)
    # Lambert-93 source; the target bbox reaches latitude > 90
    kwargs = dict(
        src_gt=(600000.0, 100.0, 0.0, 6700000.0, 0.0, -100.0),
        src_srs="EPSG:2154",
        no_data_value=None,
        bbox=(2.0, 88.0, 4.0, 96.0),
        projection="EPSG:4326",
        width=8,
        height=16,
        dtype=np.float32,
        fillvalue=-9999.0,
    )
    with config.set({"geomodeling.warp-approx-stride": 1}):
        for interpolation in ("nearest", "bilinear"):
            host = warp_numpy(values, interpolation=interpolation, **kwargs)
            device = np.asarray(
                warp_jax(values, interpolation=interpolation, **kwargs)
            )
            assert (host == -9999.0).all(), interpolation
            np.testing.assert_array_equal(device, host)


def test_integer_bilinear_rounds():
    values = np.arange(100, dtype=np.uint8).reshape(1, 10, 10) * 2
    kwargs = _warp_kwargs(
        src_gt=(0.0, 1.0, 0.0, 10.0, 0.0, -1.0),
        bbox=(0.5, 0.5, 8.5, 8.5),
        width=8,
        height=8,
        dtype=np.uint8,
        fillvalue=255,
    )
    result = warp_numpy(values, interpolation="bilinear", **kwargs)
    assert result.dtype == np.uint8
    # interior: average of 4 neighbours of the *2 ramp stays exact
    assert (result[0, 1:-1, 1:-1] % 1 == 0).all()
