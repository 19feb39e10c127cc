"""Generative executor equivalence: random view trees evaluated under the
host and jax executors must agree bitwise. This is the broad-spectrum net
for subtle device-twin semantics bugs (dtype promotion, nodata rules,
literal handling) that targeted tests might miss."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu import raster as R


@pytest.fixture(scope="module")
def sources():
    rng = np.random.RandomState(7)
    uint8 = R.MemorySource(
        data=(rng.rand(2, 12, 12) * 250).astype(np.uint8),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )
    f32_data = (rng.rand(2, 12, 12) * 100).astype(np.float32)
    f32_data[0, :3, :3] = np.float32(np.finfo(np.float32).max)  # nodata
    f32 = R.MemorySource(
        data=f32_data,
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )
    return [uint8, f32]


def random_view(rng, sources, depth):
    """Build a random block tree of the given depth."""
    if depth == 0:
        return sources[rng.randint(len(sources))]

    def sub():
        return random_view(rng, sources, depth - 1)

    choice = rng.randint(16)
    const = float(np.round(rng.rand() * 20 + 1, 2))
    if choice == 0:
        return R.Add(sub(), const)
    if choice == 1:
        return R.Multiply(sub(), const)
    if choice == 2:
        return R.Subtract(sub(), const)
    if choice == 3:
        return R.Add(sub(), sub())
    if choice == 4:
        return R.Greater(sub(), const)
    if choice == 5:
        return R.Mask(sub(), value=int(const))
    if choice == 6:
        return R.MaskBelow(sub(), int(const))
    if choice == 7:
        return R.Classify(sub(), bins=[10.0, 50.0, 120.0])
    if choice == 8:
        return R.FillNoData(sub(), sub())
    if choice == 9:
        return R.Step(sub(), left=1, right=2, value=int(const), at=3)
    if choice == 10:
        return R.Reclassify(
            R.Classify(sub(), bins=[10.0, 50.0, 120.0]),
            data=[[1, 7.0], [2, 3.5]],
        )
    if choice == 11:
        return R.Power(sub(), 2)
    if choice == 12:
        inner = sub()
        if inner.dtype == np.dtype("bool"):
            return inner  # IsData/IsNoData reject boolean inputs
        return R.IsData(inner) if rng.rand() < 0.5 else R.IsNoData(inner)
    if choice == 13:
        return R.Max(sub(), sub())
    if choice == 14:
        first, second = sub(), sub()
        if np.result_type(first.dtype, second.dtype) == np.dtype(bool):
            # Group of two boolean rasters has no representable fill
            # value (get_dtype_max(bool) raises, same as the reference)
            first = R.Add(first, 1)  # promotes to an integer raster
        return R.Group(first, second)
    return R.Clip(sub(), R.Greater(sub(), const))


@pytest.fixture
def request_full():
    return dict(
        mode="vals",
        start=datetime(2000, 1, 1),
        stop=datetime(2000, 1, 1, 1),
        width=12,
        height=12,
        bbox=(135000, 455994, 135006, 456000),
        projection="EPSG:28992",
    )


@pytest.mark.parametrize("seed", range(40))
def test_random_view_equivalence(sources, request_full, seed):
    rng = np.random.RandomState(seed)
    view = random_view(rng, sources, depth=rng.randint(2, 5))
    expected = view.get_data(**request_full)
    with config.set({"geomodeling.executor": "jax"}):
        actual = view.get_data(**request_full)
    if expected is None:
        assert actual is None
        return
    assert actual["values"].dtype == expected["values"].dtype
    assert actual["no_data_value"] == expected["no_data_value"]
    assert_values_match(actual["values"], expected["values"])


def assert_values_match(actual, expected):
    """Bitwise for integer/bool dtypes; last-ULP tolerance for floats
    (XLA expands transcendentals like pow differently than libm)."""
    if expected.dtype.kind in "f":
        np.testing.assert_allclose(actual, expected, rtol=1e-6)
    else:
        np.testing.assert_array_equal(actual, expected)


@pytest.mark.parametrize("seed", range(40, 55))
def test_random_view_tiled_equivalence(sources, seed):
    """Random trees through the batched tile runtime (vmapped programs)."""
    from dask_geomodeling_tpu.runtime.tiles import NotLowerable, evaluate_tiled

    rng = np.random.RandomState(seed)
    view = random_view(rng, sources, depth=rng.randint(2, 4))
    request = dict(
        mode="vals",
        start=datetime(2000, 1, 1),
        stop=datetime(2000, 1, 1),
        width=12,
        height=12,
        bbox=(135000, 455994, 135006, 456000),
        projection="EPSG:28992",
    )
    expected = view.get_data(**request)
    try:
        actual = evaluate_tiled(view, request, tile_size=6, batch=2)
    except NotLowerable:
        pytest.skip("tree contains a host-only node")
    assert_values_match(actual["values"], expected["values"])


class TestWarpFuzz:
    """The device warp (traced CRS math + gather) must reproduce the host
    warp across projection families and random windows."""

    CRS_PAIRS = [
        ("EPSG:28992", "EPSG:4326"),
        ("EPSG:28992", "EPSG:3857"),
        ("EPSG:28992", "EPSG:3395"),
        ("EPSG:28992", "EPSG:32631"),
        ("EPSG:28992", "EPSG:2154"),
        ("EPSG:28992", "EPSG:3035"),
        ("EPSG:28992", "EPSG:27700"),
        # round-2 additions: equidistant cylindrical, Cassini-Soldner,
        # Hotine oblique Mercator, LCC-1SP with scale factor
        ("EPSG:28992", "+proj=eqc +lat_ts=45 +lon_0=5 +ellps=WGS84 +towgs84=0,0,0"),
        ("EPSG:28992", "+proj=cass +lat_0=52 +lon_0=5 +ellps=WGS84 +towgs84=0,0,0"),
        (
            "EPSG:28992",
            "+proj=omerc +lat_0=52 +lonc=5 +alpha=45 +gamma=45 +k_0=0.9999 "
            "+ellps=WGS84 +towgs84=0,0,0",
        ),
        (
            "EPSG:28992",
            "+proj=lcc +lat_0=52 +lon_0=5 +k_0=0.9999 +x_0=600000 "
            "+y_0=2200000 +ellps=WGS84 +towgs84=0,0,0",
        ),
        ("EPSG:28992", "+proj=krovak +ellps=bessel +towgs84=589,76,480"),
        # round-3 additions: the long-tail families (incl. the generic
        # Newton-inverted path used by robin/vandg)
        ("EPSG:28992", "+proj=poly +lat_0=52 +lon_0=5 +ellps=WGS84 +towgs84=0,0,0"),
        ("EPSG:28992", "+proj=bonne +lat_1=52 +lon_0=5 +ellps=WGS84 +towgs84=0,0,0"),
        ("EPSG:28992", "+proj=sinu +lon_0=5 +ellps=WGS84 +towgs84=0,0,0"),
        ("EPSG:28992", "+proj=cea +lat_ts=45 +lon_0=5 +ellps=WGS84 +towgs84=0,0,0"),
        ("EPSG:28992", "+proj=aeqd +lat_0=52 +lon_0=5 +ellps=WGS84 +towgs84=0,0,0"),
        ("EPSG:28992", "+proj=eqearth +ellps=WGS84 +towgs84=0,0,0"),
        ("EPSG:28992", "+proj=robin +ellps=WGS84 +towgs84=0,0,0"),
        ("EPSG:28992", "+proj=somerc +lat_0=52 +lon_0=5 +ellps=WGS84 +towgs84=0,0,0"),
    ]

    @pytest.mark.parametrize("dst", [pair[1] for pair in CRS_PAIRS])
    def test_exact_warp_matches_host(self, dst):
        from dask_geomodeling_tpu.geo import Extent
        from dask_geomodeling_tpu.ops.warp import warp_jax, warp_numpy
        from dask_geomodeling_tpu.runtime.executor import _ensure_x64

        _ensure_x64()  # f64 coordinate math, as the executor guarantees

        rng = np.random.RandomState(hash(dst) % 2**31)
        values = (rng.rand(2, 20, 20) * 200).astype(np.float32)
        values[0, :4, :4] = 255.0
        src_gt = (135000.0, 2.0, 0.0, 456000.0, 0.0, -2.0)

        for _ in range(3):
            # a random sub-window of the source footprint, in dst CRS
            x1 = 135000 + rng.rand() * 10
            y2 = 456000 - rng.rand() * 10
            x2 = x1 + 10 + rng.rand() * 15
            y1 = y2 - 10 - rng.rand() * 15
            bbox = Extent((x1, y1, x2, y2), "EPSG:28992").transformed(dst).bbox
            kwargs = dict(
                src_gt=src_gt,
                src_srs="EPSG:28992",
                no_data_value=255.0,
                bbox=bbox,
                projection=dst,
                width=16,
                height=16,
                dtype=np.float32,
                fillvalue=255.0,
            )
            with config.set({"geomodeling.warp-approx-stride": 1}):
                expected = warp_numpy(values, **kwargs)
                actual = np.asarray(warp_jax(values, **kwargs))
            np.testing.assert_array_equal(actual, expected)
