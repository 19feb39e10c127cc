"""Spatial stencil tests (modeled on the reference tests/test_raster_spatial
coverage in test_raster.py): halo expansion, Dilate/MovingMax/Smooth/
HillShade/Place, numpy-vs-scipy ground truth, and jax-vs-numpy equivalence.
"""
from datetime import datetime, timedelta

import numpy as np
import pytest
from scipy import ndimage

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import (
    Dilate,
    HillShade,
    Max,
    MemorySource,
    MovingMax,
    Place,
    Smooth,
)
from dask_geomodeling_tpu.raster.spatial import (
    expand_request_meters,
    expand_request_pixels,
)


@pytest.fixture(scope="module")
def sparse_source():
    data = np.zeros((1, 20, 20), dtype=np.uint8)
    data[0, 10, 10] = 7
    data[0, 5, 5] = 3
    data[0, 0, 0] = 255  # nodata
    return MemorySource(
        data=data,
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture(scope="module")
def float_source():
    rng = np.random.RandomState(7)
    data = (rng.rand(1, 20, 20) * 100).astype(np.float64)
    return MemorySource(
        data=data,
        no_data_value=float(np.finfo(np.float64).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture
def request_20(sparse_source):
    return {
        "mode": "vals",
        "start": datetime(2000, 1, 1),
        "stop": datetime(2000, 1, 1),
        "width": 20,
        "height": 20,
        "bbox": (135000, 455980, 135020, 456000),
        "projection": "EPSG:28992",
    }


class TestRequestExpansion:
    def test_expand_pixels(self):
        request = {
            "mode": "vals",
            "bbox": (0, 0, 10, 10),
            "width": 10,
            "height": 10,
        }
        out = expand_request_pixels(request, radius=2)
        assert out["bbox"] == (-2, -2, 12, 12)
        assert out["width"] == 14 and out["height"] == 14

    def test_expand_pixels_point(self):
        request = {"mode": "vals", "bbox": (1, 1, 1, 1), "width": 1, "height": 1}
        assert expand_request_pixels(request) is None

    def test_expand_pixels_time(self):
        assert expand_request_pixels({"mode": "time"}) is None

    def test_expand_meters(self):
        request = {
            "mode": "vals",
            "bbox": (0, 0, 10, 10),
            "width": 10,
            "height": 10,
            "projection": "EPSG:28992",
        }
        out, radius_px = expand_request_meters(request, radius_m=3)
        assert out["bbox"] == (-3, -3, 13, 13)
        assert out["width"] == 16 and out["height"] == 16
        assert radius_px == [3, 3]

    def test_expand_meters_geographic(self):
        request = {
            "mode": "vals",
            "bbox": (5.0, 52.0, 5.01, 52.01),
            "width": 10,
            "height": 10,
            "projection": "EPSG:4326",
        }
        out, radius_px = expand_request_meters(request, radius_m=100)
        assert out["bbox"][0] < 5.0
        assert out["width"] > 10


class TestDilate:
    def test_dilate(self, sparse_source, request_20):
        data = Dilate(sparse_source, values=[7]).get_data(**request_20)
        values = data["values"][0]
        # 3x3 cross around (10, 10)
        assert values[10, 10] == 7
        assert values[9, 10] == 7 and values[11, 10] == 7
        assert values[10, 9] == 7 and values[10, 11] == 7
        assert values[9, 9] == 0  # diagonal not dilated (cross-shaped)
        assert values[5, 5] == 3  # untouched other value

    def test_dilate_matches_scipy(self, sparse_source, request_20):
        data = Dilate(sparse_source, values=[7, 3]).get_data(**request_20)
        raw = sparse_source.get_data(**request_20)["values"]
        expected = raw.copy()
        for v in [7, 3]:
            expected[ndimage.binary_dilation(raw == v)] = v
        np.testing.assert_array_equal(data["values"], expected)

    def test_dilate_jax_matches(self, sparse_source, request_20):
        view = Dilate(sparse_source, values=[7, 3])
        expected = view.get_data(**request_20)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_20)
        np.testing.assert_array_equal(actual["values"], expected["values"])

    def test_dilate_jax_matches_multiband(self):
        """scipy's default structure on a rank-3 array dilates across the
        band axis; the jax twin must too (round-4 regression: single-band
        fixtures hid the missing temporal dilation)."""
        from datetime import datetime, timedelta

        rng = np.random.RandomState(11)
        data = (rng.rand(4, 24, 24) * 3).astype("u1")
        source = MemorySource(
            data=data,
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )
        request = dict(
            mode="vals",
            bbox=(135000, 456000 - 24, 135000 + 24, 456000),
            projection="EPSG:28992",
            width=24,
            height=24,
            start=datetime(2000, 1, 1),
            stop=datetime(2000, 1, 2),
        )
        view = Dilate(source, values=[2])
        expected = view.get_data(**request)
        assert expected["values"].shape[0] == 4
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request)
        np.testing.assert_array_equal(actual["values"], expected["values"])


class TestMovingMax:
    def test_moving_max(self, sparse_source, request_20):
        data = MovingMax(sparse_source, size=3).get_data(**request_20)
        values = data["values"][0]
        assert values[9:12, 9:12].max() == 7
        assert values[9, 9] == 7  # 3x3 footprint includes diagonal-ish circle

    def test_size_rounding(self, sparse_source):
        assert MovingMax(sparse_source, 4).size == 5  # rounds to nearest odd
        with pytest.raises(ValueError):
            MovingMax(sparse_source, 1)

    def test_moving_max_matches_scipy(self, sparse_source, request_20):
        from dask_geomodeling_tpu.geo import get_footprint

        for size in (3, 5, 7):
            data = MovingMax(sparse_source, size=size).get_data(**request_20)
            raw = sparse_source.get_data(**request_20)["values"].copy()
            nodata_mask = raw == 255
            raw[nodata_mask] = 0  # dtype min for uint8
            expected = ndimage.maximum_filter(
                raw, footprint=get_footprint(size)[np.newaxis]
            )
            expected[(expected == 0) & nodata_mask] = 255
            np.testing.assert_array_equal(data["values"], expected, err_msg=str(size))

    def test_moving_max_jax_matches(self, sparse_source, request_20):
        for size in (3, 5):
            view = MovingMax(sparse_source, size=size)
            expected = view.get_data(**request_20)
            with config.set({"geomodeling.executor": "jax"}):
                actual = view.get_data(**request_20)
            np.testing.assert_array_equal(actual["values"], expected["values"])


class TestSmooth:
    def test_smooth_exact(self, float_source, request_20):
        data = Smooth(float_source, size=3).get_data(**request_20)
        raw = float_source.get_data(**request_20)["values"]
        # smoothing preserves the mean approximately (away from edges)
        assert data["values"].shape == raw.shape
        assert abs(data["values"][0, 5:15, 5:15].mean() - raw[0, 5:15, 5:15].mean()) < 5
        assert data["values"].std() < raw.std()  # smoother

    def test_smooth_zoom_mode(self, float_source, request_20):
        # a large size triggers zoom mode (margin > 6 px)
        data = Smooth(float_source, size=10).get_data(**request_20)
        assert data["values"].shape == (1, 20, 20)

    def test_smooth_validation(self, float_source):
        with pytest.raises(TypeError):
            Smooth(float_source, "a lot")

    def test_smooth_jax_close(self, float_source, request_20):
        view = Smooth(float_source, size=3)
        expected = view.get_data(**request_20)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_20)
        np.testing.assert_allclose(
            actual["values"], expected["values"], rtol=1e-6, atol=1e-9
        )


class TestHillShade:
    @pytest.fixture(scope="class")
    def dem_source(self):
        y, x = np.mgrid[0:20, 0:20]
        dem = (x + y).astype(np.float64)  # a tilted plane
        return MemorySource(
            data=dem[np.newaxis],
            no_data_value=-9999.0,
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )

    def test_hillshade(self, dem_source, request_20):
        view = HillShade(dem_source)
        assert view.dtype == np.uint8
        assert view.fillvalue == 256
        data = view.get_data(**request_20)
        assert data["values"].dtype == np.uint8
        assert data["no_data_value"] == 256
        # a constant-slope plane has constant shading away from edges
        interior = data["values"][0, 5:15, 5:15]
        assert len(np.unique(interior)) == 1

    def test_hillshade_jax_close(self, dem_source, request_20):
        view = HillShade(dem_source)
        expected = view.get_data(**request_20)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_20)
        # float32 rounding at the uint8 cast may differ by 1
        diff = actual["values"].astype(int) - expected["values"].astype(int)
        assert np.abs(diff).max() <= 1


class TestPlace:
    @pytest.fixture(scope="class")
    def stamp_source(self):
        data = np.full((1, 4, 4), 9, dtype=np.uint8)
        return MemorySource(
            data=data,
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )

    def test_place(self, stamp_source, request_20):
        # place the 4x4 stamp (anchored at its center) at two locations
        view = Place(
            stamp_source,
            place_projection="EPSG:28992",
            anchor=(135002, 455998),
            coordinates=[(135005, 455990), (135015, 455985)],
        )
        data = view.get_data(**request_20)
        values = data["values"][0]
        assert (values != data["no_data_value"]).sum() == 32  # two 4x4 stamps

    def test_place_statistic_count(self, stamp_source, request_20):
        view = Place(
            stamp_source,
            place_projection="EPSG:28992",
            anchor=(135002, 455998),
            coordinates=[(135010, 455990), (135011, 455990)],  # overlapping
            statistic="count",
        )
        data = view.get_data(**request_20)
        assert data["values"].max() == 2

    def test_place_all_nodata_window_skipped(self, request_20):
        # a placement whose VISIBLE window holds only nodata must not
        # contribute a frame: sum/count would turn it into 0-as-data
        data = np.full((1, 4, 4), 9, dtype=np.uint8)
        data[:, :, :2] = 255  # left half nodata
        source = MemorySource(
            data=data,
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )
        view = Place(
            source,
            place_projection="EPSG:28992",
            anchor=(135002, 455998),
            # only the stamp's nodata columns land inside the canvas
            coordinates=[(135020, 455990)],
            statistic="count",
        )
        out = view.get_data(**request_20)
        assert (out["values"] == out["no_data_value"]).all()

    def test_place_empty_coordinates(self, stamp_source, request_20):
        view = Place(
            stamp_source,
            place_projection="EPSG:28992",
            anchor=(135002, 455998),
            coordinates=[],
        )
        data = view.get_data(**request_20)
        assert (data["values"] == data["no_data_value"]).all()

    def test_place_validation(self, stamp_source):
        with pytest.raises(ValueError):
            Place(stamp_source, "EPSG:28992", (1, 2, 3), [])
        with pytest.raises(ValueError):
            Place(stamp_source, "NOT_A_PROJ", (1, 2), [])
        with pytest.raises(ValueError):
            Place(stamp_source, "EPSG:28992", (1, 2), [], statistic="bogus")


class TestMaxReduction:
    def test_max(self, sparse_source, request_20):
        shifted = MemorySource(
            data=np.full((1, 20, 20), 5, dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )
        data = Max(sparse_source, shifted).get_data(**request_20)
        values = data["values"][0]
        assert values[10, 10] == 7
        assert values[3, 3] == 5
        assert values[0, 0] == 5  # nodata in a, data in b -> b

    def test_max_jax_matches(self, sparse_source, request_20):
        shifted = MemorySource(
            data=np.full((1, 20, 20), 5, dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )
        view = Max(sparse_source, shifted)
        expected = view.get_data(**request_20)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_20)
        np.testing.assert_array_equal(actual["values"], expected["values"])
        assert actual["values"].dtype == expected["values"].dtype


class TestPallasGaussian:
    def test_matches_scipy_interpret(self):
        """The Pallas kernel (interpret mode on CPU) must match scipy."""
        from dask_geomodeling_tpu.ops.pallas_stencils import (
            gaussian_blur_pallas,
            pallas_fits,
        )

        rng = np.random.RandomState(0)
        x = (rng.rand(2, 64, 96) * 100).astype(np.float32)
        assert pallas_fits(64, 96, 1.5, 2.0)
        out = np.asarray(gaussian_blur_pallas(x, 1.5, 2.0, 0.0, interpret=True))
        expected = ndimage.gaussian_filter(
            x.astype(np.float64), (0, 1.5, 2.0), mode="constant", cval=0.0
        )
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_fits_budget(self):
        from dask_geomodeling_tpu.ops.pallas_stencils import pallas_fits

        assert pallas_fits(512, 512, 2.0, 2.0)
        assert not pallas_fits(4096, 4096, 2.0, 2.0)


class TestPlaceGroupMode:
    def test_group_mode(self, sparse_source):
        # request smaller than the source extent: per-coordinate requests
        view = Place(
            sparse_source,
            place_projection="EPSG:28992",
            anchor=(135010, 455990),
            coordinates=[(135010, 455990)],  # identity placement
        )
        request = dict(
            mode="vals",
            start=datetime(2000, 1, 1),
            bbox=(135008, 455988, 135012, 455992),
            projection="EPSG:28992",
            width=4,
            height=4,
        )
        data = view.get_data(**request)
        expected = sparse_source.get_data(**request)
        np.testing.assert_array_equal(data["values"], expected["values"])


class TestSpatialHaloExpansion:
    """Ported from reference tests/test_raster.py:1469-1641: values OUTSIDE
    the requested bbox must influence dilation/moving-max/smooth results
    (request expansion + crop), and point requests skip the stencil."""

    @pytest.fixture
    def corner_store(self):
        from tests.factories import MockRaster

        return MockRaster(
            origin=datetime(2000, 1, 1),
            value=np.array([[0, 2], [0, 0], [0, 0]]),
            timedelta=timedelta(minutes=5),
            bands=1,
        )

    @pytest.fixture
    def vals_request(self):
        return dict(
            mode="vals", start=datetime(2000, 1, 1),
            stop=datetime(2000, 1, 1),
            bbox=(0, 0, 2, 3), width=2, height=3, projection="EPSG:3857",
        )

    def test_dilate_values(self, corner_store, vals_request):
        view = Dilate(corner_store, values=[2])
        data = view.get_data(**vals_request)
        assert data["values"].tolist() == [[[2, 2], [0, 2], [0, 0]]]
        # point request skips dilation
        point = dict(vals_request, bbox=(0, 0, 0, 0), width=1, height=1)
        assert Dilate(corner_store, values=[2]).get_data(**point)[
            "values"
        ].tolist() == [[[0]]]
        # non-matching value: no dilation
        data = Dilate(corner_store, values=[1]).get_data(**vals_request)
        assert data["values"].tolist() == [corner_store.value.tolist()]

    def test_dilate_from_outside_bbox(self, corner_store, vals_request):
        view = Dilate(corner_store, values=[2])
        request = dict(vals_request, bbox=(1, 1, 2, 2), width=1, height=1)
        data = view.get_data(**request)
        # the 2 lives outside this bbox; dilation brings it in
        assert data["values"].tolist() == [[[2]]]

    def test_moving_max_values(self, corner_store, vals_request):
        view = MovingMax(corner_store, size=3)
        data = view.get_data(**vals_request)
        assert data["values"].tolist() == [[[2, 2], [2, 2], [0, 0]]]
        point = dict(vals_request, bbox=(0, 0, 0, 0), width=1, height=1)
        assert view.get_data(**point)["values"].tolist() == [[[0]]]

    def test_moving_max_from_outside_bbox(self, corner_store, vals_request):
        view = MovingMax(corner_store, size=3)
        request = dict(vals_request, bbox=(1, 1, 2, 2), width=1, height=1)
        assert view.get_data(**request)["values"].tolist() == [[[2]]]

    @pytest.mark.parametrize(
        "bbox",
        [
            (0, 0, 101, 101),
            (0, 0, 48, 48),  # the peak is outside this bbox
            (50, 50, 60, 60),  # partial
        ],
    )
    def test_smooth_margin_bboxes(self, bbox):
        from scipy import ndimage
        from tests.factories import MockRaster

        values = np.zeros((101, 101), dtype=np.float32)
        peak = 1000
        values[48:53, 48:53] = peak
        sigma = 1
        store = MockRaster(
            origin=datetime(2000, 1, 1), value=values,
            timedelta=timedelta(minutes=5), bands=1,
        )
        view = Smooth(store, size=sigma * 3)
        expected = ndimage.gaussian_filter(
            values, sigma=sigma, mode="constant", cval=0
        )
        request = dict(
            mode="vals", start=datetime(2000, 1, 1), stop=datetime(2000, 1, 1),
            bbox=bbox, width=bbox[2] - bbox[0], height=bbox[3] - bbox[1],
            projection="EPSG:3857",
        )
        data = view.get_data(**request)
        np.testing.assert_allclose(
            data["values"][0],
            expected[bbox[1] : bbox[3], bbox[0] : bbox[2]],
            atol=peak * 0.0001,
        )


class TestPlaceDevice:
    """Place's warp-mode device twin: dynamic_update_slice placements
    merged by nodata-skipping statistics, bitwise vs the host scatter."""

    @pytest.fixture
    def place_source(self):
        data = np.arange(64, dtype=np.float64).reshape(1, 8, 8)
        data[0, 1, 1] = 99.0  # nodata pixel stays transparent
        return MemorySource(
            data=data, no_data_value=99.0, projection="EPSG:28992",
            pixel_size=1.0, pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1), time_delta=None,
        )

    @pytest.fixture
    def place_request(self):
        return dict(
            mode="vals", bbox=(135000, 455968, 135032, 456000),
            width=32, height=32, projection="EPSG:28992",
            start=datetime(2000, 1, 1),
        )

    COORDINATES = [
        (135005, 455990),
        (135010, 455985),  # overlaps the first placement
        (135028, 455970),  # clipped at the border
        (134000, 455000),  # fully out of range
    ]

    @pytest.mark.parametrize("statistic", ["last", "first", "max", "mean"])
    def test_matches_host(self, place_source, place_request, statistic):
        from dask_geomodeling_tpu.runtime.executor import (
            clear_program_cache,
            program_cache_info,
        )

        view = Place(
            place_source, "EPSG:28992", anchor=(135004, 455996),
            coordinates=self.COORDINATES, statistic=statistic,
        )
        expected = view.get_data(**place_request)
        clear_program_cache()
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**place_request)
        assert program_cache_info()["misses"] == 1
        np.testing.assert_array_equal(actual["values"], expected["values"])

    def test_program_reused_across_bboxes(self, place_source, place_request):
        from dask_geomodeling_tpu.runtime.executor import (
            clear_program_cache,
            program_cache_info,
        )

        view = Place(
            place_source, "EPSG:28992", anchor=(135004, 455996),
            coordinates=[(135005, 455990)], statistic="last",
        )
        clear_program_cache()
        with config.set({"geomodeling.executor": "jax"}):
            view.get_data(**place_request)
            view.get_data(
                **dict(place_request, bbox=(135001, 455969, 135033, 456001))
            )
        assert program_cache_info() == {"hits": 1, "misses": 1, "size": 1}

    def test_sum_matches_on_host_path(self, place_source, place_request):
        # sum/count are declined by the twin (zero-fill semantics differ for
        # out-of-range placements); the jax executor must still match
        view = Place(
            place_source, "EPSG:28992", anchor=(135004, 455996),
            coordinates=self.COORDINATES, statistic="sum",
        )
        expected = view.get_data(**place_request)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**place_request)
        np.testing.assert_array_equal(actual["values"], expected["values"])


class TestMovingMaxPallas:
    def test_matches_xla_interpret(self):
        """The Pallas moving-max (interpret mode on CPU) must match the
        reduce_window decomposition and scipy across dtypes and sizes."""
        from scipy import ndimage as ndi

        from dask_geomodeling_tpu.geo.dtypes import get_footprint
        from dask_geomodeling_tpu.ops.pallas_stencils import (
            moving_max_pallas,
            moving_max_pallas_fits,
        )
        from dask_geomodeling_tpu.ops.stencils import moving_max_jax

        rng = np.random.RandomState(0)
        for dtype, size in [("f4", 5), ("u1", 3), ("i4", 7), ("u2", 5)]:
            x = (rng.rand(2, 40, 48) * 200).astype(dtype)
            assert moving_max_pallas_fits(40, 48, size, dtype)
            pallas_out = np.asarray(moving_max_pallas(x, size, interpret=True))
            with config.set({"geomodeling.pallas-stencils": False}):
                xla_out = np.asarray(moving_max_jax(x, size))
            np.testing.assert_array_equal(pallas_out, xla_out)
            expected = np.stack(
                [
                    ndi.maximum_filter(
                        band, footprint=get_footprint(size), mode="nearest"
                    )
                    for band in x
                ]
            )
            # interiors equal scipy (edge modes differ by design)
            r = size // 2
            np.testing.assert_array_equal(
                pallas_out[:, r:-r, r:-r], expected[:, r:-r, r:-r]
            )

    def test_fits_limits(self):
        from dask_geomodeling_tpu.ops.pallas_stencils import (
            moving_max_pallas_fits,
        )

        assert moving_max_pallas_fits(512, 512, 5, "f4")
        assert not moving_max_pallas_fits(4096, 4096, 5, "f4")
        assert not moving_max_pallas_fits(64, 64, 5, "f8")
        assert not moving_max_pallas_fits(64, 64, 5, "u4")
