"""Elementwise raster block tests (modeled on the reference
tests/test_elemwise.py): nodata propagation, dtype promotion, comparison
conventions, FillNoData."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu.raster import (
    Add,
    And,
    Divide,
    Equal,
    Exp,
    FillNoData,
    Greater,
    GreaterEqual,
    Invert,
    IsData,
    IsNoData,
    Less,
    LessEqual,
    Log,
    Log10,
    MemorySource,
    Multiply,
    NotEqual,
    Or,
    Power,
    Subtract,
    Xor,
)


@pytest.fixture(scope="module")
def a():
    """values 1..2 with one nodata band"""
    return MemorySource(
        data=np.array(
            [np.full((10, 10), 1), np.full((10, 10), 255)], dtype=np.uint8
        ),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture(scope="module")
def b():
    return MemorySource(
        data=np.full((2, 10, 10), 2, dtype=np.uint8),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture
def request_2x2():
    return {
        "mode": "vals",
        "start": datetime(2000, 1, 1),
        "stop": datetime(2000, 1, 1, 1),
        "width": 2,
        "height": 2,
        "bbox": (135000, 455999, 135001, 456000),
        "projection": "EPSG:28992",
    }


class TestMathBlocks:
    def test_add_raster_constant(self, a, request_2x2):
        view = Add(a, 10)
        data = view.get_data(**request_2x2)
        assert data["values"].dtype == np.int32
        assert (data["values"][0] == 11).all()
        # nodata band propagates as the new fillvalue
        assert (data["values"][1] == data["no_data_value"]).all()

    def test_add_two_rasters(self, a, b, request_2x2):
        data = Add(a, b).get_data(**request_2x2)
        assert (data["values"][0] == 3).all()
        assert (data["values"][1] == data["no_data_value"]).all()

    def test_operator_overloads(self, a, b, request_2x2):
        assert isinstance(a + b, Add)
        assert isinstance(a - b, Subtract)
        assert isinstance(a * b, Multiply)
        assert isinstance(a / b, Divide)
        assert isinstance(a**2, Power)
        assert isinstance(a == b, Equal)
        assert isinstance(a != b, NotEqual)
        assert isinstance(a > b, Greater)
        assert isinstance(a >= b, GreaterEqual)
        assert isinstance(a < b, Less)
        assert isinstance(a <= b, LessEqual)

    def test_subtract(self, a, request_2x2):
        data = Subtract(a, 1).get_data(**request_2x2)
        assert (data["values"][0] == 0).all()

    def test_multiply(self, a, request_2x2):
        data = Multiply(a, 3).get_data(**request_2x2)
        assert (data["values"][0] == 3).all()

    def test_divide_dtype(self, a, request_2x2):
        view = Divide(a, 2)
        assert view.dtype == np.float32
        data = view.get_data(**request_2x2)
        assert data["values"][0, 0, 0] == pytest.approx(0.5)

    def test_power(self, a, request_2x2):
        data = Power(a, 2).get_data(**request_2x2)
        assert (data["values"][0] == 1).all()

    def test_power_negative_int_exponent(self, a):
        view = Power(a, -1)
        assert view.args[1] == -1.0
        assert isinstance(view.args[1], float)

    def test_validation(self, a):
        with pytest.raises(TypeError):
            Add(a, "not a number")

    def test_period_intersection(self, a):
        other = MemorySource(
            data=np.full((2, 10, 10), 2, dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=0.5,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1, 1),
            time_delta=timedelta(hours=1),
        )
        view = Add(a, other)
        assert view.period == (datetime(2000, 1, 1, 1), datetime(2000, 1, 1, 1))

    def test_extent_intersection(self, a):
        other = MemorySource(
            data=np.full((2, 10, 10), 2, dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=0.5,
            pixel_origin=(135002, 455998),  # shifted
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )
        extent = Add(a, other).extent
        assert extent is not None
        x1, y1, x2, y2 = extent
        assert x2 - x1 < 0.001  # tiny overlap in degrees

    def test_mismatching_timedelta_raises(self, a):
        other = MemorySource(
            data=np.full((2, 10, 10), 2, dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=0.5,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(minutes=30),
        )
        with pytest.raises(ValueError):
            Add(a, other)


class TestComparisons:
    def test_greater(self, a, request_2x2):
        data = Greater(a, 0).get_data(**request_2x2)
        assert data["values"].dtype == bool
        assert data["no_data_value"] is None
        assert data["values"][0].all()
        assert not data["values"][1].any()  # nodata -> False

    def test_equal_nodata_false(self, a, request_2x2):
        data = Equal(a, 255).get_data(**request_2x2)
        # even comparing against the nodata value itself yields False
        assert not data["values"][1].any()

    def test_not_equal_nodata_true(self, a, request_2x2):
        data = NotEqual(a, 1).get_data(**request_2x2)
        assert not data["values"][0].any()
        assert data["values"][1].all()  # nodata -> True


class TestLogic:
    def test_and_or_xor(self, a, request_2x2):
        cond = Greater(a, 0)
        for cls, expected0 in [(And, True), (Or, True), (Xor, False)]:
            data = cls(cond, True).get_data(**request_2x2)
            assert data["values"][0].all() == expected0

    def test_invert(self, a, request_2x2):
        data = Invert(Greater(a, 0)).get_data(**request_2x2)
        assert not data["values"][0].any()

    def test_validation(self, a):
        with pytest.raises(TypeError):
            And(a, True)  # a is not boolean
        with pytest.raises(TypeError):
            Invert(a)


class TestIsData:
    def test_is_data(self, a, request_2x2):
        data = IsData(a).get_data(**request_2x2)
        assert data["values"][0].all()
        assert not data["values"][1].any()

    def test_is_no_data(self, a, request_2x2):
        data = IsNoData(a).get_data(**request_2x2)
        assert not data["values"][0].any()
        assert data["values"][1].all()

    def test_validation(self, a):
        with pytest.raises(TypeError):
            IsData(Greater(a, 0))


class TestLogExp:
    def test_exp(self, a, request_2x2):
        data = Exp(a).get_data(**request_2x2)
        assert data["values"][0, 0, 0] == pytest.approx(np.exp(1), rel=1e-6)

    def test_log(self, a, request_2x2):
        data = Log(a).get_data(**request_2x2)
        assert data["values"][0, 0, 0] == pytest.approx(0)

    def test_log10_of_zero_is_nodata(self, a, request_2x2):
        data = Log10(Subtract(a, 1)).get_data(**request_2x2)
        assert (data["values"][0] == data["no_data_value"]).all()

    def test_validation(self, a):
        with pytest.raises(TypeError):
            Exp(Greater(a, 0))


class TestFillNoData:
    def test_rightmost_wins(self, a, b, request_2x2):
        data = FillNoData(a, b).get_data(**request_2x2)
        assert (data["values"][0] == 2).all()  # b overwrites a
        assert (data["values"][1] == 2).all()  # a is nodata, b fills

    def test_leftmost_fills(self, a, b, request_2x2):
        data = FillNoData(b, a).get_data(**request_2x2)
        assert (data["values"][0] == 1).all()
        assert (data["values"][1] == 2).all()  # a nodata -> b shows

    def test_validation(self, a):
        with pytest.raises(TypeError):
            FillNoData(a, 5)
