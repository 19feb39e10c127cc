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


class TestElementwisePropagation:
    """Attribute propagation through two-operand elementwise blocks, ported
    from reference tests/test_raster.py:59-298 (TestElementwise)."""

    def test_propagate_timedelta(self):
        from tests.factories import MockRaster

        s = MockRaster(timedelta=timedelta(hours=1))
        for args in [(s, 2), (2, s), (s, s)]:
            assert Add(*args).timedelta == s.timedelta

    def test_propagate_nonequidistant_time(self):
        from tests.factories import MockRaster

        s1 = MockRaster(timedelta=timedelta(hours=1))
        s2 = MockRaster(timedelta=None, temporal=True)
        for args in [(s1, s2), (s2, s1)]:
            assert Add(*args).timedelta is None

    def test_propagate_temporal(self):
        from tests.factories import MockRaster

        s1 = MockRaster(timedelta=timedelta(hours=1))
        s2 = MockRaster(timedelta=None)
        assert Add(s1, s1).temporal
        assert not Add(s2, s2).temporal
        with pytest.raises(ValueError):
            Add(s1, s2)
        with pytest.raises(ValueError):
            Add(s2, s1)

    def test_propagate_period(self):
        from tests.factories import MockRaster

        s1 = MockRaster(
            origin=datetime(2018, 4, 1), timedelta=timedelta(hours=1), bands=6
        )
        s2 = MockRaster(
            origin=datetime(2018, 4, 1, 2), timedelta=timedelta(hours=1), bands=6
        )
        for args in [(s1, 2), (2, s1), (s1, s1)]:
            assert Add(*args).period == s1.period
        # intersection
        view = Add(s1, s2)
        assert view.period == (s2.period[0], s1.period[1])
        # disjoint: None
        s3 = MockRaster(
            origin=datetime(2018, 4, 2), timedelta=timedelta(hours=1), bands=6
        )
        assert Add(s1, s3).period is None

    def test_propagate_none_period(self):
        from tests.factories import MockRaster

        s1 = MockRaster(origin=None, temporal=True)
        s2 = MockRaster(
            origin=datetime(2018, 4, 1),
            timedelta=timedelta(hours=1),
            bands=6,
            temporal=True,
        )
        for args in [(s1, 2), (2, s1), (s1, s1), (s1, s2), (s2, s1)]:
            assert Add(*args).period is None

    def test_propagate_extent(self):
        from tests.factories import MockRaster

        s1 = MockRaster(value=np.empty((1, 2)))
        s2 = MockRaster(value=np.empty((3, 4)))
        for args in [(s1, 2), (2, s1), (s1, s1)]:
            assert Add(*args).extent == s1.extent
        assert Add(s1, s2).extent == (0, 0, 2, 1)

    def test_propagate_none_extent(self):
        from tests.factories import MockRaster

        s1 = MockRaster(value=None)
        s2 = MockRaster(value=np.empty((1, 2)))
        for args in [(s1, 2), (2, s1), (s1, s1), (s1, s2), (s2, s1)]:
            assert Add(*args).extent is None

    def test_propagate_geometry(self):
        from tests.factories import MockRaster

        s1 = MockRaster(value=np.empty((1, 2)))
        s2 = MockRaster(value=np.empty((3, 4)))
        for args in [(s1, s2), (s2, s1)]:
            geometry = Add(*args).geometry
            assert geometry.bounds == (0.0, 0.0, 2.0, 1.0)

    def test_propagate_projection(self):
        from tests.factories import MockRaster

        m = lambda proj, v=1: MockRaster(value=v, projection=proj)
        assert Add(m("EPSG:3857"), 1).projection == "EPSG:3857"
        assert Add(1, m("EPSG:3857")).projection == "EPSG:3857"
        assert Add(m("EPSG:3857"), m("EPSG:3857", 2)).projection == "EPSG:3857"
        assert Add(m("EPSG:3857"), m("EPSG:4326", 2)).projection is None
        assert Add(m("EPSG:3857"), m(None, 2)).projection is None
        assert Add(m(None), m(None, 2)).projection is None

    def test_propagate_geo_transform(self):
        from tests.factories import MockRaster

        class WithGT(MockRaster):
            def __init__(self, gt):
                super().__init__(value=1)
                self._gt = gt

            @property
            def geo_transform(self):
                return self._gt

        gt = (0, 1, 0, 1, 0, -1)
        assert tuple(Add(WithGT(gt), 1).geo_transform) == gt
        assert tuple(Add(1, WithGT(gt)).geo_transform) == gt
        # aligned grids (integer pixel offset) propagate the first
        assert tuple(
            Add(WithGT(gt), WithGT((5, 1, 0, -8, 0, -1))).geo_transform
        ) == gt
        # non-matching pixel sizes: None
        assert Add(WithGT(gt), WithGT((0, 2, 0, 1, 0, -2))).geo_transform is None
        # None propagates
        assert Add(WithGT(None), WithGT(gt)).geo_transform is None
        assert Add(WithGT(gt), WithGT(None)).geo_transform is None


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


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize(
    "temporal1,delta1,temporal2,delta2,ok",
    [
        # nontemporal - nontemporal
        (False, None, False, None, True),
        (False, timedelta(minutes=5), False, timedelta(minutes=5), True),
        (False, None, False, timedelta(minutes=5), True),
        # nontemporal - temporal: never allowed
        (False, None, True, None, False),
        (False, None, True, timedelta(hours=1), False),
        (False, timedelta(minutes=5), True, None, False),
        (False, timedelta(minutes=5), True, timedelta(hours=1), False),
        # temporal - temporal: equidistant deltas must match
        (True, timedelta(hours=1), True, timedelta(hours=1), True),
        (True, timedelta(hours=1), True, timedelta(hours=2), False),
        (True, timedelta(hours=1), True, None, True),
        (True, None, True, None, True),
    ],
)
def test_elemwise_time_structure_validation(
    temporal1, delta1, temporal2, delta2, inverse, ok
):
    """Ported from reference tests/test_raster_elemwise.py: the full
    temporal/timedelta compatibility matrix of two-raster elementwise."""
    from tests.factories import MockRaster

    raster1 = MockRaster(
        origin=datetime(2000, 1, 1), timedelta=delta1, temporal=temporal1
    )
    raster2 = MockRaster(
        origin=datetime(2000, 1, 1), timedelta=delta2, temporal=temporal2
    )
    if inverse:
        raster1, raster2 = raster2, raster1
    if ok:
        Add(raster1, raster2)
    else:
        with pytest.raises(ValueError):
            Add(raster1, raster2)
