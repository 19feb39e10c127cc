"""Temporal block tests (modeled on reference tests/test_raster_temporal.py
and test_raster.py Group coverage)."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import (
    Cumulative,
    Group,
    MemorySource,
    Resample,
    Shift,
    Snap,
    TemporalAggregate,
    TemporalSum,
)


def make_source(values, time_first, time_delta, nodata=255):
    """(t,) values -> constant (t, 4, 4) uint8 MemorySource."""
    data = np.stack([np.full((4, 4), v, dtype=np.uint8) for v in values])
    return MemorySource(
        data=data,
        no_data_value=nodata,
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=time_first,
        time_delta=time_delta,
    )


@pytest.fixture(scope="module")
def hourly():
    # 6 hourly frames: 0..5, frame 3 is nodata
    return make_source(
        [0, 1, 2, 255, 4, 5], datetime(2000, 1, 1), timedelta(hours=1)
    )


@pytest.fixture
def request_all():
    return dict(
        mode="vals",
        start=datetime(2000, 1, 1),
        stop=datetime(2000, 1, 2),
        bbox=(135000, 455996, 135004, 456000),
        projection="EPSG:28992",
        width=4,
        height=4,
    )


class TestSnapDetailed:
    """Ported from reference tests/test_raster.py:1126-1253 (TestSnap):
    snapping a 5-min store to a 3-min index — nearest-frame selection,
    left/right expansion, repeats, and empty handling."""

    @pytest.fixture
    def raster(self):
        from tests.factories import MockRaster

        return MockRaster(
            origin=datetime(2000, 1, 1), value=7,
            timedelta=timedelta(minutes=5), bands=3,
        )

    @pytest.fixture
    def index(self):
        from tests.factories import MockRaster

        return MockRaster(
            origin=datetime(2000, 1, 1), timedelta=timedelta(minutes=3), bands=6
        )

    @pytest.fixture
    def view(self, raster, index):
        return Snap(raster, index)

    def t(self, minute):
        return datetime(2000, 1, 1, 0, minute)

    def test_snap_attributes(self, view, index):
        assert view.period == index.period
        assert view.timedelta == index.timedelta
        assert len(view) == len(index)
        assert view.temporal == index.temporal

    def test_snap_empty_index(self, raster):
        from tests.factories import MockRaster

        view = Snap(raster, MockRaster(origin=None))
        data = view.get_data(
            mode="vals", start=datetime(2000, 1, 1),
            stop=datetime(2010, 1, 1, 2), width=2, height=3,
        )
        assert data is None

    @pytest.mark.parametrize("mode", ["vals", "meta", "time"])
    def test_snap_no_result(self, view, mode):
        data = view.get_data(
            mode=mode, start=datetime(2001, 1, 1), stop=datetime(2002, 1, 1)
        )
        assert data is None

    def test_snap_single_band(self, view):
        data = view.get_data(mode="vals", width=1, height=1)
        assert data["values"].tolist() == [[[7]]]
        assert view.get_data(mode="meta")["meta"] == ["Testmeta for band 2"]
        assert view.get_data(mode="time")["time"] == [
            datetime(2000, 1, 1, 0, 15)
        ]

    def test_snap_multiband_range(self, view):
        data = view.get_data(mode="time", start=self.t(6), stop=self.t(9))
        assert data["time"] == [self.t(6), self.t(9)]
        data = view.get_data(mode="vals", start=self.t(6), stop=self.t(9))
        assert data["values"].tolist() == [[[7]], [[7]]]

    @pytest.mark.parametrize(
        "start,stop,expected_bands",
        [
            (6, 9, [1, 2]),
            (6, 7, [1]),  # expand left
            (8, 9, [2]),  # expand right
            (12, 15, [2, 2]),  # expand left repeat
            (5, 10, [1, 2]),  # both sides
            (7, 9, [2]),  # left time, no data
            (6, 8, [1]),  # right time, no data
        ],
    )
    def test_snap_meta_table(self, view, start, stop, expected_bands):
        data = view.get_data(start=self.t(start), stop=self.t(stop), mode="meta")
        assert data["meta"] == [
            "Testmeta for band %d" % b for b in expected_bands
        ]

    def test_snap_inner_no_data(self, raster, index):
        view = Snap(index, raster)
        data = view.get_data(start=self.t(3), stop=self.t(5), mode="meta")
        assert data["meta"] == ["Testmeta for band 2"]

    def test_snap_repeat(self):
        from tests.factories import MockRaster

        store1 = MockRaster(
            origin=datetime(2000, 1, 1), timedelta=timedelta(minutes=5), bands=1
        )
        store2 = MockRaster(
            origin=datetime(2000, 1, 1), timedelta=timedelta(minutes=5), bands=3
        )
        data = Snap(store1, store2).get_data(
            mode="meta", start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1)
        )
        assert data["meta"] == ["Testmeta for band 0"] * 3


class TestSnap:
    def test_snap_static_store(self, hourly, request_all):
        static = make_source([9], datetime(2000, 1, 1), None)
        view = Snap(static, hourly)
        assert view.period == hourly.period
        assert len(view) == 6
        data = view.get_data(**request_all)
        assert data["values"].shape == (6, 4, 4)
        assert (data["values"] == 9).all()

    def test_snap_temporal(self, hourly, request_all):
        # store at 30-min offset: every index frame snaps to the nearest
        store = make_source(
            [10, 20], datetime(2000, 1, 1, 0, 40), timedelta(hours=4)
        )
        view = Snap(store, hourly)
        data = view.get_data(**request_all)
        assert data["values"].shape == (6, 4, 4)
        assert data["values"][0, 0, 0] == 10
        assert data["values"][5, 0, 0] == 20

    def test_snap_time_mode(self, hourly, request_all):
        static = make_source([9], datetime(2000, 1, 1), None)
        data = Snap(static, hourly).get_data(**dict(request_all, mode="time"))
        assert len(data["time"]) == 6
        assert data["time"][0] == datetime(2000, 1, 1)

    def test_snap_empty(self, hourly, request_all):
        empty = MemorySource(
            data=np.empty((0, 0, 0), dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
        )
        assert Snap(empty, hourly).get_data(**request_all) is None

    def test_snap_jax_matches(self, hourly, request_all):
        static = make_source([9], datetime(2000, 1, 1), None)
        view = Snap(static, hourly)
        expected = view.get_data(**request_all)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_all)
        np.testing.assert_array_equal(actual["values"], expected["values"])


class TestShift:
    def test_shift_period(self, hourly):
        view = Shift(hourly, 3600000)  # +1 hour
        assert view.period == (datetime(2000, 1, 1, 1), datetime(2000, 1, 1, 6))

    def test_shift_values(self, hourly, request_all):
        view = Shift(hourly, 3600000)
        data = view.get_data(
            **dict(request_all, start=datetime(2000, 1, 1, 1), stop=None)
        )
        # requesting 01:00 of the shifted raster returns the 00:00 frame
        assert data["values"][0, 0, 0] == 0

    def test_shift_time(self, hourly, request_all):
        data = Shift(hourly, 3600000).get_data(**dict(request_all, mode="time"))
        assert data["time"][0] == datetime(2000, 1, 1, 1)

    def test_shift_validation(self, hourly):
        with pytest.raises(TypeError):
            Shift(hourly, "1 hour")


class TestTemporalSum:
    def test_sum(self, hourly, request_all):
        data = TemporalSum(hourly).get_data(**request_all)
        assert data["values"].shape == (1, 4, 4)
        # numpy's sum over the band axis promotes uint8, nodata not excluded
        assert data["values"][0, 0, 0] == 0 + 1 + 2 + 255 + 4 + 5


class TestTemporalAggregate:
    def test_attrs(self, hourly):
        view = TemporalAggregate(hourly, "2h", statistic="mean")
        assert view.timedelta == timedelta(hours=2)
        assert view.temporal
        assert view.dtype == np.float32

    def test_none_frequency(self, hourly, request_all):
        view = TemporalAggregate(hourly, None, statistic="sum")
        assert not view.temporal
        data = view.get_data(**request_all)
        assert data["values"].shape == (1, 4, 4)
        # nodata frame is skipped: 0+1+2+4+5 = 12
        assert data["values"][0, 0, 0] == 12

    def test_sum_2h(self, hourly, request_all):
        view = TemporalAggregate(hourly, "2h", statistic="sum")
        data = view.get_data(**request_all)
        assert data["values"].shape == (3, 4, 4)
        assert data["values"][0, 0, 0] == 1  # 0 + 1
        assert data["values"][1, 0, 0] == 2  # 2 + nodata
        assert data["values"][2, 0, 0] == 9  # 4 + 5

    def test_mean_2h(self, hourly, request_all):
        data = TemporalAggregate(hourly, "2h", statistic="mean").get_data(
            **request_all
        )
        assert data["values"][0, 0, 0] == pytest.approx(0.5)
        assert data["values"][1, 0, 0] == pytest.approx(2.0)  # nodata skipped

    def test_count(self, hourly, request_all):
        data = TemporalAggregate(hourly, "2h", statistic="count").get_data(
            **request_all
        )
        assert data["values"][:, 0, 0].tolist() == [2, 1, 2]

    def test_percentile(self, hourly, request_all):
        data = TemporalAggregate(hourly, "2h", statistic="p50").get_data(
            **request_all
        )
        assert data["values"][0, 0, 0] == pytest.approx(0.5)

    def test_time_mode(self, hourly, request_all):
        data = TemporalAggregate(hourly, "2h", statistic="sum").get_data(
            **dict(request_all, mode="time")
        )
        assert data["time"] == [
            datetime(2000, 1, 1, 0),
            datetime(2000, 1, 1, 2),
            datetime(2000, 1, 1, 4),
        ]

    def test_day_labels_right(self, hourly, request_all):
        view = TemporalAggregate(
            hourly, "D", statistic="sum", closed="right", label="right"
        )
        data = view.get_data(**dict(request_all, mode="time"))
        assert len(data["time"]) >= 1

    def test_timezone(self, hourly, request_all):
        view = TemporalAggregate(
            hourly, "D", statistic="sum", timezone="Europe/Amsterdam"
        )
        # day bins in CET: the label of the single bin is 2000-01-01 00:00
        # CET == 1999-12-31 23:00 UTC, so the request must start earlier
        data = view.get_data(**dict(request_all, start=datetime(1999, 12, 31)))
        assert data is not None
        assert data["values"][0, 0, 0] == 12  # 0+1+2+4+5, nodata skipped

    def test_out_of_range(self, hourly, request_all):
        view = TemporalAggregate(hourly, "2h", statistic="sum")
        result = view.get_data(
            **dict(
                request_all,
                start=datetime(2010, 1, 1),
                stop=datetime(2010, 1, 2),
            )
        )
        assert result is None

    def test_validation(self, hourly):
        with pytest.raises(ValueError):
            TemporalAggregate(hourly, "h", statistic="bogus")
        with pytest.raises(ValueError):
            TemporalAggregate(hourly, "h", closed="middle")

    def test_jax_matches(self, hourly, request_all):
        view = TemporalAggregate(hourly, "2h", statistic="mean")
        expected = view.get_data(**request_all)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_all)
        np.testing.assert_allclose(actual["values"], expected["values"])
        assert actual["values"].dtype == expected["values"].dtype


class TestCumulative:
    def test_cumsum(self, hourly, request_all):
        view = Cumulative(hourly, statistic="sum")
        data = view.get_data(**request_all)
        assert data["values"].shape == (6, 4, 4)
        # nancumsum: nodata counts as 0
        assert data["values"][:, 0, 0].tolist() == [0, 1, 3, 3, 7, 12]

    def test_cumsum_with_reset(self, hourly, request_all):
        view = Cumulative(hourly, statistic="sum", frequency="3h")
        data = view.get_data(**request_all)
        # bins are closed right: (00:00, 03:00] -> the reset is after 03:00
        assert data["values"][:, 0, 0].tolist() == [0, 1, 3, 3, 4, 9]

    def test_count(self, hourly, request_all):
        view = Cumulative(hourly, statistic="count")
        data = view.get_data(**request_all)
        assert data["values"][:, 0, 0].tolist() == [1, 2, 3, 3, 4, 5]

    def test_partial_request_accumulates_from_start(self, hourly, request_all):
        view = Cumulative(hourly, statistic="sum")
        data = view.get_data(
            **dict(
                request_all,
                start=datetime(2000, 1, 1, 4),
                stop=datetime(2000, 1, 1, 5),
            )
        )
        # the accumulation includes frames before the requested window
        assert data["values"][:, 0, 0].tolist() == [7, 12]

    def test_validation(self, hourly):
        with pytest.raises(ValueError):
            Cumulative(hourly, statistic="mean")

    @pytest.mark.parametrize("statistic", ["sum", "count"])
    @pytest.mark.parametrize("frequency", [None, "3h"])
    def test_jax_matches_numpy(self, hourly, request_all, statistic, frequency):
        view = Cumulative(hourly, statistic=statistic, frequency=frequency)
        expected = view.get_data(**request_all)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_all)
        assert actual["values"].dtype == expected["values"].dtype
        assert actual["no_data_value"] == expected["no_data_value"]
        np.testing.assert_array_equal(actual["values"], expected["values"])

    def test_jax_partial_request(self, hourly, request_all):
        view = Cumulative(hourly, statistic="sum")
        request = dict(
            request_all,
            start=datetime(2000, 1, 1, 4),
            stop=datetime(2000, 1, 1, 5),
        )
        with config.set({"geomodeling.executor": "jax"}):
            data = view.get_data(**request)
        assert data["values"][:, 0, 0].tolist() == [7, 12]


class TestResample:
    def test_resample_nearest(self, hourly, request_all):
        view = Resample(hourly, "2h")
        data = view.get_data(**request_all)
        times = view.get_data(**dict(request_all, mode="time"))["time"]
        assert len(times) == len(data["values"])
        assert times[0] == datetime(2000, 1, 1)
        # label 00:00 snaps to frame 0, 02:00 to frame 2, 04:00 to frame 4
        assert data["values"][0, 0, 0] == 0
        assert data["values"][1, 0, 0] == 2
        assert data["values"][2, 0, 0] == 4

    def test_resample_timedelta(self, hourly):
        assert Resample(hourly, "2h").timedelta == timedelta(hours=2)

    def test_validation(self, hourly):
        with pytest.raises(ValueError):
            Resample(hourly, "2h", direction="sideways")

    def test_resample_single_timestep(self, hourly, request_all):
        # reference changelog 2.6.1: single-time-step requests must work
        view = Resample(hourly, "2h")
        for kwargs in [
            dict(start=datetime(2000, 1, 1, 2)),
            dict(start=datetime(2000, 1, 1, 2), stop=datetime(2000, 1, 1, 2)),
        ]:
            request = dict(request_all)
            request.pop("start"), request.pop("stop", None)
            data = view.get_data(**request, **kwargs)
            assert data["values"][:, 0, 0].tolist() == [2]
            time = view.get_data(mode="time", **kwargs)
            assert time["time"] == [datetime(2000, 1, 1, 2)]


class TestGroup:
    def test_group_attrs(self, hourly):
        late = make_source(
            [7, 8], datetime(2000, 1, 1, 6), timedelta(hours=1)
        )
        group = Group(hourly, late)
        assert group.period == (datetime(2000, 1, 1), datetime(2000, 1, 1, 7))
        assert group.timedelta == timedelta(hours=1)

    def test_group_by_bands(self, hourly, request_all):
        late = make_source([7, 8], datetime(2000, 1, 1, 6), timedelta(hours=1))
        data = Group(hourly, late).get_data(**request_all)
        assert data["values"].shape == (8, 4, 4)
        assert data["values"][0, 0, 0] == 0
        assert data["values"][6, 0, 0] == 7
        assert data["values"][7, 0, 0] == 8

    def test_group_rightmost_wins(self, hourly, request_all):
        other = make_source(
            [101, 102, 103, 104, 105, 106], datetime(2000, 1, 1), timedelta(hours=1)
        )
        data = Group(hourly, other).get_data(**request_all)
        assert data["values"][0, 0, 0] == 101
        # nodata in 'other'? no: other has data everywhere -> other wins
        assert data["values"][3, 0, 0] == 104

    def test_group_nodata_transparent(self, hourly, request_all):
        # rightmost has a nodata frame: the left raster shows through
        other = make_source(
            [101, 102, 103, 255, 105, 106], datetime(2000, 1, 1), timedelta(hours=1)
        )
        data = Group(hourly, other).get_data(**request_all)
        # frame 3: both nodata -> nodata; frame 2: other wins
        assert data["values"][2, 0, 0] == 103
        assert data["values"][3, 0, 0] == data["no_data_value"]

    # ported from reference tests/test_raster.py:644-835 (TestCombine):
    # combine semantics are UNION (vs intersection for elementwise)
    def test_propagate_period_union(self):
        from tests.factories import MockRaster

        s1 = MockRaster(
            origin=datetime(2018, 4, 1), timedelta=timedelta(hours=1), bands=6
        )
        s2 = MockRaster(
            origin=datetime(2018, 4, 1, 2), timedelta=timedelta(hours=1), bands=6
        )
        assert Group(s1, s1).period == s1.period
        combined = Group(s1, s2)
        assert combined.period == (s1.period[0], s2.period[1])

    def test_propagate_extent_union(self):
        from tests.factories import MockRaster

        s1 = MockRaster(value=np.empty((1, 2)))
        s2 = MockRaster(value=np.empty((3, 4)))
        assert Group(s1, s1).extent == s1.extent
        for args in [(s1, s2), (s2, s1)]:
            assert Group(*args).extent == (0, 0, 4, 3)

    def test_propagate_geometry_union(self):
        from tests.factories import MockRaster

        s1 = MockRaster(value=np.empty((1, 2)))
        s2 = MockRaster(value=np.empty((3, 4)))
        for args in [(s1, s2), (s2, s1)]:
            assert Group(*args).geometry.bounds == (0.0, 0.0, 4.0, 3.0)

    def test_empty_length(self):
        from tests.factories import MockRaster

        assert len(Group(MockRaster(origin=None))) == 0

    def test_only_view_sources(self):
        with pytest.raises(TypeError):
            Group("not a raster")

    # ported from reference tests/test_raster.py:1005-1125 (gap handling)
    @pytest.fixture
    def gappy_group(self):
        from tests.factories import MockRaster

        s1 = MockRaster(
            origin=datetime(2000, 1, 1), timedelta=timedelta(minutes=5), bands=3
        )
        s6 = MockRaster(
            origin=datetime(2000, 1, 1, 0, 20),
            timedelta=timedelta(minutes=5),
            bands=1,
        )
        return Group(s1, s6)

    def test_start_in_gap(self, gappy_group):
        request = dict(
            start=datetime(2000, 1, 1, 0, 15), stop=datetime(2000, 1, 1, 0, 20)
        )
        time = gappy_group.get_data(mode="time", **request)["time"]
        assert time == [
            datetime(2000, 1, 1, 0, 15),
            datetime(2000, 1, 1, 0, 20),
        ]
        meta = gappy_group.get_data(mode="meta", **request)["meta"]
        assert meta == ["", "Testmeta for band 0"]
        data = gappy_group.get_data(mode="vals", width=1, height=1, **request)
        assert data["values"].tolist() == [[[gappy_group.fillvalue]], [[1]]]

    def test_stop_in_gap(self, gappy_group):
        request = dict(
            start=datetime(2000, 1, 1, 0, 10), stop=datetime(2000, 1, 1, 0, 15)
        )
        time = gappy_group.get_data(mode="time", **request)["time"]
        assert time == [
            datetime(2000, 1, 1, 0, 10),
            datetime(2000, 1, 1, 0, 15),
        ]
        meta = gappy_group.get_data(mode="meta", **request)["meta"]
        assert meta == ["Testmeta for band 2", ""]
        data = gappy_group.get_data(mode="vals", width=1, height=1, **request)
        assert data["values"].tolist() == [[[1]], [[gappy_group.fillvalue]]]

    @pytest.mark.parametrize("with_stop", [True, False])
    def test_only_gap(self, gappy_group, with_stop):
        request = dict(start=datetime(2000, 1, 1, 0, 15))
        if with_stop:
            request["stop"] = datetime(2000, 1, 1, 0, 15)
        time = gappy_group.get_data(mode="time", **request)["time"]
        assert time == [datetime(2000, 1, 1, 0, 15)]
        assert gappy_group.get_data(mode="meta", **request)["meta"] == [""]
        data = gappy_group.get_data(mode="vals", width=1, height=1, **request)
        assert data["values"].tolist() == [[[gappy_group.fillvalue]]]

    def test_gap_frames_under_jax_executor(self, gappy_group):
        request = dict(
            mode="vals", width=2, height=2,
            start=datetime(2000, 1, 1, 0, 15), stop=datetime(2000, 1, 1, 0, 20),
        )
        host = gappy_group.get_data(**request)
        with config.set({"geomodeling.executor": "jax"}):
            device = gappy_group.get_data(**request)
        np.testing.assert_array_equal(device["values"], host["values"])

    def test_no_request_period_overlap(self):
        from tests.factories import MockRaster

        view = Group(
            MockRaster(
                origin=datetime(2000, 1, 1),
                timedelta=timedelta(minutes=5),
                bands=3,
            )
        )
        for hours in (-1, 1):
            shift = timedelta(hours=hours)
            request = dict(
                start=view.period[0] + shift, stop=view.period[1] + shift
            )
            assert view.get_data(mode="time", **request) is None
            assert view.get_data(mode="meta", **request) is None
            assert (
                view.get_data(mode="vals", width=1, height=1, **request) is None
            )

    def test_fill_priority(self, hourly, request_all):
        # the rightmost source wins; nodata is always shadowed
        one = make_source([1] * 6, datetime(2000, 1, 1), timedelta(hours=1))
        two = make_source([2] * 6, datetime(2000, 1, 1), timedelta(hours=1))
        nodata = make_source([255] * 6, datetime(2000, 1, 1), timedelta(hours=1))
        assert Group(two, one).get_data(**request_all)["values"][0, 0, 0] == 1
        assert Group(one, two).get_data(**request_all)["values"][0, 0, 0] == 2
        for args in [(nodata, one), (one, nodata)]:
            assert Group(*args).get_data(**request_all)["values"][0, 0, 0] == 1

    def test_group_by_time_interleaved(self):
        # ported from reference test_group_by_time: interleaved timedeltas
        from tests.factories import MockRaster

        s1 = MockRaster(
            origin=datetime(2000, 1, 1), timedelta=timedelta(minutes=5), bands=3
        )
        s2 = MockRaster(
            origin=datetime(2000, 1, 1), timedelta=timedelta(minutes=3), bands=6
        )
        s4 = MockRaster(origin=None)
        view = Group(s1, s2, s1, s4)
        time = view.get_data(
            mode="time", start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1)
        )["time"]
        assert time == [
            datetime(2000, 1, 1, 0, 0),
            datetime(2000, 1, 1, 0, 3),
            datetime(2000, 1, 1, 0, 5),
            datetime(2000, 1, 1, 0, 6),
            datetime(2000, 1, 1, 0, 9),
            datetime(2000, 1, 1, 0, 10),
            datetime(2000, 1, 1, 0, 12),
            datetime(2000, 1, 1, 0, 15),
        ]
        meta = view.get_data(
            mode="meta", start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1)
        )["meta"]
        assert meta == [
            "Testmeta for band {}".format(i) for i in (0, 1, 1, 2, 3, 2, 4, 5)
        ]

    def test_group_by_time(self, hourly, request_all):
        # non-aligned timedelta: by_time merging
        other = make_source(
            [50, 51], datetime(2000, 1, 1, 0, 30), timedelta(minutes=90)
        )
        group = Group(hourly, other)
        assert group.timedelta is None
        data = group.get_data(**request_all)
        times = group.get_data(**dict(request_all, mode="time"))["time"]
        assert len(times) == len(data["values"])
        # 6 hourly + 00:30; the 02:00 frame coincides (rightmost wins)
        assert len(times) == 7
        idx_0200 = times.index(datetime(2000, 1, 1, 2))
        assert data["values"][idx_0200, 0, 0] == 51

    def test_group_time_mode(self, hourly, request_all):
        late = make_source([7], datetime(2000, 1, 1, 6), None)
        group = Group(hourly, late)
        data = group.get_data(**dict(request_all, mode="time"))
        assert len(data["time"]) == 7

    def test_group_latest(self, hourly, request_all):
        late = make_source([7, 8], datetime(2000, 1, 1, 6), timedelta(hours=1))
        data = Group(hourly, late).get_data(
            **dict(request_all, start=None, stop=None)
        )
        assert data["values"].shape == (1, 4, 4)
        assert data["values"][0, 0, 0] == 8

    def test_group_validation(self, hourly):
        with pytest.raises(TypeError):
            Group(hourly, 5)


class TestGroupJax:
    def test_group_by_bands_jax_matches(self, hourly, request_all):
        late = make_source([7, 8], datetime(2000, 1, 1, 6), timedelta(hours=1))
        view = Group(hourly, late)
        expected = view.get_data(**request_all)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_all)
        np.testing.assert_array_equal(actual["values"], expected["values"])
        assert actual["values"].dtype == expected["values"].dtype

    def test_group_by_time_jax_matches(self, hourly, request_all):
        other = make_source(
            [50, 51], datetime(2000, 1, 1, 0, 30), timedelta(minutes=90)
        )
        view = Group(hourly, other)
        expected = view.get_data(**request_all)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_all)
        np.testing.assert_array_equal(actual["values"], expected["values"])


class TestResampleDirections:
    def test_forward(self, hourly, request_all):
        view = Resample(hourly, "2h", direction="forward")
        data = view.get_data(**request_all)
        times = view.get_data(**dict(request_all, mode="time"))["time"]
        assert len(times) == len(data["values"])
        # label 00:00 snaps forward to frame 0 (exact match)
        assert data["values"][0, 0, 0] == 0

    def test_backward(self, hourly, request_all):
        view = Resample(hourly, "2h", direction="backward")
        data = view.get_data(**request_all)
        assert data["values"][0, 0, 0] == 0


class TestMonthStartFrequency:
    """Reference changelog 2.4.2/2.4.3: TemporalAggregate and Cumulative
    with month-start ('MS') frequency."""

    @pytest.fixture
    def weekly(self):
        return make_source(
            list(range(10)), datetime(2000, 1, 10), timedelta(days=7)
        )

    def test_temporal_aggregate_ms(self, weekly, request_all):
        view = TemporalAggregate(weekly, statistic="sum", frequency="MS")
        request = dict(
            request_all, start=datetime(2000, 1, 1), stop=datetime(2000, 4, 1)
        )
        data = view.get_data(**request)
        time = view.get_data(**dict(request, mode="time"))
        assert time["time"] == [
            datetime(2000, 1, 1),
            datetime(2000, 2, 1),
            datetime(2000, 3, 1),
        ]
        # Jan: frames 0-3, Feb: 4-7, Mar: 8-9
        assert data["values"][:, 0, 0].tolist() == [6, 22, 17]

    def test_cumulative_ms_resets(self, weekly, request_all):
        view = Cumulative(weekly, statistic="sum", frequency="MS")
        request = dict(
            request_all, start=datetime(2000, 1, 1), stop=datetime(2000, 4, 1)
        )
        data = view.get_data(**request)
        assert data["values"][:, 0, 0].tolist() == [
            0, 1, 3, 6,  # January accumulates
            4, 9, 15, 22,  # resets at Feb 1
            8, 17,  # resets at Mar 1
        ]


class TestClipNoneTimes:
    """Reference changelog 2.5.3/2.5.4: Clip with start or stop None."""

    def test_clip_none_start_stop(self, hourly, request_all):
        from dask_geomodeling_tpu.raster import Clip, Greater

        clip = Clip(hourly, Greater(hourly, 2))
        base = {k: v for k, v in request_all.items() if k not in ("start", "stop")}
        last = clip.get_data(**base)
        assert last["values"].shape[0] == 1  # latest frame only
        only_start = clip.get_data(**base, start=datetime(2000, 1, 1, 2))
        assert only_start["values"].shape[0] == 1
