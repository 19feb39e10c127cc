"""Tests for Clip/Mask/MaskBelow/Step/Classify/Reclassify/Rasterize/
RasterizeWKT (modeled on the reference tests/test_raster_misc.py)."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu.raster import (
    Classify,
    Clip,
    Greater,
    Mask,
    MaskBelow,
    MemorySource,
    Rasterize,
    RasterizeWKT,
    Reclassify,
    Step,
)
from tests.factories import MockGeometry


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


@pytest.fixture(scope="module")
def values_source():
    data = np.array([np.full((10, 10), 3), np.full((10, 10), 255)], dtype=np.uint8)
    return MemorySource(
        data=data,
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


class TestClip:
    def test_clip_by_nodata(self, values_source, nodata_source, request_2x2):
        view = Clip(values_source, nodata_source)
        data = view.get_data(**request_2x2)
        assert (data["values"] == data["no_data_value"]).all()

    def test_clip_by_boolean(self, values_source, request_2x2):
        cond = Greater(values_source, 10)  # everywhere False
        data = Clip(values_source, cond).get_data(**request_2x2)
        assert (data["values"] == data["no_data_value"]).all()

    def test_clip_passthrough(self, values_source, request_2x2):
        cond = Greater(values_source, 0)  # True where data
        data = Clip(values_source, cond).get_data(**request_2x2)
        assert (data["values"][0] == 3).all()

    def test_clip_temporal_mismatch(self, values_source):
        static = MemorySource(
            data=np.full((1, 10, 10), 1, dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=0.5,
            pixel_origin=(135000, 456000),
        )
        with pytest.raises(ValueError):
            Clip(values_source, static)

    def test_clip_extent_intersection(self, values_source, source):
        assert Clip(values_source, source).extent == values_source.extent


class TestMask:
    def test_mask(self, values_source, request_2x2):
        view = Mask(values_source, 8)
        assert view.dtype == np.uint8
        data = view.get_data(**request_2x2)
        assert (data["values"][0] == 8).all()
        assert (data["values"][1] == data["no_data_value"]).all()

    def test_mask_float(self, values_source, request_2x2):
        view = Mask(values_source, 8.0)
        assert view.dtype == np.float32

    def test_mask_zero_fillvalue(self, values_source):
        assert Mask(values_source, 0).fillvalue == 1
        assert Mask(values_source, 5).fillvalue == 0

    def test_validation(self, values_source):
        with pytest.raises(TypeError):
            Mask(values_source, "x")


class TestMaskBelow:
    def test_mask_below(self, values_source, request_2x2):
        data = MaskBelow(values_source, 4).get_data(**request_2x2)
        assert (data["values"][0] == data["no_data_value"]).all()
        data = MaskBelow(values_source, 3).get_data(**request_2x2)
        assert (data["values"][0] == 3).all()


class TestStep:
    def test_step(self, values_source, request_2x2):
        data = Step(values_source, left=0, right=1, value=3, at=9).get_data(
            **request_2x2
        )
        assert (data["values"][0] == 9).all()  # == value -> at
        assert (data["values"][1] == data["no_data_value"]).all()

    def test_step_default_at(self, values_source):
        assert Step(values_source, left=0, right=1).at == 0.5

    def test_step_left_right(self, values_source, request_2x2):
        data = Step(values_source, left=7, right=8, value=5).get_data(**request_2x2)
        assert (data["values"][0] == 7).all()
        data = Step(values_source, left=7, right=8, value=0).get_data(**request_2x2)
        assert (data["values"][0] == 8).all()


class TestClassify:
    def test_classify(self, values_source, request_2x2):
        view = Classify(values_source, bins=[1, 5, 10])
        assert view.dtype == np.uint8
        data = view.get_data(**request_2x2)
        assert (data["values"][0] == 1).all()  # 3 is in bin [1, 5)
        assert (data["values"][1] == data["no_data_value"]).all()

    def test_classify_right(self, values_source, request_2x2):
        data = Classify(values_source, bins=[3, 10], right=True).get_data(
            **request_2x2
        )
        assert (data["values"][0] == 0).all()  # 3 <= 3

    def test_validation(self, values_source):
        with pytest.raises(TypeError):
            Classify(values_source, bins="x")
        with pytest.raises(TypeError):
            Classify(values_source, bins=[[1, 2]])


class TestReclassify:
    def test_reclassify(self, values_source, request_2x2):
        view = Reclassify(values_source, data=[[3, 100]])
        data = view.get_data(**request_2x2)
        assert (data["values"][0] == 100).all()
        assert (data["values"][1] == data["no_data_value"]).all()

    def test_reclassify_select(self, values_source, request_2x2):
        view = Reclassify(values_source, data=[[2, 100]], select=True)
        data = view.get_data(**request_2x2)
        # 3 is not in the mapping: everything becomes nodata
        assert (data["values"][0] == data["no_data_value"]).all()

    def test_reclassify_float_target(self, values_source, request_2x2):
        view = Reclassify(values_source, data=[[3, 1.5]])
        assert view.dtype == np.float64
        data = view.get_data(**request_2x2)
        assert (data["values"][0] == 1.5).all()

    def test_validation(self, values_source):
        from dask_geomodeling_tpu.raster import Divide

        with pytest.raises(TypeError):
            Reclassify(Divide(values_source, 2), data=[[1, 2]])  # float store
        with pytest.raises(ValueError):
            Reclassify(values_source, data=[[1, 2], [1, 3]])  # duplicates


class TestRasterize:
    square = [(135000, 455995), (135005, 455995), (135005, 456000), (135000, 456000)]

    def test_rasterize_bool(self, request_2x2):
        geom = MockGeometry([self.square], projection="EPSG:28992")
        view = Rasterize(geom)
        assert view.dtype == bool
        data = view.get_data(**request_2x2)
        assert data["values"].all()

    def test_rasterize_column(self, request_2x2):
        geom = MockGeometry(
            [self.square], properties=[{"id": 5, "value": 13}],
            projection="EPSG:28992",
        )
        view = Rasterize(geom, column_name="value")
        assert view.dtype == np.int32
        data = view.get_data(**request_2x2)
        assert (data["values"] == 13).all()

    def test_rasterize_empty(self, request_2x2):
        geom = MockGeometry([], projection="EPSG:28992")
        data = Rasterize(geom).get_data(**request_2x2)
        assert not data["values"].any()

    def test_rasterize_time(self, request_2x2):
        geom = MockGeometry([self.square], projection="EPSG:28992")
        data = Rasterize(geom).get_data(**dict(request_2x2, mode="time"))
        assert data["time"] == [datetime(1970, 1, 1)]

    # ported from reference tests/test_raster.py:1643-1810
    @pytest.fixture
    def mixed_source(self):
        squares = [
            ((0.0, 1.0), (0.0, 2.0), (1.0, 2.0), (1.0, 1.0)),  # 1 pixel inside
            ((10.0, 2.0), (10.0, 3.0), (20.0, 3.0), (20.0, 2.0)),  # outside
            ((1.0, 2.0), (1.0, 13.0), (12.0, 13.0), (12.0, 2.0)),  # partial
        ]
        return MockGeometry(
            squares, [{"id": x, "value": x / 3} for x in (51, 212, 512)]
        )

    @pytest.fixture
    def vals_request(self):
        return dict(
            mode="vals", width=2, height=3, bbox=(0, 0, 2, 3),
            projection="EPSG:3857",
        )

    @pytest.fixture
    def point_request(self):
        return dict(
            mode="vals", width=1, height=1, bbox=(0, 0, 0, 0),
            projection="EPSG:3857",
        )

    def test_vals_request(self, mixed_source, vals_request):
        data = Rasterize(mixed_source, "id").get_data(**vals_request)
        values = data["values"][0, ::-1]  # x, y -> j, i
        assert values[1, 0] == 51
        assert values[2, 1] == 512
        assert np.sum(values == data["no_data_value"]) == 4

    def test_overlapping_last_on_top(self, vals_request):
        squares = [
            ((0.0, 0.0), (2.0, 0.0), (2.0, 3.0), (0.0, 3.0)),  # full bbox
            ((0.0, 1.0), (0.0, 2.0), (1.0, 2.0), (1.0, 1.0)),  # 1 pixel
        ]
        data = Rasterize(MockGeometry(squares), "id").get_data(**vals_request)
        values = data["values"][0]
        assert values[1, 0] == 1
        assert np.sum(values == 0) == 5

    @pytest.mark.parametrize("offset", [0.0, 0.49, 0.51, 1.0])
    @pytest.mark.parametrize("axis", ["x", "y"])
    def test_shifting_pixel(self, vals_request, offset, axis):
        # pixel-center sampling: the burned cell flips at offset 0.5
        pixel = np.array(((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)))
        shift = [offset, 0.0] if axis == "x" else [0.0, offset]
        data = Rasterize(MockGeometry([pixel + shift]), "id").get_data(
            **vals_request
        )
        if axis == "x":
            expected = (2, 0) if offset < 0.5 else (2, 1)
        else:
            expected = (2, 0) if offset < 0.5 else (1, 0)
        assert data["values"][0][expected] == 0
        assert np.sum(data["values"] == 0) == 1

    def test_point_request(self, point_request):
        pixel = np.array(((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)))
        # no geometry: nodata
        data = Rasterize(MockGeometry([]), "id").get_data(**point_request)
        assert data["values"].tolist() == [[[data["no_data_value"]]]]
        # the last geometry wins
        data = Rasterize(MockGeometry([pixel, pixel]), "id").get_data(
            **point_request
        )
        assert data["values"].tolist() == [[[1]]]
        data = Rasterize(
            MockGeometry([pixel, pixel], [{"id": x} for x in (51, 212)]), "id"
        ).get_data(**point_request)
        assert data["values"].tolist() == [[[212]]]

    def test_limit(self, mixed_source, vals_request):
        data = Rasterize(mixed_source, "id", limit=1).get_data(**vals_request)
        assert np.sum(data["values"] == data["no_data_value"]) == 5

    def test_rasterize_id_as_uint(self, mixed_source, vals_request):
        data = Rasterize(mixed_source, column_name="id", dtype="uint8").get_data(
            **vals_request
        )
        values = data["values"][0, ::-1]
        assert values.dtype == np.uint8
        assert data["no_data_value"] == 255
        assert values[1, 0] == np.uint8(51)
        assert values[2, 1] == np.array(512).astype(np.uint8)  # wraps

    def test_rasterize_value_as_float16(self, mixed_source, vals_request):
        data = Rasterize(
            mixed_source, column_name="value", dtype="float16"
        ).get_data(**vals_request)
        values = data["values"][0, ::-1]
        assert values.dtype == np.float16
        assert values[1, 0] == np.float16(51 / 3)
        assert values[2, 1] == np.float16(512 / 3)

    def test_geometry_request_shaping(self, mixed_source):
        (_, req), _ = Rasterize(mixed_source, "id").get_sources_and_requests(
            mode="vals", width=256, height=100, bbox=(0, 0, 10, 10),
            projection="EPSG:3857",
            start=datetime(2018, 1, 1), stop=datetime(2019, 1, 1),
        )
        assert req["mode"] == "intersects"
        assert req["geometry"].area == 100.0

    def test_meta_mode(self, mixed_source):
        data = Rasterize(mixed_source, "id").get_data(mode="meta")
        assert data["meta"] == [None]


class TestRasterizeWKT:
    def test_rasterize_wkt(self, request_2x2):
        wkt = "POLYGON ((135000 455995, 135005 455995, 135005 456000, 135000 456000, 135000 455995))"
        view = RasterizeWKT(wkt, "EPSG:28992")
        data = view.get_data(**request_2x2)
        assert data["values"].dtype == bool
        assert data["values"].all()

    def test_no_intersection(self, request_2x2):
        wkt = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
        data = RasterizeWKT(wkt, "EPSG:28992").get_data(**request_2x2)
        assert not data["values"].any()

    def test_validation(self):
        with pytest.raises(ValueError):
            RasterizeWKT("NOT A WKT", "EPSG:28992")
        with pytest.raises(ValueError):
            RasterizeWKT("POINT (0 0)", "EPSG:999999")
