"""MemorySource / RasterFileSource tests (modeled on the reference
tests/test_raster_sources.py)."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu.raster.sources import MemorySource, RasterFileSource


class TestMemorySourceAttrs:
    def test_attrs(self, source):
        assert source.dtype == np.uint8
        assert source.fillvalue == 255
        assert source.projection == "EPSG:28992"
        assert tuple(source.geo_transform) == (135000.0, 0.5, 0, 456000.0, 0, -0.5)
        assert source.period == (datetime(2000, 1, 1), datetime(2000, 1, 1, 2))
        assert source.timedelta == timedelta(hours=1)
        assert source.temporal
        assert len(source) == 3

    def test_extent_wgs84(self, source):
        x1, y1, x2, y2 = source.extent
        assert 5.0 < x1 < 5.2  # RD (135000, 456000) is ~5.09°E, 52.09°N
        assert 52.0 < y1 < 52.2

    def test_empty(self, empty_source):
        assert empty_source.period is None
        assert empty_source.extent is None
        assert len(empty_source) == 0

    def test_int64_downcast(self):
        source = MemorySource(
            data=np.zeros((1, 2, 2), dtype=np.int64),
            no_data_value=9,
            projection="EPSG:28992",
            pixel_size=1,
            pixel_origin=(0, 0),
        )
        assert source.dtype == np.int32

    def test_validation(self):
        with pytest.raises(ValueError):
            MemorySource(
                data=np.zeros((2, 2, 2, 2), dtype=np.uint8),
                no_data_value=255,
                projection="EPSG:28992",
                pixel_size=1,
                pixel_origin=(0, 0),
            )
        with pytest.raises(ValueError):
            # temporal data requires time_delta
            MemorySource(
                data=np.zeros((2, 2, 2), dtype=np.uint8),
                no_data_value=255,
                projection="EPSG:28992",
                pixel_size=1,
                pixel_origin=(0, 0),
            )


class TestMemorySourceData:
    def test_vals(self, source, vals_request):
        data = source.get_data(**vals_request)
        assert data["values"].shape == (3, 6, 4)
        assert data["no_data_value"] == 255
        assert (data["values"][0] == 1).all()
        assert (data["values"][1] == 7).all()
        assert (data["values"][2] == 255).all()

    def test_vals_outside_period(self, source, vals_request_none):
        assert source.get_data(**vals_request_none) is None

    def test_time(self, source, vals_request, expected_time):
        request = dict(vals_request, mode="time")
        assert source.get_data(**request)["time"] == expected_time

    def test_meta(self, source, vals_request, expected_meta):
        request = dict(vals_request, mode="meta")
        assert source.get_data(**request)["meta"] == expected_meta

    def test_time_latest(self, source):
        data = source.get_data(mode="time")
        assert data["time"] == [datetime(2000, 1, 1, 2)]

    def test_point_request(self, source, point_request):
        data = source.get_data(**point_request)
        assert data["values"].shape == (3, 1, 1)
        assert data["values"][0, 0, 0] == 1
        assert data["values"][1, 0, 0] == 7

    def test_point_outside(self, source, point_request):
        request = dict(point_request, bbox=(1, 1, 1, 1))
        data = source.get_data(**request)
        assert (data["values"] == 255).all()

    def test_zoom_in(self, source, vals_request):
        # request 1 source pixel as 2x2: nearest neighbour upsampling
        request = dict(
            vals_request, bbox=(135000, 455999.5, 135000.5, 456000), width=2, height=2
        )
        data = source.get_data(**request)
        assert data["values"].shape == (3, 2, 2)
        assert (data["values"][0] == 1).all()

    def test_padding(self, source, vals_request):
        # request extends to the west of the data: padded with nodata
        request = dict(
            vals_request, bbox=(134999, 455999, 135001, 456000), width=4, height=2
        )
        data = source.get_data(**request)
        assert data["values"].shape == (3, 2, 4)
        assert (data["values"][0, :, :2] == 255).all()  # outside
        assert (data["values"][0, :, 2:] == 1).all()  # inside

    def test_reprojection(self, source, vals_request):
        # request in EPSG:3857 over the same area
        from dask_geomodeling_tpu.geo import Extent

        extent = Extent(vals_request["bbox"], "EPSG:28992").transformed("EPSG:3857")
        request = dict(vals_request, bbox=extent.bbox, projection="EPSG:3857")
        data = source.get_data(**request)
        assert data["values"].shape == (3, 6, 4)
        assert (data["values"][0] == 1).all()

    def test_time_request_with_start_only(self, source):
        data = source.get_data(mode="time", start=datetime(2000, 1, 1, 0, 40))
        assert data["time"] == [datetime(2000, 1, 1, 1)]


class TestRasterFileSource:
    @pytest.fixture(scope="class")
    def tif_source(self, tmp_path_factory):
        from dask_geomodeling_tpu import config
        from dask_geomodeling_tpu.io.geotiff import write_geotiff

        root = tmp_path_factory.mktemp("rfs")
        data = np.arange(200, dtype=np.uint8).reshape(2, 10, 10) % 100
        write_geotiff(
            str(root / "test.tif"),
            data,
            geo_transform=(135000.0, 0.5, 0, 456000.0, 0, -0.5),
            projection="EPSG:28992",
            no_data_value=255,
        )
        with config.set({"geomodeling.root": str(root)}):
            yield RasterFileSource("test.tif", time_delta=timedelta(hours=1))

    def test_attrs(self, tif_source):
        assert tif_source.dtype == np.uint8
        assert tif_source.fillvalue == 255
        assert tif_source.projection == "EPSG:28992"
        assert len(tif_source) == 2
        assert tif_source.timedelta == timedelta(hours=1)
        assert tuple(tif_source.geo_transform) == (135000.0, 0.5, 0, 456000.0, 0, -0.5)

    def test_vals(self, tif_source):
        data = tif_source.get_data(
            mode="vals",
            bbox=(135000, 455995, 135005, 456000),
            projection="EPSG:28992",
            width=10,
            height=10,
            start=datetime(1970, 1, 1),
            stop=datetime(1970, 1, 1, 1),
        )
        assert data["values"].shape == (2, 10, 10)
        expected = np.arange(200, dtype=np.uint8).reshape(2, 10, 10) % 100
        np.testing.assert_array_equal(data["values"], expected)

    def test_time(self, tif_source):
        data = tif_source.get_data(mode="time")
        assert data["time"] == [datetime(1970, 1, 1, 1)]


class TestSinglePixelSourceSweep:
    """Ported from reference tests/test_raster_sources.py:19-263
    (TstRasterSourceBase): a one-pixel raster at (136700, 455800), pixel
    size 5, value 5 — exercised through both MemorySource and a GeoTIFF
    RasterFileSource."""

    @pytest.fixture(params=["memory", "geotiff"])
    def pixel_source(self, request, tmp_path):
        memory = MemorySource(
            data=np.array([[[5]]], dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=5,
            pixel_origin=(136700, 455800),
        )
        if request.param == "memory":
            return memory
        from dask_geomodeling_tpu import config
        from dask_geomodeling_tpu.io.geotiff import write_geotiff

        path = tmp_path / "single_pixel.tif"
        write_geotiff(
            str(path),
            np.array([[[5]]], dtype=np.uint8),
            geo_transform=(136700.0, 5.0, 0.0, 455800.0, 0.0, -5.0),
            projection="EPSG:28992",
            no_data_value=255,
        )
        with config.set({"geomodeling.root": str(tmp_path)}):
            source = RasterFileSource("single_pixel.tif")
            source.period  # cache file info inside the config context
            return source

    @pytest.fixture
    def temporal_source(self):
        return MemorySource(
            data=np.array([[[4]], [[5]]], dtype=np.uint8),
            no_data_value=255,
            projection="EPSG:28992",
            pixel_size=5,
            pixel_origin=(136700, 455800),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(days=1),
            metadata=["meta 1", "meta 2"],
        )

    def request_bbox(self, bbox, width, height):
        return dict(
            mode="vals", projection="EPSG:28992", bbox=bbox,
            width=width, height=height,
        )

    def test_bbox_1x1(self, pixel_source):
        data = pixel_source.get_data(
            **self.request_bbox((136700, 455795, 136705, 455800), 1, 1)
        )
        assert data["values"].shape == (1, 1, 1)
        np.testing.assert_array_equal(data["values"], 5)

    @pytest.mark.parametrize("dx,dy", [(0, -5), (-5, 0), (0, 5), (5, 0)])
    def test_bbox_1x1_nodata(self, pixel_source, dx, dy):
        data = pixel_source.get_data(
            **self.request_bbox(
                (136700 + dx, 455795 + dy, 136705 + dx, 455800 + dy), 1, 1
            )
        )
        np.testing.assert_array_equal(data["values"], data["no_data_value"])

    def test_bbox_2x1(self, pixel_source):
        data = pixel_source.get_data(
            **self.request_bbox((136700, 455795, 136710, 455800), 2, 1)
        )
        assert data["values"].shape == (1, 1, 2)
        np.testing.assert_array_equal(
            data["values"], [[[5, data["no_data_value"]]]]
        )

    def test_bbox_1x2(self, pixel_source):
        # y axis swap: nodata lands on the low-y = high-row side
        data = pixel_source.get_data(
            **self.request_bbox((136700, 455790, 136705, 455800), 1, 2)
        )
        assert data["values"].shape == (1, 2, 1)
        np.testing.assert_array_equal(
            data["values"], [[[5], [data["no_data_value"]]]]
        )

    def test_bbox_4x2(self, pixel_source):
        data = pixel_source.get_data(
            **self.request_bbox((136700, 455795, 136710, 455800), 4, 2)
        )
        n = data["no_data_value"]
        np.testing.assert_array_equal(
            data["values"], [[[5, 5, n, n], [5, 5, n, n]]]
        )

    def test_bbox_zoom_in(self, pixel_source):
        data = pixel_source.get_data(
            **self.request_bbox((136700, 455795, 136705, 455800), 5, 5)
        )
        assert data["values"].shape == (1, 5, 5)
        np.testing.assert_array_equal(data["values"], 5)

    def test_get_time_nearest(self, temporal_source):
        for start, expected in [
            (datetime(1970, 1, 1), datetime(2000, 1, 1)),
            (datetime(2000, 1, 1), datetime(2000, 1, 1)),
            (datetime(2000, 1, 1, 12), datetime(2000, 1, 1)),
            (datetime(2000, 1, 1, 12, 1), datetime(2000, 1, 2)),
            (datetime(2000, 1, 2), datetime(2000, 1, 2)),
            (datetime(2018, 1, 1), datetime(2000, 1, 2)),
        ]:
            data = temporal_source.get_data(mode="time", start=start)
            assert data["time"] == [expected]

    def test_get_time_range(self, temporal_source):
        cases = [
            ((datetime(1970, 1, 1), datetime(1999, 12, 31, 12, 59)), []),
            ((datetime(2000, 1, 2, 0, 1), datetime(2018, 1, 1)), []),
            ((datetime(1970, 1, 1), datetime(2000, 1, 1)), [datetime(2000, 1, 1)]),
            ((datetime(2000, 1, 1), datetime(2000, 1, 1)), [datetime(2000, 1, 1)]),
            (
                (datetime(2000, 1, 1), datetime(2000, 1, 1, 23, 59)),
                [datetime(2000, 1, 1)],
            ),
            (
                (datetime(1970, 1, 1), datetime(2010, 1, 1)),
                [datetime(2000, 1, 1), datetime(2000, 1, 2)],
            ),
            (
                (datetime(2000, 1, 1), datetime(2000, 1, 2)),
                [datetime(2000, 1, 1), datetime(2000, 1, 2)],
            ),
        ]
        for (start, stop), expected in cases:
            data = temporal_source.get_data(mode="time", start=start, stop=stop)
            assert data["time"] == expected

    def test_get_meta(self, temporal_source):
        assert temporal_source.get_data(mode="meta")["meta"] == ["meta 2"]
        assert temporal_source.get_data(
            mode="meta", start=datetime(1970, 1, 1)
        )["meta"] == ["meta 1"]
        assert temporal_source.get_data(
            mode="meta", start=datetime(1970, 1, 1), stop=datetime(2010, 1, 1)
        )["meta"] == ["meta 1", "meta 2"]
        assert temporal_source.get_data(
            mode="meta", start=datetime(1970, 1, 1), stop=datetime(1971, 1, 1)
        )["meta"] == []
