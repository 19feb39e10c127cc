"""Geo foundation tests (modeled on reference tests/test_utils.py)."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu import utils
from dask_geomodeling_tpu.geo.geometry import Point, box


class TestDtypes:
    def test_get_dtype_max(self):
        assert utils.get_dtype_max("u1") == 255
        assert utils.get_dtype_max("i2") == 32767
        assert utils.get_dtype_max("f4") == np.finfo("f4").max.item()
        assert isinstance(utils.get_dtype_max("f8"), float)
        assert isinstance(utils.get_dtype_max("u4"), int)

    def test_get_dtype_min(self):
        assert utils.get_dtype_min("u1") == 0
        assert utils.get_dtype_min("i1") == -128
        assert isinstance(utils.get_dtype_min("f4"), float)

    def test_get_int_dtype(self):
        # n values fit if n-1 <= dtype max (the nodata value is dtype min)
        assert utils.get_int_dtype(1) == np.dtype("i1")
        assert utils.get_int_dtype(128) == np.dtype("i1")
        assert utils.get_int_dtype(129) == np.dtype("i2")
        assert utils.get_int_dtype(2**31 + 1) == np.dtype("i8")

    def test_get_uint_dtype(self):
        assert utils.get_uint_dtype(1) == np.dtype("u1")
        assert utils.get_uint_dtype(256) == np.dtype("u1")
        assert utils.get_uint_dtype(257) == np.dtype("u2")
        with pytest.raises(ValueError):
            utils.get_uint_dtype(-1)

    def test_get_index(self):
        values = np.array([1.0, 2.0, 7.0])
        index = utils.get_index(values, 7.0)
        assert index.tolist() == [True, True, False]
        # integer path
        values = np.array([1, 2, 7])
        assert utils.get_index(values, 7).tolist() == [True, True, False]

    def test_get_footprint(self):
        fp = utils.get_footprint(5)
        assert fp.shape == (5, 5)
        assert fp[2, 2]  # center is set
        assert not fp[0, 0]  # corner is not

    def test_parse_percentile(self):
        assert utils.parse_percentile_statistic("p75") == ("percentile", 75.0)
        assert utils.parse_percentile_statistic("p7.5") == ("percentile", 7.5)
        assert utils.parse_percentile_statistic("mean") == ("mean", None)
        with pytest.raises(ValueError):
            utils.parse_percentile_statistic("p101")

    def test_dtype_for_statistic(self):
        assert utils.dtype_for_statistic(np.dtype("u1"), "min") == np.dtype("u1")
        assert utils.dtype_for_statistic(np.dtype("u1"), "sum") == np.dtype("i4")
        assert utils.dtype_for_statistic(np.dtype("f8"), "sum") == np.dtype("f8")
        assert utils.dtype_for_statistic(np.dtype("u1"), "count") == np.dtype("i4")
        assert utils.dtype_for_statistic(np.dtype("u1"), "mean") == np.dtype("f4")
        assert utils.dtype_for_statistic(np.dtype("f8"), "p50") == np.dtype("f8")


class TestGeoTransform:
    gt = (128.0, 1.0, 0.0, 512.0, 0.0, -0.5)

    def test_validation(self):
        with pytest.raises(ValueError):
            utils.GeoTransform((0, 1, 0, 0, 0))  # wrong length
        with pytest.raises(ValueError):
            utils.GeoTransform((0, 1, 0.5, 0, 0, -1))  # tilted
        with pytest.raises(ValueError):
            utils.GeoTransform((0, 0, 0, 0, 0, -1))  # zero pixel size

    def test_from_bbox(self):
        gt = utils.GeoTransform.from_bbox((0, 0, 10, 20), height=10, width=5)
        assert tuple(gt) == (0, 2.0, 0, 20, 0, -2.0)

    def test_origin_and_cell_area(self):
        gt = utils.GeoTransform(self.gt)
        assert gt.origin == (128.0, 512.0)
        assert gt.origin_normalized == (0.0, 0.0)
        assert gt.cell_area == 0.5

    def test_get_indices_for_bbox(self):
        gt = utils.GeoTransform(self.gt)
        indices = gt.get_indices_for_bbox((128, 511, 132, 512))
        assert indices == ((0, 2), (0, 4))

    def test_get_indices(self):
        gt = utils.GeoTransform(self.gt)
        i, j = gt.get_indices(np.array([[128.5, 511.75], [131.5, 511.25]]))
        assert i.tolist() == [0, 1]
        assert j.tolist() == [0, 3]

    def test_get_bbox(self):
        gt = utils.GeoTransform(self.gt)
        assert gt.get_bbox((0, 0), (2, 4)) == (128.0, 511.0, 132.0, 512.0)

    def test_shift_scale(self):
        gt = utils.GeoTransform(self.gt)
        shifted = gt.shift((2, 4))
        assert shifted.origin == (132.0, 511.0)
        scaled = gt.scale(2, 2)
        assert scaled[1] == 2.0 and scaled[5] == -1.0

    def test_get_array_ranges_inside(self):
        gt = utils.GeoTransform.from_bbox((0, 0, 10, 10), 10, 10)
        ranges, padding = gt.get_array_ranges((2, 2, 5, 5), (1, 10, 10))
        assert ranges == ((5, 8), (2, 5))
        assert padding is None

    def test_get_array_ranges_padding(self):
        gt = utils.GeoTransform.from_bbox((0, 0, 10, 10), 10, 10)
        ranges, padding = gt.get_array_ranges((-2, 8, 2, 12), (1, 10, 10))
        assert ranges == ((0, 2), (0, 2))
        assert padding == ((2, 0), (2, 0))

    def test_get_array_ranges_point(self):
        gt = utils.GeoTransform.from_bbox((0, 0, 10, 10), 10, 10)
        ranges, padding = gt.get_array_ranges((3, 3, 3, 3), (1, 10, 10))
        assert ranges == ((7, 8), (3, 4))
        assert padding is None

    def test_aligns_with(self):
        gt = utils.GeoTransform(self.gt)
        assert gt.aligns_with((0.0, 1.0, 0.0, 0.0, 0.0, 0.5))
        assert gt.aligns_with(gt.shift((5, 3)))
        assert not gt.aligns_with((0.25, 1.0, 0.0, 0.0, 0.0, -0.5))
        assert not gt.aligns_with((0.0, 2.0, 0.0, 0.0, 0.0, -0.5))


class TestExtent:
    def test_basic(self):
        extent = utils.Extent((0, 0, 4, 2), "EPSG:3857")
        assert extent.width == 4 and extent.height == 2

    def test_buffered(self):
        extent = utils.Extent((0, 0, 4, 2), "EPSG:3857")
        assert extent.buffered(1).bbox == (-1, -1, 5, 3)

    def test_transformed_identity(self):
        extent = utils.Extent((0, 0, 4, 2), "EPSG:3857")
        assert extent.transformed("EPSG:3857") is extent

    def test_transformed(self):
        extent = utils.Extent((0, 50, 10, 55), "EPSG:4326")
        out = extent.transformed("EPSG:3857")
        assert out.srs == "EPSG:3857"
        assert out.bbox[0] == pytest.approx(0)
        assert out.bbox[2] == pytest.approx(1113194.9, rel=1e-4)

    def test_union_intersection(self):
        a = utils.Extent((0, 0, 4, 2), "EPSG:3857")
        b = utils.Extent((2, 1, 6, 3), "EPSG:3857")
        assert a.union(b).bbox == (0, 0, 6, 3)
        assert a.intersection(b).bbox == (2, 1, 4, 2)
        c = utils.Extent((10, 10, 11, 11), "EPSG:3857")
        assert a.intersection(c) is None

    def test_geometry_roundtrip(self):
        extent = utils.Extent((0, 0, 4, 2), "EPSG:3857")
        geom = extent.as_geometry()
        back = utils.Extent.from_geometry(geom)
        assert back.bbox == extent.bbox
        assert back.srs == "EPSG:3857"


class TestCRS:
    def test_get_sr(self):
        sr = utils.get_sr("EPSG:4326")
        assert sr.IsGeographic()
        sr = utils.get_sr("EPSG:28992")
        assert not sr.IsGeographic()
        assert sr.GetAuthorityCode() == "28992"

    def test_get_sr_from_wkt(self):
        wkt = utils.get_sr("EPSG:28992").ExportToWkt()
        assert utils.get_sr(wkt).code == 28992

    def test_get_epsg_or_wkt(self):
        assert utils.get_epsg_or_wkt("EPSG:4326") == "EPSG:4326"

    def test_get_projection(self):
        assert utils.get_projection(utils.get_sr("EPSG:3857")) == "EPSG:3857"

    def test_transform_known_point(self):
        x, y = utils.transform_points(5.0, 52.0, "EPSG:4326", "EPSG:3857")
        assert float(x) == pytest.approx(556597.45, abs=0.1)
        assert float(y) == pytest.approx(6800125.45, abs=0.1)

    def test_transform_rd(self):
        # the RD origin (Amersfoort) in WGS84
        lon, lat = utils.transform_points(155000, 463000, "EPSG:28992", "EPSG:4326")
        assert float(lon) == pytest.approx(5.38720, abs=1e-4)
        assert float(lat) == pytest.approx(52.15517, abs=1e-4)

    def test_transform_roundtrip(self):
        x, y = utils.transform_points(85000.0, 446000.0, "EPSG:28992", "EPSG:3857")
        x2, y2 = utils.transform_points(x, y, "EPSG:3857", "EPSG:28992")
        assert float(x2) == pytest.approx(85000.0, abs=0.01)
        assert float(y2) == pytest.approx(446000.0, abs=0.01)

    def test_shapely_transform(self):
        geom = utils.shapely_transform(Point(5.0, 52.0), "EPSG:4326", "EPSG:3857")
        assert geom.x == pytest.approx(556597.45, abs=0.1)

    def test_transform_min_size(self):
        size = utils.transform_min_size(
            100.0, box(85000, 445000, 86000, 446000), "EPSG:28992", "EPSG:4326"
        )
        assert 0.0005 < size < 0.005  # ~100m in degrees

    def test_unknown_crs_raises(self):
        with pytest.raises(utils.TransformException):
            utils.get_sr("EPSG:99999")

    def test_parametric_wkt_matches_registry(self):
        # GDAL-style WKT WITHOUT an authority tag: parsed from parameters
        wkt = (
            'PROJCS["Amersfoort / RD New",GEOGCS["Amersfoort",'
            'DATUM["Amersfoort",SPHEROID["Bessel 1841",6377397.155,'
            "299.1528128],TOWGS84[565.417,50.3319,465.552,-0.398957,"
            '0.343988,-1.8774,4.0725]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Oblique_Stereographic"],'
            'PARAMETER["latitude_of_origin",52.1561605555556],'
            'PARAMETER["central_meridian",5.38763888888889],'
            'PARAMETER["scale_factor",0.9999079],'
            'PARAMETER["false_easting",155000],'
            'PARAMETER["false_northing",463000],UNIT["metre",1]]'
        )
        sr = utils.get_sr(wkt)
        assert sr.datum == "Amersfoort"  # known datum re-matched from params
        x, y = utils.transform_points(
            np.array([5.2]), np.array([52.1]), "EPSG:4326", sr
        )
        xr, yr = utils.transform_points(
            np.array([5.2]), np.array([52.1]), "EPSG:4326", "EPSG:28992"
        )
        assert float(x[0]) == pytest.approx(float(xr[0]), abs=1e-6)
        assert float(y[0]) == pytest.approx(float(yr[0]), abs=1e-6)

    @pytest.mark.parametrize(
        "proj4,epsg,lonlat",
        [
            (
                "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 "
                "+x_0=700000 +y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0",
                "EPSG:2154",
                (2.35, 48.85),
            ),
            ("+proj=utm +zone=33 +south +ellps=WGS84", "EPSG:32733", (15.0, -33.0)),
            (
                "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
                "+ellps=GRS80",
                "EPSG:3035",
                (5.0, 52.0),
            ),
        ],
    )
    def test_proj4_matches_registry(self, proj4, epsg, lonlat):
        lon, lat = np.array([lonlat[0]]), np.array([lonlat[1]])
        x, y = utils.transform_points(lon, lat, "EPSG:4326", utils.get_sr(proj4))
        xr, yr = utils.transform_points(lon, lat, "EPSG:4326", epsg)
        assert float(x[0]) == pytest.approx(float(xr[0]), abs=1e-6)
        assert float(y[0]) == pytest.approx(float(yr[0]), abs=1e-6)

    def test_parametric_equality_and_identity(self):
        a = utils.get_sr("+proj=utm +zone=31 +ellps=WGS84")
        b = utils.get_sr("+proj=utm +zone=31 +ellps=WGS84")
        assert a == b
        x, y = utils.transform_points(np.array([1.0]), np.array([2.0]), a, b)
        assert float(x[0]) == 1.0 and float(y[0]) == 2.0


class TestTime:
    def test_snap_empty(self):
        assert utils.snap_start_stop(None, None, None, None, 0) == (None,) * 4

    def test_snap_latest(self):
        t0 = datetime(2000, 1, 1)
        dt = timedelta(hours=1)
        start, stop, fi, li = utils.snap_start_stop(None, None, t0, dt, 5)
        assert start == stop == datetime(2000, 1, 1, 4)
        assert fi == li == 4

    def test_snap_nearest(self):
        t0 = datetime(2000, 1, 1)
        dt = timedelta(hours=1)
        start, stop, fi, li = utils.snap_start_stop(
            datetime(2000, 1, 1, 1, 40), None, t0, dt, 5
        )
        assert fi == li == 2
        assert start == datetime(2000, 1, 1, 2)
        # clamping below / above
        assert utils.snap_start_stop(datetime(1999, 1, 1), None, t0, dt, 5)[2] == 0
        assert utils.snap_start_stop(datetime(2001, 1, 1), None, t0, dt, 5)[2] == 4

    def test_snap_interval(self):
        t0 = datetime(2000, 1, 1)
        dt = timedelta(hours=1)
        start, stop, fi, li = utils.snap_start_stop(
            datetime(2000, 1, 1, 0, 30), datetime(2000, 1, 1, 3, 30), t0, dt, 5
        )
        assert (fi, li) == (1, 3)
        assert start == datetime(2000, 1, 1, 1)
        assert stop == datetime(2000, 1, 1, 3)

    def test_snap_interval_no_overlap(self):
        t0 = datetime(2000, 1, 1)
        dt = timedelta(hours=1)
        result = utils.snap_start_stop(
            datetime(2001, 1, 1), datetime(2001, 1, 2), t0, dt, 5
        )
        assert result == (None,) * 4

    def test_snap_single_frame(self):
        t0 = datetime(2000, 1, 1)
        start, stop, fi, li = utils.snap_start_stop(
            datetime(1999, 1, 1), datetime(2001, 1, 1), t0, None, 1
        )
        assert (fi, li) == (0, 0)
        assert start == stop == t0

    def test_find_neighbours(self):
        arr = [0.0, 1.0, 2.0, 3.0]
        assert utils.find_neigbours(arr, np.array([1.4])).tolist() == [1]
        assert utils.find_neigbours(arr, np.array([1.6])).tolist() == [2]
        assert (
            utils.find_neigbours(arr, np.array([1.4]), "forward").tolist() == [2]
        )
        assert (
            utils.find_neigbours(arr, np.array([1.6]), "backward").tolist() == [1]
        )
        assert utils.find_neigbours(arr, np.array([-5.0])).tolist() == [0]
        assert utils.find_neigbours(arr, np.array([99.0])).tolist() == [3]
        with pytest.raises(ValueError):
            utils.find_neigbours(arr, np.array([0.0]), "sideways")

    def test_dt_ms_roundtrip(self):
        dt = datetime(2018, 3, 1, 12, 30)
        assert utils.ms_to_dt(utils.dt_to_ms(dt)) == dt

    def test_offset_to_timedelta(self):
        assert utils.offset_to_timedelta("h") == timedelta(hours=1)
        assert utils.offset_to_timedelta("2h") == timedelta(hours=2)
        assert utils.offset_to_timedelta("H") == timedelta(hours=1)  # legacy
        assert utils.offset_to_timedelta("ME") is None  # month end

    def test_normalize_offset(self):
        assert utils.normalize_offset("M") == "ME"
        assert utils.normalize_offset("H") == "h"
        assert utils.normalize_offset("5T") == "5min"
        assert utils.normalize_offset(None) is None


class TestPercentile:
    def test_no_labels(self):
        data = np.array([1.0, 2.0, 3.0, 4.0])
        assert utils.percentile(data, 50) == np.percentile(data, 50)

    def test_with_labels(self):
        data = np.array([[1, 2, 0, 1], [5, 3, 0, 4], [0, 0, 0, 7], [9, 3, 0, 0]])
        labels = np.array(
            [[1, 1, 0, 2], [1, 1, 0, 2], [0, 0, 0, 2], [3, 3, 0, 0]]
        )
        result = utils.percentile(data, 75, labels=labels, index=np.array([1, 2, 3]))
        assert result == [3.5, 5.5, 7.5]

    def test_scalar_index(self):
        data = np.array([1, 2, 3, 4])
        labels = np.array([1, 1, 2, 2])
        assert utils.percentile(data, 50, labels, 1) == 1.5

    def test_labels_no_index(self):
        data = np.array([1, 2, 3, 4])
        labels = np.array([0, 1, 1, 0])
        assert utils.percentile(data, 50, labels) == 2.5

    def test_matches_numpy_per_group(self):
        rng = np.random.RandomState(0)
        data = rng.rand(100)
        labels = rng.randint(1, 5, 100)
        result = utils.percentile(data, 30, labels, index=np.arange(1, 5))
        expected = [np.percentile(data[labels == i], 30) for i in range(1, 5)]
        np.testing.assert_allclose(result, expected)


class TestSafeFiles:
    def test_relative_resolves_against_root(self, tmp_path):
        with config.set({"geomodeling.root": str(tmp_path)}):
            url = utils.safe_file_url("data/file.tif")
            assert url == "file://" + str(tmp_path / "data" / "file.tif")

    def test_absolute(self):
        assert utils.safe_file_url("file:///a/b") == "file:///a/b"

    def test_unknown_protocol(self):
        with pytest.raises(NotImplementedError):
            utils.safe_file_url("http://example.com/x")

    def test_strict(self, tmp_path):
        with config.set(
            {"geomodeling.root": str(tmp_path), "geomodeling.strict-file-paths": True}
        ):
            with pytest.raises(IOError):
                utils.safe_file_url("/etc/passwd")
            url = utils.safe_file_url(str(tmp_path / "ok.tif"))
            assert url.endswith("ok.tif")

    def test_safe_abspath(self, tmp_path):
        with config.set({"geomodeling.root": str(tmp_path)}):
            assert utils.safe_abspath("x.tif") == str(tmp_path / "x.tif")


class TestRasterize:
    def test_bool_burn(self):
        import pandas as pd
        from dask_geomodeling_tpu.geo.features import GeoSeries

        gs = GeoSeries([box(2, 2, 8, 8)], crs="EPSG:28992")
        result = utils.rasterize_geoseries(gs, (0, 0, 10, 10), "EPSG:28992", 10, 10)
        values = result["values"]
        assert values.dtype == bool
        assert result["no_data_value"] is None
        assert values.sum() == 36  # 6x6 pixel centers inside
        assert values[0, 5, 5] and not values[0, 0, 0]

    def test_value_burn_float(self):
        import pandas as pd
        from dask_geomodeling_tpu.geo.features import GeoSeries

        gs = GeoSeries([box(0, 0, 10, 5), box(0, 5, 10, 10)])
        values = pd.Series([1.5, 2.5])
        result = utils.rasterize_geoseries(
            gs, (0, 0, 10, 10), "EPSG:28992", 10, 10, values=values
        )
        assert result["values"].dtype == np.float64
        # top half is the second polygon (row 0 = north)
        assert result["values"][0, 0, 0] == 2.5
        assert result["values"][0, 9, 9] == 1.5

    def test_value_burn_int(self):
        import pandas as pd
        from dask_geomodeling_tpu.geo.features import GeoSeries

        gs = GeoSeries([box(0, 0, 10, 10)])
        result = utils.rasterize_geoseries(
            gs, (0, 0, 10, 10), "EPSG:28992", 10, 10, values=pd.Series([7])
        )
        assert result["values"].dtype == np.int32
        assert (result["values"] == 7).all()

    def test_empty(self):
        result = utils.rasterize_geoseries(None, (0, 0, 10, 10), "EPSG:28992", 5, 5)
        assert result["values"].shape == (1, 5, 5)
        assert not result["values"].any()

    def test_point_request(self):
        import pandas as pd
        from dask_geomodeling_tpu.geo.features import GeoSeries

        gs = GeoSeries([box(0, 0, 10, 10)])
        result = utils.rasterize_geoseries(
            gs, (5, 5, 5, 5), "EPSG:28992", 1, 1, values=pd.Series([3.0])
        )
        assert result["values"][0, 0, 0] == 3.0
        # point outside
        result = utils.rasterize_geoseries(
            gs, (50, 50, 50, 50), "EPSG:28992", 1, 1, values=pd.Series([3.0])
        )
        assert result["values"][0, 0, 0] == utils.get_dtype_max(np.float64)


class TestNativeRasterizer:
    def test_native_matches_numpy(self):
        import pandas as pd

        from dask_geomodeling_tpu.geo import rasterize as rmod
        from dask_geomodeling_tpu.geo.features import GeoSeries
        from dask_geomodeling_tpu.geo.geometry import Polygon, box
        from dask_geomodeling_tpu.native import load_rasterizer

        if load_rasterizer() is None:
            pytest.skip("no compiler available")

        donut = Polygon(
            [(0, 0), (50, 0), (50, 50), (0, 50)],
            [[(20, 20), (30, 20), (30, 30), (20, 30)]],
        )
        tri = Polygon([(60, 60), (90, 60), (75, 95)])
        gs = GeoSeries([donut, tri, box(40, 40, 70, 70)])
        values = pd.Series([1, 2, 3], dtype="int32")
        args = (gs, (0, 0, 100, 100), "EPSG:28992", 100, 100)

        native = rmod.rasterize_geoseries(*args, values=values)
        orig = rmod._burn_native
        rmod._burn_native = lambda *a: False
        try:
            fallback = rmod.rasterize_geoseries(*args, values=values)
        finally:
            rmod._burn_native = orig
        np.testing.assert_array_equal(native["values"], fallback["values"])

    def test_native_bool_path(self):
        from dask_geomodeling_tpu.geo import rasterize as rmod
        from dask_geomodeling_tpu.geo.features import GeoSeries
        from dask_geomodeling_tpu.geo.geometry import box
        from dask_geomodeling_tpu.native import load_rasterizer

        if load_rasterizer() is None:
            pytest.skip("no compiler available")

        gs = GeoSeries([box(2, 2, 8, 8)])
        result = rmod.rasterize_geoseries(gs, (0, 0, 10, 10), "EPSG:28992", 10, 10)
        assert result["values"].dtype == bool
        assert result["values"].sum() == 36


class TestMoreProjections:
    def test_lambert93(self):
        # Paris in RGF93 / Lambert-93
        x, y = utils.transform_points(2.3522, 48.8566, "EPSG:4326", "EPSG:2154")
        assert float(x) == pytest.approx(652470, abs=10)
        assert float(y) == pytest.approx(6862035, abs=10)
        lon, lat = utils.transform_points(x, y, "EPSG:2154", "EPSG:4326")
        assert float(lon) == pytest.approx(2.3522, abs=1e-9)
        assert float(lat) == pytest.approx(48.8566, abs=1e-9)

    def test_laea_europe(self):
        # the projection center maps onto the false origin
        x, y = utils.transform_points(10.0, 52.0, "EPSG:4326", "EPSG:3035")
        assert float(x) == pytest.approx(4321000, abs=0.01)
        assert float(y) == pytest.approx(3210000, abs=0.01)

    def test_laea_roundtrip(self):
        x, y = utils.transform_points(4.3517, 50.8503, "EPSG:4326", "EPSG:3035")
        lon, lat = utils.transform_points(x, y, "EPSG:3035", "EPSG:4326")
        assert float(lon) == pytest.approx(4.3517, abs=1e-8)
        assert float(lat) == pytest.approx(50.8503, abs=1e-8)

    def test_jax_traceable(self):
        """The new projections must trace into XLA like the others."""
        import jax
        import jax.numpy as jnp

        from dask_geomodeling_tpu.geo.crs import transform_points
        from dask_geomodeling_tpu.runtime.executor import _ensure_x64

        _ensure_x64()  # coordinate math requires float64

        @jax.jit
        def go(x, y):
            return transform_points(x, y, "EPSG:3035", "EPSG:2154", xp=jnp)

        x, y = go(jnp.asarray([3923672.0]), jnp.asarray([3097435.0]))
        ex, ey = utils.transform_points(
            np.array([3923672.0]), np.array([3097435.0]), "EPSG:3035", "EPSG:2154"
        )
        assert float(x[0]) == pytest.approx(float(ex[0]), abs=1e-3)
        assert float(y[0]) == pytest.approx(float(ey[0]), abs=1e-3)


class TestMemoryDataset:
    def test_create_dataset(self):
        array = np.arange(6, dtype=np.uint8).reshape(1, 2, 3)
        with utils.Dataset(
            array,
            geo_transform=(0.0, 1.0, 0.0, 2.0, 0.0, -1.0),
            projection="EPSG:28992",
            no_data_value=255,
        ) as dataset:
            assert dataset.RasterCount == 1
            assert dataset.RasterYSize == 2
            assert dataset.RasterXSize == 3
            assert dataset.GetGeoTransform() == (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)
            assert "28992" in dataset.GetProjection()
            assert dataset.GetNoDataValue() == 255
            np.testing.assert_array_equal(dataset.ReadAsArray(), array)

    def test_create_dataset_validation(self):
        with pytest.raises(ValueError):
            utils.create_dataset(np.zeros((2, 2)))


class TestEllipsoidalMercator:
    """EPSG:3395 (Mercator variant A) must use the ellipsoidal formulas —
    at 52N it differs from spherical web mercator by ~34 km."""

    def test_matches_isometric_latitude(self):
        import math

        a, invf = 6378137.0, 298.257223563
        e = math.sqrt((1 / invf) * (2 - 1 / invf))
        phi = math.radians(52.0)
        psi = math.atanh(math.sin(phi)) - e * math.atanh(e * math.sin(phi))
        x, y = utils.transform_points(
            np.array([5.0]), np.array([52.0]), "EPSG:4326", "EPSG:3395"
        )
        assert float(x[0]) == pytest.approx(a * math.radians(5.0), abs=1e-6)
        assert float(y[0]) == pytest.approx(a * psi, abs=1e-6)

    def test_differs_from_spherical(self):
        _, y3395 = utils.transform_points(
            np.array([5.0]), np.array([52.0]), "EPSG:4326", "EPSG:3395"
        )
        _, y3857 = utils.transform_points(
            np.array([5.0]), np.array([52.0]), "EPSG:4326", "EPSG:3857"
        )
        assert 30000 < float(y3857[0]) - float(y3395[0]) < 40000

    def test_roundtrip(self):
        x, y = utils.transform_points(
            np.array([5.0]), np.array([52.0]), "EPSG:4326", "EPSG:3395"
        )
        lon, lat = utils.transform_points(x, y, "EPSG:3395", "EPSG:4326")
        assert float(lon[0]) == pytest.approx(5.0, abs=1e-12)
        assert float(lat[0]) == pytest.approx(52.0, abs=1e-12)

    def test_parametric_wkt_matches_registry(self):
        wkt = (
            'PROJCS["WGS 84 / World Mercator",GEOGCS["WGS 84",'
            'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],'
            'PARAMETER["scale_factor",1],PARAMETER["false_easting",0],'
            'PARAMETER["false_northing",0],UNIT["metre",1]]'
        )
        x1, y1 = utils.transform_points(
            np.array([5.0]), np.array([52.0]), "EPSG:4326", utils.get_sr(wkt)
        )
        x2, y2 = utils.transform_points(
            np.array([5.0]), np.array([52.0]), "EPSG:4326", "EPSG:3395"
        )
        assert float(x1[0]) == float(x2[0]) and float(y1[0]) == float(y2[0])

    def test_proj4_lat_ts_variant_b(self):
        import math

        sr = utils.get_sr("+proj=merc +lat_ts=45 +ellps=WGS84")
        x, _ = utils.transform_points(
            np.array([5.0]), np.array([52.0]), "EPSG:4326", sr
        )
        a, invf = 6378137.0, 298.257223563
        e2 = (1 / invf) * (2 - 1 / invf)
        k0 = math.cos(math.radians(45)) / math.sqrt(
            1 - e2 * math.sin(math.radians(45)) ** 2
        )
        assert float(x[0]) == pytest.approx(a * math.radians(5.0) * k0, abs=1e-6)

    def test_nad83_geographic(self):
        sr = utils.get_sr("EPSG:4269")
        assert sr.IsGeographic()
        x, y = utils.transform_points(
            np.array([-100.0]), np.array([40.0]), "EPSG:4269", "EPSG:4326"
        )
        # NAD83 is treated as WGS84-coincident at this accuracy level
        assert float(x[0]) == pytest.approx(-100.0, abs=1e-9)


class TestAlbersAndPolarStereographic:
    """EPSG:5070 / 3413 / 3031 validated through differential map
    properties (equal-area Jacobian determinant, conformal isotropy,
    unit scale at the standard parallel) — independent of the formulas."""

    @staticmethod
    def jacobian(sr, lon, lat, h=1e-7):
        import math

        x0, y0 = utils.transform_points(
            np.array([lon]), np.array([lat]), "EPSG:4326", sr
        )
        xl, yl = utils.transform_points(
            np.array([lon + h]), np.array([lat]), "EPSG:4326", sr
        )
        xp_, yp_ = utils.transform_points(
            np.array([lon]), np.array([lat + h]), "EPSG:4326", sr
        )
        d = math.radians(h)
        return np.array(
            [
                [(xl[0] - x0[0]) / d, (xp_[0] - x0[0]) / d],
                [(yl[0] - y0[0]) / d, (yp_[0] - y0[0]) / d],
            ]
        )

    @pytest.mark.parametrize("lon,lat", [(-96, 23), (-120, 40), (-75, 45)])
    def test_albers_is_equal_area(self, lon, lat):
        import math

        a, invf = 6378137.0, 298.257222101  # GRS80
        e2 = (1 / invf) * (2 - 1 / invf)
        J = self.jacobian(utils.get_sr("EPSG:5070"), lon, lat)
        phi = math.radians(lat)
        expected = a * a * math.cos(phi) * (1 - e2) / (
            1 - e2 * math.sin(phi) ** 2
        ) ** 2
        assert np.linalg.det(J) / expected == pytest.approx(1.0, abs=1e-5)

    def test_albers_origin_and_roundtrip(self):
        x, y = utils.transform_points(
            np.array([-96.0]), np.array([23.0]), "EPSG:4326", "EPSG:5070"
        )
        assert float(x[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(y[0]) == pytest.approx(0.0, abs=1e-6)
        x, y = utils.transform_points(
            np.array([-120.0]), np.array([40.0]), "EPSG:4326", "EPSG:5070"
        )
        lon, lat = utils.transform_points(x, y, "EPSG:5070", "EPSG:4326")
        assert float(lon[0]) == pytest.approx(-120.0, abs=1e-9)
        assert float(lat[0]) == pytest.approx(40.0, abs=1e-7)

    @pytest.mark.parametrize(
        "epsg,sp,points",
        [
            ("EPSG:3413", 70.0, [(-45, 70), (10, 80), (-100, 65)]),
            ("EPSG:3031", -71.0, [(0, -71), (90, -80), (-60, -65)]),
        ],
    )
    def test_polar_stereographic_conformal(self, epsg, sp, points):
        import math

        a, invf = 6378137.0, 298.257223563  # WGS84
        e2 = (1 / invf) * (2 - 1 / invf)
        sr = utils.get_sr(epsg)
        for lon, lat in points:
            J = self.jacobian(sr, float(lon), float(lat))
            phi = math.radians(lat)
            nu = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            rho_m = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
            k_par = math.hypot(J[0, 0], J[1, 0]) / (nu * math.cos(phi))
            k_mer = math.hypot(J[0, 1], J[1, 1]) / rho_m
            assert k_par == pytest.approx(k_mer, rel=1e-5)  # conformal
            if lat == sp:
                assert k_par == pytest.approx(1.0, abs=1e-6)  # true scale

    def test_polar_stereographic_known_point(self):
        # (0E, 71S) on EPSG:3031 is (0, +2082760.11): on the south polar
        # aspect the Greenwich meridian points towards +y (N = FN +
        # rho cos(lam - lam0), EPSG 9829) — a previous sign bug mirrored
        # the grid across the x-axis
        x, y = utils.transform_points(
            np.array([0.0]), np.array([-71.0]), "EPSG:4326", "EPSG:3031"
        )
        assert float(x[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(y[0]) == pytest.approx(2082760.1085, abs=0.01)

    def test_polar_stereographic_south_epsg_worked_example(self):
        """EPSG Guidance 7-2 method 9829 (Australian Antarctic, EPSG:3032):
        75S 120E -> E 7255380.79, N 7053389.56."""
        from dask_geomodeling_tpu.geo.crs import _PolarStereographic, _ellipsoid

        p = _PolarStereographic(
            _ellipsoid("WGS84"),
            70.0,
            standard_parallel=71.0,
            false_easting=6000000.0,
            false_northing=6000000.0,
            north=False,
        )
        x, y = p.forward(120.0, -75.0)
        assert float(x) == pytest.approx(7255380.79, abs=0.01)
        assert float(y) == pytest.approx(7053389.56, abs=0.01)

    def test_lcc_southern_cone_roundtrip(self):
        """Southern-hemisphere LCC (n < 0) must invert to the same
        coordinates (regression: theta lacked the sign(n) correction)."""
        sr = utils.get_sr(
            "+proj=lcc +lat_1=-30 +lat_2=-60 +lat_0=-45 +lon_0=135 "
            "+ellps=GRS80 +towgs84=0,0,0"
        )
        for lon, lat in [(135.0, -45.0), (140.0, -35.0), (120.0, -55.0)]:
            x, y = sr.projection.forward(lon, lat)
            lon2, lat2 = sr.projection.inverse(x, y)
            assert float(lon2) == pytest.approx(lon, abs=1e-9)
            assert float(lat2) == pytest.approx(lat, abs=1e-9)

    def test_proj4_matches_registry(self):
        for proj4, epsg, lonlat in [
            (
                "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84",
                "EPSG:3413",
                (10.0, 80.0),
            ),
            (
                "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
                "+ellps=GRS80",
                "EPSG:5070",
                (-120.0, 40.0),
            ),
        ]:
            lon, lat = np.array([lonlat[0]]), np.array([lonlat[1]])
            x1, y1 = utils.transform_points(
                lon, lat, "EPSG:4326", utils.get_sr(proj4)
            )
            x2, y2 = utils.transform_points(lon, lat, "EPSG:4326", epsg)
            assert float(x1[0]) == pytest.approx(float(x2[0]), abs=1e-9)
            assert float(y1[0]) == pytest.approx(float(y2[0]), abs=1e-9)


class TestProjectionsTraceIntoXLA:
    """Every registry projection must produce identical results when traced
    under jit with xp=jax.numpy — the on-device warp contract."""

    POINTS = {
        "EPSG:3857": (5.0, 52.0),
        "EPSG:3395": (5.0, 52.0),
        "EPSG:28992": (5.0, 52.0),
        "EPSG:27700": (-2.0, 53.0),
        "EPSG:32631": (5.0, 52.0),
        "EPSG:2154": (2.35, 48.85),
        "EPSG:3035": (10.0, 52.0),
        "EPSG:5070": (-100.0, 40.0),
        "EPSG:3413": (10.0, 80.0),
        "EPSG:3031": (45.0, -75.0),
    }

    @pytest.mark.parametrize("epsg", sorted(POINTS))
    def test_traced_matches_numpy(self, epsg):
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_enable_x64", True)
        lon, lat = self.POINTS[epsg]

        @jax.jit
        def traced(x, y):
            return utils.transform_points(x, y, "EPSG:4326", epsg, xp=jnp)

        xj, yj = traced(jnp.array([lon]), jnp.array([lat]))
        xn, yn = utils.transform_points(
            np.array([lon]), np.array([lat]), "EPSG:4326", epsg
        )
        assert float(xj[0]) == pytest.approx(float(xn[0]), abs=1e-6)
        assert float(yj[0]) == pytest.approx(float(yn[0]), abs=1e-6)


class TestSnapStartStopEmptyWindow:
    def test_closed_interval_between_frames(self):
        """A closed window strictly between two frames selects nothing
        (used to return an inverted range with start > stop)."""
        from datetime import datetime, timedelta

        from dask_geomodeling_tpu.geo.timeutils import snap_start_stop

        result = snap_start_stop(
            datetime(2000, 1, 1, 0, 10),
            datetime(2000, 1, 1, 0, 50),
            datetime(2000, 1, 1),
            timedelta(hours=1),
            10,
        )
        assert result == (None, None, None, None)

    def test_anchored_legacy_offsets(self):
        from dask_geomodeling_tpu.geo.timeutils import normalize_offset

        assert normalize_offset("Q-DEC") == "QE-DEC"
        assert normalize_offset("A-JAN") == "YE-JAN"
        assert normalize_offset("M") == "ME"
