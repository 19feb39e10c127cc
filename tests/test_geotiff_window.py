"""Block-level windowed GeoTIFF reads: only the strips/tiles a request
touches decode (the reference's GDAL warp reads through the dataset
block cache, reference raster/sources.py:133-144 — it never decodes a
whole large file)."""
from datetime import datetime

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.geotiff import (
    read_geotiff,
    read_geotiff_window,
    write_geotiff,
)
from dask_geomodeling_tpu.raster import RasterFileSource
from dask_geomodeling_tpu.runtime.pipeline import clear_read_cache


@pytest.fixture()
def root(tmp_path):
    clear_read_cache()
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path
    clear_read_cache()


GT = (5000.0, 10.0, 0.0, 8000.0, 0.0, -10.0)


def checkerfile(path, shape=(2, 97, 113), tiled=False, compress="deflate",
                tile_size=32):
    rng = np.random.RandomState(7)
    values = rng.randint(0, 1000, shape).astype(np.int32)
    write_geotiff(
        str(path), values, GT, "EPSG:28992", -99,
        compress=compress, tiled=tiled, tile_size=tile_size,
    )
    return values


class TestWindowReader:
    @pytest.mark.parametrize("tiled", [False, True])
    @pytest.mark.parametrize("compress", ["deflate", "none"])
    def test_window_equals_full_read_slice(self, tmp_path, tiled, compress):
        values = checkerfile(
            tmp_path / "a.tif", tiled=tiled, compress=compress
        )
        full = read_geotiff(str(tmp_path / "a.tif"))
        for row0, row1, col0, col1 in (
            (0, 97, 0, 113),       # everything
            (10, 50, 20, 60),      # interior
            (0, 1, 0, 1),          # corner pixel
            (90, 97, 100, 113),    # ragged bottom-right
            (31, 33, 31, 33),      # straddles a tile boundary
        ):
            win = read_geotiff_window(
                str(tmp_path / "a.tif"), row0, row1, col0, col1
            )
            np.testing.assert_array_equal(
                win.array, values[:, row0:row1, col0:col1]
            )
            np.testing.assert_array_equal(
                win.array, full.array[:, row0:row1, col0:col1]
            )
            assert win.no_data_value == full.no_data_value
            assert win.projection == full.projection

    def test_window_geotransform_shifts(self, tmp_path):
        checkerfile(tmp_path / "a.tif", tiled=True)
        win = read_geotiff_window(str(tmp_path / "a.tif"), 10, 50, 20, 60)
        assert win.geo_transform == (
            5000.0 + 20 * 10.0, 10.0, 0.0, 8000.0 - 10 * 10.0, 0.0, -10.0
        )

    def test_out_of_range_window_clamps(self, tmp_path):
        values = checkerfile(tmp_path / "a.tif")
        win = read_geotiff_window(str(tmp_path / "a.tif"), -5, 500, -5, 500)
        np.testing.assert_array_equal(win.array, values)

    def test_foreign_chunky_interleaved(self, tmp_path):
        """Multi-sample chunky (planar=1) files go through the samples
        axis of the strip path."""
        from tests.test_geotiff_foreign import write_minimal_tiff

        rng = np.random.RandomState(3)
        band = rng.randint(0, 255, (40, 30)).astype(np.uint8)
        write_minimal_tiff(
            str(tmp_path / "c.tif"), band, 1, lambda b: b, epsg=28992
        )
        win = read_geotiff_window(str(tmp_path / "c.tif"), 5, 20, 3, 27)
        np.testing.assert_array_equal(win.array[0], band[5:20, 3:27])


class TestOverviews:
    def test_write_read_overviews(self, tmp_path):
        rng = np.random.RandomState(9)
        values = rng.randint(0, 4000, (2, 120, 90)).astype(np.uint16)
        path = str(tmp_path / "pyr.tif")
        write_geotiff(
            path, values, GT, "EPSG:28992", None,
            tiled=True, tile_size=32, overviews=[2, 4],
        )
        from dask_geomodeling_tpu.io.geotiff import read_geotiff_overviews

        assert read_geotiff_overviews(path) == [(45, 60), (23, 30)]
        # the main image is untouched by the pyramid
        np.testing.assert_array_equal(read_geotiff(path).array, values)

    @pytest.mark.parametrize("tiled", [False, True])
    def test_level_reads(self, tmp_path, tiled):
        rng = np.random.RandomState(10)
        values = rng.randint(0, 255, (1, 100, 100)).astype(np.uint8)
        path = str(tmp_path / "pyr.tif")
        write_geotiff(
            path, values, GT, "EPSG:28992", -1.0,
            tiled=tiled, tile_size=32, overviews=[2, 4],
        )
        level1 = read_geotiff_window(path, 0, 50, 0, 50, level=1)
        np.testing.assert_array_equal(level1.array, values[:, ::2, ::2])
        # overview georeferencing: same origin, doubled pixel size,
        # nodata/projection inherited from the main IFD
        np.testing.assert_allclose(
            level1.geo_transform, (5000.0, 20.0, 0.0, 8000.0, 0.0, -20.0)
        )
        assert level1.no_data_value == -1.0
        assert level1.projection == "EPSG:28992"
        level2 = read_geotiff_window(path, 3, 17, 2, 21, level=2)
        np.testing.assert_array_equal(
            level2.array, values[:, ::4, ::4][:, 3:17, 2:21]
        )
        with pytest.raises(ValueError, match="overview level"):
            read_geotiff_window(path, 0, 5, 0, 5, level=3)

    def test_no_overviews_listed_for_plain_file(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import read_geotiff_overviews

        path = str(tmp_path / "plain.tif")
        write_geotiff(
            path, np.zeros((1, 5, 5), np.uint8), GT, "EPSG:28992", None
        )
        assert read_geotiff_overviews(path) == []

    def test_source_serves_coarse_requests_from_overview(self, root):
        rng = np.random.RandomState(12)
        values = rng.randint(0, 1000, (1, 128, 128)).astype(np.int32)
        write_geotiff(
            str(root / "pyr.tif"), values, GT, "EPSG:28992", -1,
            tiled=True, tile_size=32, overviews=[4],
        )
        source = RasterFileSource("pyr.tif", time_first=datetime(2000, 1, 1))
        # a request exactly on the overview grid: 4x coarser, full extent
        request = dict(
            mode="vals",
            bbox=(5000.0, 8000.0 - 128 * 10.0, 5000.0 + 128 * 10.0, 8000.0),
            projection="EPSG:28992", width=32, height=32,
            start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
        )
        with config.set({"geomodeling.use-overviews": True}):
            plan = source.get_sources_and_requests(**request)[0][0]
            result = source.get_data(**request)
        assert plan["raster_data"].array.shape == (1, 32, 32)
        np.testing.assert_array_equal(result["values"], values[:, ::4, ::4])
        # default-off keeps full-resolution reads (reference semantics)
        plan = source.get_sources_and_requests(**request)[0][0]
        assert plan["raster_data"].array.shape == (1, 128, 128)

    def test_fine_requests_ignore_overviews(self, root):
        values = np.arange(64 * 64, dtype=np.uint16).reshape(1, 64, 64)
        write_geotiff(
            str(root / "pyr.tif"), values, GT, "EPSG:28992", None,
            overviews=[2],
        )
        source = RasterFileSource("pyr.tif", time_first=datetime(2000, 1, 1))
        with config.set({"geomodeling.use-overviews": True}):
            result = source.get_data(
                mode="vals",
                bbox=(5000.0, 8000.0 - 640.0, 5640.0, 8000.0),
                projection="EPSG:28992", width=64, height=64,
                start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
            )
        np.testing.assert_array_equal(result["values"], values)

    def test_overview_plus_window(self, root):
        """Above the window limit the overview read is itself windowed."""
        rng = np.random.RandomState(13)
        values = rng.randint(0, 250, (1, 256, 256)).astype(np.uint8)
        write_geotiff(
            str(root / "pyr.tif"), values, GT, "EPSG:28992", 255,
            tiled=True, tile_size=32, overviews=[2],
        )
        source = RasterFileSource("pyr.tif", time_first=datetime(2000, 1, 1))
        # 2x-coarse request over the top-left quarter
        request = dict(
            mode="vals",
            bbox=(5000.0, 8000.0 - 128 * 10.0, 5000.0 + 128 * 10.0, 8000.0),
            projection="EPSG:28992", width=64, height=64,
            start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
        )
        with config.set(
            {
                "geomodeling.use-overviews": True,
                "geomodeling.windowed-read-limit": 1000,
            }
        ):
            plan = source.get_sources_and_requests(**request)[0][0]
            result = source.get_data(**request)
        # the decoded payload is a window of the overview, not 128^2
        assert plan["raster_data"].array.shape[1] <= 70
        np.testing.assert_array_equal(
            result["values"], values[:, ::2, ::2][:, :64, :64]
        )


class TestSourceWindowing:
    def test_same_result_windowed_vs_whole(self, root):
        values = checkerfile(root / "big.tif", tiled=True)
        source = RasterFileSource("big.tif", time_first=datetime(2000, 1, 1))
        request = dict(
            mode="vals", bbox=(5200.0, 7300.0, 5700.0, 7800.0),
            projection="EPSG:28992", width=50, height=50,
            start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
        )
        whole = source.get_data(**request)
        clear_read_cache()
        with config.set({"geomodeling.windowed-read-limit": 100}):
            windowed = source.get_data(**request)
            plan = source.get_sources_and_requests(**request)[0][0]
        np.testing.assert_array_equal(whole["values"], windowed["values"])
        # the plan really carried a window, not the whole raster
        assert plan["raster_data"].array.shape[1] < 97
        assert plan["raster_data"].array.shape[2] < 113

    def test_cross_crs_windowed(self, root):
        checkerfile(root / "big.tif", tiled=True)
        source = RasterFileSource("big.tif", time_first=datetime(2000, 1, 1))
        from dask_geomodeling_tpu.geo.crs import transform_extent

        bbox = transform_extent(
            (5200.0, 7300.0, 5700.0, 7800.0), "EPSG:28992", "EPSG:3857"
        )
        request = dict(
            mode="vals", bbox=bbox, projection="EPSG:3857",
            width=40, height=40,
            start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
        )
        whole = source.get_data(**request)
        clear_read_cache()
        with config.set({"geomodeling.windowed-read-limit": 100}):
            windowed = source.get_data(**request)
        np.testing.assert_array_equal(whole["values"], windowed["values"])

    def test_cross_crs_windowed_jax_twin_matches_host(self, root):
        """The device twin must gather with the WINDOW's geotransform:
        a warp grid built from the full-file transform reads pixels
        offset by the window origin (review finding)."""
        checkerfile(root / "big.tif", tiled=True)
        source = RasterFileSource("big.tif", time_first=datetime(2000, 1, 1))
        from dask_geomodeling_tpu.geo.crs import transform_extent

        bbox = transform_extent(
            (5200.0, 7300.0, 5700.0, 7800.0), "EPSG:28992", "EPSG:3857"
        )
        request = dict(
            mode="vals", bbox=bbox, projection="EPSG:3857",
            width=40, height=40,
            start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
        )
        with config.set({"geomodeling.executor": "jax"}):
            whole = source.get_data(**request)
            clear_read_cache()
            with config.set({"geomodeling.windowed-read-limit": 100}):
                windowed = source.get_data(**request)
        # bit-equal against the whole-file read on the SAME executor (the
        # host-vs-device comparison is owned by the warp equivalence
        # suite; the approximate transformer may flip boundary pixels)
        np.testing.assert_array_equal(whole["values"], windowed["values"])
        assert (whole["values"] != whole["no_data_value"]).any()

    def test_curved_preimage_window_covers_request(self, root):
        """A wide geographic request against a UTM source has a curved
        preimage that extends past the corner-only bbox; the densified
        window must still cover it (review finding)."""
        # UTM 32N source: 200 x 240 px at 3 km, spanning ~600x720 km
        rng = np.random.RandomState(11)
        values = rng.randint(0, 1000, (1, 200, 240)).astype(np.int32)
        gt = (100000.0, 3000.0, 0.0, 5900000.0, 0.0, -3000.0)
        write_geotiff(str(root / "utm.tif"), values, gt, "EPSG:32632", -1,
                      tiled=True, tile_size=32)
        source = RasterFileSource("utm.tif", time_first=datetime(2000, 1, 1))
        request = dict(
            mode="vals", bbox=(3.0, 48.0, 9.0, 52.0),
            projection="EPSG:4326", width=120, height=80,
            start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
        )
        whole = source.get_data(**request)
        clear_read_cache()
        with config.set({"geomodeling.windowed-read-limit": 100}):
            windowed = source.get_data(**request)
        np.testing.assert_array_equal(whole["values"], windowed["values"])

    def test_disjoint_bbox_is_all_fill(self, root):
        checkerfile(root / "big.tif")
        source = RasterFileSource("big.tif", time_first=datetime(2000, 1, 1))
        with config.set({"geomodeling.windowed-read-limit": 100}):
            result = source.get_data(
                mode="vals", bbox=(99000.0, 99000.0, 99500.0, 99500.0),
                projection="EPSG:28992", width=10, height=10,
                start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
            )
        assert (result["values"] == result["no_data_value"]).all()

    def test_point_request_windowed(self, root):
        values = checkerfile(root / "big.tif", tiled=True)
        source = RasterFileSource("big.tif", time_first=datetime(2000, 1, 1))
        # pixel (row 3, col 7) center
        x = 5000.0 + 7 * 10.0 + 5.0
        y = 8000.0 - 3 * 10.0 - 5.0
        with config.set({"geomodeling.windowed-read-limit": 100}):
            result = source.get_data(
                mode="vals", bbox=(x, y, x, y),
                projection="EPSG:28992", width=1, height=1,
                start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
            )
        np.testing.assert_array_equal(result["values"][:, 0, 0], values[:, 3, 7])

    def test_small_files_keep_whole_read(self, root):
        checkerfile(root / "small.tif")
        source = RasterFileSource("small.tif", time_first=datetime(2000, 1, 1))
        plan = source.get_sources_and_requests(
            mode="vals", bbox=(5200.0, 7300.0, 5700.0, 7800.0),
            projection="EPSG:28992", width=50, height=50,
            start=datetime(2000, 1, 1), stop=datetime(2001, 1, 1),
        )[0][0]
        assert plan["raster_data"].array.shape == (2, 97, 113)


class TestExternalOverviews:
    """gdaladdo -ro external .ovr pyramids."""

    def _base(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import (
            write_external_overviews,
            write_geotiff,
        )

        path = str(tmp_path / "base.tif")
        rng = np.random.RandomState(0)
        data = (rng.rand(1, 64, 64) * 200).astype(np.uint8)
        write_geotiff(path, data, (0, 1, 0, 64, 0, -1),
                      projection="EPSG:28992", no_data_value=255)
        write_external_overviews(path, [2, 4])
        return path, data

    def test_listed(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import read_geotiff_overviews

        path, _ = self._base(tmp_path)
        assert read_geotiff_overviews(path) == [(32, 32), (16, 16)]

    def test_levels_match_decimation(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import read_geotiff_window

        path, data = self._base(tmp_path)
        lvl1 = read_geotiff_window(path, 0, 32, 0, 32, level=1)
        np.testing.assert_array_equal(lvl1.array, data[:, ::2, ::2])
        assert lvl1.geo_transform[1] == 2.0
        assert lvl1.no_data_value == 255.0
        lvl2 = read_geotiff_window(path, 0, 16, 0, 16, level=2)
        np.testing.assert_array_equal(lvl2.array, data[:, ::4, ::4])

    def test_window_of_external_level(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import read_geotiff_window

        path, data = self._base(tmp_path)
        window = read_geotiff_window(path, 4, 12, 8, 24, level=1)
        np.testing.assert_array_equal(
            window.array, data[:, ::2, ::2][:, 4:12, 8:24]
        )

    def test_level_out_of_range(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import read_geotiff_window

        path, _ = self._base(tmp_path)
        with pytest.raises(ValueError):
            read_geotiff_window(path, 0, 8, 0, 8, level=3)

    def test_rasterfilesource_uses_external_pyramid(self, tmp_path):
        from dask_geomodeling_tpu import config
        from dask_geomodeling_tpu.raster import RasterFileSource

        path, data = self._base(tmp_path)
        source = RasterFileSource(path)
        request = dict(
            mode="vals", bbox=(0, 0, 64, 64), projection="EPSG:28992",
            width=16, height=16,
        )
        with config.set({
            "geomodeling.use-overviews": True,
            "geomodeling.windowed-read-limit": 1,
        }):
            plan = source._file_read_plan(request)
            assert plan is not None and plan[0] >= 1
            got = source.get_data(**request)
        assert got["values"].shape == (1, 16, 16)


class TestAverageOverviews:
    def test_average_block_mean(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import (
            read_geotiff_window,
            write_geotiff,
        )

        path = str(tmp_path / "avg.tif")
        data = np.arange(64, dtype=np.uint8).reshape(1, 8, 8)
        write_geotiff(path, data, (0, 1, 0, 8, 0, -1),
                      projection="EPSG:28992", no_data_value=None,
                      overviews=[2], overview_resampling="average")
        level = read_geotiff_window(path, 0, 4, 0, 4, level=1).array[0]
        expected = np.rint(
            data[0].astype(float).reshape(4, 2, 4, 2).mean(axis=(1, 3))
        ).astype(np.uint8)
        np.testing.assert_array_equal(level, expected)

    def test_average_skips_nodata(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import (
            read_geotiff_window,
            write_geotiff,
        )

        path = str(tmp_path / "avg_nd.tif")
        data = np.full((1, 4, 4), 10, np.uint8)
        data[0, :2, :2] = 255  # all-nodata block
        data[0, 2, 2] = 255  # partial nodata: mean of the 3 valid 10s
        write_geotiff(path, data, (0, 1, 0, 4, 0, -1),
                      projection="EPSG:28992", no_data_value=255,
                      overviews=[2], overview_resampling="average")
        level = read_geotiff_window(path, 0, 2, 0, 2, level=1).array[0]
        assert level[0, 0] == 255  # stays nodata
        assert level[1, 1] == 10  # nodata cell excluded from the mean
        assert level[0, 1] == 10 and level[1, 0] == 10

    def test_unknown_resampling_raises(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import write_geotiff

        with pytest.raises(ValueError):
            write_geotiff(
                str(tmp_path / "x.tif"), np.zeros((1, 4, 4), np.uint8),
                (0, 1, 0, 4, 0, -1), projection="EPSG:28992",
                no_data_value=None, overviews=[2],
                overview_resampling="cubic",
            )

    def test_external_average(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import (
            read_geotiff_window,
            write_external_overviews,
            write_geotiff,
        )

        path = str(tmp_path / "ext_avg.tif")
        data = np.arange(256, dtype=np.float32).reshape(1, 16, 16)
        write_geotiff(path, data, (0, 1, 0, 16, 0, -1),
                      projection="EPSG:28992", no_data_value=None)
        write_external_overviews(path, [2], resampling="average")
        level = read_geotiff_window(path, 0, 8, 0, 8, level=1).array[0]
        expected = data[0].reshape(8, 2, 8, 2).mean(axis=(1, 3))
        np.testing.assert_allclose(level, expected)
