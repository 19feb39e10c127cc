"""Cloud-optimized GeoTIFF output tests.

COG is a *layout contract* on an ordinary (Big)TIFF: tiled data, an
overview pyramid, all IFDs at the head of the file, and pixel data
ordered smallest-overview-first.  The reference delegates GTiff writing
to GDAL (reference raster/sinks.py:107-141); the COG layout is the
cloud-era counterpart its users produce with ``gdal_translate -of COG``.
"""
import os
import struct

import numpy as np
import pytest

from dask_geomodeling_tpu.io.geotiff import (
    read_geotiff,
    read_geotiff_overviews,
    read_geotiff_window,
    write_geotiff,
)

_TILE_OFFSETS = 324


def _ifd_layout(path):
    """[(ifd_file_offset, [tile_offsets...])] by walking the IFD chain."""
    from dask_geomodeling_tpu.io.geotiff import _read_ifd

    out = []
    with open(path, "rb") as f:
        header = f.read(4)
        byte_order = "<" if header[:2] == b"II" else ">"
        (magic,) = struct.unpack(byte_order + "H", header[2:4])
        if magic == 43:
            f.seek(8)
            (offset,) = struct.unpack(byte_order + "Q", f.read(8))
        else:
            (offset,) = struct.unpack(byte_order + "I", f.read(4))
        while offset:
            f.seek(offset)
            tags, next_offset = _read_ifd(f, byte_order, magic == 43)
            out.append((offset, list(tags.get(_TILE_OFFSETS, []))))
            offset = next_offset
    return out


@pytest.fixture
def checkers():
    y, x = np.mgrid[0:600, 0:700]
    return (((x // 25) + (y // 25)) % 7).astype(np.uint8)[np.newaxis] * 30


def _write_cog(tmp_path, array, **kwargs):
    path = os.path.join(str(tmp_path), "out.tif")
    write_geotiff(
        path, array,
        geo_transform=(0.0, 10.0, 0.0, 6000.0, 0.0, -10.0),
        projection="EPSG:28992", no_data_value=255.0, cog=True, **kwargs,
    )
    return path


def test_cog_roundtrip(tmp_path, checkers):
    path = _write_cog(tmp_path, checkers)
    data = read_geotiff(path)
    np.testing.assert_array_equal(data.array, checkers)
    assert data.projection == "EPSG:28992"
    assert data.no_data_value == 255.0
    np.testing.assert_allclose(
        data.geo_transform, (0.0, 10.0, 0.0, 6000.0, 0.0, -10.0)
    )


def test_cog_structure(tmp_path, checkers):
    """IFDs head the file; data runs smallest-overview -> full res."""
    path = _write_cog(tmp_path, checkers)
    layout = _ifd_layout(path)
    assert len(layout) >= 2  # main + auto pyramid
    for _, offsets in layout:
        assert offsets, "COG images must be tiled"
    last_ifd_end = max(pos for pos, _ in layout)
    first_data = min(min(offsets) for _, offsets in layout)
    assert first_data > last_ifd_end, "all IFDs must precede pixel data"
    # data region order: overviews smallest-first, full resolution last
    mins = [min(offsets) for _, offsets in layout]
    assert mins == sorted(mins, reverse=True)
    # within each image, tiles are written sequentially
    for _, offsets in layout:
        assert offsets == sorted(offsets)


def test_cog_auto_overviews(tmp_path, checkers):
    path = _write_cog(tmp_path, checkers)
    # 700x600 at 256 tiles: one factor-2 level (350x300), stop at <=256
    assert read_geotiff_overviews(path) == [(350, 300)]
    big = np.zeros((1, 1200, 1100), dtype=np.uint8)
    path2 = os.path.join(str(tmp_path), "big.tif")
    write_geotiff(path2, big, geo_transform=(0, 1, 0, 0, 0, -1),
                  projection="EPSG:28992", no_data_value=255.0, cog=True)
    assert read_geotiff_overviews(path2) == [(550, 600), (275, 300)]


def test_cog_explicit_overviews(tmp_path, checkers):
    path = _write_cog(tmp_path, checkers, overviews=[2, 4])
    assert read_geotiff_overviews(path) == [(350, 300), (175, 150)]
    data = read_geotiff_window(path, 0, 150, 0, 175, level=2)
    np.testing.assert_array_equal(data.array, checkers[:, ::4, ::4])


def test_cog_windowed_read(tmp_path, checkers):
    """Windowed reads decode only the touched tiles of the COG."""
    path = _write_cog(tmp_path, checkers)
    data = read_geotiff_window(path, 100, 400, 250, 650)
    np.testing.assert_array_equal(data.array, checkers[:, 100:400, 250:650])


def test_cog_bigtiff_and_big_endian(tmp_path, checkers):
    path = os.path.join(str(tmp_path), "out.tif")
    write_geotiff(path, checkers, geo_transform=(0, 10, 0, 6000, 0, -10),
                  projection="EPSG:28992", no_data_value=255.0, cog=True,
                  bigtiff=True, byte_order=">")
    data = read_geotiff(path)
    np.testing.assert_array_equal(data.array, checkers)
    layout = _ifd_layout(path)
    mins = [min(offsets) for _, offsets in layout]
    assert mins == sorted(mins, reverse=True)


def test_to_cog(tmp_path):
    """End-to-end export through the block API."""
    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import (
        MemorySource,
        RasterFileSource,
        to_cog,
    )

    data = (np.arange(900 * 800, dtype=np.float64) % 251).reshape(
        1, 900, 800
    )
    source = MemorySource(
        data=data, no_data_value=255.0, projection="EPSG:28992",
        pixel_size=0.5, pixel_origin=(155000, 463000),
    )
    with config.set({"geomodeling.root": str(tmp_path)}):
        to_cog(source + 1.0, "export.tif")
        out = RasterFileSource("export.tif")
        assert out.projection == "EPSG:28992"
        result = out.get_data(
            mode="vals",
            bbox=(155000, 463000 - 450, 155000 + 400, 463000),
            projection="EPSG:28992", width=800, height=900,
        )
    np.testing.assert_array_equal(result["values"], data + 1.0)
    path = os.path.join(str(tmp_path), "export.tif")
    assert read_geotiff_overviews(path) == [(400, 450)]
    layout = _ifd_layout(path)
    first_data = min(min(offsets) for _, offsets in layout)
    assert first_data > max(pos for pos, _ in layout)


def test_to_cog_no_data_raises(tmp_path):
    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import MemorySource, to_cog

    source = MemorySource(
        data=np.empty((0, 0, 0), dtype=np.uint8), no_data_value=255,
        projection="EPSG:28992", pixel_size=1.0, pixel_origin=(0, 4),
    )
    with config.set({"geomodeling.root": str(tmp_path)}):
        with pytest.raises(ValueError, match="no data"):
            to_cog(source, "x.tif", bbox=(0, 0, 4, 4), width=4, height=4)


def test_to_cog_average_resampling(tmp_path):
    from dask_geomodeling_tpu.io.geotiff import read_geotiff_window
    from dask_geomodeling_tpu.raster import MemorySource, to_cog

    data = (np.arange(64, dtype=np.float64) % 16).reshape(1, 8, 8)
    source = MemorySource(
        data=data, no_data_value=255.0, projection="EPSG:28992",
        pixel_size=1.0, pixel_origin=(155000, 463000),
    )
    path = str(tmp_path / "avg_cog.tif")
    to_cog(source, path, overviews=[2], overview_resampling="average")
    level = read_geotiff_window(path, 0, 4, 0, 4, level=1).array[0]
    expected = data[0].reshape(4, 2, 4, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(level, expected)
