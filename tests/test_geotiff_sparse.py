"""Sparse GeoTIFF reads (GDAL SPARSE_OK layout).

GDAL writes unallocated blocks with strip/tile offset AND bytecount 0;
readers must return nodata (or 0 without nodata) for those regions
instead of failing (GDAL frmts/gtiff block-cache semantics). Fixtures
are hand-built classic TIFFs so the sparse entries are spec-pinned.
"""
import struct

import numpy as np
import pytest

from dask_geomodeling_tpu.io.geotiff import read_geotiff, read_geotiff_window

_SHORT, _LONG, _ASCII = 3, 4, 2


def _entry(tag, kind, count, value):
    head = struct.pack("<HHI", tag, kind, count)
    if kind == _SHORT:
        return head + struct.pack("<HH", value, 0)
    if kind == _LONG:
        return head + struct.pack("<I", value)
    if kind == _ASCII:
        return head + value.ljust(4, b"\x00")
    raise AssertionError(kind)


def _build(path, entries, extra, data):
    """Classic little-endian TIFF: header, IFD at 8, extra arrays, data."""
    ifd = struct.pack("<H", len(entries)) + b"".join(entries)
    ifd += struct.pack("<I", 0)  # no next IFD
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8))
        f.write(ifd)
        f.write(extra)
        f.write(data)


def _sparse_strip_tiff(path, nodata=True):
    """4x6 uint8, RowsPerStrip=2 -> 3 strips; the middle strip is sparse."""
    n_entries = 11 if nodata else 10
    extra_at = 8 + 2 + n_entries * 12 + 4
    offsets_at, counts_at = extra_at, extra_at + 12
    data_at = extra_at + 24
    strip0 = bytes(range(8))
    strip2 = bytes(range(16, 24))
    entries = [
        _entry(256, _SHORT, 1, 4),  # ImageWidth
        _entry(257, _SHORT, 1, 6),  # ImageLength
        _entry(258, _SHORT, 1, 8),  # BitsPerSample
        _entry(259, _SHORT, 1, 1),  # Compression: none
        _entry(262, _SHORT, 1, 1),  # Photometric
        _entry(273, _LONG, 3, offsets_at),
        _entry(277, _SHORT, 1, 1),  # SamplesPerPixel
        _entry(278, _SHORT, 1, 2),  # RowsPerStrip
        _entry(279, _LONG, 3, counts_at),
        _entry(339, _SHORT, 1, 1),  # SampleFormat: unsigned
    ]
    if nodata:
        entries.append(_entry(42113, _ASCII, 2, b"7"))  # GDAL_NODATA
    extra = struct.pack("<3I", data_at, 0, data_at + 8)
    extra += struct.pack("<3I", 8, 0, 8)
    _build(path, entries, extra, strip0 + strip2)


def _sparse_tile_tiff(path, epsg=None):
    """32x32 uint8 in 16x16 tiles; tile (row 0, col 1) is sparse."""
    n_entries = 13 if epsg else 12
    extra_at = 8 + 2 + n_entries * 12 + 4
    offsets_at, counts_at = extra_at, extra_at + 16
    geokeys_at = extra_at + 32
    data_at = geokeys_at + (24 if epsg else 0)
    tiles = [
        np.full((16, 16), 10 * i, np.uint8).tobytes() for i in (1, 2, 3)
    ]
    entries = [
        _entry(256, _SHORT, 1, 32),
        _entry(257, _SHORT, 1, 32),
        _entry(258, _SHORT, 1, 8),
        _entry(259, _SHORT, 1, 1),
        _entry(262, _SHORT, 1, 1),
        _entry(277, _SHORT, 1, 1),
        _entry(322, _SHORT, 1, 16),  # TileWidth
        _entry(323, _SHORT, 1, 16),  # TileLength
        _entry(324, _LONG, 4, offsets_at),  # TileOffsets
        _entry(325, _LONG, 4, counts_at),  # TileByteCounts
        _entry(339, _SHORT, 1, 1),
    ]
    if epsg:
        entries.append(
            struct.pack("<HHI", 34735, _SHORT, 12)  # GeoKeyDirectory
            + struct.pack("<I", geokeys_at)
        )
    entries.append(_entry(42113, _ASCII, 2, b"7"))
    extra = struct.pack(
        "<4I", data_at, 0, data_at + 256, data_at + 512
    )
    extra += struct.pack("<4I", 256, 0, 256, 256)
    if epsg:
        extra += struct.pack(
            "<12H", 1, 1, 0, 2, 1024, 0, 1, 2, 2048, 0, 1, epsg
        )
    _build(path, entries, extra, b"".join(tiles))


def test_sparse_strip_reads_nodata(tmp_path):
    path = str(tmp_path / "sparse.tif")
    _sparse_strip_tiff(path)
    result = read_geotiff(path)
    assert result.no_data_value == 7.0
    values = result.array[0]
    np.testing.assert_array_equal(
        values[:2], np.arange(8, dtype=np.uint8).reshape(2, 4)
    )
    np.testing.assert_array_equal(values[2:4], np.full((2, 4), 7, np.uint8))
    np.testing.assert_array_equal(
        values[4:], np.arange(16, 24, dtype=np.uint8).reshape(2, 4)
    )


def test_sparse_strip_without_nodata_reads_zero(tmp_path):
    path = str(tmp_path / "sparse0.tif")
    _sparse_strip_tiff(path, nodata=False)
    values = read_geotiff(path).array[0]
    np.testing.assert_array_equal(values[2:4], np.zeros((2, 4), np.uint8))
    assert values[0, 1] == 1


def test_sparse_strip_window(tmp_path):
    path = str(tmp_path / "sparse.tif")
    _sparse_strip_tiff(path)
    # window covering only the sparse strip
    hole = read_geotiff_window(path, 2, 4, 0, 4)
    np.testing.assert_array_equal(
        hole.array[0], np.full((2, 4), 7, np.uint8)
    )
    # window straddling allocated + sparse rows
    mixed = read_geotiff_window(path, 1, 3, 0, 4)
    np.testing.assert_array_equal(
        mixed.array[0],
        np.vstack(
            [np.arange(4, 8, dtype=np.uint8), np.full(4, 7, np.uint8)]
        ),
    )


def test_sparse_tiles(tmp_path):
    path = str(tmp_path / "sparse_tiled.tif")
    _sparse_tile_tiff(path)
    values = read_geotiff(path).array[0]
    assert values.shape == (32, 32)
    np.testing.assert_array_equal(values[:16, :16], 10)
    np.testing.assert_array_equal(values[:16, 16:], 7)  # the sparse tile
    np.testing.assert_array_equal(values[16:, :16], 20)
    np.testing.assert_array_equal(values[16:, 16:], 30)
    window = read_geotiff_window(path, 12, 20, 12, 20)
    expected = np.zeros((8, 8), np.uint8)
    expected[:4, :4] = 10
    expected[:4, 4:] = 7
    expected[4:, :4] = 20
    expected[4:, 4:] = 30
    np.testing.assert_array_equal(window.array[0], expected)


def test_unrepresentable_nodata_fill_falls_back_to_zero(tmp_path):
    # uint8 data with an out-of-range nodata: sparse regions fill with 0
    path = str(tmp_path / "sparse_oor.tif")
    n_entries = 11
    extra_at = 8 + 2 + n_entries * 12 + 4
    offsets_at, counts_at = extra_at, extra_at + 12
    nodata_at = extra_at + 24
    data_at = nodata_at + 8
    entries = [
        _entry(256, _SHORT, 1, 4),
        _entry(257, _SHORT, 1, 6),
        _entry(258, _SHORT, 1, 8),
        _entry(259, _SHORT, 1, 1),
        _entry(262, _SHORT, 1, 1),
        _entry(273, _LONG, 3, offsets_at),
        _entry(277, _SHORT, 1, 1),
        _entry(278, _SHORT, 1, 2),
        _entry(279, _LONG, 3, counts_at),
        _entry(339, _SHORT, 1, 1),
        struct.pack("<HHI", 42113, _ASCII, 7) + struct.pack("<I", nodata_at),
    ]
    extra = struct.pack("<3I", data_at, 0, data_at + 8)
    extra += struct.pack("<3I", 8, 0, 8)
    extra += b"-99999\x00\x00"
    _build(path, entries, extra, bytes(range(8)) + bytes(range(16, 24)))
    values = read_geotiff(path).array[0]
    np.testing.assert_array_equal(values[2:4], np.zeros((2, 4), np.uint8))


@pytest.mark.parametrize("fixture", ["strip", "tile"])
def test_sparse_windowed_equals_whole(tmp_path, fixture):
    path = str(tmp_path / "sparse_eq.tif")
    if fixture == "strip":
        _sparse_strip_tiff(path)
        shape = (6, 4)
    else:
        _sparse_tile_tiff(path)
        shape = (32, 32)
    whole = read_geotiff(path).array
    h, w = shape
    window = read_geotiff_window(path, 0, h, 0, w).array
    np.testing.assert_array_equal(whole, window)


def test_sparse_with_geokeys_via_rasterfilesource(tmp_path):
    from dask_geomodeling_tpu.raster import RasterFileSource

    path = str(tmp_path / "sparse_geo.tif")
    _sparse_tile_tiff(path, epsg=4326)
    source = RasterFileSource(path)
    assert source.projection == "EPSG:4326"
    data = source.get_data(
        mode="vals", bbox=(0, 0, 32, 32), projection="EPSG:4326",
        width=32, height=32,
    )
    np.testing.assert_array_equal(data["values"][0, :16, 16:], 7)
