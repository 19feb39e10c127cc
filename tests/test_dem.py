"""SRTM .hgt and DTED elevation sources (native readers for formats the
reference opens via GDAL's SRTMHGT/DTED drivers,
reference raster/sources.py:66-71)."""
import struct
from datetime import datetime

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.dem import read_dted, read_hgt
from dask_geomodeling_tpu.raster import RasterFileSource


@pytest.fixture()
def root(tmp_path):
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path


def write_hgt(path, grid):
    np.asarray(grid, ">i2").tofile(str(path))


def build_dted(lon_field, lat_field, grid_sn, dlon_das=300, dlat_das=300,
               corrupt_sentinel=False, corrupt_checksum=False):
    """Assemble a DTED byte stream; ``grid_sn`` is (cols, south->north)."""
    grid_sn = np.asarray(grid_sn)
    n_cols, n_rows = grid_sn.shape
    uhl = bytearray(b" " * 80)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = lon_field.encode()
    uhl[12:20] = lat_field.encode()
    uhl[20:24] = b"%04d" % dlon_das
    uhl[24:28] = b"%04d" % dlat_das
    uhl[47:51] = b"%04d" % n_cols
    uhl[51:55] = b"%04d" % n_rows
    out = bytes(uhl) + b"D" * 648 + b"A" * 2700
    for col in range(n_cols):
        record = bytearray()
        record.append(0x41 if corrupt_sentinel and col == 1 else 0xAA)
        record += struct.pack(">I", col)[1:]  # 3-byte block count
        record += struct.pack(">HH", col, 0)
        for value in grid_sn[col]:
            value = int(value)
            mag = -value | 0x8000 if value < 0 else value
            record += struct.pack(">H", mag)
        checksum = sum(record)
        if corrupt_checksum and col == 0:
            checksum += 1
        record += struct.pack(">I", checksum)
        out += bytes(record)
    return out


class TestHgt:
    def test_read_grid_and_georeferencing(self, root):
        n = 5
        grid = np.arange(n * n, dtype=np.int16).reshape(n, n)
        path = root / "N34W119.hgt"
        write_hgt(path, grid)
        data = read_hgt(str(path))
        np.testing.assert_array_equal(data.array[0], grid)
        assert data.array.dtype == np.int16
        assert data.no_data_value == -32768.0
        res = 1.0 / (n - 1)
        np.testing.assert_allclose(
            data.geo_transform,
            (-119 - res / 2, res, 0.0, 35 + res / 2, 0.0, -res),
        )
        assert data.projection == "EPSG:4326"

    def test_southern_eastern_hemispheres_lowercase(self, root):
        path = root / "s02e045.hgt"
        write_hgt(path, np.zeros((3, 3), np.int16))
        data = read_hgt(str(path))
        assert data.geo_transform[0] == pytest.approx(45 - 0.25)
        assert data.geo_transform[3] == pytest.approx(-1 + 0.25)

    def test_bad_name_and_bad_size(self, root):
        path = root / "elevation.hgt"
        write_hgt(path, np.zeros((3, 3), np.int16))
        with pytest.raises(ValueError, match="SW corner"):
            read_hgt(str(path))
        path = root / "N00E000.hgt"
        np.zeros(7, ">i2").tofile(str(path))
        with pytest.raises(ValueError, match="square"):
            read_hgt(str(path))

    def test_raster_file_source(self, root):
        n = 5
        grid = (np.arange(n * n, dtype=np.int16) * 10).reshape(n, n)
        write_hgt(root / "N34W119.hgt", grid)
        source = RasterFileSource(
            "N34W119.hgt", time_first=datetime(2000, 1, 1)
        )
        assert source.projection == "EPSG:4326"
        assert source.dtype == np.int16
        res = 1.0 / (n - 1)
        result = source.get_data(
            mode="vals",
            bbox=(-119 - res / 2, 35 + res / 2 - 2 * res,
                  -119 - res / 2 + 3 * res, 35 + res / 2),
            projection="EPSG:4326", width=3, height=2,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(result["values"][0], grid[:2, :3])


class TestDted:
    def test_read_grid_and_georeferencing(self, root):
        # 4 columns x 3 rows over a cell at 34N 117W, 30" spacing
        rng = np.random.RandomState(0)
        grid_sn = rng.randint(-500, 4000, (4, 3)).astype(np.int16)
        raw = build_dted("1170000W", "0340000N", grid_sn)
        path = root / "n34.dt1"
        path.write_bytes(raw)
        data = read_dted(str(path), check_checksums=True)
        # north-up: row 0 is the northernmost latitude point
        np.testing.assert_array_equal(data.array[0], grid_sn.T[::-1])
        assert data.no_data_value == -32767.0
        step = 300 / 36000.0
        np.testing.assert_allclose(
            data.geo_transform,
            (-117 - step / 2, step, 0.0, 34 + 2 * step + step / 2, 0.0, -step),
        )

    def test_negative_sign_magnitude_and_void(self, root):
        grid_sn = np.array([[-12, -32767], [7, 0]], np.int32)
        raw = build_dted("0003000E", "0450000N", grid_sn)
        path = root / "d.dt0"
        path.write_bytes(raw)
        data = read_dted(str(path))
        np.testing.assert_array_equal(data.array[0], grid_sn.T[::-1])

    def test_sentinel_and_checksum_errors(self, root):
        grid_sn = np.zeros((3, 3), np.int16)
        path = root / "bad.dt1"
        path.write_bytes(
            build_dted("1170000W", "0340000N", grid_sn, corrupt_sentinel=True)
        )
        with pytest.raises(ValueError, match="sentinel"):
            read_dted(str(path))
        path.write_bytes(
            build_dted("1170000W", "0340000N", grid_sn, corrupt_checksum=True)
        )
        read_dted(str(path))  # checksums ignored by default
        with pytest.raises(ValueError, match="checksum"):
            read_dted(str(path), check_checksums=True)

    def test_truncated_and_not_dted(self, root):
        path = root / "trunc.dt2"
        raw = build_dted("1170000W", "0340000N", np.zeros((3, 3), np.int16))
        path.write_bytes(raw[:-10])
        with pytest.raises(ValueError, match="truncated"):
            read_dted(str(path))
        path.write_bytes(b"NOPE" + raw[4:])
        with pytest.raises(ValueError, match="UHL"):
            read_dted(str(path))

    def test_raster_file_source(self, root):
        grid_sn = (np.arange(12, dtype=np.int16) * 5).reshape(4, 3)
        (root / "n34.dt1").write_bytes(
            build_dted("1170000W", "0340000N", grid_sn)
        )
        source = RasterFileSource("n34.dt1", time_first=datetime(2000, 1, 1))
        assert source.projection == "EPSG:4326"
        step = 300 / 36000.0
        top = 34 + 2 * step + step / 2
        result = source.get_data(
            mode="vals",
            bbox=(-117 - step / 2, top - 3 * step,
                  -117 - step / 2 + 4 * step, top),
            projection="EPSG:4326", width=4, height=3,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(result["values"][0], grid_sn.T[::-1])
