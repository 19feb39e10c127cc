"""Surfer/SAGA/Idrisi grid format tests (GDAL GSAG/GSBG/GS7BG, SAGA and
RST driver roles — reference raster/sources.py:66-71).  Read fixtures
are hand-built from the published layouts, independent of the writers.
"""
import os
import struct

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.simplegrids import (
    read_idrisi,
    read_saga,
    read_surfer,
    write_saga,
    write_surfer,
)

GRID = np.array(
    [[10.0, 11.0, 12.0], [20.0, 21.0, 22.0], [30.0, 31.0, 32.0],
     [40.0, 41.0, 42.0]]
)  # (ny=4, nx=3), row 0 = northernmost
# node-registered extents: xlo..xhi at 0.5 spacing, ylo..yhi at 1 spacing
XLO, XHI, YLO, YHI = 100.0, 101.0, 50.0, 53.0
EXPECT_GT = (100.0 - 0.25, 0.5, 0.0, 53.0 + 0.5, 0.0, -1.0)


class TestSurfer:
    def test_ascii(self, tmp_path):
        lines = ["DSAA", "3 4", "100 101", "50 53", "10 42"]
        for row in GRID[::-1]:  # file rows run south -> north
            lines.append(" ".join("%g" % v for v in row))
        path = str(tmp_path / "g.grd")
        open(path, "w").write("\n".join(lines) + "\n")
        data = read_surfer(path)
        np.testing.assert_array_equal(data.array[0], GRID)
        np.testing.assert_allclose(data.geo_transform, EXPECT_GT)

    def test_binary6_with_blanks(self, tmp_path):
        grid = GRID.copy()
        grid[1, 2] = 1.70141e38  # a blank node
        raw = (
            b"DSBB" + struct.pack("<hh", 3, 4)
            + struct.pack("<6d", XLO, XHI, YLO, YHI, 10, 42)
            + grid[::-1].astype("<f4").tobytes()
        )
        path = str(tmp_path / "g6.grd")
        open(path, "wb").write(raw)
        data = read_surfer(path)
        np.testing.assert_allclose(data.geo_transform, EXPECT_GT)
        assert data.array[0, 1, 2] == data.no_data_value
        mask = np.ones_like(GRID, dtype=bool)
        mask[1, 2] = False
        np.testing.assert_array_equal(data.array[0][mask], GRID[mask])

    def test_binary7(self, tmp_path):
        grid_header = struct.pack(
            "<II8d", 4, 3, XLO, YLO, 0.5, 1.0, 10.0, 42.0, 0.0, 1.70141e38
        )
        body = GRID[::-1].astype("<f8").tobytes()
        raw = (
            struct.pack("<III", 0x42525344, 4, 1)  # header section
            + struct.pack("<II", 0x44495247, len(grid_header)) + grid_header
            + struct.pack("<II", 0x41544144, len(body)) + body
        )
        path = str(tmp_path / "g7.grd")
        open(path, "wb").write(raw)
        data = read_surfer(path)
        np.testing.assert_array_equal(data.array[0], GRID)
        np.testing.assert_allclose(data.geo_transform, EXPECT_GT)

    @pytest.mark.parametrize("fmt", ["binary", "ascii"])
    def test_writer_roundtrip(self, tmp_path, fmt):
        path = str(tmp_path / "out.grd")
        grid = GRID.copy()
        grid[0, 0] = -9.0  # nodata cell
        write_surfer(path, grid[np.newaxis], EXPECT_GT,
                     no_data_value=-9.0, fmt=fmt)
        data = read_surfer(path)
        assert data.array[0, 0, 0] == data.no_data_value
        np.testing.assert_allclose(data.array[0, 1:], GRID[1:])
        np.testing.assert_allclose(data.geo_transform, EXPECT_GT)

    def test_not_surfer(self, tmp_path):
        path = str(tmp_path / "x.grd")
        open(path, "wb").write(b"NOPE" + bytes(64))
        with pytest.raises(IOError, match="Surfer"):
            read_surfer(path)


class TestSaga:
    def _write_pair(self, tmp_path, top_to_bottom=False, big=False):
        dtype = ">f4" if big else "<f4"
        grid = GRID if top_to_bottom else GRID[::-1]
        (tmp_path / "g.sdat").write_bytes(grid.astype(dtype).tobytes())
        (tmp_path / "g.sgrd").write_text(
            "NAME\t= g\nDATAFORMAT\t= FLOAT\nDATAFILE_OFFSET\t= 0\n"
            "BYTEORDER_BIG\t= %s\nPOSITION_XMIN\t= 100.0\n"
            "POSITION_YMIN\t= 50.0\nCELLCOUNT_X\t= 3\nCELLCOUNT_Y\t= 4\n"
            "CELLSIZE\t= 1.0\nNODATA_VALUE\t= -99999.0\n"
            "TOPTOBOTTOM\t= %s\n"
            % ("TRUE" if big else "FALSE",
               "TRUE" if top_to_bottom else "FALSE")
        )
        return str(tmp_path / "g.sgrd")

    @pytest.mark.parametrize("top_to_bottom", [False, True])
    @pytest.mark.parametrize("big", [False, True])
    def test_read(self, tmp_path, top_to_bottom, big):
        path = self._write_pair(tmp_path, top_to_bottom, big)
        data = read_saga(path)
        np.testing.assert_array_equal(data.array[0], GRID)
        # square 1.0 cells, centre (100,50) at the SW corner
        np.testing.assert_allclose(
            data.geo_transform, (99.5, 1.0, 0.0, 53.5, 0.0, -1.0)
        )
        assert data.no_data_value == -99999.0

    def test_read_via_sdat_path(self, tmp_path):
        self._write_pair(tmp_path)
        data = read_saga(str(tmp_path / "g.sdat"))
        np.testing.assert_array_equal(data.array[0], GRID)

    def test_writer_roundtrip(self, tmp_path):
        path = str(tmp_path / "out.sgrd")
        write_saga(path, GRID.astype("f4")[np.newaxis],
                   (99.5, 1.0, 0.0, 53.5, 0.0, -1.0))
        data = read_saga(path)
        np.testing.assert_array_equal(data.array[0], GRID)
        np.testing.assert_allclose(
            data.geo_transform, (99.5, 1.0, 0.0, 53.5, 0.0, -1.0)
        )


class TestIdrisi:
    def _write_pair(self, tmp_path, dtype="real", ref="utm-31n",
                    flag="-9999"):
        np_dtype = {"byte": "u1", "integer": "<i2", "real": "<f4"}[dtype]
        (tmp_path / "g.rst").write_bytes(GRID.astype(np_dtype).tobytes())
        (tmp_path / "g.rdc").write_text(
            "file format : IDRISI Raster A.1\nfile title  : test\n"
            "data type   : %s\nfile type   : binary\n"
            "columns     : 3\nrows        : 4\n"
            "ref. system : %s\nref. units  : m\nunit dist.  : 1.0\n"
            "min. X      : 100.0\nmax. X      : 103.0\n"
            "min. Y      : 50.0\nmax. Y      : 54.0\n"
            "pos'n error : unknown\nresolution  : 1.0\n"
            "min. value  : 10\nmax. value  : 42\ndisplay min : 10\n"
            "display max : 42\nvalue units : m\nvalue error : unknown\n"
            "flag value  : %s\nflag def'n  : missing data\n"
            % (dtype, ref, flag)
        )
        return str(tmp_path / "g.rst")

    @pytest.mark.parametrize("dtype", ["byte", "integer", "real"])
    def test_read_types(self, tmp_path, dtype):
        data = read_idrisi(self._write_pair(tmp_path, dtype=dtype))
        np.testing.assert_array_equal(data.array[0], GRID)
        # edge-registered: (100..103) x (50..54) over 3x4 cells
        np.testing.assert_allclose(
            data.geo_transform, (100.0, 1.0, 0.0, 54.0, 0.0, -1.0)
        )
        assert data.no_data_value == -9999.0
        assert data.projection == "EPSG:32631"

    def test_latlong_and_no_flag(self, tmp_path):
        data = read_idrisi(
            self._write_pair(tmp_path, ref="latlong", flag="none")
        )
        assert data.projection == "EPSG:4326"
        assert data.no_data_value == float(np.finfo("f4").max)


def test_raster_file_source_integration(tmp_path):
    from dask_geomodeling_tpu.raster import RasterFileSource

    path = str(tmp_path / "grid.grd")
    write_surfer(path, GRID[np.newaxis], EXPECT_GT, no_data_value=None)
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = RasterFileSource("grid.grd")
        assert len(source) == 1
        out = source.get_data(
            mode="vals", bbox=(99.75, 49.5, 101.25, 53.5),
            projection=source.projection or "EPSG:28992",
            width=3, height=4,
        )
    np.testing.assert_array_equal(out["values"][0], GRID)


def test_idrisi_uppercase_names(tmp_path):
    """Review regression: MAP.RST with MAP.RDC must read on a
    case-sensitive filesystem (the data path is the path given)."""
    (tmp_path / "MAP.RST").write_bytes(GRID.astype("<f4").tobytes())
    (tmp_path / "MAP.RDC").write_text(
        "data type   : real\ncolumns     : 3\nrows        : 4\n"
        "ref. system : plane\nmin. X      : 100.0\nmax. X      : 103.0\n"
        "min. Y      : 50.0\nmax. Y      : 54.0\nflag value  : none\n"
    )
    data = read_idrisi(str(tmp_path / "MAP.RST"))
    np.testing.assert_array_equal(data.array[0], GRID)
