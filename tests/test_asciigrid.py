"""Esri ASCII Grid and XYZ raster sources (native readers for formats
the reference opens via GDAL's AAIGrid/XYZ drivers,
reference raster/sources.py:66-71)."""
from datetime import datetime

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.asciigrid import read_ascii_grid, read_xyz
from dask_geomodeling_tpu.raster import RasterFileSource


@pytest.fixture()
def root(tmp_path):
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path


ASC = """ncols 4
nrows 3
xllcorner 1000.0
yllcorner 2000.0
cellsize 50.0
NODATA_value -9999
1 2 3 4
5 -9999 7 8
9 10 11 12
"""


class TestAsciiGrid:
    def test_read_int_grid(self, root):
        path = root / "grid.asc"
        path.write_text(ASC)
        data = read_ascii_grid(str(path))
        assert data.array.dtype == np.int32
        assert data.array.shape == (1, 3, 4)
        # first file row is the northernmost
        np.testing.assert_array_equal(data.array[0, 0], [1, 2, 3, 4])
        assert data.array[0, 1, 1] == -9999
        assert data.no_data_value == -9999
        # upper-left origin: yll + nrows * cellsize
        assert data.geo_transform == (1000.0, 50.0, 0.0, 2150.0, 0.0, -50.0)

    def test_read_float_and_center_origin(self, root):
        path = root / "grid.asc"
        path.write_text(
            "ncols 2\nnrows 2\nxllcenter 10.0\nyllcenter 20.0\n"
            "cellsize 2.0\n1.5 2.5\n3.5 4.5\n"
        )
        data = read_ascii_grid(str(path))
        assert data.array.dtype == np.float32
        # corner = center - cellsize/2
        assert data.geo_transform[0] == 9.0
        assert data.geo_transform[3] == 23.0

    def test_sidecar_prj(self, root):
        (root / "grid.asc").write_text(ASC)
        (root / "grid.prj").write_text("EPSG:28992")
        data = read_ascii_grid(str(root / "grid.asc"))
        assert data.projection == "EPSG:28992"

    def test_through_raster_file_source(self, root):
        (root / "grid.asc").write_text(ASC)
        source = RasterFileSource("grid.asc", time_first=datetime(2000, 1, 1))
        assert source.dtype == np.int32
        bbox = (1000.0, 2000.0, 1200.0, 2150.0)
        result = source.get_data(
            mode="vals", bbox=bbox, projection=source.projection,
            width=4, height=3, start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(
            result["values"][0],
            [[1, 2, 3, 4], [5, -9999, 7, 8], [9, 10, 11, 12]],
        )


class TestXYZ:
    def test_read_grid(self, root):
        lines = []
        for yi, y in enumerate([30.0, 10.0, 20.0]):  # any row order
            for xi, x in enumerate([100.0, 110.0, 120.0, 130.0]):
                lines.append("%s %s %s" % (x, y, (x + y)))
        (root / "pts.xyz").write_text("\n".join(lines) + "\n")
        data = read_xyz(str(root / "pts.xyz"))
        assert data.array.shape == (1, 3, 4)
        # north-up: first row is y=30
        np.testing.assert_array_equal(
            data.array[0, 0], [130, 140, 150, 160]
        )
        np.testing.assert_array_equal(
            data.array[0, 2], [110, 120, 130, 140]
        )
        # pixel centers at the sample points
        assert data.geo_transform == (95.0, 10.0, 0.0, 35.0, 0.0, -10.0)

    def test_missing_cells_become_nodata(self, root):
        (root / "pts.xyz").write_text("0 0 1\n1 0 2\n0 1 3\n")  # 1 of 4 missing
        data = read_xyz(str(root / "pts.xyz"))
        assert data.array.shape == (1, 2, 2)
        assert (data.array == data.no_data_value).sum() == 1

    def test_comma_separated(self, root):
        (root / "pts.xyz").write_text("0,0,1\n1,0,2\n0,1,3\n1,1,4\n")
        data = read_xyz(str(root / "pts.xyz"))
        np.testing.assert_array_equal(data.array[0], [[3, 4], [1, 2]])


class TestWrappedRows:
    def test_wrapped_data_lines(self, root):
        """Esri tooling wraps long rows: the format is token-oriented."""
        path = root / "wrapped.asc"
        path.write_text(
            "ncols 4\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\n"
            "1 2\n3 4\n5 6 7 8\n"
        )
        data = read_ascii_grid(str(path))
        np.testing.assert_array_equal(
            data.array[0], [[1, 2, 3, 4], [5, 6, 7, 8]]
        )
