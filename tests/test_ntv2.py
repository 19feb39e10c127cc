"""NTv2 grid-shift datum transformations (geo/ntv2.py).

The reference gets grid-based datum shifts through PROJ when grid files
are installed (reference utils.py:396-473); here a synthetic .gsb file
exercises the native parser, the bilinear interpolation, the inverse
iteration, and the transform_points wiring.
"""
import struct

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.geo.crs import transform_points
from dask_geomodeling_tpu.geo.ntv2 import grid_for_datum, read_ntv2


def _record(name, payload):
    return name.ljust(8).encode("ascii") + payload


def _int_rec(name, value):
    return _record(name, struct.pack("<i", value) + b"\x00" * 4)


def _float_rec(name, value):
    return _record(name, struct.pack("<d", value))


def _text_rec(name, text):
    return _record(name, text.ljust(8).encode("ascii")[:8])


def make_gsb(path, s_lat, n_lat, e_long, w_long, inc, shift_fn):
    """A little-endian single-sub-grid NTv2 file; shift_fn(lon_deg,
    lat_deg) -> (lat_shift_sec, lon_west_shift_sec)."""
    n_rows = int(round((n_lat - s_lat) / inc)) + 1
    n_cols = int(round((w_long - e_long) / inc)) + 1
    header = b"".join(
        [
            _int_rec("NUM_OREC", 11),
            _int_rec("NUM_SREC", 11),
            _int_rec("NUM_FILE", 1),
            _text_rec("GS_TYPE", "SECONDS"),
            _text_rec("VERSION", "NTv2.0"),
            _text_rec("SYSTEM_F", "TESTSRC"),
            _text_rec("SYSTEM_T", "WGS84"),
            _float_rec("MAJOR_F", 6378388.0),
            _float_rec("MINOR_F", 6356911.9),
            _float_rec("MAJOR_T", 6378137.0),
            _float_rec("MINOR_T", 6356752.3),
            _text_rec("SUB_NAME", "TEST"),
            _text_rec("PARENT", "NONE"),
            _text_rec("CREATED", "now"),
            _text_rec("UPDATED", "now"),
            _float_rec("S_LAT", s_lat),
            _float_rec("N_LAT", n_lat),
            _float_rec("E_LONG", e_long),
            _float_rec("W_LONG", w_long),
            _float_rec("LAT_INC", inc),
            _float_rec("LONG_INC", inc),
            _int_rec("GS_COUNT", n_rows * n_cols),
        ]
    )
    nodes = []
    for row in range(n_rows):  # south to north
        lat_sec = s_lat + row * inc
        for col in range(n_cols):  # east to west (positive west)
            lon_west_sec = e_long + col * inc
            dlat, dlon = shift_fn(-lon_west_sec / 3600.0, lat_sec / 3600.0)
            nodes.append(struct.pack("<4f", dlat, dlon, 0.1, 0.1))
    open(path, "wb").write(header + b"".join(nodes))


@pytest.fixture()
def constant_grid(tmp_path):
    # +2" lat, +1" west everywhere, covering lon [-8..-2]E?? no:
    # positive-west 7200..28800 sec = lon -2..-8?? use lon 2..8 E:
    # positive west of -8..-2 deg -> east longitudes 2..8 need west
    # values -28800..-7200
    path = str(tmp_path / "const.gsb")
    make_gsb(
        path,
        s_lat=180000.0,  # 50 deg
        n_lat=198000.0,  # 55 deg
        e_long=-28800.0,  # 8 deg E
        w_long=-7200.0,  # 2 deg E
        inc=3600.0,
        shift_fn=lambda lon, lat: (2.0, 1.0),
    )
    return path


class TestParser:
    def test_constant_shift(self, constant_grid):
        grid = read_ntv2(constant_grid)
        assert grid.from_name == "TESTSRC"
        lon, lat = grid.forward(np.array([5.0]), np.array([52.0]))
        # +2" lat; +1" WEST = -1/3600 deg in east-positive lon
        assert abs(lat[0] - (52.0 + 2.0 / 3600)) < 1e-9
        assert abs(lon[0] - (5.0 - 1.0 / 3600)) < 1e-9

    def test_inverse_roundtrip(self, constant_grid):
        grid = read_ntv2(constant_grid)
        lon0 = np.array([3.3, 5.0, 7.7])
        lat0 = np.array([50.4, 52.0, 54.6])
        lon1, lat1 = grid.forward(lon0, lat0)
        lon2, lat2 = grid.inverse(lon1, lat1)
        np.testing.assert_allclose(lon2, lon0, atol=1e-10)
        np.testing.assert_allclose(lat2, lat0, atol=1e-10)

    def test_varying_field_bilinear(self, tmp_path):
        # shift grows linearly with lat: interpolation must be exact for
        # a linear field
        path = str(tmp_path / "lin.gsb")
        make_gsb(
            path, 180000.0, 198000.0, -28800.0, -7200.0, 3600.0,
            shift_fn=lambda lon, lat: ((lat - 50.0) * 1.0, 0.0),
        )
        grid = read_ntv2(path)
        lon, lat = grid.forward(np.array([5.0]), np.array([52.5]))
        assert abs(lat[0] - (52.5 + 2.5 / 3600)) < 1e-9

    def test_rejects_non_ntv2(self, tmp_path):
        path = tmp_path / "junk.gsb"
        path.write_bytes(b"definitely not a grid file")
        with pytest.raises(IOError):
            read_ntv2(str(path))


class TestTransformWiring:
    def test_grid_beats_helmert(self, constant_grid):
        # NZGD49 has a Helmert; registering a grid for it must change
        # the result by the grid-vs-Helmert difference
        src = "+proj=longlat +ellps=intl +towgs84=59.47,-5.04,187.44"
        lon_helmert, lat_helmert = transform_points(
            np.array([5.0]), np.array([52.0]), src, "EPSG:4326"
        )
        from dask_geomodeling_tpu.geo.crs import get_sr

        datum = get_sr(src).datum
        with config.set({"geomodeling.ntv2-grids": {datum: constant_grid}}):
            assert grid_for_datum(datum) is not None
            lon_grid, lat_grid = transform_points(
                np.array([5.0]), np.array([52.0]), src, "EPSG:4326"
            )
        # the grid says exactly +2" lat / -1" lon
        assert abs(lat_grid[0] - (52.0 + 2.0 / 3600)) < 1e-9
        assert abs(lon_grid[0] - (5.0 - 1.0 / 3600)) < 1e-9
        assert abs(lat_grid[0] - lat_helmert[0]) > 1e-7  # differs

    def test_roundtrip_through_projected(self, constant_grid):
        src = "+proj=longlat +ellps=intl +towgs84=59.47,-5.04,187.44"
        from dask_geomodeling_tpu.geo.crs import get_sr

        datum = get_sr(src).datum
        with config.set({"geomodeling.ntv2-grids": {datum: constant_grid}}):
            x, y = transform_points(
                np.array([5.0]), np.array([52.0]), src, "EPSG:3857"
            )
            lon, lat = transform_points(x, y, "EPSG:3857", src)
        assert abs(lon[0] - 5.0) < 1e-8
        assert abs(lat[0] - 52.0) < 1e-8

    def test_out_of_coverage_falls_back_to_helmert(self, constant_grid):
        """Points outside the grid take the Helmert leg, not extrapolated
        edge shifts (review finding)."""
        src = "+proj=longlat +ellps=intl +towgs84=59.47,-5.04,187.44"
        from dask_geomodeling_tpu.geo.crs import get_sr

        datum = get_sr(src).datum
        inside = (np.array([5.0]), np.array([52.0]))
        outside = (np.array([100.0]), np.array([-30.0]))  # far away
        helmert_out = transform_points(*outside, src, "EPSG:4326")
        with config.set({"geomodeling.ntv2-grids": {datum: constant_grid}}):
            grid_in = transform_points(*inside, src, "EPSG:4326")
            grid_out = transform_points(*outside, src, "EPSG:4326")
        # inside: the grid's exact +2"/-1" shift
        assert abs(grid_in[1][0] - (52.0 + 2.0 / 3600)) < 1e-9
        # outside: bitwise the Helmert result, no edge extrapolation
        np.testing.assert_array_equal(grid_out[0], helmert_out[0])
        np.testing.assert_array_equal(grid_out[1], helmert_out[1])

    def test_traced_matches_numpy(self, constant_grid):
        import jax
        import jax.numpy as jnp

        from dask_geomodeling_tpu.runtime.executor import _ensure_x64

        _ensure_x64()
        src = "+proj=longlat +ellps=intl +towgs84=59.47,-5.04,187.44"
        from dask_geomodeling_tpu.geo.crs import get_sr

        datum = get_sr(src).datum
        with config.set({"geomodeling.ntv2-grids": {datum: constant_grid}}):
            expected = transform_points(
                np.array([5.0, 6.0]), np.array([52.0, 53.0]), src,
                "EPSG:3857",
            )

            def traced(x, y):
                return transform_points(x, y, src, "EPSG:3857", xp=jnp)

            got = jax.jit(traced)(
                jnp.array([5.0, 6.0]), jnp.array([52.0, 53.0])
            )
        np.testing.assert_allclose(np.asarray(got[0]), expected[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(got[1]), expected[1], atol=1e-6)
