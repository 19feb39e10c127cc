"""Round-5 EPSG methods: the last exotics (Laborde, Tunisia Mining Grid,
Guam, Hyperbolic Cassini-Soldner, Lambert Conic Near-Conformal,
Transverse Mercator Zoned / 3D).

The reference resolves every one through PROJ (reference
utils.py:396-473).  PROJ cannot express Near-Conformal, Tunisia Mining
Grid, or the Zoned grid system — those pin against EPSG Guidance Note
7-2 worked examples (the Krovak Modified precedent); the others pin
against cs2cs-derived constants captured at implementation time.
"""
import gzip
import json
import os

import numpy as np
import pytest

from dask_geomodeling_tpu.geo.crs import (
    _Ellipsoid,
    _LambertConicNearConformal,
    _TunisiaMiningGrid,
    get_sr,
    get_transform_func,
)

#: (code, lon, lat, expected easting/northing in the CRS's axis units,
#: tolerance) — expectations from cs2cs 9.1.1 (PROJ-supported methods)
PINNED = [
    # Laborde (Madagascar): Greenwich and Paris variants agree
    ("EPSG:8441", 47.5, -19.0, 511872.0397, 788747.4876, 0.01),
    ("EPSG:29701", 47.5, -19.0, 511872.0397, 788747.4876, 0.01),
    # Guam 1963 SPCS (simplified azimuthal equidistant)
    ("EPSG:3993", 144.75, 13.45, 49875.0397, 47355.7116, 0.001),
    # Vanua Levu hyperbolic Cassini-Soldner (axis unit: links)
    ("EPSG:3139", 179.4, -16.5, 1288660.3151, 1524660.7651, 0.01),
    # LUREF Luxembourg TM (3D) == the 2D TM; helmert borrowed from 4181
    # (cs2cs prints this CRS in authority N,E order; pinned here as E,N)
    ("EPSG:9895", 6.15, 49.6, 78689.9322, 73929.1258, 0.05),
]

ROUNDTRIP = [
    ("EPSG:8441", 47.5, -19.0),
    ("EPSG:29701", 44.5, -22.0),
    ("EPSG:3993", 144.75, 13.45),
    ("EPSG:3139", 179.4, -16.5),
    ("EPSG:22700", 38.0, 35.0),
    ("EPSG:22300", 9.0, 36.5),
    ("EPSG:32600", 4.4, 51.0),
    ("EPSG:32700", 18.5, -33.5),
    ("EPSG:9895", 6.15, 49.6),
]


@pytest.mark.parametrize("code,lon,lat,x,y,tol", PINNED)
def test_pinned_against_proj(code, lon, lat, x, y, tol):
    fwd = get_transform_func("EPSG:4326", code)
    gx, gy = fwd(np.array([lon]), np.array([lat]))
    np.testing.assert_allclose([gx[0], gy[0]], [x, y], atol=tol)


@pytest.mark.parametrize("code,lon,lat", ROUNDTRIP)
def test_roundtrip(code, lon, lat):
    fwd = get_transform_func("EPSG:4326", code)
    inv = get_transform_func(code, "EPSG:4326")
    x, y = fwd(np.array([lon]), np.array([lat]))
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose([lon2[0], lat2[0]], [lon, lat], atol=1e-6)


def test_near_conformal_gn7_worked_example():
    """EPSG GN7-2, Lambert Conic Near-Conformal (Deir ez Zor / Levant):
    37°31'17.625"N 34°08'11.291"E -> E 15707.96, N 623165.96."""
    ell = _Ellipsoid(6378249.2, 293.4660212936269)  # Clarke 1880 (IGN)
    proj = _LambertConicNearConformal(
        ell, 37.35, 34.65, 0.99962560, 300000.0, 300000.0
    )
    lat = 37 + 31 / 60 + 17.625 / 3600
    lon = 34 + 8 / 60 + 11.291 / 3600
    x, y = proj.forward(np.array([lon]), np.array([lat]))
    np.testing.assert_allclose([x[0], y[0]], [15707.96, 623165.96], atol=0.01)
    lon2, lat2 = proj.inverse(x, y)
    np.testing.assert_allclose([lon2[0], lat2[0]], [lon, lat], atol=1e-9)


def test_tunisia_mining_grid_gn7_worked_example():
    """EPSG GN7-2, Tunisia Mining Grid: the grads-affine grid with
    0.012185 / 0.010015 grads per kilometre about the false origin."""
    ell = _Ellipsoid(6378249.2, 293.4660212936269)
    proj = _TunisiaMiningGrid(
        ell, 7.83445 * 0.9, 36.5964 * 0.9, 270000.0, 360000.0
    )
    x, y = proj.forward(
        np.array([8.22437 * 0.9]), np.array([38.97997 * 0.9])
    )
    np.testing.assert_allclose([x[0], y[0]], [302000.0, 598000.0], atol=0.01)
    lon2, lat2 = proj.inverse(x, y)
    np.testing.assert_allclose(
        [lon2[0] / 0.9, lat2[0] / 0.9], [8.22437, 38.97997], atol=1e-12
    )


def test_zoned_grid_equals_utm_zones():
    """EPSG 9824: the zone number prefixes the easting in 10^6 m; each
    zone is exactly the corresponding UTM zone."""
    for zoned_code, utm_code, lon, lat in (
        ("EPSG:32600", "EPSG:32631", 4.4, 51.0),
        ("EPSG:32700", "EPSG:32734", 18.5, -33.5),
    ):
        zx, zy = get_transform_func("EPSG:4326", zoned_code)(
            np.array([lon]), np.array([lat])
        )
        ux, uy = get_transform_func("EPSG:4326", utm_code)(
            np.array([lon]), np.array([lat])
        )
        zone = int(zx[0] // 1e6)
        assert zone == int(utm_code[-2:])
        np.testing.assert_allclose(zx[0] % 1e6, ux[0], atol=1e-6)
        np.testing.assert_allclose(zy[0], uy[0], atol=1e-6)


def test_unsupported_method_list_is_empty():
    """Every EPSG projection method in proj.db now resolves: the
    registry's named-unsupported error path has no members left."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dask_geomodeling_tpu", "geo", "epsg.json.gz",
    )
    payload = json.loads(gzip.open(path).read())
    assert payload["unsupported"] == {}


def test_all_exotic_codes_resolve():
    for code, _, _ in ROUNDTRIP:
        sr = get_sr(code)
        assert sr.projection is not None
