"""Universal CRS coverage: the long-tail projection families, ESRI
definitions, non-metre units, named proj4 datums, and the generic
Newton-inverted path.

The reference accepts *any* CRS through OSR/PROJ (reference
utils.py:396-473,508-533); these tests pin the native implementation's
round-trip fidelity over a broad spread of real-world definitions.
"""
import numpy as np
import pytest

from dask_geomodeling_tpu.geo.crs import (
    TransformException,
    get_sr,
    get_transform_func,
    transform_points,
)


def _wrap_err(a, b):
    d = np.abs(np.asarray(a) - np.asarray(b))
    return np.minimum(d, np.abs(d - 360.0))


# A broad sweep of distinct CRS definitions: (definition, lons, lats).
# Sample points stay in each system's realistic domain, as real requests
# would.
_WORLD_LONS = np.array([-150.0, -60.0, 0.0, 30.0, 95.0, 170.0])
_WORLD_LATS = np.array([-70.0, -33.0, 0.0, 18.0, 52.0, 78.0])

ROUNDTRIP_DEFS = [
    # registry EPSG codes over every projection family
    ("EPSG:3857", _WORLD_LONS, _WORLD_LATS),
    ("EPSG:3395", _WORLD_LONS, _WORLD_LATS),
    ("EPSG:32633", np.array([12.0, 15.0, 17.0]), np.array([-30.0, 0.0, 60.0])),
    ("EPSG:32733", np.array([12.0, 15.0, 17.0]), np.array([-60.0, -30.0, 5.0])),
    ("EPSG:25832", np.array([6.0, 9.0, 12.0]), np.array([40.0, 50.0, 60.0])),
    ("EPSG:26910", np.array([-126.0, -123.0, -120.5]), np.array([32.0, 42.0, 55.0])),
    ("EPSG:23031", np.array([0.0, 3.0, 5.5]), np.array([36.0, 44.0, 52.0])),
    ("EPSG:28355", np.array([144.0, 147.0, 149.5]), np.array([-44.0, -35.0, -20.0])),
    ("EPSG:27700", np.array([-6.0, -2.0, 1.5]), np.array([50.0, 54.0, 59.0])),
    ("EPSG:28992", np.array([3.5, 5.5, 7.0]), np.array([50.8, 52.2, 53.5])),
    ("EPSG:2154", np.array([-4.0, 3.0, 8.0]), np.array([42.0, 46.5, 51.0])),
    ("EPSG:3035", np.array([-10.0, 10.0, 30.0]), np.array([35.0, 52.0, 70.0])),
    ("EPSG:5070", np.array([-120.0, -96.0, -75.0]), np.array([25.0, 38.0, 49.0])),
    ("EPSG:3413", np.array([-120.0, -45.0, 40.0]), np.array([60.0, 75.0, 89.0])),
    ("EPSG:3031", np.array([-120.0, 0.0, 140.0]), np.array([-89.0, -75.0, -60.0])),
    ("EPSG:27200", np.array([167.0, 173.0, 178.0]), np.array([-46.5, -41.0, -34.5])),
    ("EPSG:2193", np.array([167.0, 173.0, 178.5]), np.array([-47.0, -41.0, -34.0])),
    ("EPSG:21781", np.array([6.0, 7.44, 10.4]), np.array([45.8, 46.95, 47.8])),
    ("EPSG:2056", np.array([6.0, 7.44, 10.4]), np.array([45.8, 46.95, 47.8])),
    ("EPSG:31370", np.array([2.5, 4.4, 6.4]), np.array([49.5, 50.8, 51.5])),
    ("EPSG:3112", np.array([115.0, 134.0, 153.0]), np.array([-43.0, -25.0, -10.0])),
    ("EPSG:3577", np.array([115.0, 132.0, 153.0]), np.array([-43.0, -25.0, -10.0])),
    ("EPSG:5514", np.array([12.1, 15.5, 18.8]), np.array([48.6, 49.8, 51.0])),
    ("EPSG:6933", _WORLD_LONS, np.clip(_WORLD_LATS, -80, 80)),
    ("EPSG:8857", _WORLD_LONS, _WORLD_LATS),
    ("EPSG:2163", np.array([-170.0, -100.0, -65.0]), np.array([18.0, 45.0, 71.0])),
    ("EPSG:32661", np.array([-120.0, 0.0, 100.0]), np.array([60.0, 75.0, 89.5])),
    ("EPSG:32761", np.array([-120.0, 0.0, 100.0]), np.array([-89.5, -75.0, -60.0])),
    ("EPSG:3067", np.array([21.0, 27.0, 31.0]), np.array([60.0, 64.5, 70.0])),
    ("EPSG:2180", np.array([14.5, 19.0, 24.0]), np.array([49.0, 52.0, 54.8])),
    ("EPSG:23700", np.array([16.2, 19.05, 22.8]), np.array([45.8, 47.15, 48.5])),
    ("EPSG:31467", np.array([7.6, 9.0, 10.4]), np.array([47.3, 50.0, 54.9])),
    # ESRI world series
    ("ESRI:54003", _WORLD_LONS, _WORLD_LATS),
    ("ESRI:54008", _WORLD_LONS, _WORLD_LATS),
    ("ESRI:54009", _WORLD_LONS, _WORLD_LATS),
    ("ESRI:54012", _WORLD_LONS, _WORLD_LATS),
    ("ESRI:54016", _WORLD_LONS, _WORLD_LATS),
    ("ESRI:54029", _WORLD_LONS, _WORLD_LATS),
    ("ESRI:54030", _WORLD_LONS, _WORLD_LATS),
    ("ESRI:54032", _WORLD_LONS, np.clip(_WORLD_LATS, -80, 80)),
    ("ESRI:53008", _WORLD_LONS, _WORLD_LATS),
    # parametric proj4 for the new families
    ("+proj=poly +ellps=clrk66 +lon_0=-96 +lat_0=30",
     np.array([-110.0, -96.0, -80.0]), np.array([20.0, 35.0, 50.0])),
    ("+proj=bonne +ellps=WGS84 +lat_1=45 +lon_0=10",
     np.array([-10.0, 10.0, 35.0]), np.array([30.0, 45.0, 60.0])),
    ("+proj=cea +ellps=WGS84 +lat_ts=30", _WORLD_LONS,
     np.clip(_WORLD_LATS, -80, 80)),
    ("+proj=eqearth +ellps=WGS84", _WORLD_LONS, _WORLD_LATS),
    ("+proj=aeqd +ellps=WGS84 +lat_0=40 +lon_0=-100",
     np.array([-130.0, -100.0, -70.0]), np.array([20.0, 40.0, 60.0])),
    ("+proj=aeqd +ellps=WGS84 +lat_0=90",
     np.array([-120.0, 0.0, 100.0]), np.array([55.0, 75.0, 89.0])),
    ("+proj=ortho +ellps=WGS84 +lat_0=40 +lon_0=10",
     np.array([-10.0, 10.0, 30.0]), np.array([20.0, 40.0, 60.0])),
    ("+proj=gnom +ellps=sphere +lat_0=40 +lon_0=10",
     np.array([-10.0, 10.0, 30.0]), np.array([20.0, 40.0, 60.0])),
    ("+proj=mill +ellps=WGS84", _WORLD_LONS, _WORLD_LATS),
    ("+proj=gall +ellps=WGS84", _WORLD_LONS, _WORLD_LATS),
    ("+proj=robin +ellps=WGS84", _WORLD_LONS, _WORLD_LATS),
    ("+proj=moll +ellps=WGS84", _WORLD_LONS, _WORLD_LATS),
    ("+proj=sinu +ellps=WGS84", _WORLD_LONS, _WORLD_LATS),
    ("+proj=vandg +ellps=WGS84", _WORLD_LONS, _WORLD_LATS),
    ("+proj=eck4 +ellps=WGS84", _WORLD_LONS, _WORLD_LATS),
    ("+proj=somerc +ellps=bessel +lat_0=46.9524055555556 "
     "+lon_0=7.43958333333333 +k_0=1 +x_0=600000 +y_0=200000",
     np.array([6.0, 7.44, 10.4]), np.array([45.8, 46.95, 47.8])),
]


class TestBroadRoundTrips:
    @pytest.mark.parametrize(
        "definition,lons,lats",
        ROUNDTRIP_DEFS,
        ids=[d[0][:42] for d in ROUNDTRIP_DEFS],
    )
    def test_projection_roundtrip(self, definition, lons, lats):
        sr = get_sr(definition)
        x, y = sr.projection.forward(lons, lats)
        assert np.isfinite(x).all() and np.isfinite(y).all(), definition
        lo, la = sr.projection.inverse(x, y)
        assert np.nanmax(_wrap_err(lo, lons)) < 1e-6
        assert np.nanmax(np.abs(la - lats)) < 1e-6

    @pytest.mark.parametrize(
        "definition,lons,lats",
        ROUNDTRIP_DEFS,
        ids=[d[0][:42] for d in ROUNDTRIP_DEFS],
    )
    def test_transform_func_roundtrip(self, definition, lons, lats):
        """VERDICT round-2 done criterion: distinct definitions round-trip
        through get_transform_func within tolerance."""
        fwd = get_transform_func("EPSG:4326", definition)
        inv = get_transform_func(definition, "EPSG:4326")
        x, y = fwd(lons, lats)
        lo, la = inv(x, y)
        # datum-shifted systems round trip through the same Helmert both
        # ways, so the tolerance stays tight
        assert np.nanmax(_wrap_err(lo, lons)) < 1e-6
        assert np.nanmax(np.abs(la - lats)) < 1e-6


class TestGroundTruth:
    def test_ease_grid_2_constant(self):
        # the published EASE-Grid 2.0 global x extent: +-17367530.45 m
        sr = get_sr("EPSG:6933")
        x, _ = sr.projection.forward(180.0, 0.0)
        # +-180 are the same meridian; the magnitude is the grid constant
        assert abs(abs(x) - 17367530.45) < 0.05

    def test_lv95_projection_centre(self):
        # the Bern projection centre maps exactly onto the false origin
        sr = get_sr("EPSG:2056")
        x, y = sr.projection.forward(7.439583333333333, 46.952405555555565)
        assert abs(x - 2600000.0) < 1e-3
        assert abs(y - 1200000.0) < 1e-3

    def test_nztm_true_origin(self):
        sr = get_sr("EPSG:2193")
        x, y = sr.projection.forward(173.0, 0.0)
        assert abs(x - 1600000.0) < 1e-6
        assert abs(y - 10000000.0) < 1e-6

    def test_krovak_east_north_epsg_example(self):
        # EPSG Guidance 7-2 §3.2.7 test point, East-North axis convention
        sr = get_sr("EPSG:5514")
        lon = 16 + 50 / 60 + 59.1790 / 3600
        lat = 50 + 12 / 60 + 32.4416 / 3600
        x, y = sr.projection.forward(lon, lat)
        assert abs(x - -568991.00) < 0.05
        assert abs(y - -1050538.63) < 0.05

    def test_aeqd_sphere_matches_haversine(self):
        # on a sphere, the aeqd radial distance IS the great-circle distance
        sr = get_sr("+proj=aeqd +ellps=sphere +lat_0=52 +lon_0=5")
        lon, lat = np.array([6.5]), np.array([53.2])
        x, y = sr.projection.forward(lon, lat)
        r = 6378137.0
        phi1, phi2 = np.radians(52.0), np.radians(lat)
        dphi = phi2 - phi1
        dlam = np.radians(lon - 5.0)
        h = (
            np.sin(dphi / 2) ** 2
            + np.cos(phi1) * np.cos(phi2) * np.sin(dlam / 2) ** 2
        )
        d = 2 * r * np.arcsin(np.sqrt(h))
        assert abs(np.hypot(x, y)[0] - d[0]) < 0.5

    def test_polyconic_snyder_example(self):
        # Snyder p. 304: Clarke 1866, lat_0=30, lon_0=-96, point (40N, 75W)
        sr = get_sr("+proj=poly +ellps=clrk66 +lon_0=-96 +lat_0=30")
        x, y = sr.projection.forward(-75.0, 40.0)
        assert abs(x - 1776774.5) < 1.0
        assert abs(y - 1319657.8) < 1.0

    def test_equal_area_poles_roundtrip(self):
        # Newton derivative vanishes at the poles: the poles themselves
        # snap exactly; NEAR-pole points keep sub-milli-degree accuracy
        # (the convergence there is linear — PROJ snaps such points all
        # the way to the pole, which is strictly worse)
        for definition in ("+proj=moll +ellps=WGS84", "+proj=eck4 +ellps=WGS84"):
            sr = get_sr(definition)
            lats = np.array([-90.0, -89.99, 89.99, 90.0])
            lons = np.zeros(4)
            x, y = sr.projection.forward(lons, lats)
            lo, la = sr.projection.inverse(x, y)
            np.testing.assert_allclose(la[[0, 3]], lats[[0, 3]], atol=1e-9)
            np.testing.assert_allclose(la[[1, 2]], lats[[1, 2]], atol=1e-3)

    def test_orthographic_far_hemisphere_nan(self):
        sr = get_sr("+proj=ortho +ellps=WGS84 +lat_0=40 +lon_0=10")
        x, y = sr.projection.forward(np.array([-175.0]), np.array([-40.0]))
        assert np.isnan(x).all() and np.isnan(y).all()


class TestUnits:
    _TX_FT_WKT = (
        'PROJCS["NAD83 / Texas South Central (ftUS)",'
        'GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
        'SPHEROID["GRS 1980",6378137,298.257222101]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",30.2833333333333],'
        'PARAMETER["standard_parallel_2",28.3833333333333],'
        'PARAMETER["latitude_of_origin",27.8333333333333],'
        'PARAMETER["central_meridian",-99],'
        'PARAMETER["false_easting",1968500],'
        'PARAMETER["false_northing",13123333.333],'
        'UNIT["US survey foot",0.304800609601219]]'
    )

    def test_us_survey_foot_wkt(self):
        sr = get_sr(self._TX_FT_WKT)
        x, y = sr.projection.forward(-99.0, 27.8333333333333)
        # the natural origin lands on the false easting/northing, in feet
        assert abs(x - 1968500.0) < 1e-3
        assert abs(y - 13123333.333) < 1e-3
        lon, lat = sr.projection.inverse(x, y)
        assert abs(lon - -99.0) < 1e-9
        assert abs(lat - 27.8333333333333) < 1e-9

    def test_foot_scaling_consistency(self):
        # the same projection in metres, scaled by the unit factor
        sr_ft = get_sr(self._TX_FT_WKT)
        sr_m = get_sr(
            "+proj=lcc +ellps=GRS80 +lat_1=30.2833333333333 "
            "+lat_2=28.3833333333333 +lat_0=27.8333333333333 +lon_0=-99"
        )
        factor = 0.304800609601219
        xf, yf = sr_ft.projection.forward(-97.5, 29.0)
        xm, ym = sr_m.projection.forward(-97.5, 29.0)
        assert abs((xf - 1968500.0) * factor - xm) < 1e-3
        assert abs((yf - 13123333.333) * factor - ym) < 1e-3

    def test_proj4_units_on_utm_and_stere(self):
        """+units applies on the utm/stere fast paths too (review
        finding: the early returns silently ignored it)."""
        utm_ft = get_sr("+proj=utm +zone=10 +datum=WGS84 +units=us-ft")
        utm_m = get_sr("+proj=utm +zone=10 +datum=WGS84")
        xf, yf = utm_ft.projection.forward(-123.0, 45.0)
        xm, ym = utm_m.projection.forward(-123.0, 45.0)
        factor = 1200.0 / 3937.0
        assert abs(xf * factor - xm) < 1e-6
        assert abs(yf * factor - ym) < 1e-6
        stere_ft = get_sr(
            "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +datum=WGS84 "
            "+units=ft"
        )
        stere_m = get_sr(
            "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +datum=WGS84"
        )
        xf, yf = stere_ft.projection.forward(-50.0, 75.0)
        xm, ym = stere_m.projection.forward(-50.0, 75.0)
        assert abs(xf * 0.3048 - xm) < 1e-6
        assert abs(yf * 0.3048 - ym) < 1e-6

    def test_proj4_units_ft(self):
        sr = get_sr("+proj=tmerc +ellps=WGS84 +lon_0=9 +k=0.9996 +units=ft")
        sm = get_sr("+proj=tmerc +ellps=WGS84 +lon_0=9 +k=0.9996")
        xf, yf = sr.projection.forward(10.0, 50.0)
        xm, ym = sm.projection.forward(10.0, 50.0)
        assert abs(xf * 0.3048 - xm) < 1e-6
        assert abs(yf * 0.3048 - ym) < 1e-6
        lon, lat = sr.projection.inverse(xf, yf)
        assert abs(lon - 10.0) < 1e-9 and abs(lat - 50.0) < 1e-9


class TestEsriWkt:
    def test_esri_world_robinson_wkt(self):
        # ESRI-flavoured WKT: D_ datum prefix, ESRI method naming
        wkt = (
            'PROJCS["World_Robinson",GEOGCS["GCS_WGS_1984",'
            'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137,298.257223563]],'
            'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]],'
            'PROJECTION["Robinson"],PARAMETER["central_meridian",0],'
            'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
            'UNIT["Meter",1]]'
        )
        sr = get_sr(wkt)
        x, y = sr.projection.forward(_WORLD_LONS, _WORLD_LATS)
        lo, la = sr.projection.inverse(x, y)
        assert np.nanmax(_wrap_err(lo, _WORLD_LONS)) < 1e-6
        assert np.nanmax(np.abs(la - _WORLD_LATS)) < 1e-6
        # and it equals the authority-coded equivalent
        ref = get_sr("ESRI:54030")
        xr, yr = ref.projection.forward(_WORLD_LONS, _WORLD_LATS)
        np.testing.assert_allclose(x, xr, atol=1e-6)
        np.testing.assert_allclose(y, yr, atol=1e-6)

    def test_esri_world_code_identities(self):
        # review finding: 54017 is BEHRMANN (cea sp=30), 54024 is Bonne,
        # 54021 is polyconic
        from dask_geomodeling_tpu.geo.crs import _AmericanPolyconic, _Bonne

        behrmann = get_sr("ESRI:54017")
        x, y = behrmann.projection.forward(10.0, 45.0)
        # Behrmann at 45N: positive y; x = a*k0*lam with k0 ~ cos(30)
        assert y > 0 and 960000 < x < 970000
        assert isinstance(get_sr("ESRI:54024").projection, _Bonne)
        assert isinstance(get_sr("ESRI:54021").projection, _AmericanPolyconic)

    def test_esri_sinusoidal_modis_style(self):
        wkt = (
            'PROJCS["Sinusoidal",GEOGCS["GCS_Undefined",'
            'DATUM["D_Undefined",SPHEROID["User_Defined_Spheroid",'
            '6371007.181,0]],PRIMEM["Greenwich",0],'
            'UNIT["Degree",0.0174532925199433]],'
            'PROJECTION["Sinusoidal"],PARAMETER["central_meridian",0],'
            'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
            'UNIT["Meter",1]]'
        )
        sr = get_sr(wkt)
        x, y = sr.projection.forward(0.0, 45.0)
        # spherical sinusoidal: y = R * phi
        assert abs(y - 6371007.181 * np.radians(45.0)) < 1e-3
        assert abs(x) < 1e-9


class TestNamedDatums:
    def test_proj4_datum_nad27(self):
        sr = get_sr("+proj=longlat +datum=NAD27")
        assert sr.ellipsoid.a == 6378206.4
        assert sr.helmert_to_wgs84 is not None
        # the mean CONUS shift moves points by tens of metres
        lon, lat = transform_points(
            np.array([-96.0]), np.array([38.0]), sr, "EPSG:4326"
        )
        assert 1e-5 < abs(lon[0] - -96.0) + abs(lat[0] - 38.0) < 0.01

    def test_ed50_utm_datum_shift(self):
        # ED50 UTM31 vs WGS84 UTM31 differ by the ED50 datum shift (~100 m)
        x, y = get_transform_func("EPSG:23031", "EPSG:32631")(
            np.array([500000.0]), np.array([4649776.0])
        )
        shift = np.hypot(x[0] - 500000.0, y[0] - 4649776.0)
        assert 50.0 < shift < 300.0

    def test_pulkovo_registry(self):
        sr = get_sr("EPSG:4284")
        assert sr.ellipsoid.a == 6378245.0
        assert sr.helmert_to_wgs84 is not None


class TestUnsupportedStillRaises:
    def test_unknown_epsg_raises(self):
        with pytest.raises(TransformException):
            get_sr("EPSG:999999")

    def test_unknown_method_raises(self):
        with pytest.raises(TransformException):
            get_sr("+proj=nonexistent_projection +ellps=WGS84")
