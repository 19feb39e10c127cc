"""Round-3 EPSG registry families: NAD27/WGS72/SIRGAS/Pulkovo/GDA2020/JGD
UTM-style zone ranges, NTF Lambert zones, Austria Gauss-Krueger, Irish
grids, Nordic/Baltic systems, California state plane zones, Brazil
Polyconic.

The reference resolves these through OSR/PROJ's EPSG database (reference
utils.py:396-473); here each family is generated from its defining
parameters.  Wiring is pinned three ways: projected round-trips, the
grid origin landing on (FE, FN), and city-scale sanity anchors.
"""
import numpy as np
import pytest

from dask_geomodeling_tpu.geo.crs import (
    get_sr,
    transform_points,
)

# (code, lons, lats) in each system's domain
ROUNDTRIP = [
    (26707, np.array([-147.0, -145.0]), np.array([58.0, 64.0])),
    (26716, np.array([-90.0, -87.5]), np.array([30.0, 45.0])),
    (32230, np.array([-6.0, -3.1]), np.array([20.0, 55.0])),
    (32330, np.array([-6.0, -3.1]), np.array([-55.0, -20.0])),
    (28407, np.array([37.0, 40.5]), np.array([44.0, 60.0])),
    (28467, np.array([37.0, 40.5]), np.array([44.0, 60.0])),
    (7850, np.array([115.0, 118.0]), np.array([-35.0, -20.0])),
    (31983, np.array([-45.5, -43.2]), np.array([-25.0, -5.0])),
    (31972, np.array([-70.0, -67.0]), np.array([-5.0, 8.0])),
    (3100, np.array([138.0, 141.5]), np.array([33.0, 43.0])),
    (6690, np.array([138.0, 141.5]), np.array([33.0, 43.0])),
    (2157, np.array([-10.0, -8.0, -6.2]), np.array([51.5, 53.4, 55.3])),
    (29902, np.array([-10.0, -8.0, -6.2]), np.array([51.5, 53.4, 55.3])),
    (29903, np.array([-9.0, -7.0]), np.array([52.0, 54.5])),
    (2169, np.array([5.8, 6.15, 6.5]), np.array([49.45, 49.85, 50.2])),
    (3006, np.array([11.2, 15.0, 23.8]), np.array([55.3, 62.0, 68.9])),
    (3763, np.array([-9.5, -8.1, -6.2]), np.array([37.0, 39.7, 42.1])),
    (31254, np.array([9.6, 10.33, 11.8]), np.array([46.4, 47.3, 48.7])),
    (31256, np.array([15.0, 16.33, 17.1]), np.array([46.4, 48.2, 48.9])),
    (31258, np.array([12.1, 13.33, 14.7]), np.array([46.4, 47.3, 48.7])),
    (3301, np.array([21.8, 24.8, 28.2]), np.array([57.5, 58.7, 59.7])),
    (32139, np.array([-103.9, -100.3, -96.5]), np.array([29.7, 30.8, 32.2])),
    (26941, np.array([-124.3, -122.0, -120.0]), np.array([39.6, 40.8, 42.0])),
    (26943, np.array([-123.0, -120.5, -117.8]), np.array([36.6, 37.5, 38.4])),
    (26946, np.array([-118.1, -116.25, -114.1]), np.array([32.6, 33.3, 34.0])),
    (27561, np.array([-1.5, 2.34, 6.0]), np.array([48.6, 49.5, 50.8])),
    (27572, np.array([-1.5, 2.34, 6.0]), np.array([45.5, 46.8, 48.4])),
    (27574, np.array([8.6, 9.2]), np.array([41.4, 42.8])),
    (29101, np.array([-70.0, -54.0, -37.0]), np.array([-32.0, -12.0, 4.0])),
    (5880, np.array([-70.0, -54.0, -37.0]), np.array([-32.0, -12.0, 4.0])),
]

GEOGRAPHIC_CODES = [
    4322, 4618, 4674, 4612, 6668, 7844, 4619, 4299, 4300, 4173, 4171,
    4275, 4181, 4314,
]


class TestFamilies:
    @pytest.mark.parametrize("code,lons,lats", ROUNDTRIP)
    def test_roundtrip(self, code, lons, lats):
        sr = get_sr("EPSG:%d" % code)
        x, y = sr.projection.forward(lons, lats)
        assert np.isfinite(x).all() and np.isfinite(y).all()
        lons2, lats2 = sr.projection.inverse(x, y)
        np.testing.assert_allclose(lons2, lons, atol=1e-8)
        np.testing.assert_allclose(lats2, lats, atol=1e-8)

    @pytest.mark.parametrize("code,lons,lats", ROUNDTRIP)
    def test_wgs84_transform_roundtrip(self, code, lons, lats):
        """Full datum-shift path there and back within ~1 mm in degrees."""
        src, dst = get_sr("EPSG:4326"), get_sr("EPSG:%d" % code)
        x, y = transform_points(lons, lats, src, dst)
        lons2, lats2 = transform_points(x, y, dst, src)
        np.testing.assert_allclose(lons2, lons, atol=1e-7)
        np.testing.assert_allclose(lats2, lats, atol=1e-7)

    @pytest.mark.parametrize("code", GEOGRAPHIC_CODES)
    def test_geographic_resolves(self, code):
        sr = get_sr("EPSG:%d" % code)
        assert sr.is_geographic
        # the Helmert (or identity) shift to WGS84 stays sub-km
        lon, lat = transform_points(
            np.array([10.0]), np.array([50.0]), sr, get_sr("EPSG:4326")
        )
        assert abs(lon[0] - 10.0) < 0.02 and abs(lat[0] - 50.0) < 0.02

    def test_grid_origins_land_on_false_origin(self):
        """forward(lon0, lat0) == (FE, FN) pins every parameter slot."""
        cases = [
            (26710, -123.0, 0.0, 500000.0, 0.0),
            (32232, 9.0, 0.0, 500000.0, 0.0),
            (28412, 69.0, 0.0, 12500000.0, 0.0),
            (28472, 69.0, 0.0, 500000.0, 0.0),
            (7856, 153.0, 0.0, 500000.0, 10000000.0),
            (31981, -57.0, 0.0, 500000.0, 10000000.0),
            (31965, -117.0, 0.0, 500000.0, 0.0),
            (3097, 123.0, 0.0, 500000.0, 0.0),
            (6688, 123.0, 0.0, 500000.0, 0.0),
            (2157, -8.0, 53.5, 600000.0, 750000.0),
            (29902, -8.0, 53.5, 200000.0, 250000.0),
            (2169, 6.166666666666667, 49.833333333333336, 80000.0, 100000.0),
            (3006, 15.0, 0.0, 500000.0, 0.0),
            (31255, 13.333333333333334, 0.0, 0.0, -5000000.0),
            (31259, 16.333333333333332, 0.0, 750000.0, -5000000.0),
            (3301, 24.0, 57.517553930555555, 500000.0, 6375000.0),
            (32139, -100.33333333333333, 29.66666666666667,
             700000.0, 3000000.0),
            (26944, -119.0, 35.33333333333334, 2000000.0, 500000.0),
            (27572, 2.0 + 20.0 / 60.0 + 14.025 / 3600.0, 46.8,
             600000.0, 2200000.0),
            (29101, -54.0, 0.0, 5000000.0, 10000000.0),
        ]
        for code, lon0, lat0, fe, fn in cases:
            sr = get_sr("EPSG:%d" % code)
            x, y = sr.projection.forward(np.array([lon0]), np.array([lat0]))
            np.testing.assert_allclose(
                [x[0], y[0]], [fe, fn], atol=1e-4,
                err_msg="EPSG:%d origin" % code,
            )

    def test_city_anchors(self):
        """Coarse ground anchors: the right country lands in the right
        part of the grid (sign conventions, false origins, units)."""
        wgs = get_sr("EPSG:4326")
        # Vienna in Austria GK East
        x, y = transform_points(
            np.array([16.3731]), np.array([48.2082]), wgs, get_sr("EPSG:31256")
        )
        assert 1000 < x[0] < 5000, x[0]
        assert 330000 < y[0] < 370000, y[0]
        # Tallinn in L-EST97
        x, y = transform_points(
            np.array([24.7536]), np.array([59.437]), wgs, get_sr("EPSG:3301")
        )
        assert 537000 < x[0] < 548000, x[0]
        assert 6584000 < y[0] < 6594000, y[0]
        # Paris in Lambert II etendu
        x, y = transform_points(
            np.array([2.3522]), np.array([48.8566]), wgs, get_sr("EPSG:27572")
        )
        assert 600500 < x[0] < 602500, x[0]
        assert 2426000 < y[0] < 2431000, y[0]
        # San Francisco in California zone 3
        x, y = transform_points(
            np.array([-122.4194]), np.array([37.7749]), wgs,
            get_sr("EPSG:26943")
        )
        assert 1810000 < x[0] < 1850000, x[0]
        assert 630000 < y[0] < 660000, y[0]
        # Dublin in the Irish grids: ITM and Irish Grid O-sheet
        x, y = transform_points(
            np.array([-6.2603]), np.array([53.3498]), wgs, get_sr("EPSG:2157")
        )
        assert 705000 < x[0] < 725000, x[0]
        assert 725000 < y[0] < 745000, y[0]
        x, y = transform_points(
            np.array([-6.2603]), np.array([53.3498]), wgs, get_sr("EPSG:29902")
        )
        assert 305000 < x[0] < 325000, x[0]
        assert 225000 < y[0] < 245000, y[0]

    def test_utm_cross_datum_deltas_small(self):
        """Sibling-datum UTM grids stay within the datum-shift scale of
        the WGS84 grid (catches wrong zone formulas or hemispheres)."""
        wgs = get_sr("EPSG:4326")
        lon, lat = np.array([-87.6298]), np.array([41.8781])  # Chicago
        x84, y84 = transform_points(lon, lat, wgs, get_sr("EPSG:32616"))
        for code, bound in ((26716, 300.0), (32216, 120.0)):
            x, y = transform_points(lon, lat, wgs, get_sr("EPSG:%d" % code))
            assert abs(x[0] - x84[0]) < bound, (code, x[0] - x84[0])
            assert abs(y[0] - y84[0]) < bound, (code, y[0] - y84[0])
        # SIRGAS 2000 is WGS84-coincident: metre-level identity
        lon, lat = np.array([-46.6333]), np.array([-23.55])  # Sao Paulo
        x84, y84 = transform_points(lon, lat, wgs, get_sr("EPSG:32723"))
        x, y = transform_points(lon, lat, wgs, get_sr("EPSG:31983"))
        np.testing.assert_allclose([x[0], y[0]], [x84[0], y84[0]], atol=1.0)

    def test_ntf_zone_northing_offsets(self):
        """The carto variants add zone-number millions to the northing."""
        for zone in range(4):
            base = get_sr("EPSG:%d" % (27561 + zone))
            carto = get_sr("EPSG:%d" % (27571 + zone))
            lon = np.array([2.5])
            lat = np.array([49.5, 46.8, 44.1, 42.165][zone : zone + 1])
            xb, yb = base.projection.forward(lon, lat)
            xc, yc = carto.projection.forward(lon, lat)
            np.testing.assert_allclose(xb, xc, atol=1e-6)
            np.testing.assert_allclose(
                yc - yb, [(zone + 1) * 1000000.0], atol=1e-6
            )

    def test_pulkovo_zone_prefix_easting(self):
        """Zone-prefixed vs CM variants differ only by the zone millions."""
        a = get_sr("EPSG:28409").projection
        b = get_sr("EPSG:28469").projection
        lon, lat = np.array([51.3]), np.array([55.0])
        xa, ya = a.forward(lon, lat)
        xb, yb = b.forward(lon, lat)
        np.testing.assert_allclose(xa - xb, [9000000.0], atol=1e-6)
        np.testing.assert_allclose(ya, yb, atol=1e-6)
