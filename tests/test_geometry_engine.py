"""Tests for the native geometry engine (GEOS replacement)."""
import numpy as np
import pytest

from dask_geomodeling_tpu.geo.features import GeoDataFrame, GeoSeries
from dask_geomodeling_tpu.geo.geometry import (
    GeometryCollection,
    LineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    box,
    from_wkb,
    from_wkt,
    shape,
)


class TestTypes:
    def test_point(self):
        p = Point(1.5, 2.5)
        assert p.x == 1.5 and p.y == 2.5
        assert p.bounds == (1.5, 2.5, 1.5, 2.5)
        assert p.centroid.equals(p)
        assert p.area == 0.0

    def test_linestring(self):
        line = LineString([(0, 0), (3, 4)])
        assert line.length == 5.0
        assert line.centroid.equals(Point(1.5, 2.0))

    def test_polygon(self):
        poly = box(0, 0, 4, 4)
        assert poly.area == 16.0
        assert poly.length == 16.0
        assert poly.centroid.equals(Point(2, 2))
        assert len(poly.exterior.coords) == 5

    def test_polygon_with_hole(self):
        poly = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10)], [[(4, 4), (6, 4), (6, 6), (4, 6)]]
        )
        assert poly.area == 96.0
        assert len(poly.interiors) == 1

    def test_multipolygon(self):
        mp = MultiPolygon([box(0, 0, 1, 1), box(2, 0, 3, 1)])
        assert mp.area == 2.0
        assert len(mp) == 2

    def test_empty(self):
        assert Polygon().is_empty
        assert not box(0, 0, 1, 1).is_empty

    def test_geo_interface_roundtrip(self):
        poly = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10)], [[(4, 4), (6, 4), (6, 6), (4, 6)]]
        )
        assert shape(poly.__geo_interface__).equals(poly)


class TestPredicates:
    def test_intersects_boxes(self):
        assert box(0, 0, 2, 2).intersects(box(1, 1, 3, 3))
        assert not box(0, 0, 2, 2).intersects(box(3, 3, 4, 4))
        # touching edges intersect
        assert box(0, 0, 2, 2).intersects(box(2, 0, 4, 2))

    def test_intersects_containment(self):
        assert box(0, 0, 10, 10).intersects(box(4, 4, 6, 6))
        assert box(4, 4, 6, 6).intersects(box(0, 0, 10, 10))

    def test_intersects_point(self):
        assert box(0, 0, 2, 2).intersects(Point(1, 1))
        assert Point(1, 1).intersects(box(0, 0, 2, 2))
        assert not Point(5, 5).intersects(box(0, 0, 2, 2))

    def test_intersects_hole(self):
        donut = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10)], [[(4, 4), (6, 4), (6, 6), (4, 6)]]
        )
        assert not donut.intersects(Point(5, 5))  # inside the hole
        assert donut.intersects(Point(1, 1))

    def test_within(self):
        assert box(1, 1, 2, 2).within(box(0, 0, 4, 4))
        assert not box(0, 0, 4, 4).within(box(1, 1, 2, 2))
        assert Point(1, 1).within(box(0, 0, 2, 2))

    def test_contains(self):
        assert box(0, 0, 4, 4).contains(Point(2, 2))
        assert box(0, 0, 4, 4).contains(box(1, 1, 2, 2))

    def test_line_polygon(self):
        line = LineString([(-1, 1), (5, 1)])
        assert line.intersects(box(0, 0, 2, 2))
        assert not LineString([(-1, 5), (5, 5)]).intersects(box(0, 0, 2, 2))

    def test_distance(self):
        assert box(0, 0, 1, 1).distance(box(3, 0, 4, 1)) == 2.0
        assert Point(0, 0).distance(Point(3, 4)) == 5.0
        assert box(0, 0, 2, 2).distance(Point(1, 1)) == 0.0


class TestOperations:
    def test_intersection(self):
        result = box(0, 0, 4, 4).intersection(box(2, 2, 6, 6))
        assert result.area == pytest.approx(4.0)
        assert result.bounds == (2, 2, 4, 4)

    def test_intersection_disjoint(self):
        assert box(0, 0, 1, 1).intersection(box(5, 5, 6, 6)).is_empty

    def test_union(self):
        assert box(0, 0, 4, 4).union(box(2, 2, 6, 6)).area == pytest.approx(28.0)

    def test_union_disjoint(self):
        result = box(0, 0, 1, 1).union(box(5, 5, 6, 6))
        assert result.geom_type == "MultiPolygon"
        assert result.area == pytest.approx(2.0)

    def test_difference(self):
        assert box(0, 0, 4, 4).difference(box(2, 2, 6, 6)).area == pytest.approx(12.0)

    def test_difference_hole(self):
        result = box(0, 0, 10, 10).difference(box(4, 4, 6, 6))
        assert result.area == pytest.approx(96.0)
        assert len(result.holes) == 1

    def test_difference_complete(self):
        assert box(1, 1, 2, 2).difference(box(0, 0, 4, 4)).is_empty

    def test_triangle_overlay(self):
        tri = Polygon([(0, 0), (4, 0), (2, 4)])
        result = tri.intersection(box(0, 0, 4, 2))
        assert result.area == pytest.approx(6.0)  # trapezoid

    def test_line_clip(self):
        result = LineString([(-2, 1), (6, 1)]).intersection(box(0, 0, 4, 4))
        assert result.geom_type == "LineString"
        assert result.length == pytest.approx(4.0)

    def test_point_intersection(self):
        assert Point(1, 1).intersection(box(0, 0, 2, 2)).equals(Point(1, 1))
        assert Point(9, 9).intersection(box(0, 0, 2, 2)).is_empty

    def test_buffer_point(self):
        circle = Point(0, 0).buffer(2)
        assert circle.area == pytest.approx(np.pi * 4, rel=0.01)

    def test_buffer_polygon(self):
        grown = box(0, 0, 4, 4).buffer(1.0)
        # 16 + 4 sides * 4 + pi * 1^2
        assert grown.area == pytest.approx(16 + 16 + np.pi, rel=0.02)
        assert grown.contains(box(0, 0, 4, 4))

    def test_buffer_negative(self):
        shrunk = box(0, 0, 4, 4).buffer(-1.0)
        assert shrunk.area == pytest.approx(4.0, rel=0.05)
        assert shrunk.within(box(0, 0, 4, 4))

    def test_buffer_zero(self):
        poly = box(0, 0, 1, 1)
        assert poly.buffer(0) is poly

    def test_simplify(self):
        line = LineString([(0, 0), (1, 0.001), (2, 0), (3, 0.001), (4, 0)])
        assert len(line.simplify(0.01).coords) == 2

    def test_convex_hull(self):
        mp = MultiPoint([Point(0, 0), Point(4, 0), Point(4, 4), Point(2, 1)])
        hull = mp.convex_hull
        assert hull.area == pytest.approx(8.0)


class TestSerialization:
    def test_wkt_roundtrip(self):
        geoms = [
            Point(1, 2),
            LineString([(0, 0), (1, 1)]),
            box(0, 0, 2, 2),
            Polygon([(0, 0), (8, 0), (8, 8)], [[(2, 1), (4, 1), (4, 3)]]),
            MultiPolygon([box(0, 0, 1, 1), box(2, 2, 3, 3)]),
            MultiPoint([Point(0, 0), Point(1, 1)]),
        ]
        for geom in geoms:
            assert from_wkt(geom.wkt).equals(geom), geom.wkt

    def test_wkb_roundtrip(self):
        geoms = [
            Point(1.5, -2.5),
            LineString([(0, 0), (1, 1), (2, 0)]),
            Polygon([(0, 0), (8, 0), (8, 8)], [[(2, 1), (4, 1), (4, 3)]]),
            MultiPolygon([box(0, 0, 1, 1)]),
        ]
        for geom in geoms:
            assert from_wkb(geom.wkb).equals(geom)

    def test_wkt_empty(self):
        assert from_wkt("POLYGON EMPTY").is_empty
        assert Polygon().wkt == "POLYGON EMPTY"

    def test_wkt_invalid(self):
        from dask_geomodeling_tpu.geo.geometry import WKTReadingError

        with pytest.raises(WKTReadingError):
            from_wkt("NOT_A_GEOMETRY (1 2)")

    def test_collection(self):
        gc = GeometryCollection([Point(0, 0), box(1, 1, 2, 2)])
        assert from_wkt(gc.wkt).wkb == gc.wkb


class TestGeoSeries:
    def test_basic(self):
        gs = GeoSeries([box(0, 0, 2, 2), box(1, 1, 4, 4)], crs="EPSG:28992")
        assert gs.area.tolist() == [4.0, 9.0]
        assert gs.intersects(Point(1.5, 1.5)).tolist() == [True, True]
        assert gs.intersects(Point(3, 3)).tolist() == [False, True]

    def test_centroid(self):
        gs = GeoSeries([box(0, 0, 2, 2)], crs="EPSG:28992")
        c = gs.centroid
        assert c.crs == "EPSG:28992"
        assert c.iloc[0].equals(Point(1, 1))

    def test_total_bounds(self):
        gs = GeoSeries([box(0, 0, 2, 2), box(1, 1, 4, 4)])
        assert gs.total_bounds.tolist() == [0, 0, 4, 4]

    def test_to_crs(self):
        gs = GeoSeries([Point(155000, 463000)], crs="EPSG:28992")
        out = gs.to_crs("EPSG:4326")
        assert out.crs == "EPSG:4326"
        assert out.iloc[0].x == pytest.approx(5.38720, abs=1e-4)

    def test_isnull(self):
        gs = GeoSeries([box(0, 0, 1, 1), None])
        assert gs.isnull().tolist() == [False, True]


class TestGeoDataFrame:
    def test_construction(self):
        gdf = GeoDataFrame(
            {"a": [1, 2]},
            geometry=[box(0, 0, 1, 1), box(1, 1, 2, 2)],
            crs="EPSG:28992",
        )
        assert gdf.crs == "EPSG:28992"
        assert gdf.geometry.area.tolist() == [1.0, 1.0]

    def test_to_crs(self):
        gdf = GeoDataFrame(
            {"a": [1]}, geometry=[Point(155000, 463000)], crs="EPSG:28992"
        )
        out = gdf.to_crs("EPSG:4326")
        assert out.crs == "EPSG:4326"
        assert out.geometry.iloc[0].x == pytest.approx(5.38720, abs=1e-4)
        # original untouched
        assert gdf.geometry.iloc[0].x == 155000

    def test_set_geometry(self):
        gdf = GeoDataFrame({"a": [1]}, geometry=[Point(0, 0)], crs="EPSG:4326")
        gdf2 = gdf.set_geometry(GeoSeries([Point(5, 5)]), crs="EPSG:4326")
        assert gdf2.geometry.iloc[0].x == 5

    def test_slicing_keeps_type(self):
        gdf = GeoDataFrame(
            {"a": [1, 2, 3]},
            geometry=[Point(i, i) for i in range(3)],
            crs="EPSG:4326",
        )
        sub = gdf.iloc[:2]
        assert isinstance(sub, GeoDataFrame)
        assert len(sub.geometry) == 2


class TestOverlayProperties:
    """Property-based checks: for any A, B the overlay results must satisfy
    area(A) = area(A∩B) + area(A\\B) and area(A∪B) = area(A) + area(B) -
    area(A∩B)."""

    @staticmethod
    def random_convex(rng, cx, cy, r, n):
        # convex hull of random points: always a valid simple polygon
        from dask_geomodeling_tpu.geo.geometry import _convex_hull

        pts = np.column_stack(
            [cx + (rng.rand(n + 4) - 0.5) * 2 * r, cy + (rng.rand(n + 4) - 0.5) * 2 * r]
        )
        return Polygon(_convex_hull(pts))

    def test_area_identities_random(self):
        rng = np.random.RandomState(42)
        checked = 0
        for trial in range(30):
            a = self.random_convex(rng, 0, 0, 10, rng.randint(3, 9))
            b = self.random_convex(
                rng, rng.uniform(-8, 8), rng.uniform(-8, 8), 8, rng.randint(3, 9)
            )
            inter = a.intersection(b)
            diff = a.difference(b)
            union = a.union(b)
            tol = 1e-6 * max(a.area, b.area)
            assert abs(a.area - (inter.area + diff.area)) < tol, trial
            assert abs(union.area - (a.area + b.area - inter.area)) < tol, trial
            checked += 1
        assert checked == 30

    def test_area_identities_with_holes(self):
        # A is a donut (hole = the shrunken shell); identities must hold
        # through the hole handling of the overlay engine
        rng = np.random.RandomState(7)
        checked = 0
        for trial in range(20):
            shell = self.random_convex(rng, 0, 0, 10, rng.randint(4, 9))
            # shrink about the centroid so the hole stays strictly inside
            cx, cy = shell.centroid.coords0
            hole_ring = [
                (cx + (x - cx) * 0.4, cy + (y - cy) * 0.4)
                for x, y in shell.exterior.coords[:-1]
            ]
            a = Polygon(list(shell.exterior.coords[:-1]), [hole_ring])
            b = self.random_convex(
                rng, rng.uniform(-6, 6), rng.uniform(-6, 6), 7, rng.randint(3, 9)
            )
            inter = a.intersection(b)
            diff = a.difference(b)
            union = a.union(b)
            tol = 1e-6 * max(a.area, b.area)
            assert abs(a.area - (inter.area + diff.area)) < tol, trial
            assert abs(union.area - (a.area + b.area - inter.area)) < tol, trial
            checked += 1
        assert checked == 20

    def test_box_grid_identities(self):
        # axis-aligned boxes with shared edges and corner touches
        boxes = [
            (box(0, 0, 4, 4), box(4, 0, 8, 4)),   # shared edge
            (box(0, 0, 4, 4), box(4, 4, 8, 8)),   # corner touch
            (box(0, 0, 4, 4), box(1, 1, 3, 3)),   # containment
            (box(0, 0, 4, 4), box(0, 0, 4, 4)),   # identity
            (box(0, 0, 4, 4), box(2, -1, 6, 5)),  # straddling
        ]
        for a, b in boxes:
            inter = a.intersection(b)
            diff = a.difference(b)
            union = a.union(b)
            assert abs(a.area - (inter.area + diff.area)) < 1e-9
            assert abs(union.area - (a.area + b.area - inter.area)) < 1e-9

    def test_intersection_commutes(self):
        rng = np.random.RandomState(7)
        for _ in range(10):
            a = self.random_convex(rng, 0, 0, 10, 6)
            b = self.random_convex(rng, 3, 3, 8, 6)
            ab = a.intersection(b).area
            ba = b.intersection(a).area
            assert abs(ab - ba) < 1e-9 * max(1.0, ab)


class TestOverlayDegenerateCases:
    """Shared edges, corner touches, identical inputs, and hole-plug
    algebra — the classic robustness traps of boolean overlay."""

    def test_edge_adjacent(self):
        a, b = box(0, 0, 2, 2), box(2, 0, 4, 2)
        assert a.intersection(b).area == 0.0
        assert a.union(b).area == 8.0

    def test_corner_touch(self):
        a, b = box(0, 0, 2, 2), box(2, 2, 4, 4)
        assert a.intersection(b).area == 0.0
        assert a.union(b).area == 8.0

    def test_partial_shared_edge(self):
        a, b = box(0, 0, 2, 2), box(0, 0, 2, 1)  # b inside a, shares edges
        assert a.difference(b).area == pytest.approx(2.0)
        assert a.union(b).area == pytest.approx(4.0)
        assert a.intersection(b).area == pytest.approx(2.0)

    def test_identical_inputs(self):
        a, b = box(0, 0, 2, 2), box(0, 0, 2, 2)
        assert a.difference(b).area == 0.0
        assert a.union(b).area == 4.0
        assert a.intersection(b).area == 4.0

    def test_hole_plug_algebra(self):
        donut = Polygon(
            [(0, 0), (4, 0), (4, 4), (0, 4)],
            [[(1, 1), (3, 1), (3, 3), (1, 3)]],
        )
        plug = box(1, 1, 3, 3)
        assert donut.area == 12.0
        assert donut.union(plug).area == 16.0  # hole is filled
        assert donut.intersection(plug).area == 0.0
        assert donut.difference(plug).area == 12.0
        assert plug.difference(donut).area == 4.0


class TestSerializationFuzz:
    """WKT and WKB round-trips over random geometries of every type."""

    @staticmethod
    def random_geometry(rng, depth=0):
        from dask_geomodeling_tpu.geo.geometry import (
            GeometryCollection,
            LineString,
            MultiLineString,
            MultiPoint,
            MultiPolygon,
            Point,
            _convex_hull,
        )

        kind = rng.randint(7 if depth == 0 else 6)
        if kind == 0:
            return Point(*np.round(rng.randn(2) * 100, 6))
        if kind == 1:
            return LineString(np.round(rng.randn(rng.randint(2, 6), 2) * 50, 6))
        if kind == 2:
            pts = rng.randn(8, 2) * 30
            return Polygon(_convex_hull(np.round(pts, 6)))
        if kind == 3:
            return MultiPoint(
                [Point(*np.round(rng.randn(2) * 10, 6)) for _ in range(3)]
            )
        if kind == 4:
            return MultiLineString(
                [
                    LineString(np.round(rng.randn(3, 2) * 10, 6))
                    for _ in range(2)
                ]
            )
        if kind == 5:
            polys = []
            for i in range(2):
                pts = rng.randn(8, 2) * 10 + i * 100
                polys.append(Polygon(_convex_hull(np.round(pts, 6))))
            return MultiPolygon(polys)
        return GeometryCollection(
            [
                TestSerializationFuzz.random_geometry(rng, depth + 1)
                for _ in range(2)
            ]
        )

    @pytest.mark.parametrize("seed", range(20))
    def test_wkt_wkb_roundtrip(self, seed):
        from dask_geomodeling_tpu.geo import _wkt
        from dask_geomodeling_tpu.geo.geometry import from_wkb, from_wkt

        rng = np.random.RandomState(seed)
        geom = self.random_geometry(rng)

        via_wkt = from_wkt(geom.wkt)
        assert via_wkt.geom_type == geom.geom_type
        assert via_wkt.equals(geom), geom.wkt

        via_wkb = from_wkb(_wkt.dumps_wkb(geom))
        assert via_wkb.geom_type == geom.geom_type
        assert via_wkb.equals(geom)


class TestPredicateOverlayConsistency:
    """Predicates must agree with the overlay engine: intersects iff the
    intersection has positive area (for overlapping convex polygons), and
    within implies the intersection equals the contained polygon."""

    @pytest.mark.parametrize("seed", range(15))
    def test_intersects_consistent_with_overlay(self, seed):
        from dask_geomodeling_tpu.geo.geometry import _convex_hull

        rng = np.random.RandomState(100 + seed)

        def hull(cx, cy, r):
            pts = np.column_stack(
                [cx + (rng.rand(8) - 0.5) * 2 * r, cy + (rng.rand(8) - 0.5) * 2 * r]
            )
            return Polygon(_convex_hull(pts))

        a = hull(0, 0, 10)
        b = hull(rng.uniform(-15, 15), rng.uniform(-15, 15), 8)
        inter = a.intersection(b)
        if inter.area > 1e-9:
            assert a.intersects(b)
        if a.intersects(b) and not inter.is_empty:
            # intersection is inside both inputs
            assert inter.area <= a.area + 1e-9
            assert inter.area <= b.area + 1e-9

    @pytest.mark.parametrize("seed", range(10))
    def test_within_implies_identity_intersection(self, seed):
        from dask_geomodeling_tpu.geo.geometry import _convex_hull

        rng = np.random.RandomState(200 + seed)
        pts = np.column_stack([(rng.rand(8) - 0.5) * 20, (rng.rand(8) - 0.5) * 20])
        outer = Polygon(_convex_hull(pts))
        cx, cy = outer.centroid.coords0
        inner = Polygon(
            [(cx + (x - cx) * 0.3, cy + (y - cy) * 0.3)
             for x, y in outer.exterior.coords[:-1]]
        )
        assert inner.within(outer)
        assert outer.contains(inner)
        assert inner.intersection(outer).area == pytest.approx(inner.area, rel=1e-9)
        assert outer.union(inner).area == pytest.approx(outer.area, rel=1e-9)


class TestPointInPolygonOracle:
    """contains() agrees with matplotlib.path (an independent even-odd
    implementation) for random points strictly off the boundary."""

    @pytest.mark.parametrize("seed", range(10))
    def test_against_matplotlib(self, seed):
        from matplotlib.path import Path

        from dask_geomodeling_tpu.geo.geometry import _convex_hull

        rng = np.random.RandomState(300 + seed)
        pts = np.column_stack([(rng.rand(10) - 0.5) * 20, (rng.rand(10) - 0.5) * 20])
        poly = Polygon(_convex_hull(pts))
        ring = np.array(list(poly.exterior.coords))
        oracle = Path(ring)

        probes = (rng.rand(200, 2) - 0.5) * 24
        for x, y in probes:
            # skip probes within epsilon of any edge (convention differs)
            d = poly.exterior.distance(Point(x, y))
            if d < 1e-9:
                continue
            assert poly.contains_point(x, y) == bool(
                oracle.contains_point((x, y))
            ), (x, y)


class TestReviewRegressions:
    """Verified engine bugs from the round-2 adversarial review."""

    def test_within_concave_edge_crossing(self):
        # all vertices inside the U, but the segment crosses the gap
        u = Polygon(
            [(0, 0), (10, 0), (10, 10), (7, 10), (7, 3), (3, 3), (3, 10), (0, 10)]
        )
        assert not LineString([(1, 5), (9, 5)]).within(u)
        assert LineString([(1, 1), (9, 1)]).within(u)

    def test_multipoint_distance_no_phantom_segments(self):
        import numpy as np

        d = MultiPoint([(0, 0), (10, 10)]).distance(Point(5.1, 4.9))
        expected = min(np.hypot(5.1, 4.9), np.hypot(10 - 5.1, 10 - 4.9))
        assert d == pytest.approx(expected)

    def test_point_on_line_in_mixed_collection(self):
        gc = GeometryCollection([box(0, 0, 1, 1), LineString([(5, 5), (6, 6)])])
        assert Point(5.5, 5.5).intersects(gc)

    def test_nonareal_difference_and_union(self):
        square = box(0, 0, 4, 4)
        # point minus polygon: kept when outside, empty when inside
        assert Point(10, 10).difference(square).x == 10
        assert Point(2, 2).difference(square).is_empty
        # line minus polygon: split at the boundary, outside parts kept
        cut = LineString([(-2, 2), (6, 2)]).difference(square)
        assert cut.geom_type == "MultiLineString"
        assert sorted(round(g.length, 6) for g in cut.geoms) == [2.0, 2.0]
        # union keeps the polygon and the outside lineal parts
        merged = Point(10, 10).union(square)
        assert merged.geom_type == "GeometryCollection"


class TestWKBFlags:
    def test_ewkb_srid_and_z(self):
        import struct

        # PostGIS EWKB: SRID flag + payload must be skipped
        ewkb = struct.pack("<BIIdd", 1, 0x20000001, 4326, 5.0, 52.0)
        g = from_wkb(ewkb)
        assert (g.x, g.y) == (5.0, 52.0)
        # ISO Z code 1001 and EWKB Z flag: third ordinate dropped
        for blob in (
            struct.pack("<BIddd", 1, 1001, 5.0, 52.0, 10.0),
            struct.pack("<BIddd", 1, 0x80000001, 5.0, 52.0, 10.0),
        ):
            g = from_wkb(blob)
            assert (g.x, g.y) == (5.0, 52.0)

    def test_unknown_code_raises_reading_error(self):
        import struct

        from dask_geomodeling_tpu.geo._wkt import WKTReadingError

        with pytest.raises(WKTReadingError):
            from_wkb(struct.pack("<BIdd", 1, 999, 0.0, 0.0))


class TestBufferRingAssembly:
    def test_island_in_lake_nesting(self):
        import numpy as np

        from dask_geomodeling_tpu.geo._buffer import _rings_to_polygons

        def square(lo, hi):
            return np.array(
                [(lo, lo), (hi, lo), (hi, hi), (lo, hi), (lo, lo)], float
            )

        result = _rings_to_polygons([square(0, 10), square(2, 8), square(4, 6)])
        assert result.geom_type == "MultiPolygon"
        # the island keeps no hole, and its interior is in the result
        assert result.intersects(Point(5.0, 5.0))
        # the lake stays empty
        assert not result.intersects(Point(3.0, 3.0))
        # the outer band is filled
        assert result.intersects(Point(1.0, 1.0))
