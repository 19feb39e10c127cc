"""Adversarial robustness fuzz for the planar overlay engine.

The reference gets overlay robustness for free from GEOS (see
/root/reference/dask_geomodeling/geometry/set_operations.py:84-136 via
shapely); our from-scratch engine (geo/_overlay.py) must earn it.  This
suite goes beyond the convex fuzz in test_geometry_engine.py with the
shapes where snap-based overlay engines classically break:

- concave (star) polygons, including near-degenerate spikes
- shared edges and collinear partial overlaps (grid-snapped operands)
- slivers: extreme aspect-ratio polygons crossing other geometry
- mixed-magnitude coordinates (features of size ~1 at offsets up to 1e7)
- self-touching rings (pinch points) and vertex-on-edge contacts

Every generated pair is checked against conservation properties that hold
for ANY valid operands:

  area(A) == area(A ∩ B) + area(A \\ B)                    (partition)
  area(A ∪ B) == area(A) + area(B) - area(A ∩ B)           (inclusion-exclusion)
  area(A ∩ B) == area(B ∩ A)                               (symmetry)
  A ∩ A == A,  A ∪ A == A,  A \\ A == ∅                    (idempotence)
  A ∩ B ⊆ A bounding-box-wise; areas within [0, min(area)] (sanity)

Together the parametrized chunks generate well over 1000 distinct operand
pairs (seeds are deterministic; any failure reproduces from its ids).
"""

import numpy as np
import pytest

from dask_geomodeling_tpu.geo.geometry import (
    MultiPolygon,
    Polygon,
    box,
)


def star_polygon(rng, cx, cy, r_out, n, r_in_frac=0.2, round_to=None):
    """Random simple concave polygon: sorted angles, random radii.

    Angles are built from lower-bounded increments so every angular gap
    stays below pi — a sorted-angle polygon is guaranteed simple only
    then (a chord subtending more than pi passes on the far side of the
    center and can cross non-adjacent edges, yielding an INVALID operand
    for which the conservation properties don't hold; GEOS likewise
    documents overlay results on invalid input as undefined).
    """
    n = max(int(n), 3)
    lo = 1.2 / max(n - 1, 2)
    inc = rng.uniform(lo, 1.0, n)
    ang = np.cumsum(inc)
    ang = ang / ang[-1] * 2 * np.pi
    ang = ang[:-1] + rng.uniform(0, ang[0])  # random phase, drop the 2*pi point
    rad = rng.uniform(r_in_frac * r_out, r_out, len(ang))
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    if round_to is not None:
        xs = np.round(xs / round_to) * round_to
        ys = np.round(ys / round_to) * round_to
        # rounding can collapse vertices; drop exact duplicates
        pts = np.column_stack([xs, ys])
        _, idx = np.unique(pts, axis=0, return_index=True)
        pts = pts[np.sort(idx)]
        if len(pts) < 3:
            return None
        poly = Polygon(pts)
        if abs(poly.area) < (round_to or 1e-12) ** 2:
            return None
        # grid snapping can fold the ring into a self-intersection; the
        # conservation properties only hold for VALID operands (GEOS
        # likewise raises TopologicalError on invalid input)
        if not poly.is_valid:
            return None
        return poly
    return Polygon(np.column_stack([xs, ys]))


def sliver(rng, cx, cy, length, thickness, angle=None):
    """Very thin rectangle (aspect ratio up to ~1e6)."""
    if angle is None:
        angle = rng.uniform(0, np.pi)
    ux, uy = np.cos(angle), np.sin(angle)
    nx, ny = -uy * thickness / 2, ux * thickness / 2
    hx, hy = ux * length / 2, uy * length / 2
    return Polygon(
        [
            (cx - hx - nx, cy - hy - ny),
            (cx + hx - nx, cy + hy - ny),
            (cx + hx + nx, cy + hy + ny),
            (cx - hx + nx, cy - hy + ny),
        ]
    )


def check_pair(a, b, tol_frac=1e-6, ops=("partition", "union", "symmetry")):
    """Assert the conservation properties for one operand pair."""
    ref = max(a.area, b.area, 1e-30)
    tol = tol_frac * ref
    inter = a.intersection(b)
    if "partition" in ops:
        diff = a.difference(b)
        assert abs(a.area - (inter.area + diff.area)) < tol, (
            "partition: %r vs %r + %r" % (a.area, inter.area, diff.area)
        )
    if "union" in ops:
        union = a.union(b)
        assert abs(union.area - (a.area + b.area - inter.area)) < tol, (
            "incl-excl: %r vs %r" % (union.area, a.area + b.area - inter.area)
        )
    if "symmetry" in ops:
        assert abs(inter.area - b.intersection(a).area) < tol
    # sanity: intersection can't exceed either operand
    assert inter.area <= min(a.area, b.area) + tol
    assert inter.area >= -tol


CHUNKS = 25  # x trials-per-chunk below; ids keep failures reproducible


@pytest.mark.parametrize("chunk", range(CHUNKS))
def test_concave_star_pairs(chunk):
    """20 random concave-vs-concave pairs per chunk (500 total)."""
    rng = np.random.RandomState(1000 + chunk)
    for _ in range(20):
        a = star_polygon(rng, 0, 0, 10, rng.randint(5, 14), r_in_frac=0.15)
        b = star_polygon(
            rng,
            rng.uniform(-9, 9),
            rng.uniform(-9, 9),
            rng.uniform(2, 10),
            rng.randint(5, 14),
            r_in_frac=0.15,
        )
        check_pair(a, b)


@pytest.mark.parametrize("chunk", range(CHUNKS))
def test_grid_snapped_shared_edges(chunk):
    """Integer-grid operands: shared edges, collinear overlaps, and
    vertex-on-vertex contacts everywhere (250 pairs)."""
    rng = np.random.RandomState(2000 + chunk)
    for _ in range(10):
        a = star_polygon(rng, 0, 0, 8, rng.randint(5, 10), round_to=1.0)
        b = star_polygon(
            rng,
            float(rng.randint(-6, 7)),
            float(rng.randint(-6, 7)),
            8,
            rng.randint(5, 10),
            round_to=1.0,
        )
        if a is None or b is None:
            continue
        check_pair(a, b, tol_frac=1e-9)


@pytest.mark.parametrize("chunk", range(CHUNKS))
def test_sliver_crossings(chunk):
    """Slivers (aspect up to 1e5) crossing concave polygons (250 pairs)."""
    rng = np.random.RandomState(3000 + chunk)
    for _ in range(10):
        a = star_polygon(rng, 0, 0, 10, rng.randint(5, 12))
        thickness = 10.0 ** rng.uniform(-4, -1)
        b = sliver(
            rng, rng.uniform(-3, 3), rng.uniform(-3, 3), 25.0, thickness
        )
        # partition on the sliver side exercises tiny-area bookkeeping
        check_pair(b, a, tol_frac=1e-5)


@pytest.mark.parametrize("chunk", range(CHUNKS))
def test_mixed_magnitude_offsets(chunk):
    """Features of size ~10 at coordinate offsets up to 1e7 — the regime
    where absolute-epsilon snapping destroys geometry (250 pairs)."""
    rng = np.random.RandomState(4000 + chunk)
    for _ in range(10):
        off_x = rng.choice([0.0, 1e5, 1e6, 1e7]) * rng.choice([-1, 1])
        off_y = rng.choice([0.0, 1e5, 1e6, 1e7]) * rng.choice([-1, 1])
        a = star_polygon(rng, off_x, off_y, 10, rng.randint(5, 11))
        b = star_polygon(
            rng,
            off_x + rng.uniform(-8, 8),
            off_y + rng.uniform(-8, 8),
            rng.uniform(3, 10),
            rng.randint(5, 11),
        )
        check_pair(a, b, tol_frac=1e-5)


@pytest.mark.parametrize("seed", range(60))
def test_idempotence(seed):
    """A op A for concave, grid-snapped, and sliver shapes."""
    rng = np.random.RandomState(5000 + seed)
    kind = seed % 3
    if kind == 0:
        a = star_polygon(rng, 0, 0, 10, rng.randint(5, 12))
    elif kind == 1:
        a = star_polygon(rng, 0, 0, 8, rng.randint(5, 10), round_to=1.0)
        if a is None:
            return
    else:
        a = sliver(rng, 0, 0, 20.0, 10.0 ** rng.uniform(-4, -1))
    tol = 1e-9 * max(a.area, 1e-30)
    assert abs(a.intersection(a).area - a.area) < tol
    assert abs(a.union(a).area - a.area) < tol
    assert a.difference(a).area < tol


class TestDeterministicAdversarial:
    """Hand-built worst cases; each encodes a known engine failure mode."""

    def test_shared_edge_partial_overlap(self):
        # B's left edge lies ON a's right edge but only over part of it
        a = box(0, 0, 4, 4)
        b = box(4, 1, 8, 3)
        check_pair(a, b, tol_frac=1e-12)
        assert a.intersection(b).area == pytest.approx(0.0, abs=1e-9)
        assert a.union(b).area == pytest.approx(16 + 8, abs=1e-9)

    def test_collinear_overlapping_boundary(self):
        # boxes overlapping in x, so the shared boundary segment of the
        # union is collinear with both operands' edges
        a = box(0, 0, 4, 4)
        b = box(2, 0, 6, 4)  # bottom/top edges collinear with a's
        check_pair(a, b, tol_frac=1e-12)
        assert a.intersection(b).area == pytest.approx(8.0, abs=1e-9)
        assert a.union(b).area == pytest.approx(24.0, abs=1e-9)

    def test_vertex_on_edge_touch(self):
        # triangle vertex touching the interior of a box edge
        a = box(0, 0, 4, 4)
        b = Polygon([(4, 2), (7, 0), (7, 4)])
        check_pair(a, b, tol_frac=1e-9)
        assert a.intersection(b).area == pytest.approx(0.0, abs=1e-9)

    def test_self_touching_ring_operand(self):
        # bowtie expressed as a self-touching simple chain (pinch at 2,2):
        # two triangles meeting at one point, as a MultiPolygon operand
        a = MultiPolygon(
            [
                Polygon([(0, 0), (2, 2), (0, 4)]),
                Polygon([(4, 0), (4, 4), (2, 2)]),
            ]
        )
        b = box(1, 1, 3, 3)
        check_pair(a, b, tol_frac=1e-9)

    def test_pinched_result(self):
        # intersection pinches to a point: two unit squares of A meet B
        # only at the corner (2,2) -> result must be two parts, not one
        a = MultiPolygon([box(0, 0, 2, 2), box(2, 2, 4, 4)])
        b = box(1, 1, 3, 3)
        inter = a.intersection(b)
        assert inter.area == pytest.approx(2.0, abs=1e-9)
        check_pair(a, b, tol_frac=1e-9)

    def test_sliver_thinner_than_probe(self):
        # a sliver whose width (1e-7) is far below the old probe offset;
        # its area must still be conserved through the partition identity
        s = sliver(np.random.RandomState(0), 0, 0, 10.0, 1e-7, angle=0.3)
        a = box(-1, -1, 1, 1)
        inter = s.intersection(a)
        diff = s.difference(a)
        assert abs(s.area - (inter.area + diff.area)) < 1e-9 * s.area

    def test_identical_operands_with_hole(self):
        donut = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10)],
            [[(3, 3), (3, 7), (7, 7), (7, 3)]],
        )
        tol = 1e-9 * donut.area
        assert abs(donut.intersection(donut).area - donut.area) < tol
        assert abs(donut.union(donut).area - donut.area) < tol
        assert donut.difference(donut).area < tol

    def test_hole_exactly_filled(self):
        # B exactly fills A's hole: union has no hole, intersection empty
        donut = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10)],
            [[(3, 3), (3, 7), (7, 7), (7, 3)]],
        )
        plug = box(3, 3, 7, 7)
        union = donut.union(plug)
        assert union.area == pytest.approx(100.0, abs=1e-9)
        assert donut.intersection(plug).area == pytest.approx(0.0, abs=1e-9)

    def test_near_tangent_circles(self):
        # two 64-gon "circles" whose boundaries pass within 1e-9 of each
        # other: classification must not flip-flop along the near-tangency
        t = np.linspace(0, 2 * np.pi, 65)[:-1]
        a = Polygon(np.column_stack([np.cos(t) * 5, np.sin(t) * 5]))
        b = Polygon(
            np.column_stack([np.cos(t) * 5 + 10 - 1e-9, np.sin(t) * 5])
        )
        check_pair(a, b, tol_frac=1e-6)

    def test_mixed_magnitude_exact(self):
        # unit squares at offset 1e7: results must survive the magnitude
        a = box(1e7, 1e7, 1e7 + 2, 1e7 + 2)
        b = box(1e7 + 1, 1e7 + 1, 1e7 + 3, 1e7 + 3)
        assert a.intersection(b).area == pytest.approx(1.0, rel=1e-9)
        assert a.union(b).area == pytest.approx(7.0, rel=1e-9)
        assert a.difference(b).area == pytest.approx(3.0, rel=1e-9)

    def test_concave_spike_through(self):
        # a needle-thin concave spike of A reaching through B
        a = Polygon(
            [(0, 0), (10, 0), (10, 1), (5.001, 0.5), (5, 8), (4.999, 0.5), (0, 1)]
        )
        b = box(3, 2, 7, 6)
        check_pair(a, b, tol_frac=1e-6)

    def test_checkerboard_shared_corners(self):
        # 2x2 checkerboard vs its complement: all contact is shared
        # edges/corners; union is the full square, intersection empty
        a = MultiPolygon([box(0, 0, 1, 1), box(1, 1, 2, 2)])
        b = MultiPolygon([box(1, 0, 2, 1), box(0, 1, 1, 2)])
        assert a.intersection(b).area == pytest.approx(0.0, abs=1e-9)
        assert a.union(b).area == pytest.approx(4.0, abs=1e-9)
        assert a.difference(b).area == pytest.approx(a.area, abs=1e-9)
