"""Planar boolean overlay: intersection / union / difference.

Replaces shapely/GEOS set operations used throughout the reference
(e.g. reference geometry/set_operations.py:60-118 and
geometry/parallelize.py tile clipping). Matches GEOS semantics for valid
inputs; results on invalid (self-intersecting) polygons are undefined,
as in GEOS.

Algorithm (robust for polygons with holes, including shared edges):

1. Split every boundary edge of A at its intersections with B's edges (and
   vice versa), producing fragments.
2. A fragment lies on the boundary of the result iff the result-region
   membership ``R(p) = inA(p) <op> inB(p)`` differs between the two sides of
   the fragment (sampled a small epsilon along the fragment normal).  This
   uniform rule handles collinear shared edges and tangencies without
   special cases.
3. Deduplicate fragments and stitch them into closed rings; build the ring
   containment tree to assign exteriors and holes.

Non-areal inputs: points are classified directly; linestrings are clipped by
splitting at polygon boundaries and keeping inside fragments.
"""
import numpy as np

from dask_geomodeling_tpu.geo.geometry import (
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    _point_in_ring,
    _points_of,
    _polygonize,
    _ring_area,
)

_OPS = {
    "intersection": lambda a, b: a and b,
    "union": lambda a, b: a or b,
    "difference": lambda a, b: a and not b,
}


def overlay(a, b, op):
    """Compute the boolean overlay of two geometries."""
    rule = _OPS[op]
    polys_a = _polygonize(a)
    polys_b = _polygonize(b)

    # non-areal subjects: points / lines against polygons
    if not polys_a and (_points_of(a) or _is_lineal(a)):
        return _overlay_nonareal(a, polys_b, op)
    if not polys_b and op == "intersection" and (_points_of(b) or _is_lineal(b)):
        return _overlay_nonareal(b, polys_a, "intersection")

    # empty shortcuts
    if not polys_a:
        if op == "union":
            return b
        return Polygon()
    if not polys_b:
        if op == "intersection":
            return Polygon()
        return a if len(polys_a) > 1 or isinstance(a, MultiPolygon) else polys_a[0]

    rings_a = [r for p in polys_a for r in p._rings()]
    rings_b = [r for p in polys_b for r in p._rings()]

    scale = max(
        abs(v) for g in (a, b) for v in g.bounds
    ) or 1.0
    eps = 1e-9 * scale

    frags = _split_rings(rings_a, rings_b) + _split_rings(rings_b, rings_a)

    def in_result(px, py):
        return rule(
            _even_odd(px, py, rings_a), _even_odd(px, py, rings_b)
        )

    kept = {}
    for p, q in frags:
        mx, my = (p[0] + q[0]) / 2.0, (p[1] + q[1]) / 2.0
        dx, dy = q[0] - p[0], q[1] - p[1]
        norm = np.hypot(dx, dy)
        if norm < eps:
            continue
        nx, ny = -dy / norm * eps, dx / norm * eps
        left = in_result(mx + nx, my + ny)
        right = in_result(mx - nx, my - ny)
        if left == right:
            continue
        # orient so the result interior is on the left
        if right:
            p, q = q, p
        key = (_snap(p, eps), _snap(q, eps))
        kept[key] = (p, q)

    rings = _stitch(list(kept.values()), eps)
    return _assemble(rings)


def _is_lineal(geom):
    return isinstance(geom, (LineString, MultiLineString)) or (
        isinstance(geom, GeometryCollection)
        and any(isinstance(g, (LineString, MultiLineString)) for g in geom.geoms)
    )


def _overlay_nonareal(geom, polys, op):
    """Overlay of a point/line subject with an areal geometry.

    ``intersection`` keeps the parts inside, ``difference`` the parts
    outside (lines split at the polygon boundary either way); ``union``
    is the areal geometry plus the outside parts, as a collection.
    """

    def inside(px, py):
        return any(p.contains_point(px, py) for p in polys)

    def collect(keep):
        pts = [Point(px, py) for px, py in _points_of(geom) if keep(px, py)]
        lines = []
        for part in _lines_of(geom):
            lines.extend(_clip_line(part, polys, keep))
        if pts and not lines:
            return pts[0] if len(pts) == 1 else MultiPoint(pts)
        if lines and not pts:
            return lines[0] if len(lines) == 1 else MultiLineString(lines)
        if pts and lines:
            return GeometryCollection(pts + lines)
        return Polygon()  # empty

    if op == "intersection":
        return collect(inside)
    if op == "difference":
        return collect(lambda px, py: not inside(px, py))
    if op == "union":
        outside = collect(lambda px, py: not inside(px, py))
        if isinstance(outside, Polygon) and outside.is_empty:
            parts = list(polys)
        else:
            lineal = (
                list(outside.geoms)
                if isinstance(outside, (MultiPoint, MultiLineString, GeometryCollection))
                else [outside]
            )
            parts = list(polys) + lineal
        if len(parts) == 1:
            return parts[0]
        return GeometryCollection(parts)
    raise NotImplementedError("Unsupported non-areal overlay: %s" % op)


def _lines_of(geom):
    if isinstance(geom, LineString):
        return [geom.coordinates]
    if isinstance(geom, MultiLineString):
        return [g.coordinates for g in geom.geoms]
    if isinstance(geom, GeometryCollection):
        return [c for g in geom.geoms for c in _lines_of(g)]
    return []


def _clip_line(coords, polys, inside):
    """Clip a linestring's coordinates to the inside of polygons."""
    rings = [r for p in polys for r in p._rings()]
    pieces = []
    current = []
    for i in range(len(coords) - 1):
        p, q = coords[i], coords[i + 1]
        ts = [0.0, 1.0]
        for ring in rings:
            ts.extend(_edge_intersections(p, q, ring))
        ts = sorted(set(np.clip(ts, 0.0, 1.0)))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 < 1e-12:
                continue
            mid_t = (t0 + t1) / 2.0
            mx, my = p + (q - p) * mid_t
            a = p + (q - p) * t0
            b = p + (q - p) * t1
            if inside(mx, my):
                if current and np.allclose(current[-1], a):
                    current.append(b)
                else:
                    if len(current) >= 2:
                        pieces.append(LineString(np.array(current)))
                    current = [a, b]
    if len(current) >= 2:
        pieces.append(LineString(np.array(current)))
    return pieces


def _even_odd(px, py, rings):
    inside = False
    for ring in rings:
        if _point_in_ring(px, py, ring):
            inside = not inside
    return inside


def _snap(p, eps):
    return (round(p[0] / eps) * eps, round(p[1] / eps) * eps)


def _edge_intersections(p, q, ring):
    """Parameters t in (0, 1) where segment p->q crosses ring edges."""
    ts = []
    d = q - p
    a = ring[:-1]
    b = ring[1:]
    e = b - a
    denom = d[0] * e[:, 1] - d[1] * e[:, 0]
    diff = a - p
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (diff[:, 0] * e[:, 1] - diff[:, 1] * e[:, 0]) / denom
        u = (diff[:, 0] * d[1] - diff[:, 1] * d[0]) / denom
    valid = (np.abs(denom) > 1e-15) & (t > 1e-12) & (t < 1 - 1e-12) & (u >= -1e-12) & (
        u <= 1 + 1e-12
    )
    ts.extend(t[valid].tolist())
    # collinear overlaps: project the other edge's endpoints onto p->q
    denom_len = d[0] ** 2 + d[1] ** 2
    if denom_len > 0:
        collinear = np.abs(denom) <= 1e-15
        if collinear.any():
            for idx in np.nonzero(collinear)[0]:
                for pt in (a[idx], b[idx]):
                    cross = d[0] * (pt[1] - p[1]) - d[1] * (pt[0] - p[0])
                    if abs(cross) < 1e-9 * np.sqrt(denom_len):
                        tt = ((pt[0] - p[0]) * d[0] + (pt[1] - p[1]) * d[1]) / denom_len
                        if 1e-12 < tt < 1 - 1e-12:
                            ts.append(float(tt))
    return ts


def _split_rings(rings, other_rings):
    """Split every edge of ``rings`` at intersections with ``other_rings``."""
    frags = []
    for ring in rings:
        for i in range(len(ring) - 1):
            p, q = ring[i], ring[i + 1]
            ts = [0.0, 1.0]
            for other in other_rings:
                ts.extend(_edge_intersections(p, q, other))
            ts = sorted(set(ts))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 < 1e-12:
                    continue
                frags.append((p + (q - p) * t0, p + (q - p) * t1))
    return frags


def _stitch(fragments, eps):
    """Stitch directed fragments into closed rings."""
    start_map = {}
    for idx, (p, q) in enumerate(fragments):
        start_map.setdefault(_snap(p, eps), []).append(idx)
    used = [False] * len(fragments)
    rings = []
    for i in range(len(fragments)):
        if used[i]:
            continue
        chain = [fragments[i][0], fragments[i][1]]
        used[i] = True
        guard = 0
        while guard < len(fragments) + 1:
            guard += 1
            key = _snap(chain[-1], eps)
            candidates = [j for j in start_map.get(key, []) if not used[j]]
            if not candidates:
                break
            j = candidates[0]
            used[j] = True
            chain.append(fragments[j][1])
            if _snap(chain[-1], eps) == _snap(chain[0], eps):
                break
        if len(chain) >= 4 and _snap(chain[-1], eps) == _snap(chain[0], eps):
            ring = np.array(chain[:-1] + [chain[0]])
            if abs(_ring_area(ring)) > eps * eps:
                rings.append(ring)
    return rings


def _assemble(rings):
    """Build (Multi)Polygon from rings using containment depth."""
    if not rings:
        return Polygon()
    # depth = number of other rings containing a representative vertex
    depths = []
    for i, ring in enumerate(rings):
        px, py = ring[0]
        # offset slightly inward to avoid vertex-on-vertex ambiguity
        cx, cy = ring[:-1].mean(axis=0)
        px = px + (cx - px) * 1e-9
        py = py + (cy - py) * 1e-9
        depth = sum(
            1
            for j, other in enumerate(rings)
            if j != i and _point_in_ring(px, py, other)
        )
        depths.append(depth)

    exteriors = [i for i, d in enumerate(depths) if d % 2 == 0]
    holes = [i for i, d in enumerate(depths) if d % 2 == 1]

    polys = []
    for i in exteriors:
        shell = rings[i]
        if _ring_area(shell) < 0:
            shell = shell[::-1]
        my_holes = []
        for j in holes:
            px, py = rings[j][:-1].mean(axis=0)
            if _point_in_ring(px, py, rings[i]) and depths[j] == depths[i] + 1:
                hole = rings[j]
                if _ring_area(hole) > 0:
                    hole = hole[::-1]
                my_holes.append(hole)
        polys.append(Polygon(shell, my_holes))

    if len(polys) == 1:
        return polys[0]
    return MultiPolygon(polys)
