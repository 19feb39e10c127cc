"""MapInfo Interchange Format (MIF/MID) reader and writer.

The reference reads MapInfo files through OGR's MapInfo driver
(reference geometry/sources.py:95 accepts any pyogrio-readable format).
Here the text interchange flavour is parsed natively: the MIF header
(Version/Delimiter/Columns/CoordSys), the geometry section (Point,
Multipoint, Line, Pline [Multiple], Region, Rect, none), and the MID
attribute rows.  Binary ``.tab`` files are out of scope — MapInfo's own
tooling and GDAL both export MIF ("Save Copy As"), which is the
interchange path.

CoordSys: ``Earth Projection 1, <datum>`` (longlat) maps to EPSG:4326
for WGS84-family datums; other CoordSys lines are preserved verbatim in
``frame.crs`` so round trips keep them.
"""
import os

import numpy as np

__all__ = ["read_mif", "write_mif"]


def _parse_coordsys(line):
    body = line.split(None, 1)[1].strip() if " " in line else ""
    parts = [p.strip() for p in body.replace(",", " ").split()]
    if (
        len(parts) >= 3
        and parts[0].lower() == "earth"
        and parts[1].lower() == "projection"
        and parts[2] == "1"
    ):
        return "EPSG:4326"
    return line.strip() or "EPSG:4326"


def _coords(tokens):
    return [
        (float(tokens[k]), float(tokens[k + 1]))
        for k in range(0, len(tokens), 2)
    ]


def _point_in_ring(point, ring):
    """Even-odd crossing test of ``point`` against a coordinate ring."""
    x, y = point
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        if (y1 > y) != (y2 > y):
            x_cross = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < x_cross:
                inside = not inside
    return inside


def _region_to_geometry(rings):
    """MIF Region rings -> Polygon/MultiPolygon by even-odd containment.

    MapInfo Regions list every ring of every part flat; a ring contained
    in an odd number of other rings is a hole of its innermost
    container, otherwise it is a part's exterior (GDAL's grouping).
    """
    from dask_geomodeling_tpu.geo.geometry import MultiPolygon, Polygon

    if len(rings) == 1:
        return Polygon(rings[0])
    containers = []
    for index, ring in enumerate(rings):
        inside = [
            other
            for other in range(len(rings))
            if other != index and _point_in_ring(ring[0], rings[other])
        ]
        containers.append(inside)
    exteriors = [i for i, inside in enumerate(containers) if len(inside) % 2 == 0]
    holes_of = {i: [] for i in exteriors}
    for index, inside in enumerate(containers):
        if len(inside) % 2 == 1:
            # hole of its innermost containing exterior (the container
            # itself contained by the most rings)
            parents = [i for i in inside if i in holes_of]
            if parents:
                parent = max(parents, key=lambda i: len(containers[i]))
                holes_of[parent].append(rings[index])
    parts = [
        Polygon(rings[i], holes_of[i] or None) for i in exteriors
    ]
    if len(parts) == 1:
        return parts[0]
    return MultiPolygon(parts)


_MIF_TYPES = {
    "integer": "int64",
    "smallint": "int64",
    "float": "float64",
    "decimal": "float64",
    "char": "object",
    "date": "object",
    "logical": "bool",
}


def read_mif(path):
    """Read a MIF (+ optional MID) file into a GeoDataFrame."""
    import pandas as pd

    from dask_geomodeling_tpu.geo.features import GeoDataFrame
    from dask_geomodeling_tpu.geo.geometry import (
        LineString,
        MultiLineString,
        MultiPoint,
        Point,
        Polygon,
        box,
    )

    with open(path, errors="replace") as stream:
        lines = stream.read().splitlines()
    pos = 0
    delimiter = "\t"
    columns = []
    crs = "EPSG:4326"
    while pos < len(lines):
        stripped = lines[pos].strip()
        lowered = stripped.lower()
        if lowered.startswith("delimiter"):
            quoted = stripped.split(None, 1)[1].strip()
            delimiter = quoted.strip("\"'") or "\t"
        elif lowered.startswith("coordsys"):
            crs = _parse_coordsys(stripped)
        elif lowered.startswith("columns"):
            count = int(stripped.split()[1])
            for k in range(count):
                pos += 1
                name, ctype = lines[pos].split(None, 1)
                base = ctype.split("(")[0].strip().lower()
                columns.append((name, _MIF_TYPES.get(base, "object")))
        elif lowered == "data":
            pos += 1
            break
        pos += 1

    geometries = []

    def read_counted_sections(n_sections):
        rings = []
        nonlocal pos
        for _ in range(n_sections):
            count = int(lines[pos].split()[0])
            pos += 1
            points = []
            while len(points) < count:
                points.extend(_coords(lines[pos].split()))
                pos += 1
            rings.append(points)
        return rings

    while pos < len(lines):
        tokens = lines[pos].split()
        pos += 1
        if not tokens:
            continue
        kind = tokens[0].lower()
        if kind == "point":
            geometries.append(Point(float(tokens[1]), float(tokens[2])))
        elif kind == "multipoint":
            count = int(tokens[1])
            points = []
            while len(points) < count:
                points.extend(_coords(lines[pos].split()))
                pos += 1
            geometries.append(MultiPoint([Point(*p) for p in points]))
        elif kind == "line":
            geometries.append(
                LineString(
                    [
                        (float(tokens[1]), float(tokens[2])),
                        (float(tokens[3]), float(tokens[4])),
                    ]
                )
            )
        elif kind == "pline":
            if len(tokens) >= 3 and tokens[1].lower() == "multiple":
                parts = read_counted_sections(int(tokens[2]))
                geometries.append(
                    MultiLineString([LineString(p) for p in parts])
                )
            else:
                # the count may sit on this line or the next
                if len(tokens) > 1:
                    count = int(tokens[1])
                else:
                    count = int(lines[pos].split()[0])
                    pos += 1
                points = []
                while len(points) < count:
                    points.extend(_coords(lines[pos].split()))
                    pos += 1
                geometries.append(LineString(points))
        elif kind == "region":
            rings = read_counted_sections(int(tokens[1]))
            geometries.append(_region_to_geometry(rings))
        elif kind == "rect":
            x1, y1, x2, y2 = (float(v) for v in tokens[1:5])
            geometries.append(box(min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)))
        elif kind == "none":
            geometries.append(None)
        # styling clauses (Pen/Brush/Symbol/Smooth/Center) are skipped
        elif kind in ("pen", "brush", "symbol", "smooth", "center"):
            continue

    # attributes from the MID sidecar
    records = None
    if columns:
        mid = None
        base, _ = os.path.splitext(path)
        for ext in (".mid", ".MID"):
            if os.path.exists(base + ext):
                mid = base + ext
                break
        rows = []
        if mid is not None:
            import csv

            with open(mid, newline="", errors="replace") as handle:
                reader = csv.reader(
                    handle, delimiter=delimiter, quotechar='"'
                )
                for values in reader:
                    if not values:
                        continue
                    row = {}
                    for (name, ctype), value in zip(columns, values):
                        value = value.strip()
                        if ctype == "int64":
                            row[name] = int(value) if value else 0
                        elif ctype == "float64":
                            row[name] = float(value) if value else np.nan
                        elif ctype == "bool":
                            row[name] = value.upper() in ("T", "TRUE", "1")
                        else:
                            row[name] = value
                    rows.append(row)
        records = pd.DataFrame.from_records(rows) if rows else pd.DataFrame(
            {name: pd.Series(dtype=ctype) for name, ctype in columns}
        )

    return GeoDataFrame(records, geometry=geometries, crs=crs)


def _mif_column_type(series):
    kind = series.dtype.kind
    if kind == "b":
        return "Logical"
    if kind in "iu":
        return "Integer"
    if kind == "f":
        return "Float"
    return "Char(254)"


def _geometry_section(geom):
    if geom is None:
        return ["None"]
    kind = geom.geom_type
    if kind == "Point":
        return ["Point %.10g %.10g" % (geom.x, geom.y)]
    if kind == "MultiPoint":
        pts = list(geom.geoms)
        out = ["Multipoint %d" % len(pts)]
        out += ["%.10g %.10g" % (p.x, p.y) for p in pts]
        return out
    if kind == "LineString":
        coords = list(geom.coords)
        out = ["Pline %d" % len(coords)]
        out += ["%.10g %.10g" % (x, y) for x, y in coords]
        return out
    if kind == "MultiLineString":
        parts = list(geom.geoms)
        out = ["Pline Multiple %d" % len(parts)]
        for part in parts:
            coords = list(part.coords)
            out.append("%d" % len(coords))
            out += ["%.10g %.10g" % (x, y) for x, y in coords]
        return out
    if kind == "Polygon":
        rings = [list(geom.exterior.coords)] + [
            list(ring.coords) for ring in geom.interiors
        ]
        out = ["Region %d" % len(rings)]
        for ring in rings:
            out.append("%d" % len(ring))
            out += ["%.10g %.10g" % (x, y) for x, y in ring]
        return out
    if kind == "MultiPolygon":
        rings = []
        for poly in geom.geoms:
            rings.append(list(poly.exterior.coords))
            rings.extend(list(r.coords) for r in poly.interiors)
        out = ["Region %d" % len(rings)]
        for ring in rings:
            out.append("%d" % len(ring))
            out += ["%.10g %.10g" % (x, y) for x, y in ring]
        return out
    raise NotImplementedError("MIF cannot store %s" % kind)


def write_mif(frame, path):
    """Write a GeoDataFrame as MIF + MID."""
    crs = getattr(frame, "crs", None) or "EPSG:4326"
    try:
        from dask_geomodeling_tpu.geo.crs import get_sr

        earth = get_sr(crs).is_geographic
    except Exception:
        earth = False
    coordsys = (
        "CoordSys Earth Projection 1, 104"
        if earth
        else str(crs)
        if str(crs).lower().startswith("coordsys")
        else "CoordSys NonEarth Units \"m\""
    )

    fields = [c for c in frame.columns if c != "geometry"]
    lines = [
        "Version 300",
        'Charset "Neutral"',
        'Delimiter ","',
        coordsys,
        "Columns %d" % len(fields),
    ]
    for name in fields:
        lines.append("  %s %s" % (name, _mif_column_type(frame[name])))
    lines.append("Data")
    lines.append("")
    for geom in frame.geometry:
        lines.extend(_geometry_section(geom))
    with open(path, "w") as stream:
        stream.write("\n".join(lines) + "\n")

    import csv

    base, _ = os.path.splitext(path)
    with open(base + ".mid", "w", newline="") as f:
        writer = csv.writer(f, delimiter=",", quotechar='"',
                            quoting=csv.QUOTE_MINIMAL)
        for _, row in frame.iterrows():
            out = []
            for name in fields:
                value = row[name]
                if isinstance(value, str):
                    out.append(value)
                elif isinstance(value, (bool, np.bool_)):
                    out.append("T" if value else "F")
                elif value is None or (
                    isinstance(value, float) and np.isnan(value)
                ):
                    out.append("")
                else:
                    out.append(str(value))
            writer.writerow(out)
