"""Generate the compact EPSG parameter table (geo/epsg.json.gz).

Reads PROJ's EPSG database (``/usr/share/proj/proj.db``, a SQLite file
shipped with the PROJ CLI tools in this image) ONCE at development time and
emits a few-hundred-KB table the runtime registry (geo/_epsg_registry.py)
resolves codes from without any external dependency.  This is the
data-driven replacement for the reference's "PROJ resolves any EPSG code"
behavior (reference: dask_geomodeling/utils.py:396-473).

Emitted structure (gzip JSON)::

    {
      "geographic": {code: [name, a, rf, helmert7_or_null, pm_deg,
                            deg_factor]},
      "projected":  {code: [name, geod_code, method_key,
                            {param: value}, unit_factor, sx, sy]},
      "unsupported": {code: method_name},   # actionable error text
    }

- angles are degrees, lengths metres, helmert is position-vector
  (tx, ty, tz [m], rx, ry, rz [arcsec], ds [ppm]) toward WGS84
- method_key / param names are exactly what crs._build_projection consumes
- unit_factor: metres per projected-axis unit (1.0 for metric grids)
- sx / sy: +-1 axis signs (south/west orientated grids)
- pm_deg: prime meridian in Greenwich degrees; projection longitude
  parameters stay relative to it (the loader adds pm back)
- deg_factor: degrees per geographic-axis unit (0.9 for grads);
  trailing defaults (1.0) are omitted from rows

Run: ``python tools/gen_epsg_registry.py [proj.db path]``
"""
import gzip
import json
import math
import os
import sqlite3
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "dask_geomodeling_tpu", "geo", "epsg.json.gz")

#: proj.db conversion-method name -> crs._build_projection method key.
#: None marks methods knowingly out of scope: they land in "unsupported"
#: with the method named in the runtime error.
METHOD_MAP = {
    "Transverse Mercator": "transverse_mercator",
    "Transverse Mercator (South Orientated)": "transverse_mercator",
    "Lambert Conic Conformal (2SP)": "lambert_conformal_conic_2sp",
    "Lambert Conic Conformal (1SP)": "lambert_conformal_conic_1sp",
    "Lambert Conic Conformal (West Orientated)": (
        "lambert_conformal_conic_1sp"
    ),
    "Albers Equal Area": "albers_conic_equal_area",
    "Cassini-Soldner": "cassini_soldner",
    "Polar Stereographic (variant A)": "polar_stereographic",
    "Polar Stereographic (variant B)": "polar_stereographic",
    "Hotine Oblique Mercator (variant A)": (
        "hotine_oblique_mercator_variant_a"
    ),
    "Hotine Oblique Mercator (variant B)": (
        "hotine_oblique_mercator_variant_b"
    ),
    "Oblique Stereographic": "oblique_stereographic",
    "Lambert Azimuthal Equal Area": "lambert_azimuthal_equal_area",
    "Lambert Azimuthal Equal Area (Spherical)": (
        "lambert_azimuthal_equal_area"
    ),
    "Mercator (variant A)": "mercator_1sp",
    "Mercator (variant B)": "mercator_2sp",
    "Mercator (1SP) (Spherical)": "mercator_1sp",
    "American Polyconic": "polyconic",
    "Krovak (North Orientated)": "krovak_east_north",
    "Krovak": "krovak_east_north",  # axis signs supply the S-W orientation
    "Equal Earth": "equal_earth",
    "Bonne": "bonne",
    "Bonne (South Orientated)": "bonne",
    "Popular Visualisation Pseudo Mercator": (
        "popular_visualisation_pseudo_mercator"
    ),
    "New Zealand Map Grid": "new_zealand_map_grid",
    "Modified Azimuthal Equidistant": "azimuthal_equidistant",
    "Lambert Cylindrical Equal Area": "cylindrical_equal_area",
    "Lambert Cylindrical Equal Area (Spherical)": "cylindrical_equal_area",
    "Equidistant Cylindrical": "equidistant_cylindrical",
    "Equidistant Cylindrical (Spherical)": "equidistant_cylindrical",
    "Sinusoidal": "sinusoidal",
    "Mollweide": "mollweide",
    # round-4 additions: the five methods behind 44 of the 53 codes the
    # first registry generation left unsupported
    "Colombia Urban": "colombia_urban",
    "Lambert Conic Conformal (2SP Michigan)": (
        "lambert_conformal_conic_2sp_michigan"
    ),
    "Lambert Conic Conformal (2SP Belgium)": (
        "lambert_conformal_conic_2sp_belgium"
    ),
    "Krovak Modified": "krovak_modified",
    "Krovak Modified (North Orientated)": "krovak_modified_north",
    "Polar Stereographic (variant C)": "polar_stereographic_variant_c",
    # round-5 additions: the last exotic methods (worked-example pinned
    # where PROJ cannot express them — Near-Conformal, Tunisia, Zoned)
    "Transverse Mercator Zoned Grid System": (
        "transverse_mercator_zoned_grid_system"
    ),
    "Transverse Mercator 3D": "transverse_mercator",
    "Lambert Conic Near-Conformal": "lambert_conic_near_conformal",
    "Laborde Oblique Mercator": "laborde_oblique_mercator",
    "Tunisia Mining Grid": "tunisia_mining_grid",
    "Guam Projection": "guam_projection",
    "Hyperbolic Cassini-Soldner": "hyperbolic_cassini_soldner",
}

#: proj.db parameter names -> _build_projection parameter keys (applied
#: after crs._wkt_param_name, which already handles the WKT2 spellings)
EXTRA_PARAMS = {
    "longitude_of_origin": "central_meridian",
    "co-latitude_of_cone_axis": "azimuth",
    "spherical_latitude_of_origin": "latitude_of_origin",
    "spherical_longitude_of_origin": "central_meridian",
    "initial_longitude": "central_meridian",
}

#: geodetic CRSes treated as WGS84-coincident at this framework's accuracy
#: (modern ITRF-aligned frames; matches the hand registry's convention)
WGS84_HUBS = {
    4326, 4258, 4269, 4283, 4617, 4674, 4612, 6668, 7844, 4759, 6318,
    4148, 4173, 4619, 8999, 9000, 9990, 9989, 7912, 7930, 4936, 4937,
}


def sexagesimal_to_degrees(value):
    """EPSG uom 9110: DDD.MMSSsss -> decimal degrees."""
    sign = -1.0 if value < 0 else 1.0
    total = round(abs(value) * 1e10)
    deg = total // 10**10
    rest = total % 10**10
    minutes = rest // 10**8
    seconds = (rest % 10**8) / 1e6
    return sign * (deg + minutes / 60.0 + seconds / 3600.0)


class Units:
    def __init__(self, cur):
        self.table = {
            (auth, str(code)): (name, factor, type_)
            for auth, code, name, factor, type_ in cur.execute(
                "SELECT auth_name, code, name, conv_factor, type"
                " FROM unit_of_measure"
            )
        }

    def angle_deg(self, value, auth, code):
        if (auth, str(code)) == ("EPSG", "9110"):
            return sexagesimal_to_degrees(value)
        name, factor, type_ = self.table[(auth, str(code))]
        assert type_ == "angle", (name, type_)
        return value * factor * 180.0 / math.pi

    def length_m(self, value, auth, code):
        name, factor, type_ = self.table[(auth, str(code))]
        assert type_ == "length", (name, type_)
        return value * factor

    def scale(self, value, auth, code):
        name, factor, type_ = self.table[(auth, str(code))]
        assert type_ == "scale", (name, type_)
        return value * factor  # unity -> 1, ppm -> 1e-6

    def factor(self, auth, code):
        return self.table[(auth, str(code))][1]

    def name(self, auth, code):
        return self.table[(auth, str(code))][0]

    def type(self, auth, code):
        return self.table[(auth, str(code))][2]


def normalized_helmert(row, units):
    """(tx, ty, tz [m], rx, ry, rz [arcsec], ds [ppm]) position-vector, or
    None when the row cannot be normalized."""
    method = row["method_name"] or ""
    tx = units.length_m(
        row["tx"], row["translation_uom_auth_name"],
        row["translation_uom_code"],
    )
    ty = units.length_m(
        row["ty"], row["translation_uom_auth_name"],
        row["translation_uom_code"],
    )
    tz = units.length_m(
        row["tz"], row["translation_uom_auth_name"],
        row["translation_uom_code"],
    )
    if row["rx"] is None:
        rx = ry = rz = 0.0
    else:
        to_arcsec = (
            units.factor(
                row["rotation_uom_auth_name"], row["rotation_uom_code"]
            )
            * 180.0 * 3600.0 / math.pi
        )
        rx = row["rx"] * to_arcsec
        ry = row["ry"] * to_arcsec
        rz = row["rz"] * to_arcsec
    if row["scale_difference"] is None:
        ds = 0.0
    else:
        ds = (
            row["scale_difference"]
            * units.factor(
                row["scale_difference_uom_auth_name"],
                row["scale_difference_uom_code"],
            )
            * 1e6
        )
    if "Coordinate Frame" in method or "(CF " in method:
        rx, ry, rz = -rx, -ry, -rz  # -> position vector convention
    params = [tx, ty, tz, rx, ry, rz, ds]
    if row["px"] is not None:
        # Molodensky-Badekas: fold the pivot into equivalent translations
        # X' = T + (1+ds) R (X - P) + P  =>  T_eq = T + P - (1+ds) R P
        to_m = units.factor(
            row["pivot_uom_auth_name"], row["pivot_uom_code"]
        )
        px, py, pz = (row[k] * to_m for k in ("px", "py", "pz"))
        s = 1.0 + ds * 1e-6
        arc = math.pi / (180.0 * 3600.0)
        rxr, ryr, rzr = rx * arc, ry * arc, rz * arc
        # position-vector small-angle rotation applied to the pivot
        rpx = s * (px - rzr * py + ryr * pz)
        rpy = s * (rzr * px + py - rxr * pz)
        rpz = s * (-ryr * px + rxr * py + pz)
        params[0] = tx + px - rpx
        params[1] = ty + py - rpy
        params[2] = tz + pz - rpz
    return [round(v, 9) for v in params]


def build_helmert_graph(cur, units):
    """geodetic code -> best position-vector helmert to WGS84, composed by
    parameter addition along the shortest (hops, accuracy) path (exact only
    at hop 1; beyond that the small-angle composition error is sub-mm)."""
    cur.row_factory = sqlite3.Row
    rows = cur.execute(
        """
        SELECT h.*, m.name AS method_name
        FROM helmert_transformation_table h
        LEFT JOIN coordinate_operation_method m
          ON m.auth_name = h.method_auth_name AND m.code = h.method_code
        WHERE h.deprecated = 0
          AND h.source_crs_auth_name = 'EPSG'
          AND h.target_crs_auth_name = 'EPSG'
        """
    ).fetchall()
    edges = {}  # source -> [(target, params, accuracy)]
    for row in rows:
        try:
            params = normalized_helmert(row, units)
        except (KeyError, AssertionError, TypeError):
            continue
        accuracy = row["accuracy"] if row["accuracy"] is not None else 999.0
        src = int(row["source_crs_code"])
        dst = int(row["target_crs_code"])
        edges.setdefault(src, []).append((dst, params, accuracy))
        edges.setdefault(dst, []).append(
            (src, [-v for v in params], accuracy)
        )
    # hubs reach WGS84 with the identity
    for hub in WGS84_HUBS:
        edges.setdefault(hub, []).append((4326, [0.0] * 7, 0.0))
    _add_other_transformation_edges(cur, units, edges)
    return _paths_to_wgs84(edges)


def _add_other_transformation_edges(cur, units, edges):
    """Edges from the non-helmert transformation table:

    - "Longitude rotation" ops (Tokyo 1892 -> Korean 1985, Bern (Bern) ->
      CH1903, Ferro variants): identity datum edges -- this pipeline
      already normalizes longitudes to Greenwich, so the rotation is a
      pure prime-meridian relabel.
    - "Geographic2D [with Height] offsets" (small-island datums like
      Anguilla 1957): converted to the equivalent geocentric translation
      at the op's area-of-use center (second-order exact over the
      island-scale extents these are defined for).
    """
    centers = {}
    for code, w, e, s, n in cur.execute(
        """
        SELECT u.object_code, x.west_lon, x.east_lon, x.south_lat,
               x.north_lat
        FROM usage u JOIN extent x
          ON x.auth_name = u.extent_auth_name AND x.code = u.extent_code
        WHERE u.object_table_name = 'other_transformation'
          AND u.object_auth_name = 'EPSG'
        """
    ):
        if None in (w, e, s, n):
            continue
        if e < w:
            e += 360.0
        centers[int(code)] = ((w + e) / 2.0, (s + n) / 2.0)

    for row in cur.execute(
        """
        SELECT * FROM other_transformation
        WHERE deprecated = 0
          AND source_crs_auth_name = 'EPSG'
          AND target_crs_auth_name = 'EPSG'
          AND method_name IN ('Longitude rotation', 'Geographic2D offsets',
                              'Geographic2D with Height Offsets')
        """
    ).fetchall():
        src = int(row["source_crs_code"])
        dst = int(row["target_crs_code"])
        accuracy = row["accuracy"] if row["accuracy"] is not None else 999.0
        if row["method_name"] == "Longitude rotation":
            params = [0.0] * 7
        else:
            center = centers.get(int(row["code"]))
            if center is None:
                continue
            offsets = {"Latitude offset": 0.0, "Longitude offset": 0.0,
                       "Vertical Offset": 0.0, "Geoid undulation": 0.0}
            try:
                for i in range(1, 8):
                    pname = row["param%d_name" % i]
                    if pname is None:
                        continue
                    value, uom_auth, uom_code = (
                        row["param%d_value" % i],
                        row["param%d_uom_auth_name" % i],
                        row["param%d_uom_code" % i],
                    )
                    if pname in ("Latitude offset", "Longitude offset"):
                        offsets[pname] = math.radians(
                            units.angle_deg(value, uom_auth, uom_code)
                        )
                    elif pname in ("Vertical Offset", "Geoid undulation"):
                        offsets[pname] = units.length_m(
                            value, uom_auth, uom_code
                        )
            except (KeyError, AssertionError):
                continue
            a = 6378137.0  # ENU scaling: ellipsoid choice is sub-mm here
            lon_c, lat_c = (math.radians(v) for v in center)
            de = offsets["Longitude offset"] * math.cos(lat_c) * a
            dn = offsets["Latitude offset"] * a
            du = offsets["Vertical Offset"]
            sin_lon, cos_lon = math.sin(lon_c), math.cos(lon_c)
            sin_lat, cos_lat = math.sin(lat_c), math.cos(lat_c)
            params = [
                -sin_lon * de - sin_lat * cos_lon * dn + cos_lat * cos_lon * du,
                cos_lon * de - sin_lat * sin_lon * dn + cos_lat * sin_lon * du,
                cos_lat * dn + sin_lat * du,
                0.0, 0.0, 0.0, 0.0,
            ]
        edges.setdefault(src, []).append((dst, params, accuracy))
        edges.setdefault(dst, []).append(
            (src, [-v for v in params], accuracy)
        )


def _paths_to_wgs84(edges):
    """Shortest (hops, accuracy) helmert from every node TO 4326, composing
    by parameter addition along the path."""
    import heapq

    incoming = {}  # target -> [(source, params, accuracy)]
    for u, targets in edges.items():
        for target, p, accuracy in targets:
            incoming.setdefault(target, []).append((u, p, accuracy))

    best = {}  # node -> (cost, params_to_wgs84)
    heap = [((0, 0.0), 4326, [0.0] * 7)]
    while heap:
        cost, node, params_to_wgs84 = heapq.heappop(heap)
        if node in best and best[node][0] <= cost:
            continue
        best[node] = (cost, params_to_wgs84)
        if cost[0] >= 4:
            continue
        # a node u with edge u->node (params p) reaches WGS84 via
        # p + params_to_wgs84
        for u, p, accuracy in incoming.get(node, ()):
            new_cost = (cost[0] + 1, cost[1] + accuracy)
            if u in best and best[u][0] <= new_cost:
                continue
            heapq.heappush(
                heap,
                (new_cost, u, [a + b for a, b in zip(p, params_to_wgs84)]),
            )
    return {
        node: [round(v, 9) for v in params]
        for node, (cost, params) in best.items()
    }


def main(db_path="/usr/share/proj/proj.db"):
    sys.path.insert(0, REPO)
    from dask_geomodeling_tpu.geo.crs import _wkt_param_name

    con = sqlite3.connect(db_path)
    con.row_factory = sqlite3.Row
    cur = con.cursor()
    units = Units(con.cursor())

    helmerts = build_helmert_graph(con.cursor(), units)

    axis_rows = {}
    for row in con.cursor().execute(
        "SELECT coordinate_system_auth_name, coordinate_system_code,"
        " orientation, uom_auth_name, uom_code, coordinate_system_order"
        " FROM axis"
    ):
        axis_rows.setdefault(
            (row[0], str(row[1])), []
        ).append((row[5], row[2], row[3], row[4]))

    # --- geographic CRSes ---
    geographic = {}
    for row in cur.execute(
        """
        SELECT g.code, g.name, g.type,
               g.coordinate_system_auth_name AS cs_auth,
               g.coordinate_system_code AS cs_code,
               e.semi_major_axis AS a, e.inv_flattening AS rf,
               e.semi_minor_axis AS b,
               e.uom_auth_name AS e_uom_auth, e.uom_code AS e_uom_code,
               p.longitude AS pm, p.uom_auth_name AS pm_uom_auth,
               p.uom_code AS pm_uom_code
        FROM geodetic_crs g
        JOIN geodetic_datum d
          ON d.auth_name = g.datum_auth_name AND d.code = g.datum_code
        JOIN ellipsoid e
          ON e.auth_name = d.ellipsoid_auth_name AND e.code = d.ellipsoid_code
        JOIN prime_meridian p
          ON p.auth_name = d.prime_meridian_auth_name
         AND p.code = d.prime_meridian_code
        WHERE g.auth_name = 'EPSG' AND g.type IN
              ('geographic 2D', 'geographic 3D')
        """
    ):
        code = int(row["code"])
        a = units.length_m(row["a"], row["e_uom_auth"], row["e_uom_code"])
        if row["rf"] is not None:
            rf = float(row["rf"])
        elif row["b"] is not None:
            b = units.length_m(
                row["b"], row["e_uom_auth"], row["e_uom_code"]
            )
            rf = a / (a - b) if a != b else 0.0
        else:
            rf = 0.0
        pm = units.angle_deg(
            row["pm"], row["pm_uom_auth"], row["pm_uom_code"]
        )
        helmert = helmerts.get(code)
        if helmert is not None and not any(helmert):
            helmert = None
        deg_factor = 1.0
        for _, orientation, uom_auth, uom_code in axis_rows.get(
            (row["cs_auth"], str(row["cs_code"])), ()
        ):
            if orientation.lower() not in ("east", "west"):
                continue
            factor = units.factor(uom_auth, uom_code)
            if factor is None or units.type(uom_auth, uom_code) != "angle":
                deg_factor = None  # DMS-hemisphere etc: skip the CRS
            else:
                deg_factor = factor * 180.0 / math.pi
        if deg_factor is None:
            continue
        entry = [
            row["name"], round(a, 9), round(rf, 12), helmert, round(pm, 12)
        ]
        if abs(deg_factor - 1.0) > 1e-12:
            entry.append(round(deg_factor, 15))
        geographic[code] = entry

    # non-Greenwich-meridian geodetic CRSes ("NTF (Paris)", "S-JTSK
    # (Ferro)", ...) usually have no helmert of their own: EPSG defines the
    # transformation on the Greenwich sibling.  The datum shift operates in
    # geocentric space (prime meridian independent), so borrow it.
    by_name = {
        entry[0]: entry[3]
        for entry in geographic.values()
        if entry[3] is not None
    }
    for entry in geographic.values():
        if entry[3] is not None:
            continue
        if entry[0] in by_name:
            # geographic-3D CRSes carry their 2D sibling's exact name
            # (e.g. "LUREF" 9893 vs 4181) and share its datum: borrow
            entry[3] = by_name[entry[0]]
        elif entry[0].endswith(")"):
            base_name = entry[0].rsplit(" (", 1)[0]
            if base_name in by_name:
                entry[3] = by_name[base_name]

    # --- projected CRSes ---
    projected = {}
    unsupported = {}
    param_names = {
        (auth, str(code)): name
        for auth, code, name in con.cursor().execute(
            "SELECT auth_name, code, name FROM conversion_param"
        )
    }
    stats = {"ok": 0, "skipped_method": 0, "no_base": 0, "errors": 0}
    for row in cur.execute(
        """
        SELECT p.code, p.name, p.deprecated,
               p.geodetic_crs_code AS geod,
               p.coordinate_system_auth_name AS cs_auth,
               p.coordinate_system_code AS cs_code,
               c.*, m.name AS method_name
        FROM projected_crs p
        JOIN conversion_table c
          ON c.auth_name = p.conversion_auth_name
         AND c.code = p.conversion_code
        JOIN conversion_method m
          ON m.auth_name = c.method_auth_name AND m.code = c.method_code
        WHERE p.auth_name = 'EPSG' AND p.geodetic_crs_auth_name = 'EPSG'
        """
    ):
        code = int(row["code"])
        method_name = row["method_name"]
        method_key = METHOD_MAP.get(method_name)
        if method_key is None:
            if method_name not in METHOD_MAP:
                print("UNMAPPED method:", method_name, "code", code)
            unsupported[code] = method_name
            stats["skipped_method"] += 1
            continue
        geod = int(row["geod"])
        if geod not in geographic:
            stats["no_base"] += 1
            continue
        try:
            params = {}
            for i in range(1, 8):
                pcode = row["param%d_code" % i]
                if pcode is None:
                    continue
                pname = param_names[
                    (row["param%d_auth_name" % i], str(pcode))
                ]
                value = row["param%d_value" % i]
                uom_auth = row["param%d_uom_auth_name" % i]
                uom_code = row["param%d_uom_code" % i]
                utype = (
                    "angle"
                    if (uom_auth, str(uom_code)) == ("EPSG", "9110")
                    else units.type(uom_auth, uom_code)
                )
                if utype == "angle":
                    value = units.angle_deg(value, uom_auth, uom_code)
                elif utype == "length":
                    value = units.length_m(value, uom_auth, uom_code)
                else:
                    value = units.scale(value, uom_auth, uom_code)
                key = _wkt_param_name(pname)
                key = EXTRA_PARAMS.get(key, key)
                params[key] = round(value, 12)
            # Polar Stereographic variant B carries the standard parallel;
            # the builder keys variants off latitude_of_origin
            if method_name == "Polar Stereographic (variant B)":
                params["latitude_of_origin"] = params.pop(
                    "standard_parallel_1"
                )
            axes = sorted(axis_rows[(row["cs_auth"], str(row["cs_code"]))])
            sx = sy = 1
            unit_factor = 1.0
            for _, orientation, uom_auth, uom_code in axes:
                factor = units.factor(uom_auth, uom_code)
                orientation = orientation.lower()
                if orientation in ("east", "west"):
                    sx = -1 if orientation == "west" else 1
                    unit_factor = factor
                elif orientation in ("north", "south"):
                    sy = -1 if orientation == "south" else 1
            entry = [row["name"], geod, method_key, params]
            # compact: trailing defaults omitted
            if unit_factor != 1.0 or sx != 1 or sy != 1:
                entry.extend([round(unit_factor, 15), sx, sy])
            projected[code] = entry
            stats["ok"] += 1
        except (KeyError, AssertionError) as error:
            print("ERROR code", code, repr(error))
            stats["errors"] += 1

    payload = {
        "geographic": {str(k): v for k, v in sorted(geographic.items())},
        "projected": {str(k): v for k, v in sorted(projected.items())},
        "unsupported": {
            str(k): v for k, v in sorted(unsupported.items())
        },
    }
    raw = json.dumps(payload, separators=(",", ":")).encode()
    with gzip.GzipFile(OUT, "wb", mtime=0) as fh:
        fh.write(raw)
    print("geographic:", len(geographic), "projected:", len(projected))
    print("stats:", stats)
    print(
        "raw %.0f KB -> %s %.0f KB"
        % (len(raw) / 1024, OUT, os.path.getsize(OUT) / 1024)
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
