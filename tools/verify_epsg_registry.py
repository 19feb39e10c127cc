"""Verify the generated EPSG table against PROJ's cs2cs (ground truth).

For every projected code: take the center of the CRS's EPSG area of use,
transform lon/lat -> code with cs2cs and with crs.transform_points, and
compare (trying both output axis orders, since cs2cs emits the EPSG-defined
order while the framework always uses traditional x=east/y=north with
signs).  Two tolerance tiers:

- tight (2 m): codes whose datum is WGS84-coincident in the table (hub
  datums like NAD83(CSRS) legitimately sit ~1 m off true WGS84; beyond
  2 m on these means projection-math errors, which show up at km scale)

- loose (300 m + 2x the helmert magnitude): everything else.  PROJ picks
  area-specific transformations, substitutes grid shifts, and silently
  falls back to a BALLPARK (no-op) operation when the test point misses
  every specific transformation's extent (verified for EPSG:2194: the
  no-shift result matches cs2cs bit-for-bit while the helmert-shifted
  one differs by |helmert|).  Disagreements bounded by ~2x|helmert| are
  datum-policy variance, not math errors; projection-math errors show
  at km scale and are fully screened by the tight tier anyway.

Distances are compared in metres (grid units x the CRS unit factor).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/verify_epsg_registry.py [N]

``--emit [N]`` additionally writes a stratified sample (every code of the
rare methods + N per dominant method) of cs2cs-pinned ground-truth points
to tests/data/epsg_points.json for the offline regression test
(tests/test_epsg_registry.py), so CI needs no PROJ install.
"""
import gzip
import json
import os
import random
import sqlite3
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def extent_centers(db="/usr/share/proj/proj.db"):
    con = sqlite3.connect(db)
    rows = con.execute(
        """
        SELECT u.object_code,
               e.west_lon, e.east_lon, e.south_lat, e.north_lat
        FROM usage u JOIN extent e
          ON e.auth_name = u.extent_auth_name AND e.code = u.extent_code
        WHERE u.object_table_name = 'projected_crs'
          AND u.object_auth_name = 'EPSG'
        """
    ).fetchall()
    centers = {}
    for code, w, e, s, n in rows:
        if None in (w, e, s, n):
            continue
        if e < w:  # dateline-crossing extent
            e += 360.0
        lon = (w + e) / 2.0
        if lon > 180.0:
            lon -= 360.0
        centers[int(code)] = (lon, (s + n) / 2.0)
    return centers


def cs2cs(code, lon, lat):
    out = subprocess.run(
        ["cs2cs", "-f", "%.6f", "EPSG:4326", "EPSG:%d" % code],
        input="%.10f %.10f\n" % (lat, lon),
        capture_output=True,
        text=True,
        timeout=30,
    )
    parts = out.stdout.split()
    if len(parts) < 2 or "inf" in parts[0]:
        return None
    return float(parts[0]), float(parts[1])


def main(sample=0, emit=0):
    from dask_geomodeling_tpu.geo import crs

    table = json.loads(
        gzip.open(
            os.path.join(REPO, "dask_geomodeling_tpu/geo/epsg.json.gz")
        ).read()
    )
    centers = extent_centers()
    codes = sorted(int(c) for c in table["projected"])
    if emit:
        # every code of the rare methods, `emit` per dominant method
        random.seed(42)
        by_method = {}
        for code in codes:
            by_method.setdefault(table["projected"][str(code)][2], []).append(
                code
            )
        codes = sorted(
            c
            for method_codes in by_method.values()
            for c in (
                random.sample(method_codes, emit)
                if len(method_codes) > emit
                else method_codes
            )
        )
    elif sample:
        random.seed(42)
        codes = random.sample(codes, min(sample, len(codes)))
    stats = {"tight_ok": 0, "loose_ok": 0, "skip": 0}
    failures = []
    pinned = []
    for code in codes:
        if code not in centers:
            stats["skip"] += 1
            continue
        lon, lat = centers[code]
        try:
            truth = cs2cs(code, lon, lat)
        except Exception:
            truth = None
        if truth is None:
            stats["skip"] += 1
            continue
        try:
            x, y = crs.transform_points([lon], [lat], 4326, code)
            x, y = float(x[0]), float(y[0])
        except Exception as error:
            failures.append((code, "error", repr(error)[:100]))
            continue
        entry = table["projected"][str(code)]
        base = table["geographic"].get(str(entry[1]), [None] * 5)
        unit = entry[4] if len(entry) > 4 else 1.0
        helmert = base[3]
        tight = helmert is None
        if tight:
            tol = 2.0
        else:
            tol = 300.0 + 2.0 * max(abs(v) for v in helmert[:3])
        d_direct = max(abs(x - truth[0]), abs(y - truth[1])) * unit
        d_swap = max(abs(x - truth[1]), abs(y - truth[0])) * unit
        if min(d_direct, d_swap) <= tol:
            stats["tight_ok" if tight else "loose_ok"] += 1
            if emit:
                # pin the truth in framework axis order
                tx, ty = (
                    truth if d_direct <= d_swap else (truth[1], truth[0])
                )
                pinned.append(
                    [code, round(lon, 6), round(lat, 6),
                     round(tx, 4), round(ty, 4), round(tol / unit, 4)]
                )
        else:
            failures.append(
                (code, entry[2], "mine=%.3f,%.3f truth=%.3f,%.3f d=%.1f"
                 % (x, y, truth[0], truth[1], min(d_direct, d_swap)))
            )
    print(stats, "failures:", len(failures))
    for f in failures[:40]:
        print(f)
    if emit:
        out = os.path.join(REPO, "tests", "data", "epsg_points.json")
        with open(out, "w") as fh:
            json.dump(
                {"comment": "cs2cs-pinned EPSG:4326 -> code ground truth; "
                            "columns code, lon, lat, x, y, tol_m "
                            "(tol in grid units; see tools/verify_epsg_registry.py)",
                 "points": pinned},
                fh,
                separators=(",", ":"),
            )
        print("pinned %d points -> %s" % (len(pinned), out))
    return 1 if failures else 0


if __name__ == "__main__":
    if "--emit" in sys.argv:
        i = sys.argv.index("--emit")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 60
        sys.exit(main(emit=n))
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 0))
