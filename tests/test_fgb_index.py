"""FlatGeobuf packed Hilbert R-tree: index writing and bbox-limited
reads (the format's random-access design; OGR's FlatGeobuf driver plays
this role for the reference)."""
import os
import struct

import numpy as np
import pandas as pd
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.geo.features import GeoDataFrame
from dask_geomodeling_tpu.geo.geometry import box
from dask_geomodeling_tpu.io.flatgeobuf import (
    _hilbert_codes,
    _packed_rtree_size,
    _rtree_level_sizes,
    read_flatgeobuf,
    write_flatgeobuf,
)


def _grid_frame(n_side=20, cell=10.0):
    geoms = []
    values = []
    for i in range(n_side):
        for j in range(n_side):
            geoms.append(
                box(i * cell, j * cell, i * cell + cell - 1,
                    j * cell + cell - 1)
            )
            values.append(i * n_side + j)
    return GeoDataFrame(
        pd.DataFrame({"value": values}), geometry=geoms, crs="EPSG:28992"
    )


def test_hilbert_matches_canonical_scalar():
    """The vectorized Hilbert distance equals the canonical xy2d
    algorithm for every cell of an order-4 (16x16) grid, and is a
    bijection."""

    def rot(n, x, y, rx, ry):
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        return x, y

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            x, y = rot(n, x, y, rx, ry)
            s //= 2
        return d

    order = 4
    side = 1 << order
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    got = _hilbert_codes(xs.ravel(), ys.ravel(), order=order)
    expected = [xy2d(side, int(x), int(y))
                for x, y in zip(xs.ravel(), ys.ravel())]
    assert got.tolist() == expected
    assert sorted(got.tolist()) == list(range(side * side))


def test_level_sizes_match_size_formula():
    for n in (1, 2, 15, 16, 17, 255, 256, 257, 5000):
        for node in (4, 16):
            sizes = _rtree_level_sizes(n, node)
            assert sizes[-1] == n
            assert sizes[0] == 1
            assert sum(sizes) * 40 == _packed_rtree_size(n, node)


def test_indexed_roundtrip_and_bbox_search(tmp_path):
    frame = _grid_frame()
    path = str(tmp_path / "grid.fgb")
    write_flatgeobuf(frame, path)

    whole = read_flatgeobuf(path)
    assert len(whole) == len(frame)
    assert sorted(whole["value"].tolist()) == sorted(
        frame["value"].tolist()
    )

    # every bbox query returns exactly the features a full scan finds
    rng = np.random.RandomState(0)
    for _ in range(20):
        x1, y1 = rng.rand(2) * 150
        bbox = (x1, y1, x1 + rng.rand() * 60, y1 + rng.rand() * 60)
        hits = read_flatgeobuf(path, bbox=bbox)
        bounds = whole.geometry.bounds
        mask = ~(
            (bounds["maxx"] < bbox[0]) | (bounds["minx"] > bbox[2])
            | (bounds["maxy"] < bbox[1]) | (bounds["miny"] > bbox[3])
        )
        assert sorted(hits["value"].tolist()) == sorted(
            whole["value"][mask.values].tolist()
        )
    # fids index the file positions: re-reading those rows agrees
    bbox = (0, 0, 35, 35)
    hits = read_flatgeobuf(path, bbox=bbox)
    assert list(hits.index) == sorted(hits.index)
    for fid, value in zip(hits.index, hits["value"]):
        assert whole["value"].iloc[fid] == value


def test_bbox_in_other_projection(tmp_path):
    frame = _grid_frame(n_side=4, cell=1000.0)
    path = str(tmp_path / "g.fgb")
    write_flatgeobuf(frame, path)
    from dask_geomodeling_tpu.geo.crs import transform_extent

    target = transform_extent((0, 0, 1500, 1500), "EPSG:28992", "EPSG:4326")
    hits = read_flatgeobuf(path, bbox=target, bbox_projection="EPSG:4326")
    expected = read_flatgeobuf(path, bbox=(0, 0, 1500, 1500))
    assert sorted(hits["value"].tolist()) == sorted(
        expected["value"].tolist()
    )


def test_single_feature_index(tmp_path):
    frame = GeoDataFrame(
        pd.DataFrame({"v": [1]}), geometry=[box(0, 0, 5, 5)],
        crs="EPSG:28992",
    )
    path = str(tmp_path / "one.fgb")
    write_flatgeobuf(frame, path)
    assert len(read_flatgeobuf(path)) == 1
    assert len(read_flatgeobuf(path, bbox=(1, 1, 2, 2))) == 1
    assert len(read_flatgeobuf(path, bbox=(50, 50, 60, 60))) == 0


def test_unindexed_write_still_supported(tmp_path):
    frame = _grid_frame(n_side=3)
    path = str(tmp_path / "plain.fgb")
    write_flatgeobuf(frame, path, index_node_size=0)
    whole = read_flatgeobuf(path)
    # frame order is preserved without an index
    assert whole["value"].tolist() == frame["value"].tolist()
    # bbox on an unindexed file falls back to a full decode
    assert len(read_flatgeobuf(path, bbox=(0, 0, 5, 5))) == len(frame)


def test_source_uses_index_above_limit(tmp_path, monkeypatch):
    """GeometryFileSource routes large .fgb bbox requests through the
    index instead of parsing the whole file."""
    from dask_geomodeling_tpu.geometry import GeometryFileSource
    from dask_geomodeling_tpu.io import flatgeobuf as fgb

    frame = _grid_frame()
    path = str(tmp_path / "big.fgb")
    write_flatgeobuf(frame, path)

    searches = []
    real = fgb._search_packed_rtree

    def spy(*args, **kwargs):
        out = real(*args, **kwargs)
        searches.append(len(out))
        return out

    monkeypatch.setattr(fgb, "_search_packed_rtree", spy)
    request = dict(
        mode="intersects", geometry=box(0, 0, 35, 35),
        projection="EPSG:28992",
    )
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = GeometryFileSource("big.fgb")
        # small file: the whole-read LRU path (no index search)
        small = source.get_data(**request)
        assert searches == []
        # drop the threshold below the file size: the index path engages
        with config.set(
            {"geomodeling.vector-windowed-read-limit": 100}
        ):
            windowed = source.get_data(**request)
    assert len(searches) == 1
    assert sorted(small["features"]["value"].tolist()) == sorted(
        windowed["features"]["value"].tolist()
    )


class TestGpkgRtree:
    """GeoPackage gpkg_rtree_index: written by _write_gpkg, used for
    bbox-limited reads."""

    def test_written_files_carry_the_extension(self, tmp_path):
        import sqlite3

        from dask_geomodeling_tpu.io.vectorfile import write_vector

        frame = _grid_frame(n_side=6)
        path = str(tmp_path / "g.gpkg")
        write_vector(frame, path)
        con = sqlite3.connect(path)
        names = [r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE name LIKE 'rtree_%'"
        )]
        ext = con.execute(
            "SELECT extension_name FROM gpkg_extensions"
        ).fetchone()
        count = con.execute(
            'SELECT COUNT(*) FROM "rtree_layer_geom"'
        ).fetchone()[0]
        con.close()
        assert any(n == "rtree_layer_geom" for n in names)
        assert ext[0] == "gpkg_rtree_index"
        assert count == len(frame)

    def test_bbox_read_equals_full_scan(self, tmp_path):
        from dask_geomodeling_tpu.io.vectorfile import (
            _read_gpkg,
            write_vector,
        )

        frame = _grid_frame()
        path = str(tmp_path / "g.gpkg")
        write_vector(frame, path)
        whole = _read_gpkg(path)
        for bbox in [(0, 0, 35, 35), (50, 100, 120, 160), (500, 500, 600, 600)]:
            hits = _read_gpkg(path, bbox=bbox)
            bounds = whole.geometry.bounds
            mask = ~(
                (bounds["maxx"] < bbox[0]) | (bounds["minx"] > bbox[2])
                | (bounds["maxy"] < bbox[1]) | (bounds["miny"] > bbox[3])
            )
            got = hits["value"].tolist() if len(hits) else []
            assert sorted(got) == sorted(
                whole["value"][mask.values].tolist()
            )

    def test_bbox_in_other_projection(self, tmp_path):
        from dask_geomodeling_tpu.geo.crs import transform_extent
        from dask_geomodeling_tpu.io.vectorfile import (
            _read_gpkg,
            write_vector,
        )

        frame = _grid_frame(n_side=4, cell=1000.0)
        path = str(tmp_path / "g.gpkg")
        write_vector(frame, path)
        target = transform_extent(
            (0, 0, 1500, 1500), "EPSG:28992", "EPSG:4326"
        )
        hits = _read_gpkg(path, bbox=target, bbox_projection="EPSG:4326")
        expected = _read_gpkg(path, bbox=(0, 0, 1500, 1500))
        assert sorted(hits["value"].tolist()) == sorted(
            expected["value"].tolist()
        )

    def test_source_routes_large_files_through_rtree(self, tmp_path,
                                                     monkeypatch):
        from dask_geomodeling_tpu.geometry import GeometryFileSource
        from dask_geomodeling_tpu.io.vectorfile import write_vector
        from dask_geomodeling_tpu.runtime import pipeline

        frame = _grid_frame()
        path = str(tmp_path / "big.gpkg")
        write_vector(frame, path)
        full_reads = []
        real = pipeline.read_vector_cached

        def spy(*args, **kwargs):
            full_reads.append(args)
            return real(*args, **kwargs)

        monkeypatch.setattr(pipeline, "read_vector_cached", spy)
        request = dict(
            mode="intersects", geometry=box(0, 0, 35, 35),
            projection="EPSG:28992",
        )
        with config.set({"geomodeling.root": str(tmp_path)}):
            source = GeometryFileSource("big.gpkg")
            baseline = source.get_data(**request)
            assert len(full_reads) == 1  # below limit: whole-read LRU
            with config.set(
                {"geomodeling.vector-windowed-read-limit": 100}
            ):
                windowed = source.get_data(**request)
            assert len(full_reads) == 1  # rtree path: no full read
        assert sorted(baseline["features"]["value"].tolist()) == sorted(
            windowed["features"]["value"].tolist()
        )


def test_spatialite_writes_spatial_index(tmp_path):
    """SpatiaLite convention: idx_<table>_<geom> R-tree + the enabled
    flag in geometry_columns."""
    import sqlite3

    from dask_geomodeling_tpu.io.spatialite import write_spatialite

    frame = _grid_frame(n_side=5)
    path = str(tmp_path / "s.sqlite")
    write_spatialite(frame, path, layer="grid")
    con = sqlite3.connect(path)
    enabled = con.execute(
        "SELECT spatial_index_enabled FROM geometry_columns"
    ).fetchone()[0]
    count = con.execute('SELECT COUNT(*) FROM "idx_grid_geometry"').fetchone()[0]
    hits = con.execute(
        'SELECT COUNT(*) FROM "idx_grid_geometry" '
        "WHERE xmax >= 0 AND xmin <= 35 AND ymax >= 0 AND ymin <= 35"
    ).fetchone()[0]
    con.close()
    assert enabled == 1
    assert count == len(frame)
    assert 0 < hits < len(frame)


def test_fgb_empty_geometry_falls_back_to_unindexed(tmp_path):
    """Review regression: null/empty geometries have no envelope — the
    writer degrades to an unindexed file instead of crashing (OGR
    errors on this combination)."""
    from dask_geomodeling_tpu.geo.geometry import LineString

    frame = GeoDataFrame(
        pd.DataFrame({"v": [1, 2, 3]}),
        geometry=[box(0, 0, 5, 5), None, LineString([])],
        crs="EPSG:28992",
    )
    path = str(tmp_path / "empties.fgb")
    write_flatgeobuf(frame, path)  # must not raise
    back = read_flatgeobuf(path)
    assert len(back) == 3
    assert back["v"].tolist() == [1, 2, 3]  # frame order: unindexed
    assert back.geometry.iloc[1] is None
    # and the bbox argument still works (full-decode fallback)
    assert len(read_flatgeobuf(path, bbox=(0, 0, 1, 1))) == 3


def test_gpkg_and_spatialite_empty_geometries_write(tmp_path):
    """Review regression: index population skips null/empty geometries
    instead of crashing the whole write."""
    from dask_geomodeling_tpu.geo.geometry import LineString
    from dask_geomodeling_tpu.io.spatialite import write_spatialite
    from dask_geomodeling_tpu.io.vectorfile import _read_gpkg, write_vector

    frame = GeoDataFrame(
        pd.DataFrame({"v": [1, 2]}),
        geometry=[box(0, 0, 5, 5), None],
        crs="EPSG:28992",
    )
    gpkg = str(tmp_path / "e.gpkg")
    write_vector(frame, gpkg)
    assert len(_read_gpkg(gpkg)) == 2
    assert len(_read_gpkg(gpkg, bbox=(0, 0, 9, 9))) == 1  # indexed hit
    write_spatialite(frame, str(tmp_path / "e.sqlite"))  # must not raise


def test_gpkg_rtree_join_uses_rowid(tmp_path):
    """Review regression: foreign GeoPackages name their PK freely; the
    rtree id is defined against the ROWID."""
    import sqlite3

    from dask_geomodeling_tpu.io.vectorfile import _read_gpkg, write_vector

    frame = _grid_frame(n_side=4)
    path = str(tmp_path / "pk.gpkg")
    write_vector(frame, path)
    # rename the PK column like ESRI-produced files do
    con = sqlite3.connect(path)
    con.execute('ALTER TABLE "layer" RENAME COLUMN fid TO OBJECTID')
    con.commit()
    con.close()
    hits = _read_gpkg(path, bbox=(0, 0, 15, 15))
    assert len(hits) == 4


def test_gpkg_without_rtree_keeps_cached_path(tmp_path, monkeypatch):
    """Review regression: an index-less large GeoPackage must keep the
    parse-once LRU, not an uncached per-request full scan."""
    import sqlite3

    from dask_geomodeling_tpu.geometry import GeometryFileSource
    from dask_geomodeling_tpu.io.vectorfile import write_vector
    from dask_geomodeling_tpu.runtime import pipeline

    frame = _grid_frame(n_side=6)
    path = str(tmp_path / "noidx.gpkg")
    write_vector(frame, path)
    con = sqlite3.connect(path)
    con.execute('DROP TABLE "rtree_layer_geom"')
    con.execute("DELETE FROM gpkg_extensions")
    con.commit()
    con.close()

    cached = []
    real = pipeline.read_vector_cached

    def spy(*args, **kwargs):
        cached.append(args)
        return real(*args, **kwargs)

    monkeypatch.setattr(pipeline, "read_vector_cached", spy)
    request = dict(
        mode="intersects", geometry=box(0, 0, 25, 25),
        projection="EPSG:28992",
    )
    with config.set({
        "geomodeling.root": str(tmp_path),
        "geomodeling.vector-windowed-read-limit": 100,
    }):
        out = GeometryFileSource("noidx.gpkg").get_data(**request)
    assert len(cached) == 1  # the LRU path, despite the size
    assert len(out["features"]) > 0
