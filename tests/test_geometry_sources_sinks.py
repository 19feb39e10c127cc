"""Geometry file source/sink tests with real files (modeled on reference
tests/test_geometry.py:41-70 and test_geometry_sinks.py)."""
import numpy as np
import pandas as pd
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.geo.features import GeoDataFrame
from dask_geomodeling_tpu.geo.geometry import Point, box
from dask_geomodeling_tpu.geometry import GeometryFileSource
from dask_geomodeling_tpu.geometry.sinks import GeometryFileSink, to_file
from dask_geomodeling_tpu.io.vectorfile import read_vector, write_vector


@pytest.fixture
def root(tmp_path):
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path


@pytest.fixture
def frame():
    return GeoDataFrame(
        pd.DataFrame({"value": [1.5, 2.5, 3.5], "name": ["a", "b", "c"]}),
        geometry=[
            box(0, 0, 2, 2),
            box(4, 4, 6, 6),
            box(8, 8, 10, 10),
        ],
        crs="EPSG:4326",
    )


class TestVectorFileIO:
    @pytest.mark.parametrize(
        "ext",
        ["geojson", "geojsonl", "gpkg", "shp", "gml", "kml", "csv",
         "parquet", "fgb", "mif", "kmz", "zip", "topojson", "sqlite"],
    )
    def test_roundtrip(self, root, frame, ext):
        path = str(root / ("test." + ext))
        write_vector(frame, path)
        result = read_vector(path)
        assert len(result) == 3
        assert result["value"].tolist() == [1.5, 2.5, 3.5]
        assert result["name"].tolist() == ["a", "b", "c"]
        assert result.geometry.iloc[0].equals(box(0, 0, 2, 2))

    def test_gpx_read_layers_and_roundtrip(self, root):
        """GPX: waypoints/routes/tracks layers (OGR GPX driver envelope)."""
        from dask_geomodeling_tpu.geo.geometry import LineString

        gpx = """<?xml version="1.0" encoding="UTF-8"?>
<gpx version="1.1" creator="test" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="52.1" lon="4.3"><ele>2.5</ele><name>home</name></wpt>
  <wpt lat="52.2" lon="4.4"><name>work</name></wpt>
  <rte><name>commute</name>
    <rtept lat="52.1" lon="4.3"/><rtept lat="52.2" lon="4.4"/>
  </rte>
  <trk><name>run</name>
    <trkseg><trkpt lat="52.0" lon="4.0"/><trkpt lat="52.05" lon="4.05"/></trkseg>
    <trkseg><trkpt lat="52.1" lon="4.1"/><trkpt lat="52.15" lon="4.15"/></trkseg>
  </trk>
</gpx>"""
        path = str(root / "test.gpx")
        with open(path, "w") as f:
            f.write(gpx)

        everything = read_vector(path)
        assert len(everything) == 4
        assert everything["layer"].tolist() == [
            "waypoints", "waypoints", "routes", "tracks",
        ]
        assert everything.crs == "EPSG:4326"

        waypoints = read_vector(path, layer="waypoints")
        assert len(waypoints) == 2
        assert "layer" not in waypoints.columns
        assert waypoints["name"].tolist() == ["home", "work"]
        assert waypoints["ele"].iloc[0] == 2.5
        assert waypoints.geometry.iloc[0].coords[0] == (4.3, 52.1)

        routes = read_vector(path, layer="routes")
        assert len(routes) == 1
        assert type(routes.geometry.iloc[0]).__name__ == "LineString"

        tracks = read_vector(path, layer="tracks")
        assert len(tracks) == 1
        track = tracks.geometry.iloc[0]
        assert type(track).__name__ == "MultiLineString"
        assert len(list(track.geoms)) == 2

        with pytest.raises(ValueError):
            read_vector(path, layer="nope")

        # write round trip: points + lines survive; polygons rejected
        out = str(root / "out.gpx")
        mixed = GeoDataFrame(
            pd.DataFrame({"name": ["p", "l"]}),
            geometry=[Point(4.3, 52.1), LineString([(4.0, 52.0), (4.1, 52.1)])],
            crs="EPSG:4326",
        )
        write_vector(mixed, out)
        back = read_vector(out)
        assert len(back) == 2
        assert set(back["layer"]) == {"waypoints", "tracks"}
        assert back["name"].tolist() == ["p", "l"]
        np.testing.assert_allclose(
            list(back.geometry.iloc[0].coords)[0], (4.3, 52.1)
        )

        from dask_geomodeling_tpu.geo.geometry import box as _box

        bad = GeoDataFrame(
            None, geometry=[_box(0, 0, 1, 1)], crs="EPSG:4326"
        )
        with pytest.raises(ValueError):
            write_vector(bad, str(root / "bad.gpx"))

    @pytest.mark.parametrize(
        "ext",
        ["geojson", "geojsonl", "gpkg", "shp", "gml", "kml", "csv",
         "parquet", "fgb", "mif", "kmz", "zip", "topojson", "sqlite"],
    )
    def test_unicode_and_special_floats(self, root, ext):
        """Property values survive every writable format: unicode text,
        negative/zero/fractional floats."""
        frame = GeoDataFrame(
            pd.DataFrame(
                {"label": ["café", "中文"], "x": [-1.5, 0.0]}
            ),
            geometry=[box(0, 0, 1, 1), box(2, 2, 3, 3)],
            crs="EPSG:4326",
        )
        path = str(root / ("uni." + ext))
        write_vector(frame, path)
        result = read_vector(path)
        assert result["label"].tolist() == ["café", "中文"]
        assert result["x"].tolist() == [-1.5, 0.0]

    def test_spatialite_review_fixes(self, root):
        """Duplicate indexes fall back to sequential fids; list columns
        bind via _sql_value; PK_UID survives next to fid; bad blobs and
        compressed classes raise clean errors."""
        import sqlite3
        import struct

        from dask_geomodeling_tpu.io.spatialite import parse_blob

        dup = GeoDataFrame(
            pd.DataFrame({"tags": [["a", "b"], ["c"]]}),
            geometry=[box(0, 0, 1, 1), box(2, 2, 3, 3)],
            crs="EPSG:4326",
        )
        dup.index = pd.Index([1, 1])
        path = str(root / "dup.sqlite")
        write_vector(dup, path)
        back = read_vector(path)
        assert len(back) == 2  # sequential fids, no IntegrityError
        assert back["tags"].tolist() == ['["a", "b"]', '["c"]']

        with pytest.raises(IOError):
            parse_blob(b"\x00\x01\x02")
        compressed = bytearray(b"\x00\x01")
        compressed.extend(struct.pack("<i", 4326))
        compressed.extend(struct.pack("<4d", 0, 0, 1, 1))
        compressed.append(0x7C)
        compressed.extend(struct.pack("<i", 1000002))
        compressed.extend(b"\x00" * 16)
        compressed.append(0xFE)
        with pytest.raises(NotImplementedError):
            parse_blob(bytes(compressed))

        # a real PK_UID attribute column survives when fid is the key
        con = sqlite3.connect(str(root / "pk.sqlite"))
        con.execute(
            "CREATE TABLE geometry_columns (f_table_name TEXT, "
            "f_geometry_column TEXT, geometry_type INTEGER, "
            "coord_dimension INTEGER, srid INTEGER, "
            "spatial_index_enabled INTEGER)"
        )
        con.execute(
            "INSERT INTO geometry_columns VALUES ('t','geom',1,2,4326,0)"
        )
        con.execute(
            "CREATE TABLE t (fid INTEGER, PK_UID INTEGER, geom BLOB)"
        )
        blob = bytearray(b"\x00\x01")
        blob.extend(struct.pack("<i", 4326))
        blob.extend(struct.pack("<4d", 3.0, 4.0, 3.0, 4.0))
        blob.append(0x7C)
        blob.extend(struct.pack("<i", 1))
        blob.extend(struct.pack("<2d", 3.0, 4.0))
        blob.append(0xFE)
        con.execute(
            "INSERT INTO t VALUES (5, 77, ?)", (bytes(blob),)
        )
        con.commit()
        con.close()
        result = read_vector(str(root / "pk.sqlite"))
        assert result.index.tolist() == [5]
        assert result["PK_UID"].tolist() == [77]

    def test_topojson_empty_arc_and_unnamed_index(self, root):
        import json

        topology = {
            "type": "Topology",
            "arcs": [[]],
            "objects": {
                "pts": {
                    "type": "GeometryCollection",
                    "geometries": [
                        {"type": "Point", "coordinates": [1.0, 2.0]},
                        {"type": "Point", "coordinates": [3.0, 4.0]},
                    ],
                }
            },
        }
        path = str(root / "noids.topojson")
        open(path, "w").write(json.dumps(topology))
        result = read_vector(path)
        # enumerated ids do NOT masquerade as declared fids
        assert result.index.name is None
        assert result.index.tolist() == [0, 1]

    def test_spatialite_z_and_legacy_schema(self, root):
        """XYZ blobs drop Z on read; legacy 'type'-text geometry_columns
        schemas are discovered too."""
        import sqlite3
        import struct

        from dask_geomodeling_tpu.io.spatialite import parse_blob

        # hand-build an XYZ point blob (class 1001)
        blob = bytearray(b"\x00\x01")
        blob.extend(struct.pack("<i", 4326))
        blob.extend(struct.pack("<4d", 3.0, 4.0, 3.0, 4.0))
        blob.append(0x7C)
        blob.extend(struct.pack("<i", 1001))
        blob.extend(struct.pack("<3d", 3.0, 4.0, 99.0))
        blob.append(0xFE)
        point = parse_blob(bytes(blob))
        assert (point.x, point.y) == (3.0, 4.0)

        # legacy schema: 'type' text column instead of geometry_type int
        path = str(root / "legacy.sqlite")
        con = sqlite3.connect(path)
        con.execute(
            "CREATE TABLE geometry_columns (f_table_name TEXT, "
            "f_geometry_column TEXT, type TEXT, coord_dimension INTEGER, "
            "srid INTEGER, spatial_index_enabled INTEGER)"
        )
        con.execute(
            "INSERT INTO geometry_columns VALUES "
            "('pts', 'geom', 'POINT', 2, 4326, 0)"
        )
        con.execute("CREATE TABLE pts (PK_UID INTEGER, v REAL, geom BLOB)")
        con.execute(
            "INSERT INTO pts VALUES (7, 1.25, ?)", (bytes(blob),)
        )
        con.commit()
        con.close()
        result = read_vector(path)
        assert result["v"].tolist() == [1.25]
        assert result.index.tolist() == [7]
        assert result.crs == "EPSG:4326"
        assert result.geometry.iloc[0].x == 3.0

    def test_topojson_quantized_shared_arcs(self, root):
        """Quantized delta-encoded arcs, shared (and reversed) between two
        polygons — the real TopoJSON decode path."""
        import json

        # two unit squares sharing the edge x=1: arcs quantized at 1e-2
        # scale over a (0..2, 0..1) extent
        topology = {
            "type": "Topology",
            "transform": {"scale": [0.01, 0.01], "translate": [0.0, 0.0]},
            "arcs": [
                # arc 0: shared edge (1,0) -> (1,1), deltas in grid units
                [[100, 0], [0, 100]],
                # arc 1: left square's open boundary (1,1)->(0,1)->(0,0)->(1,0)
                [[100, 100], [-100, 0], [0, -100], [100, 0]],
                # arc 2: right square's open boundary (1,0)->(2,0)->(2,1)->(1,1)
                [[100, 0], [100, 0], [0, 100], [-100, 0]],
            ],
            "objects": {
                "squares": {
                    "type": "GeometryCollection",
                    "geometries": [
                        {"type": "Polygon", "arcs": [[0, 1]],
                         "properties": {"name": "left"}},
                        # the shared edge reversed via ~0
                        {"type": "Polygon", "arcs": [[2, ~0]],
                         "properties": {"name": "right"}},
                    ],
                }
            },
        }
        path = str(root / "squares.topojson")
        open(path, "w").write(json.dumps(topology))
        result = read_vector(path)
        assert result["name"].tolist() == ["left", "right"]
        left, right = result.geometry.iloc[0], result.geometry.iloc[1]
        assert abs(left.area - 1.0) < 1e-9
        assert abs(right.area - 1.0) < 1e-9
        assert left.equals(box(0, 0, 1, 1))
        assert right.equals(box(1, 0, 2, 1))
        # layer selection by object name
        assert len(read_vector(path, layer="squares")) == 2
        with pytest.raises(IOError):
            read_vector(path, layer="nope")

    def test_kmz_prefers_doc_kml(self, root, frame):
        """A KMZ's main document is doc.kml, not the first entry."""
        import zipfile

        from dask_geomodeling_tpu.io.vectorfile import _kml_document

        decoy = frame.iloc[:1]
        path = str(root / "bundle.kmz")
        with zipfile.ZipFile(path, "w") as bundle:
            bundle.writestr("aaa_overlay.kml", _kml_document(decoy))
            bundle.writestr("doc.kml", _kml_document(frame))
        result = read_vector(path)
        assert len(result) == 3

    def test_zip_layer_selection_and_shp_zip(self, root, frame):
        """Zipped archives: stem-named layer selection; .shp.zip writes."""
        import zipfile

        path = str(root / "data.shp.zip")
        write_vector(frame, path)
        with zipfile.ZipFile(path) as bundle:
            names = set(bundle.namelist())
        assert "data.shp" in names and "data.dbf" in names
        result = read_vector(path)
        assert result["value"].tolist() == [1.5, 2.5, 3.5]

        # two datasets in one archive: layer picks by stem
        multi = str(root / "multi.zip")
        write_vector(frame, str(root / "a.geojson"))
        write_vector(frame.iloc[:1], str(root / "b.geojson"))
        with zipfile.ZipFile(multi, "w") as bundle:
            bundle.write(str(root / "a.geojson"), "a.geojson")
            bundle.write(str(root / "b.geojson"), "b.geojson")
        assert len(read_vector(multi, layer="b")) == 1
        assert len(read_vector(multi, layer="a")) == 3
        with pytest.raises(IOError):
            read_vector(multi, layer="missing")

    def test_zip_skips_macos_sidecars(self, root, frame):
        """__MACOSX/AppleDouble entries never shadow the real dataset."""
        import zipfile

        shp_zip = str(root / "plain.zip")
        write_vector(frame, shp_zip)
        macos = str(root / "macos.zip")
        with zipfile.ZipFile(shp_zip) as src, zipfile.ZipFile(
            macos, "w"
        ) as dst:
            for name in src.namelist():
                dst.writestr(name, src.read(name))
                dst.writestr("__MACOSX/._" + name, b"\x00\x05\x16\x07junk")
        result = read_vector(macos)
        assert result["value"].tolist() == [1.5, 2.5, 3.5]

    def test_zip_forwards_layer_to_inner_dataset(self, root, frame):
        """A single zipped multi-layer dataset passes 'layer' through."""
        import zipfile

        gpkg = str(root / "layers.gpkg")
        write_vector(frame, gpkg, layer="boxes")
        bundle = str(root / "layers.zip")
        with zipfile.ZipFile(bundle, "w") as z:
            z.write(gpkg, "layers.gpkg")
        # 'boxes' is no file stem in the archive: it must reach the
        # GeoPackage reader as its layer name
        assert len(read_vector(bundle, layer="boxes")) == 3
        with pytest.raises(IOError):
            read_vector(bundle, layer="nope")

    def test_gpx_geometry_file_source(self, root):
        """GPX rides GeometryFileSource like any other driver."""
        from datetime import datetime

        gpx = """<?xml version="1.0"?>
<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="1.0" lon="1.0"><name>in</name></wpt>
  <wpt lat="50.0" lon="50.0"><name>out</name></wpt>
</gpx>"""
        path = root / "pts.gpx"
        path.write_text(gpx)
        source = GeometryFileSource("pts.gpx")
        result = source.get_data(
            mode="intersects",
            geometry=box(0, 0, 10, 10),
            projection="EPSG:4326",
            start=datetime(2000, 1, 1),
        )
        assert len(result["features"]) == 1
        assert result["features"]["name"].iloc[0] == "in"

    def test_parquet_crs_and_metadata(self, root, frame):
        import json

        import pyarrow.parquet as pq

        path = str(root / "test.parquet")
        frame.crs = "EPSG:28992"
        write_vector(frame, path)
        geo = json.loads(pq.read_table(path).schema.metadata[b"geo"])
        assert geo["primary_column"] == "geometry"
        assert geo["columns"]["geometry"]["encoding"] == "WKB"
        assert geo["columns"]["geometry"]["crs"]["id"] == {
            "authority": "EPSG",
            "code": 28992,
        }
        result = read_vector(path)
        assert result.crs == "EPSG:28992"

    def test_fgb_crs_and_index_skip(self, root, frame):
        import struct

        from dask_geomodeling_tpu.io.flatgeobuf import (
            MAGIC,
            _packed_rtree_size,
            read_flatgeobuf,
        )

        path = str(root / "test.fgb")
        frame.crs = "EPSG:28992"
        write_vector(frame, path)
        result = read_vector(path)
        assert result.crs == "EPSG:28992"
        assert any(
            g.equals(box(8, 8, 10, 10)) for g in result.geometry
        )  # the writer Hilbert-sorts, like OGR's FlatGeobuf driver

        # a foreign file with an index the reader does NOT search (no
        # bbox given): it must skip exactly the packed-R-tree bytes
        # (spec formula).  Write unindexed, then patch the header's
        # index_node_size=0 -> 16 and splice dummy index bytes in.
        from dask_geomodeling_tpu.io.flatgeobuf import write_flatgeobuf

        write_flatgeobuf(frame, path, index_node_size=0)
        raw = open(path, "rb").read()
        header_size = struct.unpack_from("<I", raw, 8)[0]
        head = bytearray(raw[: 12 + header_size])
        marker = struct.pack("<H", 0) + struct.pack("<Q", 3)
        # index_node_size (uint16, written just before features_count)
        idx = bytes(head).rindex(marker)
        head[idx : idx + 2] = struct.pack("<H", 16)
        index = b"\0" * _packed_rtree_size(3, 16)
        patched = bytes(head) + index + raw[12 + header_size :]
        open(path, "wb").write(patched)
        result = read_flatgeobuf(path)
        assert len(result) == 3
        assert sorted(result["value"].tolist()) == [1.5, 2.5, 3.5]

    def test_fgb_single_feature_index_and_nan_column(self, root):
        import struct

        from dask_geomodeling_tpu.io.flatgeobuf import (
            _packed_rtree_size,
            read_flatgeobuf,
            write_flatgeobuf,
        )

        # spec do-while: a single indexed feature still gets a root level
        assert _packed_rtree_size(1, 16) == 80
        # an object column whose FIRST value is missing must still type
        # as string, and a wkt-only crs must roundtrip
        frame = GeoDataFrame(
            pd.DataFrame({"name": [float("nan"), "x"]}),
            geometry=[box(0, 0, 1, 1), box(2, 2, 3, 3)],
            crs="+proj=longlat +ellps=WGS84 +towgs84=0,0,0",
        )
        path = str(root / "one.fgb")
        write_flatgeobuf(frame, path)
        result = read_flatgeobuf(path)
        assert result["name"].tolist()[1] == "x"
        assert pd.isna(result["name"].tolist()[0])
        # non-EPSG CRSes ride the wkt slot as real WKT1 (parseable by
        # spec-conformant readers); it must reparse to the same CRS
        from dask_geomodeling_tpu.geo.crs import get_sr

        assert result.crs.startswith("GEOGCS[")
        assert get_sr(result.crs).is_geographic

    def test_vector_read_cache(self, root, frame):
        """GeometryFileSource parses a file once per mtime, not once per
        request — and cached frames are isolated from request-side
        mutations (crs assignment, reprojection)."""
        from datetime import datetime

        from dask_geomodeling_tpu.geometry.sources import GeometryFileSource
        from dask_geomodeling_tpu.io import vectorfile
        from dask_geomodeling_tpu.runtime import pipeline

        pipeline.clear_read_cache()
        path = root / "cached.geojson"
        frame.crs = "EPSG:4326"
        write_vector(frame, str(path))
        source = GeometryFileSource("cached.geojson")

        calls = []
        real = vectorfile.read_vector

        def counting(p, layer=None):
            calls.append(p)
            return real(p, layer=layer)

        import unittest.mock as mock

        request = dict(
            mode="intersects",
            geometry=box(-1, -1, 11, 11),
            projection="EPSG:4326",
            start=datetime(2000, 1, 1),
        )
        with mock.patch.object(vectorfile, "read_vector", counting):
            first = source.get_data(**request)
            second = source.get_data(**request)
            # a different projection must not see frames poisoned by the
            # previous request's reprojection
            third = source.get_data(
                **dict(request, projection="EPSG:3857",
                       geometry=box(-1e7, -1e7, 1e7, 1e7))
            )
        assert len(calls) == 1  # parsed once, served thrice
        assert len(first["features"]) == 3
        assert len(second["features"]) == 3
        assert len(third["features"]) == 3
        # EPSG:3857 coordinates are metres, far from the degree values
        assert third["features"].geometry.iloc[1].bounds[0] > 100000

        # rewriting the file invalidates the cache: validation compares
        # (st_mtime_ns, st_size), so no artificial utime bump is needed
        # even on coarse-mtime filesystems
        write_vector(frame.iloc[:2], str(path))
        with mock.patch.object(vectorfile, "read_vector", counting):
            fourth = source.get_data(**request)
        assert len(calls) == 2
        assert len(fourth["features"]) == 2

    def test_vector_cache_clear_during_parse(self, root, frame):
        """clear_read_cache() racing an in-flight parse must not break the
        insert that follows (the cache store object survives clear())."""
        from datetime import datetime

        import unittest.mock as mock

        from dask_geomodeling_tpu.geometry.sources import GeometryFileSource
        from dask_geomodeling_tpu.io import vectorfile
        from dask_geomodeling_tpu.runtime import pipeline

        pipeline.clear_read_cache()
        path = root / "race.geojson"
        frame.crs = "EPSG:4326"
        write_vector(frame, str(path))
        source = GeometryFileSource("race.geojson")

        real = vectorfile.read_vector

        def clearing(p, layer=None):
            result = real(p, layer=layer)
            # simulate another thread clearing between miss and insert
            pipeline.clear_read_cache()
            return result

        request = dict(
            mode="intersects",
            geometry=box(-1, -1, 11, 11),
            projection="EPSG:4326",
            start=datetime(2000, 1, 1),
        )
        with mock.patch.object(vectorfile, "read_vector", clearing):
            result = source.get_data(**request)
        assert len(result["features"]) == 3

    def test_parquet_non_epsg_crs_null_in_geo(self, root, frame):
        # GeoParquet 1.0: crs must be a PROJJSON object or null; a bare
        # WKT/proj4 string is invalid.  The original rides our own key.
        import json

        import pyarrow.parquet as pq

        path = str(root / "wktcrs.parquet")
        frame.crs = "+proj=longlat +ellps=intl +towgs84=0,0,0"
        write_vector(frame, path)
        meta = pq.read_table(path).schema.metadata
        geo = json.loads(meta[b"geo"])
        assert geo["columns"]["geometry"]["crs"] is None
        result = read_vector(path)
        assert result.crs == "+proj=longlat +ellps=intl +towgs84=0,0,0"

    def test_fgb_patch_version_ignored(self, root, frame):
        # spec: byte 7 is the patch version and readers must ignore it;
        # GDAL and the flatgeobuf lib emit 0x01 there.
        from dask_geomodeling_tpu.io.flatgeobuf import read_flatgeobuf

        path = str(root / "patch.fgb")
        write_vector(frame, path)
        raw = bytearray(open(path, "rb").read())
        raw[7] = 0x01
        open(path, "wb").write(bytes(raw))
        result = read_flatgeobuf(path)
        assert len(result) == 3
        # but a wrong major version (byte 3) is still rejected
        raw[3] = 0x02
        open(path, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            read_flatgeobuf(path)

    def test_fgb_empty_geometry_decodes_to_none(self):
        import flatbuffers

        from dask_geomodeling_tpu.io.flatgeobuf import (
            _GT_POLYGON,
            _decode_geometry,
            _root,
        )

        # a geometry table with no xy vector and no parts (empty geometry)
        b = flatbuffers.Builder(16)
        b.StartObject(8)
        off = b.EndObject()
        b.Finish(off)
        tab = _root(bytes(b.Output()))
        assert _decode_geometry(tab, _GT_POLYGON) is None

    def test_gpkg_crs(self, root, frame):
        path = str(root / "test.gpkg")
        frame.crs = "EPSG:28992"
        write_vector(frame, path)
        result = read_vector(path)
        assert result.crs == "EPSG:28992"

    def test_gml_crs_and_holes(self, root, frame):
        from dask_geomodeling_tpu.geo.geometry import Polygon

        donut = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10)],
            [[(4, 4), (6, 4), (6, 6), (4, 6)]],
        )
        frame = GeoDataFrame(
            pd.DataFrame({"value": [7]}), geometry=[donut], crs="EPSG:28992"
        )
        path = str(root / "test.gml")
        write_vector(frame, path)
        result = read_vector(path)
        assert result.crs == "EPSG:28992"
        assert result.geometry.iloc[0].equals(donut)
        assert result["value"].tolist() == [7]

    def test_unsupported_format(self, root, frame):
        with pytest.raises(NotImplementedError):
            write_vector(frame, str(root / "test.xyz"))


class TestGeometryFileSource:
    @pytest.fixture
    def source(self, root, frame):
        write_vector(frame, str(root / "data.geojson"))
        return GeometryFileSource("data.geojson")

    def test_columns(self, source):
        assert source.columns == {"geometry", "value", "name"}

    def test_intersects(self, source):
        data = source.get_data(
            mode="intersects", geometry=box(0, 0, 5, 5), projection="EPSG:4326"
        )
        assert len(data["features"]) == 2  # first two boxes intersect

    def test_centroid_mode(self, source):
        data = source.get_data(
            mode="centroid", geometry=box(0, 0, 5, 5), projection="EPSG:4326"
        )
        assert len(data["features"]) == 1  # only centroid (1,1) is within

    def test_extent_mode(self, source):
        data = source.get_data(
            mode="extent", geometry=box(0, 0, 20, 20), projection="EPSG:4326"
        )
        assert data["extent"] == (0.0, 0.0, 10.0, 10.0)

    def test_filters(self, source):
        data = source.get_data(
            mode="intersects",
            geometry=box(0, 0, 20, 20),
            projection="EPSG:4326",
            filters={"name": "b"},
        )
        assert len(data["features"]) == 1
        assert data["features"]["value"].iloc[0] == 2.5

    def test_filters_lookup_unsupported(self, source):
        with pytest.raises(ValueError):
            source.get_data(
                mode="intersects",
                geometry=box(0, 0, 20, 20),
                projection="EPSG:4326",
                filters={"name__in": ["b"]},
            )

    def test_limit(self, source):
        data = source.get_data(
            mode="intersects",
            geometry=box(0, 0, 20, 20),
            projection="EPSG:4326",
            limit=1,
        )
        assert len(data["features"]) == 1

    def test_global_limit(self, source):
        with config.set({"geomodeling.geometry-limit": 2}):
            with pytest.raises(RuntimeError):
                source.get_data(
                    mode="intersects",
                    geometry=box(0, 0, 20, 20),
                    projection="EPSG:4326",
                )

    def test_min_size(self, source):
        data = source.get_data(
            mode="intersects",
            geometry=box(0, 0, 20, 20),
            projection="EPSG:4326",
            min_size=3.0,
        )
        assert len(data["features"]) == 0  # all boxes are 2x2


@pytest.fixture(params=["geojson", "geojsonl", "gpkg", "shp", "gml", "kml", "csv", "parquet", "fgb"])
def vector_format(request):
    return request.param


class TestGeometryFileSourceBehaviors:
    """Ported from reference tests/test_geometry.py:98-278
    (TstGeometryFileSourceBase); like the reference, the suite runs over
    every vector driver."""

    def make_source(self, root, name, polygons, properties=None, fmt="geojson"):
        from dask_geomodeling_tpu.geo.geometry import Polygon

        geoms = [Polygon(p) for p in polygons]
        frame = GeoDataFrame(
            pd.DataFrame(
                properties
                if properties is not None
                else [{"name": "test"} for _ in geoms]
            ),
            geometry=geoms,
            crs="EPSG:4326",
        )
        write_vector(frame, str(root / (name + "." + fmt)))
        return GeometryFileSource(name + "." + fmt)

    @pytest.fixture
    def squares(self, root, vector_format):
        return self.make_source(
            root,
            "squares",
            [
                [(i * 0.1, 0.0), (i * 0.1 + 0.05, 0.0),
                 (i * 0.1 + 0.05, 0.5), (i * 0.1, 0.5)]
                for i in range(10)
            ],
            fmt=vector_format,
        )

    def test_get_data(self, squares):
        result = squares.get_data(
            geometry=box(0, 0, 1, 1), projection="EPSG:4326"
        )
        assert result["projection"] == "EPSG:4326"
        assert len(result["features"]) == 10

    def test_limit(self, squares):
        result = squares.get_data(
            geometry=box(0, 0, 1, 1), projection="EPSG:4326", limit=3
        )
        assert len(result["features"]) == 3

    def test_filters(self, squares):
        result = squares.get_data(
            geometry=box(0, 0, 1, 1), projection="EPSG:4326",
            filters=dict(name="test"),
        )
        assert len(result["features"]) == 10
        result = squares.get_data(
            geometry=box(0, 0, 1, 1), projection="EPSG:4326",
            filters=dict(name="a"),
        )
        assert len(result["features"]) == 0
        # unknown fields are ignored
        result = squares.get_data(
            geometry=box(0, 0, 1, 1), projection="EPSG:4326", filters=dict(a=1)
        )
        assert len(result["features"]) == 10
        # django ORM-style expressions raise
        with pytest.raises(ValueError):
            squares.get_data(
                geometry=box(0, 0, 1, 1), projection="EPSG:4326",
                filters={"name__in": ["tst"]},
            )

    def test_bbox_predicates(self, root):
        square = [(0.5, 0.5), (0.5, 0.6), (0.6, 0.6), (0.6, 0.5)]
        outside = [(x + 1, y) for x, y in square]
        edge = [(x + 0.45, y) for x, y in square]
        source = self.make_source(root, "bbox", [square, outside, edge])

        result = source.get_data(
            geometry=box(0.0, 0.0, 1.0, 1.0), projection="EPSG:4326"
        )
        assert len(result["features"]) == 2  # square and edge
        result = source.get_data(
            geometry=box(0.0, 0.0, 0.9, 1.0), projection="EPSG:4326"
        )
        assert len(result["features"]) == 1  # only square
        # point requests at the 4 corners hit
        for x, y in [(0.5, 0.5), (0.5, 0.6), (0.6, 0.5), (0.6, 0.6)]:
            result = source.get_data(
                geometry=box(x, y, x, y), projection="EPSG:4326"
            )
            assert len(result["features"]) == 1
        # just outside each edge: miss
        for x, y in [(0.49, 0.55), (0.61, 0.6), (0.55, 0.49), (0.6, 0.61)]:
            result = source.get_data(
                geometry=box(x, y, x, y), projection="EPSG:4326"
            )
            assert len(result["features"]) == 0

    def test_size_filter(self, root):
        full = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
        small = [(0.0, 0.0), (0.0, 0.1), (0.1, 0.1), (0.1, 0.0)]
        source = self.make_source(root, "sizes", [full, small])
        for min_size, expected in [(1.1, 0), (0.9, 1), (0, 2)]:
            result = source.get_data(
                geometry=box(0, 0, 1, 1), projection="EPSG:4326",
                min_size=min_size,
            )
            assert len(result["features"]) == expected

    def test_centroid_mode(self, root):
        # intersects the bbox but its centroid lies outside
        triangle = [(0.8, 0.8), (2.0, 0.8), (2.0, 2.0)]
        source = self.make_source(root, "centroid", [triangle])
        result = source.get_data(
            geometry=box(0, 0, 1, 1), projection="EPSG:4326", mode="centroid"
        )
        assert len(result["features"]) == 0
        result = source.get_data(
            geometry=box(0, 0, 1, 1), projection="EPSG:4326"
        )
        assert len(result["features"]) == 1

    def test_reproject(self, squares):
        from dask_geomodeling_tpu.geo import transform_extent

        bbox3857 = transform_extent((0, 0, 1, 1), "EPSG:4326", "EPSG:3857")
        result = squares.get_data(
            geometry=box(*bbox3857), projection="EPSG:3857"
        )
        assert result["projection"] == "EPSG:3857"
        assert result["features"].crs == "EPSG:3857"
        assert len(result["features"]) == 10

    def test_extent_mode(self, squares):
        full = squares.get_data(geometry=box(0, 0, 1, 1), projection="EPSG:4326")
        expected = tuple(full["features"].total_bounds)
        result = squares.get_data(mode="extent", projection="EPSG:4326")
        assert result["projection"] == "EPSG:4326"
        assert tuple(result["extent"]) == pytest.approx(expected)
        # limit does not influence the extent
        result = squares.get_data(mode="extent", projection="EPSG:4326", limit=1)
        assert tuple(result["extent"]) == pytest.approx(expected)

    def test_extent_mode_reproject(self, squares, vector_format):
        if vector_format == "csv":
            # CSV carries no SRS: CRS-less reads are taken as already in
            # the requested projection (OGR's CSV driver drops it too)
            pytest.skip("csv is CRS-less")
        result = squares.get_data(mode="extent", projection="EPSG:3857")
        assert result["projection"] == "EPSG:3857"
        assert result["extent"][2] > 10000.0

    def test_custom_id_field(self, root):
        source_block = self.make_source(
            root,
            "ids",
            [[(0, 0), (1, 0), (1, 1), (0, 1)]] * 2,
            properties=[{"code": 42, "name": "x"}, {"code": 7, "name": "y"}],
        )
        source_block = GeometryFileSource(source_block.url, id_field="code")
        result = source_block.get_data(
            geometry=box(0, 0, 1, 1), projection="EPSG:4326"
        )
        assert set(result["features"].index) == {42, 7}


class TestGeometryFileSink:
    @pytest.fixture
    def source(self, root, frame):
        write_vector(frame, str(root / "data.geojson"))
        return GeometryFileSource("data.geojson")

    @pytest.mark.parametrize(
        "ext",
        ["geojson", "gpkg", "shp", "gml", "parquet", "fgb", "sqlite",
         "topojson"],
    )
    def test_sink(self, root, source, ext):
        sink = GeometryFileSink(source, "out", extension=ext)
        data = sink.get_data(
            mode="intersects", geometry=box(0, 0, 20, 20), projection="EPSG:4326"
        )
        assert data["features"]["saved"].all()
        files = list((root / "out").glob("*." + ext))
        assert len(files) == 1
        result = read_vector(str(files[0]))
        assert len(result) == 3

    def test_to_file(self, root, source):
        target = root / "merged.geojson"
        to_file(source, str(target), projection="EPSG:4326")
        assert target.exists()
        result = read_vector(str(target))
        assert len(result) == 3

    def test_to_file_tiled(self, root, source):
        target = root / "tiled.geojson"
        # tile edges must not coincide with feature centroids (at 1, 5, 9):
        # centroids exactly on a tile edge are in no tile (GEOS 'within'
        # convention, same as the reference)
        to_file(source, str(target), tile_size=4.0, projection="EPSG:4326")
        result = read_vector(str(target))
        assert len(result) == 3  # all features, no duplicates

    def test_fields_mapping(self, root, source):
        sink = GeometryFileSink(
            source, "out", extension="geojson", fields={"renamed": "value"}
        )
        sink.get_data(
            mode="intersects", geometry=box(0, 0, 20, 20), projection="EPSG:4326"
        )
        files = list((root / "out").glob("*.geojson"))
        result = read_vector(str(files[0]))
        assert "renamed" in result.columns
        assert "name" not in result.columns

    def test_validation(self, source):
        with pytest.raises(ValueError):
            GeometryFileSink(source, "out", extension="bogus")
        with pytest.raises(ValueError):
            GeometryFileSink(
                source, "out", extension="geojson", fields={"x": "nope"}
            )


class TestGeometrySinkBehaviors:
    """Ported from reference tests/test_geometry_sinks.py:176-280."""

    @pytest.fixture
    def source(self, root, frame):
        write_vector(frame, str(root / "data.geojson"))
        return GeometryFileSource("data.geojson")

    @pytest.fixture
    def request_all(self):
        return dict(
            mode="intersects", geometry=box(0, 0, 20, 20),
            projection="EPSG:4326",
        )

    def test_fields_non_available(self, source, root):
        with pytest.raises(ValueError):
            GeometryFileSink(
                source, "out", extension="shp",
                fields={"target": "nonexisting"},
            )

    def test_fields_mapping(self, source, root, request_all):
        sink = GeometryFileSink(
            source, "out", extension="geojson",
            fields={"target": "name", "v": "value"},
        )
        sink.get_data(**request_all)
        files = list((root / "out").glob("*.geojson"))
        result = read_vector(str(files[0]))
        assert set(result.columns) == {"geometry", "target", "v"}

    def test_merge_files_cleanup(self, source, root, request_all):
        sink = GeometryFileSink(source, "parts", extension="geojson")
        sink.get_data(**request_all)
        assert (root / "parts").is_dir()
        GeometryFileSink.merge_files(
            str(root / "parts"), str(root / "combined.geojson"),
            remove_source=True,
        )
        assert not (root / "parts").is_dir()
        assert len(read_vector(str(root / "combined.geojson"))) == 3

    def test_with_tiler_writes_only_nonempty_tiles(self, root, request_all):
        from dask_geomodeling_tpu.geometry import GeometryTiler

        # 2 features in a 20x20 request tiled at 10: only 2 of 4 tiles hit
        frame = GeoDataFrame(
            pd.DataFrame({"value": [1, 2]}),
            geometry=[box(1, 1, 3, 3), box(11, 11, 13, 13)],
            crs="EPSG:4326",
        )
        write_vector(frame, str(root / "two.geojson"))
        source = GeometryFileSource("two.geojson")
        block = GeometryTiler(
            GeometryFileSink(source, "tiled_out", extension="geojson"),
            size=10.0,
            projection="EPSG:4326",
        )
        block.get_data(**dict(request_all, mode="centroid"))
        files = list((root / "tiled_out").glob("*.geojson"))
        assert len(files) == 2
        assert all(len(read_vector(str(f))) == 1 for f in files)

    def test_categorical_column(self, source, root, request_all):
        from dask_geomodeling_tpu.geometry import Classify

        with_categorical = source.set(
            "categorical",
            Classify(source["value"], bins=[2.0], labels=["A", "B"]),
        )
        sink = GeometryFileSink(
            with_categorical, "cat_out", extension="geojson",
            fields={"label": "categorical"},
        )
        sink.get_data(**request_all)
        files = list((root / "cat_out").glob("*.geojson"))
        result = read_vector(str(files[0]))
        assert sorted(result["label"].tolist()) == ["A", "B", "B"]

    def test_to_file_dry_run(self, source, root, request_all):
        target = root / "dry.geojson"
        to_file(source, str(target), dry_run=True, **request_all)
        assert not target.exists()


class TestGpxEdgeCases:
    def test_empty_ele_tolerated(self, root):
        gpx = """<?xml version="1.0"?>
<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="1.0" lon="2.0"><ele/><name>a</name></wpt>
  <wpt lat="1.5" lon="2.5"><ele>  </ele></wpt>
</gpx>"""
        path = root / "ele.gpx"
        path.write_text(gpx)
        frame = read_vector(str(path))
        assert len(frame) == 2
        assert "ele" not in frame.columns or frame["ele"].isna().all()

    def test_no_ele_inside_trk(self, root):
        """trkType has no <ele> child: line rows must not emit one."""
        from dask_geomodeling_tpu.geo.geometry import LineString

        frame = GeoDataFrame(
            pd.DataFrame({"ele": [12.5], "name": ["l"]}),
            geometry=[LineString([(0.0, 0.0), (1.0, 1.0)])],
            crs="EPSG:4326",
        )
        out = str(root / "line.gpx")
        write_vector(frame, out)
        text = open(out).read()
        assert "<ele>" not in text
        assert "<name>l</name>" in text


def test_geojson_legacy_crs_member(tmp_path):
    """Pre-RFC-7946 GeoJSON with a named crs member (OGC URN) reads in
    that CRS, like OGR."""
    import json

    from dask_geomodeling_tpu.io.vectorfile import read_vector

    collection = {
        "type": "FeatureCollection",
        "crs": {
            "type": "name",
            "properties": {"name": "urn:ogc:def:crs:EPSG::28992"},
        },
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [155000.0, 463000.0]},
            "properties": {"v": 1},
        }],
    }
    path = str(tmp_path / "legacy.geojson")
    with open(path, "w") as f:
        json.dump(collection, f)
    frame = read_vector(path)
    assert frame.crs == "EPSG:28992"
    # unknown identifiers keep the RFC 7946 default instead of raising
    collection["crs"]["properties"]["name"] = "urn:example:nonsense"
    with open(path, "w") as f:
        json.dump(collection, f)
    assert read_vector(path).crs != "EPSG:28992"


def test_gml_urn_srsname(tmp_path):
    """GML with an OGC-URN srsName normalizes to the canonical EPSG id."""
    from dask_geomodeling_tpu.io.vectorfile import read_vector

    gml = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
  <gml:featureMember>
    <feature>
      <name>a</name>
      <geom><gml:Point srsName="urn:ogc:def:crs:EPSG::28992">
        <gml:coordinates>155000,463000</gml:coordinates>
      </gml:Point></geom>
    </feature>
  </gml:featureMember>
</gml:FeatureCollection>
"""
    path = str(tmp_path / "urn.gml")
    with open(path, "w") as f:
        f.write(gml)
    frame = read_vector(path)
    assert frame.crs == "EPSG:28992"


class TestDbfEncoding:
    """OGR encoding precedence: .cpg sidecar > DBF LDID byte > cp1252."""

    def _write(self, tmp_path, text):
        from dask_geomodeling_tpu.io.vectorfile import write_vector

        path = str(tmp_path / "enc.shp")
        frame = GeoDataFrame(
            {"geometry": [Point(1, 1)], "name": [text]}, crs="EPSG:4326"
        )
        write_vector(frame, path)
        return path

    def test_ldid_fallback(self, tmp_path):
        import os

        from dask_geomodeling_tpu.io.vectorfile import read_vector

        text = "Жук"  # Cyrillic, 6 bytes utf-8 / 3 cp1251
        path = self._write(tmp_path, text)
        base = os.path.splitext(path)[0]
        os.remove(base + ".cpg")
        with open(base + ".dbf", "rb") as f:
            raw = f.read()
        assert text.encode("utf-8") in raw
        raw = raw.replace(
            text.encode("utf-8"), text.encode("cp1251") + b"   "
        )
        raw = raw[:29] + bytes([0xC9]) + raw[30:]  # LDID: cp1251
        with open(base + ".dbf", "wb") as f:
            f.write(raw)
        frame = read_vector(path)
        assert frame["name"].tolist() == [text]

    def test_cpg_wins_over_ldid(self, tmp_path):
        import os

        from dask_geomodeling_tpu.io.vectorfile import read_vector

        text = "café"
        path = self._write(tmp_path, text)
        base = os.path.splitext(path)[0]
        # declare a bogus LDID; the UTF-8 .cpg written alongside wins
        with open(base + ".dbf", "rb") as f:
            raw = f.read()
        raw = raw[:29] + bytes([0xC9]) + raw[30:]
        with open(base + ".dbf", "wb") as f:
            f.write(raw)
        frame = read_vector(path)
        assert frame["name"].tolist() == [text]

    def test_no_cpg_no_ldid_defaults_cp1252(self, tmp_path):
        import os

        from dask_geomodeling_tpu.io.vectorfile import read_vector

        text = "café"
        path = self._write(tmp_path, text)
        base = os.path.splitext(path)[0]
        os.remove(base + ".cpg")
        with open(base + ".dbf", "rb") as f:
            raw = f.read()
        raw = raw.replace(
            text.encode("utf-8"), text.encode("cp1252") + b" "
        )
        assert raw[29] == 0
        with open(base + ".dbf", "wb") as f:
            f.write(raw)
        frame = read_vector(path)
        assert frame["name"].tolist() == [text]


def test_dbf_date_and_float_fields(tmp_path):
    """DBF D (date) and F (float) field types roundtrip/parse (OGR types)."""
    import struct as _struct

    from dask_geomodeling_tpu.io.vectorfile import read_vector, write_vector

    path = str(tmp_path / "typed.shp")
    frame = GeoDataFrame(
        {
            "geometry": [Point(1, 1), Point(2, 2)],
            "when": pd.to_datetime(["2026-08-17", "1999-12-31"]),
            "name": ["a", "b"],
        },
        crs="EPSG:4326",
    )
    write_vector(frame, path)
    back = read_vector(path)
    assert back["when"].tolist() == [
        pd.Timestamp(2026, 8, 17), pd.Timestamp(1999, 12, 31)
    ]
    # foreign F-type field: patch the descriptor of a numeric column
    base = path[:-4]
    frame2 = GeoDataFrame(
        {"geometry": [Point(1, 1)], "v": [2.5]}, crs="EPSG:4326"
    )
    write_vector(frame2, str(tmp_path / "f.shp"))
    dbf = str(tmp_path / "f.dbf")
    with open(dbf, "rb") as f:
        raw = bytearray(f.read())
    # first field descriptor starts at byte 32; type byte at offset 11
    assert raw[32 + 11 : 32 + 12] == b"N"
    raw[32 + 11] = ord("F")
    with open(dbf, "wb") as f:
        f.write(bytes(raw))
    back2 = read_vector(str(tmp_path / "f.shp"))
    assert back2["v"].tolist() == [2.5]
