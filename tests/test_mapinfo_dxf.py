"""MapInfo MIF/MID and AutoCAD DXF vector codecs (formats the reference
reads through OGR's drivers, reference geometry/sources.py:95)."""
import numpy as np
import pandas as pd
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.geo.features import GeoDataFrame
from dask_geomodeling_tpu.geo.geometry import (
    LineString,
    MultiLineString,
    MultiPoint,
    Point,
    Polygon,
    box,
)
from dask_geomodeling_tpu.io.dxf import read_dxf, write_dxf
from dask_geomodeling_tpu.io.mapinfo import read_mif, write_mif
from dask_geomodeling_tpu.io.vectorfile import read_vector, write_vector


@pytest.fixture()
def root(tmp_path):
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path


@pytest.fixture()
def frame():
    return GeoDataFrame(
        pd.DataFrame(
            {"name": ["a", "b", "c"], "value": [1.5, 2.5, 3.5], "n": [1, 2, 3]}
        ),
        geometry=[box(0, 0, 2, 2), Point(5, 5), box(8, 8, 10, 10)],
        crs="EPSG:4326",
    )


class TestMif:
    def test_roundtrip(self, root, frame):
        path = str(root / "test.mif")
        write_mif(frame, path)
        result = read_mif(path)
        assert result["name"].tolist() == ["a", "b", "c"]
        assert result["value"].tolist() == [1.5, 2.5, 3.5]
        assert result["n"].tolist() == [1, 2, 3]
        assert result.geometry.iloc[0].equals(box(0, 0, 2, 2))
        assert result.geometry.iloc[1].equals(Point(5, 5))
        assert result.crs == "EPSG:4326"

    def test_via_vectorfile_dispatch(self, root, frame):
        path = str(root / "disp.mif")
        write_vector(frame, path)
        result = read_vector(path)
        assert len(result) == 3

    def test_line_and_multi_geometries(self, root):
        frame = GeoDataFrame(
            pd.DataFrame({"id": [1, 2, 3]}),
            geometry=[
                LineString([(0, 0), (1, 1), (2, 0)]),
                MultiLineString(
                    [
                        LineString([(0, 0), (1, 0)]),
                        LineString([(0, 1), (1, 1)]),
                    ]
                ),
                MultiPoint([Point(3, 3), Point(4, 4)]),
            ],
            crs="EPSG:4326",
        )
        path = str(root / "lines.mif")
        write_mif(frame, path)
        result = read_mif(path)
        assert result.geometry.iloc[0].geom_type == "LineString"
        assert result.geometry.iloc[1].geom_type == "MultiLineString"
        assert result.geometry.iloc[2].geom_type == "MultiPoint"
        assert list(result.geometry.iloc[0].coords) == [
            (0.0, 0.0), (1.0, 1.0), (2.0, 0.0),
        ]

    def test_polygon_with_hole(self, root):
        poly = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
            [[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]],
        )
        frame = GeoDataFrame(
            pd.DataFrame({"id": [1]}), geometry=[poly], crs="EPSG:4326"
        )
        path = str(root / "hole.mif")
        write_mif(frame, path)
        result = read_mif(path)
        got = result.geometry.iloc[0]
        assert got.geom_type == "Polygon"
        assert len(got.interiors) == 1
        assert abs(got.area - poly.area) < 1e-9

    def test_multipolygon_region_grouping(self, root):
        """A Region with several disjoint rings is a MULTIPOLYGON, not
        one polygon with the other parts as holes; nested rings group by
        even-odd containment (GDAL's Region semantics)."""
        from dask_geomodeling_tpu.geo.geometry import MultiPolygon

        donut = Polygon(
            [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
            [[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]],
        )
        island = box(20, 20, 22, 22)
        multi = MultiPolygon([donut, island])
        frame = GeoDataFrame(
            pd.DataFrame({"id": [1]}), geometry=[multi], crs="EPSG:4326"
        )
        path = str(root / "multi.mif")
        write_mif(frame, path)
        result = read_mif(path)
        got = result.geometry.iloc[0]
        assert got.geom_type == "MultiPolygon"
        assert abs(got.area - multi.area) < 1e-9
        parts = sorted(got.geoms, key=lambda p: p.area)
        assert abs(parts[0].area - 4.0) < 1e-9  # the island
        assert len(parts[1].interiors) == 1  # the donut kept its hole

    def test_foreign_mif_with_styling(self, root):
        # a hand-written file with Pen/Brush clauses and a Rect, as
        # MapInfo exports them
        (root / "styled.mif").write_text(
            "Version 300\n"
            'Charset "Neutral"\n'
            'Delimiter ","\n'
            "CoordSys Earth Projection 1, 104\n"
            "Columns 1\n"
            "  id Integer\n"
            "Data\n"
            "\n"
            "Rect 1 2 5 8\n"
            "    Pen (1,2,0)\n"
            "    Brush (2,16777215,16777215)\n"
            "Point 3 4\n"
            "    Symbol (34,0,12)\n"
        )
        (root / "styled.mid").write_text("7\n9\n")
        result = read_mif(str(root / "styled.mif"))
        assert len(result) == 2
        assert result["id"].tolist() == [7, 9]
        assert result.geometry.iloc[0].equals(box(1, 2, 5, 8))

    def test_delimiter_inside_quoted_string(self, root):
        """A comma inside a quoted string value must survive the MID
        round trip (review finding: naive split corrupted rows)."""
        frame = GeoDataFrame(
            pd.DataFrame({"name": ['a, "b"', "plain"], "n": [7, 9]}),
            geometry=[Point(1, 1), Point(2, 2)],
            crs="EPSG:4326",
        )
        path = str(root / "quoted.mif")
        write_mif(frame, path)
        result = read_mif(path)
        assert result["name"].tolist() == ['a, "b"', "plain"]
        assert result["n"].tolist() == [7, 9]

    def test_sink_merge_single_partial_keeps_mid(self, root, frame):
        """merge_files with ONE MIF partial must move the .mid sidecar
        too (review finding: attributes were lost)."""
        import os

        from dask_geomodeling_tpu.geometry.sinks import GeometryFileSink
        from dask_geomodeling_tpu.io.vectorfile import write_vector

        write_vector(frame, str(root / "src.geojson"))
        from dask_geomodeling_tpu.geometry.sources import GeometryFileSource

        source = GeometryFileSource("src.geojson")
        sink = GeometryFileSink(source, "partials", extension="mif")
        from datetime import datetime

        sink.get_data(
            mode="intersects",
            geometry=box(-1, -1, 11, 11),
            projection="EPSG:4326",
            start=datetime(2000, 1, 1),
        )
        GeometryFileSink.merge_files(
            "partials", "merged.mif", remove_source=True
        )
        merged = read_vector(str(root / "merged.mif"))
        assert merged["name"].tolist() == ["a", "b", "c"]
        assert not os.path.exists(str(root / "partials"))

    def test_nonearth_crs_preserved(self, root, frame):
        frame.crs = "EPSG:28992"
        path = str(root / "ne.mif")
        write_mif(frame, path)
        result = read_mif(path)
        # projected CRSes ride as NonEarth; geometry still round-trips
        assert result.geometry.iloc[1].equals(Point(5, 5))


class TestDxf:
    def test_roundtrip(self, root, frame):
        path = str(root / "test.dxf")
        write_dxf(frame, path)
        result = read_dxf(path)
        assert len(result) == 3
        assert result.geometry.iloc[0].geom_type == "Polygon"
        assert result.geometry.iloc[1].equals(Point(5, 5))
        assert abs(result.geometry.iloc[0].area - 4.0) < 1e-9
        assert result["Layer"].tolist() == ["0", "0", "0"]

    def test_layer_column_travels(self, root):
        frame = GeoDataFrame(
            pd.DataFrame({"Layer": ["roads", "water"]}),
            geometry=[
                LineString([(0, 0), (5, 5)]),
                box(1, 1, 2, 2),
            ],
        )
        path = str(root / "layers.dxf")
        write_dxf(frame, path)
        result = read_dxf(path)
        assert result["Layer"].tolist() == ["roads", "water"]

    def test_via_vectorfile_dispatch(self, root, frame):
        path = str(root / "disp.dxf")
        write_vector(frame, path)
        result = read_vector(path)
        assert len(result) == 3

    def test_foreign_entities(self, root):
        # classic POLYLINE/VERTEX/SEQEND + CIRCLE + LINE, as CAD tools emit
        content = "\n".join(
            [
                "0", "SECTION", "2", "ENTITIES",
                "0", "LINE", "8", "walls",
                "10", "0", "20", "0", "11", "3", "21", "4",
                "0", "POLYLINE", "8", "area", "70", "1",
                "0", "VERTEX", "10", "0", "20", "0",
                "0", "VERTEX", "10", "4", "20", "0",
                "0", "VERTEX", "10", "4", "20", "4",
                "0", "SEQEND",
                "0", "CIRCLE", "8", "round",
                "10", "10", "20", "10", "40", "2",
                "0", "ENDSEC", "0", "EOF",
            ]
        )
        (root / "cad.dxf").write_text(content)
        result = read_dxf(str(root / "cad.dxf"))
        assert len(result) == 3
        kinds = [g.geom_type for g in result.geometry]
        assert kinds == ["LineString", "Polygon", "Polygon"]
        # the closed POLYLINE triangle has area 8
        assert abs(result.geometry.iloc[1].area - 8.0) < 1e-9
        # the densified circle approximates pi r^2
        assert abs(result.geometry.iloc[2].area - np.pi * 4) < 0.1
        assert result["Layer"].tolist() == ["walls", "area", "round"]
