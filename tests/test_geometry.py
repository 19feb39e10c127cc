"""Geometry block tests (modeled on reference tests/test_geometry.py and
test_field_operations coverage)."""
import numpy as np
import pandas as pd
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.geo.geometry import Point, box
from dask_geomodeling_tpu.geometry import (
    Area,
    Buffer,
    Choose,
    Classify,
    ClassifyFromColumns,
    Difference,
    GeometryWKTSource,
    GeometryTiler,
    GetSeriesBlock,
    Interp,
    Intersection,
    MergeGeometryBlocks,
    ParseTextColumn,
    Round,
    SetSeriesBlock,
    Simplify,
    Where,
)
from dask_geomodeling_tpu.geometry import field_operations as field_ops
from tests.factories import MockGeometry

SQUARE1 = [(0, 0), (10, 0), (10, 10), (0, 10)]
SQUARE2 = [(20, 20), (30, 20), (30, 30), (20, 30)]


@pytest.fixture
def source():
    return MockGeometry(
        polygons=[SQUARE1, SQUARE2],
        properties=[
            {"id": 1, "value": 4.0, "name": "a"},
            {"id": 2, "value": 8.0, "name": "b"},
        ],
    )


@pytest.fixture
def request_all():
    return dict(
        mode="intersects", geometry=box(0, 0, 50, 50), projection="EPSG:3857"
    )


class TestSeriesBlocks:
    def test_get_series(self, source, request_all):
        series = GetSeriesBlock(source, "value")
        data = series.get_data(**request_all)
        assert isinstance(data, pd.Series)
        assert data.tolist() == [4.0, 8.0]

    def test_get_series_missing_column(self, source):
        with pytest.raises(KeyError):
            GetSeriesBlock(source, "bogus")

    def test_set_series(self, source, request_all):
        series = GetSeriesBlock(source, "value")
        view = SetSeriesBlock(source, "doubled", field_ops.Multiply(series, 2))
        data = view.get_data(**request_all)
        assert data["features"]["doubled"].tolist() == [8.0, 16.0]

    def test_set_constant(self, source, request_all):
        view = SetSeriesBlock(source, "constant", 7)
        data = view.get_data(**request_all)
        assert (data["features"]["constant"] == 7).all()

    def test_getitem_set_sugar(self, source, request_all):
        view = source.set("sum", source["value"] + 1)
        data = view.get_data(**request_all)
        assert data["features"]["sum"].tolist() == [5.0, 9.0]


class TestFieldOperations:
    def _series(self, source):
        return GetSeriesBlock(source, "value")

    @pytest.mark.parametrize(
        "cls,arg,expected",
        [
            (field_ops.Add, 1, [5.0, 9.0]),
            (field_ops.Subtract, 1, [3.0, 7.0]),
            (field_ops.Multiply, 2, [8.0, 16.0]),
            (field_ops.Divide, 2, [2.0, 4.0]),
            (field_ops.FloorDivide, 3, [1.0, 2.0]),
            (field_ops.Power, 2, [16.0, 64.0]),
            (field_ops.Modulo, 3, [1.0, 2.0]),
        ],
    )
    def test_arithmetic(self, source, request_all, cls, arg, expected):
        series = cls(self._series(source), arg)
        assert series.get_data(**request_all).tolist() == expected

    @pytest.mark.parametrize(
        "cls,arg,expected",
        [
            (field_ops.Equal, 4.0, [True, False]),
            (field_ops.NotEqual, 4.0, [False, True]),
            (field_ops.Greater, 4.0, [False, True]),
            (field_ops.GreaterEqual, 4.0, [True, True]),
            (field_ops.Less, 8.0, [True, False]),
            (field_ops.LessEqual, 8.0, [True, True]),
        ],
    )
    def test_comparison(self, source, request_all, cls, arg, expected):
        series = cls(self._series(source), arg)
        assert series.get_data(**request_all).tolist() == expected

    def test_logic(self, source, request_all):
        series = self._series(source)
        cond1 = field_ops.Greater(series, 2)
        cond2 = field_ops.Less(series, 5)
        assert field_ops.And(cond1, cond2).get_data(**request_all).tolist() == [
            True,
            False,
        ]
        assert field_ops.Or(cond1, cond2).get_data(**request_all).tolist() == [
            True,
            True,
        ]
        assert field_ops.Xor(cond1, cond2).get_data(**request_all).tolist() == [
            False,
            True,
        ]
        assert field_ops.Invert(cond1).get_data(**request_all).tolist() == [
            False,
            False,
        ]

    def test_where_and_mask(self, source, request_all):
        series = self._series(source)
        cond = field_ops.Greater(series, 5)
        where = Where(series, cond, 0.0)
        assert where.get_data(**request_all).tolist() == [0.0, 8.0]
        mask = field_ops.Mask(series, cond, 0.0)
        assert mask.get_data(**request_all).tolist() == [4.0, 0.0]

    def test_round(self, source, request_all):
        series = field_ops.Divide(self._series(source), 3)
        assert Round(series, 1).get_data(**request_all).tolist() == [1.3, 2.7]

    def test_interp(self, source, request_all):
        series = self._series(source)
        interp = Interp(series, xp=[0, 10], fp=[0, 100])
        assert interp.get_data(**request_all).tolist() == [40.0, 80.0]

    def test_choose(self, source, request_all):
        index = field_ops.Subtract(self._series(source) / 4, 1)  # [0, 1]
        a = field_ops.Multiply(self._series(source), 10)
        b = field_ops.Multiply(self._series(source), 100)
        chosen = Choose(index, a, b)
        assert chosen.get_data(**request_all).tolist() == [40.0, 800.0]

    def test_classify(self, source, request_all):
        series = self._series(source)
        classify = Classify(series, bins=[5], labels=["low", "high"])
        assert classify.get_data(**request_all).tolist() == ["low", "high"]

    def test_classify_closed_bins(self, source, request_all):
        series = self._series(source)
        classify = Classify(series, bins=[0, 5, 10], labels=["low", "high"])
        assert classify.get_data(**request_all).tolist() == ["low", "high"]

    def test_classify_validation(self, source):
        series = self._series(source)
        with pytest.raises(ValueError):
            Classify(series, bins=[5, 3], labels=["a", "b", "c"])
        with pytest.raises(ValueError):
            Classify(series, bins=[3, 5], labels=["a", "b"])

    def test_classify_from_columns(self, request_all):
        source = MockGeometry(
            polygons=[SQUARE1, SQUARE2],
            properties=[
                {"id": 1, "value": 4.0, "low": 0.0, "high": 5.0},
                {"id": 2, "value": 8.0, "low": 5.0, "high": 7.0},
            ],
        )
        classify = ClassifyFromColumns(
            source, "value", ["low", "high"], ["A", "B", "C"]
        )
        assert classify.get_data(**request_all).tolist() == ["B", "C"]


class TestSetOperations:
    def test_intersection(self, source, request_all):
        request = dict(request_all, geometry=box(0, 0, 5, 5))
        data = Intersection(source).get_data(**request)
        features = data["features"]
        assert len(features) == 1
        assert features.geometry.iloc[0].area == pytest.approx(25.0)

    def test_difference(self, request_all):
        a = MockGeometry([SQUARE1], properties=[{"id": 1}])
        b = MockGeometry([[(5, 5), (15, 5), (15, 15), (5, 15)]], properties=[{"id": 1}])
        data = Difference(a, b).get_data(**request_all)
        assert data["features"].geometry.iloc[0].area == pytest.approx(75.0)

    def test_difference_missing_in_b(self, request_all):
        a = MockGeometry([SQUARE1], properties=[{"id": 1}])
        b = MockGeometry([SQUARE2], properties=[{"id": 99}])
        data = Difference(a, b).get_data(**request_all)
        # index 1 is missing in b: geometry passes through unchanged
        assert data["features"].geometry.iloc[0].area == pytest.approx(100.0)

    # ported from reference tests/test_geometry.py:341-425
    def test_intersection_with_request(self):
        request = dict(
            mode="intersects", projection="EPSG:3857", geometry=box(0, 0, 1, 1)
        )
        source = MockGeometry([((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0))])
        view = Intersection(source)
        result = view.get_data(**request)
        assert result["features"]["geometry"].iloc[0].area == pytest.approx(1.0)
        result = view.get_data(**dict(request, mode="extent"))
        assert tuple(result["extent"]) == (0.0, 0.0, 1.0, 1.0)

    def test_difference_scopes_other_request(self):
        request = dict(
            mode="intersects", projection="EPSG:3857", geometry=box(0, 0, 1, 1)
        )
        source = MockGeometry([((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0))])
        other = MockGeometry([((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0))])
        view = Difference(source, other)
        # the request to other carries the source's extent as geometry
        sar = view.get_sources_and_requests(**request)
        assert sar[-1][1]["geometry"].area == pytest.approx(4.0)
        result = view.get_data(**request)
        assert len(result["features"]) == 1
        assert result["features"]["geometry"].iloc[0].area == pytest.approx(3.0)

    def test_difference_with_empty_source(self):
        request = dict(
            mode="intersects", projection="EPSG:3857", geometry=box(0, 0, 1, 1)
        )
        source = MockGeometry([((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0))])
        view = Difference(MockGeometry([]), source)
        # no request is issued when the source is empty
        sar = view.get_sources_and_requests(**request)
        assert len(sar) == 1
        assert sar[0][1] is None
        assert len(view.get_data(**request)["features"]) == 0

    def test_difference_with_empty_other(self):
        request = dict(
            mode="intersects", projection="EPSG:3857", geometry=box(0, 0, 1, 1)
        )
        source = MockGeometry([((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0))])
        view = Difference(source, MockGeometry([]))
        result = view.get_data(**request)
        assert len(result["features"]) == 1
        assert result["features"]["geometry"].iloc[0].area == pytest.approx(4.0)


class TestConstructive:
    def test_buffer(self, source, request_all):
        data = Buffer(source, 1.0, "EPSG:3857").get_data(**request_all)
        areas = [g.area for g in data["features"].geometry]
        assert areas[0] > 100.0  # grew

    def test_buffer_validation(self, source):
        with pytest.raises(TypeError):
            Buffer(source, "a lot", "EPSG:3857")

    def test_simplify(self, request_all):
        # polygon with a redundant vertex on an edge
        poly = [(0, 0), (5, 0.0001), (10, 0), (10, 10), (0, 10)]
        source = MockGeometry([poly], properties=[{"id": 1}])
        data = Simplify(source, tolerance=0.01).get_data(**request_all)
        simplified = data["features"].geometry.iloc[0]
        assert len(simplified.exterior.coords) == 5  # closed square


class TestBufferBehaviors:
    """Ported from reference tests/test_geometry.py:589-678; this framework
    buffers via the distance field (round corners at any resolution), so
    areas are asserted against the circular-arc buffer."""

    def test_buffer_square(self):
        source = Buffer(
            MockGeometry([((1, 1), (2, 1), (2, 2), (1, 2))]),
            distance=1.0,
            projection="EPSG:3857",
        )
        request = dict(
            mode="intersects", projection="EPSG:3857", geometry=box(0, 0, 10, 10)
        )
        data = source.get_data(**request)
        # unit square + distance-1 round buffer: 1 + 4·1 + π·1²
        expected = 1 + 4 + np.pi
        assert data["features"].geometry.area.iloc[0] == pytest.approx(
            expected, rel=0.02
        )

    def test_buffer_transform(self):
        from dask_geomodeling_tpu.utils import shapely_transform

        polygon = (
            (155000, 463000),
            (155001, 463000),
            (155001, 463001),
            (155000, 463001),
        )
        source = Buffer(
            MockGeometry([polygon], projection="EPSG:28992"),
            distance=0.1,
            projection="EPSG:28992",
        )
        # request WGS84 to force a transform of the buffered geometry
        request = dict(
            mode="intersects", projection="EPSG:4326", geometry=box(4, 51, 7, 53)
        )
        data = source.get_data(**request)
        actual = shapely_transform(
            data["features"].geometry.iloc[0], "EPSG:4326", "EPSG:28992"
        ).area
        expected = 1 + 4 * 0.1 + np.pi * 0.1**2
        assert actual == pytest.approx(expected, rel=0.02)

    def test_buffer_extent_mode(self):
        polygon = (
            (155000, 463000),
            (156000, 463000),
            (156000, 464000),
            (155000, 464000),
        )
        source = Buffer(
            MockGeometry([polygon], projection="EPSG:28992"),
            distance=10,
            projection="EPSG:28992",
        )
        request = dict(
            mode="extent", projection="EPSG:4326", geometry=box(4, 51, 7, 53)
        )
        data = source.get_data(**request)
        # reference values (pyproj); our Helmert datum shift differs by <1m
        expected = (
            5.38705742335229,
            52.15508055768161,
            5.401968302292468,
            52.16425103224139,
        )
        np.testing.assert_allclose(data["extent"], expected, atol=5e-5)

    def test_buffer_empty(self):
        source = Buffer(MockGeometry([]), distance=1.0, projection="EPSG:3857")
        request = dict(
            mode="intersects", projection="EPSG:3857", geometry=box(0, 0, 10, 10)
        )
        assert len(source.get_data(**request)["features"]) == 0
        assert source.get_data(**dict(request, mode="extent"))["extent"] is None


class TestGeomOperations:
    def test_area(self, source, request_all):
        data = Area(source, "EPSG:3857").get_data(**request_all)
        assert data.tolist() == [100.0, 100.0]


class TestMerge:
    def test_merge_inner(self, source, request_all):
        left = SetSeriesBlock(source, "x", 1)
        right = SetSeriesBlock(source, "y", 2)
        merged = MergeGeometryBlocks(left, right, how="inner")
        data = merged.get_data(**request_all)
        features = data["features"]
        assert "x" in features.columns
        assert "y" in features.columns
        assert len(features) == 2

    def test_merge_suffixes(self, source, request_all):
        merged = MergeGeometryBlocks(source, source, suffixes=("_l", "_r"))
        data = merged.get_data(**request_all)
        assert "value_l" in data["features"].columns
        assert "value_r" in data["features"].columns

    def test_merge_extent(self, source, request_all):
        merged = MergeGeometryBlocks(source, source, how="outer")
        data = merged.get_data(**dict(request_all, mode="extent"))
        assert data["extent"] == (0.0, 0.0, 30.0, 30.0)

    def test_merge_validation(self, source):
        with pytest.raises(KeyError):
            MergeGeometryBlocks(source, source, how="sideways")

    # ported from reference tests/test_geometry.py:860-935
    def test_merge_extent_variants(self):
        request = dict(
            geometry=box(0, 0, 10, 10), mode="extent", projection="EPSG:3857"
        )
        source_1 = MockGeometry([((2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 3.0))])
        source_2 = MockGeometry([((3.0, 3.0), (4.0, 3.0), (4.0, 4.0), (3.0, 4.0))])
        empty = MockGeometry([])
        source_4 = MockGeometry([((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0))])

        # inner join: extents intersect at the shared corner
        result = MergeGeometryBlocks(source_1, source_2, how="inner").get_data(
            **request
        )
        assert tuple(result["extent"]) == (3.0, 3.0, 3.0, 3.0)
        # inner join, no intersection: None
        result = MergeGeometryBlocks(source_1, source_4, how="inner").get_data(
            **request
        )
        assert result["extent"] is None
        # outer join, no intersection: union
        result = MergeGeometryBlocks(source_1, source_4, how="outer").get_data(
            **request
        )
        assert tuple(result["extent"]) == (2.0, 2.0, 6.0, 6.0)
        # inner join with one empty: None
        result = MergeGeometryBlocks(source_1, empty, how="inner").get_data(
            **request
        )
        assert result["extent"] is None
        # outer join with one empty: the other's extent
        result = MergeGeometryBlocks(source_1, empty, how="outer").get_data(
            **request
        )
        assert tuple(result["extent"]) == (2.0, 2.0, 3.0, 3.0)

    def test_merge_empty_source(self, source, request_all):
        merged = MergeGeometryBlocks(source, MockGeometry([]), how="inner")
        data = merged.get_data(**request_all)
        assert data["features"].empty


class TestParseTextColumn:
    def test_parse(self, request_all):
        source = MockGeometry(
            polygons=[SQUARE1, SQUARE2],
            properties=[
                {"id": 1, "description": "depth=1.2\nquality=good"},
                {"id": 2, "description": "depth=3.4\nquality=bad"},
            ],
        )
        parsed = ParseTextColumn(
            source, "description", {"depth": "depth_m", "quality": "qual"}
        )
        assert parsed.columns == {"geometry", "description", "depth_m", "qual"}
        data = parsed.get_data(**request_all)
        features = data["features"]
        assert features["depth_m"].tolist() == [1.2, 3.4]
        assert features["qual"].tolist() == ["good", "bad"]

    def test_autocast(self):
        from dask_geomodeling_tpu.geometry.text import autocast_value

        assert autocast_value("1.5") == 1.5
        assert autocast_value("true") is True
        assert autocast_value("null") is None
        assert autocast_value("abc") == "abc"

    # ported from reference tests/test_geometry.py:1492-1650
    KEY_MAPPING = {
        "modelname": "model_name",
        "duration": "rainfall_duration",
        "strength": "rainfall_strength",
        "ahn2": "ahn2_used",
    }
    DESCRIPTION = (
        "\nSimulation of Rotterdam"
        "\n\nmodelname=rotterdam 01"
        "\nduration=120\nstrength=70\nahn2=true"
    )
    EXPECTED = {
        "model_name": "rotterdam 01",
        "rainfall_duration": 120,
        "rainfall_strength": 70,
        "ahn2_used": True,
    }

    def make(self, descriptions):
        source = MockGeometry(
            polygons=[SQUARE1] * len(descriptions),
            properties=[
                {"id": i + 1, "description": d}
                for i, d in enumerate(descriptions)
            ],
        )
        return ParseTextColumn(source, "description", self.KEY_MAPPING)

    def test_parser_results(self, request_all):
        data = self.make([self.DESCRIPTION]).get_data(**request_all)["features"]
        for col, expected in self.EXPECTED.items():
            assert data.loc[1, col] == expected

    def test_parser_empty_description(self, request_all):
        data = self.make([None]).get_data(**request_all)["features"]
        for col in self.EXPECTED:
            assert pd.isna(data.loc[1, col])

    def test_parser_empty_one_description(self, request_all):
        data = self.make([None, self.DESCRIPTION]).get_data(
            **request_all
        )["features"]
        for col, expected in self.EXPECTED.items():
            assert pd.isna(data.loc[1, col])
            assert data.loc[2, col] == expected

    def test_parser_two_different(self, request_all):
        other = (
            "\nSimulation of Groningen"
            "\n\nmodelname=groningen 01"
            "\nduration=60\nstrength=120\nahn2=false"
        )
        data = self.make([self.DESCRIPTION, other]).get_data(
            **request_all
        )["features"]
        expected2 = {
            "model_name": "groningen 01",
            "rainfall_duration": 60,
            "rainfall_strength": 120,
            "ahn2_used": False,
        }
        for col in self.EXPECTED:
            assert data.loc[1, col] == self.EXPECTED[col]
            assert data.loc[2, col] == expected2[col]

    def test_parser_missing_and_null_keys(self, request_all):
        description = (
            "\nSimulation of Utrecht"
            "\n\nmodelname=null"
            "\nduration=60\nstrength=120"
        )
        record = self.make([description]).get_data(**request_all)[
            "features"
        ].iloc[0]
        assert pd.isna(record["model_name"])  # explicit null
        assert record["rainfall_duration"] == 60
        assert record["rainfall_strength"] == 120
        assert pd.isna(record["ahn2_used"])  # missing key

    def test_parser_into_same_column(self, request_all):
        source = MockGeometry(
            polygons=[SQUARE1],
            properties=[{"id": 1, "description": self.DESCRIPTION}],
        )
        view = ParseTextColumn(
            source, "description", {"modelname": "description"}
        )
        data = view.get_data(**request_all)["features"]
        assert data.loc[1, "description"] == "rotterdam 01"

    def test_parser_into_same_column_non_existing(self, request_all):
        source = MockGeometry(
            polygons=[SQUARE1],
            properties=[{"id": 1, "description": self.DESCRIPTION}],
        )
        view = ParseTextColumn(
            source, "description", {"nonexisting": "description"}
        )
        data = view.get_data(**request_all)["features"]
        assert pd.isna(data.loc[1, "description"])


class TestWKTSource:
    def test_intersects(self, request_all):
        source = GeometryWKTSource(box(0, 0, 5, 5).wkt, "EPSG:3857")
        data = source.get_data(**request_all)
        assert len(data["features"]) == 1

    def test_no_intersection(self, request_all):
        source = GeometryWKTSource(box(100, 100, 105, 105).wkt, "EPSG:3857")
        data = source.get_data(**request_all)
        assert len(data["features"]) == 0

    def test_extent(self, request_all):
        source = GeometryWKTSource(box(0, 0, 5, 5).wkt, "EPSG:3857")
        data = source.get_data(**dict(request_all, mode="extent"))
        assert data["extent"] == (0.0, 0.0, 5.0, 5.0)

    def test_validation(self):
        with pytest.raises(ValueError):
            GeometryWKTSource("NOT WKT", "EPSG:3857")

    # ported from reference tests/test_geometry.py:427-530
    def test_wrong_mode(self, request_all):
        source = GeometryWKTSource(box(0, 0, 5, 5).wkt, "EPSG:3857")
        with pytest.raises(ValueError, match="jose"):
            source.get_data(**dict(request_all, mode="jose"))

    def test_intersects_not_centroid(self):
        # intersects the request bbox but its centroid does not:
        # kept in intersects mode, dropped in centroid mode
        request = dict(
            mode="intersects",
            geometry=box(135000.5, 455998, 135001.5, 455999.5),
            projection="EPSG:28992",
        )
        geom = box(135001, 455998, 135002.5, 455999.5)
        assert not geom.centroid.within(request["geometry"])
        source = GeometryWKTSource(geom.wkt, "EPSG:28992")
        assert len(source.get_data(**request)["features"]) == 1
        assert len(
            source.get_data(**dict(request, mode="centroid"))["features"]
        ) == 0

    def test_centroid_mode_kept(self, request_all):
        source = GeometryWKTSource(box(0, 0, 5, 5).wkt, "EPSG:3857")
        data = source.get_data(**dict(request_all, mode="centroid"))
        assert len(data["features"]) == 1

    def test_extent_empty(self, request_all):
        source = GeometryWKTSource(box(100, 100, 105, 105).wkt, "EPSG:3857")
        data = source.get_data(**dict(request_all, mode="extent"))
        assert data == {"projection": "EPSG:3857", "extent": None}

    def test_min_size_filters_out(self, request_all):
        source = GeometryWKTSource(box(0, 0, 1, 1).wkt, "EPSG:3857")
        data = source.get_data(**dict(request_all, min_size=2.0))
        assert data["features"].empty


class TestGeometryTiler:
    def test_tiled_centroid(self, source):
        # tiles of 20 over (0, 0, 40, 40): centroids (5, 5) and (25, 25)
        # each fall strictly inside exactly one tile
        tiler = GeometryTiler(source, size=20.0, projection="EPSG:3857")
        data = tiler.get_data(
            mode="centroid", geometry=box(0, 0, 40, 40), projection="EPSG:3857"
        )
        # each feature in exactly one tile: no duplicates
        assert len(data["features"]) == 2

    def test_tiler_extent_passthrough(self, source):
        tiler = GeometryTiler(source, size=25.0, projection="EPSG:3857")
        data = tiler.get_data(
            mode="extent", geometry=box(0, 0, 50, 50), projection="EPSG:3857"
        )
        assert data["extent"] == (0.0, 0.0, 30.0, 30.0)

    def test_tiler_intersects_unsupported(self, source, request_all):
        tiler = GeometryTiler(source, size=25.0, projection="EPSG:3857")
        with pytest.raises(NotImplementedError):
            tiler.get_data(**request_all)

    # ported from reference tests/test_geometry.py:1388-1490
    @pytest.fixture
    def unit_source(self):
        return MockGeometry(
            polygons=[((2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0))],
            properties=[{"id": 1}],
        )

    @pytest.fixture
    def centroid_request(self):
        return dict(
            mode="centroid", projection="EPSG:3857", geometry=box(0, 0, 10, 5)
        )

    def test_tiler_empty_source(self, centroid_request):
        view = GeometryTiler(MockGeometry([]), 5.0, "EPSG:3857")
        assert len(view.get_data(**centroid_request)["features"]) == 0

    def test_tiler_some_tiles_empty(self, unit_source, centroid_request):
        request = dict(centroid_request, geometry=box(0, 0, 10, 50))
        view = GeometryTiler(unit_source, 10.0, "EPSG:3857")
        assert len(view.get_data(**request)["features"]) == 1

    def test_tiler_no_tiling(self, unit_source, centroid_request):
        view = GeometryTiler(unit_source, 10, "EPSG:3857")
        requests = [
            x[1] for x in view.get_sources_and_requests(**centroid_request)
        ]
        assert len(requests) == 1
        assert requests[0]["geometry"].area == 50.0

    def test_tiler_two_tiles(self, unit_source, centroid_request):
        view = GeometryTiler(unit_source, 5, "EPSG:3857")
        requests = [
            x[1] for x in view.get_sources_and_requests(**centroid_request)
        ]
        assert len(requests) == 2
        for request in requests:
            assert request["geometry"].area == pytest.approx(25.0)

    def test_tiler_eight_tiles(self, unit_source, centroid_request):
        view = GeometryTiler(unit_source, 2.5, "EPSG:3857")
        requests = [
            x[1] for x in view.get_sources_and_requests(**centroid_request)
        ]
        assert len(requests) == 8
        for request in requests:
            assert request["geometry"].area == pytest.approx(2.5 * 2.5)

    def test_tiler_skip_empty_tiles(self, unit_source, centroid_request):
        from dask_geomodeling_tpu.geo.geometry import Polygon

        # L-shaped request: 3 of the 8 grid tiles fall in the empty notch
        request = dict(
            centroid_request,
            geometry=Polygon(
                ((0, 0), (10, 0), (10, 5), (9, 5), (9, 1), (0, 1), (0, 0))
            ),
        )
        view = GeometryTiler(unit_source, 2.5, "EPSG:3857")
        requests = [x[1] for x in view.get_sources_and_requests(**request)]
        assert len(requests) == 5
        for r in requests:
            assert r["geometry"].area < 25.0

    def test_tiler_resize(self, unit_source, centroid_request):
        # size 8 over a 10-wide request: equalized down to two 5x5 tiles
        view = GeometryTiler(unit_source, 8, "EPSG:3857")
        requests = [
            x[1] for x in view.get_sources_and_requests(**centroid_request)
        ]
        assert len(requests) == 2
        for request in requests:
            assert request["geometry"].area == pytest.approx(25.0)

    def test_tiler_different_projection(self, unit_source, centroid_request):
        from dask_geomodeling_tpu.geo import shapely_transform

        view = GeometryTiler(unit_source, 5.00001, "EPSG:3857")
        request = dict(
            centroid_request,
            projection="EPSG:4326",
            geometry=shapely_transform(
                centroid_request["geometry"], "EPSG:3857", "EPSG:4326"
            ),
        )
        requests = [x[1] for x in view.get_sources_and_requests(**request)]
        assert len(requests) == 2
        for r in requests:
            assert r["projection"] == "EPSG:3857"
            assert r["geometry"].area == pytest.approx(25.0, rel=1e-4)

    def test_tiler_merge_results(self, centroid_request):
        source = MockGeometry(
            polygons=[
                ((2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 3.0)),
                ((6.0, 2.0), (7.0, 2.0), (7.0, 3.0), (6.0, 3.0)),
            ],
            properties=[{"id": 1}, {"id": 2}],
        )
        view = GeometryTiler(source, 5, "EPSG:3857")
        assert len(view.get_data(**centroid_request)["features"]) == 2
