"""Field-operation behaviors ported from reference tests/test_geometry.py
(TestFieldOperations, lines 937-1386): the ±inf/NaN fixture sweep over
classify, choose, arithmetic/comparison/logic operators, round, interp."""
import numpy as np
import pandas as pd
import pytest

from dask_geomodeling_tpu.geo.geometry import box
from dask_geomodeling_tpu.geometry import field_operations
from tests.factories import MockGeometry

VALUES = [-float("inf"), -2, 1.2, 5.0, float("inf"), float("nan")]


@pytest.fixture
def properties():
    return [
        {
            "id": i,
            "id_value": float(i),
            "col_1": x,
            "col_2": 2 * x,
            "bool_1": x > 0,
            "bool_2": x > 2,
            "col_source": float(i * 2 + 1),
            "col_choice_1": chr(i + 65),
            "col_choice_2": chr(i + 70),
            "none": None,
        }
        for i, x in enumerate(VALUES)
    ]


@pytest.fixture
def prop_df(properties):
    return pd.DataFrame(properties)


@pytest.fixture
def source(properties):
    return MockGeometry(
        polygons=[((2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0))]
        * len(VALUES),
        properties=properties,
    )


@pytest.fixture
def request_all():
    return dict(
        mode="intersects", projection="EPSG:3857", geometry=box(0, 0, 10, 10)
    )


class TestClassify:
    def test_classify_field(self, source, request_all):
        series = field_operations.Classify(
            source["col_1"], bins=[0, 1.2, 5.0], labels=["A", "B"]
        )
        values = series.get_data(**request_all).values
        assert pd.isna(values[0])  # -inf outside closed bins
        assert pd.isna(values[1])  # -2
        assert values[2] == "A"  # 1.2 (right-closed)
        assert values[3] == "B"  # 5.0
        assert pd.isna(values[4])  # inf
        assert pd.isna(values[5])  # nan

    def test_classify_field_left(self, source, request_all):
        series = field_operations.Classify(
            source["col_1"], bins=[0, 1.2, 10.0], labels=["A", "B"], right=False
        )
        values = series.get_data(**request_all).values
        assert pd.isna(values[0])
        assert pd.isna(values[1])
        assert values[2] == "B"  # 1.2 is the left edge of bin B
        assert values[3] == "B"
        assert pd.isna(values[4])
        assert pd.isna(values[5])

    def test_classify_field_open_bounds(self, source, request_all):
        series = field_operations.Classify(
            source["col_1"], bins=[1.2, 5], labels=["A", "B", "C"]
        )
        values = series.get_data(**request_all).values
        assert values[0] == "A"  # -inf classifies into the open lower bin
        assert values[1] == "A"
        assert values[2] == "A"  # 1.2: right-closed
        assert values[3] == "B"
        assert values[4] == "C"  # +inf into the open upper bin
        assert pd.isna(values[5])

    def test_classify_field_open_bounds_left(self, source, request_all):
        series = field_operations.Classify(
            source["col_1"], bins=[1.2, 5], labels=["A", "B", "C"], right=False
        )
        values = series.get_data(**request_all).values
        assert values[0] == "A"
        assert values[1] == "A"
        assert values[2] == "B"  # 1.2 is the left edge of B
        assert values[3] == "C"
        assert values[4] == "C"
        assert pd.isna(values[5])

    def test_classify_none(self, source, request_all):
        series = field_operations.Classify(
            source["none"], bins=[0, 0.2], labels=["A"]
        )
        values = series.get_data(**request_all).values
        assert all(pd.isna(x) for x in values)

    def test_classify_int_labels_as_float(self, source, request_all):
        actual = field_operations.Classify(
            source["col_source"], bins=[0, 1.0, 5.0], labels=[2, 3]
        ).get_data(**request_all)
        assert actual.dtype == float

    def test_classify_not_categorical(self, source, request_all):
        actual = field_operations.Classify(
            source["col_source"], bins=[0, 0.5, 1.0], labels=["A", "B", "C", "D"]
        ).get_data(**request_all)
        assert not isinstance(actual.dtype, pd.CategoricalDtype)


class TestClassifyFromColumns:
    def test_empty(self, source):
        view = field_operations.ClassifyFromColumns(
            source, "col_1", ["id_value"], labels=["A", "B"]
        )
        result = view.get_data(
            mode="intersects", projection="EPSG:3857", geometry=box(0, 0, 0, 0)
        )
        assert len(result) == 0

    def test_none(self, source, request_all):
        series = field_operations.ClassifyFromColumns(
            source, "none", ["id_value"], labels=["A", "B"]
        )
        values = series.get_data(**request_all).values
        assert all(pd.isna(x) for x in values)

    def test_varying_bin(self, source, request_all):
        series = field_operations.ClassifyFromColumns(
            source, "col_1", ["id_value"], labels=["lower", "higher"]
        )
        values = series.get_data(**request_all).values
        assert values[0] == "lower"  # -inf < 0
        assert values[1] == "lower"  # -2 < 1
        assert values[2] == "lower"  # 1.2 < 2
        assert values[3] == "higher"  # 5.0 > 3
        assert values[4] == "higher"  # inf > 4
        assert pd.isna(values[5])

    def test_matches_classify(self, source, request_all):
        with_bins = source.set("bin_1", 0, "bin_2", 1.2, "bin_3", 5.0)
        actual = field_operations.ClassifyFromColumns(
            with_bins, "col_1", ["bin_1", "bin_2", "bin_3"], labels=["A", "B"]
        ).get_data(**request_all)
        expected = field_operations.Classify(
            source["col_1"], bins=[0, 1.2, 5.0], labels=["A", "B"]
        ).get_data(**request_all)
        pd.testing.assert_series_equal(actual, expected, check_names=False)

    @pytest.mark.parametrize("right", [True, False])
    def test_open_bounds_matches_classify(self, source, request_all, right):
        with_bins = source.set("bin_1", 1.2, "bin_2", 5.0)
        actual = field_operations.ClassifyFromColumns(
            with_bins, "col_1", ["bin_1", "bin_2"],
            labels=["A", "B", "C"], right=right,
        ).get_data(**request_all)
        expected = field_operations.Classify(
            source["col_1"], bins=[1.2, 5.0], labels=["A", "B", "C"], right=right
        ).get_data(**request_all)
        pd.testing.assert_series_equal(actual, expected, check_names=False)


class TestChoose:
    def test_choose(self, source, request_all):
        series = field_operations.Choose(
            source["id_value"], source["col_1"], source["col_2"], source["bool_1"]
        )
        values = series.get_data(**request_all).values
        assert values[0] == -float("inf")  # id 0 -> col_1[0]
        assert values[1] == -4.0  # id 1 -> col_2[1]
        assert values[2] == 1.0  # id 2 -> bool_1[2] (True)
        assert pd.isna(values[3])  # id 3: out of range
        assert pd.isna(values[4])
        assert pd.isna(values[5])

    def test_choose_values_neq_index(self, source, request_all):
        series = field_operations.Choose(
            source["col_source"], source["col_1"], source["col_2"], source["bool_1"]
        )
        values = series.get_data(**request_all).values
        assert values[0] == -float("inf")  # col_source[0] == 1 -> col_2... no:
        # reference: choice index 1 at row 0 selects col_2[0] = -inf

    def test_choose_dtype_str(self, source, request_all):
        series = field_operations.Choose(
            source["id_value"], source["col_choice_1"], source["col_choice_2"]
        )
        values = series.get_data(**request_all).values
        assert values[0] == "A"
        assert values[1] == "G"

    def test_choose_string_selector_never_selects(self):
        """A string "1" must NOT select choice 1 (masked-equality
        semantics: "1" == 1 is False); only real numbers select."""
        from dask_geomodeling_tpu.geometry.field_operations import Choose

        index = pd.RangeIndex(4)
        selector = pd.Series(["1", 0, 1.0, None], index=index, dtype=object)
        a = pd.Series(["a0", "a1", "a2", "a3"], index=index)
        b = pd.Series(["b0", "b1", "b2", "b3"], index=index)
        result = Choose.process(selector, a, b)
        assert pd.isna(result[0])  # string selector: no data
        assert result[1] == "a1"
        assert result[2] == "b2"
        assert pd.isna(result[3])

    def test_choose_different_length(self, source, request_all):
        val = VALUES + [1]
        other = MockGeometry(
            polygons=[((2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0))]
            * len(val),
            properties=[{"id_value": float(i)} for i in range(len(val))],
        )
        series = field_operations.Choose(
            other["id_value"], source["col_choice_1"], source["col_2"],
            source["bool_1"],
        )
        values = series.get_data(**request_all).values
        assert values[0] == "A"
        assert values[1] == -4
        assert bool(values[2])
        assert len(values) == len(val)


class TestOperators:
    def check(self, source, request_all, prop_df, series_block, expected):
        view = source.set("result", series_block)
        result = view.get_data(**request_all)
        assert result["features"]["result"].equals(expected)

    def test_add_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] + source["col_2"],
            prop_df["col_1"] + prop_df["col_2"],
        )

    def test_add_int(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] + 2, prop_df["col_1"] + 2,
        )

    def test_sub_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] - source["col_2"],
            prop_df["col_1"].sub(prop_df["col_2"]),
        )

    def test_sub_float(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] - 2.1, prop_df["col_1"].sub(2.1),
        )

    def test_mul_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] * source["col_2"],
            prop_df["col_1"].mul(prop_df["col_2"]),
        )

    def test_mul_inf(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] * float("inf"),
            prop_df["col_1"].mul(float("inf")),
        )

    def test_add_nan(self, source, request_all):
        view = source.set("result", source["col_1"] + float("nan"))
        result = view.get_data(**request_all)
        assert np.all(np.isnan(result["features"]["result"]))

    def test_div_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] / source["col_2"],
            prop_df["col_1"].truediv(prop_df["col_2"]),
        )

    def test_floordiv_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] // source["col_2"],
            prop_df["col_1"].floordiv(prop_df["col_2"]),
        )

    def test_pow_inverse(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] ** -1, prop_df["col_1"].pow(float(-1)),
        )

    def test_square_root(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] ** 0.5, prop_df["col_1"].pow(0.5),
        )

    def test_mod_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["col_1"] % source["col_2"],
            prop_df["col_1"].mod(prop_df["col_2"]),
        )

    @pytest.mark.parametrize("op", ["lt", "le", "eq", "ne", "gt", "ge"])
    def test_comparisons(self, source, request_all, prop_df, op):
        import operator

        py_op = {
            "lt": operator.lt, "le": operator.le, "eq": operator.eq,
            "ne": operator.ne, "gt": operator.gt, "ge": operator.ge,
        }[op]
        self.check(
            source, request_all, prop_df,
            py_op(source["col_1"], source["col_2"]),
            getattr(prop_df["col_1"], op)(prop_df["col_2"]),
        )

    def test_and_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["bool_1"] & source["bool_2"],
            prop_df["bool_1"] & prop_df["bool_2"],
        )

    def test_or_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["bool_1"] | source["bool_2"],
            prop_df["bool_1"] | prop_df["bool_2"],
        )

    def test_xor_fields(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df,
            source["bool_1"] ^ source["bool_2"],
            prop_df["bool_1"] ^ prop_df["bool_2"],
        )

    def test_not_field(self, source, request_all, prop_df):
        self.check(
            source, request_all, prop_df, ~source["bool_1"], ~prop_df["bool_1"]
        )

    def test_set_multiple_columns(self, source, request_all, prop_df):
        view = source.set(
            "sum", source["col_1"] + source["col_2"],
            "product", source["col_1"] * source["col_2"],
        )
        result = view.get_data(**request_all)
        assert result["features"]["sum"].equals(
            prop_df["col_1"] + prop_df["col_2"]
        )
        assert result["features"]["product"].equals(
            prop_df["col_1"] * prop_df["col_2"]
        )


class TestRoundInterp:
    def test_round_validation(self, source):
        with pytest.raises(TypeError):
            field_operations.Round(source["col_1"], "s")

    def test_round(self, source, request_all, prop_df):
        view = field_operations.Round(source["col_1"] / 3, 2)
        result = view.get_data(**request_all)
        assert result.equals((prop_df["col_1"] / 3).round(2))

    def test_interp(self, source, request_all):
        view = field_operations.Interp(
            source["col_1"], [0.0, 5.0], [0.0, 10.0], left=-1.0, right=11.0
        )
        values = view.get_data(**request_all).values
        assert values[0] == -1.0  # -inf clamps to 'left'
        assert values[1] == -1.0
        assert values[2] == pytest.approx(2.4)
        assert values[3] == 10.0
        assert values[4] == 11.0  # +inf clamps to 'right'
        assert np.isnan(values[5])


class TestWhereMask:
    def test_where_with_float_filter(self, source, request_all, prop_df):
        # a float condition column: nonzero/non-NaN is truthy per pandas
        view = source.set(
            "result",
            field_operations.Where(
                source["col_1"], cond=source["bool_1"], other=source["col_2"]
            ),
        )
        result = view.get_data(**request_all)
        expected = prop_df["col_1"].where(prop_df["bool_1"], prop_df["col_2"])
        assert result["features"]["result"].equals(expected)

    def test_mask_with_other_column(self, source, request_all, prop_df):
        view = source.set(
            "result",
            field_operations.Mask(
                source["col_1"], cond=source["bool_1"], other=source["col_2"]
            ),
        )
        result = view.get_data(**request_all)
        expected = prop_df["col_1"].mask(prop_df["bool_1"], prop_df["col_2"])
        assert result["features"]["result"].equals(expected)

    def test_mask_scalar(self, source, request_all, prop_df):
        view = source.set(
            "result",
            field_operations.Mask(source["col_1"], cond=source["bool_1"], other=0.0),
        )
        result = view.get_data(**request_all)
        expected = prop_df["col_1"].mask(prop_df["bool_1"], 0.0)
        assert result["features"]["result"].equals(expected)
