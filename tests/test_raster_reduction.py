"""reduce_rasters statistic matrix (ported from reference
tests/test_raster_reduction.py): nodata-skipping reductions over mixed
dtypes, the all-nodata stack, defaults, and validation."""
import numpy as np
import pytest

from dask_geomodeling_tpu.raster.reduction import reduce_rasters


@pytest.fixture
def stack():
    m = np.iinfo(np.uint64).max
    return [
        {
            "values": np.array([[[1, 1, 1], [0, 5, 0]]], dtype=np.uint8),
            "no_data_value": 0,
        },
        {
            "values": np.array([[[2, 2, 2], [4, 5, m]]], dtype=np.uint64),
            "no_data_value": m,
        },
        {
            "values": np.array([[[3, 3, 3], [4, 42.0, 42.0]]], dtype=np.float32),
            "no_data_value": 42.0,
        },
    ]


@pytest.fixture
def stack_nodata_only():
    return [
        {"values": np.zeros((1, 2, 3), dtype=np.uint8), "no_data_value": 0},
        {"values": np.ones((1, 2, 3), dtype=np.uint64), "no_data_value": 1},
        {
            "values": np.full((1, 2, 3), 42.0, dtype=np.float32),
            "no_data_value": 42.0,
        },
    ]


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
@pytest.mark.parametrize(
    "statistic, expected",
    [
        ("first", [[[1, 1, 1], [4, 5, 255]]]),
        ("last", [[[3, 3, 3], [4, 5, 255]]]),
        ("count", [[[3, 3, 3], [2, 2, 0]]]),
        ("sum", [[[6, 6, 6], [8, 10, 0]]]),
        ("mean", [[[2, 2, 2], [4, 5, 255]]]),
        ("min", [[[1, 1, 1], [4, 5, 255]]]),
        ("max", [[[3, 3, 3], [4, 5, 255]]]),
        ("argmin", [[[0, 0, 0], [1, 0, 255]]]),
        ("argmax", [[[2, 2, 2], [1, 0, 255]]]),
        (
            "std",
            [[[np.sqrt(2 / 3), np.sqrt(2 / 3), np.sqrt(2 / 3)], [0, 0, 255]]],
        ),
        ("var", [[[2 / 3, 2 / 3, 2 / 3], [0, 0, 255]]]),
        ("median", [[[2, 2, 2], [4, 5, 255]]]),
        ("product", [[[6, 6, 6], [16, 25, 255]]]),
        ("p99", [[[2.98, 2.98, 2.98], [4, 5, 255]]]),
    ],
)
def test_reduce(statistic, expected, dtype, stack):
    actual = reduce_rasters(stack, statistic, no_data_value=255, dtype=dtype)
    np.testing.assert_array_equal(
        actual["values"], np.array(expected, dtype=dtype)
    )


@pytest.mark.parametrize(
    "statistic, expected_value",
    [
        ("first", 255), ("last", 255), ("count", 0), ("sum", 0),
        ("mean", 255), ("min", 255), ("max", 255), ("argmin", 255),
        ("argmax", 255), ("std", 255), ("var", 255), ("median", 255),
        ("product", 255), ("p99", 255),
    ],
)
def test_reduce_nan_input(statistic, expected_value, stack_nodata_only):
    actual = reduce_rasters(
        stack_nodata_only, statistic, no_data_value=255, dtype=np.uint8
    )
    np.testing.assert_array_equal(
        actual["values"], np.full((1, 2, 3), expected_value, dtype=np.uint8)
    )


@pytest.mark.parametrize("statistic", ["first", "sum"])
def test_reduce_defaults(statistic, stack):
    actual = reduce_rasters(stack, statistic)
    assert actual["values"].dtype == stack[0]["values"].dtype
    assert actual["no_data_value"] == stack[0]["no_data_value"]


def test_reduce_raises_zero_length(stack):
    with pytest.raises(ValueError):
        reduce_rasters([], "first")


@pytest.mark.parametrize(
    "statistic",
    ["first", "last", "count", "sum", "mean", "min", "max", "std", "var",
     "median", "product", "p99"],
)
def test_reduce_jax_matches(statistic, stack):
    """The device twin reproduces the host reduction on the mixed stack."""
    from dask_geomodeling_tpu.raster.reduction import reduce_rasters_jax

    expected = reduce_rasters(stack, statistic, no_data_value=255, dtype=np.float32)
    actual = np.asarray(
        reduce_rasters_jax(stack, statistic, 255, np.float32)["values"]
    )
    np.testing.assert_allclose(actual, expected["values"], rtol=1e-6)


@pytest.mark.parametrize("statistic", ["max", "min", "first", "last", "mean"])
def test_reduce_jax_boolean_stack_none_nodata(statistic):
    """Boolean rasters carry no nodata (None): the device twin must
    mirror numpy's None handling instead of crashing (fuzz seed 451)."""
    from dask_geomodeling_tpu.raster.reduction import (
        reduce_rasters,
        reduce_rasters_jax,
    )

    stack = [
        {"values": np.array([[True, False], [False, True]]),
         "no_data_value": None},
        {"values": np.array([[False, False], [True, True]]),
         "no_data_value": None},
    ]
    expected = reduce_rasters(stack, statistic, None, None)
    actual = reduce_rasters_jax(stack, statistic, None, None)
    np.testing.assert_array_equal(
        np.asarray(actual["values"]), expected["values"]
    )
    assert actual["no_data_value"] == expected["no_data_value"]


@pytest.mark.parametrize("statistic", ["sum", "count"])
def test_reduce_jax_int_stack_none_nodata(statistic):
    """Integer stacks with no_data_value=None: sum/count use a zero fill
    like the numpy twin and must not materialize None as an int fill."""
    from dask_geomodeling_tpu.raster.reduction import (
        reduce_rasters,
        reduce_rasters_jax,
    )

    stack = [
        {"values": np.array([[1, 2], [3, 4]], dtype=np.int32),
         "no_data_value": None},
        {"values": np.array([[5, 6], [7, 8]], dtype=np.int32),
         "no_data_value": None},
    ]
    expected = reduce_rasters(stack, statistic, None, None)
    actual = reduce_rasters_jax(stack, statistic, None, None)
    np.testing.assert_array_equal(
        np.asarray(actual["values"]), expected["values"]
    )
    assert actual["no_data_value"] == expected["no_data_value"]
