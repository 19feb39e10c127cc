"""Labeled-percentile tests (ported from reference
tests/test_measurements.py)."""
from dask_geomodeling_tpu.geo import measurements


def test_nolabel():
    assert measurements.percentile([0, 1, 2], 95) == 1.9


def test_noindex():
    assert measurements.percentile([0, 1, 2, 3], 95, labels=[1, 1, 1, 0]) == 1.9


def test_scalar():
    assert (
        measurements.percentile([0, 1, 2, 3], 95, labels=[1, 1, 1, 0], index=1)
        == 1.9
    )


def test_remap():
    actual = measurements.percentile([0, 1, 2, 3], 95, labels=[5, 5, 5, 0], index=[5])
    assert list(actual) == [1.9]


def test_noremap():
    actual = measurements.percentile(
        [0, 1, 2, 3, 0, 2, 4, 6, 8, 10],
        95,
        labels=[1, 1, 1, 0, 2, 2, 2, 2, 2, 2],
        index=[1, 2],
    )
    assert list(actual) == [1.9, 9.5]
