"""Shared constructor-argument guards.

Block ``__init__`` validators all enforce the same contract as the
reference's (a wrong-typed argument raises TypeError at graph-build
time, reference dask_geomodeling/raster/base.py and friends); the
checks live here once instead of as per-block copies.
"""

__all__ = ["expect_instance"]


def expect_instance(value, types, label="argument"):
    """Return ``value`` when it is an instance of ``types``; otherwise
    raise the constructor-guard TypeError naming the offending type."""
    if isinstance(value, types):
        return value
    raise TypeError(
        "%s does not accept a '%s' here" % (label, type(value).__name__)
    )
