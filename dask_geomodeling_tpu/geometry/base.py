"""Base geometry block classes.

Contract identical to the reference (dask_geomodeling/geometry/base.py):
a GeometryBlock answers requests with mode 'intersects' | 'centroid' |
'extent', returning ``{"features": GeoDataFrame, "projection": str}`` or
``{"extent": tuple_or_None, "projection": str}``.  SeriesBlocks represent
single feature-property columns.  The geometry plane runs on host (pandas +
the native geometry engine); only Rasterize/AggregateRaster touch the device
plane.
"""
import pandas as pd

from dask_geomodeling_tpu.core import arg, Block

__all__ = ["GeometryBlock", "SeriesBlock", "GetSeriesBlock", "SetSeriesBlock"]


class GeometryBlock(Block):
    """The base block for feature geometries.

    Required attribute: ``columns`` — the set of column names in the frame.

    Request fields: ``mode`` ('intersects'|'centroid'|'extent'),
    ``geometry`` (filter geometry), ``projection``, ``limit``, ``min_size``,
    ``start``, ``stop``, ``filters`` (Django-style property filters).
    """

    def __getitem__(self, name):
        return GetSeriesBlock(self, name)

    def __setitem__(self, *args, **kwargs):
        raise NotImplementedError("Please use block.set to set a column.")

    def set(self, *args):
        # block instances are immutable: setting returns a new view
        return SetSeriesBlock(self, *args)

    def to_file(self, *args, **kwargs):
        """Export features to a file; see
        :func:`dask_geomodeling_tpu.geometry.sinks.to_file`."""
        from dask_geomodeling_tpu.geometry.sinks import to_file

        return to_file(self, *args, **kwargs)


class SeriesBlock(Block):
    """A block representing one column of a GeometryBlock."""

    def __add__(self, other):
        from dask_geomodeling_tpu.geometry import Add

        return Add(self, other)

    __radd__ = __add__

    def __mul__(self, other):
        from dask_geomodeling_tpu.geometry import Multiply

        return Multiply(self, other)

    __rmul__ = __mul__

    def __neg__(self):
        from dask_geomodeling_tpu.geometry import Multiply

        return Multiply(self, -1)

    def __sub__(self, other):
        from dask_geomodeling_tpu.geometry import Subtract

        return Subtract(self, other)

    def __floordiv__(self, other):
        from dask_geomodeling_tpu.geometry import FloorDivide

        return FloorDivide(self, other)

    def __mod__(self, other):
        from dask_geomodeling_tpu.geometry import Modulo

        return Modulo(self, other)

    def __truediv__(self, other):
        from dask_geomodeling_tpu.geometry import Divide

        return Divide(self, other)

    def __pow__(self, other):
        from dask_geomodeling_tpu.geometry import Power

        return Power(self, other)

    def __eq__(self, other):
        from dask_geomodeling_tpu.geometry import Equal

        return Equal(self, other)

    def __ne__(self, other):
        from dask_geomodeling_tpu.geometry import NotEqual

        return NotEqual(self, other)

    def __gt__(self, other):
        from dask_geomodeling_tpu.geometry import Greater

        return Greater(self, other)

    def __ge__(self, other):
        from dask_geomodeling_tpu.geometry import GreaterEqual

        return GreaterEqual(self, other)

    def __lt__(self, other):
        from dask_geomodeling_tpu.geometry import Less

        return Less(self, other)

    def __le__(self, other):
        from dask_geomodeling_tpu.geometry import LessEqual

        return LessEqual(self, other)

    def __invert__(self):
        from dask_geomodeling_tpu.geometry import Invert

        return Invert(self)

    def __and__(self, other):
        from dask_geomodeling_tpu.geometry import And

        return And(self, other)

    def __or__(self, other):
        from dask_geomodeling_tpu.geometry import Or

        return Or(self, other)

    def __xor__(self, other):
        from dask_geomodeling_tpu.geometry import Xor

        return Xor(self, other)

    __hash__ = Block.__hash__


class GetSeriesBlock(SeriesBlock):
    """Obtain a single property column from a GeometryBlock.

    Args:
      source (GeometryBlock): block with the column to load
      name (str): name of the column
    """

    def __init__(self, source, name):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        if not isinstance(name, str):
            raise TypeError("'{}' object is not allowed".format(type(name)))
        if name not in source.columns:
            raise KeyError("Column '{}' is not available".format(name))
        super().__init__(source, name)

    source = arg(0)

    @staticmethod
    def process(data, name):
        if "features" not in data or name not in data["features"].columns:
            return pd.Series([], dtype=float)
        return data["features"][name]


class SetSeriesBlock(GeometryBlock):
    """Add property columns (SeriesBlocks or constants) to a GeometryBlock.

    Args:
      source (GeometryBlock): base block
      column (str), value (SeriesBlock or constant): repeated pairs
    """

    def __init__(self, source, column, value, *args):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        args = (column, value) + args
        if len(args) % 2 != 0:
            raise ValueError("The number of arguments should be even")
        for column in args[::2]:
            if not isinstance(column, str):
                raise TypeError("'{}' object is not allowed".format(type(column)))
        super().__init__(source, *args)

    source = arg(0)

    @property
    def columns(self):
        return self.source.columns | set(self.args[1::2])

    @staticmethod
    def process(data, *col_val_pairs):
        if "features" not in data or len(data["features"]) == 0:
            return data
        features = data["features"].copy()
        for column, value in zip(col_val_pairs[::2], col_val_pairs[1::2]):
            features[column] = value
        return {"features": features, "projection": data["projection"]}


class BaseSingle(GeometryBlock):
    """Base for geometry blocks wrapping a single geometry source."""

    def __init__(self, source, *args):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, *args)

    source = arg(0)

    @property
    def columns(self):
        return self.source.columns


class BaseSingleSeries(SeriesBlock):
    """Base for series blocks wrapping a single series source."""

    def __init__(self, source, *args):
        if not isinstance(source, SeriesBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, *args)

    source = arg(0)
