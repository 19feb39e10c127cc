"""RasterBlock base classes.

Attribute and request/response contract identical to the reference
(dask_geomodeling/raster/base.py:9-228); see SURVEY §1 "The two protocols".
"""
from datetime import datetime as Datetime

from dask_geomodeling_tpu.core import Block

__all__ = ["RasterBlock", "BaseSingle"]


class RasterBlock(Block):
    """The base block for temporal rasters.

    Required attributes on every RasterBlock (None when empty):

    - ``period``: (datetime, datetime) or None
    - ``timedelta``: datetime.timedelta or None (non-equidistant/static)
    - ``extent``: (x1, y1, x2, y2) in WGS84
    - ``dtype``: numpy dtype
    - ``fillvalue``: number (None for boolean rasters)
    - ``geometry``: Geometry in the native projection (with ``srs`` set)
    - ``projection``: projection user string (EPSG:xxxx or WKT)
    - ``geo_transform``: 6-tuple
    - ``temporal``: bool

    Request fields: ``mode`` ('vals'|'time'|'meta'), ``bbox``, ``projection``,
    ``width``, ``height``, ``start``, ``stop``.  Response: None or a dict
    with ``values`` (bands, height, width) + ``no_data_value``, or ``time``,
    or ``meta``.
    """

    DEFAULT_ORIGIN = Datetime(1970, 1, 1, 0, 0)

    def to_file(self, *args, **kwargs):
        """Export data from this block to a file on disk; see
        :func:`dask_geomodeling_tpu.raster.sinks.to_file`."""
        from dask_geomodeling_tpu.raster.sinks import to_file

        return to_file(self, *args, **kwargs)

    def __len__(self):
        """Number of temporal bands."""
        try:
            start, stop = self.period
        except TypeError:
            return 0  # period is None

        if start == stop:
            return 1

        timedelta = self.timedelta
        if timedelta is None:
            # non-equidistant: ask the data for its time axis
            return len(self.get_data(mode="time", start=start, stop=stop)["time"])

        period_seconds = (stop - start).total_seconds()
        delta_seconds = timedelta.total_seconds()
        return int(period_seconds / delta_seconds) + 1

    def __add__(self, other):
        from dask_geomodeling_tpu.raster import Add

        return Add(self, other)

    __radd__ = __add__

    def __mul__(self, other):
        from dask_geomodeling_tpu.raster import Multiply

        return Multiply(self, other)

    __rmul__ = __mul__

    def __neg__(self):
        from dask_geomodeling_tpu.raster import Multiply

        return Multiply(self, -1)

    def __sub__(self, other):
        from dask_geomodeling_tpu.raster import Subtract

        return Subtract(self, other)

    def __truediv__(self, other):
        from dask_geomodeling_tpu.raster import Divide

        return Divide(self, other)

    def __pow__(self, other):
        from dask_geomodeling_tpu.raster import Power

        return Power(self, other)

    def __eq__(self, other):
        from dask_geomodeling_tpu.raster import Equal

        return Equal(self, other)

    def __ne__(self, other):
        from dask_geomodeling_tpu.raster import NotEqual

        return NotEqual(self, other)

    def __gt__(self, other):
        from dask_geomodeling_tpu.raster import Greater

        return Greater(self, other)

    def __ge__(self, other):
        from dask_geomodeling_tpu.raster import GreaterEqual

        return GreaterEqual(self, other)

    def __lt__(self, other):
        from dask_geomodeling_tpu.raster import Less

        return Less(self, other)

    def __le__(self, other):
        from dask_geomodeling_tpu.raster import LessEqual

        return LessEqual(self, other)

    def __invert__(self):
        from dask_geomodeling_tpu.raster import Invert

        return Invert(self)

    def __and__(self, other):
        from dask_geomodeling_tpu.raster import And

        return And(self, other)

    def __or__(self, other):
        from dask_geomodeling_tpu.raster import Or

        return Or(self, other)

    def __xor__(self, other):
        from dask_geomodeling_tpu.raster import Xor

        return Xor(self, other)

    # Equal/NotEqual overload __eq__; keep Blocks hashable by identity-ish
    __hash__ = Block.__hash__


class BaseSingle(RasterBlock):
    """Base class for raster blocks wrapping a single raster ("store")."""

    def __init__(self, store, *args):
        if not isinstance(store, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(store)))
        super().__init__(store, *args)

    @property
    def store(self):
        return self.args[0]

    def __len__(self):
        return len(self.store)

    @property
    def extent(self):
        return self.store.extent

    @property
    def period(self):
        return self.store.period

    @property
    def timedelta(self):
        return self.store.timedelta

    @property
    def temporal(self):
        return self.store.temporal

    @property
    def dtype(self):
        return self.store.dtype

    @property
    def fillvalue(self):
        return self.store.fillvalue

    @property
    def geometry(self):
        return self.store.geometry

    @property
    def projection(self):
        return self.store.projection

    @property
    def geo_transform(self):
        return self.store.geo_transform
