"""GeoSeries / GeoDataFrame: pandas-backed feature tables (geopandas-lite).

The reference's geometry layer operates on geopandas GeoDataFrames (SURVEY
§2.6).  This environment has no geopandas, so this module provides the used
subset natively: a ``GeoSeries`` (pandas Series of Geometry objects with
vectorized predicates/operations and a ``crs``) and a ``GeoDataFrame``
(pandas DataFrame subclass with an active geometry column and ``to_crs``).
"""
import numpy as np
import pandas as pd

from dask_geomodeling_tpu.geo import geometry as geom_mod
from dask_geomodeling_tpu.geo.crs import get_projection, get_transform_func

__all__ = ["GeoSeries", "GeoDataFrame"]


class GeoSeries(pd.Series):
    """A pandas Series of geometries with vectorized spatial operations."""
    _metadata = ["crs"]

    def __init__(self, data=None, index=None, crs=None, **kwargs):
        kwargs.setdefault("dtype", object)
        super().__init__(data, index=index, **kwargs)
        self.crs = crs if crs is not None else getattr(data, "crs", None)

    @property
    def _constructor(self):
        return GeoSeries

    def _constructor_from_mgr(self, mgr, axes):
        # pandas 3: construct from an internal manager without re-validation
        obj = GeoSeries._from_mgr(mgr, axes)
        if not hasattr(obj, "_name"):
            obj._name = getattr(self, "name", None)
        obj.crs = getattr(self, "crs", None)
        return obj

    @property
    def _constructor_expanddim(self):
        return GeoDataFrame

    # --- vectorized helpers ---

    def _apply_geom(self, func):
        return pd.Series(
            [None if g is None else func(g) for g in self],
            index=self.index,
            dtype=object,
        )

    def _apply_bool(self, func):
        return pd.Series(
            [False if g is None else bool(func(g)) for g in self],
            index=self.index,
            dtype=bool,
        )

    def _apply_float(self, func):
        return pd.Series(
            [np.nan if g is None else float(func(g)) for g in self],
            index=self.index,
            dtype=float,
        )

    # predicates
    def intersects(self, other):
        return self._apply_bool(lambda g: g.intersects(other))

    def within(self, other):
        return self._apply_bool(lambda g: g.within(other))

    def contains(self, other):
        return self._apply_bool(lambda g: g.contains(other))

    @property
    def is_empty(self):
        return self._apply_bool(lambda g: g.is_empty)

    def isnull(self):
        return pd.Series(
            [g is None or (hasattr(g, "is_empty") and g.is_empty) for g in self],
            index=self.index,
            dtype=bool,
        )

    def notnull(self):
        return ~self.isnull()

    isna = isnull
    notna = notnull

    # measures
    @property
    def area(self):
        return self._apply_float(lambda g: g.area)

    @property
    def length(self):
        return self._apply_float(lambda g: g.length)

    @property
    def centroid(self):
        return GeoSeries(self._apply_geom(lambda g: g.centroid), crs=self.crs)

    @property
    def x(self):
        return self._apply_float(lambda g: g.x)

    @property
    def y(self):
        return self._apply_float(lambda g: g.y)

    @property
    def bounds(self):
        rows = [
            (np.nan,) * 4 if g is None or g.is_empty else g.bounds for g in self
        ]
        return pd.DataFrame(
            rows, columns=["minx", "miny", "maxx", "maxy"], index=self.index
        )

    @property
    def total_bounds(self):
        b = self.bounds
        return np.array(
            [b["minx"].min(), b["miny"].min(), b["maxx"].max(), b["maxy"].max()]
        )

    # operations
    def buffer(self, distance, resolution=16):
        return GeoSeries(
            self._apply_geom(lambda g: g.buffer(distance, resolution)), crs=self.crs
        )

    def simplify(self, tolerance, preserve_topology=True):
        return GeoSeries(
            self._apply_geom(lambda g: g.simplify(tolerance)), crs=self.crs
        )

    def intersection(self, other):
        return GeoSeries(
            self._apply_geom(lambda g: g.intersection(other)), crs=self.crs
        )

    def difference(self, other):
        """Element-wise difference with an aligned GeoSeries or a geometry."""
        if isinstance(other, (GeoSeries, pd.Series)):
            other_map = other
            result = [
                None
                if g is None
                else (
                    g
                    if other_map.get(idx) is None
                    else g.difference(other_map[idx])
                )
                for idx, g in self.items()
            ]
            return GeoSeries(result, index=self.index, crs=self.crs)
        return GeoSeries(
            self._apply_geom(lambda g: g.difference(other)), crs=self.crs
        )

    def to_crs(self, crs):
        """Transform all geometries to another CRS."""
        if self.crs is None:
            raise ValueError("Cannot transform naive geometries (no crs set)")
        src = get_projection(self.crs)
        dst = get_projection(crs)
        if src.upper() == dst.upper():
            result = GeoSeries(self, index=self.index, crs=dst)
            return result
        func = get_transform_func(src, dst)
        return GeoSeries(
            self._apply_geom(lambda g: geom_mod.transform(func, g)),
            index=self.index,
            crs=dst,
        )


class GeoDataFrame(pd.DataFrame):
    """DataFrame with an active geometry column and a CRS."""

    _metadata = ["crs", "_geometry_column_name"]

    def __init__(self, data=None, *args, geometry=None, crs=None, **kwargs):
        super().__init__(data, *args, **kwargs)
        self.crs = crs if crs is not None else getattr(data, "crs", None)
        self._geometry_column_name = getattr(data, "_geometry_column_name", None)
        if geometry is not None:
            if isinstance(geometry, str):
                self._geometry_column_name = geometry
            else:
                if isinstance(geometry, pd.Series):
                    series = geometry.astype(object)
                else:
                    series = pd.Series(list(geometry), dtype=object)
                if len(self.columns) == 0 and len(self.index) != len(series):
                    # frame created empty: adopt the geometry's index
                    super().__init__({"geometry": series})
                else:
                    self["geometry"] = pd.Series(
                        list(series), index=self.index, dtype=object
                    )
                self._geometry_column_name = "geometry"
        elif self._geometry_column_name is None and "geometry" in self.columns:
            self._geometry_column_name = "geometry"

    @property
    def _constructor(self):
        return GeoDataFrame

    def _constructor_from_mgr(self, mgr, axes):
        # pandas 3: construct from an internal manager without re-validation
        obj = GeoDataFrame._from_mgr(mgr, axes)
        obj.crs = getattr(self, "crs", None)
        obj._geometry_column_name = getattr(self, "_geometry_column_name", None)
        return obj

    @property
    def _constructor_sliced(self):
        return pd.Series

    @property
    def geometry(self):
        name = self._geometry_column_name or "geometry"
        if name not in self.columns:
            raise AttributeError("No geometry column set")
        return GeoSeries(pd.Series(self[name]), crs=self.crs)

    @geometry.setter
    def geometry(self, value):
        self.set_geometry(value, inplace=True)

    def set_geometry(self, col, crs=None, inplace=False):
        frame = self if inplace else self.copy()
        if isinstance(col, str):
            frame._geometry_column_name = col
        else:
            series = pd.Series(list(col), index=frame.index, dtype=object)
            frame["geometry"] = series
            frame._geometry_column_name = "geometry"
            crs = crs or getattr(col, "crs", None)
        if crs is not None:
            frame.crs = crs
        if not inplace:
            return frame

    def to_crs(self, crs):
        frame = self.copy()
        name = self._geometry_column_name or "geometry"
        transformed = self.geometry.to_crs(crs)
        frame[name] = pd.Series(transformed, index=self.index, dtype=object)
        frame.crs = get_projection(crs)
        frame._geometry_column_name = name
        return frame

    @property
    def total_bounds(self):
        return self.geometry.total_bounds
