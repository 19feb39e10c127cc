"""Attribute-contract meta-test: every exported RasterBlock must expose the
full attribute set (reference tests/test_raster.py:25-55)."""
from datetime import datetime, timedelta

import numpy as np
import pytest

import dask_geomodeling_tpu.raster as raster_module
from dask_geomodeling_tpu.raster import MemorySource, RasterBlock
from tests.factories import MockGeometry

ATTRIBUTES = (
    "period",
    "timedelta",
    "extent",
    "dtype",
    "fillvalue",
    "geometry",
    "projection",
    "geo_transform",
    "temporal",
)


def make_instance(cls, source, geom_source):
    """Build a minimally-valid instance of each block class."""
    from dask_geomodeling_tpu import raster

    simple = {
        raster.Add: (source, 1),
        raster.Subtract: (source, 1),
        raster.Multiply: (source, 2),
        raster.Divide: (source, 2),
        raster.Power: (source, 2),
        raster.Equal: (source, 1),
        raster.NotEqual: (source, 1),
        raster.Greater: (source, 1),
        raster.GreaterEqual: (source, 1),
        raster.Less: (source, 1),
        raster.LessEqual: (source, 1),
        raster.IsData: (source,),
        raster.IsNoData: (source,),
        raster.Exp: (source,),
        raster.Log: (source,),
        raster.Log10: (source,),
        raster.FillNoData: (source, source),
        raster.Invert: (raster.Greater(source, 1),),
        raster.And: (raster.Greater(source, 1), raster.Less(source, 5)),
        raster.Or: (raster.Greater(source, 1), raster.Less(source, 5)),
        raster.Xor: (raster.Greater(source, 1), raster.Less(source, 5)),
        raster.Clip: (source, source),
        raster.Mask: (source, 5),
        raster.MaskBelow: (source, 5),
        raster.Step: (source,),
        raster.Classify: (source, [1, 5]),
        raster.Reclassify: (source, [[1, 10]]),
        raster.Rasterize: (geom_source,),
        raster.RasterizeWKT: (
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
            "EPSG:28992",
        ),
        raster.Dilate: (source, [1]),
        raster.MovingMax: (source, 3),
        raster.Smooth: (source, 2),
        raster.HillShade: (source,),
        raster.Place: (source, "EPSG:28992", (0, 0), [(135000, 456000)]),
        raster.Group: (source, source),
        raster.Max: (source, source),
        raster.Snap: (source, source),
        raster.Shift: (source, 3600000),
        raster.TemporalSum: (source,),
        raster.TemporalAggregate: (source, "2h"),
        raster.Cumulative: (source,),
        raster.Resample: (source, "2h"),
        raster.RasterTiler: (source, 16),
        raster.MemorySource: None,  # the fixture itself
        raster.RasterFileSource: None,  # needs a file; covered elsewhere
        raster.RasterFileSink: None,  # needs a url; covered elsewhere
    }
    if cls not in simple:
        raise AssertionError(
            "Exported RasterBlock %r is missing from the contract sweep; "
            "add a constructor recipe" % cls
        )
    args = simple[cls]
    return cls(*args) if args is not None else None


@pytest.fixture(scope="module")
def source():
    return MemorySource(
        data=np.full((2, 10, 10), 3, dtype=np.uint8),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture(scope="module")
def geom_source():
    return MockGeometry(
        [[(135000, 455990), (135010, 455990), (135010, 456000), (135000, 456000)]],
        projection="EPSG:28992",
    )


def exported_raster_blocks():
    return sorted(
        (
            cls
            for cls in vars(raster_module).values()
            if isinstance(cls, type)
            and issubclass(cls, RasterBlock)
            and cls.__name__ in getattr(raster_module, "__dict__", {})
            and cls not in (RasterBlock,)
            and cls.__name__ != "BaseSingle"
        ),
        key=lambda c: c.__name__,
    )


@pytest.mark.parametrize(
    "cls", exported_raster_blocks(), ids=lambda c: c.__name__
)
def test_attribute_contract(cls, source, geom_source):
    block = make_instance(cls, source, geom_source)
    if block is None:
        pytest.skip("constructed via dedicated fixtures elsewhere")
    for attribute in ATTRIBUTES:
        assert hasattr(block, attribute), attribute
        getattr(block, attribute)  # must not raise


@pytest.mark.parametrize(
    "cls", exported_raster_blocks(), ids=lambda c: c.__name__
)
def test_serialization_roundtrip_contract(cls, source, geom_source):
    """Every exported block must survive to_json/from_json with an
    identical token (views travel between services as JSON)."""
    from dask_geomodeling_tpu.core.graphs import Block

    block = make_instance(cls, source, geom_source)
    if block is None:
        pytest.skip("constructed via dedicated fixtures elsewhere")
    if not block.args or any(
        isinstance(arg, MockGeometry)
        or (isinstance(arg, Block) and isinstance(arg.args[0], MockGeometry))
        for arg in block.args
    ):
        pytest.skip("test-only mock sources do not import by path")
    restored = type(block).from_json(block.to_json())
    assert restored.token == block.token
    assert type(restored) is type(block)
