"""End-to-end integration scenarios across subsystems: raster pipeline →
zonal aggregation → field operations → vector sink → re-read, and raster
export → file source → XLA executor → WMS tile."""
import json
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.geo.geometry import box
from dask_geomodeling_tpu.geo.features import GeoDataFrame
from dask_geomodeling_tpu.geometry import (
    AggregateRaster,
    Classify as FieldClassify,
    GeometryFileSource,
)
from dask_geomodeling_tpu.geometry.sinks import to_file as geometry_to_file
from dask_geomodeling_tpu.io.vectorfile import read_vector, write_vector
from dask_geomodeling_tpu.raster import (
    Add,
    Classify,
    MemorySource,
    RasterFileSource,
    Smooth,
    to_file as raster_to_file,
)


@pytest.fixture
def root(tmp_path):
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path


@pytest.fixture
def elevation():
    rng = np.random.RandomState(0)
    return MemorySource(
        data=(rng.rand(1, 64, 64) * 100).astype(np.float32),
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000.0, 456000.0),
        time_first=datetime(2000, 1, 1),
        time_delta=None,
    )


def test_parcel_statistics_story(root, elevation):
    """Parcels from a file, zonal mean of a smoothed raster, classified,
    written to GeoPackage, read back with the computed columns intact."""
    import pandas as pd

    parcels = GeoDataFrame(
        pd.DataFrame({"name": ["a", "b", "c"]}),
        geometry=[
            box(135002, 455938, 135018, 455958),
            box(135022, 455938, 135038, 455958),
            box(135042, 455938, 135058, 455958),
        ],
        crs="EPSG:28992",
    )
    write_vector(parcels, str(root / "parcels.gpkg"))

    smoothed = Smooth(Add(elevation, 10.0), size=3)
    view = AggregateRaster(
        GeometryFileSource("parcels.gpkg"),
        smoothed,
        statistic="mean",
        column_name="mean_elev",
    )
    labeled = view.set(
        "class",
        FieldClassify(view["mean_elev"], bins=[60.0], labels=["low", "high"]),
    )

    request = dict(
        mode="intersects",
        geometry=box(135000, 455936, 135064, 456000),
        projection="EPSG:28992",
        start=datetime(2000, 1, 1),
    )
    features = labeled.get_data(**request)["features"]
    assert len(features) == 3
    assert set(features["class"]) <= {"low", "high"}
    expected_means = features["mean_elev"].tolist()

    # the whole view serializes and reconstructs
    from dask_geomodeling_tpu.core.graphs import Block

    rebuilt = Block.from_json(labeled.to_json())
    rebuilt_features = rebuilt.get_data(**request)["features"]
    assert rebuilt_features["mean_elev"].tolist() == expected_means

    # sink to GeoPackage and read back
    geometry_to_file(
        labeled, str(root / "stats.gpkg"),
        fields={"mean_elev": "mean_elev", "class": "class"}, **request,
    )
    reread = read_vector(str(root / "stats.gpkg"))
    assert len(reread) == 3
    np.testing.assert_allclose(
        sorted(reread["mean_elev"].tolist()), sorted(expected_means), rtol=1e-6
    )


def test_export_reload_serve_story(root, elevation):
    """Raster export → VRT file source → fused XLA evaluation → WMS PNG."""
    classified = Classify(Add(elevation, 10.0), bins=[40.0, 80.0, 120.0])
    raster_to_file(
        classified, str(root / "out.vrt"), tile_size=32,
        start=datetime(2000, 1, 1),
    )

    reloaded = RasterFileSource("out.vrt")
    request = dict(
        mode="vals",
        bbox=(135000, 455936, 135064, 456000),
        projection="EPSG:28992",
        width=64,
        height=64,
        start=datetime(1970, 1, 1),
    )
    direct = classified.get_data(**dict(request, start=datetime(2000, 1, 1)))
    from_file = reloaded.get_data(**request)
    np.testing.assert_array_equal(from_file["values"], direct["values"])

    # the file-backed view evaluates through the fused device path
    view = Add(reloaded, 1)
    expected = view.get_data(**request)
    with config.set({"geomodeling.executor": "jax"}):
        actual = view.get_data(**request)
    np.testing.assert_array_equal(actual["values"], expected["values"])

    # and serves as a WMS tile from its JSON form
    from dask_geomodeling_tpu.ipyleaflet_plugin import render_wms_tile

    png = render_wms_tile(
        {
            "layers": view.to_json(),
            "styles": "viridis",
            "vmin": "0",
            "vmax": "5",
            "format": "image/png",
            "srs": "EPSG:28992",
            "height": "64",
            "width": "64",
            "maxcellsize": "10.0",
            "time": "",
            "bbox": "135000,455936,135064,456000",
        }
    )
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
