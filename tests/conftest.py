"""Session fixtures (modeled on the reference tests/conftest.py).

JAX runs on CPU with a virtual 8-device mesh so multi-chip sharding paths
are exercised without TPU hardware.
"""
# The CPU/virtual-mesh setup lives in tests/force_cpu.py, loaded as an early
# pytest plugin (see pyproject.toml addopts) so it runs before output
# capture starts.

from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu.config import config as _config
from dask_geomodeling_tpu.raster.sources import MemorySource

# router-state defaults to a per-user cache file; tests must neither read
# a developer's learned routes nor write their own measurements into it
_config.set({"geomodeling.router-state": None})


@pytest.fixture(scope="session")
def source():
    bands = 3
    yield MemorySource(
        data=[
            np.full((10, 10), 1, dtype=np.uint8),
            np.full((10, 10), 7, dtype=np.uint8),
            np.full((10, 10), 255, dtype=np.uint8),
        ],
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
        metadata=["Testmeta for band {}".format(i) for i in range(bands)],
    )


@pytest.fixture(scope="session")
def empty_source():
    yield MemorySource(
        data=np.empty((0, 0, 0), dtype=np.uint8),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
    )


@pytest.fixture(scope="session")
def empty_temporal_source():
    yield MemorySource(
        data=np.empty((0, 0, 0), dtype=np.uint8),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture(scope="session")
def nodata_source():
    yield MemorySource(
        data=np.full((3, 10, 10), 255, dtype=np.uint8),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture
def vals_request():
    bands = 3
    time_first = datetime(2000, 1, 1)
    time_delta = timedelta(hours=1)
    yield {
        "mode": "vals",
        "start": time_first,
        "stop": time_first + bands * time_delta,
        "width": 4,
        "height": 6,
        "bbox": (135000, 456000 - 3, 135000 + 2, 456000),
        "projection": "EPSG:28992",
    }


@pytest.fixture
def point_request():
    bands = 3
    time_first = datetime(2000, 1, 1)
    time_delta = timedelta(hours=1)
    yield {
        "mode": "vals",
        "start": time_first,
        "stop": time_first + bands * time_delta,
        "width": 1,
        "height": 1,
        "bbox": (135001, 455999, 135001, 455999),
        "projection": "EPSG:28992",
    }


@pytest.fixture
def vals_request_none():
    bands = 3
    time_first = datetime(2001, 1, 1)
    time_delta = timedelta(hours=1)
    yield {
        "mode": "vals",
        "start": time_first,
        "stop": time_first + bands * time_delta,
        "width": 4,
        "height": 6,
        "bbox": (135000, 456000 - 3, 135000 + 2, 456000),
        "projection": "EPSG:28992",
    }


@pytest.fixture
def expected_meta():
    return ["Testmeta for band {}".format(i) for i in range(3)]


@pytest.fixture
def expected_time():
    time_first = datetime(2000, 1, 1)
    time_delta = timedelta(hours=1)
    return [time_first + i * time_delta for i in range(3)]
