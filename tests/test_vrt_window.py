"""Windowed VRT mosaic reads: only the member rasters a window touches
are opened (the to_file tile-pyramid access pattern; the reference's
counterpart is GDAL reading a BuildVRT mosaic through its block cache).
"""
import os

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.vrt import read_vrt, read_vrt_info, read_vrt_window
from dask_geomodeling_tpu.raster import MemorySource, to_file


@pytest.fixture
def mosaic(tmp_path):
    """A 2x2-tile VRT (each tile 50x50) written through to_file."""
    data = ((np.arange(100 * 100) * 7) % 251).astype("u1").reshape(1, 100, 100)
    source = MemorySource(
        data=data, no_data_value=255, projection="EPSG:28992",
        pixel_size=1.0, pixel_origin=(0, 100),
    )
    with config.set({"geomodeling.root": str(tmp_path)}):
        to_file(
            source, str(tmp_path / "out.vrt"), tile_size=50,
            bbox=(0, 0, 100, 100), width=100, height=100,
            projection="EPSG:28992",
        )
    return str(tmp_path / "out.vrt"), data


def test_window_equals_whole_slice(mosaic):
    path, data = mosaic
    whole = read_vrt(path)
    np.testing.assert_array_equal(whole.array, data)
    for r0, r1, c0, c1 in [
        (0, 100, 0, 100), (10, 90, 25, 75), (49, 51, 49, 51), (0, 1, 99, 100),
    ]:
        window = read_vrt_window(path, r0, r1, c0, c1)
        np.testing.assert_array_equal(
            window.array, whole.array[:, r0:r1, c0:c1]
        )
        gt = whole.geo_transform
        np.testing.assert_allclose(
            window.geo_transform,
            (gt[0] + c0 * gt[1], gt[1], 0, gt[3] + r0 * gt[5], 0, gt[5]),
        )
        assert window.no_data_value == whole.no_data_value


def test_untouched_members_never_open(mosaic, monkeypatch):
    path, _ = mosaic
    import builtins

    opened = []
    original = open

    def counting_open(file, *args, **kwargs):
        name = os.fspath(file)
        if name.endswith(".tif"):
            opened.append(name)
        return original(file, *args, **kwargs)

    monkeypatch.setattr(builtins, "open", counting_open)
    # a window entirely inside the north-west tile
    window = read_vrt_window(path, 5, 40, 5, 40)
    assert window.array.shape == (1, 35, 35)
    assert len(set(opened)) == 1  # exactly one member raster touched


def test_info_is_header_only(mosaic, monkeypatch):
    path, _ = mosaic
    import builtins

    opened = []
    original = open

    def counting_open(file, *args, **kwargs):
        name = os.fspath(file)
        if name.endswith(".tif"):
            opened.append(name)
        return original(file, *args, **kwargs)

    whole = read_vrt(path)
    monkeypatch.setattr(builtins, "open", counting_open)
    info = read_vrt_info(path)
    assert opened == []
    assert (info.width, info.height) == (100, 100)
    np.testing.assert_allclose(info.geo_transform, whole.geo_transform)
    assert info.no_data_value == whole.no_data_value


def test_file_source_windowed_equals_whole(mosaic, tmp_path):
    from dask_geomodeling_tpu.raster import RasterFileSource
    from dask_geomodeling_tpu.runtime.pipeline import clear_read_cache

    path, _ = mosaic
    request = dict(
        mode="vals", bbox=(10.0, 10.0, 90.0, 90.0),
        projection="EPSG:28992", width=80, height=80,
    )
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = RasterFileSource("out.vrt")
        assert (source.info.width, source.info.height) == (100, 100)
        whole = source.get_data(**request)
        clear_read_cache()
        with config.set({"geomodeling.windowed-read-limit": 100}):
            windowed = source.get_data(**request)
    np.testing.assert_array_equal(whole["values"], windowed["values"])
