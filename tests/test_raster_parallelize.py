"""RasterTiler tests (ported from reference
tests/test_raster_parallelize.py): tile grid splitting, cellsize
preservation, reassembly at nodata edges, and pass-through modes."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu.raster import MemorySource, RasterTiler


@pytest.fixture
def empty_source():
    return MemorySource(
        data=np.empty((0, 0, 0), np.uint8),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(0, 0),
    )


@pytest.fixture
def source():
    data = np.arange(75, dtype=np.uint8).reshape(3, 5, 5) % 250
    data[2] = 255  # nodata frame
    data[0, 0, 0] = 1
    data[1, 0, 0] = 7
    return MemorySource(
        data=data,
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
        metadata=["meta%d" % i for i in range(3)],
    )


def check_sources_and_requests(s_r, expected_bboxes, cellsize=(1, 1)):
    got = [(req["bbox"], req["width"], req["height"]) for _, req in list(s_r)[1:]]
    got_bboxes = sorted(tuple(float(v) for v in b) for b, _, _ in got)
    assert got_bboxes == sorted(expected_bboxes)
    for bbox, width, height in got:
        assert width == int((bbox[2] - bbox[0]) / cellsize[0])
        assert height == int((bbox[3] - bbox[1]) / cellsize[1])


def test_tiler_defaults(empty_source):
    block = RasterTiler(empty_source, 10)
    assert block.store is empty_source
    assert list(block.tile_size) == [10, 10]


def test_tiler_source_validation(empty_source):
    with pytest.raises(TypeError):
        RasterTiler("a", 10)


@pytest.mark.parametrize("bad", ["a", 0, [1], [2, 3, 3]])
def test_tiler_tile_size_validation(empty_source, bad):
    with pytest.raises(ValueError):
        RasterTiler(empty_source, bad)


@pytest.mark.parametrize(
    "bbox,expected_tiles",
    [
        ((0.0, 0.0, 7.0, 7.0), [(0.0, 0.0, 7.0, 7.0)]),  # exact
        ((2.0, -1.0, 9.0, 6.0), [(2.0, -1.0, 9.0, 6.0)]),  # exact, shifted
        ((2.0, 7.0, 7.0, 14.0), [(2.0, 7.0, 7.0, 14.0)]),  # smaller in x1
        ((0.0, 7.0, 5.0, 14.0), [(0.0, 7.0, 5.0, 14.0)]),  # smaller in x2
        ((0.0, 9.0, 7.0, 14.0), [(0.0, 9.0, 7.0, 14.0)]),  # smaller in y1
        ((0.0, 7.0, 7.0, 12.0), [(0.0, 7.0, 7.0, 12.0)]),  # smaller in y2
        ((0.0, 0.0, 14.0, 7.0), [(0.0, 0.0, 7.0, 7.0), (7.0, 0.0, 14.0, 7.0)]),
        ((0.0, 0.0, 7.0, 14.0), [(0.0, 0.0, 7.0, 7.0), (0.0, 7.0, 7.0, 14.0)]),
        (
            (10.0, -10.0, 20.0, 2.0),
            [
                (10.0, -10.0, 17.0, -3.0),
                (10.0, -3.0, 17.0, 2.0),
                (17.0, -10.0, 20.0, -3.0),
                (17.0, -3.0, 20.0, 2.0),
            ],
        ),
    ],
)
def test_tiler(empty_source, bbox, expected_tiles):
    block = RasterTiler(empty_source, 7)
    s_r = block.get_sources_and_requests(
        mode="vals",
        bbox=bbox,
        width=int(bbox[2] - bbox[0]),
        height=int(bbox[3] - bbox[1]),
        projection="EPSG:28992",
    )
    check_sources_and_requests(s_r, expected_tiles)


@pytest.mark.parametrize(
    "cellsize", [(1, 1), (2, 2), (3, 3), (4, 4), (2, 3), (1, 4)]
)
def test_tiler_cellsize(empty_source, cellsize):
    block = RasterTiler(empty_source, 24)
    s_r = block.get_sources_and_requests(
        mode="vals",
        bbox=(3.0, 3.0, 15.0, 15.0),
        width=int(12 / cellsize[0]),
        height=int(12 / cellsize[1]),
        projection="EPSG:28992",
    )
    check_sources_and_requests(s_r, [(3.0, 3.0, 15.0, 15.0)], cellsize)


@pytest.mark.parametrize(
    "bbox_offset",
    [
        (0, -5, 5, 0),  # covers exactly the 5x5 m of source data
        (0, -5, 6, 0),
        (0, -6, 5, 0),
        (-1, -5, 5, 0),
        (0, -5, 5, 1),
    ],
)
def test_tiler_process(source, bbox_offset):
    # piece back together tiles with nodata at the edges
    block = RasterTiler(source, 2)
    ox, oy = 135000, 456000
    request = dict(
        mode="vals",
        bbox=(
            ox + bbox_offset[0],
            oy + bbox_offset[1],
            ox + bbox_offset[2],
            oy + bbox_offset[3],
        ),
        width=(bbox_offset[2] - bbox_offset[0]) * 2,  # 0.5 m resolution
        height=(bbox_offset[3] - bbox_offset[1]) * 2,
        projection="EPSG:28992",
        start=datetime(2000, 1, 1),
        stop=datetime(2000, 1, 1, 2),
    )
    actual = block.get_data(**request)
    expected = source.get_data(**request)
    np.testing.assert_array_equal(actual["values"], expected["values"])
    assert actual["no_data_value"] == expected["no_data_value"]


def test_tiler_point_request(source):
    view = RasterTiler(source, 2)
    actual = view.get_data(
        mode="vals",
        bbox=(135000.5, 455999.5, 135000.5, 455999.5),
        width=1,
        height=1,
        projection="EPSG:28992",
        start=datetime(2000, 1, 1),
        stop=datetime(2000, 1, 1, 2),
    )
    assert actual["values"].tolist() == [[[1]], [[7]], [[255]]]


@pytest.mark.parametrize("mode,key", [("meta", "meta"), ("time", "time")])
def test_tiler_passthrough_modes(source, mode, key):
    tiler = RasterTiler(source, 2)
    request = dict(
        mode=mode,
        bbox=(135000, 455995, 135005, 456000),
        width=5,
        height=5,
        projection="EPSG:28992",
        start=datetime(2000, 1, 1),
        stop=datetime(2000, 1, 1, 2),
    )
    assert tiler.get_data(**request)[key] == source.get_data(**request)[key]
