"""Zarr v2 raster store tests (GDAL Zarr driver role,
reference raster/sources.py:66-71).  Hand-built stores follow the
published v2 spec + xarray conventions, independent of the writer."""
import json
import os
import zlib

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.zarr import read_zarr, write_zarr


def _mkstore(root, name, array, chunks, attrs=None, compressor="zlib",
             sep=".", fill_value=0, missing=()):
    """A spec-conformant v2 array written chunk by chunk."""
    dirpath = os.path.join(str(root), name) if name else str(root)
    os.makedirs(dirpath, exist_ok=True)
    comp = {"zlib": {"id": "zlib", "level": 1}, "bz2": {"id": "bz2"},
            "lzma": {"id": "lzma"}, None: None,
            "blosc": {"id": "blosc", "cname": "lz4"}}[compressor]
    meta = {
        "zarr_format": 2, "shape": list(array.shape),
        "chunks": list(chunks), "dtype": array.dtype.str,
        "compressor": comp, "fill_value": fill_value, "order": "C",
        "filters": None, "dimension_separator": sep,
    }
    json.dump(meta, open(os.path.join(dirpath, ".zarray"), "w"))
    json.dump(attrs or {}, open(os.path.join(dirpath, ".zattrs"), "w"))
    grid = [-(-s // c) for s, c in zip(array.shape, chunks)]
    for flat in range(int(np.prod(grid)) if grid else 1):
        index, rem = [], flat
        for g in reversed(grid):
            index.append(rem % g)
            rem //= g
        index = tuple(reversed(index))
        if index in missing:
            continue
        full = np.full(chunks, fill_value, dtype=array.dtype)
        slices = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(index, chunks, array.shape)
        )
        part = array[slices]
        full[tuple(slice(0, p) for p in part.shape)] = part
        payload = full.tobytes()
        if compressor == "zlib":
            payload = zlib.compress(payload, 1)
        elif compressor == "bz2":
            import bz2

            payload = bz2.compress(payload)
        elif compressor == "lzma":
            import lzma

            payload = lzma.compress(payload)
        key = sep.join(str(i) for i in index) or "0"
        target = os.path.join(dirpath, *key.split("/"))
        os.makedirs(os.path.dirname(target), exist_ok=True)
        open(target, "wb").write(payload)


def _coords(root, xs, ys):
    _mkstore(root, "x", np.asarray(xs, "<f8"), (len(xs),),
             {"_ARRAY_DIMENSIONS": ["x"]}, compressor=None)
    _mkstore(root, "y", np.asarray(ys, "<f8"), (len(ys),),
             {"_ARRAY_DIMENSIONS": ["y"]}, compressor=None)
    json.dump({"zarr_format": 2}, open(os.path.join(str(root), ".zgroup"), "w"))


GRID = np.arange(48, dtype="<f4").reshape(6, 8)


def test_hand_built_group_store(tmp_path):
    root = tmp_path / "s.zarr"
    _mkstore(root, "rain", GRID, (4, 3),
             {"_ARRAY_DIMENSIONS": ["y", "x"], "_FillValue": -1.0})
    _coords(root, 100.5 + np.arange(8), 55.5 - np.arange(6))
    data = read_zarr(str(root))
    np.testing.assert_array_equal(data.array[0], GRID)
    np.testing.assert_allclose(
        data.geo_transform, (100.0, 1.0, 0.0, 56.0, 0.0, -1.0)
    )
    assert data.no_data_value == -1.0


def test_missing_chunk_and_south_up(tmp_path):
    root = tmp_path / "s.zarr"
    _mkstore(root, "v", GRID, (4, 4),
             {"_ARRAY_DIMENSIONS": ["y", "x"], "_FillValue": -7.0},
             fill_value=-7.0, missing=((1, 1),))
    # ascending y coordinates: south-up storage flips to north-up
    _coords(root, 0.5 + np.arange(8), 0.5 + np.arange(6))
    data = read_zarr(str(root))
    flipped = data.array[0][::-1]  # undo north-up to compare with file
    assert (flipped[4:6, 4:8] == -7.0).all()  # the missing chunk
    np.testing.assert_array_equal(flipped[:4, :4], GRID[:4, :4])
    assert data.geo_transform[5] == -1.0


def test_slash_separator_and_root_array(tmp_path):
    root = tmp_path / "bare.zarr"
    _mkstore(root, "", GRID, (6, 8), sep="/")
    data = read_zarr(str(root))
    np.testing.assert_array_equal(data.array[0], GRID)


@pytest.mark.parametrize("compressor", ["bz2", "lzma", None])
def test_stdlib_compressors(tmp_path, compressor):
    root = tmp_path / "c.zarr"
    _mkstore(root, "v", GRID, (6, 8), {"_ARRAY_DIMENSIONS": ["y", "x"]},
             compressor=compressor)
    _coords(root, np.arange(8) + 0.5, 5.5 - np.arange(6))
    np.testing.assert_array_equal(read_zarr(str(root)).array[0], GRID)


def test_blosc_clear_error(tmp_path):
    root = tmp_path / "b.zarr"
    arr = GRID.copy()
    _mkstore(root, "v", arr, (6, 8), {"_ARRAY_DIMENSIONS": ["y", "x"]},
             compressor="blosc")
    with pytest.raises(NotImplementedError, match="blosc"):
        read_zarr(str(root))


def test_scale_offset_unpacking(tmp_path):
    root = tmp_path / "p.zarr"
    packed = np.arange(12, dtype="<i2").reshape(3, 4)
    _mkstore(root, "t", packed, (3, 4), {
        "_ARRAY_DIMENSIONS": ["y", "x"],
        "scale_factor": 0.5, "add_offset": 100.0, "_FillValue": 11,
    })
    _coords(root, np.arange(4) + 0.5, 2.5 - np.arange(3))
    data = read_zarr(str(root))
    expected = packed.astype("f4") * 0.5 + 100.0
    out = data.array[0]
    assert out[2, 3] == data.no_data_value  # packed 11 was the fill
    mask = packed != 11
    np.testing.assert_allclose(out[mask], expected[mask])


def test_writer_roundtrip_and_consolidated(tmp_path):
    root = str(tmp_path / "w.zarr")
    values = (np.arange(2 * 30 * 40) % 200).reshape(2, 30, 40).astype("f8")
    gt = (1000.0, 5.0, 0.0, 2000.0, 0.0, -5.0)
    write_zarr(root, values, gt, projection="EPSG:28992",
               no_data_value=-9999.0)
    data = read_zarr(root)
    np.testing.assert_array_equal(data.array, values)
    np.testing.assert_allclose(data.geo_transform, gt)
    assert data.no_data_value == -9999.0
    from dask_geomodeling_tpu.geo.crs import get_epsg_or_wkt

    assert get_epsg_or_wkt(data.projection) == "EPSG:28992"
    # consolidated-only read: drop the per-array metadata documents
    for name in ("data", "x", "y", "spatial_ref"):
        os.unlink(os.path.join(root, name, ".zarray"))
    data2 = read_zarr(root)
    np.testing.assert_array_equal(data2.array, values)


def test_raster_file_source_integration(tmp_path):
    from dask_geomodeling_tpu.raster import RasterFileSource

    values = np.arange(100, dtype="f4").reshape(1, 10, 10)
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    write_zarr(str(tmp_path / "r.zarr"), values, gt,
               projection="EPSG:28992", no_data_value=-1.0)
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = RasterFileSource("r.zarr")
        assert source.projection == "EPSG:28992"
        out = source.get_data(
            mode="vals", bbox=(0, 0, 10, 10), projection="EPSG:28992",
            width=10, height=10,
        )
    np.testing.assert_array_equal(out["values"], values)
    assert out["no_data_value"] == -1.0


def test_not_a_store(tmp_path):
    os.makedirs(str(tmp_path / "e.zarr"))
    with pytest.raises(IOError, match="Zarr"):
        read_zarr(str(tmp_path / "e.zarr"))


def test_to_zarr_export(tmp_path):
    """End-to-end export through the block API."""
    from dask_geomodeling_tpu.raster import MemorySource, RasterFileSource, to_zarr

    data = (np.arange(400, dtype="f8") % 37).reshape(1, 20, 20)
    source = MemorySource(
        data=data, no_data_value=255.0, projection="EPSG:28992",
        pixel_size=2.0, pixel_origin=(1000, 2000),
    )
    with config.set({"geomodeling.root": str(tmp_path)}):
        to_zarr(source + 1.0, "export.zarr")
        back = RasterFileSource("export.zarr")
        assert back.projection == "EPSG:28992"
        out = back.get_data(
            mode="vals", bbox=(1000, 1960, 1040, 2000),
            projection="EPSG:28992", width=20, height=20,
        )
    np.testing.assert_array_equal(out["values"], data + 1.0)


class TestWindowedReads:
    """Chunk-level windows: the invariant is windowed == whole-read slice
    bit-exact (the same contract tests/test_geotiff_window.py pins for
    TIFF block reads)."""

    def _store(self, tmp_path, south_up=False, scale=False):
        root = tmp_path / "big.zarr"
        data = ((np.arange(60 * 80) * 7) % 251).astype("<i2").reshape(60, 80)
        attrs = {"_ARRAY_DIMENSIONS": ["y", "x"], "_FillValue": -5}
        if scale:
            attrs.update(scale_factor=0.25, add_offset=10.0)
        stored = data[::-1] if south_up else data
        _mkstore(root, "v", stored, (16, 16), attrs, fill_value=-5,
                 missing=((2, 2),))
        ys = (
            (0.5 + np.arange(60)) if south_up else (59.5 - np.arange(60))
        )
        _coords(root, 0.5 + np.arange(80), ys)
        return str(root)

    @pytest.mark.parametrize("south_up", [False, True])
    @pytest.mark.parametrize("scale", [False, True])
    def test_window_equals_whole_slice(self, tmp_path, south_up, scale):
        from dask_geomodeling_tpu.io.zarr import read_zarr_window

        path = self._store(tmp_path, south_up, scale)
        whole = read_zarr(path)
        for r0, r1, c0, c1 in [
            (0, 60, 0, 80), (10, 50, 5, 70), (30, 42, 30, 35),
            (0, 16, 64, 80), (59, 60, 0, 1),
        ]:
            window = read_zarr_window(path, r0, r1, c0, c1)
            np.testing.assert_array_equal(
                window.array, whole.array[:, r0:r1, c0:c1]
            )
            gt = whole.geo_transform
            np.testing.assert_allclose(
                window.geo_transform,
                (gt[0] + c0 * gt[1], gt[1], 0.0,
                 gt[3] + r0 * gt[5], 0.0, gt[5]),
            )
            assert window.no_data_value == whole.no_data_value

    def test_window_reads_only_touched_chunks(self, tmp_path, monkeypatch):
        from dask_geomodeling_tpu.io import zarr as zarr_mod

        path = self._store(tmp_path)
        opened = []
        original = open

        def counting_open(file, *args, **kwargs):
            name = os.fspath(file)
            if os.sep + "v" + os.sep in name and not name.endswith(
                (".zarray", ".zattrs")
            ):
                opened.append(name)
            return original(file, *args, **kwargs)

        import builtins

        monkeypatch.setattr(builtins, "open", counting_open)
        zarr_mod.read_zarr_window(path, 0, 16, 0, 16)
        assert len(opened) == 1  # a single 16x16 chunk

    def test_file_source_windowed_equals_whole(self, tmp_path):
        from dask_geomodeling_tpu.raster import RasterFileSource
        from dask_geomodeling_tpu.runtime.pipeline import clear_read_cache

        path = self._store(tmp_path)
        request = dict(
            mode="vals", bbox=(10.0, 10.0, 50.0, 40.0),
            projection="EPSG:4326", width=40, height=30,
        )
        with config.set({"geomodeling.root": str(tmp_path)}):
            source = RasterFileSource("big.zarr")
            whole = source.get_data(**request)
            clear_read_cache()
            with config.set({"geomodeling.windowed-read-limit": 100}):
                windowed = source.get_data(**request)
        np.testing.assert_array_equal(whole["values"], windowed["values"])

    def test_info_is_metadata_only(self, tmp_path, monkeypatch):
        from dask_geomodeling_tpu.raster import RasterFileSource

        path = self._store(tmp_path)
        import builtins

        original = open
        chunk_opens = []

        def counting_open(file, *args, **kwargs):
            name = os.fspath(file)
            base = os.path.basename(name)
            if os.sep + "v" + os.sep in name and not base.startswith("."):
                chunk_opens.append(name)
            return original(file, *args, **kwargs)

        whole = read_zarr(path)  # the comparison values, BEFORE hooking
        monkeypatch.setattr(builtins, "open", counting_open)
        with config.set({"geomodeling.root": str(tmp_path)}):
            source = RasterFileSource("big.zarr")
            # the attribute sweep mirrors whole-read georeferencing...
            assert source.projection == "EPSG:4326"
            np.testing.assert_allclose(
                tuple(source.geo_transform), whole.geo_transform
            )
            assert source.fillvalue == whole.no_data_value
            assert len(source) == 1
        # ...without opening a single data chunk (metadata + coords only)
        assert chunk_opens == []


def test_one_pixel_window_keeps_cell_size(tmp_path):
    """Review regression: a 1-px window must not fabricate a 1.0-unit
    cell size when the coordinate slice has a single element."""
    from dask_geomodeling_tpu.io.zarr import read_zarr_window

    root = tmp_path / "cells.zarr"
    grid = np.arange(100, dtype="<f4").reshape(10, 10)
    _mkstore(root, "v", grid, (10, 10), {"_ARRAY_DIMENSIONS": ["y", "x"]})
    _coords(root, 1000.0 + 10.0 * (np.arange(10) + 0.5),
            2000.0 - 10.0 * (np.arange(10) + 0.5))
    window = read_zarr_window(str(root), 0, 1, 0, 1)
    np.testing.assert_allclose(
        window.geo_transform, (1000.0, 10.0, 0.0, 2000.0, 0.0, -10.0)
    )
    assert window.array.shape == (1, 1, 1)
    assert window.array[0, 0, 0] == 0.0


def test_cache_sees_inplace_chunk_rewrites(tmp_path):
    """Review regression: rewriting a chunk in place (no metadata or
    directory mtime change) must invalidate the read caches."""
    import time

    from dask_geomodeling_tpu.runtime.pipeline import read_geotiff_cached

    root = str(tmp_path / "mut.zarr")
    values = np.zeros((1, 4, 4), dtype="f8")
    write_zarr(root, values, (0, 1, 0, 4, 0, -1))
    first = read_geotiff_cached(root)
    assert (first.array == 0).all()
    # rewrite the single chunk IN PLACE (same name, direct write)
    chunk_path = os.path.join(root, "data", "0.0.0")
    new = np.full((1, 4, 4), 7.0)
    payload = zlib.compress(new.astype("<f8").tobytes(), 6)
    time.sleep(0.01)  # ensure a distinguishable mtime_ns
    with open(chunk_path, "wb") as f:
        f.write(payload)
    second = read_geotiff_cached(root)
    assert (second.array == 7.0).all()


def test_info_with_list_valued_fill(tmp_path):
    """Review regression: array-valued _FillValue attributes occur in
    the wild; info must match the read path's scalar() handling."""
    from dask_geomodeling_tpu.io.zarr import read_zarr_info

    root = tmp_path / "lf.zarr"
    grid = np.arange(16, dtype="<i2").reshape(4, 4)
    _mkstore(root, "v", grid, (4, 4),
             {"_ARRAY_DIMENSIONS": ["y", "x"], "_FillValue": [-9999]})
    _coords(root, np.arange(4) + 0.5, 3.5 - np.arange(4))
    info = read_zarr_info(str(root))
    assert info.no_data_value == -9999.0
    assert read_zarr(str(root)).no_data_value == -9999.0


def test_variable_selection(tmp_path):
    """Multi-variable stores: RasterFileSource(variable=...) plays
    GDAL's subdataset role."""
    from dask_geomodeling_tpu.raster import RasterFileSource

    root = tmp_path / "multi.zarr"
    rain = np.full((4, 4), 3.0, dtype="<f4")
    temp = np.full((4, 4), 21.0, dtype="<f4")
    _mkstore(root, "rain", rain, (4, 4), {"_ARRAY_DIMENSIONS": ["y", "x"]})
    _mkstore(root, "temp", temp, (4, 4), {"_ARRAY_DIMENSIONS": ["y", "x"]})
    _coords(root, np.arange(4) + 0.5, 3.5 - np.arange(4))
    request = dict(mode="vals", bbox=(0, 0, 4, 4), projection="EPSG:4326",
                   width=4, height=4)
    with config.set({"geomodeling.root": str(tmp_path)}):
        got_rain = RasterFileSource(
            "multi.zarr", variable="rain"
        ).get_data(**request)
        got_temp = RasterFileSource(
            "multi.zarr", variable="temp"
        ).get_data(**request)
    np.testing.assert_array_equal(got_rain["values"][0], rain)
    np.testing.assert_array_equal(got_temp["values"][0], temp)
    # distinct variables are distinct blocks (distinct tokens)
    a = RasterFileSource("x.zarr", variable="rain")
    b = RasterFileSource("x.zarr", variable="temp")
    assert a.token != b.token
    # pre-variable serialized graphs (3 args) still deserialize
    from dask_geomodeling_tpu.core import Block

    legacy = RasterFileSource("x.zarr")
    rebuilt = Block.from_json(legacy.to_json())
    assert rebuilt.variable is None


def test_non_epsg_crs_roundtrip(tmp_path):
    """A parametric (non-EPSG) CRS survives the write/read cycle via the
    structural WKT in spatial_ref (MODIS-sinusoidal case)."""
    from dask_geomodeling_tpu.geo.crs import get_transform_func

    proj4 = "+proj=sinu +lon_0=10 +a=6371007.181 +b=6371007.181 +units=m"
    root = str(tmp_path / "sinu.zarr")
    write_zarr(root, np.zeros((1, 4, 4), "u1"), (0, 1, 0, 4, 0, -1),
               projection=proj4)
    back = read_zarr(root)
    a = get_transform_func("EPSG:4326", proj4)(
        np.array([12.0]), np.array([45.0])
    )
    b = get_transform_func("EPSG:4326", back.projection)(
        np.array([12.0]), np.array([45.0])
    )
    np.testing.assert_allclose(a, b, atol=1e-6)
