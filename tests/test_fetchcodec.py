"""Packed device->host fetch: lossless by construction, bit-exact with
the unpacked path and the host executor."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import (
    Add,
    Classify,
    MemorySource,
    Reclassify,
    Step,
)
from dask_geomodeling_tpu.geo import get_dtype_max as utils_dtype_max
from dask_geomodeling_tpu.runtime.fetchcodec import (
    FetchCodec,
    codec_from_values,
    derive_codec,
)
from dask_geomodeling_tpu.runtime.tiles import _get_tile_program, evaluate_tiled


@pytest.fixture(scope="module", autouse=True)
def _x64():
    # tests here jit codec.encode directly (outside TileProgram, which
    # calls _ensure_x64 itself); int64-max fills overflow without x64
    from dask_geomodeling_tpu.runtime.executor import _ensure_x64

    _ensure_x64()


@pytest.fixture(scope="module")
def source():
    rng = np.random.RandomState(7)
    data = (rng.rand(1, 64, 64) * 250).astype(np.float32)
    data[0, :8, :8] = np.float32(np.finfo(np.float32).max)  # nodata patch
    return MemorySource(
        data=data,
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture
def request_64():
    return dict(
        mode="vals",
        bbox=(135000, 455936, 135064, 456000),
        projection="EPSG:28992",
        width=64,
        height=64,
        start=datetime(2000, 1, 1),
    )


@pytest.mark.parametrize(
    "lo,hi,fill,dtype,shape",
    [
        (0, 4, 255, "uint8", (1, 13, 17)),  # classify-style, S=6 -> 3 px/B
        (0, 1, None, "bool", (2, 9, 31)),  # boolean mask, S=2 -> 8 px/B
        (-3, 2, 127, "int8", (1, 16, 16)),  # negative lo, S=7 -> 2 px/B
        (0, 1, 0, "uint8", (3, 5, 5)),  # fill inside range: no extra code
        (0, 14, 255, "int64", (1, 32, 32)),  # S=16 boundary -> 2 px/B
    ],
)
def test_codec_roundtrip(lo, hi, fill, dtype, shape):
    import jax

    rng = np.random.RandomState(42)
    values = rng.randint(lo, hi + 1, size=shape).astype(dtype)
    if fill is not None:
        mask = rng.rand(*shape) < 0.3
        values[mask] = fill

    codec = derive_codec(dtype, fill, None, None) if dtype == "bool" else None
    if codec is None:
        func = lambda *a: (lo, hi)
        func.jax_out_range = func
        codec = derive_codec(dtype, fill, func, [])
    assert codec is not None
    packed = np.asarray(jax.jit(codec.encode)(values))
    assert packed.dtype == np.uint8
    assert packed.shape[1] <= -(-shape[1] * shape[2] // 2)  # >= 2 px/byte
    decoded = codec.decode(packed[None], shape[1], shape[2])[0]
    assert decoded.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(decoded, values)


@pytest.mark.parametrize(
    "lo,fill,fill_code,symbols,group,dtype",
    [
        (0, None, None, 2, 8, "bool"),
        (0, 255, 5, 6, 3, "uint8"),
        (-3, 100, 15, 16, 2, "int32"),  # multi-byte dtype -> wide LUT rows
        (1, None, None, 4, 4, "uint8"),
    ],
)
def test_native_decode_equals_numpy(lo, fill, fill_code, symbols, group, dtype):
    """The threaded C++ unpacker is bit-exact with the numpy LUT gather
    (and decode works identically whichever one a host has)."""
    codec = FetchCodec(lo, fill, fill_code, symbols, group, dtype)
    rng = np.random.RandomState(3)
    h, w = 37, 53  # force padding slack in the packed rows
    m = -(-h * w // group)
    packed = rng.randint(0, symbols**group, (4, 2, m)).astype(np.uint8)
    table = codec._decode_table()
    expected = (
        table[packed].reshape(4, 2, -1)[:, :, : h * w].reshape(4, 2, h, w)
    )
    got = codec.decode(packed, h, w)
    assert got.dtype == expected.dtype
    np.testing.assert_array_equal(got, expected)


def test_derive_codec_rejects():
    assert derive_codec("float32", np.nan, None, None) is None

    def wide(*a):
        return (0, 100)

    wide.jax_out_range = wide
    assert derive_codec("uint8", 255, wide, []) is None

    from dask_geomodeling_tpu.raster.misc import _reclassify_process

    out_range = _reclassify_process.jax_out_range
    assert out_range(None, {"select": False, "data": [[1, 2]]}) is None
    assert out_range(None, {"select": True, "data": [[1, 2], [3, 9]]}) == (2, 9)


class TestPaletteCodec:
    """Sparse discrete alphabets (jax_out_values) pack by value COUNT."""

    def _palette_func(self, values):
        func = lambda *a: None
        func.jax_out_values = lambda *a: values
        func.jax_out_range = lambda *a: None
        return func

    def test_sparse_targets_pack(self):
        import jax

        # range span 17 would disable packing; 5 values + fill -> S=6
        func = self._palette_func([1, 5, 9, 13, 17])
        codec = derive_codec("int64", 2**63 - 1, func, [])
        assert codec is not None
        assert codec.symbols == 6 and codec.group == 3
        rng = np.random.RandomState(0)
        values = np.array([1, 5, 9, 13, 17])[
            rng.randint(0, 5, (1, 21, 33))
        ].astype(np.int64)
        values[0, 3, 4] = 2**63 - 1  # fill
        packed = np.asarray(jax.jit(codec.encode)(values))
        decoded = codec.decode(packed[None], 21, 33)[0]
        np.testing.assert_array_equal(decoded, values)

    def test_fill_inside_palette(self):
        import jax

        func = self._palette_func([0, 10, 20])
        codec = derive_codec("int32", 20, func, [])
        assert codec.fill_code is None and codec.symbols == 3
        values = np.array([[0, 10, 20, 20, 0]], np.int32)[None]
        packed = np.asarray(jax.jit(codec.encode)(values[0]))
        np.testing.assert_array_equal(
            codec.decode(packed[None], 1, 5)[0], values
        )

    def test_contiguous_values_skip_palette(self):
        func = self._palette_func([0, 1, 2, 3])
        codec = derive_codec("uint8", 255, func, [])
        assert codec is not None and codec.palette is None

    def test_too_many_values_rejected(self):
        func = self._palette_func(list(range(0, 64, 4)))  # 16 + fill = 17
        assert derive_codec("uint8", 255, func, []) is None

    def test_reclassify_declares_values(self):
        from dask_geomodeling_tpu.raster.misc import _reclassify_process

        kwargs = {"select": True, "data": [[0, 1], [1, 5], [2, 9], [3, 17]]}
        assert _reclassify_process.jax_out_values(None, kwargs) == [1, 5, 9, 17]
        assert (
            _reclassify_process.jax_out_values(
                None, {"select": False, "data": [[0, 1]]}
            )
            is None
        )

    def test_reclassify_sparse_targets_tiled(self, source, request_64):
        """End to end: a Reclassify view with sparse targets rides the
        palette codec through the tile runtime, bit-exactly."""
        view = Reclassify(
            Classify(Add(source, 1), bins=[3.0, 6.0]),
            data=[[0, 2], [1, 50], [2, 90]],
            select=True,
        )
        from dask_geomodeling_tpu.runtime.tiles import _get_tile_program

        expected = view.get_data(**request_64)
        actual = _tiled(view, request_64)
        program = _get_tile_program(view, dict(request_64, width=32, height=32))
        assert program.codec is not None and program.codec.palette is not None
        np.testing.assert_array_equal(actual["values"], expected["values"])
        assert actual["no_data_value"] == expected["no_data_value"]


def _tiled(view, request, **kw):
    return evaluate_tiled(view, request, tile_size=32, batch=2, **kw)


def test_classify_packed_equals_host(source, request_64):
    view = Classify(Add(source, 1), bins=[50.0, 100.0, 150.0, 200.0])
    expected = view.get_data(**request_64)
    with config.set({"geomodeling.fetch-pack": True}):
        packed = _tiled(view, request_64)
        program = _get_tile_program(view, dict(request_64, width=32, height=32))
        assert program.codec is not None and program.codec.group == 3
    with config.set({"geomodeling.fetch-pack": False}):
        unpacked = _tiled(view, request_64)
    np.testing.assert_array_equal(packed["values"], expected["values"])
    np.testing.assert_array_equal(unpacked["values"], expected["values"])
    assert packed["values"].dtype == expected["values"].dtype


def test_boolean_packed_equals_host(source, request_64):
    view = Add(source, 0) > 125.0
    assert view.dtype == np.dtype(bool)
    expected = view.get_data(**request_64)
    with config.set({"geomodeling.fetch-pack": True}):
        packed = _tiled(view, request_64)
        program = _get_tile_program(view, dict(request_64, width=32, height=32))
        assert program.codec is not None and program.codec.group == 8
    np.testing.assert_array_equal(packed["values"], expected["values"])


def test_reclassify_select_packed_equals_host(source, request_64):
    view = Reclassify(
        Classify(Add(source, 1), bins=[50.0, 150.0]),
        data=[[0, -2], [1, 5], [2, 3]],
        select=True,
    )
    expected = view.get_data(**request_64)
    with config.set({"geomodeling.fetch-pack": True}):
        packed = _tiled(view, request_64)
    np.testing.assert_array_equal(packed["values"], expected["values"])


def test_step_packed_equals_host(source, request_64):
    view = Step(Add(source, 1), left=0, right=2, value=125.0, at=1)
    expected = view.get_data(**request_64)
    with config.set({"geomodeling.fetch-pack": True}):
        packed = _tiled(view, request_64)
        # float32 output, four-value alphabet: rides the float palette
        program = _get_tile_program(view, dict(request_64, width=32, height=32))
        assert program.codec is not None and program.codec.group >= 3
    np.testing.assert_array_equal(packed["values"], expected["values"])


class TestValueSetCodec:
    """Block-level out_value_set chains: float palettes, NaN fills, and
    whole-pipeline alphabets the root-only declarations cannot see."""

    def test_float_mask_packs_8_per_byte(self, source, request_64):
        from dask_geomodeling_tpu.raster import Mask, Multiply

        view = Mask(Multiply(Add(source, 1.0), 2.0), 7.0)
        assert view.out_value_set() == {0, 7.0}
        expected = view.get_data(**request_64)
        with config.set({"geomodeling.fetch-pack": True}):
            packed = _tiled(view, request_64)
            program = _get_tile_program(
                view, dict(request_64, width=32, height=32)
            )
        assert program.codec is not None
        assert program.codec.group == 8
        assert program.codec.dtype == np.dtype("float32")
        np.testing.assert_array_equal(packed["values"], expected["values"])
        assert packed["values"].dtype == expected["values"].dtype

    def test_reclassify_chain_without_select(self, source, request_64):
        """select=False used to disable packing (unmapped values pass
        through) — chain propagation bounds the store's alphabet."""
        from dask_geomodeling_tpu.raster import MaskBelow

        view = Reclassify(
            Classify(MaskBelow(source, 10.0), bins=[50.0, 100.0, 150.0]),
            data=[[0, 1], [1, 5], [2, 9], [3, 13]],
        )
        vals = view.out_value_set()
        assert vals == {1, 5, 9, 13, view.fillvalue}
        expected = view.get_data(**request_64)
        with config.set({"geomodeling.fetch-pack": True}):
            packed = _tiled(view, request_64)
            program = _get_tile_program(
                view, dict(request_64, width=32, height=32)
            )
        assert program.codec is not None and program.codec.group == 3
        np.testing.assert_array_equal(packed["values"], expected["values"])

    def test_elemwise_scalar_propagation(self, source):
        from dask_geomodeling_tpu.raster import Multiply

        view = Multiply(Classify(Add(source, 1), bins=[50.0, 150.0]), 10)
        vals = view.out_value_set()
        # classify data values {0,1,2} x10; classify's nodata (255) maps
        # onto Multiply's own fill, not onto 2550
        assert vals == {0, 10, 20, view.fillvalue}

    def test_nan_fill_float_palette(self):
        import jax

        codec = codec_from_values({0.0, 7.5}, np.nan, "float32")
        assert codec is not None and codec.fill_code is not None
        values = np.array(
            [[[0.0, 7.5, np.nan, 7.5], [np.nan, 0.0, 0.0, 7.5]]], np.float32
        )
        packed = np.asarray(jax.jit(codec.encode)(values))
        decoded = codec.decode(packed[None], 2, 4)[0]
        np.testing.assert_array_equal(decoded, values)

    def test_superset_values_only_cost_symbols(self):
        codec = codec_from_values({1.5, 2.5, 99.0}, 0.0, "float32")
        assert codec is not None and codec.symbols == 4

    def test_unbounded_child_disables(self, source):
        from dask_geomodeling_tpu.raster import MaskBelow, Multiply

        # with the data-dependent scan off, a raw source is unbounded and
        # every derived set collapses to None
        with config.set({"geomodeling.source-alphabet-max": 0}):
            assert source.out_value_set() is None
            assert MaskBelow(source, 10.0).out_value_set() is None
            assert Multiply(source, 2.0).out_value_set() is None

    def test_nonfinite_member_rejected(self):
        assert codec_from_values({0.0, np.nan}, 255.0, "float32") is None
        assert codec_from_values({0.0, np.inf}, 255.0, "float32") is None

    def test_nan_member_matching_nan_fill_allowed(self):
        """union_value_set seeds the set with the fill itself — a declared
        NaN member that IS the NaN fill rides the isnan fill_code."""
        import jax

        codec = codec_from_values({0.0, 7.5, np.nan}, np.nan, "float32")
        assert codec is not None and codec.fill_code is not None
        values = np.array([[[np.nan, 7.5, 0.0, np.nan]]], np.float32)
        packed = np.asarray(jax.jit(codec.encode)(values))
        np.testing.assert_array_equal(
            codec.decode(packed[None], 1, 4)[0], values
        )
        # a non-fill NaN (finite fill) is still fatal
        assert codec_from_values({0.0, np.nan}, 255.0, "float32") is None

    def test_inexact_float_ops_disable_palette(self, source):
        """XLA TPU divide/power are not bit-identical to numpy; float
        palettes only survive exactly-rounded ops (add/subtract/multiply)."""
        from dask_geomodeling_tpu.raster import Divide, Mask, Multiply, Power

        masked = Mask(source, 7.0)  # float32 {0, 7}
        assert masked.out_value_set() == {0, 7.0}
        # Mask's fill (0) maps onto Multiply's own fill, data 7*2 -> 14
        assert Multiply(masked, 2.0).out_value_set() == {
            14.0, Multiply(masked, 2.0).fillvalue
        }
        assert Divide(masked, 2.0).out_value_set() is None
        assert Power(masked, 2.0).out_value_set() is None
        # integer chains keep every op (device int arithmetic is exact)
        classified = Classify(source, bins=[50.0, 150.0])
        assert Multiply(classified, 3).out_value_set() is not None

    def test_wide_alphabet_rejected(self):
        assert codec_from_values(set(range(40)), 255, "uint8") is None

    def test_spatial_and_temporal_propagation(self, source):
        from dask_geomodeling_tpu.raster import (
            Dilate,
            MovingMax,
            Shift,
            Snap,
            TemporalAggregate,
        )

        classified = Classify(source, bins=[50.0, 150.0])  # {0,1,2,255}
        assert MovingMax(classified, 3).out_value_set() == {0, 1, 2, 255}
        assert Dilate(classified, [2]).out_value_set() == {0, 1, 2, 255}
        assert Shift(classified, 3600000).out_value_set() == {0, 1, 2, 255}
        assert Snap(classified, source).out_value_set() == {0, 1, 2, 255}

        agg_max = TemporalAggregate(classified, "4h", statistic="max")
        vals = agg_max.out_value_set()
        assert vals == {0, 1, 2, utils_dtype_max(agg_max.dtype)}
        assert TemporalAggregate(
            classified, "4h", statistic="mean"
        ).out_value_set() is None

    def test_moving_max_tiled_packed(self, source, request_64):
        from dask_geomodeling_tpu.raster import MovingMax

        view = MovingMax(Classify(source, bins=[50.0, 150.0]), 3)
        expected = view.get_data(**request_64)
        with config.set({"geomodeling.fetch-pack": True}):
            packed = _tiled(view, request_64)
            program = _get_tile_program(
                view, dict(request_64, width=32, height=32)
            )
        assert program.codec is not None
        np.testing.assert_array_equal(packed["values"], expected["values"])


def test_multi_source_value_sets(source, request_64):
    """Group / FillNoData / Max pick values from their sources: their
    alphabets are the union, and the packed tiled path stays bit-exact."""
    from dask_geomodeling_tpu.raster import FillNoData, Group
    from dask_geomodeling_tpu.raster.reduction import Max

    a = Classify(source, bins=[50.0, 150.0])  # {0,1,2,255}
    b = Reclassify(
        Classify(Add(source, 30.0), bins=[100.0, 300.0]),
        data=[[0, 10], [1, 20]], select=True,
    )
    for cls in (Group, FillNoData, Max):
        view = cls(a, b)
        vals = view.out_value_set()
        assert vals is not None, cls.__name__
        data_union = {0, 1, 2, 10, 20}
        assert data_union <= vals, cls.__name__
        expected = view.get_data(**request_64)
        with config.set({"geomodeling.fetch-pack": True}):
            actual = _tiled(view, request_64)
        np.testing.assert_array_equal(
            actual["values"], expected["values"], err_msg=cls.__name__
        )


def test_place_value_set(source):
    from dask_geomodeling_tpu.raster import Place

    classified = Classify(source, bins=[50.0, 150.0])
    placed = Place(
        classified, "EPSG:28992", (135032.0, 455968.0),
        [(135032.0, 455968.0), (135040.0, 455960.0)],
    )
    assert placed.out_value_set() == {0, 1, 2, 255}
    assert Place(
        classified, "EPSG:28992", (135032.0, 455968.0),
        [(135032.0, 455968.0)], statistic="mean",
    ).out_value_set() is None


class TestSourceAlphabet:
    """Data-dependent source alphabets: quantized data declares its exact
    value set, so continuous-dtype chains (incl. cross-CRS warps) ride
    the packed fetch (group-1 palette codes for wide alphabets)."""

    @pytest.fixture(scope="class")
    def quantized(self):
        rng = np.random.RandomState(11)
        data = (rng.randint(0, 200, (1, 64, 64)) * 0.5).astype(np.float32)
        data[0, :4, :4] = np.float32(np.finfo(np.float32).max)  # nodata
        return MemorySource(
            data=data,
            no_data_value=float(np.finfo(np.float32).max),
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )

    def test_source_declares_alphabet(self, quantized):
        vals = quantized.out_value_set()
        assert vals is not None and len(vals) <= 201
        assert float(np.finfo(np.float32).max) in vals

    def test_gates(self):
        data = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
        kwargs = dict(
            no_data_value=-1.0, projection="EPSG:28992", pixel_size=1.0,
            pixel_origin=(0, 0), time_first=datetime(2000, 1, 1),
        )
        with config.set({"geomodeling.source-alphabet-max": 0}):
            assert MemorySource(data, **kwargs).out_value_set() is None
        with config.set({"geomodeling.warp-interpolation": "bilinear"}):
            assert MemorySource(data, **kwargs).out_value_set() is None
        with config.set({"geomodeling.source-alphabet-max": 5}):
            assert MemorySource(data, **kwargs).out_value_set() is None
        assert MemorySource(data, **kwargs).out_value_set() == set(
            range(12)
        ) | {-1.0}

    def test_warped_float_chain_packs(self, quantized, request_64):
        """The headline lever: Add(source, 1.0) requested cross-CRS is a
        float32 output whose alphabet is data-dependent; the packed
        (group-1 uint8 palette) fetch stays bit-exact with both the
        unpacked device path and the host path."""
        from dask_geomodeling_tpu.geo import Extent

        view = Add(quantized, 1.0)
        assert view.out_value_set() is not None
        bbox = (
            Extent(request_64["bbox"], "EPSG:28992")
            .transformed("EPSG:3857")
            .bbox
        )
        request = dict(request_64, bbox=bbox, projection="EPSG:3857")
        expected = view.get_data(**request)
        with config.set(
            {
                "geomodeling.fetch-pack": True,
                "geomodeling.warp-approx-stride": 1,
            }
        ):
            packed = _tiled(view, request)
            program = _get_tile_program(view, dict(request, width=32, height=32))
        assert program.codec is not None
        assert program.codec.group == 1
        assert program.codec.code_dtype == np.uint8
        with config.set(
            {
                "geomodeling.fetch-pack": False,
                "geomodeling.warp-approx-stride": 1,
            }
        ):
            unpacked = _tiled(view, request)
        np.testing.assert_array_equal(packed["values"], unpacked["values"])
        np.testing.assert_array_equal(packed["values"], expected["values"])
        assert packed["values"].dtype == expected["values"].dtype

    def test_uint16_wide_alphabet(self, request_64):
        rng = np.random.RandomState(5)
        data = (rng.randint(0, 3000, (1, 64, 64)) * 0.25).astype(np.float32)
        source = MemorySource(
            data=data,
            no_data_value=float(np.finfo(np.float32).max),
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )
        view = Add(source, 0.0)
        expected = view.get_data(**request_64)
        with config.set({"geomodeling.fetch-pack": True}):
            packed = _tiled(view, request_64)
            program = _get_tile_program(
                view, dict(request_64, width=32, height=32)
            )
        assert program.codec is not None
        assert program.codec.code_dtype == np.uint16
        np.testing.assert_array_equal(packed["values"], expected["values"])

    def test_file_source_alphabet(self, tmp_path, request_64):
        from dask_geomodeling_tpu.io.geotiff import write_geotiff
        from dask_geomodeling_tpu.raster.sources import RasterFileSource

        rng = np.random.RandomState(3)
        data = (rng.randint(0, 40, (1, 64, 64)) * 2).astype(np.int32)
        path = str(tmp_path / "quantized.tif")
        write_geotiff(
            path,
            data,
            geo_transform=(135000.0, 1.0, 0.0, 456000.0, 0.0, -1.0),
            projection="EPSG:28992",
            no_data_value=-1,
        )
        with config.set({"geomodeling.strict-file-paths": False}):
            source = RasterFileSource(path)
            vals = source.out_value_set()
            assert vals is not None
            assert set(np.unique(data).tolist()) <= vals
            view = Add(source, 1)
            expected = view.get_data(**request_64)
            with config.set({"geomodeling.fetch-pack": True}):
                packed = _tiled(view, request_64)
            np.testing.assert_array_equal(
                packed["values"], expected["values"]
            )

    def test_overview_reads_disable_alphabet(self, tmp_path):
        from dask_geomodeling_tpu.io.geotiff import write_geotiff
        from dask_geomodeling_tpu.raster.sources import RasterFileSource

        data = np.zeros((1, 8, 8), np.int32)
        path = str(tmp_path / "plain.tif")
        write_geotiff(
            path,
            data,
            geo_transform=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0),
            projection="EPSG:28992",
            no_data_value=-1,
        )
        with config.set({"geomodeling.strict-file-paths": False}):
            source = RasterFileSource(path)
            source._overviews = [(4, 4)]  # pretend a pyramid exists
            with config.set({"geomodeling.use-overviews": True}):
                assert source.out_value_set() is None
            assert source.out_value_set() is not None


def test_codec_chain_fuzz(source, request_64):
    """Random discrete-output chains: whatever out_value_set derives,
    the packed tiled result must stay bitwise equal to the host path.
    A wrong alphabet would corrupt silently — this is the safety net."""
    from dask_geomodeling_tpu.raster import (
        Dilate,
        Mask,
        MaskBelow,
        MovingMax,
        Multiply,
        Subtract,
    )

    def grow(rng, view):
        is_int = np.issubdtype(view.dtype, np.integer) or view.dtype == bool
        choices = []
        if not is_int:
            choices += [
                lambda v: Classify(v, bins=sorted(
                    rng.choice(np.arange(20.0, 240.0, 10.0), 3, replace=False)
                )),
                lambda v: Mask(v, float(rng.randint(1, 9))),
                lambda v: MaskBelow(v, float(rng.randint(10, 100))),
                lambda v: Step(v, left=0, right=2,
                               value=float(rng.randint(20, 200)), at=1),
            ]
        else:
            targets = rng.choice(np.arange(1, 40), 4, replace=False)
            choices += [
                lambda v: Reclassify(
                    v,
                    data=[[i, int(t)] for i, t in enumerate(targets)],
                    select=bool(rng.randint(2)),
                ),
                lambda v: Mask(v, int(rng.randint(1, 9))),
                lambda v: Multiply(v, int(rng.randint(2, 5))),
                lambda v: Subtract(v, int(rng.randint(1, 4))),
                lambda v: Dilate(v, [int(rng.randint(1, 4))]),
                lambda v: MovingMax(v, 3),
            ]
        return choices[rng.randint(len(choices))](view)

    mismatches = []
    for seed in range(30):
        rng = np.random.RandomState(seed)
        view = Add(source, float(rng.randint(0, 5)))
        for _ in range(rng.randint(1, 4)):
            try:
                view = grow(rng, view)
            except (TypeError, ValueError):
                break  # invalid combination for this dtype: keep current
        expected = view.get_data(**request_64)
        with config.set({"geomodeling.fetch-pack": True}):
            actual = _tiled(view, request_64)
        if not np.array_equal(actual["values"], expected["values"]):
            mismatches.append(seed)
    assert mismatches == []


def test_source_alphabet_chain_fuzz(request_64):
    """Random chains over QUANTIZED sources (data-dependent alphabets):
    whatever palette the scan derives — through exactly-rounded float
    elemwise, masks, steps, classification, and cross-CRS warps — the
    packed tiled result must stay bitwise equal to the host path.  A
    wrong data-dependent set corrupts silently; this is the net the
    round-4 verdict made mandatory."""
    from dask_geomodeling_tpu.geo import Extent
    from dask_geomodeling_tpu.raster import (
        Mask,
        MaskBelow,
        Multiply,
        Subtract,
    )

    fill = float(np.finfo(np.float32).max)

    def make_source(rng, n_values):
        data = (
            rng.randint(0, n_values, (1, 64, 64)) * np.float32(0.5)
        ).astype(np.float32)
        data[0, :3, :3] = np.float32(fill)
        return MemorySource(
            data=data,
            no_data_value=fill,
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )

    def grow(rng, view):
        choices = [
            lambda v: Add(v, float(rng.randint(0, 4))),
            lambda v: Subtract(v, float(rng.randint(1, 3))),
            lambda v: Multiply(v, float(rng.randint(2, 4))),
            lambda v: Mask(v, float(rng.randint(1, 9))),
            lambda v: MaskBelow(v, float(rng.randint(5, 60))),
            lambda v: Classify(
                v,
                bins=sorted(
                    rng.choice(np.arange(5.0, 90.0, 5.0), 3, replace=False)
                ),
            ),
            lambda v: Step(
                v, left=0, right=2, value=float(rng.randint(5, 80)), at=1
            ),
        ]
        return choices[rng.randint(len(choices))](view)

    cross_bbox = (
        Extent(request_64["bbox"], "EPSG:28992").transformed("EPSG:3857").bbox
    )
    mismatches = []
    for seed in range(25):
        rng = np.random.RandomState(1000 + seed)
        view = make_source(rng, int(rng.choice([5, 50, 300, 3000])))
        for _ in range(rng.randint(0, 4)):
            try:
                view = grow(rng, view)
            except (TypeError, ValueError):
                break
        if rng.randint(2):
            request = dict(
                request_64, bbox=cross_bbox, projection="EPSG:3857"
            )
        else:
            request = dict(request_64)
        expected = view.get_data(**request)
        with config.set(
            {
                "geomodeling.fetch-pack": True,
                "geomodeling.warp-approx-stride": 1,
            }
        ):
            actual = _tiled(view, request)
        if not np.array_equal(actual["values"], expected["values"]):
            mismatches.append(seed)
    assert mismatches == []
