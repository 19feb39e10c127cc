"""JAX executor tests: numpy-path vs XLA-path equivalence and program
caching (the TPU-vs-reference tolerance harness of SURVEY §4)."""
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import (
    Add,
    Classify,
    Clip,
    Divide,
    FillNoData,
    Greater,
    Mask,
    MaskBelow,
    MemorySource,
    Multiply,
    Reclassify,
    Step,
    Subtract,
)
from dask_geomodeling_tpu.runtime.executor import (
    clear_program_cache,
    program_cache_info,
)


@pytest.fixture(scope="module")
def src():
    data = np.arange(300, dtype=np.uint8).reshape(3, 10, 10) % 250
    data[0, :2, :2] = 255  # some nodata
    return MemorySource(
        data=data,
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
        metadata=["meta%d" % i for i in range(3)],
    )


@pytest.fixture
def request_full():
    return {
        "mode": "vals",
        "start": datetime(2000, 1, 1),
        "stop": datetime(2000, 1, 1, 3),
        "width": 10,
        "height": 10,
        "bbox": (135000, 455995, 135005, 456000),
        "projection": "EPSG:28992",
    }


def assert_jax_matches_numpy(view, request):
    """Evaluate a view under both executors and compare bitwise."""
    expected = view.get_data(**request)
    with config.set({"geomodeling.executor": "jax"}):
        actual = view.get_data(**request)
    assert expected.keys() == actual.keys()
    assert actual["no_data_value"] == expected["no_data_value"]
    assert actual["values"].dtype == expected["values"].dtype
    np.testing.assert_array_equal(actual["values"], expected["values"])


VIEWS = {
    "add_const": lambda s: Add(s, 10),
    "math_chain": lambda s: Multiply(Subtract(Add(s, 10), 3), 2),
    "divide": lambda s: Divide(s, 4),
    "two_rasters": lambda s: Add(s, s),
    "comparison": lambda s: Greater(s, 100),
    "mask": lambda s: Mask(s, 7),
    "mask_float": lambda s: Mask(s, 7.5),
    "mask_below": lambda s: MaskBelow(s, 100),
    "step": lambda s: Step(s, left=1, right=2, value=100, at=3),
    "classify": lambda s: Classify(s, bins=[50, 100, 200]),
    "reclassify": lambda s: Reclassify(
        Classify(s, bins=[50, 100, 200]), data=[[1, 42], [2, 77]]
    ),
    "reclassify_select": lambda s: Reclassify(
        Classify(s, bins=[50, 100, 200]), data=[[1, 42]], select=True
    ),
    "clip": lambda s: Clip(s, Greater(s, 30)),
    "fill_nodata": lambda s: FillNoData(s, MaskBelow(s, 100)),
    "benchmark_view": lambda s: Reclassify(
        Classify(Add(s, 1), bins=[50, 100, 200]), data=[[0, 1], [1, 5], [2, 9], [3, 13]]
    ),
}


@pytest.mark.parametrize("name", list(VIEWS))
def test_jax_matches_numpy(src, request_full, name):
    assert_jax_matches_numpy(VIEWS[name](src), request_full)


def test_program_cache_hit(src, request_full):
    clear_program_cache()
    view = Multiply(Add(src, 10), 2)
    with config.set({"geomodeling.executor": "jax"}):
        view.get_data(**request_full)
        info1 = program_cache_info()
        # different bbox, same shape: program must be reused
        request2 = dict(
            request_full, bbox=(135001, 455995, 135006, 456000)
        )
        view.get_data(**request2)
        info2 = program_cache_info()
    assert info1["misses"] == 1
    assert info2["hits"] >= 1
    assert info2["misses"] == info1["misses"]


def test_program_cache_shares_across_constants(src, request_full):
    # numeric constants are traced inputs: one program serves both views
    clear_program_cache()
    with config.set({"geomodeling.executor": "jax"}):
        first = Add(src, 10).get_data(**request_full)
        second = Add(src, 20).get_data(**request_full)
    assert program_cache_info()["misses"] == 1
    assert program_cache_info()["hits"] >= 1
    np.testing.assert_array_equal(
        second["values"][second["values"] != second["no_data_value"]] - 10,
        first["values"][first["values"] != first["no_data_value"]],
    )


def test_program_cache_distinguishes_structure(src, request_full):
    clear_program_cache()
    with config.set({"geomodeling.executor": "jax"}):
        Add(src, 10).get_data(**request_full)
        Multiply(src, 10).get_data(**request_full)
    assert program_cache_info()["misses"] == 2


def test_jax_time_and_meta_requests(src, request_full):
    # non-vals modes pass through the executor unharmed
    view = Add(src, 10)
    with config.set({"geomodeling.executor": "jax"}):
        time_data = view.get_data(**dict(request_full, mode="time"))
        meta_data = view.get_data(**dict(request_full, mode="meta"))
    assert len(time_data["time"]) == 3
    assert len(meta_data["meta"]) == 3


def test_jax_empty_result(src):
    view = Add(src, 10)
    with config.set({"geomodeling.executor": "jax"}):
        result = view.get_data(
            mode="vals",
            start=datetime(2010, 1, 1),
            stop=datetime(2010, 1, 2),
            width=4,
            height=4,
            bbox=(135000, 455995, 135005, 456000),
            projection="EPSG:28992",
        )
    assert result is None


def test_file_source_fuses_on_device(tmp_path):
    """RasterFileSource payloads load at plan time, so file-backed views
    run through the same fused device path as MemorySource views."""
    from dask_geomodeling_tpu.io.geotiff import write_geotiff
    from dask_geomodeling_tpu.raster import RasterFileSource

    data = np.arange(64, dtype=np.uint8).reshape(1, 8, 8)
    write_geotiff(
        str(tmp_path / "src.tif"),
        data,
        geo_transform=(135000.0, 1.0, 0.0, 456000.0, 0.0, -1.0),
        projection="EPSG:28992",
        no_data_value=255,
    )
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = RasterFileSource("src.tif")
        view = Multiply(Add(source, 10), 2)
        request = dict(
            mode="vals",
            bbox=(135000, 455992, 135008, 456000),
            projection="EPSG:28992",
            width=8,
            height=8,
            start=datetime(1970, 1, 1),
        )
        expected = view.get_data(**request)
        clear_program_cache()
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request)
        assert program_cache_info()["misses"] == 1  # one fused program
        np.testing.assert_array_equal(actual["values"], expected["values"])
        assert actual["values"].dtype == expected["values"].dtype


def test_hbm_budget_evicts_lru():
    from dask_geomodeling_tpu.runtime import executor as ex

    ex._DEVICE_ARRAY_CACHE.clear()
    a = np.zeros(1000, dtype=np.float64)  # 8000 bytes
    b = np.zeros(1000, dtype=np.float64)
    c = np.zeros(1000, dtype=np.float64)
    with config.set({"geomodeling.hbm-budget": 20000}):
        ex._device_put_cached(a)
        ex._device_put_cached(b)
        assert len(ex._DEVICE_ARRAY_CACHE) == 2
        ex._device_put_cached(a)  # bump a to most-recent
        ex._device_put_cached(c)  # must evict b (LRU), not a
        cached_ids = {key[0] for key in ex._DEVICE_ARRAY_CACHE}
        assert id(a) in cached_ids
        assert id(b) not in cached_ids
        assert id(c) in cached_ids


def test_hbm_budget_never_caches_oversized():
    from dask_geomodeling_tpu.runtime import executor as ex

    ex._DEVICE_ARRAY_CACHE.clear()
    big = np.zeros(10000, dtype=np.float64)  # 80000 bytes
    with config.set({"geomodeling.hbm-budget": 20000}):
        ex._device_put_cached(big)
        assert len(ex._DEVICE_ARRAY_CACHE) == 0


class TestRasterizeWKTDevice:
    """The RasterizeWKT device twin: even-odd crossing parity at pixel
    centers, bitwise-identical to the host scanline rasterizer."""

    WKT = (
        "POLYGON ((135000.6 455995.2, 135004.4 455995.7, 135003.9 455999.8, "
        "135001.1 455998.9, 135000.6 455995.2), (135002 455997, 135003 "
        "455997, 135003 455998, 135002 455998, 135002 455997))"
    )

    @pytest.fixture
    def mask_request(self):
        return dict(
            mode="vals", width=40, height=40,
            bbox=(135000, 455995, 135005, 456000),
            projection="EPSG:28992", start=datetime(2000, 1, 1),
        )

    def test_matches_host_bitwise(self, mask_request):
        from dask_geomodeling_tpu.raster import RasterizeWKT

        view = RasterizeWKT(self.WKT, "EPSG:28992")
        assert_jax_matches_numpy(view, mask_request)

    def test_program_reused_across_bboxes(self, mask_request):
        from dask_geomodeling_tpu.raster import RasterizeWKT

        view = RasterizeWKT(self.WKT, "EPSG:28992")
        clear_program_cache()
        with config.set({"geomodeling.executor": "jax"}):
            view.get_data(**mask_request)
            shifted = dict(
                mask_request, bbox=(135000.5, 455995.5, 135005.5, 456000.5)
            )
            view.get_data(**shifted)
        assert program_cache_info()["misses"] == 1

    def test_clip_mask_pipeline_fuses(self, src, mask_request):
        from dask_geomodeling_tpu.raster import Clip, RasterizeWKT, Snap

        wkt = (
            "POLYGON ((135000.6 455995.2, 135004.4 455995.7, "
            "135003.9 455999.8, 135001.1 455998.9, 135000.6 455995.2))"
        )
        view = Clip(src, Snap(RasterizeWKT(wkt, "EPSG:28992"), src))
        request = dict(
            mask_request, width=10, height=10, stop=datetime(2000, 1, 1, 3)
        )
        expected = view.get_data(**request)
        clear_program_cache()
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request)
        assert program_cache_info()["misses"] == 1  # the whole chain fused
        np.testing.assert_array_equal(actual["values"], expected["values"])

    def test_point_request_stays_on_host(self, mask_request):
        from dask_geomodeling_tpu.raster import RasterizeWKT

        view = RasterizeWKT(self.WKT, "EPSG:28992")
        request = dict(
            mask_request, bbox=(135002.5, 455997.5, 135002.5, 455997.5),
            width=1, height=1,
        )
        assert_jax_matches_numpy(view, request)


class TestDeviceFailureFallback:
    """Device failures degrade to the host path instead of failing the
    request (the jax twins are semantically identical)."""

    def test_compile_failure_falls_back(self, src, request_full, monkeypatch):
        from dask_geomodeling_tpu.runtime import executor as ex

        def broken_compile(self, *args, **kwargs):
            raise RuntimeError("simulated compiler failure")

        monkeypatch.setattr(ex._StagedProgram, "_compile", broken_compile)
        clear_program_cache()
        view = Add(src, 10)
        expected = view.get_data(**request_full)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_full)
        np.testing.assert_array_equal(actual["values"], expected["values"])
        # the failing shape is remembered: no second compile attempt
        with config.set({"geomodeling.executor": "jax"}):
            view.get_data(**request_full)

    def test_runtime_failure_serves_from_host(self, src, request_full, monkeypatch):
        from dask_geomodeling_tpu.runtime import executor as ex

        clear_program_cache()
        view = Multiply(src, 3)
        expected = view.get_data(**request_full)

        real_compile = ex._StagedProgram._compile

        def compile_to_failing(self, *args, **kwargs):
            compiled = real_compile(self, *args, **kwargs)

            def failing(*arrays):
                raise RuntimeError("simulated device OOM")

            return failing

        monkeypatch.setattr(ex._StagedProgram, "_compile", compile_to_failing)
        with config.set({"geomodeling.executor": "jax"}):
            actual = view.get_data(**request_full)
        np.testing.assert_array_equal(actual["values"], expected["values"])


def test_compilation_cache_config(tmp_path, src, request_full):
    """geomodeling.compilation-cache points XLA's persistent cache at the
    configured directory (real TPU compiles persist across processes)."""
    import jax

    from dask_geomodeling_tpu.runtime import executor as ex

    cache_dir = str(tmp_path / "xla_cache")
    ex._X64_ENABLED = False  # re-run the lazy setup with the config applied
    with config.set({
        "geomodeling.compilation-cache": cache_dir,
        "geomodeling.executor": "jax",
    }):
        Add(src, 10).get_data(**request_full)
    assert jax.config.jax_compilation_cache_dir == cache_dir
