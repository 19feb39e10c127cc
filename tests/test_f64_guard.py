"""The float64 discrete-op device guard (round-3 verdict item 8).

XLA:TPU emulates float64 at ~1e-14 relative error (PARITY.md numeric
parity note); discrete ops — Classify, Reclassify, Step, MaskBelow,
comparisons — can flip cells whose values sit within that noise of a bin
edge.  Policy pinned here: such pipelines route to the bit-exact host
path by default on real chips, CPU backends are never guarded, and
``geomodeling.device-f64-discrete = True`` opts back in.
"""
from datetime import datetime

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import (
    Classify,
    Greater,
    MaskBelow,
    MemorySource,
    Smooth,
    Step,
)
from dask_geomodeling_tpu.runtime import executor as _ex
from dask_geomodeling_tpu.runtime.tiles import NotLowerable, evaluate_tiled


def _source(dtype):
    rng = np.random.RandomState(0)
    data = (rng.rand(1, 16, 16) * 200).astype(dtype)
    return MemorySource(
        data=data,
        no_data_value=float(np.finfo(dtype).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000.0, 456000.0),
        time_first=datetime(2000, 1, 1),
        time_delta=None,
    )


def _request(size=16):
    return {
        "mode": "vals",
        "bbox": (135000.0, 456000.0 - size, 135000.0 + size, 456000.0),
        "projection": "EPSG:28992",
        "width": size,
        "height": size,
    }


@pytest.fixture
def fake_real_chip(monkeypatch):
    """Pretend the default backend is a real chip (tests run on CPU)."""
    monkeypatch.setattr(_ex, "_BACKEND_NAME", ["axon"])


class TestDetection:
    def test_classify_on_f64_detected(self):
        view = Classify(_source("f8"), bins=[50.0, 100.0, 150.0])
        assert _ex.view_has_f64_discrete(view)

    def test_classify_on_f32_not_detected(self):
        view = Classify(_source("f4"), bins=[50.0, 100.0, 150.0])
        assert not _ex.view_has_f64_discrete(view)

    def test_comparison_on_f64_detected(self):
        assert _ex.view_has_f64_discrete(Greater(_source("f8"), 100.0))

    def test_step_maskbelow_marked(self):
        # (Reclassify only admits bool/int stores, so it can never see a
        # float64 input — its marker exists but is unreachable by API)
        for view in (
            Step(_source("f8"), left=0, right=1, value=100.0),
            MaskBelow(_source("f8"), 100.0),
        ):
            assert _ex.view_has_f64_discrete(view)

    def test_continuous_f64_pipeline_not_detected(self):
        # Smooth on f64 is continuous: ~1e-14 noise, no cell flips
        assert not _ex.view_has_f64_discrete(Smooth(_source("f8"), 2.0))

    def test_f64_upstream_of_guarded_node_counts(self):
        # the sensitive node's INPUT dtype is what matters: an f64 source
        # reaching Classify through a continuous op still trips the guard
        view = Classify(Smooth(_source("f8"), 2.0), bins=[50.0, 100.0])
        assert _ex.view_has_f64_discrete(view)


class TestPolicy:
    def test_cpu_backend_never_guarded(self, monkeypatch):
        monkeypatch.setattr(_ex, "_BACKEND_NAME", ["cpu"])
        assert not _ex._f64_discrete_guarded()

    def test_real_chip_guarded_by_default(self, fake_real_chip):
        assert _ex._f64_discrete_guarded()

    def test_opt_in_disables_guard(self, fake_real_chip):
        with config.set({"geomodeling.device-f64-discrete": True}):
            assert not _ex._f64_discrete_guarded()

    def test_tile_runtime_refuses_guarded_view(self, fake_real_chip):
        view = Classify(_source("f8"), bins=[50.0, 100.0, 150.0])
        with pytest.raises(NotLowerable, match="float64 discrete"):
            evaluate_tiled(view, _request(), tile_size=8)

    def test_staged_executor_serves_from_host(self, fake_real_chip):
        """compute_jax still returns the (bit-exact) result — via the
        eager host path, without compiling a device program."""
        view = Classify(_source("f8"), bins=[50.0, 100.0, 150.0])
        request = _request()
        expected = view.get_data(**request)
        before = _ex.program_cache_info()["size"]
        got = _ex.compute_jax(*view.get_compute_graph(**request))
        assert _ex.program_cache_info()["size"] == before
        assert got["no_data_value"] == expected["no_data_value"]
        np.testing.assert_array_equal(got["values"], expected["values"])

    def test_staged_executor_compiles_f32_discrete(self, fake_real_chip):
        """f32 discrete pipelines are NOT guarded (bit-exact on chip)."""
        view = Classify(_source("f4"), bins=[50.0, 100.0, 150.0])
        request = _request()
        expected = view.get_data(**request)
        got = _ex.compute_jax(*view.get_compute_graph(**request))
        np.testing.assert_array_equal(got["values"], expected["values"])

    def test_guard_off_for_f64_when_opted_in(self, fake_real_chip):
        view = Classify(_source("f8"), bins=[50.0, 100.0, 150.0])
        request = _request()
        expected = view.get_data(**request)
        with config.set({"geomodeling.device-f64-discrete": True}):
            got = _ex.compute_jax(*view.get_compute_graph(**request))
        # on the CPU test backend f64 is native, so still bit-exact
        np.testing.assert_array_equal(got["values"], expected["values"])
