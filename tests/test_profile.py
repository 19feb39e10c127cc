"""Profiler tests: task timing, executor phases, chrome trace export
(the diagnostics counterpart of dask's Profiler, SURVEY §5)."""
import json
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import Add, MemorySource, Multiply
from dask_geomodeling_tpu.runtime.profile import Profiler, active_profiler


@pytest.fixture
def source():
    return MemorySource(
        data=np.arange(100, dtype=np.uint8).reshape(1, 10, 10),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=0.5,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )


@pytest.fixture
def request_full():
    return {
        "mode": "vals",
        "start": datetime(2000, 1, 1),
        "width": 10,
        "height": 10,
        "bbox": (135000, 455995, 135005, 456000),
        "projection": "EPSG:28992",
    }


def test_records_host_tasks(source, request_full):
    view = Multiply(Add(source, 10), 2)
    with Profiler() as prof:
        view.get_data(**request_full)
    names = {e["name"] for e in prof.events}
    assert any("add" in n for n in names)
    assert any("multiply" in n for n in names)
    assert all(e["duration"] >= 0 for e in prof.events)
    assert prof.total > 0


def test_records_executor_phases(source, request_full):
    view = Add(source, 10)
    with config.set({"geomodeling.executor": "jax"}):
        with Profiler() as prof:
            view.get_data(**request_full)
    categories = {e["category"] for e in prof.events}
    assert "device" in categories
    assert "transfer" in categories


def test_summary_and_chrome_trace(source, request_full, tmp_path):
    view = Add(source, 10)
    with Profiler() as prof:
        view.get_data(**request_full)
    summary = prof.summary()
    assert "wall clock" in summary
    assert "count" in summary

    path = tmp_path / "trace.json"
    prof.to_chrome_trace(str(path))
    trace = json.loads(path.read_text())
    assert len(trace["traceEvents"]) == len(prof.events)
    assert all(e["ph"] == "X" for e in trace["traceEvents"])


def test_inactive_outside_context(source, request_full):
    assert active_profiler() is None
    with Profiler() as prof:
        assert active_profiler() is prof
    assert active_profiler() is None


def test_nested_profiler_raises():
    with Profiler():
        with pytest.raises(RuntimeError):
            Profiler().__enter__()


class TestProgressBar:
    def test_reports_task_progress(self, source, request_full):
        import io

        from dask_geomodeling_tpu.raster import Multiply
        from dask_geomodeling_tpu.runtime.profile import ProgressBar

        stream = io.StringIO()
        view = Multiply(Add(source, 10), 2)
        with ProgressBar(stream=stream) as bar:
            view.get_data(**request_full)
        output = stream.getvalue()
        assert bar.done > 0
        assert bar.total >= bar.done
        assert "100%" in output
        assert output.endswith("\n")

    def test_reports_tile_batches(self, source, request_full):
        import io

        from dask_geomodeling_tpu.runtime.profile import ProgressBar
        from dask_geomodeling_tpu.runtime.tiles import evaluate_tiled

        stream = io.StringIO()
        request = dict(request_full, width=20, height=20)
        with ProgressBar(stream=stream) as bar:
            evaluate_tiled(Add(source, 10), request, tile_size=10, batch=2)
        # two dispatched batches; with fewer batches than fetch workers
        # each batch's fetch splits into parallel slices, and every
        # slice reports one unit — the denominator grows to match
        assert bar.done == bar.total >= 2
        assert "%d/%d" % (bar.done, bar.total) in stream.getvalue()

    def test_nested_raises(self):
        from dask_geomodeling_tpu.runtime.profile import ProgressBar

        with ProgressBar():
            with pytest.raises(RuntimeError):
                ProgressBar().__enter__()


def test_profiler_covers_threaded_scheduler(source, request_full):
    from dask_geomodeling_tpu.raster import Multiply

    view = Multiply(Add(source, 10), 2)
    with config.set({"scheduler": "threads"}):
        with Profiler() as prof:
            view.get_data(**request_full)
    names = {e["name"] for e in prof.events}
    assert any("multiply" in n for n in names)


def test_runtime_status_snapshot():
    """One JSON-serializable dict over every runtime counter."""
    import json

    import numpy as np

    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import MemorySource
    from dask_geomodeling_tpu.runtime import results, router, status

    router.reset()
    results.clear()
    source = MemorySource(
        data=np.arange(64, dtype="u1").reshape(1, 8, 8), no_data_value=255,
        projection="EPSG:28992", pixel_size=1.0, pixel_origin=(0, 8),
    )
    request = dict(mode="vals", bbox=(0, 0, 8, 8), projection="EPSG:28992",
                   width=8, height=8)
    with config.set({
        "geomodeling.executor": "auto",
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.auto-min-device-px": 0,
    }):
        for _ in range(3):
            source.get_data(**request)
    snap = status.snapshot()
    json.dumps(snap)  # fully serializable
    assert snap["router"]["routes"] >= 1
    assert snap["result_cache"]["misses"] >= 1
    assert set(snap["gather"]) >= {"plain_batches", "collect_failures"}
    assert "hits" in snap["program_cache"]
