"""Scheduler memory management + hostpool diagnostics (the
dask.distributed spilling/dashboard roles, SURVEY §5)."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.parallel.spill import SpillBuffer


def boom():
    # module-level so it pickles across the pool boundary
    raise ValueError("nope")


class TestSpillBuffer:
    def test_spills_beyond_limit_and_restores(self):
        buf = SpillBuffer(limit=3000)
        try:
            for k in range(5):
                buf["key%d" % k] = np.full(250, k, np.float64)  # 2 KB each
            assert len(buf) == 5
            assert buf.n_spilled >= 2  # only ~1.5 arrays fit in memory
            # every value reads back exactly, spilled or not
            for k in range(5):
                np.testing.assert_array_equal(
                    buf["key%d" % k], np.full(250, k, np.float64)
                )
            assert buf.n_restored >= 1
        finally:
            buf.close()

    def test_pop_removes_spilled_files(self):
        import os

        buf = SpillBuffer(limit=100)
        try:
            buf["a"] = np.zeros(250)
            buf["b"] = np.ones(250)  # evicts "a" to disk
            assert buf.n_spilled == 1
            value = buf.pop("a")
            np.testing.assert_array_equal(value, np.zeros(250))
            assert "a" not in buf
            assert not os.listdir(buf._dir)  # file removed on pop
            assert buf.pop("nope", "dflt") == "dflt"
        finally:
            buf.close()

    def test_scheduler_with_memory_limit(self):
        """A wide graph evaluates correctly under a tiny memory budget."""
        from dask_geomodeling_tpu.core.scheduler import get_threaded

        def make(i):
            return np.full(500, i, np.float64)

        def total(*arrays):
            return float(sum(a.sum() for a in arrays))

        graph = {"leaf%d" % i: (make, i) for i in range(10)}
        graph["root"] = (total,) + tuple("leaf%d" % i for i in range(10))
        with config.set({"geomodeling.scheduler-memory-limit": 2000}):
            (result,) = get_threaded(graph, ["root"])
        assert result == sum(500.0 * i for i in range(10))

    def test_spill_dir_removed_on_task_failure(self):
        """A raising task must not leak the spill tempdir (review
        finding: close only ran on the success path)."""
        import os

        from dask_geomodeling_tpu.core import scheduler as sched
        from dask_geomodeling_tpu.parallel import spill as spill_mod

        created = []
        original = spill_mod.SpillBuffer

        class Tracking(original):
            def __init__(self, *args, **kwargs):
                super().__init__(*args, **kwargs)
                created.append(self._dir)

        spill_mod.SpillBuffer = Tracking
        try:
            def boom_task(x):
                raise RuntimeError("task failed")

            graph = {
                "leaf": (lambda: np.zeros(500),),
                "root": (boom_task, "leaf"),
            }
            with config.set({"geomodeling.scheduler-memory-limit": 100}):
                with pytest.raises(RuntimeError):
                    sched.get_threaded(graph, ["root"])
        finally:
            spill_mod.SpillBuffer = original
        assert created and not os.path.exists(created[0])

    def test_release_after_last_use(self):
        """Intermediates leave the cache once every consumer ran."""
        from dask_geomodeling_tpu.core import scheduler as sched

        captured = {}
        original = sched._make_result_cache

        def capturing():
            cache = original()
            captured["cache"] = cache
            return cache

        sched._make_result_cache = capturing
        try:
            graph = {
                "a": (lambda: np.zeros(10),),
                "b": (lambda x: x + 1, "a"),
                "c": (lambda x: float(x.sum()), "b"),
            }
            (result,) = sched.get_threaded(graph, ["c"])
        finally:
            sched._make_result_cache = original
        assert result == 10.0
        cache = captured["cache"]
        assert "a" not in cache and "b" not in cache  # released
        assert "c" in cache


class TestDashboard:
    def test_status_endpoint(self):
        from dask_geomodeling_tpu.parallel.hostpool import (
            HostPool,
            worker_main,
        )

        with HostPool(token="t", dashboard_port=0) as pool:
            worker = threading.Thread(
                target=worker_main,
                args=(pool.address,),
                kwargs={"token": "t"},
                daemon=True,
            )
            worker.start()
            pool.wait_for_workers(1, timeout=10)
            future = pool.submit(sum, [1, 2, 3])
            assert future.result(timeout=10) == 6

            status = pool.status()
            assert status["n_workers"] == 1
            assert status["completed"] == 1
            assert status["failed"] == 0

            url = "http://%s/status.json" % pool.dashboard_address
            with urllib.request.urlopen(url, timeout=10) as response:
                payload = json.loads(response.read())
            assert payload["completed"] == 1
            assert payload["n_workers"] == 1
            assert payload["per_worker"]
            html = urllib.request.urlopen(
                "http://%s/" % pool.dashboard_address, timeout=10
            ).read()
            assert b"HostPool" in html

    def test_failed_task_counted(self):
        from dask_geomodeling_tpu.parallel.hostpool import (
            HostPool,
            worker_main,
        )

        with HostPool(token="t", dashboard_port=0) as pool:
            worker = threading.Thread(
                target=worker_main,
                args=(pool.address,),
                kwargs={"token": "t"},
                daemon=True,
            )
            worker.start()
            pool.wait_for_workers(1, timeout=10)
            future = pool.submit(boom)
            with pytest.raises(ValueError):
                future.result(timeout=10)
            assert pool.status()["failed"] == 1
