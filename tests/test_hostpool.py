"""Multi-machine host-plane scheduling over the TCP worker pool."""
import operator
import os
import subprocess
import sys
import time
from datetime import datetime

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.parallel.hostpool import HostPool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn_worker(address, token="hunter2"):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        [
            sys.executable,
            "-m",
            "dask_geomodeling_tpu.parallel.hostworker",
            address,
            "--token",
            token,
        ],
        env=env,
        cwd=REPO,
    )


@pytest.fixture
def pool():
    with HostPool(token="hunter2") as p:
        workers = [_spawn_worker(p.address) for _ in range(2)]
        try:
            p.wait_for_workers(2, timeout=60)
            yield p
        finally:
            for w in workers:
                w.kill()
                w.wait()


def _boom():
    raise ValueError("boom")


def _slow_identity(x):
    time.sleep(2.0)
    return x


class TestHostPool:
    def test_graph_evaluation(self, pool):
        graph = {
            "a": (operator.add, 1, 2),
            "b": (operator.mul, "a", 10),
            "c": (operator.add, "a", "b"),
        }
        assert pool.scheduler(graph, ["c", "a"]) == [33, 3]

    def test_view_get_data_matches_sync(self, pool):
        from dask_geomodeling_tpu.raster import Classify, MemorySource, Smooth

        source = MemorySource(
            data=(np.random.RandomState(0).rand(1, 32, 32) * 200).astype(
                np.float32
            ),
            no_data_value=float(np.finfo(np.float32).max),
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=(135000, 456000),
            time_first=datetime(2000, 1, 1),
            time_delta=None,
        )
        view = Classify(Smooth(source + 1, size=3), bins=[50.0, 150.0])
        request = dict(
            mode="vals",
            bbox=(135000, 455968, 135032, 456000),
            projection="EPSG:28992",
            width=32,
            height=32,
            start=datetime(2000, 1, 1),
        )
        expected = view.get_data(**request)
        with config.set({"scheduler": pool.scheduler}):
            distributed = view.get_data(**request)
        np.testing.assert_array_equal(
            distributed["values"], expected["values"]
        )

    def test_exception_propagates(self, pool):
        with pytest.raises(ValueError, match="boom"):
            pool.scheduler({"x": (_boom,)}, ["x"])

    def test_worker_death_requeues(self):
        with HostPool(token="t") as p:
            first = _spawn_worker(p.address, token="t")
            try:
                p.wait_for_workers(1, timeout=60)
                future = p.submit(_slow_identity, 42)
                time.sleep(0.5)  # the (only) worker is mid-sleep
                first.kill()
                first.wait()
                replacement = _spawn_worker(p.address, token="t")
                try:
                    # the requeued task completes on the replacement
                    assert future.result(timeout=60) == 42
                finally:
                    replacement.kill()
                    replacement.wait()
            finally:
                first.kill()
                first.wait()

    def test_bad_token_rejected(self):
        with HostPool(token="right") as p:
            worker = _spawn_worker(p.address, token="wrong")
            try:
                assert worker.wait(timeout=60) != 0
                assert p.n_workers == 0
            finally:
                worker.kill()
                worker.wait()


def _returns_unpicklable():
    return lambda: 1  # lambdas cannot pickle


def test_unpicklable_result_fails_cleanly():
    """A task whose RESULT cannot pickle must fail the future with a
    RuntimeError instead of killing workers one by one."""
    with HostPool(token="t") as p:
        worker = _spawn_worker(p.address, token="t")
        try:
            p.wait_for_workers(1, timeout=60)
            future = p.submit(_returns_unpicklable)
            with pytest.raises(RuntimeError, match="unpicklable"):
                future.result(timeout=60)
            # the worker survived and serves the next task
            assert p.submit(operator.add, 2, 3).result(timeout=60) == 5
        finally:
            worker.kill()
            worker.wait()


class TestAdaptiveScaling:
    def test_scale_up_then_down(self):
        """adapt() spawns workers for queued tasks and retires them when
        the queue stays idle (dask.distributed's Adaptive role)."""
        with HostPool(token="hunter2") as pool:
            pool.adapt(minimum=0, maximum=2, interval=0.05, idle_time=0.4)
            futures = [pool.submit(operator.add, i, 1) for i in range(6)]
            assert [f.result(timeout=60) for f in futures] == list(range(1, 7))
            assert pool.n_adaptive_workers >= 1
            deadline = time.time() + 30
            while pool.n_adaptive_workers > 0 and time.time() < deadline:
                time.sleep(0.05)
            assert pool.n_adaptive_workers == 0
            assert pool.status()["adaptive_workers"] == 0

    def test_minimum_kept_alive(self):
        with HostPool(token="hunter2") as pool:
            pool.adapt(minimum=1, maximum=2, interval=0.05, idle_time=0.1)
            pool.wait_for_workers(1, timeout=60)
            assert pool.submit(operator.mul, 6, 7).result(timeout=60) == 42
            time.sleep(0.6)  # well past idle_time: the floor holds
            assert pool.n_adaptive_workers >= 1
            with pytest.raises(RuntimeError):
                pool.adapt()
        deadline = time.time() + 10
        while pool.n_adaptive_workers > 0 and time.time() < deadline:
            time.sleep(0.05)
        assert pool.n_adaptive_workers == 0  # close() reaps the floor

    def test_inflight_task_blocks_scale_down(self):
        """A task slower than idle_time must not get its worker
        terminated mid-run (regression: adapt() judged idleness by
        queue depth alone, thrashing spawn/kill forever)."""
        with HostPool(token="hunter2") as pool:
            pool.adapt(minimum=0, maximum=1, interval=0.05, idle_time=0.3)
            future = pool.submit(_slow_identity, "done")
            assert future.result(timeout=120) == "done"
            assert pool.status()["requeued"] == 0

    def test_spawn_failure_does_not_kill_adapt_thread(self, monkeypatch):
        """A failing spawn must back off, not crash the scaler (review
        finding: an exception escaping loop() left schedulers hanging)."""
        def broken_popen(*args, **kwargs):
            raise OSError("no exec")

        with HostPool(token="hunter2") as pool:
            monkeypatch.setattr(subprocess, "Popen", broken_popen)
            pool.adapt(minimum=0, maximum=2, interval=0.05, idle_time=0.2)
            future = pool.submit(operator.add, 1, 1)
            time.sleep(1.0)
            assert pool._adaptive["thread"].is_alive()
            assert pool.n_adaptive_workers == 0
            future.cancel()
