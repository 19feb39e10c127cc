"""The executor=auto per-request router (runtime/router.py).

Reference analog: the dask scheduler seam (reference core/graphs.py:42-49)
is a global switch; here "auto" picks host or device per (view, size)
from measured rates, so every request matches-or-beats the host path.
"""
from datetime import datetime

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import Add, MemorySource, Smooth
from dask_geomodeling_tpu.runtime import router


@pytest.fixture(autouse=True)
def clean_router():
    router.reset()
    yield
    router.reset()


@pytest.fixture
def big_source():
    rng = np.random.RandomState(0)
    return MemorySource(
        data=(rng.rand(1, 320, 320) * 200).astype(np.float32),
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000.0, 456000.0),
        time_first=datetime(2000, 1, 1),
    )


def big_request(px=320):
    return dict(
        mode="vals",
        bbox=(135000.0, 456000.0 - px, 135000.0 + px, 456000.0),
        projection="EPSG:28992",
        width=px,
        height=px,
        start=datetime(2000, 1, 1),
    )


class TestChoose:
    def test_ineligible_is_host(self, big_source):
        request = big_request()
        assert router.choose(big_source, request, eligible=False) == "numpy"

    def test_first_call_is_host(self, big_source):
        assert router.choose(big_source, big_request(), True) == "numpy"

    def test_explores_device_after_host_measurement(self, big_source):
        request = big_request()
        router.record(big_source, request, "numpy", 0.01)
        assert router.choose(big_source, request, True) == "jax"

    def test_first_device_run_is_compile_tainted(self, big_source):
        request = big_request()
        router.record(big_source, request, "numpy", 0.01)
        router.record(big_source, request, "jax", 60.0)  # compile run
        # still unmeasured: explore again
        assert router.choose(big_source, request, True) == "jax"
        router.record(big_source, request, "jax", 0.001)  # warm run
        assert router.choose(big_source, request, True) == "jax"

    def test_close_call_stays_on_host(self, big_source):
        # hysteresis: a device rate within the margin of the host rate
        # keeps the safe host route (close-call noise must not flip it).
        # A borderline first measurement earns ONE second-chance probe
        # (round-5: tunnel rates swing 2-3x run to run) before that.
        request = big_request()
        router.record(big_source, request, "numpy", 0.0100)
        router.record(big_source, request, "jax", 1.0)  # tainted warmup
        router.record(big_source, request, "jax", 0.0095)  # ~5% faster
        assert router.choose(big_source, request, True) == "jax"  # 2nd chance
        router.record(big_source, request, "jax", 0.0095)  # still ~5%
        assert router.choose(big_source, request, True) == "numpy"
        with config.set({"geomodeling.auto-margin": 1.0}):
            assert router.choose(big_source, request, True) == "jax"

    def test_winner_by_measured_rate(self, big_source):
        request = big_request()
        router.record(big_source, request, "numpy", 0.001)  # fast host
        router.record(big_source, request, "jax", 1.0)
        router.record(big_source, request, "jax", 1.0)  # slow device
        assert router.choose(big_source, request, True) == "numpy"

    def test_lowering_failure_pins_host(self, big_source):
        request = big_request()
        router.record(big_source, request, "numpy", 0.01)
        router.record(big_source, request, "jax", 0.0, failed=True)
        assert router.choose(big_source, request, True) == "numpy"
        assert router.stats()[router._key(big_source, request)]["host_only"]

    def test_size_buckets_are_independent(self, big_source):
        small = big_request(64)
        big = big_request(320)
        router.record(big_source, big, "numpy", 0.01)
        # the small bucket has no host measurement yet
        assert router.choose(big_source, small, True) == "numpy"
        assert router.choose(big_source, big, True) == "jax"

    def test_ema_adapts(self, big_source):
        request = big_request()
        router.record(big_source, request, "numpy", 1.0)
        for _ in range(3):
            router.record(big_source, request, "jax", 1.0)
        # device starts equal; host speeds up 100x (tunnel recovered)
        for _ in range(10):
            router.record(big_source, request, "numpy", 0.01)
        assert router.choose(big_source, request, True) == "numpy"


class TestGetDataIntegration:
    def test_auto_explores_then_settles(self, big_source, monkeypatch):
        """Full get_data flow: host first, device twice, then winner."""
        from dask_geomodeling_tpu.runtime import tiles

        calls = []
        real = tiles.evaluate_tiled

        def spy(view, request, tile_size=512, batch=None):
            calls.append("jax")
            return real(view, request, tile_size=tile_size, batch=batch)

        monkeypatch.setattr(tiles, "evaluate_tiled", spy)
        view = Add(big_source, 1.0)
        request = big_request()
        with config.set(
            {
                "geomodeling.executor": "auto",
                "geomodeling.auto-min-device-px": 1024,
                "geomodeling.tile-size": 128,
            }
        ):
            host_result = None
            results = [view.get_data(**request) for _ in range(5)]
        # first call was host-only; exploration ran the device path
        assert 2 <= len(calls) <= 5
        reference = results[0]["values"]
        for result in results[1:]:
            np.testing.assert_array_equal(result["values"], reference)

    def test_auto_small_requests_never_touch_device(
        self, big_source, monkeypatch
    ):
        from dask_geomodeling_tpu.runtime import tiles

        def boom(*args, **kwargs):
            raise AssertionError("device path must not run")

        monkeypatch.setattr(tiles, "evaluate_tiled", boom)
        view = Add(big_source, 1.0)
        request = big_request(32)
        with config.set({"geomodeling.executor": "auto"}):
            for _ in range(4):
                view.get_data(**request)

    def test_auto_non_tileable_view_uses_staged_executor(
        self, big_source, monkeypatch
    ):
        """A view the tile runtime cannot lower still gets a MEASURED
        device route through the staged executor (round-5 fix:
        NotLowerable used to pin the key host-only even when the staged
        path wins — the temporal+zonal benchmark config was serving at
        1.0x with a 1.5-2.8x device win available)."""
        from dask_geomodeling_tpu.runtime import tiles

        calls = []

        def failing(view, request, tile_size=512, batch=None):
            calls.append("try")
            raise tiles.NotLowerable("host-only node")

        monkeypatch.setattr(tiles, "evaluate_tiled", failing)
        view = Add(big_source, 1.0)
        request = big_request()
        with config.set(
            {
                "geomodeling.executor": "auto",
                "geomodeling.auto-min-device-px": 1024,
                "geomodeling.tile-size": 128,  # force the tiled route
            }
        ):
            expected = None
            with config.set({"geomodeling.executor": "numpy"}):
                expected = view.get_data(**request)
            results = [view.get_data(**request) for _ in range(4)]
        assert calls  # the tiled route was attempted
        # the key measured the staged-executor rate instead of pinning
        assert all(not s["host_only"] for s in router.stats().values())
        assert any(
            s["jax_runs"] > 0 for s in router.stats().values()
        )
        for result in results:
            np.testing.assert_array_equal(
                result["values"], expected["values"]
            )

    def test_concurrent_auto_requests_consistent(self, big_source):
        """WMS-style load: many threads hammering one view under auto
        must all get identical results while the router explores and
        settles concurrently."""
        from concurrent.futures import ThreadPoolExecutor

        view = Add(big_source, 1.0)
        request = big_request()
        expected = None
        with config.set(
            {
                "geomodeling.executor": "auto",
                "geomodeling.auto-min-device-px": 1024,
                "geomodeling.tile-size": 128,
            }
        ):
            expected = view.get_data(**request)["values"]
            with ThreadPoolExecutor(max_workers=6) as pool:
                results = list(
                    pool.map(
                        lambda _: view.get_data(**request)["values"],
                        range(18),
                    )
                )
        for result in results:
            np.testing.assert_array_equal(result, expected)
        # the route settled to a single measured state, not a torn one
        state = router.stats()[router._key(view, request)]
        assert state["numpy"] is not None

    def test_numpy_executor_untouched(self, big_source, monkeypatch):
        from dask_geomodeling_tpu.runtime import tiles

        def boom(*args, **kwargs):
            raise AssertionError("device path must not run")

        monkeypatch.setattr(tiles, "evaluate_tiled", boom)
        view = Add(big_source, 1.0)
        with config.set({"geomodeling.executor": "numpy"}):
            for _ in range(3):
                view.get_data(**big_request())


class TestPersistence:
    """Router state survives process restarts via geomodeling.router-state."""

    def _measure(self, source, request, jax_rate):
        router.record(source, request, "numpy", 0.1)     # 1.024 Mpx/s
        router.record(source, request, "jax", 1.0)       # warm-up (ignored)
        elapsed = (request["width"] * request["height"]) / 1e6 / jax_rate
        router.record(source, request, "jax", elapsed)

    def test_save_load_roundtrip(self, big_source, tmp_path):
        path = str(tmp_path / "routes.json")
        request = big_request()
        self._measure(big_source, request, jax_rate=50.0)
        assert router.choose(big_source, request, True) == "jax"
        router.save(path)

        router.reset()  # "restart": a fresh process explores from scratch
        assert router.choose(big_source, request, True) == "numpy"

        router.reset()
        with config.set({"geomodeling.router-state": path}):
            # loaded lazily on first lookup: the measured route is back
            assert router.choose(big_source, request, True) == "jax"
            st = router.stats()
        assert any(v["jax_runs"] >= 2 for v in st.values())

    def test_autosave_after_enough_measurements(self, big_source, tmp_path):
        path = str(tmp_path / "routes.json")
        import os

        request = big_request()
        with config.set({"geomodeling.router-state": path}):
            for _ in range(router._SAVE_EVERY + 2):
                router.record(big_source, request, "numpy", 0.1)
        assert os.path.exists(path)

    def test_corrupt_state_file_is_ignored(self, big_source, tmp_path):
        path = str(tmp_path / "routes.json")
        with open(path, "w") as f:
            f.write("{not json")
        with config.set({"geomodeling.router-state": path}):
            assert router.choose(big_source, big_request(), True) == "numpy"

    def test_loaded_host_only_pin_survives(self, big_source, tmp_path):
        path = str(tmp_path / "routes.json")
        request = big_request()
        router.record(big_source, request, "numpy", 0.1, failed=True)
        router.save(path)
        router.reset()
        with config.set({"geomodeling.router-state": path}):
            router.record(big_source, request, "numpy", 0.1)
            assert router.choose(big_source, request, True) == "numpy"
            st = router.stats()
        assert any(v["host_only"] for v in st.values())

    def test_reset_default_reseeds_from_state_file(self, big_source, tmp_path):
        """reset() re-seeds from the persisted table by default (round-5:
        production processes must not re-pay the exploration tax);
        reset(reseed=False) is the explicit from-scratch variant for
        benchmark A/B hygiene."""
        path = str(tmp_path / "routes.json")
        request = big_request()
        with config.set({"geomodeling.router-state": path}):
            self._measure(big_source, request, jax_rate=50.0)
            router.save()
            assert router.choose(big_source, request, True) == "jax"
            router.reset()
            # the persisted winner survives a default reset
            assert router.choose(big_source, request, True) == "jax"
            router.reset(reseed=False)
            # the explicit from-scratch reset re-explores
            assert router.choose(big_source, request, True) == "numpy"

    def test_reset_reseed_restores_routes(self, big_source, tmp_path):
        """reset(reseed=True) reloads the persisted table: a serving
        process that resets mid-life keeps its learned routes instead of
        re-paying exploration (round-3 verdict item 7)."""
        path = str(tmp_path / "routes.json")
        request = big_request()
        with config.set({"geomodeling.router-state": path}):
            self._measure(big_source, request, jax_rate=50.0)
            router.save()
            router.reset(reseed=True)
            # the measured winner is back immediately, no re-exploration
            assert router.choose(big_source, request, True) == "jax"
            assert any(v["jax_runs"] >= 2 for v in router.stats().values())

    def test_reset_reseed_without_state_file_is_plain_reset(
        self, big_source
    ):
        request = big_request()
        self._measure(big_source, request, jax_rate=50.0)
        router.reset(reseed=True)  # no router-state configured
        assert router.choose(big_source, request, True) == "numpy"


class TestRefreshProbe:
    def test_host_pinned_key_reprobes(self, big_source):
        """A key that measured the device slow re-probes after
        _REFRESH_EVERY host routes — the EMA can only move on runs that
        happen (round-5: once-glitched keys must not stay pinned)."""
        request = big_request()
        router.record(big_source, request, "numpy", 0.01)
        router.record(big_source, request, "jax", 1.0)  # warmup
        router.record(big_source, request, "jax", 0.1)  # clearly slower
        router.record(big_source, request, "jax", 0.1)  # 2nd chance: slow
        routes = [
            router.choose(big_source, request, True)
            for _ in range(router._REFRESH_EVERY)
        ]
        assert routes[:-1] == ["numpy"] * (router._REFRESH_EVERY - 1)
        assert routes[-1] == "jax"  # the probe
        # a fast probe measurement flips the route back to the device
        router.record(big_source, request, "jax", 0.0005)
        router.record(big_source, request, "jax", 0.0005)
        assert router.choose(big_source, request, True) == "jax"
