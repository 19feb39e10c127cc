"""Cross-request result cache (runtime/results.py): the serving-workload
reuse layer at the raster get_data boundary."""
import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import MemorySource
from dask_geomodeling_tpu.runtime import results


@pytest.fixture(autouse=True)
def fresh_cache():
    results.clear()
    yield
    results.clear()


@pytest.fixture
def source():
    return MemorySource(
        data=np.arange(100, dtype="u1").reshape(1, 10, 10),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(0, 10),
    )


def request(**overrides):
    base = dict(
        mode="vals", bbox=(0, 0, 10, 10), projection="EPSG:28992",
        width=10, height=10,
    )
    base.update(overrides)
    return base


def counted(monkeypatch, cls=MemorySource):
    calls = [0]
    original = cls.process  # the staticmethod resolves to a function

    def wrapper(*args, **kwargs):
        calls[0] += 1
        return original(*args, **kwargs)

    for attr in ("jax_impl", "jax_capable", "jax_dynamic",
                 "jax_accepts_device_arrays"):
        if hasattr(original, attr):
            setattr(wrapper, attr, getattr(original, attr))
    monkeypatch.setattr(cls, "process", staticmethod(wrapper))
    return calls


def test_hit_skips_recompute(monkeypatch, source):
    calls = counted(monkeypatch)
    view = source + 1
    with config.set({
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.executor": "numpy",
    }):
        first = view.get_data(**request())
        assert calls[0] == 1
        second = view.get_data(**request())
        assert calls[0] == 1  # served from cache
    np.testing.assert_array_equal(first["values"], second["values"])
    assert first["no_data_value"] == second["no_data_value"]
    st = results.stats()
    assert st["hits"] == 1 and st["misses"] == 1 and st["entries"] == 1


def test_off_by_default(monkeypatch, source):
    calls = counted(monkeypatch)
    with config.set({"geomodeling.executor": "numpy"}):
        source.get_data(**request())
        source.get_data(**request())
    assert calls[0] == 2
    assert results.stats()["entries"] == 0


def test_distinct_requests_distinct_entries(source):
    with config.set({
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.executor": "numpy",
    }):
        a = source.get_data(**request())
        b = source.get_data(**request(bbox=(0, 0, 5, 5), width=5, height=5))
    assert a["values"].shape != b["values"].shape
    assert results.stats()["entries"] == 2


def test_miss_mutable_hit_frozen(source):
    """A miss returns the caller's own response (mutable, cache-on
    semantics identical to cache-off); only hits hand out frozen copies."""
    with config.set({
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.executor": "numpy",
    }):
        first = source.get_data(**request())
        first["values"][0, 0, 0] = 42  # fine: the caller owns a miss
        second = source.get_data(**request())
        # the cache froze its copy before the caller's mutation...
        assert second["values"][0, 0, 0] == 0
        # ...and hits are read-only so they cannot corrupt the cache
        with pytest.raises((ValueError, RuntimeError)):
            second["values"][0, 0, 0] = 42
        third = source.get_data(**request())
    np.testing.assert_array_equal(
        third["values"][0].ravel(), np.arange(100)
    )


def test_container_types_roundtrip():
    """Tuple- and list-valued entries keep their type on miss AND hit."""
    response = {"time": [1, 2], "bands": (3, 4), "no_data_value": None}
    out_miss = results.get_or_compute(
        _TokenStub(), {"mode": "time"}, lambda: response, 10**6
    )
    assert out_miss is response  # miss: the computed object itself
    out_hit = results.get_or_compute(
        _TokenStub(), {"mode": "time"}, _unreachable, 10**6
    )
    assert out_hit == response
    assert isinstance(out_hit["time"], list)
    assert isinstance(out_hit["bands"], tuple)


class _TokenStub:
    token = "results-container-roundtrip"


def _unreachable():
    raise AssertionError("hit path must not recompute")


def test_eviction_under_budget(source):
    # each 10x10 uint8 response is ~100 bytes + overhead; a small budget
    # keeps only the most recent entries
    with config.set({
        "geomodeling.result-cache-size": 800,
        "geomodeling.executor": "numpy",
    }):
        for i in range(1, 9):
            source.get_data(**request(bbox=(0, 0, i, i), width=i, height=i))
    st = results.stats()
    assert st["evictions"] > 0
    assert st["bytes"] <= 800


def test_time_and_meta_modes_cached(monkeypatch, source):
    calls = counted(monkeypatch)
    with config.set({
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.executor": "numpy",
    }):
        t1 = source.get_data(mode="time", start=None, stop=None)
        t2 = source.get_data(mode="time", start=None, stop=None)
        assert calls[0] == 1
    assert t1 == t2
    assert isinstance(t2["time"], list)


def test_clear(source):
    with config.set({
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.executor": "numpy",
    }):
        source.get_data(**request())
        assert results.stats()["entries"] == 1
        results.clear()
        assert results.stats()["entries"] == 0
        assert results.stats()["bytes"] == 0


def test_wms_serving_reuse(monkeypatch, source):
    """The motivating workload: repeated WMS tiles hit the cache."""
    from dask_geomodeling_tpu.ipyleaflet_plugin import render_wms_tile

    calls = counted(monkeypatch)
    params = {
        "layers": source.to_json(), "srs": "EPSG:28992",
        "bbox": "0,0,10,10", "width": "64", "height": "64",
        "vmax": "100",
    }
    with config.set({
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.executor": "numpy",
    }):
        first = render_wms_tile(params)
        second = render_wms_tile(params)
    assert first == second
    assert calls[0] == 1


def test_executors_share_semantics(source):
    """A cache filled under one executor serves the other (keys are
    executor-independent; values are protocol responses)."""
    view = source * 2
    with config.set({
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.executor": "jax",
    }):
        a = view.get_data(**request())
    with config.set({
        "geomodeling.result-cache-size": 10**6,
        "geomodeling.executor": "numpy",
    }):
        b = view.get_data(**request())
    np.testing.assert_array_equal(a["values"], b["values"])
    assert results.stats()["hits"] >= 1
