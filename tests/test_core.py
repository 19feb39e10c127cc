"""Core Block/graph runtime tests.

Coverage modeled on the reference suite (tests/test_core.py): token
determinism & uniqueness, token caching, compute-graph dedup, pickle/JSON
round trips, construct with and without validation.
"""
import pickle
from datetime import datetime, timedelta

import numpy as np
import pytest

from dask_geomodeling_tpu import Block, DummyBlock, construct, tokenize
from dask_geomodeling_tpu.core.graphs import _reconstruct_token


class MockBlock(Block):
    def __init__(self, *args):
        for arg in args:
            if isinstance(arg, str):
                raise TypeError("MockBlock does not accept strings")
        super().__init__(*args)


class Add(MockBlock):
    @staticmethod
    def process(a, b):
        return a + b


class Mul(MockBlock):
    @staticmethod
    def process(a, b):
        return a * b


class Data(Block):
    """Leaf block whose single arg is passed to process as-is."""

    def get_sources_and_requests(self, **request):
        return [(self.args[0], None)]


class TwoRequests(Block):
    """Sends two different requests to the same source."""

    def get_sources_and_requests(self, **request):
        return [(self.args[0], {"x": 1}), (self.args[0], {"x": 2})]

    @staticmethod
    def process(p, q):
        return (p, q)


class TestTokens:
    def test_tokenize_deterministic(self):
        assert tokenize(1, "a", 2.5) == tokenize(1, "a", 2.5)
        assert len(tokenize("x")) == 32
        int(tokenize("x"), 16)  # valid hex

    def test_tokenize_distinct(self):
        assert tokenize(1) != tokenize(2)
        assert tokenize(1) != tokenize(1.0)
        assert tokenize("1") != tokenize(1)
        assert tokenize([1]) != tokenize((1,))
        assert tokenize(True) != tokenize(1)

    def test_tokenize_dummy(self):
        block = DummyBlock("Name_872650a1016b7d4ab8f01a77f2034c33")
        assert block.token == "872650a1016b7d4ab8f01a77f2034c33"
        assert block.name == "Name_872650a1016b7d4ab8f01a77f2034c33"

    def test_tokenize_dummy_derived(self):
        dummy = DummyBlock("Name_872650a1016b7d4ab8f01a77f2034c33")
        real = MockBlock(1)
        assert Add(dummy, 2).token == Add(DummyBlock(dummy.name), 2).token
        assert Add(dummy, 2).token != Add(real, 2).token

    def test_tokenize_float(self):
        assert MockBlock(1.2).token == MockBlock(1.2).token
        assert MockBlock(1.2).token != MockBlock(1.3).token
        # nearby floats are distinct
        assert MockBlock(0.1 + 0.2).token != MockBlock(0.3).token

    def test_tokenize_ancestor_difference(self):
        a, b = MockBlock(1), MockBlock(2)
        assert Add(a, 2).token != Add(b, 2).token
        assert Add(a, 2).token == Add(MockBlock(1), 2).token

    def test_tokenize_level3_difference(self):
        a, b = MockBlock(1), MockBlock(2)
        v1 = Mul(Add(a, 2), 3)
        v2 = Mul(Add(b, 2), 3)
        v3 = Mul(Add(MockBlock(1), 2), 3)
        assert v1.token != v2.token
        assert v1.token == v3.token

    def test_tokenize_class_difference(self):
        assert Add(MockBlock(1), 2).token != Mul(MockBlock(1), 2).token

    def test_tokenize_geometry(self):
        from dask_geomodeling_tpu.geo.geometry import box

        g1 = box(0, 0, 1, 1)
        g2 = box(0, 0, 1, 2)
        assert tokenize(g1) == tokenize(box(0, 0, 1, 1))
        assert tokenize(g1) != tokenize(g2)

    def test_tokenize_datetime(self):
        d1 = datetime(2018, 1, 1)
        d2 = datetime(2018, 1, 2)
        assert MockBlock(d1).token == MockBlock(datetime(2018, 1, 1)).token
        assert MockBlock(d1).token != MockBlock(d2).token

    def test_tokenize_timedelta(self):
        t1 = timedelta(hours=1)
        t2 = timedelta(hours=2)
        assert MockBlock(t1).token == MockBlock(timedelta(hours=1)).token
        assert MockBlock(t1).token != MockBlock(t2).token

    def test_cache_token(self):
        block = MockBlock(1)
        first = block.token
        # mutate internals: the cached token must be reused
        block.args = (2,)
        assert block.token == first


class TestGraphs:
    def test_graph_equal_sources(self):
        a = MockBlock(1)
        view = Add(a, a)
        graph, name = view.get_graph()
        assert len(graph) == 2  # shared source appears once

    def test_graph_different_sources(self):
        view = Add(MockBlock(1), MockBlock(2))
        graph, name = view.get_graph()
        assert len(graph) == 3

    def test_compute_graph(self):
        view = Add(MockBlock(1), 2)
        graph, name = view.get_compute_graph(test="a")
        assert name.startswith("add_")
        assert len(graph) == 2

    def test_compute_graph_uses_cache(self):
        a = MockBlock(1)
        view = Add(a, a)
        graph, name = view.get_compute_graph()
        # a appears once although referenced twice
        assert len(graph) == 2
        entry = graph[name]
        assert entry[1] == entry[2]

    def test_compute_graph_request_differs(self):
        a = MockBlock(1)
        graph, name = TwoRequests(a).get_compute_graph()
        assert len(graph) == 3  # same block, two requests → two entries

    def test_compute_direct(self):
        view = Add(Data(3), Data(4))
        assert view.get_data() == 7

    def test_compute_nested(self):
        view = Mul(Add(Data(3), Data(4)), Data(2))
        assert view.get_data() == 14


class TestSerialization:
    def test_pickle(self):
        view = Add(MockBlock(1), 2)
        view2 = pickle.loads(pickle.dumps(view))
        assert view.token == view2.token
        assert type(view2) is Add

    def test_json(self):
        view = Add(MockBlock(1), 2)
        view2 = Block.from_json(view.to_json())
        assert view.token == view2.token
        assert view2.args[1] == 2

    def test_serialize_contains_version(self):
        assert Add(MockBlock(1), 2).serialize()["version"] == 2

    def test_construct(self):
        view = Add(MockBlock(1), 2)
        graph, name = view.get_graph(serialize=True)
        view2 = construct(graph, name)
        assert view2.token == view.token

    def test_construct_no_validation(self):
        # strings are rejected by MockBlock.__init__; without validation
        # construction succeeds anyway
        view = Add(MockBlock(1), 2)
        graph, name = view.get_graph(serialize=True)
        sub = [k for k in graph if k.startswith("MockBlock")][0]
        graph[sub] = [graph[sub][0], "not allowed"]
        view2 = construct(graph, name, validate=False)
        assert view2.args[0].args == ("not allowed",)

    def test_construct_validation_raises_with_key(self):
        view = Add(MockBlock(1), 2)
        graph, name = view.get_graph(serialize=True)
        sub = [k for k in graph if k.startswith("MockBlock")][0]
        graph[sub] = [graph[sub][0], "not allowed"]
        with pytest.raises(TypeError, match=sub.split("_")[0]):
            construct(graph, name, validate=True)

    def test_construct_no_validation_reuses_token(self):
        view = Add(MockBlock(1), 2)
        graph, name = view.get_graph(serialize=True)
        view2 = construct(graph, name, validate=False)
        assert view2.token == view.token
        assert view2._cached_token == view.token

    def test_construct_invalid_key_warns(self, caplog):
        graph = {"badkey": ["tests.test_core.MockBlock", 1]}
        import logging

        with caplog.at_level(logging.WARNING):
            block = construct(graph, "badkey", validate=False)
        assert block.args == (1,)
        assert any("invalid name" in r.message for r in caplog.records)

    def test_reconstruct_token(self):
        token = "0123456789abcdef0123456789abcdef"
        assert _reconstruct_token("X_" + token) == token
        assert _reconstruct_token("X_" + token.upper()) == token
        assert _reconstruct_token("X" + token) is None
        assert _reconstruct_token("X_" + "z" * 32) is None

    def test_import_path_roundtrip(self):
        path = Add.get_import_path()
        assert Block.from_import_path(path) is Add

    def test_import_path_allowlist(self):
        from dask_geomodeling_tpu import config
        from dask_geomodeling_tpu.raster import Add as RasterAdd

        with config.set(
            {"geomodeling.block-import-paths": ["dask_geomodeling_tpu"]}
        ):
            assert (
                Block.from_import_path(RasterAdd.get_import_path()) is RasterAdd
            )
            with pytest.raises(TypeError, match="outside the allowed"):
                Block.from_import_path("subprocess.Popen")
            with pytest.raises(TypeError, match="outside the allowed"):
                Block.from_import_path(Add.get_import_path())  # test-local
        # unrestricted by default: invalid targets still fail the type check
        with pytest.raises(TypeError):
            Block.from_import_path("collections.OrderedDict")


class TestSchedulers:
    def _make_graph(self):
        import operator

        return {
            "a": (lambda: 1,),
            "b": (operator.add, "a", 2),
            "c": (operator.mul, "b", "b"),
        }

    def test_get_sync(self):
        from dask_geomodeling_tpu.core import get_sync

        assert get_sync(self._make_graph(), ["c", "b"]) == [9, 3]

    def test_get_threaded(self):
        from dask_geomodeling_tpu.core import get_threaded

        assert get_threaded(self._make_graph(), ["c"]) == [9]

    def test_scheduler_config(self):
        from dask_geomodeling_tpu import config
        from dask_geomodeling_tpu.core import get_scheduler, get_threaded

        with config.set({"scheduler": "threads"}):
            assert get_scheduler() is get_threaded

    def test_unknown_scheduler(self):
        from dask_geomodeling_tpu.core import get_scheduler

        with pytest.raises(ValueError):
            get_scheduler("nonsense")


def test_get_processes():
    import operator

    from dask_geomodeling_tpu.core import get_processes

    graph = {
        "a": (int, "4"),
        "b": (operator.add, "a", 2),
        "c": (operator.mul, "b", "b"),
    }
    assert get_processes(graph, ["c", "b"]) == [36, 6]


def test_view_evaluates_under_processes_scheduler():
    from datetime import datetime

    import numpy as np

    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import Add, MemorySource

    source = MemorySource(
        data=np.full((1, 4, 4), 3, dtype=np.uint8),
        no_data_value=255,
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
    )
    view = Add(source, 10)
    request = dict(
        mode="vals", bbox=(135000, 455996, 135004, 456000),
        projection="EPSG:28992", width=4, height=4,
        start=datetime(1970, 1, 1),
    )
    expected = view.get_data(**request)
    with config.set({"scheduler": "processes"}):
        actual = view.get_data(**request)
    np.testing.assert_array_equal(actual["values"], expected["values"])


class TestTokenizeNumpyScalars:
    """Round-2 review regressions: numpy scalar tokens must be
    deterministic (random tokens break dedup + the program cache)."""

    def test_timedelta64_and_datetime64(self):
        assert tokenize(np.timedelta64(5, "m")) == tokenize(np.timedelta64(5, "m"))
        assert tokenize(np.timedelta64(5, "m")) != tokenize(np.timedelta64(5, "s"))
        assert tokenize(np.datetime64("2020-01-01")) == tokenize(
            np.datetime64("2020-01-01")
        )

    def test_numpy_bool(self):
        assert tokenize(np.bool_(True)) == tokenize(np.bool_(True))
        assert tokenize(np.bool_(True)) == tokenize(True)
        assert tokenize(np.bool_(False)) != tokenize(np.bool_(True))

    def test_stateful_callable_uses_token_protocol(self):
        class Stateful:
            def __init__(self, v):
                self.v = v

            def __call__(self):
                return self.v

            def __token__(self):
                return ("Stateful", self.v)

        assert tokenize(Stateful(1)) == tokenize(Stateful(1))
        assert tokenize(Stateful(1)) != tokenize(Stateful(2))

    def test_dummy_block_token_with_underscored_name(self):
        token = "0123456789abcdef0123456789abcdef"
        assert DummyBlock("some_block_" + token).token == token


def test_top_level_namespace_matches_reference():
    """`import dask_geomodeling_tpu` exposes what the reference's
    top-level does (reference __init__.py:9-12): config, Block,
    construct, and the raster/geometry subpackages."""
    import dask_geomodeling_tpu as dg

    assert dg.raster.Group is not None
    assert dg.geometry.AggregateRaster is not None
    assert callable(dg.construct)
    assert dg.Block is not None
    assert dg.config.get("geomodeling.raster-limit") > 0


class TestEnvOverrides:
    """DASK_GEOMODELING__* env vars seed the config (dask.config parity)."""

    def test_mapping(self):
        from dask_geomodeling_tpu.config import _env_overrides

        out = _env_overrides({
            "DASK_GEOMODELING__RASTER_LIMIT": "123",
            "DASK_GEOMODELING__USE_OVERVIEWS": "True",
            "DASK_GEOMODELING__ROOT": "/data",
            "DASK_SCHEDULER": "threads",
            "UNRELATED": "1",
        })
        assert out == {
            "geomodeling.raster-limit": 123,
            "geomodeling.use-overviews": True,
            "geomodeling.root": "/data",
            "scheduler": "threads",
        }

    def test_subprocess_seed(self):
        import json
        import os
        import subprocess
        import sys

        env = dict(os.environ, DASK_GEOMODELING__GEOMETRY_LIMIT="77",
                   PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c",
             "from dask_geomodeling_tpu import config;"
             "import json;"
             "print(json.dumps(config.get('geomodeling.geometry-limit')))"],
            env=env, capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        assert json.loads(out.stdout.strip().splitlines()[-1]) == 77
