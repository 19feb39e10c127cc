"""WMS tile rendering tests (the reference's interactive workload,
SURVEY §3.5): view JSON travels per request, tile is rendered to PNG."""
import numpy as np
import pytest

from dask_geomodeling_tpu.ipyleaflet_plugin import WMSError, render_wms_tile, wms_app
from dask_geomodeling_tpu.raster import MemorySource


@pytest.fixture
def view_json():
    # args must be JSON-serializable: build from a list, not an ndarray
    source = MemorySource(
        data=[[float(i) for i in range(10)] for _ in range(10)],
        no_data_value=255.0,
        projection="EPSG:3857",
        pixel_size=1.0,
        pixel_origin=(0, 10),
    )
    return source.to_json()


def base_params(view_json):
    return {
        "layers": view_json,
        "styles": "viridis",
        "vmin": "0",
        "vmax": "10",
        "format": "image/png",
        "srs": "EPSG:3857",
        "height": "64",
        "width": "64",
        "maxcellsize": "10.0",
        "time": "",
        "bbox": "0,0,10,10",
    }


def test_render_png(view_json):
    raw = render_wms_tile(base_params(view_json))
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"


def test_overload_guard(view_json):
    params = base_params(view_json)
    params["bbox"] = "0,0,100000,100000"
    with pytest.raises(WMSError, match="Too large"):
        render_wms_tile(params)


def test_bad_format(view_json):
    params = base_params(view_json)
    params["format"] = "image/gif"
    with pytest.raises(WMSError, match="Unsupported format"):
        render_wms_tile(params)


def test_invalid_layers():
    params = base_params("{not json")
    with pytest.raises(WMSError, match="Invalid 'layers'"):
        render_wms_tile(params)


def test_wsgi_app(view_json):
    from urllib.parse import urlencode

    environ = {"QUERY_STRING": urlencode(base_params(view_json))}
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    body = b"".join(wms_app(environ, start_response))
    assert captured["status"] == "200 OK"
    assert captured["headers"]["Content-Type"] == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_wsgi_app_error(view_json):
    environ = {"QUERY_STRING": "layers=broken"}
    captured = {}

    def start_response(status, headers):
        captured["status"] = status

    wms_app(environ, start_response)
    assert captured["status"].startswith("400")


def test_render_under_jax_executor(view_json):
    """The serving path works unchanged under the XLA executor."""
    from dask_geomodeling_tpu import config

    expected = render_wms_tile(base_params(view_json))
    with config.set({"geomodeling.executor": "jax"}):
        actual = render_wms_tile(base_params(view_json))
    assert actual[:8] == b"\x89PNG\r\n\x1a\n"
    assert actual == expected  # identical pixels -> identical PNG bytes


def test_live_http_server(view_json):
    """End to end over a real socket: wsgiref serving wms_app."""
    import threading
    import urllib.parse
    import urllib.request
    from wsgiref.simple_server import make_server

    httpd = make_server("127.0.0.1", 0, wms_app)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        query = urllib.parse.urlencode(base_params(view_json))
        with urllib.request.urlopen(
            "http://127.0.0.1:%d/wms?%s" % (port, query), timeout=30
        ) as response:
            assert response.status == 200
            assert response.headers["Content-Type"] == "image/png"
            body = response.read()
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        # a client error comes back as a 4xx, not a server crash
        bad = urllib.parse.urlencode(
            dict(base_params(view_json), bbox="not,a,bbox")
        )
        try:
            urllib.request.urlopen(
                "http://127.0.0.1:%d/wms?%s" % (port, bad), timeout=30
            )
            raised = False
        except urllib.error.HTTPError as e:
            raised = 400 <= e.code < 500
        assert raised
    finally:
        httpd.shutdown()
        thread.join(timeout=5)


def test_time_parameter(view_json):
    """A temporal layer renders the requested ISO time frame."""
    from datetime import datetime, timedelta

    source = MemorySource(
        data=[[[float(i)] * 4 for _ in range(4)] for i in (1, 9)],
        no_data_value=255.0,
        projection="EPSG:3857",
        pixel_size=1.0,
        pixel_origin=(0, 4),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )
    params = dict(
        base_params(source.to_json()),
        bbox="0,0,4,4",
        vmax="10",
        time="2000-01-01T01:00:00.000000Z",
    )
    with_time = render_wms_tile(params)
    without_time = render_wms_tile(dict(params, time=""))
    assert with_time[:8] == b"\x89PNG\r\n\x1a\n"
    # frame 0 (values 1) vs latest frame (values 9): different pixels
    assert with_time != render_wms_tile(
        dict(params, time="2000-01-01T00:00:00.000000Z")
    )
    assert without_time == with_time  # no time = latest frame = 01:00


def test_concurrent_rendering(view_json):
    """Typical production serving: many tiles rendered on a thread pool
    must equal serial rendering (program/config caches are shared)."""
    from concurrent.futures import ThreadPoolExecutor

    def tile_params(i, j):
        return dict(
            base_params(view_json), bbox="%d,%d,%d,%d" % (i, j, i + 5, j + 5)
        )

    jobs = [tile_params(i, j) for i in range(0, 10, 5) for j in range(0, 10, 5)]
    serial = [render_wms_tile(p) for p in jobs]
    with ThreadPoolExecutor(max_workers=4) as pool:
        for _ in range(3):  # repeat to shake out cache races
            concurrent = list(pool.map(render_wms_tile, jobs))
            assert concurrent == serial
    # the same under the XLA executor (shared program cache)
    from dask_geomodeling_tpu import config

    with config.set({"geomodeling.executor": "jax"}):
        serial_jax = [render_wms_tile(p) for p in jobs]
        with ThreadPoolExecutor(max_workers=4) as pool:
            concurrent_jax = list(pool.map(render_wms_tile, jobs))
        assert concurrent_jax == serial_jax
    assert serial_jax == serial  # executors agree on the rendered pixels


def test_tornado_handler(view_json):
    """The Tornado handler (the reference's Jupyter serving path,
    ipyleaflet_plugin.py:18-87) over a real tornado HTTPServer."""
    import asyncio
    import threading
    import urllib.parse
    import urllib.request

    import tornado.httpserver
    import tornado.netutil
    import tornado.web

    from dask_geomodeling_tpu.ipyleaflet_plugin import GeomodelingWMSHandler

    assert GeomodelingWMSHandler is not None
    started = threading.Event()
    box = {}

    def serve():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        app = tornado.web.Application([(r"/wms", GeomodelingWMSHandler)])
        server = tornado.httpserver.HTTPServer(app)
        sockets = tornado.netutil.bind_sockets(0, "127.0.0.1")
        server.add_sockets(sockets)
        box["port"] = sockets[0].getsockname()[1]
        box["loop"] = loop
        started.set()
        loop.run_forever()

    thread = threading.Thread(target=serve, daemon=True)
    thread.start()
    assert started.wait(timeout=30)
    try:
        query = urllib.parse.urlencode(base_params(view_json))
        with urllib.request.urlopen(
            "http://127.0.0.1:%d/wms?%s" % (box["port"], query), timeout=30
        ) as response:
            assert response.status == 200
            assert response.headers["Content-Type"] == "image/png"
            assert response.headers["Pragma"] == "no-cache"
            body = response.read()
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        # identical pixels to the WSGI path
        assert body == render_wms_tile(base_params(view_json))
        # client errors surface as HTTP 400s with the WMSError message
        bad = urllib.parse.urlencode(
            dict(base_params(view_json), bbox="0,0,100000,100000")
        )
        try:
            urllib.request.urlopen(
                "http://127.0.0.1:%d/wms?%s" % (box["port"], bad), timeout=30
            )
            code, text = None, ""
        except urllib.error.HTTPError as e:
            code, text = e.code, e.read().decode()
        assert code == 400 and "Too large" in text
        # malformed parameters are 400s too, not 500s
        ugly = urllib.parse.urlencode(
            dict(base_params(view_json), bbox="not,a,bbox")
        )
        try:
            urllib.request.urlopen(
                "http://127.0.0.1:%d/wms?%s" % (box["port"], ugly), timeout=30
            )
            code = None
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400
    finally:
        box["loop"].call_soon_threadsafe(box["loop"].stop)
        thread.join(timeout=5)


def test_load_jupyter_server_extension_registers_route(monkeypatch):
    """The notebook extension hook wires /wms under the server base_url
    (stub notebook module; the real package is absent in this image)."""
    import sys
    import types

    stub_utils = types.ModuleType("notebook.utils")
    stub_utils.url_path_join = lambda *parts: "/".join(
        p.strip("/") for p in parts if p.strip("/")
    ) or "/"
    stub_notebook = types.ModuleType("notebook")
    stub_notebook.utils = stub_utils
    monkeypatch.setitem(sys.modules, "notebook", stub_notebook)
    monkeypatch.setitem(sys.modules, "notebook.utils", stub_utils)

    from dask_geomodeling_tpu.ipyleaflet_plugin import (
        GeomodelingWMSHandler,
        load_jupyter_server_extension,
    )

    registered = {}

    class FakeWebApp:
        settings = {"base_url": "/user/me/"}

        def add_handlers(self, pattern, handlers):
            registered["pattern"] = pattern
            registered["handlers"] = handlers

    app = types.SimpleNamespace(web_app=FakeWebApp())
    load_jupyter_server_extension(app)
    (route, handler), = registered["handlers"]
    assert route.endswith("wms")
    assert handler is GeomodelingWMSHandler


def test_geomodeling_layer_with_stub_ipyleaflet(monkeypatch):
    """Exercise the ipyleaflet layer class by injecting a stub WMSLayer
    (the real package is not in this image; the subclass logic — traits,
    view JSON in 'layers', wms url joining — is what we own)."""
    import importlib
    import sys
    import types

    import traitlets

    class StubWMSLayer(traitlets.HasTraits):
        url = traitlets.Unicode("")
        layers = traitlets.Unicode("")

        def __init__(self, url="", **kwargs):
            super().__init__()
            self.url = url
            for key, value in kwargs.items():
                setattr(self, key, value)

    stub = types.ModuleType("ipyleaflet")
    stub.WMSLayer = StubWMSLayer
    monkeypatch.setitem(sys.modules, "ipyleaflet", stub)

    import dask_geomodeling_tpu.ipyleaflet_plugin as plugin

    plugin = importlib.reload(plugin)
    try:
        assert plugin.GeomodelingLayer is not None

        from datetime import datetime

        import numpy as np

        from dask_geomodeling_tpu.core import Block
        from dask_geomodeling_tpu.raster import MemorySource

        view = MemorySource(
            data=np.zeros((1, 4, 4), dtype="u1"),
            no_data_value=255,
            projection="EPSG:3857",
            pixel_size=1.0,
            pixel_origin=(0.0, 4.0),
            time_first=datetime(2000, 1, 1),
            time_delta=None,
        )
        layer = plugin.GeomodelingLayer(
            view, "http://localhost:8888/", vmin=0.0, vmax=10.0
        )
        assert layer.url == "http://localhost:8888/wms"
        assert Block.from_json(layer.layers).token == view.token
        assert layer.vmax == 10.0
    finally:
        # restore the module as imported without the stub
        monkeypatch.delitem(sys.modules, "ipyleaflet")
        importlib.reload(plugin)


def test_serving_soak_memory_bounded(view_json):
    """Sustained threaded serving with every cache on: the bounded
    LRUs (result cache, router table, program caches) must hold memory
    roughly flat across hundreds of distinct tiles."""
    import gc
    import tracemalloc
    from concurrent.futures import ThreadPoolExecutor

    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.runtime import results, router

    router.reset()
    results.clear()

    def tile_params(i):
        x = (i * 7) % 60 / 10.0
        y = (i * 13) % 60 / 10.0
        return dict(
            base_params(view_json),
            bbox="%g,%g,%g,%g" % (x, y, x + 2, y + 2),
            width="32", height="32",
        )

    with config.set({
        "geomodeling.executor": "auto",
        "geomodeling.result-cache-size": 2 * 10**6,
    }):
        with ThreadPoolExecutor(max_workers=4) as pool:
            # warm everything (compiles, route exploration, caches)
            list(pool.map(render_wms_tile, [tile_params(i) for i in range(100)]))
            gc.collect()
            tracemalloc.start()
            first = tracemalloc.take_snapshot()
            for _ in range(3):
                list(pool.map(
                    render_wms_tile, [tile_params(i) for i in range(300)]
                ))
            gc.collect()
            second = tracemalloc.take_snapshot()
            tracemalloc.stop()
    growth = sum(
        s.size_diff for s in second.compare_to(first, "filename")
        if s.size_diff > 0
    )
    # bounded: caches are LRU-capped, so 900 further renders must not
    # accumulate more than a modest allocation delta
    assert growth < 32 * 10**6, "leaked %.1f MB" % (growth / 1e6)
    stats = results.stats()
    assert stats["bytes"] <= 2 * 10**6  # the byte budget held


def test_named_layers_and_capabilities(view_json):
    """Standard-client flow: register a named layer, discover it via
    GetCapabilities, then GetMap by NAME (uppercase params like real
    WMS clients send)."""
    from urllib.parse import urlencode
    from xml.etree import ElementTree

    from dask_geomodeling_tpu.core import Block
    from dask_geomodeling_tpu.ipyleaflet_plugin import (
        register_layer,
        unregister_layers,
    )

    register_layer("rainfall", Block.from_json(view_json))
    try:
        environ = {
            "QUERY_STRING": "SERVICE=WMS&REQUEST=GetCapabilities",
            "HTTP_HOST": "tiles.example:8080",
            "PATH_INFO": "/wms",
        }
        captured = {}

        def start_response(status, headers):
            captured["status"] = status
            captured["headers"] = dict(headers)

        body = b"".join(wms_app(environ, start_response))
        assert captured["status"] == "200 OK"
        root = ElementTree.fromstring(body)
        names = [e.text for e in root.iter("Name")]
        assert "rainfall" in names
        assert b"tiles.example:8080" in body
        bbox = next(root.iter("LatLonBoundingBox"))
        assert float(bbox.get("minx")) < float(bbox.get("maxx"))

        # GetMap by the registered name, uppercase query keys
        query = urlencode({
            "SERVICE": "WMS", "REQUEST": "GetMap", "LAYERS": "rainfall",
            "SRS": "EPSG:3857", "BBOX": "0,0,10,10",
            "WIDTH": "64", "HEIGHT": "64", "STYLES": "viridis",
            "VMIN": "0", "VMAX": "10", "FORMAT": "image/png",
        })
        png = b"".join(wms_app({"QUERY_STRING": query}, start_response))
        assert captured["status"] == "200 OK"
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # identical pixels to the ship-the-view path
        assert png == render_wms_tile(base_params(view_json))
    finally:
        unregister_layers()


def test_wms_13_crs_and_axis_order(view_json):
    """WMS 1.3.0 clients send CRS= and lat/lon-ordered BBOX for
    geographic CRSes; both map onto the 1.1 semantics."""
    source = MemorySource(
        data=[[float(i) for i in range(10)] for _ in range(10)],
        no_data_value=255.0,
        projection="EPSG:4326",
        pixel_size=0.1,
        pixel_origin=(4.0, 53.0),
    )
    p11 = dict(
        base_params(source.to_json()), srs="EPSG:4326",
        bbox="4.0,52.0,5.0,53.0", maxcellsize="1",
    )
    expected = render_wms_tile(p11)
    p13 = dict(p11)
    del p13["srs"]
    p13.update(crs="EPSG:4326", version="1.3.0",
               bbox="52.0,4.0,53.0,5.0")  # lat/lon order
    assert render_wms_tile(p13) == expected
    # projected CRSes keep x/y order in 1.3
    p13_merc = dict(base_params(view_json), version="1.3.0")
    p13_merc["crs"] = p13_merc.pop("srs")
    assert render_wms_tile(p13_merc) == render_wms_tile(
        base_params(view_json)
    )
    # resolve the exception class at call time: an earlier test reloads
    # the plugin module, and the (shared-globals) functions then raise
    # the reloaded class object
    from dask_geomodeling_tpu import ipyleaflet_plugin as plugin

    with pytest.raises(plugin.WMSError, match="SRS/CRS"):
        bad = base_params(view_json)
        del bad["srs"]
        render_wms_tile(bad)


def test_wms_serve_main_configuration(view_json, monkeypatch):
    """wms_serve.main wires layers, the result cache and router
    persistence before serving."""
    from dask_geomodeling_tpu import config, wms_serve
    from dask_geomodeling_tpu.ipyleaflet_plugin import (
        get_capabilities_xml,
        unregister_layers,
    )

    served = {}

    class FakeServer:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def serve_forever(self):
            served["up"] = True

    monkeypatch.setattr(
        wms_serve, "make_server", lambda h, p, app: FakeServer()
    )
    try:
        wms_serve.main(
            port=0, layers={"demo": view_json},
            result_cache_bytes=123456, router_state="/tmp/routes.json",
        )
        assert served["up"]
        assert config.get("geomodeling.result-cache-size") == 123456
        assert config.get("geomodeling.router-state") == "/tmp/routes.json"
        # named layers registered => raw view JSON off by default
        assert config.get("geomodeling.wms-json-layers") is False
        assert "demo" in get_capabilities_xml()
    finally:
        unregister_layers()
        config.set({
            "geomodeling.result-cache-size": 0,
            "geomodeling.router-state": None,
            "geomodeling.wms-json-layers": True,
        })


def test_wms_13_crs84_never_flips():
    """CRS:84 is DEFINED lon/lat: WMS 1.3 requests in it keep x/y order
    (review finding)."""
    source = MemorySource(
        data=[[float(i) for i in range(10)] for _ in range(10)],
        no_data_value=255.0, projection="EPSG:4326",
        pixel_size=0.1, pixel_origin=(4.0, 53.0),
    )
    reference = render_wms_tile(dict(
        base_params(source.to_json()), srs="EPSG:4326",
        bbox="4.0,52.0,5.0,53.0", maxcellsize="1",
    ))
    p = dict(base_params(source.to_json()), maxcellsize="1",
             version="1.3.0", bbox="4.0,52.0,5.0,53.0")
    del p["srs"]
    p["crs"] = "CRS:84"
    assert render_wms_tile(p) == reference


def test_capabilities_host_header_is_attribute_safe():
    """A hostile Host header cannot inject XML (review finding)."""
    from xml.etree import ElementTree

    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    environ = {
        "QUERY_STRING": "REQUEST=GetCapabilities",
        "HTTP_HOST": 'evil"/><Layer><Name>fake</Name></Layer><x a="',
    }
    body = b"".join(wms_app(environ, start_response))
    root = ElementTree.fromstring(body)  # still well-formed XML
    assert "fake" not in [e.text for e in root.iter("Name")]
    assert captured["headers"]["Cache-Control"].startswith("no-store")


def test_tornado_handler_capabilities_and_wms13(view_json):
    """The Tornado surface serves GetCapabilities and accepts 1.3
    CRS=/VERSION= parameters (review finding)."""
    import asyncio
    import threading
    import urllib.parse
    import urllib.request

    import tornado.httpserver
    import tornado.netutil
    import tornado.web

    from dask_geomodeling_tpu.core import Block
    from dask_geomodeling_tpu.ipyleaflet_plugin import (
        GeomodelingWMSHandler,
        register_layer,
        unregister_layers,
    )

    register_layer("rainfall", Block.from_json(view_json))
    started = threading.Event()
    box = {}

    def serve():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        app = tornado.web.Application([(r"/wms", GeomodelingWMSHandler)])
        server = tornado.httpserver.HTTPServer(app)
        sockets = tornado.netutil.bind_sockets(0, "127.0.0.1")
        server.add_sockets(sockets)
        box["port"] = sockets[0].getsockname()[1]
        box["loop"] = loop
        started.set()
        loop.run_forever()

    thread = threading.Thread(target=serve, daemon=True)
    thread.start()
    assert started.wait(timeout=30)
    try:
        with urllib.request.urlopen(
            "http://127.0.0.1:%d/wms?SERVICE=WMS&REQUEST=GetCapabilities"
            % box["port"], timeout=30,
        ) as response:
            assert response.status == 200
            assert b"rainfall" in response.read()
        query = urllib.parse.urlencode({
            "REQUEST": "GetMap", "VERSION": "1.3.0", "LAYERS": "rainfall",
            "CRS": "EPSG:3857", "BBOX": "0,0,10,10",
            "WIDTH": "64", "HEIGHT": "64", "VMAX": "10",
        })
        with urllib.request.urlopen(
            "http://127.0.0.1:%d/wms?%s" % (box["port"], query), timeout=30
        ) as response:
            assert response.status == 200
            assert response.read()[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        unregister_layers()
        box["loop"].call_soon_threadsafe(box["loop"].stop)
        thread.join(timeout=5)


def test_empty_styles_and_unknown_colormap(view_json):
    """Clients send STYLES= (empty, meaning default); unknown colormaps
    are client errors, not server crashes."""
    params = dict(base_params(view_json), styles="")
    assert render_wms_tile(params)[:8] == b"\x89PNG\r\n\x1a\n"
    from dask_geomodeling_tpu import ipyleaflet_plugin as plugin

    with pytest.raises(plugin.WMSError, match="colormap"):
        render_wms_tile(dict(base_params(view_json), styles="nope-123"))


def test_empty_optional_params_use_defaults(view_json):
    """Handlers forward every query key with empty strings for absent
    values (the Tornado surface did this historically); empties mean
    defaults, not 400s."""
    params = dict(base_params(view_json), vmin="", vmax="",
                  maxcellsize="", format="", styles="", time="")
    png = render_wms_tile(params)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_wcs_getcoverage(view_json):
    """request=GetCoverage returns the raw GeoTIFF (values, nodata,
    georeferencing) for a named or shipped view — the data sibling of
    the GetMap picture path."""
    from io import BytesIO
    from urllib.parse import urlencode

    import numpy as np

    from dask_geomodeling_tpu.core import Block
    from dask_geomodeling_tpu.io.geotiff import read_geotiff
    from dask_geomodeling_tpu.ipyleaflet_plugin import (
        register_layer,
        unregister_layers,
    )

    register_layer("rain", Block.from_json(view_json))
    try:
        captured = {}

        def start_response(status, headers):
            captured["status"] = status
            captured["headers"] = dict(headers)

        query = urlencode({
            "SERVICE": "WCS", "REQUEST": "GetCoverage", "COVERAGE": "rain",
            "CRS": "EPSG:3857", "BBOX": "0,0,10,10",
            "WIDTH": "10", "HEIGHT": "10", "FORMAT": "GeoTIFF",
        })
        body = b"".join(wms_app({"QUERY_STRING": query}, start_response))
        assert captured["status"] == "200 OK"
        assert captured["headers"]["Content-Type"] == "image/tiff"
        import tempfile, os

        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "c.tif")
            open(path, "wb").write(body)
            data = read_geotiff(path)
        expected = Block.from_json(view_json).get_data(
            mode="vals", bbox=(0, 0, 10, 10), projection="EPSG:3857",
            width=10, height=10,
        )
        np.testing.assert_array_equal(data.array, expected["values"])
        assert data.no_data_value == expected["no_data_value"]
        np.testing.assert_allclose(
            data.geo_transform, (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        )
        # client errors are 4xx
        bad = urlencode({"REQUEST": "GetCoverage", "COVERAGE": "missing!",
                         "CRS": "EPSG:3857", "BBOX": "0,0,1,1",
                         "WIDTH": "4", "HEIGHT": "4"})
        wms_app({"QUERY_STRING": bad}, start_response)
        assert captured["status"].startswith("400")
    finally:
        unregister_layers()


from io import BytesIO
from urllib.parse import urlencode

from dask_geomodeling_tpu.ipyleaflet_plugin import get_capabilities_xml


def _plugin():
    # resolve through the module so a reload elsewhere can't break
    # class identity or function references
    from dask_geomodeling_tpu import ipyleaflet_plugin as plugin

    return plugin


class TestImageFormats:
    """FORMAT=image/jpeg|webp, TRANSPARENT and BGCOLOR handling."""

    def _params(self, view_json, **extra):
        params = dict(
            layers=view_json, bbox="0,0,10,10", width="16", height="16",
            srs="EPSG:3857", maxcellsize="10",
        )
        params.update(extra)
        return params

    def test_jpeg(self, view_json):
        from PIL import Image

        raw = _plugin().render_wms_tile(
            self._params(view_json, format="image/jpeg")
        )
        with Image.open(BytesIO(raw)) as img:
            assert img.format == "JPEG"
            assert img.size == (16, 16)

    def test_webp(self, view_json):
        from PIL import Image

        raw = _plugin().render_wms_tile(
            self._params(view_json, format="image/webp")
        )
        with Image.open(BytesIO(raw)) as img:
            assert img.format == "WEBP"

    def test_unknown_format_400(self, view_json):
        with pytest.raises(_plugin().WMSError) as err:
            _plugin().render_wms_tile(
                self._params(view_json, format="image/gif")
            )
        assert err.value.status == 400

    def test_transparent_false_composites_bgcolor(self, view_json):
        from PIL import Image

        raw = _plugin().render_wms_tile(self._params(
            view_json, transparent="FALSE", bgcolor="0xFF0000",
            vmin="0", vmax="1",
        ))
        with Image.open(BytesIO(raw)) as img:
            arr = np.asarray(img)
        assert arr.ndim == 3 and arr.shape[2] == 3  # alpha dropped

    def test_invalid_bgcolor_400(self, view_json):
        with pytest.raises(_plugin().WMSError) as err:
            _plugin().render_wms_tile(self._params(
                view_json, transparent="false", bgcolor="red"
            ))
        assert err.value.status == 400

    def test_wsgi_content_type_echoes_format(self, view_json):
        calls = {}

        def start_response(status, headers):
            calls["status"] = status
            calls["headers"] = dict(headers)

        environ = {
            "QUERY_STRING": urlencode(
                self._params(view_json, format="image/jpeg")
            )
        }
        body = b"".join(_plugin().wms_app(environ, start_response))
        assert calls["status"].startswith("200")
        assert calls["headers"]["Content-Type"] == "image/jpeg"
        assert body[:2] == b"\xff\xd8"  # JPEG SOI

    def test_capabilities_advertises_formats(self):
        xml = _plugin().get_capabilities_xml()
        assert "<Format>image/jpeg</Format>" in xml
        assert "<Format>image/webp</Format>" in xml


class TestGetFeatureInfo:
    """WMS GetFeatureInfo: the identify-click of desktop clients."""

    def _params(self, view_json, **extra):
        params = dict(
            layers=view_json, bbox="0,0,10,10", width="10", height="10",
            srs="EPSG:3857", request="GetFeatureInfo",
        )
        params.update(extra)
        return {k: v for k, v in params.items() if v is not None}

    def test_json_value(self, view_json):
        import json

        raw = _plugin().render_feature_info(
            self._params(view_json, i="3", j="2")
        )
        payload = json.loads(raw)
        # source: column index == value; pixel centres at half-cells
        assert payload["value"] == 3.0
        assert payload["crs"] == "EPSG:3857"
        assert payload["x"] == 3.5 and payload["y"] == 7.5

    def test_wms11_xy_names(self, view_json):
        import json

        raw = _plugin().render_feature_info(
            self._params(view_json, x="7", y="9")
        )
        assert json.loads(raw)["value"] == 7.0

    def test_plain_text(self, view_json):
        raw = _plugin().render_feature_info(self._params(
            view_json, i="1", j="1", info_format="text/plain"
        ))
        assert raw == b"value: 1.0\n"

    def test_nodata_is_null(self):
        import json

        source = MemorySource(
            data=[[255.0, 1.0], [2.0, 3.0]], no_data_value=255.0,
            projection="EPSG:3857", pixel_size=1.0, pixel_origin=(0, 2),
        )
        raw = _plugin().render_feature_info(self._params(
            source.to_json(), i="0", j="0",
            bbox="0,0,2,2", width="2", height="2",
        ))
        assert json.loads(raw)["value"] is None

    def test_nan_nodata_is_null(self):
        """NaN sentinels: NaN != NaN is always true, so nodata needs
        isnan-aware equality; the JSON must stay strict (no bare NaN)."""
        import json

        source = MemorySource(
            data=[[float("nan"), 1.0], [2.0, 3.0]],
            no_data_value=float("nan"),
            projection="EPSG:3857", pixel_size=1.0, pixel_origin=(0, 2),
        )
        raw = _plugin().render_feature_info(self._params(
            source.to_json(), i="0", j="0",
            bbox="0,0,2,2", width="2", height="2",
        ))
        payload = json.loads(raw)  # strict parse: bare NaN would fail
        assert payload["value"] is None
        assert b"NaN" not in raw

    def test_pixel_out_of_range_400(self, view_json):
        with pytest.raises(_plugin().WMSError) as err:
            _plugin().render_feature_info(
                self._params(view_json, i="10", j="0")
            )
        assert err.value.status == 400

    def test_missing_pixel_400(self, view_json):
        with pytest.raises(_plugin().WMSError):
            _plugin().render_feature_info(self._params(view_json))

    def test_wms13_axis_flip(self, view_json):
        """Geographic CRS + 1.3: bbox arrives lat/lon ordered."""
        import json

        source = MemorySource(
            data=[[float(i) for i in range(10)] for _ in range(10)],
            no_data_value=255.0, projection="EPSG:4326",
            pixel_size=0.1, pixel_origin=(0, 1),
        )
        raw = _plugin().render_feature_info(self._params(
            source.to_json(), i="3", j="2", version="1.3.0",
            srs=None, crs="EPSG:4326", bbox="0,0,1,1",
        ))
        assert json.loads(raw)["value"] == 3.0

    def test_wsgi_route(self, view_json):
        calls = {}

        def start_response(status, headers):
            calls["status"] = status
            calls["headers"] = dict(headers)

        environ = {"QUERY_STRING": urlencode(
            self._params(view_json, i="3", j="2")
        )}
        body = b"".join(_plugin().wms_app(environ, start_response))
        assert calls["status"].startswith("200")
        assert calls["headers"]["Content-Type"] == "application/json"
        import json

        assert json.loads(body)["value"] == 3.0

    def test_capabilities_advertises(self):
        assert "GetFeatureInfo" in _plugin().get_capabilities_xml()


class TestGetLegendGraphic:
    def test_png_strip(self):
        from PIL import Image

        raw = _plugin().render_legend_graphic({"styles": "viridis"})
        with Image.open(BytesIO(raw)) as img:
            assert img.format == "PNG"
            assert img.size == (24, 160)
            arr = np.asarray(img.convert("RGB"))
        # top row = colormap(1.0), bottom row = colormap(0.0)
        assert not (arr[0] == arr[-1]).all()

    def test_unknown_style_400(self):
        with pytest.raises(_plugin().WMSError) as err:
            _plugin().render_legend_graphic({"styles": "not_a_map"})
        assert err.value.status == 400

    def test_wsgi_route(self):
        calls = {}

        def start_response(status, headers):
            calls["status"] = status
            calls["headers"] = dict(headers)

        environ = {"QUERY_STRING": urlencode({
            "request": "GetLegendGraphic", "styles": "magma",
            "width": "16", "height": "64",
        })}
        body = b"".join(_plugin().wms_app(environ, start_response))
        assert calls["status"].startswith("200")
        assert calls["headers"]["Content-Type"] == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    def test_size_guard(self):
        with pytest.raises(_plugin().WMSError):
            _plugin().render_legend_graphic({"width": "100000"})


class TestJsonLayerGating:
    """geomodeling.wms-json-layers: production servers with named layers
    must reject client-constructed views (ADVICE r3: file exfiltration
    through RasterFileSource + GetMap)."""

    def test_json_rejected_when_disabled(self, view_json):
        from dask_geomodeling_tpu import config

        with config.set({"geomodeling.wms-json-layers": False}):
            with pytest.raises(_plugin().WMSError, match="registered layer"):
                _plugin().render_wms_tile(base_params(view_json))

    def test_registered_name_still_works_when_disabled(self, view_json):
        from dask_geomodeling_tpu import config
        from dask_geomodeling_tpu.core import Block

        _plugin().register_layer("gated", Block.from_json(view_json))
        try:
            params = base_params(view_json)
            params["layers"] = "gated"
            with config.set({"geomodeling.wms-json-layers": False}):
                raw = _plugin().render_wms_tile(params)
            assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        finally:
            _plugin().unregister_layers()

    def test_serve_defaults(self, view_json):
        """wms_serve.main: named layers => JSON off; bare server => on."""
        import inspect

        from dask_geomodeling_tpu import wms_serve

        sig = inspect.signature(wms_serve.main)
        assert sig.parameters["allow_json_layers"].default is None
        # the decision rule lives in main() before serve_forever; probe it
        # by replicating: allow = not layers
        src = inspect.getsource(wms_serve.main)
        assert "allow_json_layers = not layers" in src
