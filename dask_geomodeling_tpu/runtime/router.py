"""Per-request executor routing for ``geomodeling.executor = "auto"``.

The reference leaves the scheduler choice to a global dask config switch
(reference core/graphs.py:42-49); round 2 of this framework mirrored
that with a global "numpy"/"jax" executor key, which meant a single
untiled request on a cheap view could run slower on device than host
unless the user picked the right switch.  ``auto`` makes the choice
per (view, request-size):

- the first request of a kind runs on the host (safe, warms host-side
  caches, and produces the host-rate measurement),
- the next two eligible requests run on the device — the first device
  run is treated as compile-tainted and only warms the program cache,
  the second produces the device-rate measurement,
- every request after that takes the measured winner.

Requests that are too small to amortize a device dispatch
(``geomodeling.auto-min-device-px``), non-vals requests, and views with
host-only nodes always run on the host.  Rates are exponential moving
averages keyed by (view token, log2 size bucket), so a long-running
process adapts to tunnel weather.
"""
import collections
import math
import threading
import time

__all__ = ["choose", "record", "record_error", "reset", "stats"]

_EMA_ALPHA = 0.4

#: device-run errors tolerated before a key pins to the host path
_MAX_DEVICE_ERRORS = 3

#: routing-table entries kept (LRU); bounds long-running services
_MAX_ROUTES = 4096

_lock = threading.Lock()
#: (view_token, bucket) -> state dict, LRU-ordered
_routes = collections.OrderedDict()


def _key(view, request):
    out_px = int(request.get("width", 0)) * int(request.get("height", 0))
    bucket = int(math.log2(out_px)) if out_px > 0 else 0
    return (view.token, bucket)


def _state(key):
    state = _routes.get(key)
    if state is None:
        state = {
            "numpy": None,  # Mpx/s EMA
            "jax": None,
            "jax_runs": 0,
            "jax_errors": 0,
            "host_only": False,
        }
        _routes[key] = state
        while len(_routes) > _MAX_ROUTES:
            _routes.popitem(last=False)
    else:
        _routes.move_to_end(key)
    return state


def choose(view, request, eligible):
    """Return "numpy" or "jax" for this request.

    ``eligible`` is the caller's static gate (vals mode, size threshold,
    jax executor importable); the router only ever returns "jax" when it
    holds.
    """
    key = _key(view, request)
    with _lock:
        state = _state(key)
        if (
            not eligible
            or state["host_only"]
            or state["jax_errors"] >= _MAX_DEVICE_ERRORS
        ):
            return "numpy"
        if state["numpy"] is None:
            return "numpy"
        if state["jax_runs"] < 2 or state["jax"] is None:
            return "jax"
        # hysteresis toward the host default: the device must win by a
        # clear margin, or close-call noise flip-flops the route onto
        # whichever path happened to spike during exploration
        from dask_geomodeling_tpu.config import config

        margin = config.get("geomodeling.auto-margin", 1.15)
        return "jax" if state["jax"] >= margin * state["numpy"] else "numpy"


def record_error(view, request):
    """Record a device-run failure (compile/tunnel/runtime error): after
    a few of these the key routes to the host unconditionally, so a
    flaky device path cannot hard-fail a view forever."""
    with _lock:
        _state(_key(view, request))["jax_errors"] += 1


def record(view, request, executor, elapsed, failed=False):
    """Record a measured execution (or a device lowering failure)."""
    key = _key(view, request)
    if failed:
        with _lock:
            _state(key)["host_only"] = True
        return
    out_px = int(request.get("width", 0)) * int(request.get("height", 0))
    if out_px <= 0 or elapsed <= 0:
        return
    rate = out_px / 1e6 / elapsed
    with _lock:
        state = _state(key)
        if executor == "jax":
            state["jax_runs"] += 1
            if state["jax_runs"] < 2:
                # first device run pays trace+compile: warm-up only
                return
        old = state[executor]
        state[executor] = (
            rate if old is None else _EMA_ALPHA * rate + (1 - _EMA_ALPHA) * old
        )


class timed_route:
    """Context manager: time a routed execution and record it."""

    def __init__(self, view, request, executor):
        self._view = view
        self._request = request
        self._executor = executor
        self.failed = False

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None and not self.failed:
            # an aborted run measures nothing (its elapsed time is not a
            # throughput); lowering failures set .failed explicitly
            return False
        record(
            self._view,
            self._request,
            self._executor,
            time.perf_counter() - self._t0,
            failed=self.failed,
        )
        return False


def reset():
    """Forget all measurements (tests; config flips)."""
    with _lock:
        _routes.clear()


def stats():
    """A snapshot of the routing table (diagnostics)."""
    with _lock:
        return {k: dict(v) for k, v in _routes.items()}
