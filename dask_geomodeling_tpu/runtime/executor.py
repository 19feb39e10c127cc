"""The XLA executor: lower compute graphs to jitted device programs.

Where the reference hands its compute graph to a dask scheduler that runs
each ``process`` as a separate CPU task (reference core/graphs.py:42-49),
this executor *stages* runs of device-capable nodes — process functions
carrying a ``jax_impl`` twin — and compiles each staged run into ONE jitted
XLA program.  XLA then fuses the whole pixel pipeline (e.g. warp-gather →
Add → Classify → Reclassify) into a single pass over HBM, which is the
entire performance story on TPU: these ops are memory-bound, so N fused
ops cost one HBM round trip instead of N.

Execution walks the graph in topological order.  Device nodes accumulate
into a pending program; the program is flushed (compiled + executed) only
when a host node needs one of its results, or at the end.  This staging is
trivially cycle-safe and, because the DFS topo order keeps chains together,
device pipelines fuse maximally in practice.

Host nodes (file reads, geometry algebra, pandas time math) evaluate
eagerly as usual and feed the device programs through ``jax.device_put``.

Compiled programs are cached by a structural signature: the staged process
chain + static literals + input shapes/dtypes.  Re-evaluating the same view
over a different tile of the same shape is a cache hit.
"""
import dataclasses
import logging
import weakref
from collections import defaultdict

import numpy as np

from dask_geomodeling_tpu.core.tokens import tokenize
from dask_geomodeling_tpu.runtime.profile import span as _span

logger = logging.getLogger(__name__)

__all__ = ["compute_jax", "clear_program_cache", "program_cache_info"]

_PROGRAM_CACHE = {}
_CACHE_STATS = {"hits": 0, "misses": 0}
_X64_ENABLED = False


def _ensure_x64():
    """Reference semantics require full int64/float64 support (dtype-max
    sentinels); enable x64 once, lazily, before the first trace."""
    global _X64_ENABLED
    if not _X64_ENABLED:
        import jax

        jax.config.update("jax_enable_x64", True)
        _X64_ENABLED = True
        _setup_compilation_cache()


def _setup_compilation_cache():
    """Point XLA's persistent compilation cache at
    ``geomodeling.compilation-cache`` (a directory path) when configured.
    Compiles over a tunneled TPU take minutes; the on-disk cache makes
    process restarts and repeated benchmarks warm-start."""
    from dask_geomodeling_tpu import config

    cache_dir = config.get("geomodeling.compilation-cache", None)
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        logger.warning("could not enable the persistent compilation cache",
                       exc_info=True)


def clear_program_cache():
    """Drop all compiled programs and reset cache statistics."""
    _PROGRAM_CACHE.clear()
    _CACHE_STATS.update(hits=0, misses=0)


def program_cache_info():
    """{"hits", "misses", "size"} counters of the program cache."""
    return dict(_CACHE_STATS, size=len(_PROGRAM_CACHE))


def _is_task(value):
    return isinstance(value, tuple) and len(value) >= 1 and callable(value[0])


def _is_device_node(value, graph):
    if not (_is_task(value) and hasattr(value[0], "jax_impl")):
        return False
    capable = getattr(value[0], "jax_capable", None)
    if capable is None:
        return True
    # the predicate sees only the literal (non-key) args; key args are
    # replaced by None
    literals = [
        None if (isinstance(arg, str) and arg in graph) else arg
        for arg in value[1:]
    ]
    return bool(capable(*literals))


def _reachable(graph, name):
    """Keys needed for ``name`` plus the key-dependency map."""
    needed = []
    seen = set()
    stack = [name]
    while stack:
        key = stack.pop()
        if key in seen:
            continue
        seen.add(key)
        needed.append(key)
        value = graph[key]
        if _is_task(value):
            for arg in value[1:]:
                if isinstance(arg, str) and arg in graph:
                    stack.append(arg)
    deps = {
        key: [
            arg
            for arg in (graph[key][1:] if _is_task(graph[key]) else ())
            if isinstance(arg, str) and arg in graph
        ]
        for key in needed
    }
    return needed, deps


def _toposort(needed, deps):
    order = []
    state = {}
    for root in needed:
        if state.get(root) == 2:
            continue
        stack = [(root, iter(deps[root]))]
        state[root] = 1
        while stack:
            node, it = stack[-1]
            advanced = False
            for dep in it:
                if state.get(dep) == 1:
                    raise ValueError("Cycle in compute graph")
                if state.get(dep) != 2:
                    state[dep] = 1
                    stack.append((dep, iter(deps[dep])))
                    advanced = True
                    break
            if not advanced:
                state[node] = 2
                order.append(node)
                stack.pop()
    return order


# --- structural splitting of data into (arrays, static skeleton) ---


class _Leaf:
    """Placeholder marking an array position in a static skeleton."""

    __slots__ = ("index",)

    def __init__(self, index):
        self.index = index

    def __token__(self):
        return ("__leaf__", self.index)


def _map_structure(func, obj):
    if isinstance(obj, dict):
        return {k: _map_structure(func, v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_map_structure(func, v) for v in obj)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.replace(
            obj,
            **{
                f.name: _map_structure(func, getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        )
    return func(obj)


def _split_arrays(obj, arrays):
    """Replace ndarrays in a nested structure with _Leaf placeholders."""

    def visit(leaf):
        if isinstance(leaf, np.ndarray) and leaf.ndim > 0:
            arrays.append(leaf)
            return _Leaf(len(arrays) - 1)
        return leaf

    return _map_structure(visit, obj)


def _fill_arrays(obj, arrays):
    def visit(leaf):
        if isinstance(leaf, _Leaf):
            return arrays[leaf.index]
        return leaf

    return _map_structure(visit, obj)


def _to_numpy(obj):
    import jax

    def visit(leaf):
        if isinstance(leaf, jax.Array):
            return np.asarray(leaf)
        return leaf

    return _map_structure(visit, obj)


def _literal_token(obj):
    try:
        return tokenize(obj)
    except Exception:
        return repr(obj)


def execution_config_token():
    """Token over config values that are baked into traced programs."""
    from dask_geomodeling_tpu.config import config

    return tokenize(
        config.get("geomodeling.warp-approx-stride", 8),
        config.get("geomodeling.warp-interpolation", "nearest"),
        config.get("geomodeling.pallas-smooth", True),
        config.get("geomodeling.pallas-stencils", True),
        config.get("geomodeling.fetch-pack", True),
        config.get("geomodeling.source-alphabet-max", 4096),
        config.get("geomodeling.source-alphabet-scan-px", 64 * 1024**2),
        # overview reads change which PIXELS a file source serves, which
        # the data-dependent alphabet (hence the packed codec) reflects
        config.get("geomodeling.use-overviews", False),
        config.get("geomodeling.mesh-shape", None),
        config.get("geomodeling.warp-gather", "auto"),
        config.get("geomodeling.warp-host-grid", True),
        # traced CRS math reads registered datum grids
        sorted((config.get("geomodeling.ntv2-grids", None) or {}).items()),
    )


def _dynamicize(arg, dynamic):
    """Convert literal values named in ``dynamic`` (the process function's
    ``jax_dynamic`` attribute) into float64 arrays, so they become *traced
    inputs* of the staged program instead of baked constants.  This is what
    makes one compiled program serve many requests: the bbox varies per
    tile, elementwise constants vary per view, the program does not.

    ``dynamic`` entries name dict keys; the special entry "__scalars__"
    additionally converts bare numeric positional literals.
    """
    if not dynamic:
        return arg
    if (
        "__scalars__" in dynamic
        and isinstance(arg, (int, float))
        and not isinstance(arg, bool)
    ):
        return np.full((1,), arg, dtype=np.float64)
    if not isinstance(arg, dict):
        return arg
    out = dict(arg)
    for key in dynamic:
        value = out.get(key)
        if isinstance(value, (int, float, tuple, list)) and not isinstance(
            value, bool
        ):
            try:
                out[key] = np.asarray(value, dtype=np.float64)
            except (TypeError, ValueError):
                pass
    return out


_BACKEND_NAME = []  # cached jax.default_backend() (initializes jax lazily)


def _f64_discrete_guarded():
    """True when float64 discrete ops must stay off the device: the
    default on real chips (XLA:TPU f64 emulation carries ~1e-14 relative
    error, enough to flip a Classify cell at a bin edge — PARITY.md
    numeric parity note), opted out via ``geomodeling.device-f64-discrete``.
    CPU backends compute f64 natively and are never guarded."""
    from dask_geomodeling_tpu import config

    if config.get("geomodeling.device-f64-discrete", False):
        return False
    if not _BACKEND_NAME:
        import jax

        _BACKEND_NAME.append(jax.default_backend())
    return _BACKEND_NAME[0] != "cpu"


def view_has_f64_discrete(view):
    """Does any discrete-output block in the view tree (process marked
    ``jax_f64_sensitive``) consume a float64 raster?"""
    from dask_geomodeling_tpu.core.graphs import Block

    seen = set()
    stack = [view]
    while stack:
        block = stack.pop()
        if id(block) in seen:
            continue
        seen.add(id(block))
        sensitive = getattr(
            getattr(block, "process", None), "jax_f64_sensitive", False
        )
        for child in getattr(block, "args", ()):
            if not isinstance(child, Block):
                continue
            stack.append(child)
            if sensitive:
                try:
                    if np.dtype(child.dtype) == np.float64:
                        return True
                except (TypeError, AttributeError):
                    pass
    return False


_EAGER = object()  # cache marker: this program shape evaluates host-side

_DEVICE_ARRAY_CACHE = {}


def _device_put_cached(arr, sharding=None):
    """jax.device_put with an id-keyed cache so large source arrays are
    transferred to HBM once and stay device-resident across tiles.

    ``sharding`` (a jax.sharding.Sharding) places the array on a device
    mesh instead of the default device; it participates in the cache key
    so replicated copies stay resident per mesh.

    Cached residency is bounded by ``geomodeling.hbm-budget``: when a new
    payload would exceed the budget, the least-recently-used entries are
    dropped from this cache.  Dropping only releases OUR reference — jax
    keeps the underlying device buffer alive until every in-flight
    computation using it completes, so eviction can never invalidate a
    pending result; it just allows the memory to be reclaimed later."""
    import jax

    from dask_geomodeling_tpu import config

    key = (id(arr), None if sharding is None else tokenize(repr(sharding)))
    entry = _DEVICE_ARRAY_CACHE.get(key)
    if entry is not None and entry[0]() is arr:
        _DEVICE_ARRAY_CACHE[key] = _DEVICE_ARRAY_CACHE.pop(key)  # LRU bump
        return entry[1]
    nbytes = getattr(arr, "nbytes", 0)
    budget = config.get("geomodeling.hbm-budget", None)
    if budget:
        resident = sum(e[2] for e in _DEVICE_ARRAY_CACHE.values())
        for old_key in list(_DEVICE_ARRAY_CACHE):
            if resident + nbytes <= budget:
                break
            resident -= _DEVICE_ARRAY_CACHE.pop(old_key)[2]
    if sharding is None:
        dev = jax.device_put(arr)
    else:
        dev = jax.device_put(arr, sharding)
    if budget and nbytes > budget:
        return dev  # larger than the whole budget: never cache
    try:
        ref = weakref.ref(arr, lambda _ref: _DEVICE_ARRAY_CACHE.pop(key, None))
    except TypeError:
        return dev  # not weakref-able; skip caching
    _DEVICE_ARRAY_CACHE[key] = (ref, dev, nbytes)
    return dev


class _StagedProgram:
    """A run of device nodes compiled into one jitted XLA program.

    Arrays found in the staged nodes' *literal* args (e.g. a source block's
    pixel payload inside its process_kwargs) become traced program inputs
    just like upstream node results — they go through the device transfer
    cache, and the compiled program is content-independent.
    """

    def __init__(self, keys, graph, deps, name, consumers):
        self.keys = keys
        key_set = set(keys)
        self.input_keys = []
        for key in keys:
            for dep in deps[key]:
                if dep not in key_set and dep not in self.input_keys:
                    self.input_keys.append(dep)
        self.output_keys = [
            key
            for key in keys
            if key == name or any(c not in key_set for c in consumers[key])
        ]
        # outputs whose every consumer is a host node that opts into
        # device arrays (process.jax_accepts_device_arrays, e.g. the
        # zonal statistics aggregator) skip the device->host fetch — the
        # consumer's own device work reads them in place
        self.device_output_keys = set()
        for key in self.output_keys:
            if key == name:
                continue
            external = [c for c in consumers[key] if c not in key_set]
            if external and all(
                _is_task(graph[c])
                and not _is_device_node(graph[c], graph)
                and getattr(
                    graph[c][0], "jax_accepts_device_arrays", False
                )
                for c in external
            ):
                self.device_output_keys.add(key)
        self.graph = graph
        self.deps = deps
        # any staged node whose discrete output can flip under emulated
        # f64 (Classify bin edges, comparisons): checked against the
        # concrete input dtypes per run, see _f64_discrete_guarded
        self.f64_sensitive = any(
            getattr(graph[key][0], "jax_f64_sensitive", False)
            for key in keys
        )

    def _split_with_offset(self, obj, all_arrays):
        offset = len(all_arrays)
        arrays = []
        skel = _split_arrays(obj, arrays)

        def shift(leaf):
            if isinstance(leaf, _Leaf):
                return _Leaf(leaf.index + offset)
            return leaf

        all_arrays.extend(arrays)
        return _map_structure(shift, skel)

    def signature(self, input_skeletons, literal_skeletons, input_shapes):
        local_index = {key: i for i, key in enumerate(self.keys)}
        input_index = {key: i for i, key in enumerate(self.input_keys)}
        parts = []
        for key in self.keys:
            value = self.graph[key]
            func = value[0]
            arg_sig = []
            for pos, arg in enumerate(value[1:]):
                if isinstance(arg, str) and arg in self.graph:
                    if arg in local_index:
                        arg_sig.append(("n", local_index[arg]))
                    else:
                        arg_sig.append(("i", input_index[arg]))
                else:
                    arg_sig.append(
                        ("l", _literal_token(literal_skeletons[key][pos]))
                    )
            parts.append(
                (
                    getattr(func, "__module__", "?"),
                    getattr(func, "__qualname__", getattr(func, "__name__", "?")),
                    tuple(arg_sig),
                )
            )
        out_sig = [local_index[k] for k in self.output_keys]
        skel_sig = [_literal_token(input_skeletons[k]) for k in self.input_keys]
        return tokenize(
            parts, out_sig, skel_sig, input_shapes, execution_config_token()
        )

    def run(self, cache):
        all_arrays = []

        # split upstream results into arrays (traced) + static skeletons
        input_skeletons = {
            ik: self._split_with_offset(cache[ik], all_arrays)
            for ik in self.input_keys
        }
        # split literal args the same way: source payloads become inputs
        literal_skeletons = {}
        for key in self.keys:
            value = self.graph[key]
            dynamic = getattr(value[0], "jax_dynamic", None)
            literal_skeletons[key] = {
                pos: self._split_with_offset(
                    _dynamicize(arg, dynamic), all_arrays
                )
                for pos, arg in enumerate(value[1:])
                if not (isinstance(arg, str) and arg in self.graph)
            }

        if not all_arrays:
            # no array payload (time/meta requests, empty results): the
            # jax_impls run host-side; outputs are static structures that
            # cannot be jit outputs anyway
            self._run_eager(cache)
            return

        if (
            self.f64_sensitive
            # raster payloads only (ndim >= 2): _dynamicize ships scalar
            # constants and bboxes as float64 1-D arrays by design
            and any(
                a.ndim >= 2 and a.dtype == np.float64 for a in all_arrays
            )
            and _f64_discrete_guarded()
        ):
            # float64 feeding a discrete op on a real chip: bin edges /
            # comparison thresholds can flip under emulated f64, so the
            # (bit-exact, semantically identical) host path serves this
            # run.  Data-dependent, so nothing is cached as _EAGER.
            self._run_eager(cache)
            return

        input_shapes = tuple((a.shape, str(a.dtype)) for a in all_arrays)
        sig = self.signature(input_skeletons, literal_skeletons, input_shapes)

        compiled = _PROGRAM_CACHE.get(sig)
        if compiled is _EAGER:
            _CACHE_STATS["hits"] += 1
            self._run_eager(cache)
            return
        if compiled is None:
            _CACHE_STATS["misses"] += 1
            try:
                with _span("stage[%d nodes]" % len(self.keys), "compile"):
                    # trace + compile EAGERLY (jax.jit alone is lazy): a
                    # deterministic trace/lower failure must be discovered
                    # here, remembered as _EAGER, and never retried — on a
                    # tunneled TPU each retry would repay a minutes-long
                    # compile before falling back
                    compiled = self._compile(
                        input_skeletons, literal_skeletons, all_arrays
                    )
            except TypeError:
                # usually static (non-array) outputs — a time/meta
                # structure passing through impls cannot leave a jitted
                # function; a tracing bug in an impl lands here too
                logger.debug(
                    "staged program %s is not jittable (static outputs "
                    "or a tracing TypeError); evaluating host-side",
                    sig,
                    exc_info=True,
                )
                _PROGRAM_CACHE[sig] = _EAGER
                self._run_eager(cache)
                return
            except Exception:
                # other trace/compile failure (an impl that can't lower, a
                # compiler bug): the host path has identical semantics, so
                # degrade gracefully and remember
                logger.warning(
                    "device compile failed for staged program %s; "
                    "falling back to the host path",
                    sig,
                    exc_info=True,
                )
                _PROGRAM_CACHE[sig] = _EAGER
                self._run_eager(cache)
                return
            _PROGRAM_CACHE[sig] = compiled
        else:
            _CACHE_STATS["hits"] += 1

        with _span("device_put[%d]" % len(all_arrays), "transfer"):
            device_arrays = [_device_put_cached(a) for a in all_arrays]
        try:
            with _span("stage[%d nodes]" % len(self.keys), "device"):
                outputs = compiled(*device_arrays)
        except Exception:
            # runtime device failure (OOM, transfer error): serve this
            # request from the host path; keep the program cached so the
            # device is retried on the next request
            logger.warning(
                "device execution failed for staged program %s; "
                "serving this request from the host path",
                sig,
                exc_info=True,
            )
            self._run_eager(cache)
            return
        with _span("fetch[%d outputs]" % len(self.output_keys), "transfer"):
            for key, out in zip(self.output_keys, outputs):
                cache[key] = (
                    out if key in self.device_output_keys else _to_numpy(out)
                )

    def _run_eager(self, cache):
        """Evaluate the staged nodes host-side with the original process
        functions (identical semantics, no tracing)."""
        graph = self.graph
        values = {}
        for key in self.keys:
            value = graph[key]
            args = [
                values.get(arg, cache.get(arg))
                if isinstance(arg, str) and arg in graph
                else arg
                for arg in value[1:]
            ]
            values[key] = value[0](*args)
        for key in self.output_keys:
            cache[key] = values[key]

    def _compile(self, input_skeletons, literal_skeletons, all_arrays):
        """AOT trace + compile for the concrete input shapes, so failures
        surface (and are remembered) at compile time, once."""
        import jax

        runner = jax.jit(self.build_runner(input_skeletons, literal_skeletons))
        return runner.lower(*all_arrays).compile()

    def build_runner(self, input_skeletons, literal_skeletons):
        """The raw (unjitted) replay function over flat array inputs."""
        graph = self.graph
        local = [(key, graph[key][0].jax_impl, graph[key][1:]) for key in self.keys]
        output_keys = self.output_keys

        def run(*arrays):
            values = {
                key: _fill_arrays(skel, arrays)
                for key, skel in input_skeletons.items()
            }
            for key, impl, raw_args in local:
                call_args = []
                for pos, arg in enumerate(raw_args):
                    if isinstance(arg, str) and arg in graph:
                        call_args.append(values[arg])
                    else:
                        call_args.append(
                            _fill_arrays(literal_skeletons[key][pos], arrays)
                        )
                values[key] = impl(*call_args)
            return tuple(values[k] for k in output_keys)

        return run


def compute_jax(graph, name):
    """Evaluate a compute graph, lowering device-node runs to XLA."""
    _ensure_x64()
    needed, deps = _reachable(graph, name)
    order = _toposort(needed, deps)

    consumers = defaultdict(set)
    for key in order:
        for dep in deps[key]:
            consumers[dep].add(key)

    cache = {}
    pending = []
    pending_set = set()
    # release intermediates after their LAST consumer: a deep pipeline
    # over large tiles must hold the live set, not every node's result
    remaining = {key: len(consumers[key]) for key in order}

    def release(consumed_key):
        for dep in deps[consumed_key]:
            remaining[dep] -= 1
            if remaining[dep] == 0 and dep != name:
                cache.pop(dep, None)

    def flush():
        if not pending:
            return
        program = _StagedProgram(list(pending), graph, deps, name, consumers)
        keys = list(pending)
        pending.clear()
        pending_set.clear()
        program.run(cache)
        for key in keys:
            release(key)

    for key in order:
        value = graph[key]
        if _is_device_node(value, graph):
            pending.append(key)
            pending_set.add(key)
            continue
        if any(dep in pending_set for dep in deps[key]):
            flush()
        if _is_task(value):
            func = value[0]
            args = [
                cache[arg] if isinstance(arg, str) and arg in graph else arg
                for arg in value[1:]
            ]
            cache[key] = func(*args)
            release(key)
        else:
            cache[key] = value

    flush()
    return cache[name]
