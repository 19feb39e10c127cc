"""Batched tile evaluation: the high-throughput request path.

A big vals request is normalized onto a grid of fixed-size tiles.  When the
whole view lowers to a single device program (sources + pixel pipeline, the
common case), the per-tile program is ``vmap``-ed over the tile axis and
dispatched in batches: B tiles = ONE device call and ONE result fetch.

This amortizes dispatch latency and host↔device transfer overhead — on
tunneled TPUs (~25 ms/dispatch) this is the difference between
latency-bound and bandwidth-bound throughput.  Inputs shared by all tiles
(the source payload) stay device-resident; per-tile inputs (the traced
bbox) are stacked into a (B, ...) array.

Falls back to per-tile ``get_data`` when the view contains host-side nodes.
"""
import logging
import time

import numpy as np

from dask_geomodeling_tpu.runtime import executor as _ex

logger = logging.getLogger(__name__)

__all__ = ["evaluate_tiled", "TileProgram"]


class NotLowerable(Exception):
    """The view does not reduce to a single device program."""


def _tile_batch_mesh(batch_size):
    """A 1-D data-parallel mesh over all devices for tile-batch sharding,
    or None when disabled (no ``geomodeling.mesh-shape``), single-device,
    or the batch does not divide evenly."""
    from dask_geomodeling_tpu import config

    if config.get("geomodeling.mesh-shape", None) is None:
        return None
    import jax

    n_devices = len(jax.devices())
    if n_devices <= 1 or batch_size % n_devices:
        return None
    return _get_dp_mesh(n_devices)


def _get_dp_mesh(n_devices):
    mesh = _DP_MESH_CACHE.get(n_devices)
    if mesh is None:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("dp",))
        _DP_MESH_CACHE[n_devices] = mesh
    return mesh


_DP_MESH_CACHE = {}


_TILE_PROGRAM_CACHE = {}


def _get_tile_program(view, template_request):
    """TilePrograms cached by (view token, static request shape) — a fresh
    instance would mean a fresh jit trace and compile."""
    from dask_geomodeling_tpu.core.tokens import tokenize

    static = {k: v for k, v in template_request.items() if k != "bbox"}
    key = (view.token, tokenize(static, _ex.execution_config_token()))
    program = _TILE_PROGRAM_CACHE.get(key)
    if program is None:
        program = TileProgram(view, template_request)
        _TILE_PROGRAM_CACHE[key] = program
    return program


class TileProgram:
    """A vmapped, jitted per-tile program for one view + tile shape."""

    def __init__(self, view, template_request):
        _ex._ensure_x64()
        graph, name = view.get_compute_graph(**template_request)
        needed, deps = _ex._reachable(graph, name)
        order = _ex._toposort(needed, deps)
        for key in order:
            if not _ex._is_device_node(graph[key], graph):
                raise NotLowerable(
                    "node %s is not device-capable" % key.split("_")[0]
                )
        consumers = {key: set() for key in order}
        for key in order:
            for dep in deps[key]:
                consumers[dep].add(key)
        self._program = _ex._StagedProgram(order, graph, deps, name, consumers)
        self._name = name
        self._compiled = None
        self._in_axes = None
        self._shared = None

    def _tile_inputs(self, view, request):
        """The flat input array list the staged program would receive."""
        graph, name = view.get_compute_graph(**request)
        needed, deps = _ex._reachable(graph, name)
        order = _ex._toposort(needed, deps)
        all_arrays = []
        program = self._program
        literal_skeletons = {}
        for key, tkey in zip(program.keys, order):
            value = graph[tkey]
            dynamic = getattr(value[0], "jax_dynamic", None)
            literal_skeletons[key] = {
                pos: program._split_with_offset(
                    _ex._dynamicize(arg, dynamic), all_arrays
                )
                for pos, arg in enumerate(value[1:])
                if not (isinstance(arg, str) and arg in graph)
            }
        return all_arrays, literal_skeletons

    def compile(self, view, requests):
        """Trace + jit the vmapped program using the first two requests to
        discover which inputs vary per tile."""
        import jax

        arrays_0, literal_skeletons = self._tile_inputs(view, requests[0])
        arrays_1, _ = self._tile_inputs(view, requests[min(1, len(requests) - 1)])

        self._in_axes = []
        self._shared = []
        for a0, a1 in zip(arrays_0, arrays_1):
            varies = a0.shape != a1.shape or not np.array_equal(a0, a1)
            self._in_axes.append(0 if varies else None)
            self._shared.append(None if varies else a0)

        inner = self._program.build_runner({}, literal_skeletons)

        def one_tile(*arrays):
            outputs = inner(*arrays)
            return outputs[-1]["values"]  # the root node's pixel payload

        if any(axis == 0 for axis in self._in_axes):
            self._compiled = jax.jit(jax.vmap(one_tile, in_axes=self._in_axes))
        else:
            # single-tile degenerate case: emulate the batch axis
            import jax.numpy as jnp

            self._compiled = jax.jit(lambda *a: jnp.stack([one_tile(*a)]))
        return arrays_0

    def stage_batch(self, view, requests):
        """Host-side staging for one batch: the stacked per-tile input
        arrays (pure CPU work — safe to run on a prefetch thread)."""
        if self._compiled is None:
            self.compile(view, requests)
        per_tile_arrays = [self._tile_inputs(view, r)[0] for r in requests]
        return [
            None
            if axis is None
            else np.stack([arrays[pos] for arrays in per_tile_arrays])
            for pos, axis in enumerate(self._in_axes)
        ]

    def dispatch_staged(self, staged, batch_size):
        """Transfer a staged batch and launch the program (async)."""
        import jax

        mesh = _tile_batch_mesh(batch_size)
        batch_sharding = shared_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            batch_sharding = NamedSharding(mesh, PartitionSpec("dp"))
            shared_sharding = NamedSharding(mesh, PartitionSpec())

        call_args = []
        for pos, stacked in enumerate(staged):
            if stacked is None:
                call_args.append(
                    _ex._device_put_cached(self._shared[pos], shared_sharding)
                )
            elif batch_sharding is not None:
                call_args.append(jax.device_put(stacked, batch_sharding))
            else:
                call_args.append(jax.device_put(stacked))
        return self._compiled(*call_args)

    def dispatch_batch(self, view, requests):
        """Dispatch a batch of tile requests; returns the (async) device
        result of shape (B, bands, h, w).

        With ``geomodeling.mesh-shape`` set and multiple devices present,
        the batch axis is sharded over a data-parallel device mesh: shared
        inputs replicate (cached per mesh), per-tile inputs split over dp,
        and XLA partitions the vmapped program across the chips."""
        return self.dispatch_staged(
            self.stage_batch(view, requests), len(requests)
        )

    def run_batch(self, view, requests):
        """Evaluate a batch of tile requests; returns (B, bands, h, w)."""
        return np.asarray(self.dispatch_batch(view, requests))


def evaluate_tiled(view, request, tile_size=512, batch=32):
    """Evaluate a big vals request as batched fixed-size tiles.

    The request's width and height must be multiples of ``tile_size``.
    Returns the assembled {"values", "no_data_value"} dict.
    """
    width, height = request["width"], request["height"]
    if width % tile_size or height % tile_size:
        raise ValueError("width/height must be multiples of tile_size")
    x1, y1, x2, y2 = request["bbox"]
    nx, ny = width // tile_size, height // tile_size
    dx, dy = (x2 - x1) / nx, (y2 - y1) / ny

    requests = []
    for j in range(ny):
        for i in range(nx):
            requests.append(
                dict(
                    request,
                    bbox=(
                        x1 + i * dx,
                        y1 + j * dy,
                        x1 + (i + 1) * dx,
                        y1 + (j + 1) * dy,
                    ),
                    width=tile_size,
                    height=tile_size,
                )
            )

    program = _get_tile_program(view, requests[0])

    # phase 1: dispatch every batch (device work proceeds asynchronously);
    # the final partial batch is padded to the full batch size so it reuses
    # the same compiled program, and the padding is dropped on assembly
    from dask_geomodeling_tpu.runtime import profile as _profile
    from dask_geomodeling_tpu.runtime.profile import span as _span

    _profile.announce_total(-(-len(requests) // batch))
    t_dispatch = time.perf_counter()
    chunks = []
    for lo in range(0, len(requests), batch):
        chunk = requests[lo : lo + batch]
        if lo and len(chunk) < batch:
            chunk = chunk + [chunk[-1]] * (batch - len(chunk))
        chunks.append((lo, chunk))

    # optionally stage batch k+1 on a prefetch thread while batch k
    # transfers and computes (double buffering; opt-in, see config)
    from dask_geomodeling_tpu import config as _config

    prefetch = _config.get("geomodeling.tile-prefetch", False)
    pending = []
    with _span("dispatch[%d tiles]" % len(requests), "tiles"):
        if prefetch:
            from dask_geomodeling_tpu.runtime.pipeline import TilePrefetcher

            # compile once up front so workers never race the jit trace
            if program._compiled is None:
                program.compile(view, chunks[0][1])
            with TilePrefetcher() as prefetcher:
                futures = prefetcher.map(
                    lambda item: program.stage_batch(view, item[1]), chunks
                )
                for (lo, chunk), future in zip(chunks, futures):
                    pending.append(
                        (lo, program.dispatch_staged(future.result(), len(chunk)))
                    )
        else:
            for lo, chunk in chunks:
                pending.append((lo, program.dispatch_batch(view, chunk)))
    t_fetch = time.perf_counter()

    # phase 2: fetch + assemble (fetches overlap the remaining device work).
    # The padded final batch is sliced ON DEVICE to the valid tiles first,
    # so padding never crosses the (bandwidth-bound) device->host link; then
    # every copy starts before blocking on the first one so the transport
    # can pipeline transfers
    pending = [
        (lo, device_result[: len(requests) - lo])
        if lo + batch > len(requests)
        else (lo, device_result)
        for lo, device_result in pending
    ]
    for _, device_result in pending:
        copy_async = getattr(device_result, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
    out = None
    no_data_value = view.fillvalue
    with _span("fetch+assemble[%d tiles]" % len(requests), "tiles"):
        for lo, device_result in pending:
            t_batch = time.perf_counter()
            result = np.asarray(device_result)
            _profile.record(
                "tile_batch", "tiles", time.perf_counter() - t_batch, t_batch
            )
            if out is None:
                bands = result.shape[1]
                out = np.empty((bands, height, width), result.dtype)
            for offset, tile_result in enumerate(result):
                idx = lo + offset
                if idx >= len(requests):
                    break  # padding of the final batch
                j, i = divmod(idx, nx)
                # world y increases upward; array rows run downward
                row0 = height - (j + 1) * tile_size
                col0 = i * tile_size
                out[
                    :, row0 : row0 + tile_size, col0 : col0 + tile_size
                ] = tile_result
    if logger.isEnabledFor(logging.DEBUG):
        t_end = time.perf_counter()
        logger.debug(
            "evaluate_tiled: %d tiles, staging+dispatch %.3fs, "
            "fetch+assemble %.3fs (%s)",
            len(requests),
            t_fetch - t_dispatch,
            t_end - t_fetch,
            _ex.program_cache_info(),
        )
    return {"values": out, "no_data_value": no_data_value}
