"""One-call runtime observability: every counter the framework keeps,
in one JSON-serializable snapshot.

The reference relies on dask's dashboard for this role (SURVEY §5
"Tracing / profiling" — delegated to dask externally).  Here the
runtime spans several subsystems with their own counters — the auto
router, the cross-request result cache, the tile runtime's gather
modes, the staged executor's program cache — and production services
want them in one place:

- :func:`snapshot` — a plain dict (safe for ``json.dumps``)
- the hostpool dashboard (parallel/hostpool.py ``/status.json``) serves
  worker/task counters for the multi-machine plane; this module covers
  the in-process device plane
"""

__all__ = ["snapshot"]


def snapshot():
    """All runtime counters as one JSON-serializable dict."""
    from dask_geomodeling_tpu.runtime import results, router, tiles

    routes = router.stats()
    out = {
        "router": {
            "routes": len(routes),
            "jax_routes": sum(
                1 for s in routes.values() if s.get("jax") is not None
            ),
            "host_only": sum(
                1 for s in routes.values() if s.get("host_only")
            ),
        },
        "result_cache": results.stats(),
        "gather": tiles.gather_stats(),
    }
    from dask_geomodeling_tpu.runtime.executor import program_cache_info

    out["program_cache"] = program_cache_info()
    out["tile_programs"] = len(tiles._TILE_PROGRAM_CACHE)
    return out
