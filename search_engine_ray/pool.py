"""Cluster-proportional actor-pool sizing for ``map_batches`` stages.

A hardcoded ``concurrency=(1, 8)`` upper bound starves a 32-cpu node —
and a multi-node cluster catastrophically. Every class-based
``map_batches`` stage sizes its pool with :func:`actor_pool_size` so the
streaming executor can scale the pool to whatever the stage earns under
backpressure, up to the cluster's CPU count.
"""

from __future__ import annotations

import ray


def actor_pool_size(lo: int = 1, floor: int = 8) -> tuple[int, int]:
    """(min, max) actor-pool bounds: max = total cluster CPUs (never
    below ``floor`` so small test sessions still parallelize)."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", floor))
    except Exception:  # graph built before ray.init — stay conservative
        ncpu = floor
    return (lo, max(floor, ncpu))


# Per-WORKER-PROCESS stage-instance cache for ``cached_stage`` (bounded:
# a worker keeps the last few stage instances it has seen; entries are
# per-wrapper tokens, so a new pipeline run never reuses stale state).
_STAGE_CACHE: dict = {}
_STAGE_CACHE_MAX = 8


def cached_stage(cls, *args, **kwargs):
    """A ``map_batches``-compatible FUNCTION that lazily constructs
    ``cls(*args, **kwargs)`` once per worker process and reuses it
    across tasks — the task-based twin of an actor pool, for stages
    whose state is CHEAP to build (a broadcast ref fetch + regex
    compile) but still worth amortizing across batches.

    Why not an actor pool: Ray creates FRESH actor processes per
    ``map_batches(Cls, ...)`` run (python spawn + imports, ~1 s wall on
    the bench shape before the first batch moves), while plain tasks
    ride the already-warm default workers and schedule onto any idle
    CPU. At cluster scale with long-running stages both amortize to
    nothing — actor pools stay the right tool for EXPENSIVE state
    (models, loaded indexes, large dictionaries); this is for the
    broadcast-lookup stages where spawn cost rivals the whole stage.

    Workers run one task at a time per process, so the cached instance
    never sees concurrent calls. The cache is keyed by a per-wrapper
    token: two pipelines never share instances, and re-invoking the
    same entry point builds fresh state (new broadcast refs ride the
    new wrapper)."""
    import uuid

    token = uuid.uuid4().hex

    def fn(batch):
        # resolve the cache via import AT CALL TIME: referencing the
        # module global from this closure would make cloudpickle capture
        # the whole dict BY VALUE, shipping every instance the DRIVER
        # happens to have cached to each worker (bloat, and unpicklable
        # instances poison unrelated stages)
        from search_engine_ray import pool as _pool

        cache = _pool._STAGE_CACHE
        inst = cache.get(token)
        if inst is None:
            if len(cache) >= _pool._STAGE_CACHE_MAX:
                cache.pop(next(iter(cache)))
            inst = cls(*args, **kwargs)
            cache[token] = inst
        return inst(batch)

    fn.__name__ = fn.__qualname__ = f"cached:{cls.__name__}"
    return fn
