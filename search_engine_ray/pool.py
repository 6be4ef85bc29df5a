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
