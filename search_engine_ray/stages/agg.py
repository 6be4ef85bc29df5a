"""High-cardinality groupby support: the coarse-bucket aggregate pattern.

Ray Data's built-in ``groupby(keys).aggregate(...)`` / ``map_groups`` pay a
per-GROUP Python cost, which collapses at high key cardinality (100k+ groups
-> tens of seconds for a 100k-row table). The scalable pattern used across
this repo:

1. ``map_batches``: add ``_agg_bucket = hash(keys) % B`` (vectorized),
   with B ~ a few times the cluster cores — the SHUFFLE key is the coarse
   bucket, so the all-to-all exchange moves each row once into one of B
   partitions regardless of group count;
2. ``groupby(_agg_bucket).map_groups``: ONE Python call per bucket, inside
   which a vectorized pandas ``groupby`` handles the (cardinality / B)
   groups in C.

Correctness: rows of one logical group always share a bucket, so per-bucket
aggregation is exact (same contract as a hash shuffle on the full key).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd


def auto_num_buckets(input_bytes: int | None, floor: int = 64,
                     target_bucket_bytes: int = 256 << 20,
                     cap: int = 65536,
                     min_bucket_bytes: int = 256 << 10) -> int:
    """Size the coarse-bucket count from the INPUT volume so one bucket's
    ``map_groups`` task stays memory-bounded at any scale.

    The exchange is exact for ANY bucket count (rows of a logical group
    always share a bucket), so B is purely a resource knob with two
    constraints: B >= a few times the cluster cores (parallelism — the
    ``floor``), and bytes/B <= a worker-heap-friendly slab (the
    ``target_bucket_bytes``; pandas inside the bucket kernel roughly
    doubles it). The r1-r4 fixed default of 64 satisfies the first but
    silently violates the second past ~16 GB of input: at 100 TB one
    bucket would be ~1.5 TB in a single task. ``cap`` bounds scheduler
    pressure; past cap * target (~16 TB per exchange) raise the target
    instead — bucket kernels are streaming-friendly at 1-4 GB slabs.

    ``input_bytes`` None (unknown) keeps the floor — callers that cannot
    cheaply know their volume behave exactly as before.

    TINY inputs scale the floor DOWN (never below 8): a bucket holding
    under ``min_bucket_bytes`` of input is pure task-scheduling overhead
    — measured on the sf0.1 bench, a 64-bucket exchange over a ~600 KB
    table spends ~2 s in the Sort operator scheduling ten-row SortMap /
    map_groups tasks, while the same exchange at 8 buckets is ~0.3 s.
    At real volume the floor is untouched (16 MB of input already
    restores the full 64)."""
    import math

    if not input_bytes or input_bytes <= 0:
        return floor
    floor = min(floor, max(8, math.ceil(input_bytes / min_bucket_bytes)))
    return int(min(cap, max(floor,
                            math.ceil(input_bytes / target_bucket_bytes))))


def parquet_input_bytes(path) -> int | None:
    """Total on-disk bytes of a parquet file / directory / list of either —
    an O(#files) ``os.stat`` walk, free relative to any job that reads
    them. The CLI uses this to feed ``auto_num_buckets`` (compressed
    parquet under-counts in-memory size ~2-4x, which the 256 MB default
    target absorbs)."""
    import os

    paths = path if isinstance(path, (list, tuple)) else [path]
    total = 0
    try:
        for p in paths:
            if os.path.isdir(p):
                for dirpath, _dirs, files in os.walk(p):
                    total += sum(
                        os.path.getsize(os.path.join(dirpath, f))
                        for f in files if f.endswith(".parquet"))
            elif os.path.exists(p):
                total += os.path.getsize(p)
    except OSError:
        return None
    return total or None


def dataset_input_bytes(ds) -> int | None:
    """On-disk bytes of a Dataset's source files via its (lazy, free)
    ``input_files()`` lineage. Returns None for mid-pipeline datasets
    whose lineage no longer names files — auto-sizing then falls back to
    the floor, i.e. the historical fixed default."""
    try:
        files = ds.input_files()
    except Exception:  # noqa: BLE001 — non-read datasets vary by version
        return None
    if not files:
        return None
    return parquet_input_bytes(list(files))


def resolve_num_buckets(num_buckets, ds) -> int:
    """The one resolution rule for every bucketed exchange: an explicit
    caller value wins; ``None`` auto-sizes from the input volume (floor
    64 keeps every small-scale pipeline byte-for-byte on its historical
    plan). Library entry points call this ONCE on the raw input dataset
    — downstream stages have no file lineage to size from."""
    if num_buckets is not None:
        return int(num_buckets)
    return auto_num_buckets(dataset_input_bytes(ds))


def _bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        col = df[k]
        if col.dtype.kind in "iu":
            hk = col.to_numpy().astype(np.uint64, copy=False)
        else:
            hk = pd.util.hash_pandas_object(col, index=False).to_numpy()
        h = h * np.uint64(1_000_003) + hk
    return (h % np.uint64(num_buckets)).astype(np.int32)


def bucketed_group_agg(
    ds,
    keys: list[str],
    per_bucket: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = 64,
):
    """Group ``ds`` by ``keys`` at any cardinality: shuffle on a coarse
    bucket, run ``per_bucket`` (a vectorized pandas aggregation over the
    bucket's rows, grouped by ``keys``) once per bucket.

    ``num_buckets=None`` auto-sizes from the dataset's file lineage
    (``resolve_num_buckets``) — corpus-moving entry points resolve it
    against their RAW input instead, where lineage is still visible."""
    num_buckets = resolve_num_buckets(num_buckets, ds)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_agg_bucket"] = _bucket_of(df, keys, num_buckets)
        return df

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return per_bucket(g.drop(columns=["_agg_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_agg_bucket")
        .map_groups(run_bucket, batch_format="pandas")
    )


def partial_group_agg(
    ds,
    keys: list[str],
    per_batch_partial: Callable[[pd.DataFrame], pd.DataFrame],
    per_bucket_combine: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = 64,
):
    """Two-phase aggregate for DECOMPOSABLE aggregations (sum / count /
    min / max / mergeable sketches): ``per_batch_partial`` collapses each
    map batch to one row per key MAP-SIDE, so the bucketed exchange moves
    only |keys|-bounded partials instead of every input row, then
    ``per_bucket_combine`` merges partials per bucket.

    This is the combiner pattern the 100 TB story needs on low-cardinality
    rollups: ``bucketed_group_agg`` over raw rows shuffles the whole
    joined fact table; this shuffles at most n_blocks x |key domain|
    partial rows. Non-decomposable aggregations (median, distinct-count
    without a sketch) must stay on ``bucketed_group_agg``."""
    partials = ds.map_batches(per_batch_partial, batch_format="pandas")
    return bucketed_group_agg(partials, keys, per_bucket_combine,
                              num_buckets)


def bucketed_distinct(ds, keys: list[str], num_buckets: int | None = 64):
    """DISTINCT over ``keys`` at any cardinality (same pattern)."""
    return bucketed_group_agg(
        ds, keys,
        lambda g: g.drop_duplicates(keys)[keys].sort_values(keys),
        num_buckets,
    )
