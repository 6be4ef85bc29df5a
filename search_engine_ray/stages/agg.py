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
    num_buckets: int = 64,
):
    """Group ``ds`` by ``keys`` at any cardinality: shuffle on a coarse
    bucket, run ``per_bucket`` (a vectorized pandas aggregation over the
    bucket's rows, grouped by ``keys``) once per bucket."""

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


def bucketed_distinct(ds, keys: list[str], num_buckets: int = 64):
    """DISTINCT over ``keys`` at any cardinality (same pattern)."""
    return bucketed_group_agg(
        ds, keys,
        lambda g: g.drop_duplicates(keys)[keys].sort_values(keys),
        num_buckets,
    )
