"""Distributed joins for Ray Data pipelines.

Ray Data 2.49 has no ``Dataset.join``; these are the two classic
distributed plans, expressed Ray-Data-first:

- ``broadcast_join``: the SMALL side is fetched once per actor via
  ``ray.put`` and merged into every batch map-side — zero shuffle. The
  right plan whenever one side is dimension-table-sized (bounded, not
  proportional to the corpus).
- ``bucketed_hash_join``: both sides shuffle ONCE on a coarse hash
  bucket of the join key (tagged union -> one exchange total), and each
  bucket is joined with a vectorized pandas hash merge. The right plan
  for big-big joins; skewed keys follow the repo's salting guidance
  (stages/agg.py).

The same two tiers back the MinHash verify path (functions/dedup.py
tiers 1-2); this module makes them a first-class reusable operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from search_engine_ray.stages.agg import bucketed_group_agg


def broadcast_join(ds, small: pd.DataFrame, left_on: str, right_on: str,
                   how: str = "inner"):
    """Map-side join of ``ds`` against a bounded ``small`` frame. The
    frame ships to the object store ONCE (``ray.put``); every map task
    reads the same shared copy (zero-copy for numeric blocks) — never
    re-pickled per batch."""
    small_ref = ray.put(small)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(small_ref)
        return df.merge(s, left_on=left_on, right_on=right_on, how=how)

    return ds.map_batches(merge, batch_format="pandas")


def _arrow_fields(ds) -> list[tuple[str, pa.DataType]]:
    s = ds.schema()
    if all(isinstance(t, pa.DataType) for t in s.types):
        return list(zip(s.names, s.types))
    # schema inference can fall back to Python types (e.g. behind an
    # actor-pool stage) — materialize ONE block to get Arrow types
    tbl = ds.limit(1).take_batch(1, batch_format="pyarrow")
    return [(f.name, f.type) for f in tbl.schema]


def bucketed_hash_join(left, right, left_on: str, right_on: str,
                       num_buckets: int | None = None,
                       how: str = "inner"):
    """Distributed hash join of two Datasets on equality of
    ``left_on``/``right_on`` (column names must otherwise be disjoint).

    Plan: pad each side to the UNION schema with typed nulls, tag
    ``_side``, copy its key to ``_jkey``, union the two Datasets, and
    shuffle ONCE on the coarse ``_jkey`` bucket — every key's rows from
    both sides co-locate, and each bucket runs one vectorized
    ``pandas.merge``. INTEGER columns are padded with typed ZEROS, not
    nulls: an Arrow int64 column with any null converts to pandas
    float64 for the whole bucket, silently rounding values above 2^53 —
    this repo's 61-bit doc_ids corrupt. The pad never survives (each
    side re-selects only its own columns), so the zeros are never
    read; non-integer columns still pad with nulls."""
    from search_engine_ray.stages.agg import resolve_num_buckets

    # size the exchange from the LARGE side's lineage (the union moves
    # both sides, but left dominates in every in-repo use)
    num_buckets = resolve_num_buckets(num_buckets, left)
    lf, rf = _arrow_fields(left), _arrow_fields(right)
    lcols = [n for n, _ in lf]
    rcols = [n for n, _ in rf]
    overlap = (set(lcols) & set(rcols)) - {left_on}
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")
    all_fields = lf + [(n, t) for n, t in rf if n not in lcols]
    int_cols = {n for n, t in all_fields
                if pa.types.is_integer(t)}
    int_dtypes = {n: t.to_pandas_dtype() for n, t in all_fields
                  if pa.types.is_integer(t)}

    def pad(side_fields, key, side):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for name, typ in all_fields:
                if name in batch.column_names:
                    col = batch.column(name)
                    if pa.types.is_null(col.type) and not pa.types.is_null(typ):
                        col = col.cast(typ)
                    cols[name] = col
                elif pa.types.is_integer(typ):
                    # zero-pad ints (exactness — see docstring)
                    cols[name] = pa.nulls(n, typ).fill_null(0)
                else:
                    cols[name] = pa.nulls(n, typ)
            cols["_jkey"] = batch.column(key)
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    both = left.map_batches(pad(lf, left_on, 1), batch_format="pyarrow") \
        .union(right.map_batches(pad(rf, right_on, 0),
                                 batch_format="pyarrow"))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g.loc[g["_side"] == 1, lcols].copy()
        rhs = g.loc[g["_side"] == 0, rcols].copy()
        for frame, cols in ((lhs, lcols), (rhs, rcols)):
            for c in cols:
                if c in int_cols and frame[c].dtype.kind == "f" \
                        and not frame[c].isna().any():
                    frame[c] = frame[c].astype(int_dtypes[c])
        out = lhs.merge(rhs, left_on=left_on, right_on=right_on, how=how)
        for c in out.columns:  # pandas re-floats ints on empty merges
            if c in int_cols and out[c].dtype.kind == "f" \
                    and not out[c].isna().any():
                out[c] = out[c].astype(int_dtypes[c])
        return out

    return bucketed_group_agg(both, ["_jkey"], merge_bucket, num_buckets)


def semi_join(left, keys, on: str, keys_on: str | None = None,
              anti: bool = False, num_buckets: int | None = None):
    """Distributed semi/anti join: the rows of ``left`` whose ``on`` key
    is (semi) / is not (``anti=True``) present in the ``keys`` Dataset's
    ``keys_on`` column. Output columns == ``left``'s columns.

    Plan: project ``keys`` to its key column, pad it to ``left``'s
    schema with typed nulls, tag ``_side``, union, and shuffle ONCE on
    the coarse key bucket (the bucketed_hash_join exchange); each bucket
    filters with one vectorized ``np.isin``. Unlike a broadcast keep-set
    this holds NO driver-side key collection — the right plan when the
    key side is O(corpus) (e.g. the token-budget ``mix`` keep stage,
    where kept ids are a constant fraction of the input). For BOUNDED
    key sets (dimension-sized) ``broadcast_join`` / a ``ray.put`` id
    array is still cheaper — no shuffle."""
    from search_engine_ray.stages.agg import resolve_num_buckets

    num_buckets = resolve_num_buckets(num_buckets, left)
    lf = _arrow_fields(left)
    lcols = [n for n, _ in lf]
    key_type = dict(lf)[on]
    int_cols = {n for n, t in lf if pa.types.is_integer(t)}
    int_dtypes = {n: t.to_pandas_dtype() for n, t in lf
                  if pa.types.is_integer(t)}
    kcol = keys_on or on

    def pad_left(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_jkey", batch.column(on)).append_column(
            "_side", pa.array(np.ones(len(batch), dtype=np.int8)))

    def pad_keys(batch: pa.Table) -> pa.Table:
        n = len(batch)
        # zero-pad INTEGER columns: Arrow int64 + any null converts the
        # whole bucket column to pandas float64, silently rounding
        # values above 2^53 (61-bit doc_ids corrupt). The pad rows are
        # _side==0 and never selected into the output.
        cols = {name: (pa.nulls(n, typ).fill_null(0)
                       if pa.types.is_integer(typ) else pa.nulls(n, typ))
                for name, typ in lf}
        cols["_jkey"] = batch.column(kcol).cast(key_type)
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    both = left.map_batches(pad_left, batch_format="pyarrow").union(
        keys.select_columns([kcol]).map_batches(
            pad_keys, batch_format="pyarrow"))

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["_side"] == 1]
        kvals = g.loc[g["_side"] == 0, "_jkey"].to_numpy()
        m = np.isin(lhs["_jkey"].to_numpy(), kvals)
        out = lhs.loc[~m if anti else m, lcols].copy()
        for c in lcols:  # only left columns with GENUINE nulls re-float
            if c in int_cols and out[c].dtype.kind == "f" \
                    and not out[c].isna().any():
                out[c] = out[c].astype(int_dtypes[c])
        return out

    return bucketed_group_agg(both, ["_jkey"], filter_bucket, num_buckets)
