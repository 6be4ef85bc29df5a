"""Relational enrichment over the driver's TPC-H-ish tables — the demo
surface for the distributed join operators (functions/join.py).

``orders_by_nation`` is the canonical big-big + small-dim plan:
orders ⨝ customer is a bucketed hash join (BOTH sides corpus-scale at
100 TB — a broadcast would be wrong there), then nation ⨝ region — 25
and 5 rows, bounded forever — ride a driver-built broadcast frame, and
the final rollup is one coarse bucketed aggregate.

Money sums travel as integer CENTS: summing doubles of ~1e9 magnitude
leaves the 6th decimal at the mercy of summation order, so a
cross-engine value-hash over float sums would be flaky; ``round(x*100)``
is exact for 2-dp prices in both engines.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from search_engine_ray.functions.join import broadcast_join, bucketed_hash_join
from search_engine_ray.stages.agg import bucketed_group_agg


def orders_by_nation(sf_dir: str):
    """Per (nation, region): order count + exact total price in cents.

    orders ⨝ customer (hash, one exchange) → +nation/region names
    (broadcast, zero exchange) → rollup (one coarse exchange on a
    25-key domain)."""
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
    joined = bucketed_hash_join(orders, customer,
                                left_on="o_custkey", right_on="c_custkey")

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet")).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")[
        ["n_nationkey", "n_name", "r_name"]]
    joined = broadcast_join(joined, dim,
                            left_on="c_nationkey", right_on="n_nationkey")

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["n_name", "r_name"]].assign(
            cents=np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5)
            .astype(np.int64))
        return df

    rows = joined.map_batches(to_cents, batch_format="pandas")

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["n_name", "r_name"], as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum"))
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    return bucketed_group_agg(rows, ["n_name", "r_name"], rollup)


def revenue_by_brand(sf_dir: str):
    """Per (brand, returnflag): lineitem count + exact discounted
    revenue in cents — the hash join at REAL volume (lineitem is the
    6x-orders fact table; part is 7.5x smaller but grows with scale, so
    it takes the hash-join path, not a broadcast).

    revenue cents = round(l_extendedprice * (1 - l_discount) * 100):
    the same double expression per row in both engines, then an exact
    BIGINT sum — immune to summation order."""
    lineitem = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])
    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_brand"])
    joined = bucketed_hash_join(lineitem, part,
                                left_on="l_partkey", right_on="p_partkey")

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        # half-AWAY rounding (floor(x+0.5), all prices positive):
        # numpy's half-even diverges from SQL round() on the exact
        # dyadic .5 products a 0.25/0.5 discount produces
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100.0 + 0.5).astype(np.int64)
        return df[["p_brand", "l_returnflag"]].assign(cents=cents)

    rows = joined.map_batches(to_cents, batch_format="pandas")

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["p_brand", "l_returnflag"], as_index=False).agg(
            n_items=("cents", "size"), revenue_cents=("cents", "sum"))
        out["n_items"] = out["n_items"].astype("int64")
        return out

    return bucketed_group_agg(rows, ["p_brand", "l_returnflag"], rollup)
