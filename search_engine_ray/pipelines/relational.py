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

from search_engine_ray.functions.join import broadcast_join, bucketed_hash_join
from search_engine_ray.sources import sized_read_parquet
from search_engine_ray.stages.agg import partial_group_agg


def orders_by_nation(sf_dir: str):
    """Per (nation, region): order count + exact total price in cents.

    orders ⨝ customer (hash, one exchange) → +nation/region names
    (broadcast, zero exchange) → rollup (one coarse exchange on a
    25-key domain)."""
    orders = sized_read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])
    customer = sized_read_parquet(os.path.join(sf_dir, "customer.parquet"),
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

    # sum/count decompose, so the rollup is a map-side combiner: each
    # batch collapses to <=25 (nation, region) partials and the exchange
    # moves only those — integer-cent sums stay exact in any order
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["n_name", "r_name"]].assign(
            cents=np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5)
            .astype(np.int64))
        out = df.groupby(["n_name", "r_name"], as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum"))
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["n_name", "r_name"], as_index=False).agg(
            n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum"))

    return partial_group_agg(joined, ["n_name", "r_name"],
                             partial, combine)


def revenue_by_brand(sf_dir: str):
    """Per (brand, returnflag): lineitem count + exact discounted
    revenue in cents — the hash join at REAL volume (lineitem is the
    6x-orders fact table; part is 7.5x smaller but grows with scale, so
    it takes the hash-join path, not a broadcast).

    revenue cents = round(l_extendedprice * (1 - l_discount) * 100):
    the same double expression per row in both engines, then an exact
    BIGINT sum — immune to summation order."""
    lineitem = sized_read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])
    part = sized_read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_brand"])
    joined = bucketed_hash_join(lineitem, part,
                                left_on="l_partkey", right_on="p_partkey")

    # map-side combiner (same shape as orders_by_nation): each batch
    # collapses to |brands x flags| partials before the exchange
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # half-AWAY rounding (floor(x+0.5), all prices positive):
        # numpy's half-even diverges from SQL round() on the exact
        # dyadic .5 products a 0.25/0.5 discount produces
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1.0 - df["l_discount"].to_numpy())
                         * 100.0 + 0.5).astype(np.int64)
        df = df[["p_brand", "l_returnflag"]].assign(cents=cents)
        out = df.groupby(["p_brand", "l_returnflag"], as_index=False).agg(
            n_items=("cents", "size"), revenue_cents=("cents", "sum"))
        out["n_items"] = out["n_items"].astype("int64")
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["p_brand", "l_returnflag"], as_index=False).agg(
            n_items=("n_items", "sum"),
            revenue_cents=("revenue_cents", "sum"))

    return partial_group_agg(joined, ["p_brand", "l_returnflag"],
                             partial, combine)
