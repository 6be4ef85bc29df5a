"""Windowed aggregation over the driver's ``events`` stream table
(``event_id, ts, user_id, event_type, value, props``).

Ray Data has no event-time windows; tumbling windows are expressed as a
groupby on the truncated timestamp (SURVEY.md §2.7 notes the reference has
no windows either — this is part of the training-pipeline extension set).
Ordering assumption: none needed for tumbling count/sum aggregates.
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd

from search_engine_ray.stages.agg import bucketed_group_agg


def _add_hour(df: pd.DataFrame) -> pd.DataFrame:
    # epoch seconds of the hour bucket — integer, so the DuckDB compare is
    # exact (no timestamp-locale pitfalls)
    df["hour_epoch"] = (
        df["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
    )
    return df[["user_id", "hour_epoch", "value"]]


def _hourly_agg(g: pd.DataFrame) -> pd.DataFrame:
    out = g.groupby(["user_id", "hour_epoch"], as_index=False).agg(
        n_events=("value", "size"), sum_value=("value", "sum")
    )
    out["sum_value"] = out["sum_value"].round(6)
    return out


def events_hourly_user(sf_dir: str):
    """Per (user_id, hour): event count + sum(value) rounded to 6 dp.

    (user_id, hour) cardinality ~ the table size, so this uses the
    coarse-bucket aggregate (stages/agg.py), not a per-group groupby.
    """
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "user_id", "value"])
    ds = ds.map_batches(_add_hour, batch_format="pandas")
    return bucketed_group_agg(ds, ["user_id", "hour_epoch"], _hourly_agg)
