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

from search_engine_ray.sources import sized_read_parquet
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


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _ts_to_us(batch):
    """Arrow-side cast: timestamp[us] -> int64 microseconds (exact ints —
    no pandas datetime-resolution ambiguity, matches DuckDB epoch_us)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pa.table({
        "user_id": batch.column("user_id"),
        "ts_us": pc.cast(batch.column("ts"), pa.int64()),
        "value": batch.column("value"),
    })


def _sessionize(g: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """All users of one coarse bucket: vectorized session assignment
    (sort, diff, cumsum) + per-session aggregates."""
    import numpy as np

    g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
    uid = g["user_id"].to_numpy()
    ts = g["ts_us"].to_numpy()
    if not len(g):
        return pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "session_start_us": pd.Series(dtype="int64"),
            "duration_us": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "sum_value": pd.Series(dtype="float64")})
    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    gap = np.concatenate(([0], ts[1:] - ts[:-1]))
    sess = np.cumsum(new_user | (gap > gap_us))
    out = g.assign(_sess=sess).groupby(["user_id", "_sess"],
                                       as_index=False).agg(
        session_start_us=("ts_us", "min"),
        session_end_us=("ts_us", "max"),
        n_events=("ts_us", "size"),
        sum_value=("value", "sum"))
    out["duration_us"] = out["session_end_us"] - out["session_start_us"]
    out["sum_value"] = out["sum_value"].round(6)
    return out[["user_id", "session_start_us", "duration_us",
                "n_events", "sum_value"]]


def events_sessions(sf_dir: str, gap_us: int = SESSION_GAP_US):
    """Gap-based sessionization (the classic event-stream window op): a
    session ends after ``gap_us`` of user inactivity; emits per-session
    (user_id, session_start_us, duration_us, n_events, sum_value).

    Scale shape: the ONLY shuffle key is the user bucket (coarse-bucket
    aggregate — a user's events co-locate in one partition, sessions
    derive by sort+diff+cumsum inside it, all numpy). SQL-checkable via
    lag()/running-sum window functions.
    """
    ds = sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "user_id", "value"])
    ds = ds.map_batches(_ts_to_us, batch_format="pyarrow")
    return bucketed_group_agg(
        ds, ["user_id"], lambda g: _sessionize(g, gap_us))


WINDOW_US = 3600 * 1_000_000   # sliding-window width: 1 h
SLIDE_US = 900 * 1_000_000     # slide: 15 min -> 4 windows per event


def _slide_explode(batch, window_us: int, slide_us: int):
    """Explode each event into the ``window_us/slide_us`` sliding windows
    that contain it (width a multiple of slide): window starts are
    ``(t//slide - j)*slide`` for j in [0, width/slide). Pure numpy
    repeat/tile — no per-row work."""
    import numpy as np
    import pyarrow as pa

    nwin = window_us // slide_us
    t = batch.column("ts_us").to_numpy(zero_copy_only=False)
    base = (t // slide_us) * slide_us
    n = len(t)
    j = np.tile(np.arange(nwin, dtype=np.int64), n)
    starts = np.repeat(base, nwin) - j * slide_us
    return pa.table({
        "user_id": pa.array(
            np.repeat(batch.column("user_id").to_numpy(
                zero_copy_only=False), nwin)),
        "window_start_us": pa.array(starts),
        "value": pa.array(
            np.repeat(batch.column("value").to_numpy(
                zero_copy_only=False), nwin)),
    })


def events_sliding(sf_dir: str, window_us: int = WINDOW_US,
                   slide_us: int = SLIDE_US):
    """Sliding-window count/sum per user (width 1 h, slide 15 min):
    each event lands in width/slide windows; emits (user_id,
    window_start_us, n_events, sum_value).

    Scale shape: explode-then-aggregate multiplies shuffle volume by
    width/slide (4 here) — the standard trade for small ratios. For
    large width/slide ratios the documented evolution is tumbling
    sub-buckets of size ``slide`` aggregated once and then rolled up
    into windows (shuffle volume 1x + a tiny window-merge pass).
    """
    assert window_us % slide_us == 0
    ds = sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "user_id", "value"])
    ds = ds.map_batches(_ts_to_us, batch_format="pyarrow")
    ds = ds.map_batches(
        _slide_explode, batch_format="pyarrow",
        fn_kwargs={"window_us": window_us, "slide_us": slide_us})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["user_id", "window_start_us"],
                        as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return bucketed_group_agg(ds, ["user_id", "window_start_us"], agg)


def _asof_bucket(g: pd.DataFrame, left_type: str,
                 right_type: str) -> pd.DataFrame:
    """All users of one coarse bucket: backward as-of join of the bucket's
    ``left_type`` events against its ``right_type`` events, vectorized via
    ``pandas.merge_asof`` (sorted-merge, no per-row Python).

    Tie-break when several right events share one timestamp: the highest
    ``event_id`` wins (rights sorted by (ts, event_id) stable; merge_asof
    takes the LAST qualifying row)."""
    left = g[g["event_type"] == left_type]
    right = g[g["event_type"] == right_type]
    cols = ["event_id", "user_id", "ts_us", "match_ts_us",
            "match_event_id", "lag_us"]
    if left.empty or right.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    left = left.sort_values(["ts_us", "event_id"], kind="mergesort")
    right = right.sort_values(["ts_us", "event_id"], kind="mergesort")
    out = pd.merge_asof(
        left[["event_id", "user_id", "ts_us"]],
        right[["event_id", "user_id", "ts_us"]].rename(
            columns={"event_id": "match_event_id",
                     "ts_us": "match_ts_us"}),
        left_on="ts_us", right_on="match_ts_us", by="user_id",
        direction="backward", allow_exact_matches=True)
    out = out.dropna(subset=["match_ts_us"])
    out["match_ts_us"] = out["match_ts_us"].astype("int64")
    out["match_event_id"] = out["match_event_id"].astype("int64")
    out["lag_us"] = out["ts_us"] - out["match_ts_us"]
    return out[cols].sort_values("event_id", kind="mergesort")


def events_asof_join(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click"):
    """Backward AS-OF JOIN over the event stream: for every ``left_type``
    event, the most recent ``right_type`` event of the SAME user at or
    before its timestamp (inner semantics — unmatched lefts drop). The
    classic enrichment operator Ray Data lacks; DuckDB spells it
    ``ASOF JOIN``.

    Scale shape: ONE coarse shuffle on the user bucket brings both sides
    of a user together (the same single-exchange plan a distributed
    sort-merge as-of join uses); inside each bucket the join is a
    vectorized ``merge_asof`` sorted merge. Partitioning assumption: a
    user's full history fits one bucket — the same assumption as
    ``events_sessions``, valid while no single key is object-store-scale
    (salt-and-merge would be the evolution for a pathological hot user).
    """
    ds = sized_read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"])

    def to_us(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column("event_type"),
                        value_set=pa.array([left_type, right_type]))
        batch = batch.filter(mask)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
        })

    ds = ds.map_batches(to_us, batch_format="pyarrow")
    return bucketed_group_agg(
        ds, ["user_id"],
        lambda g: _asof_bucket(g, left_type, right_type))


def events_hourly_user(sf_dir: str):
    """Per (user_id, hour): event count + sum(value) rounded to 6 dp.

    (user_id, hour) cardinality ~ the table size, so this uses the
    coarse-bucket aggregate (stages/agg.py), not a per-group groupby.
    """
    ds = sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "user_id", "value"])
    ds = ds.map_batches(_add_hour, batch_format="pandas")
    return bucketed_group_agg(ds, ["user_id", "hour_epoch"], _hourly_agg)


def events_top_users(sf_dir: str, k: int = 2):
    """Grouped top-k: the ``k`` highest-spend users per event_type
    (rank by 6-dp-rounded sum desc, then user asc — ranking on the
    rounded sum keeps the order cross-engine-stable).

    Scale shape: ONE coarse shuffle on event_type; per-group sums and
    the top-k head are vectorized pandas inside the bucket. With a
    group-count ~ key-domain (5 types) the per-bucket result is tiny;
    for high-cardinality grouping keys the same plan applies with a
    map-side partial sum first (see functions/webtext.tfidf_topk)."""
    ds = sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id", "value"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["event_type", "user_id"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        s["sum_value"] = s["sum_value"].round(6)
        s = s.sort_values(["event_type", "sum_value", "user_id"],
                          ascending=[True, False, True], kind="mergesort")
        s["rank"] = (s.groupby("event_type").cumcount() + 1).astype("int64")
        s["n_events"] = s["n_events"].astype("int64")
        return s[s["rank"] <= k]

    return bucketed_group_agg(ds, ["event_type"], topk)


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer field ``k`` out of
    the ``props`` JSON column and aggregate per event_type.

    Extraction is the vectorized REGEX fast path (Arrow
    ``extract_regex`` C++ kernel — valid for FLAT known-field JSON like
    this stream's ``{"k": N}``; nested/escaped JSON would take a
    json.loads actor pool instead). The DuckDB oracle uses a REAL JSON
    parser (``json_extract_string``), so the cross-engine hash check
    proves the fast path semantically equals full parsing on this data.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])

    def extract(batch):
        m = pc.extract_regex(batch.column("props"),
                             r'"k"\s*:\s*(?P<v>-?[0-9]+)')
        k = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({"event_type": batch.column("event_type"),
                         "k": k})

    rows = ds.map_batches(extract, batch_format="pyarrow")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"))
        for c in ("n_events", "sum_k", "min_k", "max_k"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_group_agg(rows, ["event_type"], agg)


def events_profile(sf_dir: str):
    """Per-column profile of the events table (functions/profile.py)."""
    from search_engine_ray.functions.profile import profile_table

    return profile_table(
        sized_read_parquet(os.path.join(sf_dir, "events.parquet")))


def events_latest(sf_dir: str):
    """CDC-style stream compaction: the LATEST event per user (max ts,
    ties to the highest event_id) — the 'current state per key' view a
    changelog consumer maintains. One coarse exchange on the user
    bucket; per-bucket vectorized idxmax."""
    ds = sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id",
                                  "event_type", "value"])

    def to_us(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "value": batch.column("value"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
        })

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        out = g.groupby("user_id", as_index=False).last()
        out["value"] = out["value"].round(6)
        return out[["user_id", "event_id", "ts_us", "event_type",
                    "value"]]

    return bucketed_group_agg(
        ds.map_batches(to_us, batch_format="pyarrow"),
        ["user_id"], latest)


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h from the first step


def _funnel_bucket(g: pd.DataFrame, steps, window_us: int) -> pd.DataFrame:
    """Greedy sequential funnel per user, vectorized per bucket:
    t1 = min ts of step1; t_{i+1} = min ts of step_{i+1} at or after
    t_i. Stage k requires t_k and t_k - t_1 <= window."""
    users = pd.DataFrame({"user_id": g["user_id"].unique()})
    prev = None  # Series: user_id -> t_i (epoch us)
    ts_cols = []
    for i, step in enumerate(steps):
        ev = g[g["event_type"] == step][["user_id", "ts_us"]]
        if prev is not None:
            ev = ev.merge(prev.rename("prev_ts"), left_on="user_id",
                          right_index=True, how="inner")
            ev = ev[ev["ts_us"] >= ev["prev_ts"]]
        cur = ev.groupby("user_id")["ts_us"].min()
        ts_cols.append(cur)
        prev = cur
    out = users.copy()
    for i, cur in enumerate(ts_cols):
        out[f"t{i + 1}"] = out["user_id"].map(cur).astype("Int64")
    stage = pd.Series(0, index=out.index)
    t1 = out["t1"]
    for i in range(len(steps)):
        tk = out[f"t{i + 1}"]
        ok = tk.notna() if i == 0 else \
            tk.notna() & ((tk - t1) <= window_us)
        stage = stage.mask(ok, i + 1)
    out["stage"] = stage.astype("int64")
    return out


def events_funnel(sf_dir: str, steps=FUNNEL_STEPS,
                  window_us: int = FUNNEL_WINDOW_US):
    """Sequential funnel analysis (view -> click -> purchase within 24 h
    of the first view): per user the greedy step timestamps and the
    stage reached -> (user_id, stage, t_view, t_click, t_purchase,
    epoch us, NULL where the step was never reached).

    ONE exchange on the user bucket (the sessionization plan); the
    per-bucket kernel is pandas joins/groupby-mins over the bucket's
    rows — no per-user Python. Oracle: three chained min-aggregate
    joins + a CASE ladder."""
    import pyarrow as pa

    def keyed(batch):
        import pyarrow.compute as pc

        return pa.table({
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
        })

    ds = sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "ts"])
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    out = bucketed_group_agg(
        keyed_ds, ["user_id"],
        lambda g: _funnel_bucket(g, steps, window_us))
    names = dict(zip(["t1", "t2", "t3"],
                     [f"t_{s}" for s in steps]))

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns=names)

    return out.map_batches(rename, batch_format="pandas")


WEEK_US = 7 * 86400 * 1_000_000


def events_retention(sf_dir: str, week_us: int = WEEK_US):
    """Cohort retention matrix: users are cohorted by the week of
    their FIRST event; each (cohort_week, week_offset) cell counts the
    distinct cohort members active in that later week ->
    (cohort_week, week_offset, n_users). Weeks are integer epoch-week
    ordinals (epoch_us // week) — exact in SQL.

    Two bucketed exchanges, both corpus-shaped: (1) user bucket — per
    user the min week (cohort) and the DISTINCT active weeks, emitting
    one (cohort, offset) row per (user, week); (2) (cohort, offset)
    bucket — a count, exact because stage 1 already deduplicated per
    user."""
    import pyarrow as pa

    def keyed(batch):
        import pyarrow.compute as pc

        us = pc.cast(batch.column("ts"), pa.int64())
        return pa.table({
            "user_id": batch.column("user_id"),
            "wk": pc.divide(us, week_us),  # trunc == floor: ts >= epoch
        })

    ds = sized_read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "wk"])
        cohort = d.groupby("user_id")["wk"].transform("min")
        return pd.DataFrame({
            "cohort_week": cohort.to_numpy(),
            "week_offset": (d["wk"] - cohort).to_numpy(),
        })

    cells = bucketed_group_agg(keyed_ds, ["user_id"], per_user)
    return bucketed_group_agg(
        cells, ["cohort_week", "week_offset"],
        lambda g: g.groupby(["cohort_week", "week_offset"],
                            as_index=False).agg(
            n_users=("week_offset", "size")))
