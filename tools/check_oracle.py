"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side at a given sf, compare row count, schema,
and an order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Same per-worker logging config as bench.py: silences the benign
# "Failed to hash the schemas" warning the pandas-metadata testdata
# schemas trigger. Must be set before ray.init.
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "search_engine_ray", "ray_data_logging.yaml"))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(9)
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"[{name}] RAY ERROR: {exc!r}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[{name}] rows-only: {len(got)} rows, "
                  f"cols={list(got.columns)}")
            continue
        try:
            want = canon(con.sql(oracles[name]).fetchdf())
        except Exception as exc:  # noqa: BLE001
            print(f"[{name}] SQL ERROR: {exc!r}")
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"[{name}] {status} rows={len(got)}/{len(want)} "
              f"cols={'=' if ok_cols else (list(got.columns), list(want.columns))} "
              f"hash={'=' if ok_hash else 'DIFF'}")
        if status == "FAIL":
            failures += 1
            if ok_cols and ok_rows:
                merged = got.compare(want) if got.shape == want.shape else None
                if merged is not None and len(merged):
                    print(merged.head(10))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
