"""Driver-contract tests: __ray_entry__ entry/queries/oracle_sql, replicating
the driver's row-count + column + value-hash compare at sf0.001."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    from tools.check_oracle import canon

    return canon(df)


def _to_pandas(res):
    from tools.check_oracle import to_pandas

    return to_pandas(res)


def test_entry_runs_with_stable_schema(entrymod):
    r1 = _to_pandas(entrymod.entry())
    r2 = _to_pandas(entrymod.entry())
    assert len(r1) >= 0 and list(r1.columns) == list(r2.columns)
    assert list(r1.columns) == ["query", "doc_id", "score"]


def test_oracle_keys_subset_of_queries(entrymod):
    qs = entrymod.queries()
    for k in entrymod.oracle_sql():
        assert k in qs, k


SQL_BACKED = [
    "doc_token_stats", "term_df_top100", "exact_search_batch",
    "prefix_search_cu", "vocab_total", "dedup_exact", "bm25_topk",
    "events_hourly", "ann_topk",
]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle_sql(entrymod, con, name):
    from tools.check_oracle import value_hash

    got = _canon(_to_pandas(entrymod.queries()[name](SF)))
    want = _canon(con.sql(entrymod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert value_hash(got) == value_hash(want)


ROWS_ONLY = ["quality_scores", "langid", "fingerprints", "simhash_pairs",
             "media_features"]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(entrymod, name):
    got = _to_pandas(entrymod.queries()[name](SF))
    assert len(got) >= 0
