"""Sources (S1-S3) + corpus-watch sync (U4/U5 analogue)."""

import os

import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages
from search_engine_ray.search import LocalSearcher
from search_engine_ray.sources.pages import read_pages, read_url
from search_engine_ray.watch import diff_snapshot, sync_index

CFG = BuildConfig(num_buckets=4)


@pytest.fixture()
def corpus(tmp_path):
    pages = generate_pages(60, seed=12)
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(pages, str(d / "p0.parquet"))
    return str(d)


def test_read_pages_prunes_and_filters(ray_session, corpus):
    ds = read_pages(corpus, columns=["url", "lang"], langs=["de"])
    df = ds.to_pandas()
    assert list(df.columns) == ["url", "lang"]
    assert set(df["lang"]) <= {"de"}


def test_read_url_single_doc(ray_session, corpus):
    ds = read_url(corpus, "https://example.org/parity/00000002")
    rows = ds.take_all()
    assert len(rows) == 1
    assert rows[0]["text"] == "mama mila doma hi mama i am here"


def test_watch_sync_applies_new_fragment(ray_session, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG)
    assert diff_snapshot(idx, corpus) == {"new": [], "changed": [],
                                          "removed": []}
    # a new crawl fragment lands
    extra = generate_pages(10, seed=77, split="late", include_parity=False)
    pq.write_table(extra, os.path.join(corpus, "p1.parquet"))
    d = diff_snapshot(idx, corpus)
    assert len(d["new"]) == 1 and not d["changed"]

    res = sync_index(idx, corpus, CFG)
    assert res["applied"]
    s = LocalSearcher(idx)
    assert s.n_docs == 70
    # a term from the new fragment is searchable
    late_url = extra.column("url")[0].as_py()
    tok = extra.column("text")[0].as_py().split()[0]
    hits = s.search([tok], "exact", k=70).column("url").to_pylist()
    assert late_url in hits
    # idempotent: nothing pending afterwards
    assert diff_snapshot(idx, corpus)["new"] == []
    assert not sync_index(idx, corpus, CFG)["applied"]


def test_watch_loop_daemon_applies_pending(ray_session, corpus, tmp_path):
    """U4 daemon: the polling loop picks up a new fragment and applies
    it, reporting each pass through on_sync."""
    from search_engine_ray.watch import watch_loop

    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG)
    extra = generate_pages(5, seed=99, split="loop", include_parity=False)
    pq.write_table(extra, os.path.join(corpus, "p_loop.parquet"))
    passes = []
    applied = watch_loop(idx, corpus, interval_s=0.01, max_iterations=2,
                         on_sync=lambda r: passes.append(r["applied"]))
    assert applied == 1            # first pass applies, second is a no-op
    assert passes == [True, False]
    assert LocalSearcher(idx).n_docs == 65


def test_result_subscription_diffs(ray_session, corpus, tmp_path):
    """Q4 equivalent: an open query sees added docs after a delta merge
    and removed docs after a deletion, as diffs."""
    from search_engine_ray.incremental import remove_urls
    from search_engine_ray.watch import ResultSubscription, sync_index

    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG)
    sub = ResultSubscription(idx, ["mila"], "exact", k=10)
    first = sub.refresh()
    assert len(first["added"]) == 2 and not first["removed"]
    # no change -> empty diff
    again = sub.refresh()
    assert (again["added"], again["removed"], again["changed"]) == ([], [], [])
    # delta adds a new doc containing the term
    import pyarrow as pa

    from search_engine_ray.corpus import PAGES_SCHEMA

    new = pa.Table.from_pylist([{
        "url": "https://example.org/sub/00000001",
        "warc_ts": generate_pages(1, seed=1).column("warc_ts")[0].as_py(),
        "html": b"", "text": "mila appears here too", "lang": "en",
    }], schema=PAGES_SCHEMA)
    pq.write_table(new, os.path.join(corpus, "p_sub.parquet"))
    sync_index(idx, corpus, CFG)
    d2 = sub.refresh()
    from search_engine_ray.idhash import doc_id_for_url

    new_id = doc_id_for_url("https://example.org/sub/00000001")
    assert new_id in d2["added"]
    # removal shows up as removed
    remove_urls(idx, ["https://example.org/sub/00000001"])
    d3 = sub.refresh()
    assert d3["removed"] == [new_id]


def test_jsonl_source_roundtrip(ray_session, tmp_path):
    """JSONL / JSONL-gz ingestion: gz and plain files parse identically,
    field mapping + defaults hold, ids are stable across re-reads,
    malformed lines are skipped (not fatal), and a downstream operator
    runs on the result unchanged."""
    import numpy as np
    import pandas as pd

    from search_engine_ray.functions.textstats import TokenStatsBatch
    from search_engine_ray.sources.jsonl import (
        read_jsonl,
        write_jsonl_gz,
    )

    rows = [
        {"id": 7, "text": "the quick brown fox", "lang": "en",
         "source": "cc"},
        {"text": "sans id sans lang"},           # id/lang/source default
        {"id": 9, "text": "ein kleiner text", "lang": "de"},
    ]
    d = tmp_path / "shards"
    write_jsonl_gz(rows, str(d / "part-000.jsonl.gz"))
    # same content uncompressed + one malformed line + one blank line
    with open(d / "part-001.jsonl", "w") as f:
        f.write('{"id": 11, "text": "plain file row"}\n')
        f.write("{not json}\n\n")
        f.write('{"id": 12, "no_text_field": 1}\n')

    ds = read_jsonl(str(d))
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 4  # 3 gz rows + 1 good plain row; 2 bad skipped
    assert set(df.columns) == {"doc_id", "text", "lang", "source",
                               "n_chars"}
    by_id = df.set_index("doc_id")
    assert by_id.loc[7, "lang"] == "en" and by_id.loc[7, "source"] == "cc"
    assert by_id.loc[9, "lang"] == "de"
    assert by_id.loc[11, "text"] == "plain file row"
    # the id-less row got a stable md5-derived id with defaults
    anon = df[~df["doc_id"].isin([7, 9, 11])]
    assert len(anon) == 1
    assert anon["lang"].iloc[0] == "und"
    assert anon["source"].iloc[0] == "part-000"
    assert (df["n_chars"] == df["text"].str.len()).all()

    # stable across re-reads
    df2 = read_jsonl(str(d)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df, df2)

    # downstream operator consumes the ingested table unchanged
    stats = ds.map_batches(TokenStatsBatch(),
                           batch_format="pyarrow").to_pandas()
    assert stats.set_index("doc_id").loc[7, "n_tokens"] == 4


def test_ingest_cli(ray_session, tmp_path):
    """ingest job: jsonl.gz dir -> shard-partitioned documents parquet."""
    import json as _json
    import os
    import subprocess
    import sys

    import pyarrow.dataset as pds

    from search_engine_ray.sources.jsonl import write_jsonl_gz

    d = tmp_path / "in"
    write_jsonl_gz(
        [{"id": i, "text": f"doc number {i} words here"}
         for i in range(20)],
        str(d / "part-000.jsonl.gz"))
    out = str(tmp_path / "docs")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "ingest",
         "--input", str(d), "--out", out, "--n-shards", "4"],
        capture_output=True, text=True,
        env=dict(os.environ, RAY_ADDRESS=""), cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    m = _json.loads(r.stdout.strip().splitlines()[-1])
    assert m["n_docs"] == 20
    t = pds.dataset(out, format="parquet", partitioning="hive").to_table()
    assert t.num_rows == 20
    assert sorted(set(t.column("shard_id").to_pylist())) == [0, 1, 2, 3]
