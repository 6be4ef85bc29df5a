"""Filtered top-k search (metadata `where` predicates) + facet counts.

Rank identity for the filtered paths is established against
OracleIndex.search(where=)/facet_counts — an independent dict/set
evaluation — across every serving topology: LocalSearcher,
ShardedSearcher, DocShardServer, BucketShardServer, SearcherReplicaPool
and the CLI. The predicate semantics: AND of attribute equality over
docs_clean columns, applied BEFORE ranking (filtered top-k, not a
post-filter of the unfiltered top-k).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages
from search_engine_ray.oracle import OracleIndex
from search_engine_ray.search import LocalSearcher

WHERES = [None, {"lang": "en"}, {"lang": "de"}, {"lang": ""},
          {"lang": "xx"}]
QUERIES = [("or", ["mama", "doma"]), ("and", ["mama", "rama"]),
           ("exact", ["mila"]), ("prefix", ["mi"]), ("fuzzy", ["milo"]),
           # head zipf terms: present in every lang class (non-vacuous
           # filtered paths — 'mama'-family terms only occur in the en
           # parity docs)
           ("or", ["baba", "koba"]), ("and", ["baba", "riba"]),
           ("exact", ["baba"]), ("prefix", ["ko"])]


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("filtered")
    pages = generate_pages(400, seed=33)
    os.makedirs(root / "pages")
    pq.write_table(pages, str(root / "pages" / "p.parquet"))
    build_index(str(root / "pages"), str(root / "index"),
                BuildConfig(num_buckets=8))
    return {"pages": pages, "root": root,
            "searcher": LocalSearcher(str(root / "index")),
            "oracle": OracleIndex.build(pages)}


def _assert_matches_oracle(table, orc_rows):
    assert table.column("doc_id").to_pylist() == [d for d, _, _ in orc_rows]
    assert table.column("score").to_pylist() == [s for _, s, _ in orc_rows]


def test_local_filtered_rank_identity(corpus):
    s, o = corpus["searcher"], corpus["oracle"]
    nonempty_filtered = 0
    for st, qs in QUERIES:
        for where in WHERES:
            eng = s.search(qs, st, k=12, where=where)
            _assert_matches_oracle(eng, o.search(qs, st, k=12, where=where))
            if where == {"lang": "en"} and eng.num_rows:
                nonempty_filtered += 1
    assert nonempty_filtered > 0  # the filter exercise isn't vacuous


def test_filter_is_not_a_post_filter(corpus):
    """The filtered top-k must contain low-unfiltered-rank docs of the
    filtered class, not merely drop rows from the unfiltered top-k."""
    s, o = corpus["searcher"], corpus["oracle"]
    full = s.search(["baba"], "exact", k=s.n_docs, where=None)
    de = s.search(["baba"], "exact", k=s.n_docs, where={"lang": "de"})
    assert de.num_rows > 0
    de_ids = set(de.column("doc_id").to_pylist())
    # every de hit appears in the full list, and the filtered list is
    # exactly the de-subsequence of the full ranking
    full_de = [d for d in full.column("doc_id").to_pylist() if d in de_ids]
    assert full_de == de.column("doc_id").to_pylist()
    assert all(o.attr_of[d]["lang"] == "de" for d in de_ids)


def test_where_multi_column_and_semantics(corpus):
    s, o = corpus["searcher"], corpus["oracle"]
    got = s.search(["baba"], "exact", k=20, where={"lang": "en"})
    assert got.num_rows > 0
    # multi-predicate AND: an impossible combination yields 0 rows
    both = s.search(["baba"], "exact", k=20,
                    where={"lang": "en", "url": "zzz"})
    assert both.num_rows == 0
    # multi-predicate AND: a satisfiable combination isolates one doc
    hit = s.search(["baba"], "exact", k=1, where={"lang": "de"})
    the_url = hit.column("url")[0].as_py()
    one = s.search(["baba"], "exact", k=5,
                   where={"lang": "de", "url": the_url})
    assert one.num_rows == 1 and one.column("url")[0].as_py() == the_url


def test_bmw_scorer_with_where_matches_taat(corpus):
    """Masked block-max == masked TAAT, bit for bit — across filters,
    cursors, and their composition (the bounds stay valid under any doc
    subset; accumulation order per surviving doc is unchanged)."""
    s = corpus["searcher"]
    for qs in (["mama", "doma"], ["baba", "koba"], ["baba"]):
        for where in (None, {"lang": "en"}, {"lang": "de"},
                      {"doc_len": (10, 120)}, {"lang": "xx"}):
            a = s.search(qs, "or", k=10, scorer="taat", where=where)
            b = s.search(qs, "or", k=10, scorer="bmw", where=where)
            assert a.equals(b), (qs, where)
            if a.num_rows:
                cur = (a.column("score")[-1].as_py(),
                       a.column("doc_id")[-1].as_py())
                a2 = s.search(qs, "or", k=10, scorer="taat", where=where,
                              search_after=cur)
                b2 = s.search(qs, "or", k=10, scorer="bmw", where=where,
                              search_after=cur)
                assert a2.equals(b2), (qs, where, "after")


def test_unknown_attribute_column_raises(corpus):
    with pytest.raises(KeyError):
        corpus["searcher"].search(["mama"], "exact", where={"nope": "x"})


def test_numeric_range_where_matches_oracle(corpus):
    s, o = corpus["searcher"], corpus["oracle"]
    cases = [
        {"doc_len": (5, 60)},
        {"doc_len": (None, 40)},
        {"doc_len": (100, None)},
        {"lang": "en", "doc_len": (10, 80)},  # mixed string + range
    ]
    nonempty = 0
    for where in cases:
        eng = s.search(["baba", "koba"], "or", k=15, where=where)
        orc = o.search(["baba", "koba"], "or", k=15, where=where)
        _assert_matches_oracle(eng, orc)
        nonempty += eng.num_rows > 0
    assert nonempty >= 2
    # range on a timestamp column (int64 microseconds)
    ts_all = s.numeric_attrs("warc_ts")
    mid = int(np.median(ts_all))
    eng = s.search(["baba"], "exact", k=400, where={"warc_ts": (None, mid)})
    orc = o.search(["baba"], "exact", k=400, where={"warc_ts": (None, mid)})
    _assert_matches_oracle(eng, orc)
    assert 0 < eng.num_rows
    # numeric range on a string column raises
    with pytest.raises(KeyError):
        s.search(["baba"], "exact", where={"lang": (1, 2)})


def test_complete_matches_oracle(corpus):
    s, o = corpus["searcher"], corpus["oracle"]
    for prefix in ("ba", "ko", "m", "zzzz"):
        t = s.complete(prefix, k=8)
        want = o.complete(prefix, k=8)
        assert list(zip(t.column("term").to_pylist(),
                        t.column("df").to_pylist())) == want, prefix
    assert s.complete("ba", k=3).num_rows <= 3


def test_sharded_complete_and_range(ray_session, corpus, tmp_path):
    from search_engine_ray.sharded import ShardedSearcher, build_sharded

    root = str(tmp_path / "sharded_c")
    build_sharded(str(corpus["root"] / "pages"), root, num_doc_shards=3,
                  config=BuildConfig(num_buckets=8))
    sh = ShardedSearcher(root)
    s = corpus["searcher"]
    assert sh.complete("ba", k=8).equals(s.complete("ba", k=8))
    # sidecar-less fallback path agrees too
    sh._has_sidecar = False
    assert sh.complete("ba", k=8).equals(s.complete("ba", k=8))
    sh._has_sidecar = True
    a = s.search(["baba"], "exact", k=12, where={"doc_len": (10, 80)})
    b = sh.search(["baba"], "exact", k=12, where={"doc_len": (10, 80)})
    assert a.equals(b)
    edges = [0, 50, 100, 200, 400]
    ha = s.facet_histogram(["baba", "koba"], edges, "or", by="doc_len")
    hb = sh.facet_histogram(["baba", "koba"], edges, "or", by="doc_len")
    assert ha.equals(hb)
    # sharded bmw/auto scorers: bit-identical to taat (per-shard kernel
    # choice is invisible — the restriction is gone)
    base = sh.search(["baba", "koba"], "or", k=12, scorer="taat")
    for scorer in ("bmw", "auto"):
        assert sh.search(["baba", "koba"], "or", k=12,
                         scorer=scorer).equals(base)
    assert sh.search(["baba"], "exact", k=12, scorer="bmw",
                     where={"lang": "en"}).equals(
        sh.search(["baba"], "exact", k=12, where={"lang": "en"}))
    with pytest.raises(ValueError):
        sh.search(["baba"], "exact", scorer="nope")


def test_facet_counts_match_oracle(corpus):
    s, o = corpus["searcher"], corpus["oracle"]
    for st, qs in [("or", ["mama", "doma"]), ("and", ["mama"]),
                   ("prefix", ["mi"])]:
        for where in (None, {"lang": "de"}):
            t = s.facet_counts(qs, st, by="lang", where=where)
            want = o.facet_counts(qs, st, by="lang", where=where)
            assert list(zip(t.column("value").to_pylist(),
                            t.column("n_docs").to_pylist())) == want
    # facet by a high-cardinality column still works (url: all count 1)
    t = s.facet_counts(["mila"], "exact", by="url")
    assert set(t.column("n_docs").to_pylist()) == {1}


def test_phrase_near_bool_where_match_oracle(corpus):
    s, o = corpus["searcher"], corpus["oracle"]
    nonempty = 0
    for where in (None, {"lang": "en"}, {"lang": "de"}, {"lang": "xx"}):
        eng = s.phrase_search(["baba", "koba"], k=15, where=where)
        orc = o.phrase_search(["baba", "koba"], k=15, where=where)
        _assert_matches_oracle(eng, orc)
        nonempty += eng.num_rows > 0
        eng = s.near_search(["baba", "riba"], window=30, k=15, where=where)
        orc = o.near_search(["baba", "riba"], window=30, k=15, where=where)
        _assert_matches_oracle(eng, orc)
        for q in ("baba AND koba", "baba AND NOT koba", "NOT baba"):
            eng = s.bool_search(q, k=15, where=where)
            orc = o.bool_search(q, k=15, where=where)
            _assert_matches_oracle(eng, orc)
    assert nonempty >= 1


def test_phrase_near_bool_where_topologies(ray_session, corpus, tmp_path):
    from search_engine_ray.serve import DocShardServer, SearcherReplicaPool
    from search_engine_ray.sharded import ShardedSearcher, build_sharded

    s = corpus["searcher"]
    idx = str(corpus["root"] / "index")
    root = str(tmp_path / "sharded_pnb")
    build_sharded(str(corpus["root"] / "pages"), root, num_doc_shards=3,
                  config=BuildConfig(num_buckets=8))
    sh = ShardedSearcher(root)
    srv = DocShardServer(root)
    pool = SearcherReplicaPool(idx, num_replicas=2)
    try:
        where = {"lang": "en"}
        for name, call in (
            ("phrase", lambda t: t.phrase_search(["baba", "koba"], k=10,
                                                 where=where)),
            ("near", lambda t: t.near_search(["baba", "riba"], window=30,
                                             k=10, where=where)),
            ("bool", lambda t: t.bool_search("baba AND NOT koba", k=10,
                                             where=where)),
            ("regex", lambda t: t.search(["b.b(a|o)"], "regex", k=10,
                                         where=where)),
            ("synonym", lambda t: t.synonym_search(
                [["baba", "koba"], ["riba"]], k=10, where=where)),
        ):
            want = call(s)
            for surface in (sh, srv, pool):
                got = call(surface)
                assert got.column("doc_id").equals(want.column("doc_id")), \
                    (name, type(surface).__name__)
                assert got.column("score").equals(want.column("score"))
    finally:
        srv.shutdown()
        pool.shutdown()


def test_facet_histogram_matches_oracle(corpus):
    s, o = corpus["searcher"], corpus["oracle"]
    edges = [0, 50, 100, 200, 400]
    for st, qs in [("or", ["baba", "koba"]), ("and", ["baba"])]:
        for where in (None, {"lang": "en"}):
            t = s.facet_histogram(qs, edges, st, by="doc_len", where=where)
            want = o.facet_histogram(qs, edges, st, by="doc_len",
                                     where=where)
            got = list(zip(t.column("bin_lo").to_pylist(),
                           t.column("bin_hi").to_pylist(),
                           t.column("n_docs").to_pylist()))
            assert got == want, (st, where)
    # values at/above the last edge are excluded (half-open bins)
    full = s.facet_histogram(["baba"], [0, 10_000], "or", by="doc_len")
    tight = s.facet_histogram(["baba"], [0, 1], "or", by="doc_len")
    assert full.column("n_docs")[0].as_py() > 0
    assert tight.column("n_docs")[0].as_py() == 0
    with pytest.raises(ValueError):
        s.facet_histogram(["baba"], [5, 1], "or", by="doc_len")


def test_doc_shard_complete(ray_session, corpus, tmp_path):
    from search_engine_ray.serve import DocShardServer
    from search_engine_ray.sharded import build_sharded

    root = str(tmp_path / "sharded_dc")
    build_sharded(str(corpus["root"] / "pages"), root, num_doc_shards=3,
                  config=BuildConfig(num_buckets=8))
    srv = DocShardServer(root)
    try:
        assert srv.complete("ba", k=8).equals(
            corpus["searcher"].complete("ba", k=8))
    finally:
        srv.shutdown()


def test_sharded_filtered_matches_local(ray_session, corpus, tmp_path):
    from search_engine_ray.sharded import ShardedSearcher, build_sharded

    root = str(tmp_path / "sharded")
    build_sharded(str(corpus["root"] / "pages"), root, num_doc_shards=3,
                  config=BuildConfig(num_buckets=8))
    sh = ShardedSearcher(root)
    s = corpus["searcher"]
    for st, qs in QUERIES:
        for where in WHERES:
            a = s.search(qs, st, k=12, where=where)
            b = sh.search(qs, st, k=12, where=where)
            assert a.equals(b), (st, where)
    for where in (None, {"lang": "de"}):
        fa = s.facet_counts(["mama", "doma"], "or", by="lang", where=where)
        fb = sh.facet_counts(["mama", "doma"], "or", by="lang", where=where)
        assert fa.equals(fb)

    # actor topologies over the same artifacts
    from search_engine_ray.serve import DocShardServer

    srv = DocShardServer(root)
    try:
        for st, qs in QUERIES:
            for where in (None, {"lang": "de"}, {"lang": "xx"}):
                a = s.search(qs, st, k=12, where=where)
                b = srv.search(qs, st, k=12, where=where)
                assert a.column("doc_id").equals(b.column("doc_id")), \
                    (st, where)
                assert a.column("score").equals(b.column("score"))
        fa = s.facet_counts(["mama"], "exact", by="lang")
        fb = srv.facet_counts(["mama"], "exact", by="lang")
        assert fa.equals(fb)
        # doc-sharded bmw/auto scorers: bit-identical merges
        base = srv.search(["baba", "koba"], "or", k=12)
        for scorer in ("bmw", "auto"):
            got = srv.search(["baba", "koba"], "or", k=12, scorer=scorer)
            assert got.column("doc_id").equals(base.column("doc_id"))
            assert got.column("score").equals(base.column("score"))
    finally:
        srv.shutdown()


def test_bucket_shard_and_pool_filtered(ray_session, corpus):
    from search_engine_ray.serve import BucketShardServer, SearcherReplicaPool

    s = corpus["searcher"]
    idx = str(corpus["root"] / "index")
    srv = BucketShardServer(idx, num_shards=3)
    pool = SearcherReplicaPool(idx, num_replicas=2)
    try:
        for st, qs in [("or", ["mama", "doma"]), ("and", ["mama", "rama"]),
                       ("exact", ["mila"])]:
            for where in (None, {"lang": "de"}, {"lang": "xx"}):
                a = s.search(qs, st, k=12, where=where, with_urls=False)
                b = srv.search(qs, st, k=12, where=where)
                assert a.column("doc_id").equals(b.column("doc_id")), \
                    (st, where)
                assert a.column("score").equals(b.column("score"))
                c = pool.search(qs, st, k=12, where=where)
                assert c.column("doc_id").equals(a.column("doc_id"))
        fp = pool.facet_counts(["mama"], "exact", by="lang")
        assert fp.equals(s.facet_counts(["mama"], "exact", by="lang"))
        assert srv.facet_counts(["baba"], "exact", by="lang").equals(
            s.facet_counts(["baba"], "exact", by="lang"))
        assert srv.facet_histogram(["baba"], [0, 100, 400],
                                   by="doc_len").equals(
            s.facet_histogram(["baba"], [0, 100, 400], by="doc_len"))
        assert srv.complete("ba", k=6).equals(s.complete("ba", k=6))
    finally:
        srv.shutdown()
        pool.shutdown()


def test_cli_where_and_facets(corpus):
    idx = str(corpus["root"] / "index")
    env = {**os.environ, "RAY_GRAFT_CPUS": "2"}
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "query",
         "--index", idx, "--terms", "mama", "--type", "exact",
         "-k", "5", "--where", "lang=de"],
        capture_output=True, text=True, env=env, check=True)
    rows = json.loads(out.stdout.strip().splitlines()[-1])
    want = corpus["searcher"].search(["mama"], "exact", k=5,
                                     where={"lang": "de"})
    assert [r["doc_id"] for r in rows] == want.column("doc_id").to_pylist()

    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "facets",
         "--index", idx, "--terms", "mama", "doma", "--type", "or",
         "--by", "lang"],
        capture_output=True, text=True, env=env, check=True)
    rows = json.loads(out.stdout.strip().splitlines()[-1])
    want = corpus["searcher"].facet_counts(["mama", "doma"], "or", by="lang")
    assert rows == want.to_pylist()


def test_complete_is_vocabulary_light(corpus):
    """Regression (ADVICE r4): a cold complete() must not materialize
    posting blobs — it reads the term/df-only view, leaving the full
    bucket cache empty."""
    cold = LocalSearcher(str(corpus["root"] / "index"))
    t = cold.complete("ba", k=8)
    assert t.num_rows > 0
    assert cold._buckets == {}          # no full bucket loaded
    assert len(cold._tviews) == cold.num_buckets
    # and the view agrees with the full-bucket path
    assert t.equals(corpus["searcher"].complete("ba", k=8))


def test_facet_histogram_zero_shards_returns_zero_bins():
    """Regression (ADVICE r4): an empty-shard ShardedSearcher returns
    the all-zero histogram instead of AttributeError."""
    from search_engine_ray.sharded import ShardedSearcher

    ss = ShardedSearcher.__new__(ShardedSearcher)
    ss.shards = []
    ss._expand = lambda qs, st: list(qs)
    t = ss.facet_histogram(["baba"], edges=[0.0, 10.0, 20.0])
    assert t.column("bin_lo").to_pylist() == [0.0, 10.0]
    assert t.column("bin_hi").to_pylist() == [10.0, 20.0]
    assert t.column("n_docs").to_pylist() == [0, 0]
