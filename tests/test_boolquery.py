"""Boolean query language: parser semantics + rank identity across the
local, sharded and actor-served surfaces vs the set-based oracle twin."""

import numpy as np
import pytest

from search_engine_ray.boolquery import (
    eval_ordinals,
    parse,
    positive_terms,
    term_leaves,
)
from search_engine_ray.search import LocalSearcher

BOOL_QUERIES = [
    "mila",
    "mama AND mila",
    "mama OR mila",
    "mama AND NOT mila",
    "NOT mila",
    "(mama OR mila) AND NOT doma",
    "mama AND (mila OR doma) AND NOT zzz_none",
    "NOT (mama OR mila)",
    "zzz_none OR qqq_absent",
    "mama AND zzz_none",
    "NOT NOT mila",
    "sentinel000 OR (mama AND mila)",
]


def test_parser_shapes_and_errors():
    assert parse("a") == ("term", "a")
    assert parse("a AND b OR c") == \
        ("or", [("and", [("term", "a"), ("term", "b")]), ("term", "c")])
    assert parse("a AND (b OR c)") == \
        ("and", [("term", "a"),
                 ("or", [("term", "b"), ("term", "c")])])
    assert parse("NOT a AND b") == \
        ("and", [("not", ("term", "a")), ("term", "b")])
    assert term_leaves(parse("a AND NOT (b OR a)")) == {"a", "b"}
    assert positive_terms(parse("a AND NOT (b OR c)")) == {"a"}
    assert positive_terms(parse("NOT NOT a")) == {"a"}
    for bad in ("", "AND a", "a AND", "(a", "a)", "a b", "NOT"):
        with pytest.raises(ValueError):
            parse(bad)


def test_eval_ordinals_set_algebra():
    p = {"a": np.array([0, 1, 2], dtype=np.int64),
         "b": np.array([1, 3], dtype=np.int64)}
    n = 5

    def ev(q):
        return eval_ordinals(parse(q), p, n).tolist()

    assert ev("a AND b") == [1]
    assert ev("a OR b") == [0, 1, 2, 3]
    assert ev("NOT a") == [3, 4]
    assert ev("a AND NOT b") == [0, 2]
    assert ev("NOT (a OR b)") == [4]
    assert ev("missing OR b") == [1, 3]
    assert ev("missing AND a") == []


@pytest.fixture(scope="module")
def searcher(built_index):
    return LocalSearcher(built_index)


@pytest.mark.parametrize("q", BOOL_QUERIES)
def test_bool_rank_identity_vs_oracle(searcher, small_oracle, q):
    for k in (5, 50):
        eng = searcher.bool_search(q, k=k)
        got = list(zip(eng.column("doc_id").to_pylist(),
                       eng.column("score").to_pylist()))
        want = [(d, s) for d, s, _ in small_oracle.bool_search(q, k=k)]
        assert got == want, (q, k)


@pytest.mark.parametrize("q", BOOL_QUERIES)
def test_bool_sharded_matches_local(ray_session, built_index, q,
                                    small_pages, tmp_path_factory):
    from search_engine_ray.sharded import ShardedSearcher, build_sharded

    root = tmp_path_factory.mktemp("boolsh")
    pdir = root / "pages"
    if not pdir.exists():
        import pyarrow.parquet as pq

        from search_engine_ray.build import BuildConfig

        pdir.mkdir()
        pq.write_table(small_pages, str(pdir / "p.parquet"))
        build_sharded(str(pdir), str(root / "idx"), num_doc_shards=3,
                      config=BuildConfig(num_buckets=4))
    sharded = ShardedSearcher(str(root / "idx"))
    single = LocalSearcher(built_index)
    assert sharded.bool_search(q, k=30).equals(single.bool_search(q, k=30))


def test_bool_doc_shard_server_matches_local(ray_session, built_index,
                                             small_pages, tmp_path_factory):
    import pyarrow.parquet as pq

    from search_engine_ray.build import BuildConfig
    from search_engine_ray.serve import DocShardServer
    from search_engine_ray.sharded import build_sharded

    root = tmp_path_factory.mktemp("boolsrv")
    pdir = root / "pages"
    pdir.mkdir()
    pq.write_table(small_pages, str(pdir / "p.parquet"))
    build_sharded(str(pdir), str(root / "idx"), num_doc_shards=2,
                  config=BuildConfig(num_buckets=4))
    srv = DocShardServer(str(root / "idx"))
    single = LocalSearcher(built_index)
    try:
        for q in BOOL_QUERIES[:6]:
            assert srv.bool_search(q, k=25).equals(
                single.bool_search(q, k=25)), q
    finally:
        srv.shutdown()


def test_replica_pool_bool(built_index):
    from search_engine_ray.serve import SearcherReplicaPool

    pool = SearcherReplicaPool(built_index, num_replicas=2)
    try:
        single = LocalSearcher(built_index)
        for q in BOOL_QUERIES[:5]:
            assert pool.bool_search(q, k=20).equals(
                single.bool_search(q, k=20)), q
    finally:
        pool.shutdown()


def test_explain_sums_to_search_score(searcher):
    """explain()'s contributions, added in the same lexicographic term
    order the scorer uses, reproduce the search score bit-for-bit."""
    for queries, st in [(["mila"], "exact"), (["mama", "mila"], "or"),
                        (["mil"], "prefix"), (["mama", "mila"], "and")]:
        res = searcher.search(queries, st, k=5)
        assert res.num_rows > 0, (queries, st)
        for d, score in zip(res.column("doc_id").to_pylist(),
                            res.column("score").to_pylist()):
            ex = searcher.explain(queries, st, doc_id=d)
            total = 0.0
            for c in ex.column("contribution").to_pylist():
                total += c
            assert total == score, (queries, st, d)
    import pytest as _pt
    with _pt.raises(KeyError):
        searcher.explain(["mila"], "exact", doc_id=123456789)
