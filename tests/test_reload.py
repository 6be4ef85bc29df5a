"""Hot snapshot reload on serving actors: apply a delta under a live
server, reload(), and the served results must equal a fresh searcher
over the updated artifacts. A no-op reload swaps nothing."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages
from search_engine_ray.incremental import apply_delta
from search_engine_ray.search import LocalSearcher

CFG = BuildConfig(num_buckets=8)


def _delta_pages(tmp, n0=400):
    """3 new docs sharing a fresh sentinel term."""
    rows = {"url": [f"https://new/{i}" for i in range(3)],
            "warc_ts": pa.array([9_000_000 + i for i in range(3)],
                                pa.timestamp("us")),
            "html": pa.array([None] * 3, pa.binary()),
            "text": ["freshterm alpha one", "freshterm beta two",
                     "freshterm gamma three"],
            "lang": ["en", "de", "en"]}
    p = str(tmp / "delta")
    os.makedirs(p, exist_ok=True)
    pq.write_table(pa.table(rows), p + "/d.parquet")
    return p


@pytest.fixture()
def idx(ray_session, tmp_path):
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(generate_pages(400, seed=99), str(pdir / "p.parquet"))
    root = str(tmp_path / "index")
    build_index(str(pdir), root, CFG)
    return root, tmp_path


def test_replica_pool_reload(idx):
    from search_engine_ray.serve import SearcherReplicaPool

    root, tmp = idx
    pool = SearcherReplicaPool(root, num_replicas=2)
    try:
        assert pool.search(["freshterm"], "exact", k=5).num_rows == 0
        assert pool.reload() == 0  # unchanged snapshot: no swap
        apply_delta(root, _delta_pages(tmp), config=CFG)
        # replicas still serve the OLD loaded snapshot until reload
        assert pool.reload() == 2
        fresh = LocalSearcher(root)
        want = fresh.search(["freshterm"], "exact", k=5)
        assert want.num_rows == 3
        # both replicas serve the new snapshot
        for _ in range(2):
            got = pool.search(["freshterm"], "exact", k=5)
            assert got.equals(want)
        # filtered search sees the new docs' attributes too
        de = pool.search(["freshterm"], "exact", k=5, where={"lang": "de"})
        assert de.equals(fresh.search(["freshterm"], "exact", k=5,
                                      where={"lang": "de"}))
        assert de.num_rows == 1
    finally:
        pool.shutdown()


def test_bucket_shard_server_reload(idx):
    from search_engine_ray.serve import BucketShardServer

    root, tmp = idx
    srv = BucketShardServer(root, num_shards=3)
    try:
        assert srv.reload() == 0
        apply_delta(root, _delta_pages(tmp), config=CFG)
        assert srv.reload() == 3
        fresh = LocalSearcher(root)
        got = srv.search(["freshterm"], "exact", k=5)
        want = fresh.search(["freshterm"], "exact", k=5, with_urls=False)
        assert got.column("doc_id").equals(want.column("doc_id"))
        assert got.column("score").equals(want.column("score"))
    finally:
        srv.shutdown()


def test_doc_shard_server_reload(ray_session, tmp_path):
    from search_engine_ray.serve import DocShardServer
    from search_engine_ray.sharded import (
        ShardedSearcher,
        apply_delta_sharded,
        build_sharded,
    )

    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(generate_pages(300, seed=31), str(pdir / "p.parquet"))
    root = str(tmp_path / "sharded")
    build_sharded(str(pdir), root, num_doc_shards=3, config=CFG)
    srv = DocShardServer(root)
    try:
        assert srv.search(["freshterm"], "exact", k=5).num_rows == 0
        assert srv.reload() == 0
        apply_delta_sharded(root, _delta_pages(tmp_path))
        assert srv.reload() > 0
        fresh = ShardedSearcher(root)
        got = srv.search(["freshterm"], "exact", k=5)
        want = fresh.search(["freshterm"], "exact", k=5)
        assert got.column("doc_id").equals(want.column("doc_id"))
        assert got.column("score").equals(want.column("score"))
        assert got.num_rows == 3
        # global stats (idf/avgdl) refreshed: an OLD term's scores match
        # the fresh sharded searcher bit-for-bit after reload
        g2 = srv.search(["baba"], "exact", k=10)
        w2 = fresh.search(["baba"], "exact", k=10)
        assert g2.column("score").equals(w2.column("score"))
    finally:
        srv.shutdown()


def test_watch_and_serve_end_to_end(idx):
    """The watcher detects a changed snapshot, syncs the index, and the
    live pool serves the new doc without a restart."""
    import pyarrow.parquet as pq_

    from search_engine_ray.serve import SearcherReplicaPool
    from search_engine_ray.watch import watch_and_serve

    root, tmp = idx
    pages_dir = str(tmp / "pages")
    pool = SearcherReplicaPool(root, num_replicas=2)
    try:
        assert pool.search(["freshterm"], "exact", k=5).num_rows == 0
        # a no-change pass applies nothing and reloads nothing
        assert watch_and_serve(root, pages_dir, pool,
                               max_iterations=1) == 0
        # grow the snapshot: add the delta pages as a new file
        delta = _delta_pages(tmp)
        src = os.path.join(delta, "d.parquet")
        pq_.write_table(pq_.read_table(src),
                        os.path.join(pages_dir, "d.parquet"))
        assert watch_and_serve(root, pages_dir, pool,
                               max_iterations=1) == 1
        got = pool.search(["freshterm"], "exact", k=5)
        want = LocalSearcher(root).search(["freshterm"], "exact", k=5)
        assert want.num_rows == 3 and got.equals(want)
    finally:
        pool.shutdown()


def test_replica_result_cache_and_invalidation(idx):
    """Opt-in replica result cache: hits are exact; reload() after a
    delta invalidates (fresh results, never stale)."""
    from search_engine_ray.serve import SearcherReplicaPool

    root, tmp = idx
    pool = SearcherReplicaPool(root, num_replicas=1, cache_size=64)
    try:
        a = pool.search(["baba"], "exact", k=5)
        b = pool.search(["baba"], "exact", k=5)  # cache hit
        assert a.equals(b)
        w1 = pool.search(["baba"], "exact", k=5, where={"lang": "en"})
        assert pool.search(["baba"], "exact", k=5,
                           where={"lang": "en"}).equals(w1)
        apply_delta(root, _delta_pages(tmp), config=CFG)
        # NOTE: pre-reload reads after an on-disk mutation are
        # mixed-generation (lazy bucket loads read new files against the
        # old ordinal map) — the reload contract is "mutate, then
        # reload(), then read"; see _Replica.reload docstring
        assert pool.reload() == 1
        fresh = LocalSearcher(root)
        got = pool.search(["freshterm"], "exact", k=5)
        assert got.equals(fresh.search(["freshterm"], "exact", k=5))
        assert got.num_rows == 3
        # old cached key recomputed against the new snapshot
        a2 = pool.search(["baba"], "exact", k=5)
        assert a2.equals(fresh.search(["baba"], "exact", k=5))
    finally:
        pool.shutdown()


def test_replica_result_cache_range_where_hashable(idx):
    """Regression (ADVICE r4): a list-valued range predicate must be
    cacheable — the key normalizes list/tuple values to tuples instead
    of raising TypeError inside frozenset()."""
    from search_engine_ray.search import LocalSearcher
    from search_engine_ray.serve import SearcherReplicaPool

    root, _ = idx
    pool = SearcherReplicaPool(root, num_replicas=1, cache_size=16)
    try:
        want = LocalSearcher(root).search(
            ["baba"], "exact", k=5, where={"doc_len": (1, 10_000)})
        got = pool.search(["baba"], "exact", k=5,
                          where={"doc_len": [1, 10_000]})
        assert got.equals(want)
        # second call is the cache hit — still the same table
        assert pool.search(["baba"], "exact", k=5,
                           where={"doc_len": [1, 10_000]}).equals(want)
    finally:
        pool.shutdown()
