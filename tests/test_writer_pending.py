"""M8 (query-time existence filter) + U3 (IndexWriter event-consumer loop).

Reference semantics under test:
* SimpleSearchManager.java:66 — results whose backing file vanished are
  dropped at query time, before any reindex runs (M8).
* IndexationSchedulerTask.java:33-63 — a single consumer drains the event
  queue on a tick, applies ADD/UPDATE/REMOVE, and fires
  onIndexationFinished (U3).
"""

import json
import os
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages
from search_engine_ray.idhash import doc_id_for_url
from search_engine_ray.incremental import remove_urls
from search_engine_ray.pending import (
    mark_deleted,
    prune_pending,
    read_pending,
)
from search_engine_ray.search import LocalSearcher
from search_engine_ray.writer import IndexWriter

CFG = BuildConfig(num_buckets=8)


@pytest.fixture(scope="module")
def corpus_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("wr")
    pages = generate_pages(150, seed=11, split="small")
    pages_dir = root / "pages"
    pages_dir.mkdir()
    pq.write_table(pages, str(pages_dir / "p0.parquet"))
    index_root = str(root / "index")
    build_index(str(pages_dir), index_root, CFG)
    return {"root": str(root), "pages": pages, "index": index_root}


def _probe_term(s: LocalSearcher) -> str:
    terms, df = s.terms_df(0)
    return terms[int(np.argmax(df))]


# ---------------------------------------------------------------- M8 ----
def test_mark_deleted_drops_hit_without_reload(corpus_index, tmp_path):
    import shutil

    idx = str(tmp_path / "m8idx")
    shutil.copytree(corpus_index["index"], idx)
    s = LocalSearcher(idx)
    t = _probe_term(s)
    r1 = s.search([t], "exact", k=5)
    assert len(r1) == 5
    dead_url = r1.column("url")[0].as_py()
    dead_id = r1.column("doc_id")[0].as_py()

    mark_deleted(idx, urls=[dead_url])
    r2 = s.search([t], "exact", k=5)  # SAME searcher instance, no reload
    ids2 = r2.column("doc_id").to_pylist()
    assert dead_id not in ids2
    # pre-rank mask: the page backfills to k with the next-best live docs
    assert len(ids2) == 5
    assert ids2[:4] == r1.column("doc_id").to_pylist()[1:5]

    # every doc-result surface honours the filter
    assert dead_id not in s.bool_search(f"{t} OR zzzneverterm", k=50) \
        .column("doc_id").to_pylist()
    fc = s.facet_counts([t], "exact", by="lang")
    r_all = s.search([t], "exact", k=10_000)
    assert fc.column("n_docs").to_numpy().sum() == len(r_all)


def test_physical_merge_prunes_sidecar_and_preserves_ranks(
        corpus_index, tmp_path):
    import shutil

    idx = str(tmp_path / "m8idx2")
    shutil.copytree(corpus_index["index"], idx)
    s = LocalSearcher(idx)
    t = _probe_term(s)
    dead_url = s.search([t], "exact", k=1).column("url")[0].as_py()
    mark_deleted(idx, urls=[dead_url])
    masked = s.search([t], "exact", k=5).column("doc_id").to_pylist()

    remove_urls(idx, [dead_url])  # the physical tombstone merge
    ids, _seq = read_pending(idx)
    assert ids.size == 0  # sidecar pruned: backlog fully merged
    merged = LocalSearcher(idx).search([t], "exact", k=5) \
        .column("doc_id").to_pylist()
    # same doc set wins whether the delete is masked or merged (scores
    # shift with n_docs/avgdl, but the masked page's docs stay on top)
    assert merged[:4] == masked[:4]


def test_prune_keeps_unmerged_backlog(tmp_path):
    idx = str(tmp_path)
    mark_deleted(idx, doc_ids=[10, 20, 30])
    # live index holds 20 and 30; this delta processed only id 10
    prune_pending(idx, np.array([20, 30, 99], dtype=np.int64),
                  processed_ids=np.array([10], dtype=np.int64))
    ids, _ = read_pending(idx)
    assert ids.tolist() == [20, 30]
    # an upsert of 20 supersedes its pending delete even though 20 is live
    prune_pending(idx, np.array([20, 30, 99], dtype=np.int64),
                  processed_ids=np.array([20], dtype=np.int64))
    ids, _ = read_pending(idx)
    assert ids.tolist() == [30]


# ---------------------------------------------------------------- U3 ----
@pytest.fixture(scope="module")
def drained(corpus_index, tmp_path_factory):
    """One writer scenario: adds, an update, a remove, and a
    remove-then-re-add, drained once; plus the scratch twin."""
    import shutil

    root = tmp_path_factory.mktemp("u3")
    idx = str(root / "index")
    shutil.copytree(corpus_index["index"], idx)
    pages = corpus_index["pages"]
    urls = pages.column("url").to_pylist()
    texts = pages.column("text").to_pylist()

    w = IndexWriter(idx)
    fired = []
    w.on_indexation_finished(fired.append)
    w.add_document("https://example.org/ev/a", text="quixotic zeppelin one")
    w.add_document("https://example.org/ev/b", text="quixotic zeppelin two")
    w.update_document(urls[3], text="replaced body quixotic")
    w.remove_document(urls[5])
    w.remove_document(urls[7])
    w.add_document(urls[7], text=texts[7])  # supersedes the remove
    n_queued = w.pending_events()
    summary = w.drain()

    # scratch twin over the same final corpus state
    keep = [i for i in range(len(urls)) if i not in (3, 5)]
    extra = pa.table({
        "url": ["https://example.org/ev/a", "https://example.org/ev/b",
                urls[3]],
        "warc_ts": pa.array([1704067200000000] * 3, pa.timestamp("us")),
        "html": pa.array([None] * 3, pa.binary()),
        "text": ["quixotic zeppelin one", "quixotic zeppelin two",
                 "replaced body quixotic"],
        "lang": ["en"] * 3,
    }, schema=pages.schema)
    pages2 = root / "pages2"
    pages2.mkdir()
    pq.write_table(pages.take(keep), str(pages2 / "p0.parquet"))
    pq.write_table(extra, str(pages2 / "p1.parquet"))
    scratch = str(root / "scratch")
    build_index(str(pages2), scratch, CFG)
    return {"idx": idx, "scratch": scratch, "summary": summary,
            "fired": fired, "n_queued": n_queued, "urls": urls}


def test_drain_summary_and_listener(drained):
    assert drained["n_queued"] == 6
    s = drained["summary"]
    assert s["applied"] and s["events"] == 6
    assert s["upserts"] == 4 and s["removes"] == 1  # coalesced per url
    assert drained["fired"] == [s]


def test_drain_clears_pending_sidecar(drained):
    ids, _ = read_pending(drained["idx"])
    assert ids.size == 0  # removed id merged out, re-added id superseded


def test_drained_buckets_byte_identical_to_scratch(drained):
    for b in range(CFG.num_buckets):
        t1 = pq.read_table(os.path.join(
            drained["idx"], "buckets", f"bucket={b}", "postings.parquet"))
        t2 = pq.read_table(os.path.join(
            drained["scratch"], "buckets", f"bucket={b}",
            "postings.parquet"))
        if not t1.equals(t2):
            bad = [c for c in t1.column_names
                   if not t1.column(c).equals(t2.column(c))]
            raise AssertionError(f"bucket {b} differs in columns {bad}")


def test_drained_stats_match_scratch(drained):
    a = json.load(open(os.path.join(drained["idx"], "global_stats.json")))
    b = json.load(open(os.path.join(drained["scratch"],
                                    "global_stats.json")))
    assert (a["n_docs"], a["total_tokens"], a["avgdl"]) == \
        (b["n_docs"], b["total_tokens"], b["avgdl"])


def test_drained_searches_match_scratch(drained):
    s1 = LocalSearcher(drained["idx"])
    s2 = LocalSearcher(drained["scratch"])
    for q in (["quixotic"], ["zeppelin"], ["replaced"]):
        r1 = s1.search(q, "exact", k=10)
        r2 = s2.search(q, "exact", k=10)
        assert r1.column("doc_id").to_pylist() == \
            r2.column("doc_id").to_pylist()
        assert r1.column("score").to_pylist() == \
            r2.column("score").to_pylist()
    # the removed doc never matches again; the re-added one does
    dead = doc_id_for_url(drained["urls"][5])
    alive = doc_id_for_url(drained["urls"][7])
    t = _probe_term(s1)
    hits = s1.search([t], "exact", k=10_000).column("doc_id").to_pylist()
    assert dead not in hits
    assert alive in s1.ords()  # re-added after its remove, still indexed


def test_empty_drain_is_noop(drained):
    w = IndexWriter(drained["idx"])
    seen = []
    w.on_indexation_finished(seen.append)
    assert w.drain() == {"applied": False, "events": 0}
    assert seen == [{"applied": False, "events": 0}]


def test_run_loop_ticks(corpus_index, tmp_path):
    import shutil

    idx = str(tmp_path / "loopidx")
    shutil.copytree(corpus_index["index"], idx)
    w = IndexWriter(idx)
    w.add_document("https://example.org/loop/1", text="looping gazette")
    applied = w.run_loop(interval_s=0.01, max_iterations=3)
    assert applied == 1  # first tick drains, later ticks are no-ops
    assert w.pending_events() == 0
    s = LocalSearcher(idx)
    assert len(s.search(["gazette"], "exact", k=5)) == 1


def test_run_loop_stop_event(corpus_index, tmp_path):
    import shutil

    idx = str(tmp_path / "stopidx")
    shutil.copytree(corpus_index["index"], idx)
    w = IndexWriter(idx)
    stop = threading.Event()
    stop.set()
    assert w.run_loop(interval_s=10.0, stop=stop) == 0


# ----------------------------- M8 across serving topologies -------------
def test_mark_deleted_visible_to_running_actors(corpus_index, tmp_path):
    """The sidecar is stat-checked per query INSIDE each actor, so a
    mark_deleted on the driver is visible to already-running replica and
    shard actors without any reload() call (the cross-process analogue
    of the reference's per-hit Files.exists)."""
    import shutil

    from search_engine_ray.serve import (
        BucketShardServer,
        SearcherReplicaPool,
    )
    from search_engine_ray.sharded import ShardedSearcher, build_sharded

    idx = str(tmp_path / "srvidx")
    shutil.copytree(corpus_index["index"], idx)
    local = LocalSearcher(idx)
    t = _probe_term(local)
    pool = SearcherReplicaPool(idx, num_replicas=2)
    buckets = BucketShardServer(idx, num_shards=3)
    try:
        base = pool.search([t], "exact", k=5)
        dead_url = base.column("url")[0].as_py()
        dead_id = base.column("doc_id")[0].as_py()
        mark_deleted(idx, urls=[dead_url])
        want = local.search([t], "exact", k=5)
        assert dead_id not in want.column("doc_id").to_pylist()
        got_pool = pool.search([t], "exact", k=5)
        assert got_pool.equals(want)
        got_buckets = buckets.search([t], "exact", k=5)
        assert got_buckets.equals(
            local.search([t], "exact", k=5, with_urls=False))
    finally:
        pool.shutdown()
        buckets.shutdown()

    # doc-sharded topology: each shard root has its own sidecar; marking
    # the SAME url on every root is safe (ids absent from a shard's
    # ordinal map mask nothing)
    shroot = str(tmp_path / "sharded")
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    pq.write_table(corpus_index["pages"], pages_dir + "/p0.parquet")
    build_sharded(pages_dir, shroot, num_doc_shards=2, config=CFG)
    ss = ShardedSearcher(shroot)
    r1 = ss.search([t], "exact", k=5)
    dead_url2 = r1.column("url")[0].as_py()
    for sh in ss.shards:
        mark_deleted(sh.index_root, urls=[dead_url2])
    r2 = ss.search([t], "exact", k=5)
    ids2 = r2.column("doc_id").to_pylist()
    assert r1.column("doc_id")[0].as_py() not in ids2
    assert len(ids2) == 5
    assert ids2[:4] == r1.column("doc_id").to_pylist()[1:5]


def test_replica_cache_invalidated_by_mark_deleted(corpus_index, tmp_path):
    import shutil

    from search_engine_ray.serve import SearcherReplicaPool

    idx = str(tmp_path / "cacheidx")
    shutil.copytree(corpus_index["index"], idx)
    t = _probe_term(LocalSearcher(idx))
    pool = SearcherReplicaPool(idx, num_replicas=1, cache_size=32)
    try:
        r1 = pool.search([t], "exact", k=5)
        r1b = pool.search([t], "exact", k=5)  # cache hit
        assert r1b.equals(r1)
        mark_deleted(idx, urls=[r1.column("url")[0].as_py()])
        r2 = pool.search([t], "exact", k=5)  # MUST miss: new sidecar gen
        assert r1.column("doc_id")[0].as_py() not in \
            r2.column("doc_id").to_pylist()
    finally:
        pool.shutdown()


def test_remove_cli(corpus_index, tmp_path):
    import shutil
    import subprocess
    import sys

    idx = str(tmp_path / "cliidx")
    shutil.copytree(corpus_index["index"], idx)
    s = LocalSearcher(idx)
    t = _probe_term(s)
    dead_url = s.search([t], "exact", k=1).column("url")[0].as_py()
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "remove",
         "--index", idx, "--urls", dead_url],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    marked = json.loads(out.stdout.strip().splitlines()[-1])
    assert marked["marked"]["pending"] == 1
    assert doc_id_for_url(dead_url) not in \
        s.search([t], "exact", k=10_000).column("doc_id").to_pylist()


def test_mark_deleted_doc_shard_server(corpus_index, tmp_path):
    """DocShardServer actors (the 10^12-doc topology) honour per-shard
    sidecars written while they are already serving."""
    from search_engine_ray.serve import DocShardServer
    from search_engine_ray.sharded import build_sharded

    shroot = str(tmp_path / "dss")
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    pq.write_table(corpus_index["pages"], pages_dir + "/p0.parquet")
    build_sharded(pages_dir, shroot, num_doc_shards=2, config=CFG)
    srv = DocShardServer(shroot)
    try:
        t = _probe_term(LocalSearcher(corpus_index["index"]))
        r1 = srv.search([t], "exact", k=5)
        dead_id = r1.column("doc_id")[0].as_py()
        import glob

        for shard_root in sorted(glob.glob(shroot + "/shard=*")):
            mark_deleted(shard_root, doc_ids=[dead_id])
        r2 = srv.search([t], "exact", k=5)
        ids2 = r2.column("doc_id").to_pylist()
        assert dead_id not in ids2
        assert len(ids2) == 5
        assert ids2[:4] == r1.column("doc_id").to_pylist()[1:5]
    finally:
        srv.shutdown()


def test_sync_marks_removed_before_merge(corpus_index, tmp_path):
    """incremental.sync_index publishes vanished docs to the M8 sidecar
    as soon as the diff knows them; the physical merge then prunes the
    sidecar on commit — after a full sync nothing stays pending and the
    removed doc never matches."""
    import shutil

    from search_engine_ray.incremental import sync_index

    idx = str(tmp_path / "syncidx")
    shutil.copytree(corpus_index["index"], idx)
    pages = corpus_index["pages"]
    # new snapshot: doc 5 vanished
    snap = str(tmp_path / "snap")
    os.makedirs(snap)
    keep = [i for i in range(len(pages)) if i != 5]
    pq.write_table(pages.take(keep), snap + "/p0.parquet")

    m = sync_index(idx, snap)
    assert m["n_removed"] == 1 and m["applied"]
    ids, _ = read_pending(idx)
    assert ids.size == 0  # merged and pruned
    dead = doc_id_for_url(pages.column("url")[5].as_py())
    s = LocalSearcher(idx)
    assert dead not in s.ords()
