"""sync_index: snapshot reconciliation == scratch build, bit-exact;
unchanged snapshot is a bit-stable no-op."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import PAGES_SCHEMA, generate_pages
from search_engine_ray.incremental import sync_index
from search_engine_ray.search import LocalSearcher

CFG = BuildConfig(num_buckets=4)


def _write(table: pa.Table, d: str) -> str:
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "pages.parquet"))
    return d


@pytest.fixture(scope="module")
def synced(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("sync")
    base = generate_pages(90, seed=61)
    rows = base.to_pylist()
    urls = sorted({r["url"] for r in rows})

    # snapshot B: drop 2 urls, change 3 (newer warc_ts + new text), add 2,
    # leave everything else byte-identical
    removed = set(urls[5:7])
    changed = urls[10:13]
    by_url: dict = {}
    for r in rows:
        if r["url"] in removed:
            continue
        cur = by_url.setdefault(r["url"], [])
        cur.append(dict(r))
    for i, u in enumerate(changed):
        for r in by_url[u]:
            r["warc_ts"] = r["warc_ts"].replace(year=2025)
            r["text"] = (r["text"] or "") + f"\nsynced revision syncword{i}"
            r["html"] = b""
    for i in range(2):
        by_url[f"https://example.org/syncnew/{i:08d}"] = [{
            "url": f"https://example.org/syncnew/{i:08d}",
            "warc_ts": rows[0]["warc_ts"].replace(year=2025),
            "html": b"", "text": f"brand new sync page newsync{i}",
            "lang": "en"}]
    snap_rows = [r for rs in by_url.values() for r in rs]
    snapshot = pa.Table.from_pylist(snap_rows, schema=PAGES_SCHEMA)

    base_dir = _write(base, str(root / "base"))
    snap_dir = _write(snapshot, str(root / "snap"))
    idx = str(root / "idx")
    build_index(base_dir, idx, CFG)
    m = sync_index(idx, snap_dir)
    scratch = str(root / "scratch")
    build_index(snap_dir, scratch, CFG)
    return {"idx": idx, "scratch": scratch, "m": m, "snap": snap_dir,
            "removed": removed, "n_changed": len(changed)}


def test_diff_counts(synced):
    m = synced["m"]
    assert m["applied"] is True
    assert m["n_added"] == 2
    assert m["n_changed"] == synced["n_changed"]
    assert m["n_removed"] == 2


def test_buckets_byte_identical_to_scratch(synced):
    for b in range(CFG.num_buckets):
        t1 = pq.read_table(os.path.join(
            synced["idx"], "buckets", f"bucket={b}", "postings.parquet"))
        t2 = pq.read_table(os.path.join(
            synced["scratch"], "buckets", f"bucket={b}",
            "postings.parquet"))
        assert t1.equals(t2), b


def test_stats_and_searches_match_scratch(synced):
    a = json.load(open(os.path.join(synced["idx"], "global_stats.json")))
    b = json.load(open(os.path.join(synced["scratch"],
                                    "global_stats.json")))
    assert (a["n_docs"], a["total_tokens"], a["avgdl"]) == \
        (b["n_docs"], b["total_tokens"], b["avgdl"])
    s1, s2 = LocalSearcher(synced["idx"]), LocalSearcher(synced["scratch"])
    for q, st in [(["syncword1"], "exact"), (["newsync0"], "exact"),
                  (["mila"], "exact"), (["ma"], "prefix"),
                  (["sync*"], "wildcard")]:
        assert s1.search(q, st, k=50, with_urls=True).equals(
            s2.search(q, st, k=50, with_urls=True)), (q, st)
    hits = s1.search(["mila"], "exact", k=90, with_urls=True)
    assert not synced["removed"] & set(hits.column("url").to_pylist())


def test_identical_snapshot_is_noop(synced):
    """Re-syncing the SAME snapshot changes nothing: no delta applied,
    every artifact byte-stable, no _sync_tmp left behind."""
    import hashlib

    def digest(root):
        h = hashlib.sha256()
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                h.update(p.encode())
                h.update(open(p, "rb").read())
        return h.hexdigest()

    before = digest(synced["idx"])
    m = sync_index(synced["idx"], synced["snap"])
    assert m["applied"] is False
    assert (m["n_added"], m["n_changed"], m["n_removed"]) == (0, 0, 0)
    assert digest(synced["idx"]) == before
    assert not os.path.exists(os.path.join(synced["idx"], "_sync_tmp"))
