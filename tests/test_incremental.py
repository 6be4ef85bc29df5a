"""Incremental maintenance: delta-merge == from-scratch rebuild
(FIXTURES.md §5; reference DocumentUpdateTask/DocumentRemoveTask semantics)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages
from search_engine_ray.incremental import apply_delta, remove_urls
from search_engine_ray.search import LocalSearcher

CFG = BuildConfig(num_buckets=4)


def _write(table: pa.Table, d: str) -> str:
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "pages.parquet"))
    return d


@pytest.fixture(scope="module")
def scenario(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    base = generate_pages(100, seed=3)
    rows = base.to_pylist()
    urls = sorted({r["url"] for r in rows})

    changed = urls[10:15]
    deleted = urls[20:22]
    new_rows = []
    for i, u in enumerate(changed):
        old = max((r for r in rows if r["url"] == u),
                  key=lambda r: r["warc_ts"])
        nr = dict(old)
        nr["text"] = (old["text"] or "") + f"\nedited version {i} freshword{i}"
        nr["html"] = b""
        nr["warc_ts"] = old["warc_ts"].replace(year=2025)
        new_rows.append(nr)
    for i in range(3):
        new_rows.append({
            "url": f"https://example.org/newdoc/{i:08d}",
            "warc_ts": rows[0]["warc_ts"].replace(year=2025),
            "html": b"",
            "text": f"brand new page number {i} with newword{i}",
            "lang": "en",
        })
    from search_engine_ray.corpus import PAGES_SCHEMA

    delta = pa.Table.from_pylist(new_rows, schema=PAGES_SCHEMA)

    # merged ground truth: all base rows except deleted/changed urls'
    # superseded versions + the delta rows
    merged_rows = [r for r in rows if r["url"] not in set(deleted)]
    merged_rows += new_rows  # delta rows win by warc_ts (2025)
    merged = pa.Table.from_pylist(merged_rows, schema=PAGES_SCHEMA)

    base_dir = _write(base, str(root / "base_pages"))
    delta_dir = _write(delta, str(root / "delta_pages"))
    merged_dir = _write(merged, str(root / "merged_pages"))

    idx_incr = str(root / "idx_incr")
    build_index(base_dir, idx_incr, CFG)
    apply_delta(idx_incr, delta_dir, deleted_urls=deleted, config=CFG)

    idx_scratch = str(root / "idx_scratch")
    build_index(merged_dir, idx_scratch, CFG)
    return {"incr": idx_incr, "scratch": idx_scratch, "deleted": deleted,
            "changed": changed}


def test_stats_match_scratch(scenario):
    import json

    a = json.load(open(os.path.join(scenario["incr"], "global_stats.json")))
    b = json.load(open(os.path.join(scenario["scratch"], "global_stats.json")))
    assert a["n_docs"] == b["n_docs"]
    assert a["total_tokens"] == b["total_tokens"]
    assert a["avgdl"] == b["avgdl"]


def test_buckets_byte_identical_to_scratch(scenario):
    for b in range(CFG.num_buckets):
        t1 = pq.read_table(os.path.join(
            scenario["incr"], "buckets", f"bucket={b}", "postings.parquet"))
        t2 = pq.read_table(os.path.join(
            scenario["scratch"], "buckets", f"bucket={b}", "postings.parquet"))
        if not t1.equals(t2):
            bad = [c for c in t1.column_names
                   if not t1.column(c).equals(t2.column(c))]
            raise AssertionError(f"bucket {b} differs in columns {bad}")


def test_searches_match_scratch(scenario):
    s1 = LocalSearcher(scenario["incr"])
    s2 = LocalSearcher(scenario["scratch"])
    for q, st in [(["mila"], "exact"), (["freshword0"], "exact"),
                  (["newword1"], "exact"), (["edited"], "exact"),
                  (["ma"], "prefix"), (["brand", "new"], "or")]:
        r1 = s1.search(q, st, k=50, with_urls=True)
        r2 = s2.search(q, st, k=50, with_urls=True)
        assert r1.equals(r2), (q, st)
    # deleted urls must not be findable
    deleted = set(scenario["deleted"])
    for b in range(CFG.num_buckets):
        pass
    res = s1.search(["mila"], "exact", k=100)
    assert not deleted & set(res.column("url").to_pylist())


def test_delta_rejects_mismatched_config(scenario):
    """A caller-supplied config whose hash differs from the index's stored
    config must be rejected (it would merge the wrong bucket subset)."""
    with pytest.raises(ValueError, match="stored config"):
        apply_delta(scenario["incr"], None, deleted_urls=["http://x/"],
                    config=BuildConfig(num_buckets=64))


def test_delta_uses_stored_config(ray_session, tmp_path):
    """config=None loads the effective config from the root manifest —
    num_buckets comes from the index, not the BuildConfig default."""
    base = generate_pages(40, seed=11)
    base_dir = _write(base, str(tmp_path / "pages"))
    idx = str(tmp_path / "idx")
    build_index(base_dir, idx, BuildConfig(num_buckets=4))
    s = LocalSearcher(idx)
    hit = s.search(["mila"], "exact", k=10)
    assert hit.num_rows >= 1
    url = hit.column("url")[0].as_py()
    apply_delta(idx, None, deleted_urls=[url])  # no config supplied
    s2 = LocalSearcher(idx)
    assert url not in s2.search(["mila"], "exact", k=50
                                ).column("url").to_pylist()


def test_pure_deletion(ray_session, tmp_path):
    base = generate_pages(60, seed=9)
    base_dir = _write(base, str(tmp_path / "pages"))
    idx = str(tmp_path / "idx")
    build_index(base_dir, idx, CFG)
    s = LocalSearcher(idx)
    hit = s.search(["mila"], "exact", k=10)
    assert hit.num_rows == 2
    url = hit.column("url")[0].as_py()
    remove_urls(idx, [url], config=CFG)
    s2 = LocalSearcher(idx)
    res = s2.search(["mila"], "exact", k=10)
    assert url not in res.column("url").to_pylist()
    assert res.num_rows == 1
