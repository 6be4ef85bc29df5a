"""Segment merge (merge_indexes) == from-scratch build, bit-exact.

The Lucene-compaction analogue: two independently built index snapshots
merge into one WITHOUT re-tokenizing; every artifact the scratch build
produces over the concatenated pages must come out byte-identical
(the apply_delta identity argument: same explode + same encode kernel).
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import PAGES_SCHEMA, generate_pages
from search_engine_ray.incremental import merge_indexes
from search_engine_ray.search import LocalSearcher

CFG = BuildConfig(num_buckets=4)


def _write(table: pa.Table, d: str) -> str:
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "pages.parquet"))
    return d


@pytest.fixture(scope="module")
def merged(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("segmerge")
    # disjoint url namespaces (include_parity only on A — parity urls are
    # split-independent and would otherwise collide)
    pages_a = generate_pages(80, seed=31, split="sega")
    pages_b = generate_pages(60, seed=32, split="segb",
                             include_parity=False)
    # one genuine url collision: B re-crawls an A url later with new text
    rows_a = pages_a.to_pylist()
    recrawl = dict(max((r for r in rows_a), key=lambda r: r["url"]))
    recrawl["warc_ts"] = recrawl["warc_ts"].replace(year=2025)
    recrawl["text"] = (recrawl["text"] or "") + "\nrecrawled fresh segword"
    recrawl["html"] = b""
    pages_b = pa.Table.from_pylist(pages_b.to_pylist() + [recrawl],
                                   schema=PAGES_SCHEMA)

    dir_a = _write(pages_a, str(root / "pa"))
    dir_b = _write(pages_b, str(root / "pb"))
    # scratch ground truth over A-then-B input order
    union_dir = str(root / "pu")
    os.makedirs(union_dir)
    pq.write_table(pages_a, os.path.join(union_dir, "a_pages.parquet"))
    pq.write_table(pages_b, os.path.join(union_dir, "b_pages.parquet"))

    idx_a = str(root / "ia")
    idx_b = str(root / "ib")
    idx_m = str(root / "im")
    idx_s = str(root / "is")
    build_index(dir_a, idx_a, CFG)
    build_index(dir_b, idx_b, CFG)
    m = merge_indexes(idx_a, idx_b, idx_m)
    build_index(union_dir, idx_s, CFG)
    return {"a": idx_a, "b": idx_b, "m": idx_m, "s": idx_s,
            "metrics": m, "recrawl_url": recrawl["url"]}


def test_stats_match_scratch(merged):
    a = json.load(open(os.path.join(merged["m"], "global_stats.json")))
    b = json.load(open(os.path.join(merged["s"], "global_stats.json")))
    assert a["n_docs"] == b["n_docs"]
    assert a["total_tokens"] == b["total_tokens"]
    assert a["avgdl"] == b["avgdl"]
    assert merged["metrics"]["n_collisions"] == 1


def test_buckets_byte_identical_to_scratch(merged):
    for b in range(CFG.num_buckets):
        t1 = pq.read_table(os.path.join(
            merged["m"], "buckets", f"bucket={b}", "postings.parquet"))
        t2 = pq.read_table(os.path.join(
            merged["s"], "buckets", f"bucket={b}", "postings.parquet"))
        if not t1.equals(t2):
            bad = [c for c in t1.column_names
                   if not t1.column(c).equals(t2.column(c))]
            raise AssertionError(f"bucket {b} differs in columns {bad}")


def test_searches_match_scratch(merged):
    s1 = LocalSearcher(merged["m"])
    s2 = LocalSearcher(merged["s"])
    for q, st in [(["mila"], "exact"), (["segword"], "exact"),
                  (["recrawled"], "exact"), (["ma"], "prefix"),
                  (["m?la"], "wildcard"), (["fresh", "segword"], "or"),
                  (["mila", "mama"], "and")]:
        r1 = s1.search(q, st, k=50, with_urls=True)
        r2 = s2.search(q, st, k=50, with_urls=True)
        assert r1.equals(r2), (q, st)
    # the recrawled copy won: its new token is findable, exactly once
    hit = s1.search(["segword"], "exact", k=10, with_urls=True)
    assert merged["recrawl_url"] in hit.column("url").to_pylist()


def test_collision_takes_newer_side(merged):
    """The losing (older) A-side copy of the recrawled url contributes
    nothing: total doc count is |A| + |B| - 1."""
    na = json.load(open(os.path.join(merged["a"], "global_stats.json")))
    nb = json.load(open(os.path.join(merged["b"], "global_stats.json")))
    nm = json.load(open(os.path.join(merged["m"], "global_stats.json")))
    assert nm["n_docs"] == na["n_docs"] + nb["n_docs"] - 1


def test_rejects_config_mismatch(ray_session, tmp_path):
    pages = generate_pages(30, seed=33, split="segc",
                           include_parity=False)
    d = _write(pages, str(tmp_path / "p"))
    i1 = str(tmp_path / "i1")
    i2 = str(tmp_path / "i2")
    build_index(d, i1, BuildConfig(num_buckets=4))
    build_index(d, i2, BuildConfig(num_buckets=8))
    with pytest.raises(ValueError, match="config_hash mismatch"):
        merge_indexes(i1, i2, str(tmp_path / "out"))
