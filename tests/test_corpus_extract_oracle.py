"""Corpus generator determinism, extraction invariant, oracle sanity."""

import pyarrow as pa

from search_engine_ray.corpus import PARITY_TEXTS, generate_pages
from search_engine_ray.extract import extract_text
from search_engine_ray.idhash import doc_id_for_url, doc_ids_for_urls
from search_engine_ray.oracle import OracleIndex, dedup_latest, resolve_text


def test_corpus_deterministic():
    a = generate_pages(100, seed=42)
    b = generate_pages(100, seed=42)
    assert a.equals(b)
    c = generate_pages(100, seed=43)
    assert not a.equals(c)


def test_corpus_has_nulls_and_dups(small_pages):
    t = small_pages
    assert t.column("text").null_count > 0
    urls = t.column("url").to_pylist()
    assert len(urls) > len(set(urls))  # duplicate urls present


def test_extraction_byte_identical_per_url(small_pages):
    """The BASELINE.json per-row invariant: extracting html reproduces the
    ground-truth text byte-identically, including rows where text is null
    (generator keeps ground truth inside html)."""
    for row in small_pages.to_pylist():
        extracted = extract_text(row["html"])
        if row["text"] is not None:
            assert extracted == row["text"], row["url"]


def test_parity_rows_present(small_pages):
    texts = small_pages.column("text").to_pylist()
    for t in PARITY_TEXTS:
        assert t in texts


def test_doc_id_stable_and_batch_consistent():
    urls = [f"https://example.org/x/{i}" for i in range(50)]
    batch = doc_ids_for_urls(urls)
    for i, u in enumerate(urls):
        assert batch[i] == doc_id_for_url(u)
        assert batch[i] >= 0
    # no collisions on this small set
    assert len(set(batch.tolist())) == 50


def test_dedup_latest_keeps_max_ts():
    t = pa.table(
        {
            "url": ["a", "a", "b"],
            "warc_ts": pa.array([1, 2, 1], pa.timestamp("us")),
            "html": [b"", b"", b""],
            "text": ["old", "new", "b"],
            "lang": ["en"] * 3,
        }
    )
    rows = dedup_latest(t)
    assert [(r["url"], r["text"]) for r in rows] == [("a", "new"), ("b", "b")]


def test_oracle_parity_queries(small_oracle):
    """Reference fixture expectations (FIXTURES.md §2) through the oracle."""
    o = small_oracle
    url2 = "https://example.org/parity/00000002"
    url3 = "https://example.org/parity/00000003"
    mila = {u for _, _, u in o.search(["mila"], "exact", k=100)}
    assert {url2, url3} <= mila
    mam = {u for _, _, u in o.search(["mam"], "prefix", k=100)}
    assert url2 in mam and url3 not in mam
    mil = {u for _, _, u in o.search(["mil"], "prefix", k=100)}
    assert {url2, url3} <= mil
    assert o.search(["zzz_no_such_term"], "exact") == []


def test_oracle_ranking_properties(small_oracle):
    o = small_oracle
    res = o.search(["mila"], "exact", k=100)
    scores = [s for _, s, _ in res]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # doc with higher tf ('mila' once each... row2 len 8, row3 len 5) —
    # shorter doc scores higher at equal tf
    by_url = {u: s for _, s, u in res}
    assert by_url["https://example.org/parity/00000003"] > by_url[
        "https://example.org/parity/00000002"
    ]


def test_oracle_matched_rows(small_oracle):
    o = small_oracle
    d = doc_id_for_url("https://example.org/parity/00000002")
    rows = o.matched_rows(d, "mama")
    assert rows == {1: [0, 18]}  # "mama mila doma hi mama i am here"


def test_resolve_text_null_falls_back_to_html(small_pages):
    saw_null = False
    for row in small_pages.to_pylist():
        if row["text"] is None:
            saw_null = True
            assert len(resolve_text(row["text"], row["html"])) > 0
    assert saw_null
