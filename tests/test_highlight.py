"""Highlight/snippet parity: spans from stored positions must equal a
naive re-scan of the stored text, and every span must actually cover the
term on its line (reference FileSelectionListener paints
[col, col + len(query)) at line rowNumber)."""

import pyarrow.parquet as pq
import pytest

from search_engine_ray.highlight import (
    HIGHLIGHT_SCHEMA,
    highlight_doc,
    search_highlights,
)
from search_engine_ray.search import LocalSearcher


@pytest.fixture(scope="module")
def searcher(built_index):
    return LocalSearcher(built_index)


def test_spans_cover_the_term(searcher):
    t = search_highlights(searcher, ["mila"], "exact", k=5)
    assert t.schema.equals(HIGHLIGHT_SCHEMA)
    assert t.num_rows > 0
    for row in t.to_pylist():
        assert row["starts"] and len(row["starts"]) == len(row["ends"])
        for s, e in zip(row["starts"], row["ends"]):
            assert row["line"][s:e] == "mila", (row["row"], s, e)


def test_stored_positions_equal_rescan(searcher, small_oracle):
    """Positions-backed highlighting == the reference's query-time
    re-tokenize over the stored text, for every hit of several terms."""
    from search_engine_ray.highlight import _doc_text, _scan_rows

    for term in ["mila", "koba", "sentinel000"]:
        hits = searcher.search([term], "exact", k=10, with_urls=False)
        for doc_id in hits.column("doc_id").to_pylist():
            text = _doc_text(searcher, doc_id)
            got = {m["row"]: m["spans"]
                   for m in highlight_doc(searcher, doc_id, [term],
                                          text=text)}
            want = {row: sorted((c, c + len(term)) for c in cols)
                    for row, cols in _scan_rows(searcher, text,
                                                term).items()}
            assert got == want, (term, doc_id)


def test_prefix_highlights_every_expanded_term(searcher):
    terms = searcher.expand(["mil"], "prefix")
    assert len(terms) >= 1
    t = search_highlights(searcher, ["mil"], "prefix", k=5)
    for row in t.to_pylist():
        for s, e in zip(row["starts"], row["ends"]):
            assert row["line"][s:e] in terms


def test_fuzzy_highlights_every_expanded_term(searcher):
    """Highlighting composes with the fuzzy expansion: every painted
    span is one of the Levenshtein-<=1 neighbours of the query word."""
    terms = searcher.expand(["milo"], "fuzzy")
    assert "mila" in terms
    t = search_highlights(searcher, ["milo"], "fuzzy", k=5)
    assert t.num_rows > 0
    for row in t.to_pylist():
        for s, e in zip(row["starts"], row["ends"]):
            assert row["line"][s:e] in terms


def test_no_hits_empty_table(searcher):
    t = search_highlights(searcher, ["zzz_none"], "exact", k=5)
    assert t.num_rows == 0 and t.schema.equals(HIGHLIGHT_SCHEMA)


def test_positionless_index_falls_back(ray_session, small_pages,
                                       tmp_path_factory):
    """An index built with store_positions=False produces the same
    highlights via the text re-scan fallback."""
    from search_engine_ray.build import BuildConfig, build_index

    root = tmp_path_factory.mktemp("idx_nopos")
    pages_dir = root / "pages"
    pages_dir.mkdir()
    pq.write_table(small_pages, str(pages_dir / "pages-0.parquet"))
    build_index(str(pages_dir), str(root / "index"),
                BuildConfig(num_buckets=8, store_positions=False))
    s = LocalSearcher(str(root / "index"))
    t = search_highlights(s, ["mila"], "exact", k=5)
    assert t.num_rows > 0
    for row in t.to_pylist():
        for a, e in zip(row["starts"], row["ends"]):
            assert row["line"][a:e] == "mila"
