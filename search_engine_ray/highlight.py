"""Result highlighting: matched lines + character spans for search hits.

Reference parity: the Swing app's preview pane highlights, for a selected
result row, every query occurrence on its matched line — the span
``[col, col + len(query))`` at 1-based line ``rowNumber``
(ref: app/src/main/java/org/search/app/listener/FileSelectionListener.java:105-120,
worker/SearchWorker.java:60-70, model/RowFile.java). The reference gets
(rowNumber, positions) from the query result and re-reads the file for
the preview text.

Here the same data is produced as an Arrow table — one output row per
(hit, matched line) with span start/end lists — straight from the STORED
positions (``LocalSearcher.matched_rows``; the build persists packed
(row << 32 | col) per token, cf. analyzer/tokenizers.py:115-121), so no
query-time re-tokenization is needed. Indexes built with
``store_positions=False`` fall back to re-scanning the document's stored
text, which mirrors the reference's query-time re-read
(SimpleSearchManager.java:187-214).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.analyzer.tokenizers import split_lines

HIGHLIGHT_SCHEMA = pa.schema(
    [
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("url", pa.string()),
        ("row", pa.int32()),         # 1-based line number (reference rows)
        ("line", pa.string()),       # the matched line's text
        ("starts", pa.list_(pa.int32())),  # span char starts within line
        ("ends", pa.list_(pa.int32())),    # span char ends (exclusive)
    ]
)


def _doc_text(searcher, doc_id: int) -> str:
    """One document's stored text (row-filtered docs_clean read)."""
    import os

    t = pq.read_table(
        os.path.join(searcher.index_root, "docs_clean"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "=", int(doc_id))],
    )
    return t.column("text")[0].as_py() if t.num_rows else ""


def _scan_rows(searcher, text: str, term: str) -> dict[int, list[int]]:
    """Positions-less fallback: re-tokenize the stored text and collect
    row -> [cols] for ``term`` (the reference's query-time file re-scan)."""
    out: dict[int, list[int]] = {}
    for row, line in enumerate(split_lines(text), start=1):
        cols = [c for tok, c in searcher._tok.tokenize(line) if tok == term]
        if cols:
            out[row] = cols
    return out


def highlight_doc(searcher, doc_id: int, terms: list[str],
                  text: str | None = None) -> list[dict]:
    """Matched lines of one document for ``terms``: a list of
    ``{"row": int, "line": str, "spans": [(start, end), ...]}`` sorted by
    row, spans sorted and deduplicated, span width = len(term) (the
    reference paints len(searchQuery) characters)."""
    has_positions = bool(searcher.config.get("store_positions", True))
    if text is None:
        text = _doc_text(searcher, doc_id)
    spans: dict[int, set] = {}
    for term in sorted(set(terms)):
        rows = (searcher.matched_rows(doc_id, term) if has_positions
                else _scan_rows(searcher, text, term))
        for row, cols in rows.items():
            spans.setdefault(row, set()).update(
                (c, c + len(term)) for c in cols)
    if not spans:
        return []
    lines = split_lines(text)
    return [
        {"row": r, "line": lines[r - 1] if r - 1 < len(lines) else "",
         "spans": sorted(spans[r])}
        for r in sorted(spans)
    ]


def search_highlights(
    searcher,
    queries: list[str],
    search_type: str = "exact",
    k: int = 10,
    scorer: str = "taat",
) -> pa.Table:
    """Search + per-hit matched-line highlights, one output row per
    (hit, matched line) — the flat equivalent of the reference app's
    result table + preview-pane highlight flow. Prefix queries highlight
    every expanded term (the radix-subtree union the app paints)."""
    hits = searcher.search(queries, search_type, k=k, scorer=scorer)
    terms = searcher.expand(queries, search_type)
    cols: dict[str, list] = {k_: [] for k_ in HIGHLIGHT_SCHEMA.names}
    for rank, doc_id, score, url in zip(
        hits.column("rank").to_pylist(),
        hits.column("doc_id").to_pylist(),
        hits.column("score").to_pylist(),
        hits.column("url").to_pylist(),
    ):
        for m in highlight_doc(searcher, doc_id, terms):
            cols["rank"].append(rank)
            cols["doc_id"].append(doc_id)
            cols["score"].append(score)
            cols["url"].append(url)
            cols["row"].append(m["row"])
            cols["line"].append(m["line"])
            cols["starts"].append(
                np.fromiter((s for s, _ in m["spans"]), dtype=np.int32))
            cols["ends"].append(
                np.fromiter((e for _, e in m["spans"]), dtype=np.int32))
    return pa.table(
        {name: pa.array(cols[name], HIGHLIGHT_SCHEMA.field(name).type)
         for name in HIGHLIGHT_SCHEMA.names},
        schema=HIGHLIGHT_SCHEMA,
    )
