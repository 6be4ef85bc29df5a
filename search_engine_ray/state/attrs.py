"""Per-ordinal document attributes (the Lucene doc-values analogue).

Query-time metadata filtering ("BM25 top-k WHERE lang='en'") and facet
counting need an O(1) ordinal -> attribute lookup during scoring. The
reference has no metadata store at all (its Document is a bare
id + path, ref: engine/src/main/java/org/search/engine/model/
Document.java); this module adds the standard column-store design:
``docs_clean`` already persists every page attribute, so the searcher
loads ONE small column, dictionary-encodes it, and keeps codes ordered
by ordinal (ordinal order == doc_id order, state/ordinals.py).

Scale shape: resident cost is 1-4 B/doc for the code array plus the
(tiny) category table — at the 10^8-10^9-doc shard ceiling that is
0.1-4 GB per shard kernel, same ceiling as the ordinal map itself, and
it is loaded lazily (only when a filtered query / facet request first
arrives) and once per searcher process. The scan reads ONLY the two
needed columns from parquet; no row materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq


def attrs_by_ordinal(docs_clean_dir: str, column: str
                     ) -> tuple[np.ndarray, list[str]]:
    """``(codes, categories)`` for one attribute column: ``codes[ord]``
    indexes into the SORTED ``categories`` list (nulls read as ``""``).

    Sorted categories + searchsorted codes (rather than Arrow's
    occurrence-order dictionary encode) make the encoding a pure
    function of the value set — deterministic across file layouts,
    cluster sizes and resumes, like every other index artifact."""
    t = pq.read_table(docs_clean_dir, columns=["doc_id", column])
    vals = pc.fill_null(pc.cast(t.column(column), "string"), "")
    if hasattr(vals, "combine_chunks"):
        vals = vals.combine_chunks()
    enc = vals.dictionary_encode()  # one Arrow C++ pass, no Python rows
    cats = enc.dictionary.to_pylist()  # vocabulary-sized, tiny
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    cat_order = np.argsort(np.asarray(cats, dtype=object), kind="stable")
    rank = np.empty(len(cats), dtype=np.int32)
    rank[cat_order] = np.arange(len(cats), dtype=np.int32)
    order = np.argsort(t.column("doc_id").to_numpy(), kind="stable")
    return rank[idx][order], [cats[i] for i in cat_order]


def numeric_by_ordinal(docs_clean_dir: str, column: str) -> np.ndarray:
    """``values[ord]`` for one NUMERIC attribute column as int64/float64
    (timestamps read as int64 microseconds since epoch — the Arrow
    storage unit, so range bounds can be given in either datetimes cast
    by the caller or raw microseconds). Same resident cost and lazy
    once-per-searcher load as the dictionary codes above."""
    import pyarrow as pa

    t = pq.read_table(docs_clean_dir, columns=["doc_id", column])
    col = t.column(column)
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.int64())
    vals = col.to_numpy(zero_copy_only=False)
    if not np.issubdtype(vals.dtype, np.number):
        raise KeyError(f"attribute column {column!r} is not numeric")
    order = np.argsort(t.column("doc_id").to_numpy(), kind="stable")
    return vals[order]
