"""Stage 1: clean — HTML->text resolution, doc-id assignment, exact dedup.

Ray-Data-first shape:

* ``CleanBatch`` is a stateless ``map_batches`` callable over zero-copy Arrow
  batches: resolves ``text`` (falls back to extraction for null text — the
  per-row byte-identity invariant), derives ``doc_id = blake2b64(url)``, adds
  the dedup shuffle key, and DROPS ``html`` immediately (wide binary column
  never enters the shuffle — SURVEY.md §7.3 "wide rows").
* ``dedup_group`` runs per dedup-bucket group after ``groupby(dedup_bucket)``
  — vectorized pandas inside the group (sort + drop_duplicates), one Python
  call per bucket, NOT per url. Keeps the max-``warc_ts`` row per url
  (deterministic batch analogue of the reference's "skip already indexed
  path", ref: engine/src/main/java/org/search/engine/index/
  DocumentIndexManager.java:334-336) and doubles as the doc-id collision
  check (idhash.py): all rows of a url share a doc_id, so bucketing by
  ``doc_id % B`` co-locates both duplicates and would-be collisions.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from search_engine_ray.extract import extract_text
from search_engine_ray.idhash import doc_ids_for_urls

DEDUP_BUCKETS_DEFAULT = 64


class CleanBatch:
    """Stateless Arrow-batch UDF. Besides text resolution and doc ids it
    counts each doc's tokens (``doc_len``) so global stats (N, avgdl) and
    incremental merges read a tiny per-doc int column instead of re-scanning
    the exploded token table."""

    def __init__(self, dedup_buckets: int = DEDUP_BUCKETS_DEFAULT,
                 tokenizer: str = "standard"):
        from search_engine_ray.analyzer.tokenizers import get_tokenizer

        self.dedup_buckets = dedup_buckets
        self._tok = get_tokenizer(tokenizer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        if batch.column("text").null_count:
            htmls = batch.column("html").to_pylist()
            texts = [
                t if t is not None else extract_text(h)
                for t, h in zip(texts, htmls)
            ]
        doc_ids = doc_ids_for_urls(urls)
        doc_lens = [len(self._tok.document_tokens(t)) for t in texts]
        out = pa.table(
            {
                "url": batch.column("url"),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "warc_ts": batch.column("warc_ts"),
                "lang": batch.column("lang"),
                "text": pa.array(texts, pa.string()),
                "doc_len": pa.array(doc_lens, pa.int32()),
                "dedup_bucket": pa.array(
                    doc_ids % self.dedup_buckets, pa.int32()
                ),
            }
        )
        return out


def dedup_group(group: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket exact dedup: keep max warc_ts per url (tie: max text);
    raise on doc-id collisions between distinct urls."""
    g = group.sort_values(["url", "warc_ts", "text"], kind="mergesort")
    g = g.drop_duplicates("url", keep="last")
    # collision check: same doc_id, different url
    dup_ids = g[g.duplicated("doc_id", keep=False)]
    if len(dup_ids):
        raise ValueError(
            f"doc_id hash collision between urls: {sorted(dup_ids['url'])[:4]}"
        )
    return g.drop(columns=["dedup_bucket"])


def filter_lang(batch: pa.Table, langs: list[str]) -> pa.Table:
    """Optional metadata filter (reference's hidden-dir / access filters
    analogue, ref: DocumentIndexManager.java:94-99,338-343)."""
    return batch.filter(pc.is_in(batch.column("lang"), pa.array(langs)))
