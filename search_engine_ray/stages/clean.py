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
        from search_engine_ray.analyzer.tokenizers import (
            get_tokenizer,
            re2_document_token_pattern,
        )

        self.dedup_buckets = dedup_buckets
        self._tok = get_tokenizer(tokenizer)
        # doc_len is counted with Arrow's C-level regex kernel — no Python
        # string allocation; the pattern matches the tokenizer exactly
        # (validated against per-line tokenization in tests)
        self._count_pattern = re2_document_token_pattern(
            self._tok.separators)

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
        doc_lens = pc.count_substring_regex(
            pa.array(texts, pa.string()), pattern=self._count_pattern
        ).cast(pa.int32())
        out = pa.table(
            {
                "url": batch.column("url"),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "warc_ts": batch.column("warc_ts"),
                "lang": batch.column("lang"),
                "text": pa.array(texts, pa.string()),
                "doc_len": doc_lens,
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


def compute_dup_winners(
    input_files: list[str],
    batch_size: int = 8192,
    driver_rows: int = 50_000,
    parallel_rows: int = 20_000_000,
):
    """Light dedup pass: scan ONLY (url, warc_ts) — parquet column pruning
    keeps html/text bytes on disk — and return {doc_id: winner_warc_ts}
    for urls that occur more than once. The heavy pass then just filters
    losers with this broadcast dict instead of shuffling the text payload.

    Also returns ``has_ties``: True when some url has MULTIPLE rows at its
    max warc_ts — the broadcast filter cannot pick one deterministically
    across blocks, so the caller falls back to the full shuffle dedup for
    that build (rare; the shuffle path tie-breaks on text).
    """
    import pyarrow.parquet as pq

    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in input_files)
    # tiny corpus: a driver-side pass over the two columns beats any Ray
    # launch cost (unit tests, single-file deltas). Row-count-gated ONLY
    # — a single LARGE file must still take the distributed path (the
    # footer count above is exact either way).
    if n_rows <= driver_rows:
        import pyarrow as pa_

        t = pa.concat_tables([
            pq.read_table(f, columns=["url", "warc_ts"])
            for f in input_files
        ])
        urls = t.column("url").to_pylist()
        ids = doc_ids_for_urls(urls)
        ts = pc.cast(t.column("warc_ts"), pa_.int64()).to_numpy()
        df = pd.DataFrame({"doc_id": ids, "ts": ts, "url": urls})
        g = df.groupby("doc_id")
        sizes = g.size()
        dup_ids = sizes[sizes > 1].index
        if len(dup_ids) == 0:
            return {}, False
        sub = df[df["doc_id"].isin(dup_ids)]
        if sub.groupby("doc_id")["url"].nunique().gt(1).any():
            raise ValueError("doc_id hash collision between urls")
        winners = sub.groupby("doc_id")["ts"].max()
        at_max = sub.merge(winners.rename("max_ts"), on="doc_id")
        ties = (at_max[at_max["ts"] == at_max["max_ts"]]
                .groupby("doc_id").size() > 1).any()
        return dict(winners.items()), bool(ties)
    if n_rows <= parallel_rows:
        # mid-size: the url hashing (blake2b per url) dominates, so hash
        # per FILE in parallel Ray tasks and do one vectorized numpy merge
        # on the small (id, h2, ts) arrays — the r2 serial driver pass was
        # ~1.4 s at 500k rows and did not shrink with cluster size
        import numpy as np
        import ray

        @ray.remote
        def _file_ids(f: str):
            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq

            t = _pq.read_table(f, columns=["url", "warc_ts"])
            urls = t.column("url").to_pylist()
            return (
                np.asarray(doc_ids_for_urls(urls), dtype=np.int64),
                np.asarray(doc_ids_for_urls([u + "\x00#2" for u in urls]),
                           dtype=np.int64),
                _pc.cast(t.column("warc_ts"), pa.int64()).to_numpy(),
            )

        parts = ray.get([_file_ids.remote(f) for f in input_files])
        ids = np.concatenate([p[0] for p in parts])
        h2 = np.concatenate([p[1] for p in parts])
        ts = np.concatenate([p[2] for p in parts])
        order = np.lexsort((ts, ids))
        ids_s, ts_s, h2_s = ids[order], ts[order], h2[order]
        change = np.flatnonzero(ids_s[1:] != ids_s[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [ids_s.size]))
        lens = ends - starts
        dup = lens > 1
        if not dup.any():
            return {}, False
        coll = (np.minimum.reduceat(h2_s, starts)
                != np.maximum.reduceat(h2_s, starts)) & dup
        if coll.any():
            raise ValueError(
                "doc_id hash collision between urls: ids "
                f"{ids_s[starts[coll]][:4].tolist()}")
        max_ts = ts_s[ends - 1]  # ts-ascending within each id run
        is_max = ts_s == np.repeat(max_ts, lens)
        n_at_max = np.add.reduceat(is_max.astype(np.int64), starts)
        ties = bool((n_at_max[dup] > 1).any())
        winners = dict(zip(ids_s[starts[dup]].tolist(),
                           max_ts[dup].tolist()))
        return winners, ties

    import ray.data as rd

    ds = rd.read_parquet(input_files, columns=["url", "warc_ts"])

    def to_ids(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        return pa.table({
            "doc_id": pa.array(doc_ids_for_urls(urls), pa.int64()),
            # second, independent url hash: detects doc_id collisions
            # between DIFFERENT urls (idhash.py contract)
            "url_h2": pa.array(doc_ids_for_urls(
                [u + "\x00#2" for u in urls]), pa.int64()),
            # int64 micros: avoids pandas/pyarrow timestamp-equality traps
            "warc_ts": pc.cast(batch.column("warc_ts"), pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        col = g.groupby("doc_id")["url_h2"].nunique()
        if (col > 1).any():
            raise ValueError(
                f"doc_id hash collision between urls: ids {list(col[col > 1].index)[:4]}")
        agg = g.groupby("doc_id", as_index=False).agg(
            n=("warc_ts", "size"), max_ts=("warc_ts", "max"))
        dups = agg[agg["n"] > 1]
        if not len(dups):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "max_ts": pd.Series(dtype=g["warc_ts"].dtype),
                                 "n_at_max": pd.Series(dtype="int64")})
        at_max = g.merge(dups[["doc_id", "max_ts"]], on="doc_id")
        at_max = at_max[at_max["warc_ts"] == at_max["max_ts"]]
        n_at_max = at_max.groupby("doc_id").size().rename("n_at_max")
        return dups.merge(n_at_max, on="doc_id")[
            ["doc_id", "max_ts", "n_at_max"]]

    from search_engine_ray.stages.agg import bucketed_group_agg

    dups = bucketed_group_agg(
        ds.map_batches(to_ids, batch_format="pyarrow",
                       batch_size=batch_size),
        ["doc_id"], per_bucket,
    ).to_pandas()
    if len(dups) == 0 or "doc_id" not in dups.columns:
        return {}, False  # no duplicates anywhere
    winners = dict(zip(dups["doc_id"].tolist(), dups["max_ts"].tolist()))
    has_ties = bool((dups["n_at_max"] > 1).any())
    return winners, has_ties


def dedup_filter(batch: pa.Table, winners_ref) -> pa.Table:
    """Drop loser rows of duplicated urls using the broadcast winners map
    (two parallel sorted arrays: ids + winning ts).

    Stateless on purpose: a plain function fuses with the upstream
    CleanBatch map (no actor-pool spawn cost); the ``ray.get`` of the
    broadcast ref is a local object-store hit after the first call.
    Fully vectorized: one searchsorted per batch, no per-row Python."""
    import numpy as np
    import ray

    win_ids, win_ts = ray.get(winners_ref)
    if not len(win_ids):
        return batch
    doc_ids = batch.column("doc_id").to_numpy()
    tss = pc.cast(batch.column("warc_ts"), pa.int64()).to_numpy()
    pos = np.searchsorted(win_ids, doc_ids)
    pos_c = np.minimum(pos, len(win_ids) - 1)
    is_dup = win_ids[pos_c] == doc_ids
    keep = ~is_dup | (tss == win_ts[pos_c])
    return batch.filter(pa.array(keep))


def filter_lang(batch: pa.Table, langs: list[str]) -> pa.Table:
    """Optional metadata filter (reference's hidden-dir / access filters
    analogue, ref: DocumentIndexManager.java:94-99,338-343)."""
    return batch.filter(pc.is_in(batch.column("lang"), pa.array(langs)))
