"""Doc-sharded indexes — the 10^12-document topology.

A single term-partitioned index assumes its doc-ordinal map (8 B/doc) and
per-bucket groups fit a node. Past ~10^9 docs, production engines partition
the DOC SPACE into independent shards (Lucene segments, ES/Vespa shards):
each shard is a complete index over its doc subset, queries fan out to all
shards and merge top-k. Both axes compose here — doc shards x term buckets.

Correctness: a document's full BM25 score is computable entirely within its
shard IF the shard scores with GLOBAL collection statistics:

* N, avgdl — aggregated at build time into the root ``global_stats.json``
  and injected into every shard searcher (``stats_override``),
* df(term) — merged across shards AT BUILD TIME into a term-stats sidecar
  (``term_stats/bucket=*/df.parquet``, term-sorted per term bucket): one
  binary search per term at query time, no per-term shard fan-out. Built
  by ``build_sharded``; a missing sidecar (older index) falls back to the
  query-time shard-sum — same numbers either way (tests/test_sharded.py).

With those, per-shard top-k merge is EXACT: results are bit-identical to a
single-shard build over the same corpus (tests/test_sharded.py).

Sharding key: ``blake2b64(url) % D`` — deterministic, uniform, and stable
under resume/retries, and duplicate urls land in one shard so per-shard
dedup equals global dedup.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.codec import bm25_idf
from search_engine_ray.search import (
    RESULT_SCHEMA,
    LocalSearcher,
    _topk_indices,
)
from search_engine_ray.state.manifest import atomic_write_json


def build_sharded(
    input_path: str | list[str],
    root: str,
    num_doc_shards: int,
    config: BuildConfig | None = None,
    resume: bool = True,
) -> dict:
    """Partition pages by doc shard, build one full index per shard,
    aggregate global stats."""
    cfg = config or BuildConfig()
    os.makedirs(root, exist_ok=True)
    shard_pages = os.path.join(root, "pages_by_shard")

    if not os.path.exists(os.path.join(shard_pages, "_done")):
        from search_engine_ray.build import _expand_inputs
        from search_engine_ray.idhash import doc_ids_for_urls

        def add_shard(batch: pa.Table) -> pa.Table:
            ids = doc_ids_for_urls(batch.column("url").to_pylist())
            return batch.append_column(
                "shard_part",
                pa.array(ids % num_doc_shards, pa.int32()),
            )

        ds = rd.read_parquet(_expand_inputs(input_path))
        ds = ds.map_batches(add_shard, batch_format="pyarrow")
        ds.write_parquet(shard_pages, partition_cols=["shard_part"])
        open(os.path.join(shard_pages, "_done"), "w").write("ok")

    metrics = {"shards": []}
    total_docs = 0
    total_tokens = 0
    for s in range(num_doc_shards):
        sdir = os.path.join(shard_pages, f"shard_part={s}")
        idx = os.path.join(root, f"shard={s}")
        m = build_index(sdir, idx, cfg, resume=resume)
        with open(os.path.join(idx, "global_stats.json")) as f:
            st = json.load(f)
        total_docs += st["n_docs"]
        total_tokens += st["total_tokens"]
        metrics["shards"].append({"shard": s, "n_docs": st["n_docs"],
                                  "seconds": m["total_seconds"]})
    stats = {
        "n_docs": int(total_docs),
        "total_tokens": int(total_tokens),
        "avgdl": (total_tokens / total_docs) if total_docs else 0.0,
        "num_doc_shards": num_doc_shards,
    }
    atomic_write_json(os.path.join(root, "global_stats.json"), stats)
    build_term_stats(root, num_doc_shards, cfg.num_buckets)
    metrics.update(stats)
    return metrics


TERM_STATS_DIR = "term_stats"


def build_term_stats(root: str, num_doc_shards: int,
                     num_buckets: int) -> None:
    """Merge per-shard df into the global term-stats sidecar: one task per
    term bucket reads ONLY the (term, df) columns of that bucket from every
    shard (parquet column pruning — posting blobs stay on disk) and writes
    a term-sorted (term, df) file. O(vocab) bytes total."""
    import pandas as pd

    def merge_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in batch.iterrows():
            b = int(row["bucket"])
            parts = []
            for s in range(num_doc_shards):
                p = os.path.join(root, f"shard={s}", "buckets",
                                 f"bucket={b}", "postings.parquet")
                import pyarrow.parquet as pq

                parts.append(pq.read_table(p, columns=["term", "df"]))
            t = pa.concat_tables(parts)
            df = (t.to_pandas().groupby("term", as_index=False)["df"].sum()
                  .sort_values("term"))
            bdir = os.path.join(root, TERM_STATS_DIR, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            import pyarrow.parquet as pq

            pq.write_table(
                pa.table({"term": pa.array(df["term"], pa.string()),
                          "df": pa.array(df["df"].astype("int64"))}),
                os.path.join(bdir, "df.parquet"))
            out.append((b, len(df)))
        return pd.DataFrame(out, columns=["bucket", "n_terms"])

    items = [{"bucket": b} for b in range(num_buckets)]
    rd.from_items(items, override_num_blocks=len(items)).map_batches(
        merge_buckets, batch_format="pandas", batch_size=1).materialize()


class ShardedSearcher:
    """Fan-out / merge searcher over doc shards (exact, rank-identical to an
    unsharded index). Per shard this uses the LocalSearcher kernel; at
    cluster scale each shard kernel becomes an actor (serve.py pattern)."""

    def __init__(self, root: str):
        with open(os.path.join(root, "global_stats.json")) as f:
            self.stats = json.load(f)
        self.num_doc_shards = int(self.stats["num_doc_shards"])
        override = {"n_docs": self.stats["n_docs"],
                    "avgdl": self.stats["avgdl"]}
        self.shards = [
            LocalSearcher(os.path.join(root, f"shard={s}"),
                          stats_override=override)
            for s in range(self.num_doc_shards)
        ]
        self.n_docs = int(self.stats["n_docs"])
        self.num_buckets = self.shards[0].num_buckets
        self._ts_root = os.path.join(root, TERM_STATS_DIR)
        self._has_sidecar = os.path.isdir(self._ts_root)
        self._ts_cache: dict[int, tuple[list[str], np.ndarray]] = {}

    # --- merged term-stats sidecar ---------------------------------------

    def _ts_bucket(self, b: int) -> tuple[list[str], np.ndarray]:
        hit = self._ts_cache.get(b)
        if hit is None:
            import pyarrow.parquet as pq

            t = pq.read_table(
                os.path.join(self._ts_root, f"bucket={b}", "df.parquet"))
            hit = (t.column("term").to_pylist(),
                   t.column("df").to_numpy())
            self._ts_cache[b] = hit
        return hit

    def _sidecar_df(self, term: str) -> int:
        """Global df from the build-time sidecar: ONE binary search."""
        from bisect import bisect_left

        from search_engine_ray.stages.tokenize import term_bucket

        terms, dfs = self._ts_bucket(term_bucket(term, self.num_buckets))
        i = bisect_left(terms, term)
        if i < len(terms) and terms[i] == term:
            return int(dfs[i])
        return 0

    def _expand(self, queries: list[str], search_type: str) -> list[str]:
        if search_type == "prefix":
            if self._has_sidecar:
                # term-sorted sidecar buckets replace the shard fan-out
                from bisect import bisect_left

                p = queries[0]
                terms: set[str] = set()
                for b in range(self.num_buckets):
                    ts, _ = self._ts_bucket(b)
                    for i in range(bisect_left(ts, p), len(ts)):
                        if not ts[i].startswith(p):
                            break
                        terms.add(ts[i])
                return sorted(terms)
            terms = set()
            for sh in self.shards:
                terms.update(sh.expand(queries, "prefix"))
            return sorted(terms)
        if search_type == "exact":
            terms = set(queries[:1])
        else:
            terms = set(queries)
        if self._has_sidecar:
            present = {t for t in terms if self._sidecar_df(t) > 0}
        else:
            present = {t for t in terms
                       if any(sh._posting_for(t) is not None
                              for sh in self.shards)}
        if search_type == "and" and present != terms:
            return []
        return sorted(present)

    def _global_idf(self, term: str) -> float:
        if self._has_sidecar:
            return bm25_idf(self.n_docs, self._sidecar_df(term))
        df = sum(
            (sh._posting_for(term) or {"df": 0})["df"] for sh in self.shards
        )
        return bm25_idf(self.n_docs, df)

    def search(self, queries: list[str], search_type: str = "exact",
               k: int = 10, with_urls: bool = True) -> pa.Table:
        terms = self._expand(queries, search_type)
        idfs = {t: self._global_idf(t) for t in terms}
        parts = []  # (doc_id, score) per shard
        for sh in self.shards:
            gathered = []
            for t in terms:  # lexicographic — float-order invariant
                rec = sh._posting_for(t)
                if rec is not None:
                    gathered.append((t, rec, idfs[t]))
            if search_type == "and":
                if len(gathered) < len(terms):
                    continue  # a required term is absent from this shard
                ids, scs = sh._score_and(gathered, k)
            else:
                ids, scs = sh._score_taat(gathered, k)
            if len(ids):
                parts.append((sh.ords()[ids], scs, sh))
        if parts:
            all_ids = np.concatenate([p[0] for p in parts])
            all_scs = np.concatenate([p[1] for p in parts])
            top = _topk_indices(all_ids, all_scs, k)
            ids, scores = all_ids[top], all_scs[top]
        else:
            ids = np.empty(0, np.int64)
            scores = np.empty(0, np.float64)
        urls = [""] * len(ids)
        if with_urls and len(ids):
            lookup = {}
            for _, _, sh in parts:
                if sh._url_of is None:
                    sh._load_docmap()
                lookup.update(sh._url_of)
            urls = [lookup.get(int(d), "") for d in ids]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int32)),
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=RESULT_SCHEMA,
        )
