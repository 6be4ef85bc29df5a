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
* df(term) — summed across shards AT QUERY TIME (one O(log vocab) lookup
  per shard per term; at real scale a merged term-stats sidecar would be
  built once instead — same numbers).

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
    metrics.update(stats)
    return metrics


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

    def _expand(self, queries: list[str], search_type: str) -> list[str]:
        if search_type == "prefix":
            terms: set[str] = set()
            for sh in self.shards:
                terms.update(sh.expand(queries, "prefix"))
            return sorted(terms)
        if search_type == "exact":
            terms = set(queries[:1])
        else:
            terms = set(queries)
        present = {t for t in terms
                   if any(sh._posting_for(t) is not None
                          for sh in self.shards)}
        if search_type == "and" and present != terms:
            return []
        return sorted(present)

    def _global_idf(self, term: str) -> float:
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
