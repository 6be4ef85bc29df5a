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
    SCORER_AUTO_BMW_DOCS,
    LocalSearcher,
    _topk_indices,
)
from search_engine_ray.state.manifest import atomic_write_json


from search_engine_ray._compat import patch_http_fs_probe as \
    _patch_http_fs_probe  # moved to _compat (build_index needs it too)


def build_sharded(
    input_path: str | list[str],
    root: str,
    num_doc_shards: int,
    config: BuildConfig | None = None,
    resume: bool = True,
    shard_concurrency: int | None = None,
) -> dict:
    """Partition pages by doc shard, build one full index per shard,
    aggregate global stats.

    Shard builds run CONCURRENTLY (bounded driver thread pool,
    ``shard_concurrency`` in flight, default min(4, D)): each build's
    serial sections — stage barriers, manifest commits, the stats pass —
    overlap another shard's Ray stages instead of stacking D deep, while
    the Ray scheduler multiplexes the cluster across the in-flight
    builds. Per-shard wall intervals are returned so tests can assert
    the overlap."""
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

    import time
    from concurrent.futures import ThreadPoolExecutor

    def build_one(s: int) -> dict:
        sdir = os.path.join(shard_pages, f"shard_part={s}")
        idx = os.path.join(root, f"shard={s}")
        t0 = time.monotonic()
        m = build_index(sdir, idx, cfg, resume=resume)
        t1 = time.monotonic()
        with open(os.path.join(idx, "global_stats.json")) as f:
            st = json.load(f)
        return {"shard": s, "n_docs": st["n_docs"],
                "total_tokens": st["total_tokens"],
                "seconds": m["total_seconds"],
                "t_start": round(t0, 3), "t_end": round(t1, 3)}

    n_par = shard_concurrency or min(4, num_doc_shards)
    if n_par > 1:
        _patch_http_fs_probe()
        with ThreadPoolExecutor(max_workers=n_par) as ex:
            shard_rows = list(ex.map(build_one, range(num_doc_shards)))
    else:
        shard_rows = [build_one(s) for s in range(num_doc_shards)]
    total_docs = sum(r["n_docs"] for r in shard_rows)
    total_tokens = sum(r.pop("total_tokens") for r in shard_rows)
    metrics = {"shards": shard_rows}
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


class TermStatsSidecar:
    """Lazy per-bucket reader of the merged (term, df) sidecar — shared by
    the in-process ShardedSearcher and the DocShardServer driver."""

    def __init__(self, root: str, num_buckets: int):
        self.root = os.path.join(root, TERM_STATS_DIR)
        self.num_buckets = num_buckets
        self.present = os.path.isdir(self.root)
        self._cache: dict[int, tuple[list[str], np.ndarray]] = {}

    def bucket(self, b: int) -> tuple[list[str], np.ndarray]:
        hit = self._cache.get(b)
        if hit is None:
            import pyarrow.parquet as pq

            t = pq.read_table(
                os.path.join(self.root, f"bucket={b}", "df.parquet"))
            hit = (t.column("term").to_pylist(), t.column("df").to_numpy())
            self._cache[b] = hit
        return hit

    def df(self, term: str) -> int:
        from bisect import bisect_left

        from search_engine_ray.stages.tokenize import term_bucket

        terms, dfs = self.bucket(term_bucket(term, self.num_buckets))
        i = bisect_left(terms, term)
        if i < len(terms) and terms[i] == term:
            return int(dfs[i])
        return 0

    def expand_prefix(self, prefix: str) -> list[str]:
        from bisect import bisect_left

        out: set[str] = set()
        for b in range(self.num_buckets):
            ts, _ = self.bucket(b)
            for i in range(bisect_left(ts, prefix), len(ts)):
                if not ts[i].startswith(prefix):
                    break
                out.add(ts[i])
        return sorted(out)

    def expand_contains(self, infix: str) -> list[str]:
        out: set[str] = set()
        for b in range(self.num_buckets):
            ts, _ = self.bucket(b)
            out.update(t for t in ts if infix in t)
        return sorted(out)

    def expand_wildcard(self, pattern: str) -> list[str]:
        from search_engine_ray.search import _wildcard_regex

        rx = _wildcard_regex(pattern)
        out: set[str] = set()
        for b in range(self.num_buckets):
            ts, _ = self.bucket(b)
            out.update(t for t in ts if rx.match(t))
        return sorted(out)

    def expand_regex(self, pattern: str) -> list[str]:
        from search_engine_ray.search import _regex_compiled

        rx = _regex_compiled(pattern)
        out: set[str] = set()
        for b in range(self.num_buckets):
            ts, _ = self.bucket(b)
            out.update(t for t in ts if rx.fullmatch(t))
        return sorted(out)

    def expand_fuzzy(self, words: list[str],
                     max_edits: int = 1) -> list[str]:
        """Levenshtein expansion against the GLOBAL vocabulary — one
        cached Edit1Vocab per sidecar bucket (fuzzy.py), so repeated
        fuzzy queries pay only the vectorized matrix compares."""
        if not hasattr(self, "_edit1"):
            self._edit1 = {}
        out: set[str] = set()
        for b in range(self.num_buckets):
            ev = self._edit1.get(b)
            if ev is None:
                from search_engine_ray.fuzzy import Edit1Vocab

                ev = self._edit1[b] = Edit1Vocab(self.bucket(b)[0])
            out.update(ev.match_all(words, max_edits))
        return sorted(out)


def build_term_stats(root: str, num_doc_shards: int,
                     num_buckets: int) -> None:
    """Merge per-shard df into the global term-stats sidecar: one task per
    term bucket reads ONLY the (term, df) columns of that bucket from every
    shard (parquet column pruning — posting blobs stay on disk) and writes
    a term-sorted (term, df) file. O(vocab) bytes total."""
    import pandas as pd

    def merge_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in batch["bucket"].astype(int).tolist():
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


def apply_delta_sharded(
    root: str,
    delta_pages_path: str | list[str] | None = None,
    deleted_urls: list[str] | None = None,
) -> dict:
    """Incremental maintenance of a doc-sharded index.

    Delta pages and tombstones route to their shard by the SAME key the
    build used (``blake2b64(url) % D``), each affected shard runs the
    normal ``incremental.apply_delta`` (with its stored config — byte-
    identical to a shard rebuild), then root stats re-aggregate and the
    term-stats sidecar is rebuilt. Untouched shards are not opened."""
    import shutil

    from search_engine_ray.idhash import doc_id_for_url, doc_ids_for_urls
    from search_engine_ray.incremental import apply_delta

    with open(os.path.join(root, "global_stats.json")) as f:
        stats = json.load(f)
    num_doc_shards = int(stats["num_doc_shards"])

    tmp = os.path.join(root, "_delta_by_shard")
    shutil.rmtree(tmp, ignore_errors=True)
    if delta_pages_path is not None:
        from search_engine_ray.build import _expand_inputs

        def add_shard(batch: pa.Table) -> pa.Table:
            ids = doc_ids_for_urls(batch.column("url").to_pylist())
            return batch.append_column(
                "shard_part", pa.array(ids % num_doc_shards, pa.int32()))

        ds = rd.read_parquet(_expand_inputs(delta_pages_path))
        ds = ds.map_batches(add_shard, batch_format="pyarrow")
        ds.write_parquet(tmp, partition_cols=["shard_part"])

    per_shard_deleted: dict[int, list[str]] = {}
    for url in deleted_urls or []:
        per_shard_deleted.setdefault(
            doc_id_for_url(url) % num_doc_shards, []).append(url)

    applied = []
    for s in range(num_doc_shards):
        sdir = os.path.join(tmp, f"shard_part={s}")
        has_pages = os.path.isdir(sdir)
        dels = per_shard_deleted.get(s)
        if not has_pages and not dels:
            continue  # untouched shard: skip entirely
        m = apply_delta(os.path.join(root, f"shard={s}"),
                        sdir if has_pages else None, deleted_urls=dels)
        applied.append({"shard": s, **m})
    shutil.rmtree(tmp, ignore_errors=True)

    # re-aggregate root stats + rebuild the df sidecar
    total_docs = total_tokens = 0
    for s in range(num_doc_shards):
        with open(os.path.join(root, f"shard={s}",
                               "global_stats.json")) as f:
            st = json.load(f)
        total_docs += st["n_docs"]
        total_tokens += st["total_tokens"]
    new_stats = {
        "n_docs": int(total_docs),
        "total_tokens": int(total_tokens),
        "avgdl": (total_tokens / total_docs) if total_docs else 0.0,
        "num_doc_shards": num_doc_shards,
    }
    atomic_write_json(os.path.join(root, "global_stats.json"), new_stats)
    with open(os.path.join(root, "shard=0", "_manifest.json")) as f:
        num_buckets = int(json.load(f)["config"]["num_buckets"])
    build_term_stats(root, num_doc_shards, num_buckets)
    return {"shards_applied": applied, **new_stats}


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
        self._sidecar = TermStatsSidecar(root, self.num_buckets)

    # --- merged term-stats sidecar ---------------------------------------

    @property
    def _has_sidecar(self) -> bool:
        return self._sidecar.present

    @_has_sidecar.setter
    def _has_sidecar(self, v: bool) -> None:  # tests force the fallback
        self._sidecar.present = v

    def _sidecar_df(self, term: str) -> int:
        """Global df from the build-time sidecar: ONE binary search."""
        return self._sidecar.df(term)

    def _expand(self, queries: list[str], search_type: str) -> list[str]:
        if search_type == "prefix":
            if self._has_sidecar:
                # term-sorted sidecar buckets replace the shard fan-out
                return self._sidecar.expand_prefix(queries[0])
            terms = set()
            for sh in self.shards:
                terms.update(sh.expand(queries, "prefix"))
            return sorted(terms)
        if search_type == "contains":
            # infix has no sorted-order shortcut: scan the sidecar's (or
            # every shard's) vocabulary once — vocab-sized, not corpus-sized
            if self._has_sidecar:
                return self._sidecar.expand_contains(queries[0])
            terms = set()
            for sh in self.shards:
                terms.update(sh.expand(queries, "contains"))
            return sorted(terms)
        if search_type == "wildcard":
            if self._has_sidecar:
                return self._sidecar.expand_wildcard(queries[0])
            terms = set()
            for sh in self.shards:
                terms.update(sh.expand(queries, "wildcard"))
            return sorted(terms)
        if search_type == "regex":
            if self._has_sidecar:
                return self._sidecar.expand_regex(queries[0])
            terms = set()
            for sh in self.shards:
                terms.update(sh.expand(queries, "regex"))
            return sorted(terms)
        if search_type in ("fuzzy", "fuzzy2"):
            me = 2 if search_type == "fuzzy2" else 1
            if self._has_sidecar:
                return self._sidecar.expand_fuzzy(list(queries), me)
            terms = set()
            for sh in self.shards:
                terms.update(sh.expand(queries, search_type))
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

    def vocab_terms(self):
        """Global vocabulary (suggestion-expander source): the merged
        term-stats sidecar when present (one tiny (term, df) read per
        bucket), else the union of shard vocabularies."""
        if self._has_sidecar:
            for b in range(self.num_buckets):
                yield from self._sidecar.bucket(b)[0]
            return
        seen: set[str] = set()
        for sh in self.shards:
            for t in sh.vocab_terms():
                if t not in seen:
                    seen.add(t)
                    yield t

    def _global_idf(self, term: str) -> float:
        if self._has_sidecar:
            return bm25_idf(self.n_docs, self._sidecar_df(term))
        df = sum(
            (sh._posting_for(term) or {"df": 0})["df"] for sh in self.shards
        )
        return bm25_idf(self.n_docs, df)

    def phrase_search(self, terms: list[str], k: int = 10,
                      where: dict | None = None) -> pa.Table:
        """Ordered same-line phrase search across doc shards — exact,
        rank-identical to an unsharded index: each shard runs the local
        phrase kernel with GLOBAL-df idfs injected (so scores agree), and
        the per-shard top-k lists merge on the same (score desc, doc_id
        asc) key the local kernel ranks by. A document's phrase match is
        decidable entirely within its shard, so per-shard top-k union
        contains the global top-k."""
        uniq = sorted(set(terms))
        idfs = {t: self._global_idf(t) for t in uniq}
        parts = []
        for sh in self.shards:
            res = sh.phrase_search(terms, k=k, idfs=idfs, where=where)
            if res.num_rows:
                parts.append(res)
        if not parts:
            return pa.table(
                {"rank": pa.array([], pa.int32()),
                 "doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64()),
                 "url": pa.array([], pa.string())}, schema=RESULT_SCHEMA)
        merged = pa.concat_tables(parts)
        ids = merged.column("doc_id").to_numpy()
        scs = merged.column("score").to_numpy()
        top = _topk_indices(ids, scs, k)
        out = merged.take(pa.array(top))
        return pa.table(
            {"rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int32)),
             "doc_id": out.column("doc_id"),
             "score": out.column("score"),
             "url": out.column("url")}, schema=RESULT_SCHEMA)

    def near_search(self, terms: list[str], window: int = 8,
                    k: int = 10, where: dict | None = None) -> pa.Table:
        """Unordered proximity (NEAR/window) across doc shards — exact by
        phrase_search's argument: a doc's window match is shard-local,
        scores use injected GLOBAL-df idfs, per-shard top-k merge."""
        uniq = sorted(set(terms))
        idfs = {t: self._global_idf(t) for t in uniq}
        parts = []
        for sh in self.shards:
            res = sh.near_search(terms, window=window, k=k, idfs=idfs,
                                 where=where)
            if res.num_rows:
                parts.append(res)
        if not parts:
            return pa.table(
                {"rank": pa.array([], pa.int32()),
                 "doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64()),
                 "url": pa.array([], pa.string())}, schema=RESULT_SCHEMA)
        merged = pa.concat_tables(parts)
        ids = merged.column("doc_id").to_numpy()
        scs = merged.column("score").to_numpy()
        top = _topk_indices(ids, scs, k)
        out = merged.take(pa.array(top))
        return pa.table(
            {"rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int32)),
             "doc_id": out.column("doc_id"),
             "score": out.column("score"),
             "url": out.column("url")}, schema=RESULT_SCHEMA)

    def synonym_search(self, groups: list[list[str]], k: int = 10,
                       where: dict | None = None) -> pa.Table:
        """SynonymQuery across doc shards — exact, rank-identical to an
        unsharded index: the pseudo-term's union df is the SUM of
        per-shard union sizes (shards hold disjoint doc sets), so the
        driver computes the GLOBAL group idfs in one fan-out and injects
        them; each shard scores its local merged pseudo-posting with the
        global stats override, and the per-shard top-k lists merge on
        the shared (score desc, doc_id asc) rank key (a doc's group tf
        is shard-local — phrase_search's argument)."""
        per_shard = [sh.synonym_group_df(groups) for sh in self.shards]
        idfs = [bm25_idf(self.n_docs, sum(col))
                for col in zip(*per_shard)]
        parts = []
        for sh in self.shards:
            res = sh.synonym_search(groups, k=k, where=where,
                                    group_idfs=idfs)
            if res.num_rows:
                parts.append(res)
        if not parts:
            return pa.table(
                {"rank": pa.array([], pa.int32()),
                 "doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64()),
                 "url": pa.array([], pa.string())}, schema=RESULT_SCHEMA)
        merged = pa.concat_tables(parts)
        ids = merged.column("doc_id").to_numpy()
        scs = merged.column("score").to_numpy()
        top = _topk_indices(ids, scs, k)
        out = merged.take(pa.array(top))
        return pa.table(
            {"rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int32)),
             "doc_id": out.column("doc_id"),
             "score": out.column("score"),
             "url": out.column("url")}, schema=RESULT_SCHEMA)

    def bool_search(self, query: str, k: int = 10,
                    where: dict | None = None) -> pa.Table:
        """Boolean query across doc shards — exact, rank-identical to an
        unsharded index: membership in any boolean set (complement
        included) is decidable within a document's own shard, so each
        shard runs the local kernel with GLOBAL-df idfs injected and the
        per-shard top-k lists merge on the same (score desc, doc_id asc)
        key (the phrase_search argument verbatim)."""
        from search_engine_ray.boolquery import parse, term_leaves

        idfs = {t: self._global_idf(t)
                for t in sorted(term_leaves(parse(query)))}
        parts = [r for r in (sh.bool_search(query, k=k, idfs=idfs,
                                            where=where)
                             for sh in self.shards) if r.num_rows]
        if not parts:
            return pa.table(
                {"rank": pa.array([], pa.int32()),
                 "doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64()),
                 "url": pa.array([], pa.string())}, schema=RESULT_SCHEMA)
        merged = pa.concat_tables(parts)
        ids = merged.column("doc_id").to_numpy()
        scs = merged.column("score").to_numpy()
        top = _topk_indices(ids, scs, k)
        out = merged.take(pa.array(top))
        return pa.table(
            {"rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int32)),
             "doc_id": out.column("doc_id"),
             "score": out.column("score"),
             "url": out.column("url")}, schema=RESULT_SCHEMA)

    def complete(self, prefix: str, k: int = 10) -> pa.Table:
        """df-ranked autocomplete with GLOBAL dfs: terms from the merged
        sidecar (or shard fan-out), df summed across shards — identical
        to the unsharded complete()."""
        terms = self._expand([prefix], "prefix")
        if self._has_sidecar:
            dfs = [self._sidecar_df(t) for t in terms]
        else:
            dfs = [sum((sh._posting_for(t) or {"df": 0})["df"]
                       for sh in self.shards) for t in terms]
        order = sorted(range(len(terms)),
                       key=lambda i: (-dfs[i], terms[i]))[:k]
        return pa.table({
            "term": pa.array([terms[i] for i in order], pa.string()),
            "df": pa.array([int(dfs[i]) for i in order], pa.int64()),
        })

    def facet_counts(self, queries: list[str], search_type: str = "or",
                     by: str = "lang",
                     where: dict[str, str] | None = None) -> pa.Table:
        """Facets across doc shards (exact: a doc's match set and
        attribute live in its own shard; terms expand globally, counts
        sum)."""
        terms = self._expand(queries, search_type)
        agg: dict[str, int] = {}
        for sh in self.shards:
            t = sh.facet_counts([], search_type, by=by, where=where,
                                terms=terms)
            for v, c in zip(t.column("value").to_pylist(),
                            t.column("n_docs").to_pylist()):
                agg[v] = agg.get(v, 0) + int(c)
        order = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        return pa.table({
            "value": pa.array([v for v, _ in order], pa.string()),
            "n_docs": pa.array([c for _, c in order], pa.int64()),
        })

    def facet_histogram(self, queries: list[str], edges: list[float],
                        search_type: str = "or", by: str = "doc_len",
                        where: dict | None = None) -> pa.Table:
        """Numeric range facets across doc shards: global term expansion,
        per-shard bin counts, element-wise sum (bins are fixed, so the
        merge is exact)."""
        terms = self._expand(queries, search_type)
        # bins come from ``edges`` directly so zero shards returns the
        # all-zero histogram instead of dereferencing a missing table
        total = np.zeros(max(len(edges) - 1, 0), dtype=np.int64)
        for sh in self.shards:
            t = sh.facet_histogram([], edges, search_type, by=by,
                                   where=where, terms=terms)
            total = total + t.column("n_docs").to_numpy()
        return pa.table({
            "bin_lo": pa.array([float(e) for e in edges[:-1]],
                               pa.float64()),
            "bin_hi": pa.array([float(e) for e in edges[1:]],
                               pa.float64()),
            "n_docs": pa.array(total, pa.int64()),
        })

    def search(self, queries: list[str], search_type: str = "exact",
               k: int = 10, with_urls: bool = True,
               scorer: str = "taat",
               where: dict[str, str] | None = None,
               search_after: tuple[float, int] | None = None) -> pa.Table:
        if scorer not in ("taat", "bmw", "auto"):
            raise ValueError(f"unknown scorer {scorer!r}")
        terms = self._expand(queries, search_type)
        idfs = {t: self._global_idf(t) for t in terms}
        parts = []  # (doc_id, score) per shard
        for sh in self.shards:
            gathered = []
            for t in terms:  # lexicographic — float-order invariant
                rec = sh._posting_for(t)
                if rec is not None:
                    gathered.append((t, rec, idfs[t]))
            mask = sh.live_mask(where)
            # cursor translates to each shard's own ordinal space; the
            # per-shard filtered top-k union contains the global one
            after = sh._after_key(search_after)
            # scorer resolves PER SHARD (auto: each shard's own size —
            # both kernels are bit-identical, so mixing is invisible)
            use_bmw = scorer == "bmw" or (
                scorer == "auto"
                and len(sh.ords()) >= SCORER_AUTO_BMW_DOCS)
            if search_type == "and":
                if len(gathered) < len(terms):
                    continue  # a required term is absent from this shard
                ids, scs = sh._score_and(gathered, k, mask=mask,
                                         after=after)
            elif use_bmw:
                ids, scs = sh._score_bmw(gathered, k, mask=mask,
                                         after=after)
            else:
                ids, scs = sh._score_taat(gathered, k, mask=mask,
                                          after=after)
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
            # result-only resolution: route each hit to ITS shard's
            # row-group docmap (shard key == doc_id % D, the build's
            # routing function) — never a whole-docmap union.
            for s, sh in enumerate(self.shards):
                idxs = [i for i, d in enumerate(ids)
                        if int(d) % self.num_doc_shards == s]
                if idxs:
                    for i, u in zip(idxs,
                                    sh.resolve_urls([int(ids[i])
                                                     for i in idxs])):
                        urls[i] = u
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int32)),
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=RESULT_SCHEMA,
        )
