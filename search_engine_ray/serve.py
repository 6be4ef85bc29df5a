"""Distributed query serving: Ray actors over the index artifacts.

The reference serves queries from one in-heap tree in one JVM
(ref: engine/src/main/java/org/search/engine/search/SimpleSearchManager.java:50-85).
Two actor topologies replace it, both returning results identical to
``LocalSearcher`` (tests/test_serve.py):

* ``SearcherReplicaPool`` — N replica actors, each holding a full
  ``LocalSearcher`` (buckets loaded lazily, cached per actor). One query is
  served entirely by one replica -> linear QPS scaling; the index must be
  loadable per node (bucket files page in on demand). This is the right
  topology while a node can hold the working set.

* ``DocShardServer`` — the doc-partitioned topology (10^12-doc scale,
  sharded.build_sharded layout): one actor per doc shard, each a complete
  index over its doc subset; global df comes from the build-time
  term-stats sidecar, every shard returns its local top-k scored with
  injected global stats, and the driver merges — exact.

* ``BucketShardServer`` — the term-partitioned topology for indexes larger
  than a node: each actor owns a GROUP of term buckets (loaded once in
  ``__init__``); a query's terms are hash-routed to their owning actors,
  each returns its terms' (doc_id, idf*partial) score fragments, and the
  driver accumulates + top-ks. Exact (same float-order invariant: fragments
  are merged in lexicographic term order). Transfer cost is the posting
  size of the query's terms — the same bytes LocalSearcher reads from disk.
  Prefix queries fan out to all shard actors (hash partitioning destroys
  prefix locality — SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from search_engine_ray.codec import bm25_idf
from search_engine_ray.search import (
    RESULT_SCHEMA,
    LocalSearcher,
    _partials,
    _topk_indices,
)
from search_engine_ray.stages.tokenize import term_bucket


def snapshot_fingerprint(index_root: str) -> str:
    """Change signal for hot reload: md5 over the committed manifest and
    global stats bytes. Every mutation path (apply_delta, merge_indexes,
    sync_index, rebuild) rewrites at least one of them; a no-op sync
    leaves both bit-stable, so reload correctly does nothing."""
    import hashlib
    import os

    h = hashlib.md5()
    for name in ("_manifest.json", "global_stats.json"):
        try:
            with open(os.path.join(index_root, name), "rb") as f:
                h.update(f.read())
        except FileNotFoundError:
            h.update(b"-")
        h.update(b"\x00")
    return h.hexdigest()


@ray.remote
class _Replica:
    def __init__(self, index_root: str, cache_size: int = 0):
        self._root = index_root
        self._fp = snapshot_fingerprint(index_root)
        self.searcher = LocalSearcher(index_root)
        self._expander = None  # vocabulary loaded once, on first suggest
        self._cache_size = int(cache_size)
        from collections import OrderedDict

        self._cache: "OrderedDict" = OrderedDict()

    def reload(self) -> bool:
        """Swap in the current on-disk snapshot if it changed since load
        (U4/ST5 serving-side: pick up delta/merge/sync results without an
        actor restart). Returns whether a swap happened. The result
        cache empties on swap — reload IS the invalidation signal.

        Consistency contract: mutate the index, THEN reload(), THEN
        read. Between an on-disk mutation and the reload, queries that
        touch a not-yet-loaded bucket read the NEW bucket file against
        the OLD ordinal map (buckets load lazily) — mixed-generation
        results, exactly the torn read every mutation path's atomic
        artifact commits exist to avoid WITHIN a generation. A strictly
        stale-until-reload guarantee would need eager bucket loading
        (BucketShardServer's _BucketShard does exactly that) or
        generation-pinned file paths; documented, not built — the
        watch_and_serve loop serializes mutate -> reload for you."""
        fp = snapshot_fingerprint(self._root)
        if fp == self._fp:
            return False
        self.searcher = LocalSearcher(self._root)
        self._expander = None
        self._cache.clear()
        self._fp = fp
        return True

    def search(self, queries, search_type, k, scorer, where=None,
               search_after=None):
        """Optional per-replica result LRU (``cache_size`` > 0): results
        are immutable snapshots of one index generation, so a hit is
        exactly the recompute; ``reload()`` clears it. Off by default —
        the bench measures uncached kernels."""
        key = None
        if self._cache_size > 0:
            # range predicates are list/tuple-valued ({"doc_len": [50,
            # 400]}) — normalize to tuples so the frozenset is hashable.
            # The M8 existence generation is part of the key: a
            # mark_deleted between two identical queries must not serve
            # the pre-deletion page from cache.
            key = (tuple(queries), search_type, k, scorer,
                   None if where is None else frozenset(
                       (c, tuple(v) if isinstance(v, (list, tuple)) else v)
                       for c, v in where.items()),
                   search_after, self.searcher.existence_seq())
            hit = self._cache.get(key)
            if hit is not None:
                self._cache.move_to_end(key)
                return hit
        t = self.searcher.search(queries, search_type, k=k, scorer=scorer,
                                 where=where, search_after=search_after)
        if key is not None:
            self._cache[key] = t
            if len(self._cache) > self._cache_size:
                self._cache.popitem(last=False)
        return t

    def facets(self, queries, search_type, by, where):
        return self.searcher.facet_counts(queries, search_type, by=by,
                                          where=where)

    def phrase(self, terms, k, where=None):
        return self.searcher.phrase_search(terms, k=k, where=where)

    def near(self, terms, window, k, where=None):
        return self.searcher.near_search(terms, window=window, k=k,
                                         where=where)

    def bool_q(self, query, k, where=None):
        return self.searcher.bool_search(query, k=k, where=where)

    def synonym(self, groups, k, where=None):
        return self.searcher.synonym_search(groups, k=k, where=where)

    def suggest(self, word, k, scorer):
        if self._expander is None:
            from search_engine_ray.suggest import SuggestionExpander

            self._expander = SuggestionExpander(self.searcher)
        return self._expander.search_with_suggestions(word, k=k,
                                                      scorer=scorer)


class SearcherReplicaPool:
    """Round-robin pool of full-index replica actors (QPS scaling)."""

    def __init__(self, index_root: str, num_replicas: int = 2,
                 cache_size: int = 0):
        self._replicas = [
            _Replica.remote(index_root, cache_size)
            for _ in range(num_replicas)
        ]
        self._next = 0

    def search_async(self, queries, search_type="exact", k=10,
                     scorer="taat", where=None, search_after=None):
        r = self._replicas[self._next % len(self._replicas)]
        self._next += 1
        return r.search.remote(queries, search_type, k, scorer, where,
                               search_after)

    def search(self, queries, search_type="exact", k=10, scorer="taat",
               where=None, search_after=None):
        return ray.get(self.search_async(queries, search_type, k, scorer,
                                         where, search_after))

    def search_stream(self, requests, k=10, scorer="taat", window=2,
                      yield_refs=False, on_dispatch=None, drain=4):
        """Completion-driven dispatch for a BATCH of requests: yields
        ``(request_index, result_table)`` as each completes, in
        completion order (``(request_index, object_ref)`` when
        ``yield_refs=True``).

        Round-robin burst submission (``search_async`` in a loop) is
        head-of-line-blocked: every request enters one replica's actor
        queue up front, so a replica that drew expensive queries (fuzzy,
        contains, bool) finishes long after its siblings idle — that
        skew IS the serving p95 under the bench mix. Here at most
        ``window`` requests are in flight per replica and the next
        request is dispatched to the least-loaded replica the moment
        one completes, so a slow query delays at most ``window - 1``
        queued peers while every other replica keeps pulling work — the
        shared-queue/load-balancer shape with queue depth bounded
        driver-side.

        ``requests`` is an iterable of ``(queries, search_type)`` pairs.
        ``window=2`` keeps each replica pipelined (one running, one
        queued) without re-creating deep actor queues. ``yield_refs``
        skips the driver-side ``ray.get`` per completion — at ms-scale
        queries the get is what caps the dispatch loop below replica
        throughput; pass True when the consumer fetches (or discards)
        results itself. ``on_dispatch(request_index)`` fires at the
        moment a request is handed to a replica — latency measured from
        there is dispatch-to-completion (closed-loop service latency),
        free of driver-queue artifacts. ``drain`` batches the dispatch
        loop: each pass blocks for ONE completion then drains up to
        ``drain - 1`` already-finished refs with a zero-timeout wait,
        amortizing the per-completion driver cost (one wait + one
        ``.remote`` per query otherwise caps the feed rate below what
        the replicas consume at ms-scale queries) without skewing
        per-request completion stamps; measured sweep at 8 replicas:
        drain=1 ~1.9k QPS, drain=4-8 ~2.8-3.3k QPS at p95 under 15 ms,
        vs the round-robin burst's equal QPS at a 40+ ms
        queue-dominated p95.
        """
        it = iter(enumerate(requests))
        inflight: dict = {}
        load = [0] * len(self._replicas)

        def submit(i, q, st):
            r_ix = min(range(len(load)), key=load.__getitem__)
            load[r_ix] += 1
            if on_dispatch is not None:
                on_dispatch(i)
            ref = self._replicas[r_ix].search.remote(
                q, st, k, scorer, None, None)
            inflight[ref] = (i, r_ix)

        for _ in range(max(1, window) * len(self._replicas)):
            try:
                i, (q, st) = next(it)
            except StopIteration:
                break
            submit(i, q, st)
        while inflight:
            # block for ONE completion, then opportunistically drain up
            # to drain-1 ALREADY-finished refs without blocking: the
            # amortization of a multi-return wait without its stamping
            # skew (a blocking num_returns=k wait reports the FIRST
            # finisher of each batch k-1 service times late)
            done, rest = ray.wait(list(inflight), num_returns=1)
            if rest and drain > 1:
                extra, _ = ray.wait(
                    rest, num_returns=min(drain - 1, len(rest)),
                    timeout=0)
                done = list(done) + extra
            fresh = []
            for d in done:
                i, r_ix = inflight.pop(d)
                load[r_ix] -= 1
                fresh.append((i, d if yield_refs else ray.get(d)))
            for _ in range(len(done)):
                try:
                    j, (q, st) = next(it)
                except StopIteration:
                    break
                submit(j, q, st)
            yield from fresh

    def facet_counts(self, queries, search_type="or", by="lang",
                     where=None):
        r = self._replicas[self._next % len(self._replicas)]
        self._next += 1
        return ray.get(r.facets.remote(queries, search_type, by, where))

    def cancel(self, ref) -> None:
        """Cancel a pending search (reference Q5:
        SearchEngine.cancelSearch, SearchEngine.java:123-129) via
        ``ray.cancel``. Semantics are QUEUE-ONLY for these synchronous
        replica actors: Ray can drop the task while it waits in the
        actor's queue, but cannot interrupt one mid-execution — an
        already-running query completes and ``ray.get`` returns its
        result. That matches ``Future.cancel(false)`` (the reference's
        executor cancel without interruption); queries are ms-scale here,
        so queue-drop is where cancellation pays. ``ray.get`` on a
        successfully cancelled ref raises ``TaskCancelledError``."""
        ray.cancel(ref, force=False)

    def phrase_search(self, terms, k=10, where=None):
        r = self._replicas[self._next % len(self._replicas)]
        self._next += 1
        return ray.get(r.phrase.remote(terms, k, where))

    def near_search(self, terms, window=8, k=10, where=None):
        r = self._replicas[self._next % len(self._replicas)]
        self._next += 1
        return ray.get(r.near.remote(terms, window, k, where))

    def bool_search(self, query, k=10, where=None):
        r = self._replicas[self._next % len(self._replicas)]
        self._next += 1
        return ray.get(r.bool_q.remote(query, k, where))

    def synonym_search(self, groups, k=10, where=None):
        r = self._replicas[self._next % len(self._replicas)]
        self._next += 1
        return ray.get(r.synonym.remote(groups, k, where))

    def search_with_suggestions(self, word, k=10, scorer="taat"):
        """Reference WITH_SUGGESTIONS via the replica's once-loaded
        vocabulary expander (ST3: dictionary-once-per-worker)."""
        r = self._replicas[self._next % len(self._replicas)]
        self._next += 1
        return ray.get(r.suggest.remote(word, k, scorer))

    def reload(self) -> int:
        """Hot snapshot reload on every replica; returns how many
        actually swapped (0 when the index is unchanged)."""
        return sum(ray.get([r.reload.remote() for r in self._replicas]))

    def shutdown(self):
        for r in self._replicas:
            ray.kill(r)
        self._replicas = []


@ray.remote
class _BucketShard:
    """Owns a contiguous group of term buckets; loads them once."""

    def __init__(self, index_root: str, buckets: list[int]):
        self._root = index_root
        self._fp = snapshot_fingerprint(index_root)
        self._s = LocalSearcher(index_root, load_docmap=False)
        self.buckets = set(buckets)
        for b in buckets:  # eager load: the 'stateful actor' cost paid once
            self._s.bucket(b)

    def reload(self) -> bool:
        fp = snapshot_fingerprint(self._root)
        if fp == self._fp:
            return False
        self._s = LocalSearcher(self._root, load_docmap=False)
        for b in self.buckets:
            self._s.bucket(b)
        self._fp = fp
        return True

    def fragments(self, terms: list[str]):
        """(term -> (docids, scores)) for the owned terms present here."""
        out = {}
        for t in terms:
            b = term_bucket(t, self._s.num_buckets)
            if b not in self.buckets:
                continue
            rec = self._s._posting_for(t)
            if rec is None:
                continue
            from search_engine_ray.codec import decode_posting

            dec = decode_posting(rec)
            idf = bm25_idf(self._s.n_docs, rec["df"])
            out[t] = (dec["docids"],
                      idf * _partials(dec, self._s.avgdl, self._s.k1,
                                      self._s.b))
        return out

    def expand_prefix(self, prefix: str) -> list[str]:
        terms = []
        for b in self.buckets:
            bk = self._s.bucket(b)
            terms.extend(bk.terms[i] for i in bk.prefix_range(prefix))
        return terms

    def expand_contains(self, infix: str) -> list[str]:
        terms = []
        for b in self.buckets:
            terms.extend(t for t in self._s.bucket(b).terms if infix in t)
        return terms

    def expand_wildcard(self, pattern: str) -> list[str]:
        terms = []
        for b in self.buckets:
            terms.extend(self._s.bucket(b).wildcard(pattern))
        return terms

    def expand_regex(self, pattern: str) -> list[str]:
        terms = []
        for b in self.buckets:
            terms.extend(self._s.bucket(b).regex(pattern))
        return terms

    def expand_fuzzy(self, words: list[str],
                     max_edits: int = 1) -> list[str]:
        terms = []
        for b in self.buckets:
            terms.extend(
                self._s.bucket(b).edit1().match_all(words, max_edits))
        return terms


@ray.remote
class _DocShardReplica:
    """One doc-shard of a sharded index (sharded.build_sharded layout),
    scoring with injected GLOBAL stats + per-term global idf."""

    def __init__(self, shard_root: str, stats_override: dict):
        self._root = shard_root
        self._fp = snapshot_fingerprint(shard_root)
        self._s = LocalSearcher(shard_root, load_docmap=False,
                                stats_override=stats_override)

    def reload(self, stats_override: dict) -> bool:
        """Swap in the current shard snapshot and/or new GLOBAL stats
        (deltas change n_docs/avgdl even for untouched shards)."""
        fp = snapshot_fingerprint(self._root)
        cur = {"n_docs": self._s.n_docs, "avgdl": self._s.avgdl}
        if fp == self._fp and cur == stats_override:
            return False
        self._s = LocalSearcher(self._root, load_docmap=False,
                                stats_override=stats_override)
        self._fp = fp
        return True

    def topk(self, terms: list[str], idfs: dict[str, float],
             search_type: str, k: int, with_urls: bool, where=None,
             search_after=None, scorer="taat"):
        from search_engine_ray.search import SCORER_AUTO_BMW_DOCS

        gathered = []
        for t in terms:  # terms arrive sorted (lex float-order invariant)
            rec = self._s._posting_for(t)
            if rec is not None:
                gathered.append((t, rec, idfs[t]))
        mask = self._s.live_mask(where)
        after = self._s._after_key(search_after)
        use_bmw = scorer == "bmw" or (
            scorer == "auto"
            and len(self._s.ords()) >= SCORER_AUTO_BMW_DOCS)
        if search_type == "and":
            if len(gathered) < len(terms):
                return (np.empty(0, np.int64), np.empty(0, np.float64), [])
            ids, scs = self._s._score_and(gathered, k, mask=mask,
                                          after=after)
        elif use_bmw:
            ids, scs = self._s._score_bmw(gathered, k, mask=mask,
                                          after=after)
        else:
            ids, scs = self._s._score_taat(gathered, k, mask=mask,
                                           after=after)
        real = self._s.ords()[ids] if len(ids) else ids
        urls: list[str] = []
        if with_urls and len(real):
            urls = self._s.resolve_urls(real)
        return real, scs, urls

    def synonym_group_df(self, groups: list[list[str]]) -> list[int]:
        return self._s.synonym_group_df(groups)

    def synonym_topk(self, groups: list[list[str]], idfs: list[float],
                     k: int, with_urls: bool, where=None):
        t = self._s.synonym_search(groups, k=k, with_urls=with_urls,
                                   where=where, group_idfs=idfs)
        return (t.column("doc_id").to_numpy(zero_copy_only=False),
                t.column("score").to_numpy(zero_copy_only=False),
                t.column("url").to_pylist())

    def phrase_topk(self, terms: list[str], idfs: dict[str, float],
                    k: int, with_urls: bool, where=None):
        t = self._s.phrase_search(terms, k=k, with_urls=with_urls,
                                  idfs=idfs, where=where)
        return (t.column("doc_id").to_numpy(zero_copy_only=False),
                t.column("score").to_numpy(zero_copy_only=False),
                t.column("url").to_pylist())

    def near_topk(self, terms: list[str], window: int,
                  idfs: dict[str, float], k: int, with_urls: bool,
                  where=None):
        t = self._s.near_search(terms, window=window, k=k,
                                with_urls=with_urls, idfs=idfs,
                                where=where)
        return (t.column("doc_id").to_numpy(zero_copy_only=False),
                t.column("score").to_numpy(zero_copy_only=False),
                t.column("url").to_pylist())

    def facet_topk(self, terms: list[str], search_type: str, by: str,
                   where):
        t = self._s.facet_counts([], search_type, by=by, where=where,
                                 terms=terms)
        return (t.column("value").to_pylist(),
                t.column("n_docs").to_numpy(zero_copy_only=False))

    def bool_topk(self, query: str, idfs: dict[str, float],
                  k: int, with_urls: bool, where=None):
        t = self._s.bool_search(query, k=k, with_urls=with_urls,
                                idfs=idfs, where=where)
        return (t.column("doc_id").to_numpy(zero_copy_only=False),
                t.column("score").to_numpy(zero_copy_only=False),
                t.column("url").to_pylist())


class DocShardServer:
    """Doc-sharded serving: one actor per doc shard (each a complete
    index over its doc subset — the 10^12-doc topology), global df from
    the build-time term-stats sidecar, per-shard local top-k + driver
    merge. Results are identical to ShardedSearcher / an unsharded
    LocalSearcher over the same corpus (tests/test_sharded.py)."""

    def __init__(self, root: str):
        import json as _json
        import os as _os

        from search_engine_ray.sharded import TermStatsSidecar

        with open(_os.path.join(root, "global_stats.json")) as f:
            self.stats = _json.load(f)
        self._root = root
        self.n_docs = int(self.stats["n_docs"])
        self.num_doc_shards = int(self.stats["num_doc_shards"])
        with open(_os.path.join(root, "shard=0", "_manifest.json")) as f:
            num_buckets = int(_json.load(f)["config"]["num_buckets"])
        self._num_buckets = num_buckets
        self._sidecar = TermStatsSidecar(root, num_buckets)
        if not self._sidecar.present:
            raise FileNotFoundError(
                "DocShardServer needs the term-stats sidecar "
                "(build_sharded/apply_delta_sharded write it)")
        override = {"n_docs": self.stats["n_docs"],
                    "avgdl": self.stats["avgdl"]}
        self._shards = [
            _DocShardReplica.remote(_os.path.join(root, f"shard={s}"),
                                    override)
            for s in range(self.num_doc_shards)
        ]

    def _expand(self, queries: list[str], search_type: str) -> list[str]:
        if search_type == "prefix":
            return self._sidecar.expand_prefix(queries[0])
        if search_type == "contains":
            return self._sidecar.expand_contains(queries[0])
        if search_type == "wildcard":
            return self._sidecar.expand_wildcard(queries[0])
        if search_type == "regex":
            return self._sidecar.expand_regex(queries[0])
        if search_type in ("fuzzy", "fuzzy2"):
            return self._sidecar.expand_fuzzy(
                list(queries), 2 if search_type == "fuzzy2" else 1)
        terms = set(queries[:1]) if search_type == "exact" else set(queries)
        present = {t for t in terms if self._sidecar.df(t) > 0}
        if search_type == "and" and present != terms:
            return []
        return sorted(present)

    def search(self, queries: list[str], search_type: str = "exact",
               k: int = 10, with_urls: bool = True,
               where: dict[str, str] | None = None,
               search_after: tuple[float, int] | None = None,
               scorer: str = "taat") -> pa.Table:
        if scorer not in ("taat", "bmw", "auto"):
            raise ValueError(f"unknown scorer {scorer!r}")
        terms = self._expand(queries, search_type)
        idfs = {t: bm25_idf(self.n_docs, self._sidecar.df(t))
                for t in terms}
        parts = ray.get([
            sh.topk.remote(terms, idfs, search_type, k, with_urls, where,
                           search_after, scorer)
            for sh in self._shards
        ]) if terms else []
        return self._merge(parts, k, with_urls)

    def complete(self, prefix: str, k: int = 10) -> pa.Table:
        """df-ranked autocomplete straight off the term-stats sidecar
        (terms + GLOBAL dfs live there; no shard actor round-trip)."""
        terms = self._sidecar.expand_prefix(prefix)
        dfs = [self._sidecar.df(t) for t in terms]
        order = sorted(range(len(terms)),
                       key=lambda i: (-dfs[i], terms[i]))[:k]
        return pa.table({
            "term": pa.array([terms[i] for i in order], pa.string()),
            "df": pa.array([int(dfs[i]) for i in order], pa.int64()),
        })

    def facet_counts(self, queries: list[str], search_type: str = "or",
                     by: str = "lang",
                     where: dict[str, str] | None = None) -> pa.Table:
        """Facets across doc shards: terms expand against the GLOBAL
        sidecar vocabulary, each shard counts its own matching docs per
        value (a doc's match and attribute are shard-local), the driver
        sums — exact, identical to an unsharded facet_counts."""
        terms = self._expand(queries, search_type)
        agg: dict[str, int] = {}
        if terms:
            for vals, cnts in ray.get([
                sh.facet_topk.remote(terms, search_type, by, where)
                for sh in self._shards
            ]):
                for v, c in zip(vals, cnts):
                    agg[v] = agg.get(v, 0) + int(c)
        order = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        return pa.table({
            "value": pa.array([v for v, _ in order], pa.string()),
            "n_docs": pa.array([c for _, c in order], pa.int64()),
        })

    def phrase_search(self, terms: list[str], k: int = 10,
                      with_urls: bool = True,
                      where: dict | None = None) -> pa.Table:
        """Exact sharded phrase search: every shard runs the positions
        walk with GLOBAL idfs and returns its local phrase top-k (a doc
        lives entirely in one shard), the driver merges."""
        expand = self._expand(sorted(set(terms)), "and")
        if not expand:
            return self._merge([], k, with_urls)
        idfs = {t: bm25_idf(self.n_docs, self._sidecar.df(t))
                for t in expand}
        parts = ray.get([
            sh.phrase_topk.remote(terms, idfs, k, with_urls, where)
            for sh in self._shards
        ])
        return self._merge(parts, k, with_urls)

    def near_search(self, terms: list[str], window: int = 8, k: int = 10,
                    with_urls: bool = True,
                    where: dict | None = None) -> pa.Table:
        """Exact sharded proximity search (phrase_search's argument: a
        window match is decidable within one shard)."""
        expand = self._expand(sorted(set(terms)), "and")
        if not expand:
            return self._merge([], k, with_urls)
        idfs = {t: bm25_idf(self.n_docs, self._sidecar.df(t))
                for t in expand}
        parts = ray.get([
            sh.near_topk.remote(terms, window, idfs, k, with_urls,
                                where)
            for sh in self._shards
        ])
        return self._merge(parts, k, with_urls)

    def synonym_search(self, groups: list[list[str]], k: int = 10,
                       with_urls: bool = True,
                       where: dict | None = None) -> pa.Table:
        """Sharded SynonymQuery: the pseudo-term's union df is the SUM
        of per-shard union sizes (disjoint doc sets), fetched in one
        fan-out; each shard then scores its local merged pseudo-posting
        with the injected GLOBAL group idfs and the driver merges
        (phrase_search's exactness argument — a doc's group tf is
        entirely shard-local)."""
        per_shard = ray.get([sh.synonym_group_df.remote(groups)
                             for sh in self._shards])
        idfs = [bm25_idf(self.n_docs, sum(col))
                for col in zip(*per_shard)]
        parts = ray.get([
            sh.synonym_topk.remote(groups, idfs, k, with_urls, where)
            for sh in self._shards
        ])
        return self._merge(parts, k, with_urls)

    def bool_search(self, query: str, k: int = 10,
                    with_urls: bool = True,
                    where: dict | None = None) -> pa.Table:
        """Boolean query across the shard actors: set membership
        (complement included) is shard-local, so each shard evaluates
        with GLOBAL idfs and the driver merges (phrase_search's
        exactness argument)."""
        from search_engine_ray.boolquery import parse, term_leaves

        idfs = {t: bm25_idf(self.n_docs, self._sidecar.df(t))
                for t in sorted(term_leaves(parse(query)))}
        parts = ray.get([
            sh.bool_topk.remote(query, idfs, k, with_urls, where)
            for sh in self._shards
        ])
        return self._merge(parts, k, with_urls)

    def _merge(self, parts, k: int, with_urls: bool) -> pa.Table:
        parts = [p for p in parts if len(p[0])]
        if parts:
            all_ids = np.concatenate([p[0] for p in parts])
            all_scs = np.concatenate([p[1] for p in parts])
            top = _topk_indices(all_ids, all_scs, k)
            ids, scores = all_ids[top], all_scs[top]
            url_of = {int(d): u for p in parts
                      for d, u in zip(p[0], p[2] or [])}
            urls = [url_of.get(int(d), "") for d in ids] if with_urls \
                else [""] * len(ids)
        else:
            ids = np.empty(0, np.int64)
            scores = np.empty(0, np.float64)
            urls = []
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int32)),
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=RESULT_SCHEMA,
        )

    def reload(self) -> int:
        """Hot reload after apply_delta_sharded: re-read the merged root
        stats + term-stats sidecar on the driver, push the new GLOBAL
        stats override to every shard actor (a delta moves n_docs/avgdl
        for ALL shards, not just touched ones). Returns the number of
        shard actors that swapped."""
        import json as _json
        import os as _os

        from search_engine_ray.sharded import TermStatsSidecar

        with open(_os.path.join(self._root, "global_stats.json")) as f:
            self.stats = _json.load(f)
        self.n_docs = int(self.stats["n_docs"])
        if int(self.stats["num_doc_shards"]) != self.num_doc_shards:
            raise ValueError("num_doc_shards changed; restart the server")
        self._sidecar = TermStatsSidecar(self._root, self._num_buckets)
        override = {"n_docs": self.stats["n_docs"],
                    "avgdl": self.stats["avgdl"]}
        return sum(ray.get([sh.reload.remote(override)
                            for sh in self._shards]))

    def shutdown(self):
        for s in self._shards:
            ray.kill(s)
        self._shards = []


class BucketShardServer:
    """Term-partitioned serving across shard actors + driver-side merge."""

    def __init__(self, index_root: str, num_shards: int = 4):
        probe = LocalSearcher(index_root, load_docmap=False)
        self.num_buckets = probe.num_buckets
        groups = [list(range(self.num_buckets))[i::num_shards]
                  for i in range(num_shards)]
        self._shards = [
            _BucketShard.remote(index_root, g) for g in groups if g
        ]
        self._bucket_to_shard = {}
        for si, g in enumerate(groups):
            for b in g:
                self._bucket_to_shard[b] = si
        self._local = probe  # for docmap-free metadata
        self._root = index_root

    def facet_counts(self, queries, search_type="or", by="lang",
                     where=None):
        """Facets on the term-sharded topology delegate to the driver's
        local metadata searcher (the full artifacts are on shared
        storage; facet counting reads each expanded term's postings once
        and no score fragments, so the actor fan-out buys nothing)."""
        return self._local.facet_counts(queries, search_type, by=by,
                                        where=where)

    def facet_histogram(self, queries, edges, search_type="or",
                        by="doc_len", where=None):
        return self._local.facet_histogram(queries, edges, search_type,
                                           by=by, where=where)

    def complete(self, prefix: str, k: int = 10):
        return self._local.complete(prefix, k=k)

    def reload(self) -> int:
        """Hot snapshot reload on every bucket-shard actor + the local
        metadata probe; returns how many actors swapped."""
        n = sum(ray.get([s.reload.remote() for s in self._shards]))
        if n:
            self._local = LocalSearcher(self._root, load_docmap=False)
        return n

    def _route(self, terms: list[str]) -> dict[int, list[str]]:
        by_shard: dict[int, list[str]] = {}
        for t in terms:
            si = self._bucket_to_shard[term_bucket(t, self.num_buckets)]
            by_shard.setdefault(si, []).append(t)
        return by_shard

    def search(self, queries: list[str], search_type: str = "exact",
               k: int = 10,
               where: dict[str, str] | None = None,
               search_after: tuple[float, int] | None = None) -> pa.Table:
        if search_type == "exact":
            terms = queries[:1]
        elif search_type in ("or", "and"):
            terms = list(queries)
        elif search_type == "prefix":
            terms = sorted(set().union(*ray.get([
                s.expand_prefix.remote(queries[0]) for s in self._shards
            ])))
        elif search_type == "contains":
            terms = sorted(set().union(*ray.get([
                s.expand_contains.remote(queries[0]) for s in self._shards
            ])))
        elif search_type == "wildcard":
            terms = sorted(set().union(*ray.get([
                s.expand_wildcard.remote(queries[0]) for s in self._shards
            ])))
        elif search_type == "regex":
            terms = sorted(set().union(*ray.get([
                s.expand_regex.remote(queries[0]) for s in self._shards
            ])))
        elif search_type in ("fuzzy", "fuzzy2"):
            me = 2 if search_type == "fuzzy2" else 1
            terms = sorted(set().union(*ray.get([
                s.expand_fuzzy.remote(list(queries), me)
                for s in self._shards
            ])))
        else:
            raise ValueError(f"unknown search_type {search_type!r}")
        terms = sorted(set(terms))
        by_shard = self._route(terms)
        frags = ray.get([
            self._shards[si].fragments.remote(ts)
            for si, ts in by_shard.items()
        ])
        merged: dict[str, tuple] = {}
        for f in frags:
            merged.update(f)
        if search_type == "and" and len(merged) < len(set(terms)):
            merged = {}  # a conjunctive term is missing entirely
        # accumulate in lexicographic term order (float-order invariant).
        # `where`: fragments carry ordinals into the shared doc space, so
        # the driver masks each term's fragment exactly like the masked
        # local TAAT kernel (attribute codes load once via self._local)
        mask = self._local.live_mask(where)
        id_parts, sc_parts = [], []
        for t in sorted(merged):
            ids, scs = merged[t]
            if mask is not None:
                keep = mask[ids]
                ids, scs = ids[keep], scs[keep]
            id_parts.append(ids)
            sc_parts.append(scs)
        if not id_parts:
            ids = np.empty(0, np.int64)
            scores = np.empty(0, np.float64)
        elif search_type == "and":
            from search_engine_ray.search import _after_filter

            # intersect then per-term sequential adds (bit-exact with
            # LocalSearcher._score_and / the oracle)
            cand = id_parts[0]
            for ids_t in id_parts[1:]:
                cand = np.intersect1d(cand, ids_t, assume_unique=True)
            totals = np.zeros(cand.size, dtype=np.float64)
            for ids_t, scs_t in zip(id_parts, sc_parts):  # term lex order
                totals += scs_t[np.searchsorted(ids_t, cand)]
            cand, totals = _after_filter(
                cand, totals, self._local._after_key(search_after))
            top = _topk_indices(cand, totals, k)
            # fragments carry ordinals; translate to real doc ids here
            ids, scores = self._local.ords()[cand[top]], totals[top]
        else:
            from search_engine_ray.search import _accumulate_topk

            # dense-accumulator bound = local ordinal-space size (fragments
            # carry ordinals), not collection n_docs
            uids, totals = _accumulate_topk(
                id_parts, sc_parts, k, len(self._local.ords()),
                after=self._local._after_key(search_after))
            ids, scores = self._local.ords()[uids], totals
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int32)),
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "url": pa.array([""] * len(ids), pa.string()),
            },
            schema=RESULT_SCHEMA,
        )

    def shutdown(self):
        for s in self._shards:
            ray.kill(s)
        self._shards = []
