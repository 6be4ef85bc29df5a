"""Query engine over index artifacts: exact/prefix/contains/wildcard/regex/or/and/phrase BM25 top-k.

Mirrors the reference's search surface (ref: engine/src/main/java/org/search/
engine/search/SimpleSearchManager.java:50-85, model/SearchType.java:3-5):

* ``exact``   — EXACT_MATCH: one term, hash-routed to its bucket (the
  reference walks the radix tree, :163-174),
* ``or``      — WITH_SUGGESTIONS: union over the query list (:61-62),
* ``prefix``  — START_WITH: radix-subtree union (:176-195) — here a binary
  search in each bucket's term-sorted postings file; hash partitioning
  destroys prefix locality, so prefix queries fan out to ALL buckets
  (SURVEY.md §7.3) — each fan-out is one P-way binary search, cheap,
* ``and``     — conjunctive posting-list intersection (north-star wording),
* ``phrase_search`` — ordered same-line proximity over stored positions.

Postings hold dense per-index ORDINALS (state/ordinals.py) — translation to
real doc ids happens only on the way out, and ordinal order == doc_id order
so tie-breaks are unchanged. Disjunctive accumulation uses a dense bincount
accumulator up to DENSE_ACC_MAX_DOCS, else sort-merge.

Ranking is BM25 (the reference returns an UNRANKED list capped at 100,
:64-70 — scoring is our extension, checked against oracle.py). Two exact
scorers, verified identical:

* ``taat`` — term-at-a-time, fully vectorized: concatenate posting arrays in
  lexicographic term order, stable-sort by doc id, ``np.add.reduceat`` per
  doc (preserves the float-addition-order invariant shared with the oracle).
* ``bmw``  — range-at-a-time block-max scoring: per-128-entry block
  (last_docid, max_partial) metadata is coarsened to fixed ordinal
  ranges; ranges are visited in descending upper-bound order and every
  range that cannot beat the current k-th score is skipped without
  touching its postings (see ``_score_bmw``).

``taat`` is the DEFAULT. History: the r1/r2 ``bmw`` was a classic
doc-at-a-time WAND pivot walk — O(pivots) in the Python interpreter
(~us/pivot) vs TAAT's O(postings) numpy kernels (~ns/posting), losing
100x with postings decoded in memory (404 ms vs 2.1 ms on head-term OR
pairs at 50k docs). The r3 vectorized range-at-a-time design closes
that to parity (head-pair OR 19 ms vs 18 ms, mixed head+mid OR slightly
AHEAD at 3.9 vs 4.6 ms, same index, min-of-9 warm; bench.py emits the
comparison per run as ``scorer_taat_p50_ms`` / ``scorer_bmw_p50_ms``).
``taat`` remains default because on this corpus shape (near-uniform doc
lengths => block maxes ~= global max) pruning rarely skips enough to
win; ``bmw``'s win condition is skewed partials or postings too large
for RAM, where skipped ranges save decode/IO — the deployment the
block-max layout (codec.py) exists for. Exact-identity tests keep both
scorers bit-equal to the oracle.

Determinism: scores accumulate per doc over query terms in lexicographic
term order; final order is (score desc, doc_id asc); float64 throughout.
"""

from __future__ import annotations

import fnmatch
import json
import os
import re
from bisect import bisect_left
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.analyzer.tokenizers import get_tokenizer
from search_engine_ray.codec import (
    bm25_idf,
    decode_blockmax,
    decode_posting,
)
from search_engine_ray.stages.tokenize import term_bucket

_WILD_SPLIT = re.compile(r"[*?]+")


@lru_cache(maxsize=4096)
def _wildcard_regex(pattern: str) -> "re.Pattern[str]":
    """Compiled anchored regex for a glob pattern (``*``/``?``), cached —
    the same pattern probes every bucket of every shard."""
    return re.compile(fnmatch.translate(pattern))


@lru_cache(maxsize=4096)
def _regex_compiled(pattern: str) -> "re.Pattern[str]":
    """Compiled user regex for the ``regex`` search type, cached — the
    same pattern probes every bucket of every shard. Matching is via
    ``fullmatch`` (Lucene RegexpQuery semantics: the pattern must match
    the ENTIRE term, not a prefix/substring)."""
    return re.compile(pattern)


@lru_cache(maxsize=4096)
def _regex_literal_runs(pattern: str) -> tuple[str, ...]:
    """Mandatory contiguous literal substrings of ``pattern``, for the
    trigram prefilter. Walks the stdlib regex parse tree's top-level
    concatenation: LITERAL atoms extend the current run; a repeat with
    ``min >= 1`` of a single literal contributes one copy and then
    closes the run (at least one occurrence is contiguous with what
    precedes it); an unconditionally-entered group recurses; every
    other construct (alternation, classes, ``.``, optional repeats,
    anchors) closes the run. Every returned string is therefore a
    substring of EVERY possible match — intersecting their trigram
    posting lists is lossless, exactly like wildcard literal runs.
    Case-insensitive patterns return no runs (trigrams are exact-case)
    and fall back to the linear scan."""
    try:
        import re._parser as _p  # Python 3.11+
    except ImportError:  # pragma: no cover - older interpreters
        import sre_parse as _p  # type: ignore[no-redef]

    parsed = _p.parse(pattern)
    if parsed.state.flags & re.IGNORECASE:
        return ()
    runs: list[str] = []
    cur: list[str] = []

    def close():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    def walk(seq):
        for op, av in seq:
            name = str(op)
            if name == "LITERAL":
                cur.append(chr(av))
            elif name in ("MAX_REPEAT", "MIN_REPEAT") and av[0] >= 1 \
                    and len(av[2]) == 1 and str(av[2][0][0]) == "LITERAL":
                cur.append(chr(av[2][0][1]))
                close()
            elif name == "SUBPATTERN" and av[1] == 0 and av[2] == 0:
                walk(av[3])  # plain group: concatenation continues inside
                close()  # conservatively break across the group boundary
            elif name == "AT":
                close()  # anchors match empty — no chars, run unbroken is
                # unsafe only across variable content; close anyway
            else:
                close()

    walk(parsed)
    close()
    return tuple(runs)


RESULT_SCHEMA = pa.schema(
    [
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("url", pa.string()),
    ]
)


class _Bucket:
    """One loaded bucket: term-sorted lookup arrays + LAZY blob access.

    Only the term strings (bisect keys) and the two small numeric columns
    materialize to Python at load; posting blobs stay in the Arrow table
    and convert per accessed term (``record``), so loading a bucket never
    copies the full postings payload — queries touch a handful of terms,
    and decoded results land in the searcher's LRU anyway."""

    __slots__ = ("terms", "df", "max_partial", "_t", "_edit1", "_trigram")

    def __init__(self, table: pa.Table):
        self.terms: list[str] = table.column("term").to_pylist()
        self.df = table.column("df").to_numpy()
        self.max_partial = table.column("max_partial").to_numpy()
        self._t = table.combine_chunks()
        self._edit1 = None
        self._trigram = None

    def edit1(self):
        """Lazy per-bucket Edit1Vocab (fuzzy.py) — built on the first
        fuzzy query against this bucket, cached for the searcher's life
        (ST3 once-per-worker state)."""
        if self._edit1 is None:
            from search_engine_ray.fuzzy import Edit1Vocab

            self._edit1 = Edit1Vocab(self.terms)
        return self._edit1

    def contains(self, infix: str) -> list[str]:
        """Vocabulary infix match via a lazy trigram index over the
        terms (the 'trigram index OVER the vocabulary' evolution the
        r2 linear scan documented): candidate terms = intersection of
        the infix's trigram posting lists (smallest first), then a
        literal ``in`` verify — O(candidates), not O(vocab), once the
        index is built (once per bucket, ST3). Infixes shorter than 3
        chars have no trigram and fall back to the linear scan."""
        if len(infix) < 3:
            return [t for t in self.terms if infix in t]
        grams = {infix[j:j + 3] for j in range(len(infix) - 2)}
        cands = self._trigram_candidates(grams)
        if cands is None:
            return []
        return [self.terms[i] for i in cands if infix in self.terms[i]]

    def _trigram_candidates(self, grams: set[str]) -> np.ndarray | None:
        """Intersection of the trigram posting lists for ``grams`` (term
        ordinals into ``self.terms``); None when some gram never occurs
        (=> no term can match). Builds the trigram index lazily, once per
        bucket (ST3), shared by ``contains`` and ``wildcard``."""
        if self._trigram is None:
            tri: dict[str, list[int]] = {}
            for i, t in enumerate(self.terms):
                for j in range(len(t) - 2):
                    g = t[j:j + 3]
                    lst = tri.get(g)
                    if lst is None:
                        tri[g] = [i]
                    elif lst[-1] != i:  # term ordinals arrive in order
                        lst.append(i)
            self._trigram = {g: np.asarray(v, dtype=np.int64)
                             for g, v in tri.items()}
        cands: np.ndarray | None = None
        for g in grams:
            lst = self._trigram.get(g)
            if lst is None:
                return None
            cands = lst if cands is None else np.intersect1d(
                cands, lst, assume_unique=True)
            if not cands.size:
                return None
        return cands

    def wildcard(self, pattern: str) -> list[str]:
        """Vocabulary glob match — ``*`` = any run (incl. empty), ``?`` =
        exactly one char (Lucene WildcardQuery semantics). Candidate
        generation mirrors ``contains``: every literal run of >=3 chars
        between wildcards contributes its trigrams, the trigram posting
        lists intersect (lossless — a matching term must contain every
        literal run), then an anchored compiled-regex verify
        (``fnmatch.translate``) filters the candidates. Patterns with no
        >=3-char literal run (e.g. ``a?c``, ``*xy*``) have no trigram
        signal and fall back to the linear regex scan, which Heaps' law
        keeps corpus-sublinear per bucket."""
        rx = _wildcard_regex(pattern)
        runs = [r for r in _WILD_SPLIT.split(pattern) if len(r) >= 3]
        if not runs:
            return [t for t in self.terms if rx.match(t)]
        grams = {r[j:j + 3] for r in runs for j in range(len(r) - 2)}
        cands = self._trigram_candidates(grams)
        if cands is None:
            return []
        return [self.terms[i] for i in cands if rx.match(self.terms[i])]

    def regex(self, pattern: str) -> list[str]:
        """Vocabulary regex match (Lucene RegexpQuery: the pattern must
        match the WHOLE term). Candidate generation mirrors ``wildcard``:
        mandatory literal runs extracted from the parse tree
        (``_regex_literal_runs`` — lossless) feed the shared trigram
        index; ``fullmatch`` verifies. Patterns with no >=3-char
        mandatory literal fall back to the linear fullmatch scan, which
        Heaps' law keeps corpus-sublinear per bucket."""
        rx = _regex_compiled(pattern)
        runs = [r for r in _regex_literal_runs(pattern) if len(r) >= 3]
        if not runs:
            return [t for t in self.terms if rx.fullmatch(t)]
        grams = {r[j:j + 3] for r in runs for j in range(len(r) - 2)}
        cands = self._trigram_candidates(grams)
        if cands is None:
            return []
        return [self.terms[i] for i in cands
                if rx.fullmatch(self.terms[i])]

    def find(self, term: str) -> int | None:
        i = bisect_left(self.terms, term)
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return None

    def prefix_range(self, prefix: str) -> list[int]:
        lo = bisect_left(self.terms, prefix)
        out = []
        for i in range(lo, len(self.terms)):
            if not self.terms[i].startswith(prefix):
                break
            out.append(i)
        return out

    def record(self, i: int) -> dict:
        return {
            "df": int(self.df[i]),
            "docs_vb": self._t.column("docs_vb")[i].as_py(),
            "tfs_vb": self._t.column("tfs_vb")[i].as_py(),
            "lens_vb": self._t.column("lens_vb")[i].as_py(),
            "pos_vb": self._t.column("pos_vb")[i].as_py(),
            "blockmax": self._t.column("blockmax")[i].as_py(),
            "max_partial": float(self.max_partial[i]),
        }


class LocalSearcher:
    """Single-process searcher over index artifacts (the per-shard kernel
    that serve.py wraps in actors)."""

    def __init__(self, index_root: str, load_docmap: bool = True,
                 stats_override: dict | None = None):
        """``stats_override`` ({"n_docs", "avgdl"}) replaces the index-local
        collection stats — used by sharded.ShardedSearcher so every shard
        scores with the GLOBAL corpus statistics (BM25 rank identity)."""
        self.index_root = index_root
        with open(os.path.join(index_root, "_manifest.json")) as f:
            self.manifest = json.load(f)
        with open(os.path.join(index_root, "global_stats.json")) as f:
            self.stats = json.load(f)
        if stats_override:
            self.stats = {**self.stats, **stats_override}
        self.config = self.manifest["config"]
        self.num_buckets = int(self.config["num_buckets"])
        self.n_docs = int(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.k1 = float(self.config.get("k1", 1.2))
        self.b = float(self.config.get("b", 0.75))
        self._tok = get_tokenizer(self.config["tokenizer"])
        self._buckets: dict[int, _Bucket] = {}
        self._docmap = None
        self._ordmap: np.ndarray | None = None
        # M8 existence filter: (mtime_ns, size) signature of the
        # _pending_deletes.json sidecar; sentinel forces the first read
        self._pending_sig: tuple | str = "unset"
        self._pending_mask: np.ndarray | None = None
        self._pending_seq: int = 0
        if load_docmap:
            self.docmap()  # eager footer-stats load (no url bytes read)

    def docmap(self):
        """Row-group-granular docId -> url resolver: footer stats at
        load, url bytes read per bucket of HITS only (state/docmap.py) —
        never the whole registry in memory (the r1/r2 full-dict load was
        multi-GB at the 50M-doc shard ceiling)."""
        if self._docmap is None:
            from search_engine_ray.state.docmap import DocMap

            self._docmap = DocMap(self.index_root)
        return self._docmap

    def resolve_urls(self, doc_ids) -> list[str]:
        """Resolve result doc ids (k-scale lists) to urls."""
        return self.docmap().urls_for(doc_ids)

    def ords(self) -> np.ndarray:
        """Sorted doc_id array: postings hold ordinals into this
        (state/ordinals.py); loaded once per searcher."""
        if self._ordmap is None:
            from search_engine_ray.state.ordinals import load_ordinals

            self._ordmap = load_ordinals(self.index_root)
        return self._ordmap

    def bucket(self, b: int) -> _Bucket:
        bk = self._buckets.get(b)
        if bk is None:
            path = os.path.join(self.index_root, "buckets", f"bucket={b}",
                                "postings.parquet")
            bk = _Bucket(pq.read_table(path))
            self._buckets[b] = bk
            if hasattr(self, "_tviews"):
                # the full bucket supersedes the cold terms+df view —
                # keeping both doubles vocabulary memory for the
                # searcher's lifetime
                self._tviews.pop(b, None)
        return bk

    def terms_df(self, b: int) -> tuple[list[str], np.ndarray]:
        """(sorted terms, df) view of bucket ``b`` WITHOUT the posting
        blobs: reuses the full bucket when already loaded, else reads
        only the two small columns (column-pruned parquet read). This is
        what vocabulary-only operations (``complete``) iterate — a cold
        autocomplete call must not materialize the whole index (ADVICE
        r4)."""
        bk = self._buckets.get(b)
        if bk is not None:
            return bk.terms, bk.df
        if not hasattr(self, "_tviews"):
            self._tviews: dict[int, tuple[list[str], np.ndarray]] = {}
        tv = self._tviews.get(b)
        if tv is None:
            path = os.path.join(self.index_root, "buckets", f"bucket={b}",
                                "postings.parquet")
            t = pq.read_table(path, columns=["term", "df"])
            tv = (t.column("term").to_pylist(), t.column("df").to_numpy())
            self._tviews[b] = tv
        return tv

    # --- term resolution --------------------------------------------------

    def _has_term(self, term: str) -> bool:
        """Existence probe — bisect only, no blob materialization."""
        return self.bucket(term_bucket(term, self.num_buckets)) \
            .find(term) is not None

    def _posting_for(self, term: str) -> dict | None:
        """Raw posting record, LRU-cached per term: ``_Bucket.record``
        copies every blob column out of Arrow (``.as_py()`` on a head
        term's cells moves ~MBs), which dominated warm query time when
        re-fetched per query — 74% of a head-pair OR profile."""
        if not hasattr(self, "_rec_cache"):
            from collections import OrderedDict

            self._rec_cache = OrderedDict()
        cache = self._rec_cache
        hit = cache.get(term)
        if hit is not None:
            cache.move_to_end(term)
            return hit
        bk = self.bucket(term_bucket(term, self.num_buckets))
        i = bk.find(term)
        if i is None:
            return None
        rec = bk.record(i)
        cache[term] = rec
        if len(cache) > self._DECODE_CACHE_MAX:
            cache.popitem(last=False)
        return rec

    def expand(self, queries: list[str], search_type: str) -> list[str]:
        """Concrete sorted term list a query scores (same contract as
        oracle.OracleIndex.expand)."""
        if self._tok.folding:
            # folding indexes store folded terms; queries fold too, so
            # 'Café' finds docs containing 'cafe'/'café'/'CAFÉ'
            queries = [self._tok.fold(q) for q in queries]
        if search_type == "exact":
            cands = queries[:1]
            terms = [q for q in cands if self._has_term(q)]
        elif search_type == "or":
            terms = [q for q in queries if self._has_term(q)]
        elif search_type == "and":
            # conjunctive: all terms must exist, else the result is empty
            if queries and all(self._has_term(q) for q in queries):
                terms = list(queries)
            else:
                terms = []
        elif search_type == "prefix":
            p = queries[0]
            terms = []
            for b in range(self.num_buckets):  # fan out to ALL buckets
                bk = self.bucket(b)
                terms.extend(bk.terms[i] for i in bk.prefix_range(p))
        elif search_type == "contains":
            # infix match via the per-bucket trigram vocabulary index
            # (_Bucket.contains — O(candidates) per probe after a
            # once-per-bucket build; <3-char infixes fall back to the
            # linear scan, which Heaps' law keeps corpus-sublinear)
            p = queries[0]
            terms = []
            for b in range(self.num_buckets):
                terms.extend(self.bucket(b).contains(p))
        elif search_type == "wildcard":
            # glob over the vocabulary (Lucene WildcardQuery): literal
            # runs >=3 chars feed the shared trigram index, anchored
            # regex verifies; like prefix/contains, hash partitioning
            # destroys pattern locality so it fans out to ALL buckets
            p = queries[0]
            terms = []
            for b in range(self.num_buckets):
                terms.extend(self.bucket(b).wildcard(p))
        elif search_type == "regex":
            # full-term regex over the vocabulary (Lucene RegexpQuery):
            # mandatory literal runs feed the shared trigram index,
            # fullmatch verifies; fans out to ALL buckets like
            # prefix/contains/wildcard (hash partitioning destroys
            # pattern locality)
            p = queries[0]
            terms = []
            for b in range(self.num_buckets):
                terms.extend(self.bucket(b).regex(p))
        elif search_type in ("fuzzy", "fuzzy2"):
            # Levenshtein union over every query word (fuzzy.py; edit
            # budget 1, or 2 for fuzzy2 — the Lucene fuzzy cap): hash
            # partitioning destroys edit-neighborhood locality the same
            # way it does prefix order, so fuzzy fans out to ALL
            # buckets; each probe is one vectorized matrix compare /
            # scan-free DP per (bucket, query-length-group).
            me = 2 if search_type == "fuzzy2" else 1
            terms = []
            for b in range(self.num_buckets):
                terms.extend(self.bucket(b).edit1().match_all(queries, me))
        else:
            raise ValueError(f"unknown search_type {search_type!r}")
        return sorted(set(terms))

    def vocab_terms(self):
        """Iterate every index term (bucket order) — the suggestion
        expander's vocabulary source (ST3)."""
        for b in range(self.num_buckets):
            yield from self.bucket(b).terms

    def vocabulary_size(self) -> int:
        """Reference tree.size() (SearchEngineConcurrentTree.java:286-300).
        Parquet footer row counts only — no bucket data is read."""
        total = 0
        for b in range(self.num_buckets):
            path = os.path.join(self.index_root, "buckets", f"bucket={b}",
                                "postings.parquet")
            total += pq.ParquetFile(path).metadata.num_rows
        return total

    # --- scoring ----------------------------------------------------------

    _DECODE_CACHE_MAX = 2048  # decoded postings kept hot (LRU, per searcher)

    def _decode(self, term: str, rec: dict) -> dict:
        """decode_posting with a small LRU — repeated terms (serving
        workloads, prefix expansions re-probed across queries) skip the
        varbyte decode entirely."""
        if not hasattr(self, "_decode_cache"):
            from collections import OrderedDict

            self._decode_cache = OrderedDict()
        cache = self._decode_cache
        hit = cache.get(term)
        if hit is not None:
            cache.move_to_end(term)
            return hit
        dec = decode_posting(rec)
        # idf-free partial depends only on per-searcher constants — cache
        # it with the decode so warm queries skip the float recompute
        dec["partial"] = _partials(dec, self.avgdl, self.k1, self.b)
        cache[term] = dec
        if len(cache) > self._DECODE_CACHE_MAX:
            cache.popitem(last=False)
        return dec

    def _gather(self, terms: list[str]) -> list[tuple[str, dict, float]]:
        out = []
        for t in terms:
            rec = self._posting_for(t)
            if rec is not None:
                out.append((t, rec, bm25_idf(self.n_docs, rec["df"])))
        return out

    # --- document attributes (doc-values: filtered search + facets) -------

    def attrs(self, column: str) -> tuple[np.ndarray, list[str]]:
        """Per-ordinal dictionary codes + sorted categories for one
        ``docs_clean`` attribute column (state/attrs.py), loaded lazily
        ONCE per searcher. Raises KeyError for a column the build did
        not persist."""
        if not hasattr(self, "_attr_cache"):
            self._attr_cache = {}
        hit = self._attr_cache.get(column)
        if hit is None:
            from search_engine_ray.state.attrs import attrs_by_ordinal

            try:
                hit = attrs_by_ordinal(
                    os.path.join(self.index_root, "docs_clean"), column)
            except Exception as e:  # noqa: BLE001 - parquet error shapes vary
                raise KeyError(
                    f"attribute column {column!r} is not stored in this "
                    f"index's docs_clean ({e})") from e
            self._attr_cache[column] = hit
        return hit

    def numeric_attrs(self, column: str) -> np.ndarray:
        """Per-ordinal numeric attribute values (state/attrs.py), loaded
        lazily once per searcher — range predicates and histograms."""
        if not hasattr(self, "_numattr_cache"):
            self._numattr_cache = {}
        hit = self._numattr_cache.get(column)
        if hit is None:
            from search_engine_ray.state.attrs import numeric_by_ordinal

            try:
                hit = numeric_by_ordinal(
                    os.path.join(self.index_root, "docs_clean"), column)
            except Exception as e:  # noqa: BLE001
                raise KeyError(
                    f"numeric attribute column {column!r} unavailable in "
                    f"this index's docs_clean ({e})") from e
            self._numattr_cache[column] = hit
        return hit

    def existence_mask(self) -> np.ndarray | None:
        """Boolean live-mask over ordinals from the pending-deletes
        sidecar (reference M8: SimpleSearchManager.java:66 re-checks
        ``Files.exists`` per hit). One ``os.stat`` per call — ids are
        re-read and the mask rebuilt only when the sidecar's
        (mtime, size) signature changes, so a query on an unchanged
        index pays ~1 us. None when nothing is pending."""
        from search_engine_ray.pending import pending_signature, read_pending

        sig = pending_signature(self.index_root)
        if sig != self._pending_sig:
            self._pending_sig = sig
            if sig is None:
                self._pending_mask, self._pending_seq = None, 0
            else:
                ids, seq = read_pending(self.index_root)
                self._pending_seq = seq
                if not ids.size:
                    self._pending_mask = None
                else:
                    ords = self.ords()
                    mask = np.ones(len(ords), dtype=bool)
                    pos = np.searchsorted(ords, ids)
                    ok = pos < len(ords)  # ids past the last ord miss
                    hit = pos[ok][ords[pos[ok]] == ids[ok]]
                    mask[hit] = False
                    self._pending_mask = mask if hit.size else None
        return self._pending_mask

    def existence_seq(self) -> int:
        """Monotonic generation of the pending-deletes sidecar (0 = none);
        refreshes via the same stat. Result caches key on this so a
        ``mark_deleted`` invalidates stale cached pages."""
        self.existence_mask()
        return self._pending_seq

    def live_mask(self, where: dict | None = None) -> np.ndarray | None:
        """The one mask every result surface applies: attribute
        predicates (``where``) AND the M8 existence filter. None when
        both are absent (the common unfiltered hot path allocates
        nothing)."""
        pend = self.existence_mask()
        if where is None:
            return pend
        m = self.ordinal_mask(where)
        return m if pend is None else (m & pend)

    def ordinal_mask(self, where: dict) -> np.ndarray:
        """Boolean keep-mask over ordinals for an AND of predicates
        ({column: value}). Value forms:

        * ``str``                 — dictionary equality (a value absent
          from the column's category set yields an all-False mask);
        * ``(lo, hi)`` tuple/list — inclusive numeric range over a
          numeric column (None = open end; timestamps compare as int64
          microseconds);
        * ``int`` / ``float``     — numeric equality."""
        mask = np.ones(len(self.ords()), dtype=bool)
        for col, val in sorted(where.items()):
            if isinstance(val, (tuple, list)):
                lo, hi = val
                vals = self.numeric_attrs(col)
                if lo is not None:
                    mask &= vals >= lo
                if hi is not None:
                    mask &= vals <= hi
            elif isinstance(val, (int, float)) and not isinstance(val,
                                                                  bool):
                mask &= self.numeric_attrs(col) == val
            else:
                codes, cats = self.attrs(col)
                i = bisect_left(cats, str(val))
                if i < len(cats) and cats[i] == str(val):
                    mask &= codes == np.int32(i)
                else:
                    mask[:] = False
        return mask

    def complete(self, prefix: str, k: int = 10) -> pa.Table:
        """df-ranked autocomplete (Lucene suggester analogue): the top-k
        vocabulary terms with this prefix ordered (df desc, term asc).
        Vocabulary-light: bisects each bucket's sorted term list via the
        term/df-only ``terms_df`` view — a cold call column-prunes the
        parquet read instead of materializing posting blobs."""
        terms: list[str] = []
        dfs: list[int] = []
        for b in range(self.num_buckets):
            bterms, bdf = self.terms_df(b)
            lo = bisect_left(bterms, prefix)
            for i in range(lo, len(bterms)):
                if not bterms[i].startswith(prefix):
                    break
                terms.append(bterms[i])
                dfs.append(int(bdf[i]))
        order = sorted(range(len(terms)),
                       key=lambda i: (-dfs[i], terms[i]))[:k]
        return pa.table({
            "term": pa.array([terms[i] for i in order], pa.string()),
            "df": pa.array([dfs[i] for i in order], pa.int64()),
        })

    def facet_counts(self, queries: list[str], search_type: str = "or",
                     by: str = "lang",
                     where: dict[str, str] | None = None,
                     terms: list[str] | None = None) -> pa.Table:
        """Facet counting (Lucene facets analogue): distinct matching
        documents per value of attribute ``by``, over the query's full
        match set (the UNION of the expanded terms' postings — match
        semantics, not top-k truncation), optionally pre-filtered by
        ``where``. Returns (value, n_docs) ordered (n_docs desc, value
        asc). Cost: one posting decode per term + one bincount — no
        scoring, no url resolution. ``terms``: pre-expanded term list
        override (doc-sharded serving expands against the GLOBAL sidecar
        vocabulary and injects the result here)."""
        codes, cats = self.attrs(by)
        cand = self._match_ordinals(queries, search_type, where, terms)
        counts = np.bincount(codes[cand], minlength=len(cats)).astype(
            np.int64)
        nz = np.flatnonzero(counts)
        order = nz[np.lexsort((np.array(cats, dtype=object)[nz],
                               -counts[nz]))]
        return pa.table({
            "value": pa.array([cats[i] for i in order], pa.string()),
            "n_docs": pa.array(counts[order], pa.int64()),
        })

    def _after_key(self, search_after) -> tuple[float, int] | None:
        """(score, doc_id) cursor -> (score, min_ordinal): the smallest
        ordinal strictly after the cursor doc (ordinal order == doc_id
        order), so the scorers compare ordinals only."""
        if search_after is None:
            return None
        s, d = search_after
        return (float(s),
                int(np.searchsorted(self.ords(), int(d), side="right")))

    def _match_ordinals(self, queries: list[str], search_type: str,
                        where: dict | None,
                        terms: list[str] | None) -> np.ndarray:
        """The query's full match set as ordinals (facet kernels share
        this): union of the expanded terms' postings, intersected for
        'and', masked by ``where``."""
        if terms is None:
            terms = self.expand(queries, search_type)
        gathered = self._gather(terms)
        if search_type == "and" and len(gathered) < len(terms):
            gathered = []
        if not gathered:
            return np.empty(0, np.int64)
        cand = np.unique(np.concatenate(
            [self._decode(t, rec)["docids"] for t, rec, _ in gathered]))
        if search_type == "and":
            for t, rec, _ in gathered:
                d = self._decode(t, rec)["docids"]
                cand = cand[np.isin(cand, d, assume_unique=True)]
        lm = self.live_mask(where)
        if lm is not None:
            cand = cand[lm[cand]]
        return cand

    def facet_histogram(self, queries: list[str], edges: list[float],
                        search_type: str = "or", by: str = "doc_len",
                        where: dict | None = None,
                        terms: list[str] | None = None) -> pa.Table:
        """Numeric range facets (Lucene range-facet analogue): matching-
        doc counts per half-open bin [edges[i], edges[i+1]) over a
        numeric attribute; values outside [edges[0], edges[-1]) are
        excluded. Returns every bin (zeros included) in edge order."""
        if sorted(edges) != list(edges) or len(edges) < 2:
            raise ValueError("edges must be ascending with >= 2 entries")
        vals = self.numeric_attrs(by)[
            self._match_ordinals(queries, search_type, where, terms)]
        e = np.asarray(edges, dtype=np.float64)
        idx = np.searchsorted(e, vals, side="right") - 1
        ok = (idx >= 0) & (idx < len(e) - 1) & (vals < e[-1])
        counts = np.bincount(idx[ok], minlength=len(e) - 1)
        return pa.table({
            "bin_lo": pa.array(e[:-1], pa.float64()),
            "bin_hi": pa.array(e[1:], pa.float64()),
            "n_docs": pa.array(counts.astype(np.int64), pa.int64()),
        })

    def search(
        self,
        queries: list[str],
        search_type: str = "exact",
        k: int = 10,
        scorer: str = "taat",
        with_urls: bool = True,
        where: dict[str, str] | None = None,
        search_after: tuple[float, int] | None = None,
    ) -> pa.Table:
        """``where`` ({column: value}, ANDed equality over docs_clean
        attributes, e.g. {"lang": "en"}) filters documents BEFORE
        ranking — the filtered top-k, not a post-filter of the unfiltered
        top-k. Both kernels take the mask: TAAT masks each term's decoded
        postings, BMW skips masked candidates inside the block-max loop
        (the masked BMW variant), and the two stay bit-identical — so
        ``where``/``search_after`` ride whichever scorer is selected,
        including "auto".

        ``search_after`` ((score, doc_id) of the LAST hit of the previous
        page — the Elasticsearch cursor contract) returns the next k hits
        strictly after the cursor in (score desc, doc_id asc) rank order:
        deep paging without re-materializing earlier pages, stable
        because scores are deterministic float64 across topologies. Also
        rides the TAAT kernel."""
        terms = self.expand(queries, search_type)
        gathered = self._gather(terms)
        mask = self.live_mask(where)
        after = self._after_key(search_after)
        if scorer == "auto":
            # measured crossover (BASELINE.md 2M-doc probe): the dense
            # TAAT accumulator is O(corpus) per disjunctive query, so
            # past ~1M docs block-max range skipping wins (13 ms vs 56 ms
            # p50 at 2M); below it TAAT's vectorized adds win. Both are
            # bit-identical, so the switch is invisible to results.
            scorer = "bmw" if len(self.ords()) >= SCORER_AUTO_BMW_DOCS \
                else "taat"
        if search_type == "and":
            doc_ids, scores = self._score_and(gathered, k, mask=mask,
                                              after=after)
        elif scorer == "taat":
            doc_ids, scores = self._score_taat(gathered, k, mask=mask,
                                               after=after)
        elif scorer == "bmw":
            doc_ids, scores = self._score_bmw(gathered, k, mask=mask,
                                              after=after)
        else:
            raise ValueError(f"unknown scorer {scorer!r}")
        doc_ids = self.ords()[doc_ids] if len(doc_ids) else doc_ids
        urls = self.resolve_urls(doc_ids) if with_urls else None
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(doc_ids) + 1, dtype=np.int32)),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "url": pa.array(urls if urls is not None
                                else [""] * len(doc_ids), pa.string()),
            },
            schema=RESULT_SCHEMA,
        )

    def synonym_group(self, members: list[str]
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Merged pseudo-posting for one synonym group: (ordinals,
        summed tf, doc len). A group scores as ONE term — per-doc tf is
        the SUM of member tfs (integer sums, order-free and exact), the
        doc length is unchanged (every member sees the same document).
        Members absent from the vocabulary contribute nothing; None when
        no member exists. Duplicated members are collapsed first, so a
        group can never double-count a term."""
        decs = []
        for t in sorted(set(members)):
            rec = self._posting_for(t)
            if rec is not None:
                decs.append(self._decode(t, rec))
        if not decs:
            return None
        if len(decs) == 1:
            d = decs[0]
            return d["docids"], d["tfs"], d["doc_lens"]
        ids = np.concatenate([d["docids"] for d in decs])
        tfs = np.concatenate([d["tfs"] for d in decs])
        lens = np.concatenate([d["doc_lens"] for d in decs])
        uids, inv = np.unique(ids, return_inverse=True)
        # integer tf sums are exact in float64 (< 2^53) — bincount is the
        # fast path and cannot drift the way float partial sums would
        tf_sum = np.bincount(inv, weights=tfs,
                             minlength=uids.size).astype(np.int64)
        dl = np.zeros(uids.size, dtype=np.int64)
        dl[inv] = lens  # identical across members of the same doc
        return uids, tf_sum, dl

    def synonym_search(
        self,
        groups: list[list[str]],
        k: int = 10,
        with_urls: bool = True,
        where: dict[str, str] | None = None,
        search_after: tuple[float, int] | None = None,
        group_idfs: list[float] | None = None,
    ) -> pa.Table:
        """Lucene SynonymQuery semantics: each ``groups`` entry is a set
        of interchangeable vocabulary terms that scores as ONE
        pseudo-term — per-doc tf = sum of member tfs pushed through the
        BM25 partial ONCE (NOT a sum of per-member partials: the partial
        is concave in tf, so an OR over synonyms would over-score docs
        that hit several variants), idf from the pseudo-term's EXACT df
        (the size of the merged posting union; Lucene approximates this
        with max member df because it never materializes the union — we
        do, so the exact statistic is free). Groups combine
        disjunctively in caller order. ``where``/``search_after`` follow
        the search() contract. ``group_idfs`` injects per-group idfs
        (sharded topologies: the union df must be computed over the
        GLOBAL corpus — see ShardedSearcher.synonym_search)."""
        if self._tok.folding:
            groups = [[self._tok.fold(t) for t in g] for g in groups]
        mask = self.live_mask(where)
        after = self._after_key(search_after)
        id_parts, sc_parts = [], []
        for gi, g in enumerate(groups):
            merged = self.synonym_group(g)
            if merged is None:
                continue
            uids, tf_sum, dl = merged
            idf = group_idfs[gi] if group_idfs is not None \
                else bm25_idf(self.n_docs, uids.size)
            partial = _partials({"tfs": tf_sum, "doc_lens": dl},
                                self.avgdl, self.k1, self.b)
            if mask is not None:
                keep = mask[uids]
                uids, partial = uids[keep], partial[keep]
            id_parts.append(uids)
            sc_parts.append(idf * partial)
        if id_parts:
            doc_ids, scores = _accumulate_topk(
                id_parts, sc_parts, k, len(self.ords()), after=after)
        else:
            doc_ids = np.empty(0, np.int64)
            scores = np.empty(0, np.float64)
        doc_ids = self.ords()[doc_ids] if len(doc_ids) else doc_ids
        urls = self.resolve_urls(doc_ids) if with_urls else None
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(doc_ids) + 1,
                                           dtype=np.int32)),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "url": pa.array(urls if urls is not None
                                else [""] * len(doc_ids), pa.string()),
            },
            schema=RESULT_SCHEMA,
        )

    def synonym_group_df(self, groups: list[list[str]]) -> list[int]:
        """Per-group union df (distinct docs containing ANY member) —
        the pseudo-term's collection statistic. Doc-sharded topologies
        sum this across shards (disjoint doc sets) for the global idf."""
        out = []
        for g in groups:
            if self._tok.folding:
                g = [self._tok.fold(t) for t in g]
            merged = self.synonym_group(g)
            out.append(0 if merged is None else int(merged[0].size))
        return out

    def _score_taat(self, gathered, k: int, mask: np.ndarray | None = None,
                    after: tuple[float, int] | None = None):
        """``mask``: optional per-ordinal keep filter (filtered search) —
        applied to each term's postings BEFORE accumulation, so the
        addition order over surviving docs is unchanged (bit-identical
        to scoring a corpus that never contained the masked docs).
        ``after``: cursor-pagination predicate (see _after_filter),
        applied to the accumulated candidates before top-k selection."""
        if not gathered:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        id_parts, sc_parts = [], []
        for t, rec, idf in gathered:  # lexicographic term order
            dec = self._decode(t, rec)
            partial = dec["partial"]
            if mask is not None:
                keep = mask[dec["docids"]]
                id_parts.append(dec["docids"][keep])
                sc_parts.append(idf * partial[keep])
                continue
            id_parts.append(dec["docids"])
            sc_parts.append(idf * partial)
        if len(id_parts) == 1:
            # single term: docids are already unique+sorted — no merge pass
            ids1, scs1 = _after_filter(id_parts[0], sc_parts[0], after)
            top = _topk_indices(ids1, scs1, k)
            return ids1[top], scs1[top]
        # dense-accumulator bound = LOCAL ordinal-space size (postings hold
        # ordinals into this index's ordinal map) — NOT stats n_docs, which
        # under ShardedSearcher's stats_override is the GLOBAL corpus size
        # and would allocate 8 B x global-N per shard per query.
        return _accumulate_topk(id_parts, sc_parts, k, len(self.ords()),
                                after=after)

    def _score_and(self, gathered, k: int, mask: np.ndarray | None = None,
                   after: tuple[float, int] | None = None):
        """Conjunctive BM25: posting-list intersection (sorted-array
        intersect, smallest list first), then per-term score gathers at the
        surviving doc ids — in lexicographic term order, as always.
        ``mask``: optional per-ordinal keep filter (filtered search),
        applied to the intersection before the score gathers. ``after``:
        cursor-pagination predicate, applied before top-k selection."""
        if not gathered:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        decs = [(t, self._decode(t, rec), idf) for t, rec, idf in gathered]
        ids = None
        for _, dec, _ in sorted(decs, key=lambda x: x[1]["docids"].size):
            ids = dec["docids"] if ids is None else np.intersect1d(
                ids, dec["docids"], assume_unique=True)
            if ids.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        if mask is not None:
            ids = ids[mask[ids]]
            if ids.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        totals = np.zeros(ids.size, dtype=np.float64)
        for _, dec, idf in decs:  # lexicographic (gathered is term-sorted)
            pos = np.searchsorted(dec["docids"], ids)
            totals += idf * dec["partial"][pos]
        ids, totals = _after_filter(ids, totals, after)
        top = _topk_indices(ids, totals, k)
        return ids[top], totals[top]

    def _decode_positions(self, term: str, rec: dict) -> dict | None:
        """Positions-bearing decode, cached per term (LRU alongside
        _decode): docids + per-doc position-slice starts. Decoded ONCE per
        term per cache lifetime — NOT once per candidate doc."""
        if not rec["pos_vb"]:
            return None
        if not hasattr(self, "_pos_cache"):
            from collections import OrderedDict

            self._pos_cache = OrderedDict()
        cache = self._pos_cache
        hit = cache.get(term)
        if hit is not None:
            cache.move_to_end(term)
            return hit
        dec = decode_posting(rec, with_positions=True)
        dec["starts"] = np.concatenate(([0], np.cumsum(dec["tfs"])))
        cache[term] = dec
        if len(cache) > self._DECODE_CACHE_MAX:
            cache.popitem(last=False)
        return dec

    def phrase_search(self, terms: list[str], k: int = 10,
                      with_urls: bool = True,
                      idfs: dict[str, float] | None = None,
                      where: dict | None = None) -> pa.Table:
        """Ordered same-line proximity over stored positions: docs where
        the terms appear on one line in order (oracle.ordered_in_row),
        BM25-ranked. Requires a positions-bearing index.

        Cost shape: one AND intersection + ONE positions decode per distinct
        term (LRU-cached), then per-candidate numpy slice + position walk,
        early-exiting after k phrase matches — candidates x terms slice
        lookups, not candidates x full-posting decodes.

        ``idfs`` overrides per-term idf (doc-sharded serving injects
        GLOBAL df idfs so shard-local phrase top-k merges exactly)."""
        from search_engine_ray.oracle import ordered_in_row

        empty = pa.table(
            {"rank": pa.array([], pa.int32()),
             "doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64()),
             "url": pa.array([], pa.string())}, schema=RESULT_SCHEMA)
        uniq = sorted(set(terms))
        gathered = self._gather(uniq)
        if idfs is not None:
            gathered = [(t, rec, idfs[t]) for t, rec, _ in gathered]
        if not terms or len(gathered) < len(uniq):
            return empty  # conjunctive: a missing term empties the result
        pos_decs: dict[str, dict] = {}
        for t, rec, _ in gathered:
            dec = self._decode_positions(t, rec)
            if dec is None:
                return empty  # index built without positions
            pos_decs[t] = dec
        # all AND candidates, ranked (score desc, ordinal asc);
        # `where` masks the candidates BEFORE the positions walk
        mask = self.live_mask(where)
        ords, scores = self._score_and(gathered, k=self.n_docs or 1,
                                       mask=mask)
        keep_ords, keep_scores = [], []
        for o, sc in zip(ords.tolist(), scores.tolist()):
            rows_per_term = []
            for t in terms:  # PHRASE order, not lexicographic
                dec = pos_decs[t]
                i = int(np.searchsorted(dec["docids"], o))
                poss = dec["positions"][dec["starts"][i]:dec["starts"][i + 1]]
                rows: dict[int, list[int]] = {}
                for p in poss.tolist():
                    rows.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
                rows_per_term.append(rows)
            common = set(rows_per_term[0])
            for r in rows_per_term[1:]:
                common &= set(r)
            if any(ordered_in_row([rpt[row] for rpt in rows_per_term])
                   for row in common):
                keep_ords.append(o)
                keep_scores.append(sc)
                if len(keep_ords) >= k:
                    break
        doc_ids = self.ords()[np.asarray(keep_ords, dtype=np.int64)] \
            if keep_ords else np.empty(0, np.int64)
        urls = self.resolve_urls(doc_ids) if with_urls \
            else [""] * len(doc_ids)
        return pa.table(
            {"rank": pa.array(np.arange(1, len(doc_ids) + 1, dtype=np.int32)),
             "doc_id": pa.array(doc_ids, pa.int64()),
             "score": pa.array(np.asarray(keep_scores, dtype=np.float64)),
             "url": pa.array(urls, pa.string())}, schema=RESULT_SCHEMA)

    def near_search(self, terms: list[str], window: int = 8, k: int = 10,
                    with_urls: bool = True,
                    idfs: dict[str, float] | None = None,
                    where: dict | None = None) -> pa.Table:
        """Unordered same-line proximity (NEAR/window, the Lucene sloppy-
        PhraseQuery analogue): docs where every DISTINCT query term
        occurs on one line within a ``window``-column span — columns
        are the STORED position unit, the token's character offset in
        its line (oracle.within_window_in_row, the shared minimal-cover
        predicate) — ranked by conjunctive BM25. Same cost shape and
        ``idfs`` injection contract as ``phrase_search``."""
        from search_engine_ray.oracle import within_window_in_row

        empty = pa.table(
            {"rank": pa.array([], pa.int32()),
             "doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64()),
             "url": pa.array([], pa.string())}, schema=RESULT_SCHEMA)
        uniq = sorted(set(terms))
        gathered = self._gather(uniq)
        if idfs is not None:
            gathered = [(t, rec, idfs[t]) for t, rec, _ in gathered]
        if not terms or len(gathered) < len(uniq):
            return empty  # conjunctive: a missing term empties the result
        pos_decs: dict[str, dict] = {}
        for t, rec, _ in gathered:
            dec = self._decode_positions(t, rec)
            if dec is None:
                return empty  # index built without positions
            pos_decs[t] = dec
        mask = self.live_mask(where)
        ords, scores = self._score_and(gathered, k=self.n_docs or 1,
                                       mask=mask)
        keep_ords, keep_scores = [], []
        for o, sc in zip(ords.tolist(), scores.tolist()):
            rows_per_term = []
            for t in uniq:
                dec = pos_decs[t]
                i = int(np.searchsorted(dec["docids"], o))
                poss = dec["positions"][dec["starts"][i]:dec["starts"][i + 1]]
                rows: dict[int, list[int]] = {}
                for p in poss.tolist():
                    rows.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
                rows_per_term.append(rows)
            common = set(rows_per_term[0])
            for r in rows_per_term[1:]:
                common &= set(r)
            if any(within_window_in_row([rpt[row] for rpt in rows_per_term],
                                        window)
                   for row in common):
                keep_ords.append(o)
                keep_scores.append(sc)
                if len(keep_ords) >= k:
                    break
        doc_ids = self.ords()[np.asarray(keep_ords, dtype=np.int64)] \
            if keep_ords else np.empty(0, np.int64)
        urls = self.resolve_urls(doc_ids) if with_urls \
            else [""] * len(doc_ids)
        return pa.table(
            {"rank": pa.array(np.arange(1, len(doc_ids) + 1, dtype=np.int32)),
             "doc_id": pa.array(doc_ids, pa.int64()),
             "score": pa.array(np.asarray(keep_scores, dtype=np.float64)),
             "url": pa.array(urls, pa.string())}, schema=RESULT_SCHEMA)

    def explain(self, queries: list[str], search_type: str = "exact",
                doc_id: int | None = None) -> pa.Table:
        """Score breakdown for one document (Lucene ``explain``
        analogue): per expanded term its df, idf, tf, length-normalized
        partial and contribution — ``sum(contribution)`` equals the
        doc's score in ``search`` results bit-for-bit (pinned by test).
        ``doc_id`` is the REAL doc id (as returned by search)."""
        terms = self.expand(queries, search_type)
        ordn = int(np.searchsorted(self.ords(), doc_id))
        if ordn >= len(self.ords()) or self.ords()[ordn] != doc_id:
            raise KeyError(f"doc_id {doc_id} is not in this index")
        rows = []
        for t in terms:  # lexicographic — the accumulation order
            rec = self._posting_for(t)
            if rec is None:
                continue
            dec = self._decode(t, rec)
            pos = int(np.searchsorted(dec["docids"], ordn))
            if pos >= dec["docids"].size or dec["docids"][pos] != ordn:
                continue
            idf = bm25_idf(self.n_docs, rec["df"])
            partial = float(dec["partial"][pos])
            rows.append((t, int(rec["df"]), idf, int(dec["tfs"][pos]),
                         partial, idf * partial))
        return pa.table({
            "term": pa.array([r[0] for r in rows], pa.string()),
            "df": pa.array([r[1] for r in rows], pa.int64()),
            "idf": pa.array([r[2] for r in rows], pa.float64()),
            "tf": pa.array([r[3] for r in rows], pa.int64()),
            "partial": pa.array([r[4] for r in rows], pa.float64()),
            "contribution": pa.array([r[5] for r in rows], pa.float64()),
        })

    def bool_search(self, query: str, k: int = 10,
                    with_urls: bool = True,
                    idfs: dict[str, float] | None = None,
                    where: dict | None = None) -> pa.Table:
        """Boolean query (boolquery.py grammar: AND/OR/NOT, parens):
        the predicate selects documents via sorted-ordinal set algebra;
        the score is the BM25 sum of the POSITIVE clauses each matching
        doc contains (NOT filters, never scores — pure-negation matches
        score 0.0 and rank by doc_id). ``idfs`` overrides per-term idf
        (doc-sharded serving injects GLOBAL dfs, as in phrase_search)."""
        from search_engine_ray.boolquery import (
            eval_ordinals,
            parse,
            positive_terms,
            term_leaves,
        )

        ast = parse(query)
        decs: dict[str, dict] = {}
        for t in sorted(term_leaves(ast)):
            rec = self._posting_for(t)
            if rec is not None:
                decs[t] = self._decode(t, rec)
        n = len(self.ords())
        final = eval_ordinals(
            ast, {t: d["docids"] for t, d in decs.items()}, n)
        lm = self.live_mask(where)
        if lm is not None:
            # filtering the FINAL set == evaluating over a filtered
            # corpus for any boolean formula (set algebra distributes)
            final = final[lm[final]]
        totals = np.zeros(final.size, dtype=np.float64)
        for t in sorted(positive_terms(ast)):  # lexicographic float order
            d = decs.get(t)
            if d is None or not final.size:
                continue
            idf = (idfs[t] if idfs is not None and t in idfs
                   else bm25_idf(self.n_docs, d["docids"].size))
            pos = np.searchsorted(d["docids"], final)
            pos_c = np.minimum(pos, d["docids"].size - 1)
            hit = d["docids"][pos_c] == final
            totals[hit] += idf * d["partial"][pos_c[hit]]
        top = _topk_indices(final, totals, k)
        doc_ids = self.ords()[final[top]] if top.size else \
            np.empty(0, np.int64)
        urls = self.resolve_urls(doc_ids) if with_urls \
            else [""] * len(doc_ids)
        return pa.table(
            {"rank": pa.array(np.arange(1, len(doc_ids) + 1,
                                        dtype=np.int32)),
             "doc_id": pa.array(doc_ids, pa.int64()),
             "score": pa.array(totals[top], pa.float64()),
             "url": pa.array(urls, pa.string())}, schema=RESULT_SCHEMA)

    # ordinal-range width for the vectorized block-max scorer: 32 codec
    # blocks (codec.BLOCK_SIZE=128). Small enough that the per-range dense
    # accumulator stays L2-resident, large enough that the Python range
    # loop is O(n_docs/4096) at worst.
    _BMW_RANGE = 4096

    def _score_bmw(self, gathered, k: int,
                   mask: np.ndarray | None = None,
                   after: tuple[float, int] | None = None):
        """Exact block-max scoring, range-at-a-time; identical output to
        ``taat``.

        ``mask`` / ``after`` (filtered search, cursor pagination): block
        upper bounds stay VALID under any doc subset (they only grow
        less tight), so the skip logic is unchanged; the predicate drops
        candidates per range before the heap merge. A doc's score is the
        sum of ITS postings only, so masked accumulation is bit-identical
        to the masked TAAT kernel for every surviving doc. Selective
        filters loosen the bounds (masked docs still inflate them) —
        at worst this degrades to scoring every range, i.e. TAAT cost.

        The classic doc-at-a-time WAND pivot walk costs O(pivots) in the
        Python interpreter (~us each) and loses to TAAT's O(postings)
        numpy kernels (~ns each) by 100x whenever postings are decoded in
        memory (the r1/r2 measurement in the module docstring). This
        version keeps the block-max skipping but moves the granularity up
        to fixed ordinal RANGES (32 codec blocks each):

        1. per term, coarsen the per-128-block (last_docid, max_partial)
           metadata to a per-range upper bound (monotone reduceat — a
           block straddling a range boundary contributes to both sides,
           still a valid bound);
        2. sum per-term bounds into a per-range bound, sort ranges by it
           DESCENDING (high-scoring regions first → theta rises fast);
        3. walk ranges: once the top-k heap is full, any range whose
           bound is strictly below theta — and therefore every remaining
           range — is skipped without touching its postings. Surviving
           ranges are scored with the same dense per-term scatter-adds as
           ``_score_taat`` (term-lex order ⇒ bit-identical float sums),
           using precomputed per-range slice offsets (no per-range
           binary search).

        Interpreter cost is O(ranges_survived x terms); the skipped work
        is real posting-score work, so selective queries (high theta
        after the first ranges) finish without reading most of the
        postings — the win condition block-max metadata exists for.
        Ranges with bound == theta are still scored: a doc scoring
        exactly theta can win the (score desc, ordinal asc) tie-break."""
        if not gathered or k <= 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        n_ords = len(self.ords())
        W = self._BMW_RANGE
        n_ranges = (n_ords + W - 1) // W
        range_ub = np.zeros(n_ranges, dtype=np.float64)
        term_data = []  # (docids, partial, per-range slice offsets)
        range_edges = np.arange(n_ranges + 1, dtype=np.int64) * W
        for t, rec, idf in gathered:  # lexicographic term order
            dec = self._decode(t, rec)
            docids = dec["docids"]
            if docids.size == 0:
                continue
            partial = idf * dec["partial"]
            lasts, maxs = decode_blockmax(rec["blockmax"])
            ubs = idf * maxs
            # block i spans (lasts[i-1], lasts[i]] in ordinal space; its
            # ub covers ranges firsts[i]//W .. lasts[i]//W
            firsts = np.empty_like(lasts)
            firsts[0] = docids[0]
            firsts[1:] = lasts[:-1] + 1
            lo_r = firsts // W
            hi_r = lasts // W
            spans = hi_r - lo_r + 1
            # concatenated aranges [0..span_i): idx is non-decreasing
            # because blocks are docid-sorted
            total = int(spans.sum())
            step = np.ones(total, dtype=np.int64)
            step[0] = 0
            seg = np.cumsum(spans)[:-1]
            step[seg] -= spans[:-1]
            idx = np.repeat(lo_r, spans) + np.cumsum(step)
            uidx, first_at = np.unique(idx, return_index=True)
            range_ub[uidx] += np.maximum.reduceat(
                np.repeat(ubs, spans), first_at)
            offs = np.searchsorted(docids, range_edges)
            term_data.append((docids, partial, offs))
        if not term_data:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        order = np.argsort(-range_ub, kind="stable")
        acc = np.zeros(W, dtype=np.float64)
        top_ids = np.empty(0, np.int64)
        top_scores = np.empty(0, np.float64)
        theta = -np.inf
        for r in order.tolist():
            ub = float(range_ub[r])
            if ub <= 0.0 or (top_ids.size == k and ub < theta):
                break  # descending order: every remaining range loses too
            base = r * W
            width = min(base + W, n_ords) - base
            acc[:width] = 0.0
            touched = False
            for docids, partial, offs in term_data:  # term-lex order
                a, b = int(offs[r]), int(offs[r + 1])
                if a == b:
                    continue
                acc[docids[a:b] - base] += partial[a:b]
                touched = True
            if not touched:
                continue
            cand = np.flatnonzero(acc[:width] > 0)
            totals = acc[cand]
            cand += base
            if mask is not None:
                keep = mask[cand]
                cand, totals = cand[keep], totals[keep]
            if after is not None:
                cand, totals = _after_filter(cand, totals, after)
            if cand.size == 0:
                continue
            if top_ids.size == k:
                keep = totals >= theta  # == theta can win the id tie-break
                cand, totals = cand[keep], totals[keep]
                if cand.size == 0:
                    continue
            all_ids = np.concatenate([top_ids, cand])
            all_sc = np.concatenate([top_scores, totals])
            sel = np.lexsort((all_ids, -all_sc))[:k]
            top_ids, top_scores = all_ids[sel], all_sc[sel]
            if top_ids.size == k:
                theta = float(top_scores[-1])
        return top_ids, top_scores

    # --- forward index (reference I5: getKeys(docId)) --------------------

    def doc_terms(self, doc_id: int) -> list[tuple[str, int]]:
        """All (term, tf) of one document — the reference walks the WHOLE
        tree collecting nodes containing the doc id (O(index),
        SearchEngineConcurrentTree.java:203-233); we re-derive it from the
        doc's stored text in docs_clean (O(doc)), which is what the
        update/delete diff machinery needs it for."""
        t = pq.read_table(
            os.path.join(self.index_root, "docs_clean"),
            columns=["doc_id", "text"],
            filters=[("doc_id", "=", int(doc_id))],
        )
        if t.num_rows == 0:
            return []
        counts: dict[str, int] = {}
        for tok in self._tok.document_tokens(t.column("text")[0].as_py()):
            counts[tok] = counts.get(tok, 0) + 1
        return sorted(counts.items())

    def more_like_this(self, doc_id: int, k: int = 10,
                       max_terms: int = 10,
                       with_urls: bool = True) -> pa.Table:
        """Lucene MoreLikeThis analogue: select the source doc's
        ``max_terms`` highest tf*idf terms (forward walk ``doc_terms``;
        ties break term-ascending), run them as a disjunctive BM25 query,
        and drop the source doc from the hits. Deterministic: term
        selection and ranking share the engine's float64 conventions."""
        tf_terms = [(t, tf) for t, tf in self.doc_terms(doc_id)
                    if self._has_term(t)]
        if not tf_terms:
            return self.search([], "or", k=0, with_urls=with_urls)
        scored = []
        for t, tf in tf_terms:
            rec = self._posting_for(t)
            scored.append((-(tf * bm25_idf(self.n_docs, rec["df"])), t))
        sel = [t for _, t in sorted(scored)[:max_terms]]
        res = self.search(sel, "or", k=k + 1, with_urls=with_urls)
        keep = [i for i, d in enumerate(res.column("doc_id").to_pylist())
                if d != doc_id][:k]
        out = res.take(pa.array(keep, pa.int64()))
        return pa.table(
            {"rank": pa.array(np.arange(1, len(keep) + 1, dtype=np.int32)),
             "doc_id": out.column("doc_id"),
             "score": out.column("score"),
             "url": out.column("url")}, schema=RESULT_SCHEMA)

    # --- per-doc rescan (reference Q3/M9) --------------------------------

    def matched_rows(self, doc_id: int, term: str) -> dict[int, list[int]]:
        """row -> [cols] from stored positions (the reference re-reads and
        re-tokenizes the file at query time, SimpleSearchManager.java:187-214;
        we store positions at build time instead)."""
        rec = self._posting_for(term)
        if rec is None or not rec["pos_vb"]:
            return {}
        from search_engine_ray.state.ordinals import to_ordinals

        try:
            doc_ord = int(to_ordinals(np.array([doc_id], dtype=np.int64),
                                      self.ords())[0])
        except KeyError:
            return {}
        dec = self._decode_positions(term, rec)  # LRU — decoded once
        idx = np.searchsorted(dec["docids"], doc_ord)
        if idx >= len(dec["docids"]) or dec["docids"][idx] != doc_ord:
            return {}
        poss = dec["positions"][dec["starts"][idx]:dec["starts"][idx + 1]]
        out: dict[int, list[int]] = {}
        for p in poss.tolist():
            out.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
        return out


# dense-accumulator ceiling: 8 B x n_docs scratch per query. Fine for any
# per-node shard (<= 50M docs -> 400 MB); beyond that fall back to the
# sort-merge path (doc-space sharding keeps real deployments under this).
DENSE_ACC_MAX_DOCS = 50_000_000
# scorer="auto" switches to block-max scoring above this corpus size
# (measured crossover — BASELINE.md round-4 2M-doc probe)
SCORER_AUTO_BMW_DOCS = 1_000_000


def _after_filter(ids: np.ndarray, totals: np.ndarray,
                  after: tuple[float, int] | None
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Cursor pagination predicate: keep rows STRICTLY after the cursor
    in (score desc, ordinal asc) rank order. ``after`` = (score,
    min_ordinal): a row survives when its score is lower, or equal with
    ordinal >= min_ordinal (the caller pre-translates the cursor doc_id
    to the first strictly-greater ordinal via searchsorted, so float
    equality compares the SAME deterministic float64 the engine
    returned)."""
    if after is None:
        return ids, totals
    s, o_min = after
    keep = (totals < s) | ((totals == s) & (ids >= o_min))
    return ids[keep], totals[keep]


def _accumulate_topk(id_parts: list, sc_parts: list, k: int,
                     n_docs: int,
                     after: tuple[float, int] | None = None
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Sum per-doc contributions over the per-term arrays (given in
    lexicographic term order) and take the exact (score desc, ordinal asc)
    top-k.

    Dense path: one vectorized scatter-add per term — each doc receives
    its term contributions IN TERM ORDER, bit-identical to the oracle's
    sequential accumulation (np.bincount is NOT used: its internal
    accumulation can differ by 1 ulp). Falls back to stable sort-merge +
    reduceat past DENSE_ACC_MAX_DOCS (same addition order)."""
    if 0 < n_docs <= DENSE_ACC_MAX_DOCS:
        acc = np.zeros(n_docs, dtype=np.float64)
        for ids_t, scs_t in zip(id_parts, sc_parts):  # term lex order
            acc[ids_t] += scs_t  # ids unique within a term
        cand = np.flatnonzero(acc > 0)
        totals = acc[cand]
        cand, totals = _after_filter(cand, totals, after)
        top = _topk_indices(cand, totals, k)
        return cand[top], totals[top]
    # sparse fallback: compress doc ids to slots, then the SAME per-term
    # sequential scatter-adds (np.add.reduceat would sum pairwise and
    # diverge from the oracle by ulps)
    uids = np.unique(np.concatenate(id_parts))
    totals = np.zeros(uids.size, dtype=np.float64)
    for ids_t, scs_t in zip(id_parts, sc_parts):  # term lex order
        totals[np.searchsorted(uids, ids_t)] += scs_t
    uids, totals = _after_filter(uids, totals, after)
    top = _topk_indices(uids, totals, k)
    return uids[top], totals[top]


def _topk_indices(uids: np.ndarray, totals: np.ndarray, k: int) -> np.ndarray:
    """Exact (score desc, doc_id asc) top-k without a full sort:
    argpartition to the k-th score, widen to score ties at the threshold,
    lexsort only the candidate set. Identical output to a full lexsort."""
    n = totals.size
    if n <= k or n <= 1024:
        return np.lexsort((uids, -totals))[:k]
    part = np.argpartition(-totals, k - 1)[:k]
    thr = totals[part].min()
    cand = np.flatnonzero(totals >= thr)
    order = np.lexsort((uids[cand], -totals[cand]))[:k]
    return cand[order]


def _partials(dec: dict, avgdl: float, k1: float, b: float) -> np.ndarray:
    from search_engine_ray.codec import bm25_partial

    return bm25_partial(dec["tfs"], dec["doc_lens"], avgdl, k1, b)
