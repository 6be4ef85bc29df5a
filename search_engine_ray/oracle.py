"""Pure-Python single-process oracle — the rank-identity ground truth.

The reference returns UNRANKED doc sets capped at 100
(ref: engine/src/main/java/org/search/engine/search/SimpleSearchManager.java:64-70);
it has no scoring. Rank identity for BM25 is therefore established against
this oracle: a plain dict inverted index (the radix tree's term->docset
semantics without the tree) + standard BM25, sharing with the engine ONLY the
leaf-level pure functions that define the contract (tokenizer, extractor,
doc-id hash, the BM25 arithmetic in codec.py) — the data layout, shuffle and
execution are entirely independent, so agreement is meaningful.

Determinism invariants shared with the engine:
* doc_id = blake2b64(url) (idhash.py),
* dedup rule: keep the row with max warc_ts per url,
* scores accumulate per doc over query terms in LEXICOGRAPHIC term order
  (fixes float addition order across engines),
* top-k tie-break: (score desc, doc_id asc).

Search types mirror the reference's SearchType
(ref: engine/.../model/SearchType.java:3-5):
``exact`` (EXACT_MATCH), ``prefix`` (START_WITH, radix-subtree union —
ref: tree/SearchEngineConcurrentTree.java:176-195), ``or``
(WITH_SUGGESTIONS multi-query union — ref: SimpleSearchManager.java:61-62).
"""

from __future__ import annotations

from bisect import bisect_left
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from search_engine_ray.analyzer.tokenizers import get_tokenizer, pack_position
from search_engine_ray.codec import BM25_B, BM25_K1, bm25_idf, bm25_partial
from search_engine_ray.extract import extract_text
from search_engine_ray.idhash import doc_id_for_url


def within_window_in_row(cols_per_term: list[list[int]],
                         window: int) -> bool:
    """Unordered proximity: can one column be chosen from every list so
    that max - min <= window? Classic minimal-cover over k sorted lists:
    repeatedly advance the pointer at the current minimum — O(total
    positions) with k pointers. Shared by oracle and engine (the
    predicate is the spec; candidate generation differs)."""
    k = len(cols_per_term)
    if any(not c for c in cols_per_term):
        return False
    idx = [0] * k
    while True:
        vals = [cols_per_term[i][idx[i]] for i in range(k)]
        lo = min(range(k), key=vals.__getitem__)
        if max(vals) - vals[lo] <= window:
            return True
        idx[lo] += 1
        if idx[lo] >= len(cols_per_term[lo]):
            return False


def ordered_in_row(cols_per_term: list[list[int]]) -> bool:
    """Greedy left-to-right chain: can the terms appear in order (strictly
    increasing columns) within one line? Shared by oracle and engine."""
    prev = -1
    for cols in cols_per_term:
        nxt = min((c for c in cols if c > prev), default=None)
        if nxt is None:
            return False
        prev = nxt
    return True


def resolve_text(text: str | None, html: bytes | None) -> str:
    """The engine-wide rule: use ``text`` when present, else extract."""
    return text if text is not None else extract_text(html)


def dedup_latest(pages: pa.Table) -> list[dict]:
    """Keep max-warc_ts row per url (ties: max resolved text) — the SAME
    rule as the engine's stages/clean.dedup_group, so oracle and engine
    agree even when one url has two different texts at its max warc_ts."""
    best: dict[str, dict] = {}
    for row in pages.to_pylist():
        cur = best.get(row["url"])
        if cur is None:
            best[row["url"]] = row
        elif (row["warc_ts"], resolve_text(row["text"], row["html"])) > (
                cur["warc_ts"], resolve_text(cur["text"], cur["html"])):
            best[row["url"]] = row
    return [best[u] for u in sorted(best)]


class OracleIndex:
    def __init__(self, tokenizer: str = "standard"):
        self.tokenizer_name = tokenizer
        self._tok = get_tokenizer(tokenizer)
        # term -> {doc_id: (tf, [packed positions])}
        self.postings: dict[str, dict[int, tuple[int, list[int]]]] = {}
        self.doc_len: dict[int, int] = {}
        self.url_of: dict[int, str] = {}
        # doc_id -> {column: value} for every non-core page column
        # (metadata attributes: filtered search / facets ground truth)
        self.attr_of: dict[int, dict[str, str]] = {}
        # doc_id -> {column: numeric value} (range-predicate ground truth)
        self.attr_num: dict[int, dict] = {}
        self.n_docs = 0
        self.avgdl = 0.0

    @classmethod
    def build(cls, pages: pa.Table, tokenizer: str = "standard") -> "OracleIndex":
        self = cls(tokenizer)
        for row in dedup_latest(pages):
            text = resolve_text(row["text"], row["html"])
            doc_id = doc_id_for_url(row["url"])
            per_doc: dict[str, tuple[int, list[int]]] = {}
            n_tok = 0
            for r, tok, c in self._tok.iter_document(text):
                n_tok += 1
                tf, poss = per_doc.get(tok, (0, []))
                poss.append(pack_position(r, c))
                per_doc[tok] = (tf + 1, poss)
            self.doc_len[doc_id] = n_tok
            self.url_of[doc_id] = row["url"]
            self.attr_of[doc_id] = {
                c: ("" if v is None else str(v)) for c, v in row.items()
                if c not in ("url", "warc_ts", "html", "text")}
            # numeric attribute ground truth (range predicates):
            # timestamps as int64 microseconds (the Arrow storage unit)
            ts = row["warc_ts"]
            self.attr_num[doc_id] = {
                "doc_len": n_tok,
                "warc_ts": (ts - datetime(1970, 1, 1))
                // timedelta(microseconds=1) if ts is not None else None,
            }
            for c, v in row.items():
                if c not in self.attr_num[doc_id] and \
                        isinstance(v, (int, float)) and \
                        not isinstance(v, bool):
                    self.attr_num[doc_id][c] = v
            for tok, (tf, poss) in per_doc.items():
                self.postings.setdefault(tok, {})[doc_id] = (tf, poss)
        self.n_docs = len(self.doc_len)
        self.avgdl = (
            float(sum(self.doc_len.values())) / self.n_docs if self.n_docs else 0.0
        )
        self._sorted_terms = sorted(self.postings)
        return self

    # --- query side -------------------------------------------------------

    def expand(self, queries: list[str], search_type: str) -> list[str]:
        """Resolve a query to the concrete sorted term list it scores."""
        if self._tok.folding:
            queries = [self._tok.fold(q) for q in queries]
        if search_type == "exact":
            terms = [q for q in queries[:1] if q in self.postings]
        elif search_type == "or":
            terms = [q for q in queries if q in self.postings]
        elif search_type == "and":
            # conjunctive: every query term must exist, else no results
            if all(q in self.postings for q in queries) and queries:
                terms = list(queries)
            else:
                terms = []
        elif search_type == "prefix":
            p = queries[0]
            lo = bisect_left(self._sorted_terms, p)
            terms = []
            for t in self._sorted_terms[lo:]:
                if not t.startswith(p):
                    break
                terms.append(t)
        elif search_type == "contains":
            p = queries[0]
            terms = [t for t in self._sorted_terms if p in t]
        elif search_type == "wildcard":
            # glob match via a plain fnmatch scan — deliberately NOT the
            # engine's trigram-candidate path, so rank-identity tests
            # exercise independent implementations
            import fnmatch

            p = queries[0]
            terms = [t for t in self._sorted_terms
                     if fnmatch.fnmatchcase(t, p)]
        elif search_type == "regex":
            # full-term regex via a plain fullmatch scan — deliberately
            # NOT the engine's trigram-prefiltered path, so rank-identity
            # tests exercise independent implementations
            import re

            rx = re.compile(queries[0])
            terms = [t for t in self._sorted_terms if rx.fullmatch(t)]
        elif search_type in ("fuzzy", "fuzzy2"):
            # Levenshtein union over the query words — independent
            # scalar DP (fuzzy.levenshtein_leq), NOT the engine's
            # vectorized kernels, so rank-identity tests are meaningful.
            from search_engine_ray.fuzzy import expand_fuzzy_scan

            terms = expand_fuzzy_scan(
                queries, self._sorted_terms,
                max_edits=2 if search_type == "fuzzy2" else 1)
        else:
            raise ValueError(f"unknown search_type {search_type!r}")
        return sorted(set(terms))

    def _matches_where(self, doc_id: int, where: dict | None) -> bool:
        if where is None:
            return True
        attrs = self.attr_of.get(doc_id, {})
        nums = self.attr_num.get(doc_id, {})
        for c, v in where.items():
            if isinstance(v, (tuple, list)):
                lo, hi = v
                x = nums.get(c)
                if x is None or (lo is not None and x < lo) or \
                        (hi is not None and x > hi):
                    return False
            elif isinstance(v, (int, float)) and not isinstance(v, bool):
                if nums.get(c) != v:
                    return False
            elif attrs.get(c) != str(v):
                return False
        return True

    def _match_docs(self, queries: list[str], search_type: str,
                    where: dict | None) -> set[int]:
        terms = self.expand(queries, search_type)
        docs: set[int] = set()
        for t in terms:
            docs |= set(self.postings[t])
        if search_type == "and":
            for t in terms:
                docs &= set(self.postings[t])
        return {d for d in docs if self._matches_where(d, where)}

    def facet_histogram(self, queries: list[str], edges: list[float],
                        search_type: str = "or", by: str = "doc_len",
                        where: dict | None = None
                        ) -> list[tuple[float, float, int]]:
        """Numeric range facet twin: half-open [lo, hi) bins."""
        vals = [self.attr_num[d].get(by)
                for d in self._match_docs(queries, search_type, where)]
        out = []
        for lo, hi in zip(edges, edges[1:]):
            out.append((float(lo), float(hi),
                        sum(1 for v in vals
                            if v is not None and lo <= v < hi)))
        return out

    def complete(self, prefix: str, k: int = 10
                 ) -> list[tuple[str, int]]:
        """df-ranked autocomplete twin: (term, df) ordered
        (df desc, term asc)."""
        cands = [(t, len(self.postings[t])) for t in self.expand(
            [prefix], "prefix")]
        return sorted(cands, key=lambda td: (-td[1], td[0]))[:k]

    def facet_counts(self, queries: list[str], search_type: str = "or",
                     by: str = "lang",
                     where: dict[str, str] | None = None
                     ) -> list[tuple[str, int]]:
        """Distinct matching docs per ``by``-attribute value over the
        query's full match set (match semantics, not top-k), ordered
        (count desc, value asc) — the engine facet_counts twin."""
        from collections import Counter

        counts = Counter(
            self.attr_of[d].get(by, "")
            for d in self._match_docs(queries, search_type, where))
        return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))

    def search(
        self, queries: list[str], search_type: str = "exact", k: int = 10,
        k1: float = BM25_K1, b: float = BM25_B,
        where: dict[str, str] | None = None,
    ) -> list[tuple[int, float, str]]:
        """BM25 top-k over the expanded term set; returns (doc_id, score,
        url). ``where``: AND of attribute equality predicates, filtering
        documents BEFORE ranking (the filtered-top-k twin)."""
        terms = self.expand(queries, search_type)
        acc: dict[int, float] = {}
        for t in terms:  # lexicographic order — float-add order invariant
            plist = self.postings[t]
            idf = bm25_idf(self.n_docs, len(plist))
            for doc_id in sorted(plist):
                if not self._matches_where(doc_id, where):
                    continue
                tf, _ = plist[doc_id]
                partial = bm25_partial(
                    np.array([tf]), np.array([self.doc_len[doc_id]]),
                    self.avgdl, k1, b,
                )[0]
                acc[doc_id] = acc.get(doc_id, 0.0) + idf * float(partial)
        if search_type == "and" and terms:
            docs = set(self.postings[terms[0]])
            for t in terms[1:]:
                docs &= set(self.postings[t])
            acc = {d: s for d, s in acc.items() if d in docs}
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, s, self.url_of[d]) for d, s in ranked]

    def synonym_search(self, groups: list[list[str]], k: int = 10,
                       where: dict | None = None
                       ) -> list[tuple[int, float, str]]:
        """SynonymQuery twin: per group, per-doc tf = sum of member tfs
        scored through the BM25 partial once; idf from the exact union
        df. Scalar dict/loop evaluation, independent of the engine's
        merged-numpy path; groups accumulate in caller order (the same
        float-add order as the engine's per-group scatter-adds)."""
        acc: dict[int, float] = {}
        for g in groups:
            members = sorted({self._tok.fold(t) if self._tok.folding
                              else t for t in g})
            union: dict[int, int] = {}
            for t in members:
                for d, (tf, _) in self.postings.get(t, {}).items():
                    union[d] = union.get(d, 0) + tf
            if not union:
                continue
            idf = bm25_idf(self.n_docs, len(union))
            for d in sorted(union):
                if not self._matches_where(d, where):
                    continue
                partial = bm25_partial(
                    np.array([union[d]]), np.array([self.doc_len[d]]),
                    self.avgdl, BM25_K1, BM25_B)[0]
                acc[d] = acc.get(d, 0.0) + idf * float(partial)
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, s, self.url_of[d]) for d, s in ranked]

    def bool_search(self, query: str, k: int = 10,
                    where: dict | None = None
                    ) -> list[tuple[int, float, str]]:
        """Boolean-query twin (boolquery grammar): INDEPENDENT Python-set
        evaluation (the engine uses sorted-ordinal numpy kernels — only
        the parse is shared), scoring the positive clauses per matching
        doc in lexicographic term order; pure-negation matches score 0."""
        from search_engine_ray.boolquery import parse, positive_terms

        ast = parse(query)

        def ev(a) -> set[int]:
            kind = a[0]
            if kind == "term":
                return set(self.postings.get(a[1], {}))
            if kind == "not":
                return set(self.url_of) - ev(a[1])
            parts = [ev(c) for c in a[1]]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if kind == "and" else (out | p)
            return out

        docs = {d for d in ev(ast) if self._matches_where(d, where)}
        acc = {d: 0.0 for d in docs}
        for t in sorted(positive_terms(ast)):
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = bm25_idf(self.n_docs, len(plist))
            for d in sorted(plist):
                if d in acc:
                    tf, _ = plist[d]
                    partial = bm25_partial(
                        np.array([tf]), np.array([self.doc_len[d]]),
                        self.avgdl, BM25_K1, BM25_B)[0]
                    acc[d] += idf * float(partial)
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, s, self.url_of[d]) for d, s in ranked]

    def phrase_search(self, terms: list[str], k: int = 10,
                      where: dict | None = None
                      ) -> list[tuple[int, float, str]]:
        """Ordered same-line proximity: docs where all terms occur on one
        line with strictly increasing columns, ranked by BM25 over the
        terms (the positions-aware analogue of the reference's per-row
        match lists, SimpleSearchManager.java:187-214)."""
        base = self.search(terms, "and", k=self.n_docs or 1,
                           where=where)
        out = []
        for d, s, u in base:
            rows_per_term = [self.matched_rows(d, t) for t in terms]
            common_rows = set(rows_per_term[0])
            for r in rows_per_term[1:]:
                common_rows &= set(r)
            if any(ordered_in_row([rpt[row] for rpt in rows_per_term])
                   for row in common_rows):
                out.append((d, s, u))
        return out[:k]

    def near_search(self, terms: list[str], window: int = 8, k: int = 10,
                    where: dict | None = None
                    ) -> list[tuple[int, float, str]]:
        """Unordered same-line proximity (NEAR/window): docs where every
        DISTINCT query term occurs on one line within a ``window``-column
        span (columns = stored char offsets), ranked by conjunctive BM25 (the Lucene sloppy-PhraseQuery
        analogue, minus per-position scoring)."""
        uniq = sorted(set(terms))
        base = self.search(uniq, "and", k=self.n_docs or 1, where=where)
        out = []
        for d, s, u in base:
            rows_per_term = [self.matched_rows(d, t) for t in uniq]
            common_rows = set(rows_per_term[0])
            for r in rows_per_term[1:]:
                common_rows &= set(r)
            if any(within_window_in_row(
                    [rpt[row] for rpt in rows_per_term], window)
                   for row in common_rows):
                out.append((d, s, u))
        return out[:k]

    def matched_rows(self, doc_id: int, term: str) -> dict[int, list[int]]:
        """row -> [cols] for a term in a doc (the reference's per-doc rescan,
        ref: SimpleSearchManager.java:187-214), from stored positions."""
        entry = self.postings.get(term, {}).get(doc_id)
        if not entry:
            return {}
        out: dict[int, list[int]] = {}
        for p in entry[1]:
            out.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
        return out
