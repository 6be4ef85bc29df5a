"""Edit-distance-1 query expansion — the ``fuzzy`` search type.

Extends the reference's suggestion flow (Hunspell same-length
substitutions, ref: app/src/main/java/org/search/app/HunspellCheck.java:15-27
+ listener/SearchActionListener.java:44-48) to FULL Levenshtein distance
<= 1 — substitution, insertion AND deletion — against the index's own
vocabulary, then BM25-ranks the union exactly like an ``or`` query.
SQL-oracle-checkable: DuckDB's ``levenshtein(term, word) <= 1`` over the
corpus vocabulary feeds the same BM25 CTE as ``bm25_topk``.

Matching kernel (no per-term DP): a vocabulary term ``t`` is within
edit distance 1 of query ``q`` iff, with ``cpl``/``csl`` the common
prefix/suffix lengths,

* ``|t| == |q|``       and ``cpl + csl >= |q| - 1``  (identity or one
  substitution — equal lengths admit no cheaper ins+del path), or
* ``||t| - |q|| == 1`` and ``cpl + csl >= min(|t|, |q|)``  (one
  insertion/deletion at position ``i = cpl``).

Proof sketch (deletion case, ``|t| = |q|+1``): if ``t`` minus one char
equals ``q`` at cut ``i`` then ``cpl >= i`` and ``csl >= |q| - i``;
conversely ``cpl + csl >= |q|`` lets ``i = cpl`` cut ``t`` into a
matching prefix and suffix. Equal length: lev <= 1 == Hamming <= 1, and
Hamming <= 1 == ``cpl + csl >= L - 1`` (first/last mismatch positions).

``Edit1Vocab`` vectorizes this over length-grouped UTF-32 codepoint
matrices — one ``!=`` broadcast + two argmax per (length group, query
word), no Python per term. Built lazily ONCE per posting bucket /
sidecar bucket and cached (the stateful-actor pattern, SURVEY.md ST3);
vocabulary is corpus-sublinear (Heaps' law) so the memory cost is the
same order as the term strings already held.

``levenshtein_leq1`` is the independent scalar reference (banded DP)
used by the oracle and the property tests — the kernel is verified
against it, not derived from it.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


def levenshtein_leq(a: str, b: str, k: int = 1) -> bool:
    """Scalar ground truth: full Levenshtein DP with a <=k early-out.

    Kept deliberately independent of the vectorized kernels (plain DP
    row recurrence) so tests comparing the two are meaningful.
    """
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        if min(cur) > k:
            return False
        prev = cur
    return prev[lb] <= k


def levenshtein_leq1(a: str, b: str) -> bool:
    return levenshtein_leq(a, b, 1)


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


class Edit1Vocab:
    """Length-grouped vocabulary matcher for edit-distance-<=1 lookup."""

    def __init__(self, terms: Sequence[str]):
        self._terms = list(terms)
        self._groups: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        by_len: dict[int, list[int]] = {}
        for i, t in enumerate(self._terms):
            if t:
                by_len.setdefault(len(t), []).append(i)
        for length, idx in by_len.items():
            m = np.empty((len(idx), length), dtype=np.uint32)
            for r, i in enumerate(idx):
                m[r] = _codes(self._terms[i])
            self._groups[length] = (m, np.asarray(idx, dtype=np.int64))

    @staticmethod
    def _dp_leq(m: np.ndarray, q: np.ndarray, k: int) -> np.ndarray:
        """Vectorized full Levenshtein DP of every row of ``m`` vs ``q``,
        returning ``lev <= k`` — used for ``max_edits >= 2`` where the
        cpl+csl shortcut no longer characterizes the distance.

        The column recurrence ``cur[j] = min(prev[j]+1, cur[j-1]+1,
        prev[j-1]+neq)`` has a left-to-right dependency through
        ``cur[j-1]``; substituting ``d[j] = cur[j] - j`` turns it into a
        plain running minimum (``d[j] = min(a[j]-j, d[j-1])``), so each
        DP column is one ``np.minimum.accumulate`` over the candidate
        axis-1 — no Python inner loop over candidates."""
        n, g = m.shape
        lq = len(q)
        cols = np.arange(1, lq + 1, dtype=np.int64)
        prev = np.broadcast_to(np.arange(lq + 1, dtype=np.int64),
                               (n, lq + 1)).copy()
        for i in range(1, g + 1):
            neq = (m[:, i - 1][:, None] != q[None, :]).astype(np.int64)
            a = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + neq)
            d = np.minimum.accumulate(
                np.concatenate((np.full((n, 1), i, dtype=np.int64),
                                a - cols[None, :]), axis=1), axis=1)
            prev = d + np.concatenate(([0], cols))[None, :]
        return prev[:, lq] <= k

    @staticmethod
    def _cpl(m: np.ndarray, q: np.ndarray, k: int) -> np.ndarray:
        """Common-prefix length of each row of ``m`` vs ``q``, capped at
        ``k`` — one != broadcast + argmax (int64 throughout; see
        BASELINE.md host notes on unsigned slow paths)."""
        if k == 0:
            return np.zeros(m.shape[0], dtype=np.int64)
        ne = m[:, :k] != q[:k]
        first = ne.argmax(axis=1).astype(np.int64)
        return np.where(ne.any(axis=1), first, k)

    def match(self, word: str, max_edits: int = 1) -> list[str]:
        """All vocabulary terms within Levenshtein distance ``max_edits``
        of ``word`` (including ``word`` itself when present).
        ``max_edits=1`` uses the cpl+csl shortcut; larger bounds run the
        vectorized DP over the |len| <= max_edits length groups (the
        Lucene fuzzy-query convention caps at 2)."""
        q = _codes(word)
        lq = len(q)
        qr = q[::-1]
        out: list[str] = []
        for lg in range(lq - max_edits, lq + max_edits + 1):
            grp = self._groups.get(lg)
            if grp is None:
                continue
            m, idx = grp
            if max_edits == 1:
                k = min(lg, lq)
                cpl = self._cpl(m, q, k)
                csl = self._cpl(m[:, ::-1], qr, k)
                need = (lq - 1) if lg == lq else k
                hit = (cpl + csl) >= need
            else:
                hit = self._dp_leq(m, q, max_edits)
            out.extend(self._terms[i] for i in idx[np.flatnonzero(hit)])
        return out

    def match_all(self, words: Iterable[str],
                  max_edits: int = 1) -> list[str]:
        """Sorted union of ``match`` over the query words (the fuzzy
        analogue of the reference's OR over the expanded list)."""
        out: set[str] = set()
        for w in words:
            out.update(self.match(w, max_edits))
        return sorted(out)


def expand_fuzzy_scan(words: Iterable[str], vocab: Iterable[str],
                      max_edits: int = 1) -> list[str]:
    """One-shot scan expansion (no cached matrices) — the oracle-side and
    small-vocab path: plain DP per (word, term)."""
    ws = list(words)
    return sorted({t for t in vocab
                   if any(levenshtein_leq(w, t, max_edits) for w in ws)})
