"""Query-side suggestion expansion (reference WITH_SUGGESTIONS semantics).

The reference expands a query via Hunspell suggestions filtered to the SAME
LENGTH as the query word, then ORs the expanded list
(ref: app/src/main/java/org/search/app/HunspellCheck.java:15-27,
app/.../listener/SearchActionListener.java:44-48,
search/SimpleSearchManager.java:61-62).

No Hunspell in this container, so the DEFAULT candidate source is the
index's own vocabulary: edit-distance-1 variants of the query word that
(a) exist as index terms and (b) have the query's exact length — i.e.
substitutions only, mirroring the same-length filter. An external
dictionary (a Hunspell wrapper, a word list, any ``word ->
[candidates]`` callable) plugs in via the ``dictionary`` parameter —
its candidates are filtered to same-length terms PRESENT IN THE INDEX,
exactly the reference's filter chain. The vocabulary is loaded ONCE per
``SuggestionExpander`` (the reference loads the dictionary once per app
process — the 'stateful dictionary actor' pattern, SURVEY.md ST3); wrap in
an actor for serving.
"""

from __future__ import annotations

from typing import Callable, Iterable

from search_engine_ray.search import LocalSearcher


class SuggestionExpander:
    def __init__(self, searcher: LocalSearcher,
                 dictionary: Callable[[str], Iterable[str]] | Iterable[str]
                 | None = None):
        self._s = searcher
        # length-keyed vocabulary: same-length lookup is the hot filter.
        # vocab_terms() is the duck-typed source: LocalSearcher iterates
        # its buckets, ShardedSearcher its merged term-stats sidecar.
        self._by_len: dict[int, set[str]] = {}
        for t in searcher.vocab_terms():
            self._by_len.setdefault(len(t), set()).add(t)
        if dictionary is None or callable(dictionary):
            self._dict = dictionary
        else:  # a plain word list behaves like Hunspell's suggest():
            words = sorted(set(dictionary))

            def _list_dict(word: str, _w=words) -> list[str]:
                return [c for c in _w
                        if len(c) == len(word)
                        and sum(1 for a, b in zip(word, c) if a != b) <= 1]

            self._dict = _list_dict

    def suggest(self, word: str, max_suggestions: int = 8) -> list[str]:
        """Suggestion candidates: external dictionary if plugged in, else
        vocabulary edit-1; always filtered to same-length terms that exist
        in the index (ref: HunspellCheck.java:15-27 same-length filter +
        SimpleSearchManager's index probe)."""
        vocab = self._by_len.get(len(word), set())
        out = []
        if word in vocab:
            out.append(word)
        if self._dict is not None:
            for cand in self._dict(word):
                if (cand != word and len(cand) == len(word)
                        and cand in vocab and cand not in out):
                    out.append(cand)
                    if len(out) >= max_suggestions:
                        break
            return out
        for cand in sorted(vocab):
            if cand == word:
                continue
            diff = sum(1 for a, b in zip(word, cand) if a != b)
            if diff == 1:
                out.append(cand)
                if len(out) >= max_suggestions:
                    break
        return out

    def search_with_suggestions(self, word: str, k: int = 10,
                                scorer: str = "taat"):
        """The reference's WITH_SUGGESTIONS flow: expand then OR-union."""
        expanded = self.suggest(word) or [word]
        return self._s.search(expanded, "or", k=k, scorer=scorer)
