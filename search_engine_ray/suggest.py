"""Query-side suggestion expansion (reference WITH_SUGGESTIONS semantics).

The reference expands a query via Hunspell suggestions filtered to the SAME
LENGTH as the query word, then ORs the expanded list
(ref: app/src/main/java/org/search/app/HunspellCheck.java:15-27,
app/.../listener/SearchActionListener.java:44-48,
search/SimpleSearchManager.java:61-62).

No Hunspell in this container, so candidates come from the index's own
vocabulary: edit-distance-1 variants of the query word that (a) exist as
index terms and (b) have the query's exact length — i.e. substitutions
only, mirroring the same-length filter. The vocabulary is loaded ONCE per
``SuggestionExpander`` (the reference loads the dictionary once per app
process — the 'stateful dictionary actor' pattern, SURVEY.md ST3); wrap in
an actor for serving.
"""

from __future__ import annotations

from search_engine_ray.search import LocalSearcher


class SuggestionExpander:
    def __init__(self, searcher: LocalSearcher):
        self._s = searcher
        # length-keyed vocabulary: same-length lookup is the hot filter
        self._by_len: dict[int, set[str]] = {}
        for b in range(searcher.num_buckets):
            for t in searcher.bucket(b).terms:
                self._by_len.setdefault(len(t), set()).add(t)

    def suggest(self, word: str, max_suggestions: int = 8) -> list[str]:
        """Same-length, edit-distance-1 (substitution) vocabulary terms."""
        vocab = self._by_len.get(len(word), set())
        out = []
        if word in vocab:
            out.append(word)
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
