"""fuzzy.py kernel tests: the vectorized Edit1Vocab matcher must agree
with an independent full-DP Levenshtein on arbitrary inputs (the kernel
uses the cpl+csl shortcut, the reference uses the DP recurrence — they
share no code path)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.fuzzy import (
    Edit1Vocab,
    expand_fuzzy_scan,
    levenshtein_leq1,
)


def _lev_full(a: str, b: str) -> int:
    """Textbook full Levenshtein DP — the trusted scalar reference."""
    la, lb = len(a), len(b)
    d = np.arange(lb + 1)
    for i in range(1, la + 1):
        prev_diag = d[0]
        d[0] = i
        for j in range(1, lb + 1):
            cur = min(d[j] + 1, d[j - 1] + 1,
                      prev_diag + (a[i - 1] != b[j - 1]))
            prev_diag = d[j]
            d[j] = cur
    return int(d[lb])


WORD = st.text(alphabet="abc", min_size=0, max_size=6)


@settings(max_examples=300, deadline=None)
@given(WORD, WORD)
def test_leq1_predicate_matches_full_dp(a, b):
    assert levenshtein_leq1(a, b) == (_lev_full(a, b) <= 1)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=5),
                min_size=0, max_size=40, unique=True), WORD)
def test_vectorized_matches_scalar(vocab, q):
    ev = Edit1Vocab(vocab)
    got = sorted(ev.match(q))
    want = sorted(t for t in vocab if _lev_full(q, t) <= 1)
    assert got == want


def test_match_all_union_and_unicode():
    vocab = ["héllo", "hallo", "hello", "hell", "helloo", "shell",
             "wörld", "word", "world", "käse"]
    ev = Edit1Vocab(vocab)
    # substitution incl. non-ASCII codepoint
    assert "héllo" in ev.match("hello") and "hallo" in ev.match("hello")
    # deletion and insertion neighbours
    assert set(ev.match("hello")) >= {"hello", "hell", "helloo"}
    # shell is distance 2 from hello (insert s, delete o)
    assert "shell" not in ev.match("hello")
    assert ev.match_all(["hello", "world"]) == sorted(
        set(ev.match("hello")) | set(ev.match("world")))
    # scan fallback agrees with the kernel
    assert expand_fuzzy_scan(["hello", "world"], vocab) == \
        ev.match_all(["hello", "world"])


def test_empty_and_degenerate():
    ev = Edit1Vocab(["a", "bb", "ccc"])
    assert ev.match("") == ["a"]          # one insertion away
    assert ev.match("dddd") == []
    assert Edit1Vocab([]).match("x") == []
    assert expand_fuzzy_scan([], ["a"]) == []


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=5),
                min_size=0, max_size=40, unique=True), WORD,
       st.integers(min_value=2, max_value=3))
def test_vectorized_dp_matches_scalar(vocab, q, k):
    """max_edits >= 2 takes the running-min DP path — must equal the
    full scalar DP for any bound."""
    ev = Edit1Vocab(vocab)
    got = sorted(ev.match(q, max_edits=k))
    want = sorted(t for t in vocab if _lev_full(q, t) <= k)
    assert got == want, (q, k)


@settings(max_examples=200, deadline=None)
@given(WORD, WORD, st.integers(min_value=1, max_value=3))
def test_leq_predicate_matches_full_dp(a, b, k):
    from search_engine_ray.fuzzy import levenshtein_leq

    assert levenshtein_leq(a, b, k) == (_lev_full(a, b) <= k)
