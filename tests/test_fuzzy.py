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


@settings(max_examples=120, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=6),
                min_size=0, max_size=30, unique=True),
       st.text(alphabet="abc", min_size=1, max_size=5))
def test_bucket_trigram_contains_equals_scan(vocab, infix):
    """_Bucket.contains (trigram index + verify) == the literal linear
    scan for any vocab/infix, including repeated trigrams within a term
    ('aaaa'), <3-char fallback, and absent trigrams."""
    import pyarrow as pa

    from search_engine_ray.search import _Bucket

    vocab = sorted(vocab)
    n = len(vocab)
    t = pa.table({
        "term": pa.array(vocab, pa.string()),
        "df": pa.array([1] * n, pa.int64()),
        "max_partial": pa.array([0.0] * n, pa.float64()),
        "docs_vb": pa.array([b""] * n, pa.large_binary()),
        "tfs_vb": pa.array([b""] * n, pa.large_binary()),
        "lens_vb": pa.array([b""] * n, pa.large_binary()),
        "pos_vb": pa.array([b""] * n, pa.large_binary()),
        "blockmax": pa.array([b""] * n, pa.large_binary()),
    })
    bk = _Bucket(t)
    assert bk.contains(infix) == [v for v in vocab if infix in v]
