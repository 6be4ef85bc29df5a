"""End-to-end build + query tests: rank identity vs the oracle (FIXTURES.md §4).

The oracle (pure-Python dict index) and the engine (Ray Data shuffle-built
compressed postings) must agree on BM25 scores AND doc ids for every query
type and both scorers — the distributed path may not change a single bit.
"""

import os

import numpy as np
import pytest

from search_engine_ray.idhash import doc_id_for_url
from search_engine_ray.search import LocalSearcher


@pytest.fixture(scope="module")
def searcher(built_index):
    return LocalSearcher(built_index)


def _query_set(oracle):
    """FIXTURES.md §4: heads, mids, sentinels, prefixes, ORs, no-hits."""
    by_df = sorted(oracle.postings.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    heads = [t for t, _ in by_df[:5]]
    mids = [t for t, _ in by_df[len(by_df) // 3: len(by_df) // 3 + 10]]
    sentinels = [t for t, p in by_df if len(p) == 1][:5]
    queries = [([t], "exact") for t in heads + mids + sentinels]
    queries += [
        (heads[:2], "or"),
        ([mids[0], sentinels[0]], "or"),
        (heads[:1] + mids[:3], "or"),
        (["nope1", "nope2"], "or"),
    ]
    queries += [([p], "prefix") for p in
                ["ma", "mil", "bako", "sent", "sentinel00", "zz"]]
    queries += [([i], "contains") for i in
                ["il", "a", "ako", "entinel", "qqq_absent"]]
    queries += [([p], "wildcard") for p in
                ["m?la", "mil*", "*ako", "sent*el0?", "b?k*", "*a*",
                 "m*a", "??la", "qqq*absent", "mila"]]
    queries += [([p], "regex") for p in
                ["mil.*", "m[i1]la", ".*ako", "sentinel0[0-4]",
                 "(mila|bako)", "m.la", "ba.?o", "qqq.*absent", "mila",
                 "[a-m]+", "mi+la?"]]
    queries += [([w], "fuzzy") for w in
                ["mila", "milo", "mil", "sentinel00", "bako", "qqq_absent"]]
    queries += [(heads[:1] + ["milo", "bako"], "fuzzy")]  # multi-word union
    queries += [([w], "fuzzy2") for w in
                ["mla", "sentinel0", "bko", "qqq_absent"]]  # 2-edit budget
    queries += [(["zzz_none"], "exact"), (["totally absent"], "exact")]
    return queries


@pytest.mark.parametrize("scorer", ["taat", "bmw"])
@pytest.mark.parametrize("k", [10, 100])
def test_rank_identity_full_query_set(searcher, small_oracle, scorer, k):
    for queries, st in _query_set(small_oracle):
        eng = searcher.search(queries, st, k=k, scorer=scorer)
        got = list(zip(eng.column("doc_id").to_pylist(),
                       eng.column("score").to_pylist()))
        want = [(d, s) for d, s, _ in small_oracle.search(queries, st, k=k)]
        assert got == want, (st, queries, scorer, k)


def test_expand_matches_oracle(searcher, small_oracle):
    for queries, st in _query_set(small_oracle):
        assert searcher.expand(queries, st) == small_oracle.expand(queries, st)


def test_vocabulary_size_matches(searcher, small_oracle):
    assert searcher.vocabulary_size() == len(small_oracle.postings)


def test_global_stats_match(searcher, small_oracle):
    assert searcher.n_docs == small_oracle.n_docs
    assert searcher.avgdl == pytest.approx(small_oracle.avgdl, abs=0)


def test_urls_resolved(searcher, small_oracle):
    eng = searcher.search(["mila"], "exact", k=10)
    for d, u in zip(eng.column("doc_id").to_pylist(),
                    eng.column("url").to_pylist()):
        assert small_oracle.url_of[d] == u
        assert doc_id_for_url(u) == d


def test_property_random_words_hit_their_doc(searcher, small_oracle):
    """Mirror of the reference's randomized app test
    (app/src/test/java/org/search/app/SearchEngineAppTest.java:55-100):
    100 seeded random words sampled from a random doc — its url must appear
    in the exact-match results for every word."""
    rng = np.random.default_rng(7)
    doc_ids = sorted(small_oracle.url_of)
    doc_id = doc_ids[int(rng.integers(0, len(doc_ids)))]
    url = small_oracle.url_of[doc_id]
    doc_terms = sorted(
        t for t, p in small_oracle.postings.items() if doc_id in p
    )
    words = [doc_terms[int(rng.integers(0, len(doc_terms)))] for _ in range(100)]
    for w in words:
        res = searcher.search([w], "exact", k=searcher.n_docs)
        assert doc_id in res.column("doc_id").to_pylist(), (w, url)


def test_matched_rows_parity(searcher, small_oracle):
    """Positions stored at build time reproduce the reference's per-doc
    rescan output (SimpleSearchManager.java:187-214)."""
    d2 = doc_id_for_url("https://example.org/parity/00000002")
    assert searcher.matched_rows(d2, "mama") == \
        small_oracle.matched_rows(d2, "mama") == {1: [0, 18]}
    # multi-line doc: any sentinel term
    sent = next(t for t in small_oracle.postings if t.startswith("sentinel"))
    d = next(iter(small_oracle.postings[sent]))
    assert searcher.matched_rows(d, sent) == small_oracle.matched_rows(d, sent)
    assert searcher.matched_rows(d2, "zzz_none") == {}


def test_df_matches_oracle(searcher, small_oracle):
    for term in list(small_oracle.postings)[:50]:
        rec = searcher._posting_for(term)
        assert rec is not None and rec["df"] == len(small_oracle.postings[term])


def test_salted_build_bit_identical(ray_session, tmp_path):
    """salt=4 two-phase shuffle produces byte-identical bucket artifacts."""
    import pyarrow.parquet as pq

    from search_engine_ray.build import BuildConfig, build_index
    from search_engine_ray.corpus import generate_pages

    pages = generate_pages(120, seed=11)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    build_index(str(pdir), str(tmp_path / "i1"), BuildConfig(num_buckets=4))
    build_index(str(pdir), str(tmp_path / "i2"),
                BuildConfig(num_buckets=4, salt=4))
    for b in range(4):
        t1 = pq.read_table(str(tmp_path / f"i1/buckets/bucket={b}/postings.parquet"))
        t2 = pq.read_table(str(tmp_path / f"i2/buckets/bucket={b}/postings.parquet"))
        # salt participates in the config hash but not the artifact content
        assert t1.equals(t2), f"bucket {b}"


def test_whitespace_tokenizer_build(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from search_engine_ray.build import BuildConfig, build_index
    from search_engine_ray.corpus import generate_pages
    from search_engine_ray.oracle import OracleIndex

    pages = generate_pages(40, seed=5)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    root = str(tmp_path / "idx")
    build_index(str(pdir), root,
                BuildConfig(tokenizer="whitespace", num_buckets=4))
    s = LocalSearcher(root)
    o = OracleIndex.build(pages, tokenizer="whitespace")
    assert s.vocabulary_size() == len(o.postings)
    # "string." (with dot) is a whitespace token in the parity row
    eng = s.search(["string."], "exact", k=10)
    want = [(d, sc) for d, sc, _ in o.search(["string."], "exact", k=10)]
    got = list(zip(eng.column("doc_id").to_pylist(),
                   eng.column("score").to_pylist()))
    assert got == want and len(got) == 1


def test_dedup_modes_equivalent(ray_session, tmp_path):
    """broadcast (light pass + filter) and shuffle dedup produce identical
    indexes on a dup-heavy corpus."""
    import pyarrow.parquet as pq

    from search_engine_ray.build import BuildConfig, build_index
    from search_engine_ray.corpus import generate_pages

    pages = generate_pages(150, seed=17)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    build_index(str(pdir), str(tmp_path / "ib"),
                BuildConfig(num_buckets=4, dedup_mode="broadcast"))
    build_index(str(pdir), str(tmp_path / "is"),
                BuildConfig(num_buckets=4, dedup_mode="shuffle"))
    for b in range(4):
        t1 = pq.read_table(str(tmp_path / f"ib/buckets/bucket={b}/postings.parquet"))
        t2 = pq.read_table(str(tmp_path / f"is/buckets/bucket={b}/postings.parquet"))
        assert t1.equals(t2), f"bucket {b}"
    import json
    a = json.load(open(tmp_path / "ib/global_stats.json"))
    b_ = json.load(open(tmp_path / "is/global_stats.json"))
    assert (a["n_docs"], a["total_tokens"]) == (b_["n_docs"], b_["total_tokens"])


def test_dup_winner_paths_equivalent(ray_session, tmp_path):
    """compute_dup_winners' three size tiers — driver pandas pass,
    parallel per-file hash + vectorized numpy merge, bucketed Ray
    aggregate — return identical (winners, has_ties) on a corpus with
    duplicates, max-ts winners and exact-tie groups."""
    import pyarrow.parquet as pq

    from search_engine_ray.corpus import generate_pages
    from search_engine_ray.stages.clean import compute_dup_winners

    pdir = tmp_path / "pages"
    pdir.mkdir()
    for i in range(3):  # multi-file so dup groups span files
        pq.write_table(generate_pages(120, seed=23 + i, split=f"dw{i}"),
                       str(pdir / f"p{i}.parquet"))
    # same url re-emitted across splits? generate_pages dups are within a
    # split; also append an extra file duplicating file 0's rows with
    # shifted timestamps to force cross-file duplicates
    t0 = pq.read_table(str(pdir / "p0.parquet"))
    import pyarrow.compute as pc_

    import pyarrow as pa_

    ts_shift = pc_.add(pc_.cast(t0.column("warc_ts"), pa_.int64()),
                       1_000_000).cast(pa_.timestamp("us"))
    shifted = t0.set_column(
        t0.schema.get_field_index("warc_ts"), "warc_ts", ts_shift)
    pq.write_table(shifted, str(pdir / "p3.parquet"))
    files = sorted(str(p) for p in pdir.glob("*.parquet"))
    driver = compute_dup_winners(files, driver_rows=10**9)
    par = compute_dup_winners(files, driver_rows=0, parallel_rows=10**9)
    shuffle = compute_dup_winners(files, driver_rows=0, parallel_rows=0)
    assert len(driver[0]) > 0            # the corpus really has dups
    assert driver == par == shuffle


@pytest.mark.parametrize("queries", [
    ["mila", "mama"], ["mila", "ruka"], ["bako", "zzz_missing"],
    ["mila"], [],
])
def test_and_matches_oracle(searcher, small_oracle, queries):
    eng = searcher.search(queries, "and", k=50)
    got = list(zip(eng.column("doc_id").to_pylist(),
                   eng.column("score").to_pylist()))
    want = [(d, s) for d, s, _ in small_oracle.search(queries, "and", k=50)]
    assert got == want
    # conjunctive result is a subset of each term's exact result
    for t in queries:
        exact_ids = set(searcher.search([t], "exact", k=500)
                        .column("doc_id").to_pylist())
        assert set(eng.column("doc_id").to_pylist()) <= exact_ids or not exact_ids


def test_phrase_search_matches_oracle(searcher, small_oracle):
    cases = [["mama", "mila"], ["mila", "doma"], ["doma", "mila"],
             ["mama", "here"], ["ruka", "ram"]]
    for terms in cases:
        eng = searcher.phrase_search(terms, k=50)
        want = [d for d, _, _ in small_oracle.phrase_search(terms, k=50)]
        assert eng.column("doc_id").to_pylist() == want, terms
    # "mama mila doma hi mama i am here": 'mila doma' in order, not 'doma mila'
    hits = searcher.phrase_search(["mila", "doma"], k=10)
    assert "https://example.org/parity/00000002" in hits.column("url").to_pylist()
    assert searcher.phrase_search(["doma", "mila"], k=10).num_rows == 0


def test_docmap_result_only_resolution(built_index, ray_session):
    """The query path resolves urls via the row-group docmap artifact —
    footer stats + per-hit row-group reads — NEVER a full (doc_id -> url)
    registry load (the r1/r2 full-dict docmap is gone)."""
    import os

    from search_engine_ray.search import LocalSearcher
    from search_engine_ray.state.docmap import DOCMAP_DIR

    assert os.path.isdir(os.path.join(built_index, DOCMAP_DIR))
    s = LocalSearcher(built_index)
    res = s.search(["mila"], "exact", k=5)
    assert all(u for u in res.column("url").to_pylist())
    dm = s._docmap
    assert dm._fallback is None          # the artifact path was taken
    assert len(dm._cache) >= 1           # only hit row groups were decoded
    assert not hasattr(s, "_url_of")     # the full-dict registry is gone


def test_docmap_fallback_matches_artifact(built_index, ray_session,
                                          tmp_path):
    """A pre-docmap index (artifact dir removed) resolves identically via
    the sorted compact docs_clean fallback."""
    import shutil

    from search_engine_ray.search import LocalSearcher
    from search_engine_ray.state.docmap import DOCMAP_DIR

    legacy = str(tmp_path / "legacy_idx")
    shutil.copytree(built_index, legacy)
    shutil.rmtree(os.path.join(legacy, DOCMAP_DIR))
    a = LocalSearcher(built_index)
    b = LocalSearcher(legacy)
    for q, st in [(["mila"], "exact"), (["mam"], "prefix"),
                  (["bako", "kota"], "or")]:
        assert a.search(q, st, k=20).equals(b.search(q, st, k=20)), (q, st)
    assert b._docmap._fallback is not None


def test_wildcard_trigram_equals_linear_scan(searcher):
    """The trigram-candidate wildcard path (literal runs >=3 chars) and
    the linear-regex fallback (no such run) both equal a plain fnmatch
    scan over the full vocabulary — the candidate filter is lossless."""
    import fnmatch

    vocab = sorted(set(searcher.vocab_terms()))
    patterns = [
        "mil*", "*ila", "m?la", "sent*", "sentinel0?", "*ako*",
        "*", "?", "????", "m*", "*a*o*", "q?q*", "zzz*none",
        "mila", "m?l?", "*el00",
    ]
    for pat in patterns:
        want = sorted(t for t in vocab if fnmatch.fnmatchcase(t, pat))
        assert searcher.expand([pat], "wildcard") == want, pat


def test_regex_trigram_equals_linear_scan(searcher):
    """The trigram-candidate regex path (mandatory literal runs >=3
    chars from the parse tree) and the linear fullmatch fallback both
    equal a plain re.fullmatch scan over the full vocabulary — the
    literal-run extraction is lossless across concatenation, groups,
    alternation, classes, repeats and anchors."""
    import re

    vocab = sorted(set(searcher.vocab_terms()))
    patterns = [
        "mil.*", "mil[a-z]*", ".*ila", "m.la", "sent.*", "sentinel0.",
        ".*", ".", "....", "m.*", "(mila|bako|kota)", "mi+la",
        "mil(a|o)", "(mil)a", "m(il)+a", "sentinel0[0-4]", "zzz.*none",
        "mila", "^mila$", r"m\w+a", "(?i)MILA", "[a-m]{4}", "q.q.*",
        "ba(?:ko|ba)", "s.*el0{2}", "mi{1,2}la",
    ]
    for pat in patterns:
        rx = re.compile(pat)
        want = sorted(t for t in vocab if rx.fullmatch(t))
        assert searcher.expand([pat], "regex") == want, pat


def test_synonym_search_matches_oracle(searcher, small_oracle):
    """SynonymQuery semantics: summed tf through the BM25 partial ONCE,
    idf from the exact union df — engine (merged-numpy pseudo-postings)
    == oracle (scalar dict loops) for multi-group, absent-member,
    duplicate-member and filtered cases."""
    cases = [
        [["mila", "milo"]],
        [["mila", "bako"], ["mama"]],
        [["kota"]],
        [["zzz_none", "qqq_none"]],
        [["mila", "mila", "bako"]],
        [["bako", "kota"], ["zzz_none"], ["mila", "mama"]],
    ]
    for gs in cases:
        for where in (None, {"lang": "en"}):
            eng = searcher.synonym_search(gs, k=15, where=where)
            got = list(zip(eng.column("doc_id").to_pylist(),
                           eng.column("score").to_pylist()))
            want = [(d, s) for d, s, _ in
                    small_oracle.synonym_search(gs, k=15, where=where)]
            assert got == want, (gs, where)
    # a single-member group degenerates to plain exact search (union
    # df == the term's df, summed tf == the term's tf)
    assert searcher.synonym_search([["mila"]], k=10).equals(
        searcher.search(["mila"], "exact", k=10))
    # groups are NOT an OR: the concave partial + the union-df idf mean
    # no doc can score above its separate per-term OR sum, and a doc
    # containing several variants scores STRICTLY below it (equality is
    # possible for single-variant docs when one member's posting set
    # contains the other's, making the union df collapse to its df)
    both = searcher.synonym_search([["mila", "mama"]], k=50)
    sep = searcher.search(["mila", "mama"], "or", k=50)
    syn = dict(zip(both.column("doc_id").to_pylist(),
                   both.column("score").to_pylist()))
    ors = dict(zip(sep.column("doc_id").to_pylist(),
                   sep.column("score").to_pylist()))
    assert set(syn) == set(ors)
    assert all(syn[d] <= ors[d] for d in syn)
    assert any(syn[d] < ors[d] for d in syn)
    # cursor pagination rides the same contract as search()
    full = searcher.synonym_search([["mila", "bako"]], k=20)
    p1 = searcher.synonym_search([["mila", "bako"]], k=3)
    if p1.num_rows == 3:
        last = (p1.column("score")[-1].as_py(),
                p1.column("doc_id")[-1].as_py())
        p2 = searcher.synonym_search([["mila", "bako"]], k=3,
                                     search_after=last)
        assert (p1.column("doc_id").to_pylist()
                + p2.column("doc_id").to_pylist()
                == full.column("doc_id").to_pylist()[:6])


def test_near_search_matches_oracle(searcher, small_oracle):
    """NEAR/window proximity: engine (candidate walk over decoded
    positions) == oracle (matched_rows + the shared minimal-cover
    predicate) for several windows, including order-independence and a
    window too small to cover."""
    cases = [(["mama", "mila"], 1), (["mila", "mama"], 1),
             (["mila", "doma"], 1), (["doma", "mila"], 1),
             (["mama", "here"], 3), (["mama", "here"], 50),
             (["mama", "mila", "doma"], 2), (["ruka", "ram"], 4),
             (["zzz_missing", "mila"], 8)]
    for terms, w in cases:
        eng = searcher.near_search(terms, window=w, k=50)
        want = [d for d, _, _ in small_oracle.near_search(terms, window=w,
                                                          k=50)]
        assert eng.column("doc_id").to_pylist() == want, (terms, w)
    # parity doc "mama mila doma hi mama i am here": positions store CHAR
    # columns (mila@5, doma@10 -> span 5); unordered NEAR hits in BOTH
    # orders (phrase only in one), and a window below the span misses
    for terms in (["mila", "doma"], ["doma", "mila"]):
        hits = searcher.near_search(terms, window=5, k=10)
        assert "https://example.org/parity/00000002" in \
            hits.column("url").to_pylist(), terms
        assert searcher.near_search(terms, window=4, k=10).num_rows == 0
    # window 0 demands the same column — never true for distinct terms
    assert searcher.near_search(["mama", "mila"], window=0,
                                k=10).num_rows == 0


def test_more_like_this_matches_oracle(searcher, small_oracle):
    """MLT == an independently computed reference: top tf*idf doc terms
    (tie term-asc) -> oracle OR search minus the source doc."""
    from search_engine_ray.codec import bm25_idf

    for doc_id in list(small_oracle.url_of)[:8]:
        tfs = {t: e[doc_id][0]
               for t, e in small_oracle.postings.items() if doc_id in e}
        sel = [t for _, t in sorted(
            (-(tf * bm25_idf(small_oracle.n_docs,
                             len(small_oracle.postings[t]))), t)
            for t, tf in tfs.items())[:10]]
        want = [d for d, _, _ in small_oracle.search(sel, "or", k=11)
                if d != doc_id][:10]
        got = searcher.more_like_this(doc_id, k=10, max_terms=10)
        assert got.column("doc_id").to_pylist() == want, doc_id
        assert doc_id not in got.column("doc_id").to_pylist()
    # unknown doc -> empty
    assert searcher.more_like_this(999_999_999, k=5).num_rows == 0
