"""One-string query syntax (querystring.py): every modality must equal
its direct API call bit-for-bit, and malformed syntax must raise."""

import pytest

from search_engine_ray.querystring import parse_query, search_text


# ---------------------------------------------------------------------------
# parser unit surface (no index needed)

def test_parse_kinds():
    assert parse_query("mama").kind == "exact"
    assert parse_query("mama mila").kind == "or"
    p = parse_query('"mama mila doma"')
    assert (p.kind, p.queries) == ("phrase", ["mama mila doma"])
    p = parse_query('"doma mila"~5')
    assert (p.kind, p.window) == ("near", 5)
    assert parse_query("mil*").kind == "prefix"
    assert parse_query("m?la").kind == "wildcard"
    assert parse_query("*ila").kind == "wildcard"
    assert parse_query("m*l*a").kind == "wildcard"
    assert parse_query("/m[ai]la/").kind == "regex"
    assert parse_query("milo~").kind == "fuzzy"
    assert parse_query("milo~1 rama").kind == "fuzzy"
    assert parse_query("milo~2").kind == "fuzzy2"
    assert parse_query("mama AND NOT mila").kind == "bool"
    assert parse_query("(mama OR mila)").kind == "bool"
    p = parse_query("car|auto fast")
    assert (p.kind, p.queries) == ("synonym", [["car", "auto"], ["fast"]])


def test_parse_filters():
    p = parse_query("lang:en mama")
    assert p.where == {"lang": "en"} and p.queries == ["mama"]
    p = parse_query("doc_len:50..400 mama")
    assert p.where == {"doc_len": (50, 400)}
    assert parse_query("doc_len:..400 m").where == {"doc_len": (None, 400)}
    assert parse_query("doc_len:50.. m").where == {"doc_len": (50, None)}
    # caller where merges; a collision raises
    assert parse_query("mama", where={"lang": "en"}).where == {"lang": "en"}
    with pytest.raises(ValueError, match="duplicate filter"):
        parse_query("lang:fr mama", where={"lang": "en"})
    with pytest.raises(ValueError, match="duplicate filter"):
        parse_query("lang:fr lang:en mama")
    # a filter inside quotes is phrase content, not a filter
    p = parse_query('"lang:en mama"')
    assert p.kind == "phrase" and p.where is None


def test_parse_rejects():
    for bad in ("", "   ", 'mama "mila"', '"a" "b"', 'mil* "mama"',
                "m?la extra", "/a/ /b/", "milo~ AND mama",
                'un"balanced', "lang:en", '""'):
        with pytest.raises(ValueError):
            parse_query(bad)


# ---------------------------------------------------------------------------
# dispatch parity against the direct API over the shared fixture index

@pytest.fixture(scope="module")
def ls(built_index):
    from search_engine_ray.search import LocalSearcher

    return LocalSearcher(built_index)


def test_text_equals_direct(ls):
    cases = [
        ("mama", lambda: ls.search(["mama"], "exact", k=10)),
        ("mama mila", lambda: ls.search(["mama", "mila"], "or", k=10)),
        ("mil*", lambda: ls.search(["mil"], "prefix", k=10)),
        ("m?la", lambda: ls.search(["m?la"], "wildcard", k=10)),
        ("/m[ai]la/", lambda: ls.search(["m[ai]la"], "regex", k=10)),
        ("milo~", lambda: ls.search(["milo"], "fuzzy", k=10)),
        ("mlo~2", lambda: ls.search(["mlo"], "fuzzy2", k=10)),
        ('"mama mila doma"',
         lambda: ls.phrase_search(["mama", "mila", "doma"], k=10)),
        ('"doma mila"~10',
         lambda: ls.near_search(["doma", "mila"], window=10, k=10)),
        ("mama AND NOT mila",
         lambda: ls.bool_search("mama AND NOT mila", k=10)),
        ("mila|doma",
         lambda: ls.synonym_search([["mila", "doma"]], k=10)),
        ("lang:en mama",
         lambda: ls.search(["mama"], "exact", k=10,
                           where={"lang": "en"})),
    ]
    for text, direct in cases:
        got = search_text(ls, text, k=10)
        want = direct()
        assert got.equals(want), (text, got.to_pydict(),
                                  want.to_pydict())


def test_text_analyzes_bare_terms(ls):
    # punctuation splits like the corpus did: "mama,mila" == OR query
    got = search_text(ls, "mama,mila", k=10)
    want = ls.search(["mama", "mila"], "or", k=10)
    assert got.equals(want)


def test_text_range_filter(ls):
    got = search_text(ls, "doc_len:1..100 mama", k=10)
    want = ls.search(["mama"], "exact", k=10,
                     where={"doc_len": (1, 100)})
    assert got.equals(want)


def test_text_search_after_pages(ls):
    p1 = search_text(ls, "mama mila", k=3)
    if p1.num_rows == 3:
        cursor = (p1.column("score")[-1].as_py(),
                  p1.column("doc_id")[-1].as_py())
        p2 = search_text(ls, "mama mila", k=3, search_after=cursor)
        want = ls.search(["mama", "mila"], "or", k=3,
                         search_after=cursor)
        assert p2.equals(want)


def test_sharded_dispatch(tmp_path_factory, small_pages, ray_session):
    import pyarrow.parquet as pq

    from search_engine_ray.sharded import ShardedSearcher, build_sharded

    root = tmp_path_factory.mktemp("qs_sharded")
    pages = root / "pages"
    pages.mkdir()
    pq.write_table(small_pages, str(pages / "p.parquet"))
    idx = str(root / "idx")
    from search_engine_ray.build import BuildConfig

    build_sharded(str(pages), idx, num_doc_shards=2,
                  config=BuildConfig(num_buckets=8))
    sh = ShardedSearcher(idx)
    got = search_text(sh, '"mama mila doma"', k=5)
    want = sh.phrase_search(["mama", "mila", "doma"], k=5)
    assert got.equals(want)
