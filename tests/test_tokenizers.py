"""Tokenizer golden tests — byte-for-byte the reference's expectations.

Cases lifted from the reference unit tests (FIXTURES.md §3):
StandardTokenizerTest.java:22-44, WhitespaceTokenizerTest.java:22-44,
DocumentIndexationTest.java:57.
"""

from search_engine_ray.analyzer.tokenizers import (
    StandardTokenizer,
    WhitespaceTokenizer,
    get_tokenizer,
    pack_position,
    register_tokenizer,
    split_lines,
    unpack_position,
)


def test_standard_golden_with_positions():
    t = StandardTokenizer()
    got = t.tokenize('I\'am " ? test, !  ,  example string. ')
    assert got == [("I", 0), ("am", 2), ("test", 9), ("example", 21), ("string", 29)]


def test_standard_empty_and_none():
    t = StandardTokenizer()
    assert t.tokenize("") == []
    assert t.tokenize(None) == []
    assert t.document_tokens(None) == []


def test_standard_non_separators():
    # underscore, '=', '&', tab, digits are NOT separators
    t = StandardTokenizer()
    assert t.tokenize("foo_bar=1&x\ty") == [("foo_bar=1&x\ty", 0)]


def test_standard_trailing_token_no_separator():
    assert StandardTokenizer().tokenize("abc") == [("abc", 0)]


def test_standard_curly_quotes_split():
    assert StandardTokenizer().tokens_only("“hello”world") == ["hello", "world"]


def test_standard_reference_fixture_seven_distinct():
    # TestFileOne.txt -> 7 distinct tokens (DocumentIndexationTest.java:57)
    toks = StandardTokenizer().tokens_only(
        "What authority surfeits on would relieve us"
    )
    assert len(set(toks)) == 7


def test_whitespace_golden():
    t = WhitespaceTokenizer()
    got = t.tokenize("I'am test    example string. ")
    assert got == [("I'am", 0), ("test", 5), ("example", 13), ("string.", 21)]


def test_case_sensitivity_preserved():
    assert StandardTokenizer().tokens_only("Mama mama MAMA") == [
        "Mama", "mama", "MAMA",
    ]


def test_document_iteration_rows_and_cols():
    t = StandardTokenizer()
    got = list(t.iter_document("mama mila\r\ndoma hi\rmama\nend"))
    assert got == [
        (1, "mama", 0), (1, "mila", 5),
        (2, "doma", 0), (2, "hi", 5),
        (3, "mama", 0),
        (4, "end", 0),
    ]


def test_split_lines_java_semantics():
    # Python splitlines would split on \x0b; Java readLine does not.
    assert split_lines("a\x0bb\nc") == ["a\x0bb", "c"]


def test_position_packing_roundtrip():
    p = pack_position(12345, 678)
    assert unpack_position(p) == (12345, 678)


def test_tokenizer_plugin_registration():
    class Colon(StandardTokenizer):
        name = "colon"
        separators = (":",)

    register_tokenizer("colon", Colon)
    assert get_tokenizer("colon").tokens_only("a:b c") == ["a", "b c"]


def test_tokenize_fast_path_equals_reference():
    """The batch-level Arrow tokenize (dictionary_encode + one stable
    sort) is VALUE-equivalent to the per-line reference loop
    (TokenizeBatch.call_reference) on adversarial inputs: \\r/\\n/\\r\\n
    mixes, empty/None/sep-only docs, unicode incl. astral plane, negative
    doc ids, both tokenizers, positions on AND off, salted."""
    import numpy as np
    import pyarrow as pa

    from search_engine_ray.stages.tokenize import TokenizeBatch

    def canon(t: pa.Table):
        df = (t.to_pandas().sort_values(["term", "doc_id"])
              .reset_index(drop=True))
        return [tuple(r) for r in df.itertuples(index=False)]

    texts = [
        "hello world\nhello again",
        "a.b,c!d?e:f;g\"h'i(j)k[l]m/n-o“p”q r<s>t{u}v+w*x^y#z~0%1$2@3",
        "\r\nleading\r\nmixed\rterminators\nhere\r\n\r\n",
        "", None, "     ", "...!!...",
        "tab\there (tab is NOT a separator)",
        "uni çödé tökens naïve café\nsecond çödé line",
        "dup dup dup\ndup dup",
        "trailing token no newline at end",
        "emoji 😀😀 line\nafter 😀 emoji",
        "=signs_and&digits123 are4 part5of6tokens",
    ]
    ids = ((np.arange(len(texts), dtype=np.int64) * 7919 + 13)
           * ((-1) ** np.arange(len(texts))))
    batch = pa.table({"doc_id": pa.array(ids),
                      "text": pa.array(texts, pa.string())})
    for pos in (True, False):
        for salt in (1, 3):
            tb = TokenizeBatch(num_buckets=32, salt=salt,
                               store_positions=pos)
            assert canon(tb(batch)) == canon(tb.call_reference(batch))
        tw = TokenizeBatch(tokenizer="whitespace", num_buckets=8,
                           store_positions=pos)
        assert canon(tw(batch)) == canon(tw.call_reference(batch))
        tf_ = TokenizeBatch(tokenizer="standard_folded", num_buckets=8,
                            store_positions=pos)
        assert canon(tf_(batch)) == canon(tf_.call_reference(batch))


def test_tokenize_fast_path_randomized():
    """Seeded random corpora (random words, separators, terminators,
    unicode sprinkles) — fast path == reference loop on every draw."""
    import numpy as np
    import pyarrow as pa

    from search_engine_ray.analyzer.tokenizers import STANDARD_SEPARATORS
    from search_engine_ray.stages.tokenize import TokenizeBatch

    def canon(t: pa.Table):
        df = (t.to_pandas().sort_values(["term", "doc_id"])
              .reset_index(drop=True))
        return [tuple(r) for r in df.itertuples(index=False)]

    alphabet = list("abcXYZ01_&=çø😀") + list(STANDARD_SEPARATORS) + \
        ["\n", "\r", "\r\n", "\t"]
    for seed in range(5):
        rng = np.random.default_rng(seed)
        texts = []
        for _ in range(30):
            n = int(rng.integers(0, 120))
            texts.append("".join(rng.choice(alphabet, size=n)))
        ids = rng.integers(-2**62, 2**62, size=30, dtype=np.int64)
        batch = pa.table({"doc_id": pa.array(ids),
                          "text": pa.array(texts, pa.string())})
        tb = TokenizeBatch(num_buckets=16, salt=2, store_positions=True)
        assert canon(tb(batch)) == canon(tb.call_reference(batch)), seed


def test_folded_tokenizer_semantics():
    """standard_folded case-folds and strips accents on CONTENT while
    positions keep indexing the original line; colliding variants merge."""
    from search_engine_ray.analyzer.tokenizers import (
        fold_text,
        get_tokenizer,
    )

    assert fold_text("Café") == "cafe"
    assert fold_text("MÜNSTER") == "munster"
    assert fold_text("naïve") == "naive"
    assert fold_text("ß") == "ss"  # casefold, not just lower
    tok = get_tokenizer("standard_folded")
    got = tok.tokenize("Café CAFE café")
    assert got == [("cafe", 0), ("cafe", 5), ("cafe", 10)]
    assert tok.document_tokens("Ärger\närger") == ["arger", "arger"]
    # the plain tokenizers are unaffected
    assert get_tokenizer("standard").tokenize("Café")[0][0] == "Café"


def test_folded_build_query_rank_identity(ray_session, tmp_path):
    """End-to-end folded index: accented/uppercase variants merge into
    one posting; unfolded queries match; engine == oracle bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.build import BuildConfig, build_index
    from search_engine_ray.corpus import PAGES_SCHEMA
    from search_engine_ray.oracle import OracleIndex
    from search_engine_ray.search import LocalSearcher

    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    rows = [
        {"url": f"https://example.org/fold/{i:04d}", "warc_ts": ts,
         "html": b"", "text": t, "lang": "de"}
        for i, t in enumerate([
            "Café MÜNSTER Straße",
            "cafe munster strasse plain ascii",
            "CAFÉ again naïve",
            "unrelated tokens entirely",
        ])
    ]
    pages = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    root = str(tmp_path / "idx")
    build_index(str(pdir), root,
                BuildConfig(tokenizer="standard_folded", num_buckets=4))
    s = LocalSearcher(root)
    o = OracleIndex.build(pages, tokenizer="standard_folded")
    assert s.vocabulary_size() == len(o.postings)
    for q, st in [(["Café"], "exact"), (["CAFE"], "exact"),
                  (["café"], "exact"), (["MÜNSTER", "café"], "and"),
                  (["STRAẞE"], "exact"),  # casefolds to strasse
                  (["caf"], "prefix"), (["afe"], "contains"),
                  (["cafz"], "fuzzy")]:
        eng = s.search(q, st, k=10)
        got = list(zip(eng.column("doc_id").to_pylist(),
                       eng.column("score").to_pylist()))
        want = [(d, sc) for d, sc, _ in o.search(q, st, k=10)]
        assert got == want, (q, st)
        assert got, (q, st)  # every probe matches something
    # the three Café docs share one folded posting
    assert len(o.postings["cafe"]) == 3
