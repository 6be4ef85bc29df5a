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
