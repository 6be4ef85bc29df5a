"""Tokenizers — the correctness contract of the whole engine.

Semantics are EXACTLY those of the reference's analyzers (re-implemented, not
copied — the reference walks chars with a StringBuilder; we use an equivalent
compiled regex over runs of non-separator chars, which produces identical
token streams and positions):

* ``StandardTokenizer``: split at any char of a fixed 29-char punctuation set
  (including Unicode curly quotes, NOT tab/``=``/``&``/``_``/digits); a token
  is a maximal run of non-separator chars; ``position`` = char index of the
  token's first char within its line; trailing token without separator is
  emitted; empty/None input -> no tokens. No lowercasing / stemming /
  stopwords; matching is case-sensitive.
  (ref: engine/src/main/java/org/search/engine/analyzer/StandardTokenizer.java:14-49)
* ``WhitespaceTokenizer``: same loop, splitting only on U+0020.
  (ref: engine/.../analyzer/WhitespaceTokenizer.java:15-47)

Documents are tokenized line by line, mirroring the reference's
``Files.lines`` -> per-line tokenize (ref: engine/.../index/
AbstractDocumentReadTask.java:31-50, IndexationSchedulerTask.java:42-45).
Line splitting matches Java ``BufferedReader.readLine``: terminators are
``\\n``, ``\\r`` and ``\\r\\n`` only (NOT the wider Unicode set Python's
``str.splitlines`` uses).

Known deviation: token ``position`` counts Unicode CODE POINTS
(``m.start()`` on a Python str), while the reference's char-walk counts
UTF-16 code units (Java ``charAt``). On lines containing astral-plane
characters (emoji etc.) positions differ by the number of preceding
surrogate pairs; token STRINGS and engine/oracle internal consistency are
unaffected (both sides of every test use code points).

The tokenizer is a plug-in point, as in the reference
(engine/.../analyzer/Tokenizer.java:11-20): ``register_tokenizer`` lets users
supply their own; pipelines refer to tokenizers by name so the choice is
recorded in index manifests.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

# The reference's punctuation set, verbatim
# (StandardTokenizer.java:14-16). Order irrelevant; membership is what matters.
STANDARD_SEPARATORS = (
    ".", ",", "!", "?", ":", ";", '"', "'", "(", ")",
    "[", "]", "/", "-", "“", "”", " ", "<", ">", "{",
    "}", "+", "*", "^", "#", "~", "%", "$", "@",
)

# Java BufferedReader.readLine terminators (NOT str.splitlines).
_LINE_RE = re.compile("\r\n|\r|\n")


def split_lines(text: str) -> list[str]:
    """Split like ``Files.lines`` (terminators: \\n, \\r, \\r\\n)."""
    return _LINE_RE.split(text)


class Tokenizer:
    """Base tokenizer: maximal runs of non-separator characters.

    Subclasses define ``separators``. ``tokenize(line)`` returns
    ``[(content, position), ...]`` with position = char index of token start
    in the line — identical output to the reference's char-walk loop.
    """

    name = "base"
    separators: tuple[str, ...] = ()
    folding = False  # True => token CONTENT maps through fold()

    def __init__(self) -> None:
        cls = "".join(re.escape(c) for c in self.separators)
        self._token_re = re.compile(f"[^{cls}]+")

    def fold(self, s: str) -> str:
        """Content normalization hook (identity here): folding
        tokenizers map token text through this AFTER extraction, so
        positions always index the ORIGINAL line."""
        return s

    def tokenize(self, line: str | None) -> list[tuple[str, int]]:
        if not line:
            return []
        if self.folding:
            return [(self.fold(m.group()), m.start())
                    for m in self._token_re.finditer(line)]
        return [(m.group(), m.start()) for m in self._token_re.finditer(line)]

    def tokens_only(self, line: str | None) -> list[str]:
        """Just token contents (skips position bookkeeping — hot path)."""
        if not line:
            return []
        if self.folding:
            return [self.fold(t) for t in self._token_re.findall(line)]
        return self._token_re.findall(line)

    def iter_document(self, text: str | None) -> Iterator[tuple[int, str, int]]:
        """Yield ``(row, token, col)`` over a whole document, row 1-based,
        line-by-line like the reference's per-line indexing."""
        if not text:
            return
        for row, line in enumerate(split_lines(text), start=1):
            for tok, col in self.tokenize(line):
                yield row, tok, col

    def document_tokens(self, text: str | None) -> list[str]:
        """Flat token stream of a document (line-split then tokenized)."""
        if not text:
            return []
        out: list[str] = []
        for line in split_lines(text):
            out.extend(self.tokens_only(line))
        return out


class StandardTokenizer(Tokenizer):
    name = "standard"
    separators = STANDARD_SEPARATORS


class WhitespaceTokenizer(Tokenizer):
    name = "whitespace"
    separators = (" ",)


def fold_text(s: str) -> str:
    """Case fold + accent strip: NFD-decompose, drop combining marks —
    the standard multilingual-webtext normalization ('Café' == 'cafe',
    'MÜNSTER' == 'munster'). Positions are unaffected: folding applies
    to extracted token CONTENT only."""
    import unicodedata

    return "".join(c for c in unicodedata.normalize("NFD", s.casefold())
                   if not unicodedata.combining(c))


class FoldedStandardTokenizer(StandardTokenizer):
    """StandardTokenizer + case/accent folding of token content —
    select with ``BuildConfig(tokenizer="standard_folded")``. Queries
    fold too (LocalSearcher/OracleIndex expand), so 'Café' finds docs
    containing 'cafe', 'café' or 'CAFÉ'."""

    name = "standard_folded"
    folding = True

    def fold(self, s: str) -> str:
        return fold_text(s)


# position packing used in posting lists: pos = (row << 32) | col, int64.
def pack_position(row: int, col: int) -> int:
    return (row << 32) | col


def unpack_position(pos: int) -> tuple[int, int]:
    return pos >> 32, pos & 0xFFFFFFFF


def re2_document_token_pattern(separators: tuple[str, ...]) -> str:
    """RE2-syntax pattern matching document-level tokens: maximal runs of
    non-separator chars, with \\r\\n added to the class so the match set is
    identical to per-line tokenization (usable with Arrow's
    count_substring_regex and DuckDB's regexp functions)."""
    def esc(c: str) -> str:
        return "\\" + c if c in "\\]^-" else c

    cls = "".join(esc(c) for c in separators) + "\\r\\n"
    return f"[^{cls}]+"


_REGISTRY: dict[str, Callable[[], Tokenizer]] = {
    "standard": StandardTokenizer,
    "standard_folded": FoldedStandardTokenizer,
    "whitespace": WhitespaceTokenizer,
}


def register_tokenizer(name: str, factory: Callable[[], Tokenizer]) -> None:
    """User extension point (ref: analyzer/Tokenizer.java:11-20, README.md:25-29)."""
    _REGISTRY[name] = factory


def get_tokenizer(name: str) -> Tokenizer:
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise KeyError(
            f"unknown tokenizer {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None
