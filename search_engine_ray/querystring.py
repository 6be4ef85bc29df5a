"""One-string query syntax over every search surface (Lucene
QueryParser-lite).

The reference exposes exactly this UX: one free-text field plus a
SearchType selector (app SearchEngineApp search panel;
engine SearchType.java:3-5 EXACT_MATCH / START_WITH /
WITH_SUGGESTIONS). Our engine grew a strict superset of types
(exact/prefix/contains/wildcard/regex/fuzzy/fuzzy2/phrase/near/
bool/synonym + where-filters + paging), each with its own call
signature — this module folds them back into ONE string so a caller
(CLI, REPL, service endpoint) can take user text verbatim.

Syntax (one modality per query, filters compose with any of them)::

    mama mila                     OR of terms (multi) / exact (single)
    "mama mila doma"              phrase (adjacent, in order)
    "doma mila"~5                 NEAR: same line within a 5-column span
    mil*                          prefix (trailing * only)
    m?la  *ila  m*a               wildcard glob (? or inner/leading *)
    /m[ai]la/                     vocabulary regex (full-term match)
    milo~  milo~1  milo~2         fuzzy: edit distance <= 1 / 1 / 2
    mama AND NOT mila             boolean algebra (AND/OR/NOT + parens)
    car|auto fast                 synonym groups (|-joined = one group)
    lang:en mama                  equality filter + query
    doc_len:50..400 mama          inclusive numeric range filter
    doc_len:..400                 open-ended range (either end)

Rules, deliberately strict (a typo should error, not silently search
for the wrong thing):

* ``field:value`` tokens anywhere OUTSIDE quotes become ``where``
  entries; bare digits type as int, digit-dot-digit as float,
  everything else as string; ``lo..hi`` makes an inclusive-range
  tuple with ``None`` for an omitted end. A field repeated in the
  text, or colliding with the caller's explicit ``where=``, raises.
* Modalities do not mix: a query combining quotes with wildcards,
  or boolean operators with fuzzy suffixes, raises ``ValueError``
  (boolean text OWNS its operators: AND/OR/NOT only count as
  operators in uppercase, matching boolquery).
* Bare terms are analyzed with the INDEX's tokenizer, so
  punctuation splits exactly like it did at indexing time
  (``foo-bar`` queries the two terms it was indexed as). Syntax
  tokens (wildcard/fuzzy/regex) bypass the analyzer — their
  metacharacters are separator characters.
* Fuzzy applies per-query-uniformly: any ``~``-suffixed token makes
  the whole term list fuzzy at the MAX requested edit distance
  (expansion always includes the 0-edit term itself, so plain
  tokens rank identically to their exact search).

``search_text`` dispatches the parse to the matching searcher method
and works against any doc-oriented surface with the LocalSearcher
method contract (LocalSearcher, ShardedSearcher, DocShardServer,
serving pools via their delegating methods).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["ParsedQuery", "parse_query", "search_text"]

# field:value — field is an identifier, value runs to whitespace
_FILTER_RE = re.compile(r"(?<!\S)([A-Za-z_][A-Za-z0-9_]*):(\S+)")
_QUOTED_RE = re.compile(r'"([^"]*)"(~(\d+))?')
_BOOL_OP_RE = re.compile(r"(?<!\S)(?:AND|OR|NOT)(?!\S)|[()]")
_FUZZY_RE = re.compile(r"^(.+?)~([12])?$")
_RANGE_RE = re.compile(r"^(.*?)\.\.(.*)$")


@dataclass
class ParsedQuery:
    """The normalized form ``search_text`` dispatches on.

    kind: one of exact/or/prefix/contains/wildcard/regex/fuzzy/
    fuzzy2/phrase/near/bool/synonym. ``queries`` holds terms for the
    term-list kinds, the raw expression for bool (single element),
    the group lists for synonym. ``window`` is the NEAR span."""

    kind: str
    queries: list = field(default_factory=list)
    where: dict | None = None
    window: int | None = None


def _type_value(raw: str):
    if re.fullmatch(r"-?\d+", raw):
        return int(raw)
    if re.fullmatch(r"-?\d+\.\d*|-?\.\d+", raw):
        return float(raw)
    return raw


def _filter_value(raw: str):
    m = _RANGE_RE.match(raw)
    if m and not raw.startswith("/"):
        lo, hi = m.group(1), m.group(2)
        return (_type_value(lo) if lo else None,
                _type_value(hi) if hi else None)
    return _type_value(raw)


def parse_query(text: str, where: dict | None = None) -> ParsedQuery:
    """Parse one query string; ``where`` is the caller's explicit
    filter dict, merged with (and guarded against) in-text filters."""
    if not isinstance(text, str) or not text.strip():
        raise ValueError("empty query")
    merged = dict(where or {})

    # 1. quoted segments come out first (their content is opaque)
    quoted: list[tuple[str, int | None]] = []

    def take_quote(m: re.Match) -> str:
        quoted.append((m.group(1),
                       int(m.group(3)) if m.group(3) else None))
        return " "

    rest = _QUOTED_RE.sub(take_quote, text)
    if '"' in rest:
        raise ValueError("unbalanced quote in query")

    # 2. field:value filters from the unquoted remainder
    def take_filter(m: re.Match) -> str:
        fld, raw = m.group(1), m.group(2)
        if fld in merged:
            raise ValueError(f"duplicate filter field {fld!r}")
        merged[fld] = _filter_value(raw)
        return " "

    rest = _FILTER_RE.sub(take_filter, rest)
    merged = merged or None
    toks = rest.split()

    # 3. classify the remainder — exactly one modality may claim it
    is_bool = bool(_BOOL_OP_RE.search(rest))
    is_regex = [t for t in toks if len(t) >= 3
                and t.startswith("/") and t.endswith("/")]
    fuzzy_lv = 0
    plain: list[str] = []
    glob: list[str] = []
    for t in toks:
        if t in is_regex:
            continue
        fm = _FUZZY_RE.match(t)
        if fm and not is_bool:
            fuzzy_lv = max(fuzzy_lv, int(fm.group(2) or 1))
            plain.append(fm.group(1))
        elif ("?" in t) or ("*" in t):
            glob.append(t)
        else:
            plain.append(t)
    claims = [name for name, got in (
        ("phrase", bool(quoted)), ("bool", is_bool),
        ("regex", bool(is_regex)), ("wildcard", bool(glob)),
        ("fuzzy", fuzzy_lv > 0),
    ) if got]
    if len(claims) > 1:
        raise ValueError(
            f"query mixes modalities {claims}: use one of quoted / "
            "boolean / regex / wildcard / fuzzy syntax per query")

    if quoted:
        if plain:
            raise ValueError("terms outside the quoted phrase; "
                             "quote everything or nothing")
        if len(quoted) > 1:
            raise ValueError("one quoted phrase per query")
        content, window = quoted[0]
        if not content.strip():
            raise ValueError("empty phrase")
        kind = "near" if window is not None else "phrase"
        return ParsedQuery(kind, [content], merged, window)
    if is_bool:
        if re.search(r"[~*?/|]", rest):
            raise ValueError(
                "boolean queries take bare terms only — no fuzzy/"
                "wildcard/regex/synonym syntax inside AND/OR/NOT")
        return ParsedQuery("bool", [rest.strip()], merged)
    if is_regex:
        if len(is_regex) > 1 or plain or glob:
            raise ValueError("a regex query is exactly one /pattern/")
        return ParsedQuery("regex", [is_regex[0][1:-1]], merged)
    if glob:
        if len(glob) > 1 or plain:
            raise ValueError("a wildcard query is exactly one pattern")
        g = glob[0]
        if g.endswith("*") and "?" not in g and g.count("*") == 1:
            return ParsedQuery("prefix", [g[:-1]], merged)
        return ParsedQuery("wildcard", [g], merged)
    if not plain:
        raise ValueError("no query terms (filters alone do not search)")
    if fuzzy_lv:
        return ParsedQuery("fuzzy2" if fuzzy_lv == 2 else "fuzzy",
                           plain, merged)
    if any("|" in t for t in plain):
        return ParsedQuery("synonym", [t.split("|") for t in plain],
                           merged)
    return ParsedQuery("or" if len(plain) > 1 else "exact", plain,
                       merged)


def search_text(searcher, text: str, k: int = 10, scorer: str = "taat",
                where: dict | None = None,
                search_after: tuple[float, int] | None = None,
                with_urls: bool = True):
    """Parse ``text`` and run it against ``searcher``. Term-list kinds
    analyze bare terms with the index's own tokenizer (so query text
    splits/folds exactly as the corpus did); phrase/near content is
    analyzed too. ``search_after`` pages only the ranked term kinds
    (the same contract as ``searcher.search``)."""
    p = parse_query(text, where=where)
    if p.kind == "bool":
        return searcher.bool_search(p.queries[0], k=k, where=p.where)
    if p.kind == "synonym":
        return searcher.synonym_search(p.queries, k=k, where=p.where)
    tok = getattr(searcher, "_tok", None)
    if tok is None:  # ShardedSearcher: borrow any shard's analyzer
        shards = getattr(searcher, "shards", None)
        if shards:
            tok = getattr(shards[0], "_tok", None)
    if p.kind in ("phrase", "near"):
        terms = (tok.tokens_only(p.queries[0]) if tok is not None
                 else p.queries[0].split())
        if not terms:
            raise ValueError("phrase has no indexable terms")
        if p.kind == "near":
            return searcher.near_search(terms, window=p.window, k=k,
                                        where=p.where)
        return searcher.phrase_search(terms, k=k, where=p.where)
    queries = p.queries
    if p.kind in ("exact", "or", "fuzzy", "fuzzy2") and tok is not None:
        # re-analyze bare terms; fuzzy cores stay whole modulo folding
        if p.kind in ("exact", "or"):
            queries = [t for q in queries for t in tok.tokens_only(q)]
        else:
            queries = [tok.fold(q) if tok.folding else q
                       for q in queries]
        if not queries:
            raise ValueError("no query terms survive analysis")
        if p.kind in ("exact", "or"):
            p.kind = "or" if len(queries) > 1 else "exact"
    return searcher.search(queries, p.kind, k=k, scorer=scorer,
                           where=p.where, search_after=search_after,
                           with_urls=with_urls)
