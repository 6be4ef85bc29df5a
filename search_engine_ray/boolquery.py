"""Boolean query language: ``AND`` / ``OR`` / ``NOT`` with parentheses.

Generalizes the engine's conjunctive search (north-star "top-k retrieval
via posting-list intersection") to full boolean set algebra over posting
lists, with Lucene-style scoring semantics: the MATCH is the boolean
predicate; the SCORE is the BM25 sum of the POSITIVE clauses a matching
document contains (``NOT`` branches filter, never score — a document
matching only via negation scores 0.0 and ranks by doc_id).

Grammar (uppercase keywords; ``AND`` binds tighter than ``OR``; ``NOT``
is prefix):

    expr    := or_expr
    or_expr := and_expr ( 'OR' and_expr )*
    and_expr:= not_expr ( 'AND' not_expr )*
    not_expr:= 'NOT' not_expr | atom
    atom    := '(' expr ')' | TERM

The AST is plain tuples — ("term", t) / ("and", [..]) / ("or", [..]) /
("not", x) — shared by the engine evaluator (sorted-ordinal numpy set
ops below) and the oracle evaluator (independent Python sets in
oracle.OracleIndex.bool_search), so rank-identity tests compare two
implementations that share only the parse.

Scale note: evaluation is per doc-shard local under doc-space sharding
(a document's membership in any boolean set is decidable from its own
shard's postings, complement included), so ShardedSearcher /
DocShardServer run the same kernel per shard with global idfs injected
and merge per-shard top-k — the same exactness argument as
phrase_search.
"""

from __future__ import annotations

import numpy as np

_KEYWORDS = {"AND", "OR", "NOT"}


def _lex(query: str) -> list[str]:
    out: list[str] = []
    tok = ""
    for ch in query:
        if ch in "()":
            if tok:
                out.append(tok)
                tok = ""
            out.append(ch)
        elif ch.isspace():
            if tok:
                out.append(tok)
                tok = ""
        else:
            tok += ch
    if tok:
        out.append(tok)
    return out


def parse(query: str):
    """Parse to the tuple AST; raises ValueError on syntax errors."""
    toks = _lex(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat(t=None):
        nonlocal pos
        cur = peek()
        if cur is None or (t is not None and cur != t):
            raise ValueError(
                f"boolean query syntax error at token {pos}: "
                f"expected {t or 'a term'}, got {cur!r} in {query!r}")
        pos += 1
        return cur

    def atom():
        cur = peek()
        if cur == "(":
            eat("(")
            e = or_expr()
            eat(")")
            return e
        if cur is None or cur in _KEYWORDS or cur == ")":
            raise ValueError(
                f"boolean query syntax error: expected a term, got "
                f"{cur!r} in {query!r}")
        return ("term", eat())

    def not_expr():
        if peek() == "NOT":
            eat("NOT")
            return ("not", not_expr())
        return atom()

    def and_expr():
        parts = [not_expr()]
        while peek() == "AND":
            eat("AND")
            parts.append(not_expr())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def or_expr():
        parts = [and_expr()]
        while peek() == "OR":
            eat("OR")
            parts.append(and_expr())
        return parts[0] if len(parts) == 1 else ("or", parts)

    ast = or_expr()
    if pos != len(toks):
        raise ValueError(
            f"boolean query syntax error: trailing tokens "
            f"{toks[pos:]!r} in {query!r}")
    return ast


def term_leaves(ast) -> set[str]:
    """Every distinct term in the query."""
    kind = ast[0]
    if kind == "term":
        return {ast[1]}
    if kind == "not":
        return term_leaves(ast[1])
    out: set[str] = set()
    for child in ast[1]:
        out |= term_leaves(child)
    return out


def positive_terms(ast, under_not: bool = False) -> set[str]:
    """Terms NOT under a negation — the scoring clauses."""
    kind = ast[0]
    if kind == "term":
        return set() if under_not else {ast[1]}
    if kind == "not":
        return positive_terms(ast[1], not under_not)
    out: set[str] = set()
    for child in ast[1]:
        out |= positive_terms(child, under_not)
    return out


def eval_ordinals(ast, postings: dict[str, np.ndarray],
                  n_docs: int) -> np.ndarray:
    """Evaluate the AST to a sorted unique ordinal array. ``postings``
    maps term -> sorted unique ordinal ndarray (missing term == empty).
    ``NOT`` complements against the local universe [0, n_docs) — an
    O(n_docs) materialization per negation, the honest cost of open
    negation (engines that forbid pure NOT avoid it; under doc-sharding
    it is per-shard-sized, never corpus-sized)."""
    kind = ast[0]
    empty = np.empty(0, dtype=np.int64)
    if kind == "term":
        return postings.get(ast[1], empty)
    if kind == "not":
        inner = eval_ordinals(ast[1], postings, n_docs)
        return np.setdiff1d(np.arange(n_docs, dtype=np.int64), inner,
                            assume_unique=True)
    parts = [eval_ordinals(c, postings, n_docs) for c in ast[1]]
    if kind == "and":
        parts.sort(key=len)
        out = parts[0]
        for p in parts[1:]:
            if not out.size:
                return empty
            out = np.intersect1d(out, p, assume_unique=True)
        return out
    out = parts[0]
    for p in parts[1:]:
        out = np.union1d(out, p)
    return out
