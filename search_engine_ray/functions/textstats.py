"""Text-analysis stages for large-scale training-data pipelines.

All are stateless ``map_batches`` callables over Arrow batches of a
``documents``-shaped table (``doc_id: int64, text: string``); tokenization
uses the engine's reference-parity tokenizer with newline handling identical
to per-line tokenization (tokenizers.py), so every stat is reproducible in
SQL via ``regexp_extract_all`` with ``sql_token_pattern()``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from search_engine_ray.analyzer.tokenizers import STANDARD_SEPARATORS

# English/German/French stopword mini-lists for the language heuristic and
# quality scoring. Fixed and tiny on purpose — deterministic, dependency-free.
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit")
STOPWORDS_FR = ("le", "la", "et", "les", "des", "un", "une", "est", "dans")


def token_regex() -> re.Pattern:
    """Full-document token pattern: the 29 separators PLUS \\r\\n — yields
    exactly the same token stream as per-line tokenization (a newline can
    never appear inside a line's token)."""
    cls = "".join(re.escape(c) for c in STANDARD_SEPARATORS) + "\\r\\n"
    return re.compile(f"[^{cls}]+")


def sql_token_pattern() -> str:
    """The same pattern as an RE2 literal for DuckDB, SQL-quoted."""
    def esc(c: str) -> str:
        return "\\" + c if c in "\\]^-" else c

    cls = "".join(esc(c) for c in STANDARD_SEPARATORS) + "\\r\\n"
    return f"[^{cls}]+".replace("'", "''")


# simplified GPT-2-style pretokenizer (ASCII classes, no lookahead — the
# same pattern is valid Python-re AND RE2, so DuckDB can cross-check it).
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


class BpeTokenCountBatch:
    """Per-doc BPE-ish pretoken count (the LM-training 'how many tokens is
    this document' estimator; regex compiled once per actor/task)."""

    def __init__(self):
        self._re = re.compile(BPE_PRETOKEN_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = pc.count_substring_regex(
            batch.column("text").combine_chunks().cast(pa.string()),
            pattern=BPE_PRETOKEN_PATTERN,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_pretokens": counts.cast(pa.int64()).fill_null(0),
            }
        )


class TokenStatsBatch:
    """Per-doc token statistics: n_tokens, n_distinct, stop_ratio (EN)."""

    def __init__(self, stopwords: tuple[str, ...] = STOPWORDS_EN):
        self._re = token_regex()
        self._stop = frozenset(stopwords)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tok = np.zeros(len(texts), dtype=np.int64)
        n_dis = np.zeros(len(texts), dtype=np.int64)
        stop = np.zeros(len(texts), dtype=np.float64)
        findall = self._re.findall
        for i, t in enumerate(texts):
            toks = findall(t) if t else []
            n_tok[i] = len(toks)
            n_dis[i] = len(set(toks))
            if toks:
                stop[i] = sum(1 for w in toks if w in self._stop) / len(toks)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok),
                "n_distinct": pa.array(n_dis),
                "stop_ratio": pa.array(np.round(stop, 6)),
            }
        )


def round_half_away(x: float, nd: int = 6) -> float:
    """Round-half-away-from-zero on the scaled value — matches SQL
    ``round()`` (DuckDB/ANSI); Python's built-in ``round`` is banker's
    rounding and diverges on dyadic ties like 0.8203125."""
    scale = 10.0 ** nd
    import math

    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


class QualityScoreBatch:
    """Heuristic quality scoring: mean token length, alpha ratio, and a
    composite [0,1] quality score (length/punct/stopword heuristics — the
    usual pre-training corpus filters, expressed as one vectorizable pass).

    Rounding is half-away-from-zero (round_half_away): alpha ratios are
    dyadic fractions (chars/len) that actually HIT .5 ties at 6 dp, where
    Python's banker's rounding would diverge from the SQL oracle."""

    def __init__(self):
        self._re = token_regex()
        self._alpha = re.compile(r"[A-Za-z]")
        self._stop = frozenset(STOPWORDS_EN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = {
            "doc_id": batch.column("doc_id"),
            "mean_token_len": [],
            "alpha_ratio": [],
            "quality": [],
        }
        for t in texts:
            toks = self._re.findall(t) if t else []
            n = len(toks)
            mtl = (sum(len(w) for w in toks) / n) if n else 0.0
            alpha = (len(self._alpha.findall(t)) / len(t)) if t else 0.0
            stop_hits = sum(1 for w in toks if w in self._stop)
            has_stop = min(1.0, stop_hits / max(1, n) * 10)
            len_ok = min(1.0, n / 50.0)
            q = round_half_away(0.4 * len_ok + 0.3 * min(1.0, alpha * 1.25)
                                + 0.3 * has_stop)
            out["mean_token_len"].append(round_half_away(mtl))
            out["alpha_ratio"].append(round_half_away(alpha))
            out["quality"].append(q)
        return pa.table(out)


class LangIdBatch:
    """n-gram/stopword heuristic language ID (the container has no langid
    lib). Scores en/de/fr by stopword hits; 'und' (unknown) when no hits."""

    _LANGS = {"en": STOPWORDS_EN, "de": STOPWORDS_DE, "fr": STOPWORDS_FR}

    def __init__(self):
        self._re = token_regex()
        self._sets = {k: frozenset(v) for k, v in self._LANGS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = []
        confs = []
        for t in texts:
            toks = [w.lower() for w in (self._re.findall(t) if t else [])]
            if not toks:
                langs.append("und")
                confs.append(0.0)
                continue
            scores = {
                k: sum(1 for w in toks if w in s) / len(toks)
                for k, s in self._sets.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            langs.append(best if scores[best] > 0 else "und")
            confs.append(round(scores[best], 6))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(langs, pa.string()),
                "lang_conf": pa.array(confs, pa.float64()),
            }
        )


class FingerprintBatch:
    """Deterministic document fingerprints: a rolling polynomial hash over
    the token stream (order-sensitive) + md5 of the raw text (exact).

    The per-token hash is the LOWER 8 md5 digest bytes, little-endian —
    exactly DuckDB's ``md5_number_lower`` — so the whole fingerprint is
    reproducible in SQL (``list_reduce`` over ``md5_number_lower`` per
    token) and the operator is oracle-checkable cross-engine."""

    _MOD = (1 << 61) - 1
    _BASE = 1_000_003

    def __init__(self):
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        rolls = np.zeros(len(texts), dtype=np.int64)
        md5s = []
        for i, t in enumerate(texts):
            h = 0
            for w in self._re.findall(t) if t else []:
                wh = int.from_bytes(hashlib.md5(w.encode()).digest()[8:],
                                    "little")
                h = (h * self._BASE + wh) % self._MOD
            rolls[i] = h
            md5s.append(hashlib.md5((t or "").encode()).hexdigest())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "rolling_fp": pa.array(rolls),
                "text_md5": pa.array(md5s, pa.string()),
            }
        )
