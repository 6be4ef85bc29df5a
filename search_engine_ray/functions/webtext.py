"""Webtext corpus-curation signals for large-scale pre-training pipelines.

Gopher-style repetition statistics, per-source corpus statistics, a
dependency-free unigram-LM surprisal score (the KenLM-perplexity-filter
analogue), benchmark decontamination by n-gram overlap, and a composite
keep/reject corpus filter chaining them. Each is a streaming
``map_batches`` stage over the ``documents`` table and each is
reproducible in DuckDB SQL (``__ray_entry__.oracle_sql``) for the
driver's cross-engine value-hash check.

Public method references (patterns only, all published):
- Rae et al., "Scaling Language Models: ... Gopher" (arXiv:2112.11446)
  §A1.1 — duplicate-line / duplicate-n-gram repetition filters.
- Wenzek et al., "CCNet" (arXiv:1911.00359) — LM-score quality
  bucketing (here: a corpus-trained unigram LM instead of KenLM).
- Brown et al., "GPT-3" (arXiv:2005.14165) Appendix C — benchmark
  decontamination by n-gram overlap against a held-out eval set.

Scale notes: every per-doc signal is an embarrassingly-parallel
``map_batches`` pass (no shuffle). The unigram LM and the eval
shingle set are the only cross-doc state; both are bounded small
(vocabulary / benchmark-sized), built with ONE bucketed aggregate and
broadcast once per actor via ``ray.put`` — never re-shipped per batch.
"""

from __future__ import annotations

import hashlib
import itertools
import logging
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from search_engine_ray.functions.dedup import (
    _shingle_hash_array,
    shingle_hashes_from_tokens,
)
from search_engine_ray.functions.textstats import (
    round_half_away,
    token_regex,
)

log = logging.getLogger(__name__)

_LINE_SPLIT = re.compile(r"\r\n|\r|\n")

# Vocabulary sizes beyond this get logged — the broadcast unigram table
# is vocab-bounded (webtext vocabularies plateau in the tens of millions;
# ~16 bytes/term), but the log makes the assumption visible at scale.
BROADCAST_VOCAB_WARN = 50_000_000


class RepetitionStatsBatch:
    """Per-doc repetition signals (Gopher §A1.1 family):

    - ``dup_line_frac``      1 - distinct/total over non-empty lines
    - ``dup_line_char_frac`` chars inside lines occurring >= 2x / chars
    - ``dup_3gram_frac``     1 - distinct/total over token 3-grams
    - ``top_2gram_frac``     occurrences of the most frequent token
                             2-gram / total 2-grams

    All fractions are 0.0 when the denominator is empty and are rounded
    half-away-from-zero at 6 dp (dyadic fractions like 1/128 DO hit
    .5 ties at 6 dp, where banker's rounding would diverge from SQL).
    """

    def __init__(self):
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        dlf = np.zeros(n)
        dlcf = np.zeros(n)
        d3f = np.zeros(n)
        t2f = np.zeros(n)
        findall = self._re.findall
        for i, t in enumerate(texts):
            lines = [ln for ln in _LINE_SPLIT.split(t) if ln] if t else []
            if lines:
                cnt = Counter(lines)
                dlf[i] = 1.0 - len(cnt) / len(lines)
                total_chars = sum(len(ln) * c for ln, c in cnt.items())
                if total_chars:
                    dup_chars = sum(len(ln) * c for ln, c in cnt.items()
                                    if c >= 2)
                    dlcf[i] = dup_chars / total_chars
            toks = findall(t) if t else []
            if len(toks) >= 3:
                tg = Counter(zip(toks, toks[1:], toks[2:]))
                d3f[i] = 1.0 - len(tg) / (len(toks) - 2)
            if len(toks) >= 2:
                bg = Counter(zip(toks, toks[1:]))
                t2f[i] = max(bg.values()) / (len(toks) - 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "dup_line_frac": pa.array(
                    [round_half_away(x) for x in dlf], pa.float64()),
                "dup_line_char_frac": pa.array(
                    [round_half_away(x) for x in dlcf], pa.float64()),
                "dup_3gram_frac": pa.array(
                    [round_half_away(x) for x in d3f], pa.float64()),
                "top_2gram_frac": pa.array(
                    [round_half_away(x) for x in t2f], pa.float64()),
            }
        )


def source_stats(ds, num_buckets: int = 64):
    """Per-source corpus curation stats: doc count, language spread,
    char volume, and exact-duplicate fraction (1 - distinct md5 / docs).

    The domain/source-level view is the curation unit for webtext
    (per-domain quality gates, per-domain dedup priors). One coarse
    bucketed aggregate on the source key — source cardinality is
    domain-count-bounded, far below doc count, so the shuffle is tiny
    relative to the corpus scan."""
    import pandas as pd

    from search_engine_ray.stages.agg import bucketed_group_agg

    def to_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_chars": batch.column("n_chars"),
                "text_md5": pa.array(md5s, pa.string()),
            }
        )

    rows = ds.map_batches(to_rows, batch_format="pyarrow", batch_size=2048)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("source", as_index=False).agg(
            n_docs=("lang", "size"),
            n_langs=("lang", "nunique"),
            total_chars=("n_chars", "sum"),
            n_uniq=("text_md5", "nunique"),
        )
        out["mean_chars"] = [
            round_half_away(t / n)
            for t, n in zip(out["total_chars"], out["n_docs"])
        ]
        out["dup_text_frac"] = [
            round_half_away(1.0 - u / n)
            for u, n in zip(out["n_uniq"], out["n_docs"])
        ]
        out["n_docs"] = out["n_docs"].astype("int64")
        out["n_langs"] = out["n_langs"].astype("int64")
        out["total_chars"] = out["total_chars"].astype("int64")
        return out.drop(columns=["n_uniq"])

    return bucketed_group_agg(rows, ["source"], per_bucket,
                              num_buckets=num_buckets)


class TermCountBatch:
    """(doc_id, text) -> map-side-combined (term, c) partial counts."""

    def __init__(self):
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        findall = self._re.findall
        for t in batch.column("text").to_pylist():
            cnt.update(findall(t) if t else ())
        return pa.table(
            {
                "term": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(np.fromiter(cnt.values(), dtype=np.int64,
                                          count=len(cnt))),
            }
        )


def _unigram_model(ds, num_buckets: int = 64):
    """Corpus unigram counts -> (sorted term ndarray, count ndarray,
    total_tokens, vocab_size). One bucketed aggregate over map-side
    partial counts; the result is vocabulary-sized (logged above the
    broadcast advisory threshold), NOT corpus-sized."""
    import pandas as pd

    from search_engine_ray.stages.agg import bucketed_group_agg

    partials = ds.map_batches(TermCountBatch(), batch_format="pyarrow",
                              batch_size=2048)
    counts = bucketed_group_agg(
        partials, ["term"],
        lambda g: g.groupby("term", as_index=False).agg(c=("c", "sum")),
        num_buckets=num_buckets,
    ).to_pandas()
    if len(counts) > BROADCAST_VOCAB_WARN:
        log.warning("unigram vocabulary %d exceeds broadcast advisory %d",
                    len(counts), BROADCAST_VOCAB_WARN)
    counts = counts.sort_values("term", kind="mergesort")
    terms = counts["term"].to_numpy(dtype=object)
    c = counts["c"].to_numpy(dtype=np.int64)
    return terms, c, int(c.sum()), len(terms)


class SurprisalBatch:
    """Per-doc mean negative log-likelihood under the corpus unigram LM
    with add-one smoothing: p(t) = (c(t)+1)/(T+V); OOV tokens score as
    c=0. The (term -> count) table arrives as ONE ``ray.put`` object ref,
    fetched zero-copy once per actor; per-batch lookup is a single
    vectorized searchsorted over the batch's concatenated token stream."""

    def __init__(self, model_ref):
        self._re = token_regex()
        terms, c, total, vocab = ray.get(model_ref)
        self._terms = terms
        self._logc1 = np.log(c.astype(np.float64) + 1.0)
        self._log_denom = float(np.log(float(total + vocab)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        findall = self._re.findall
        per_doc = [findall(t) if t else [] for t in texts]
        lens = np.fromiter((len(p) for p in per_doc), dtype=np.int64,
                           count=len(per_doc))
        flat = np.array([w for p in per_doc for w in p], dtype=object)
        mean_nll = np.zeros(len(texts))
        if flat.size:
            idx = np.searchsorted(self._terms, flat)
            idx_c = np.clip(idx, 0, len(self._terms) - 1)
            hit = self._terms[idx_c] == flat
            tok_logc1 = np.where(hit, self._logc1[idx_c], 0.0)  # ln(0+1)=0
            sums = np.add.reduceat(
                np.concatenate([tok_logc1, [0.0]]),
                np.concatenate([[0], np.cumsum(lens)[:-1]]))[:len(per_doc)]
            nz = lens > 0
            mean_nll[nz] = self._log_denom - sums[nz] / lens[nz]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(lens),
                "mean_nll": pa.array(
                    [round_half_away(x) for x in mean_nll], pa.float64()),
            }
        )


def unigram_surprisal(ds, batch_size: int = 1024):
    """CCNet-style LM quality score, dependency-free: pass 1 trains the
    corpus unigram LM (bucketed aggregate), pass 2 scores every doc
    against the broadcast model. High mean_nll = improbable/garbled text,
    low = repetitive/templated — the standard bucketing signal."""
    model_ref = ray.put(_unigram_model(ds))
    from search_engine_ray.pool import cached_stage

    # warm-task twin of the actor pool: state = one broadcast fetch
    return ds.map_batches(
        cached_stage(SurprisalBatch, model_ref),
        batch_format="pyarrow", batch_size=batch_size,
    )


class BigramCountBatch:
    """(text) -> map-side-combined (w1, w2, c) adjacent-pair partials
    (pairs never cross document boundaries)."""

    def __init__(self):
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        findall = self._re.findall
        for t in batch.column("text").to_pylist():
            toks = findall(t) if t else []
            cnt.update(zip(toks, toks[1:]))
        return pa.table({
            "w1": pa.array([p[0] for p in cnt], pa.string()),
            "w2": pa.array([p[1] for p in cnt], pa.string()),
            "c": pa.array(np.fromiter(cnt.values(), dtype=np.int64,
                                      count=len(cnt))),
        })


def _bigram_model(ds, num_buckets: int = 64, min_count: int = 1):
    """Corpus bigram LM -> (sorted composite-key ndarray, c2 counts) plus
    the unigram model it backs off to. Composite key = w1 + " " + w2
    (space is a STANDARD_SEPARATORS member, so it cannot occur inside a
    token — collision-free; NUL would be cleaner but pandas str concat
    silently truncates at NUL). ``min_count`` prunes rare bigrams from the
    broadcast table (KenLM-style pruning; pruned pairs score as unseen) —
    the lever when the distinct-bigram table outgrows broadcast at
    corpus scale. The documented evolution past pruning is a w1-bucketed
    co-located join (two corpus-sized exchanges) — not built, pruning
    covers the realistic range."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    partials = ds.map_batches(BigramCountBatch(), batch_format="pyarrow",
                              batch_size=2048)
    counts = bucketed_group_agg(
        partials, ["w1", "w2"],
        lambda g: g.groupby(["w1", "w2"], as_index=False).agg(c=("c",
                                                                 "sum")),
        num_buckets=num_buckets,
    ).to_pandas()
    if not len(counts) or "w1" not in counts.columns:
        # zero-bigram corpus: all-empty map_groups output loses schema
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
    if min_count > 1:
        counts = counts[counts["c"] >= min_count]
    if len(counts) > BROADCAST_VOCAB_WARN:
        log.warning("bigram vocabulary %d exceeds broadcast advisory %d "
                    "— raise min_count", len(counts), BROADCAST_VOCAB_WARN)
    keys = (counts["w1"] + " " + counts["w2"]).to_numpy(dtype=object)
    c2 = counts["c"].to_numpy(dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    return keys[order], c2[order]


class BigramSurprisalBatch:
    """Per-doc mean conditional bigram NLL under add-one smoothing:
    nll(w2|w1) = ln(c1(w1) + V) - ln(c2(w1,w2) + 1), averaged over the
    doc's len-1 adjacent positions (0.0 for docs with < 2 tokens).
    Both models arrive as ONE ray.put ref each, fetched once per actor;
    per-batch lookup is one vectorized searchsorted per model over the
    batch's concatenated pair stream."""

    def __init__(self, uni_ref, bi_ref):
        self._re = token_regex()
        terms, c1, _total, vocab = ray.get(uni_ref)
        self._terms = terms
        self._c1 = c1.astype(np.float64)
        self._v = float(vocab)
        keys, c2 = ray.get(bi_ref)
        self._keys = keys
        self._logc21 = np.log(c2.astype(np.float64) + 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        findall = self._re.findall
        per_doc = [findall(t) if t else [] for t in texts]
        n_bi = np.fromiter((max(len(p) - 1, 0) for p in per_doc),
                           dtype=np.int64, count=len(per_doc))
        w1 = np.array([w for p in per_doc for w in p[:-1]], dtype=object)
        pairs = np.array([a + " " + b for p in per_doc
                          for a, b in zip(p, p[1:])], dtype=object)
        mean_bi_nll = np.zeros(len(texts))
        if pairs.size:
            i1 = np.searchsorted(self._terms, w1)
            i1c = np.clip(i1, 0, len(self._terms) - 1)
            hit1 = self._terms[i1c] == w1
            # unseen w1 (cannot happen when the models share one corpus,
            # but the kernel stays total): c1 = 0
            c1 = np.where(hit1, self._c1[i1c], 0.0)
            if len(self._keys):
                i2 = np.searchsorted(self._keys, pairs)
                i2c = np.clip(i2, 0, len(self._keys) - 1)
                hit2 = self._keys[i2c] == pairs
                log_c21 = np.where(hit2, self._logc21[i2c], 0.0)  # ln1=0
            else:  # fully pruned / zero-bigram model: everything unseen
                log_c21 = np.zeros(pairs.size)
            nll = np.log(c1 + self._v) - log_c21
            starts = np.concatenate([[0], np.cumsum(n_bi)[:-1]])
            sums = np.add.reduceat(np.concatenate([nll, [0.0]]),
                                   starts)[:len(per_doc)]
            nz = n_bi > 0
            mean_bi_nll[nz] = sums[nz] / n_bi[nz]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bigrams": pa.array(n_bi),
            "mean_bi_nll": pa.array(
                [round_half_away(x) for x in mean_bi_nll], pa.float64()),
        })


def bigram_surprisal(ds, batch_size: int = 1024, min_count: int = 1):
    """Interpolation-free conditional bigram LM score (the unigram
    surprisal's stronger sibling): pass 1 trains unigram + bigram counts
    (two vocabulary-sized bucketed aggregates over one corpus read
    each), pass 2 scores every doc against the broadcast models."""
    uni_ref = ray.put(_unigram_model(ds))
    bi_ref = ray.put(_bigram_model(ds, min_count=min_count))
    from search_engine_ray.pool import cached_stage

    return ds.map_batches(
        cached_stage(BigramSurprisalBatch, uni_ref, bi_ref),
        batch_format="pyarrow", batch_size=batch_size,
    )


def eval_shingle_set(ds, eval_mod: int = 10, eval_rem: int = 7,
                     k: int = 8) -> np.ndarray:
    """Distinct k-gram shingle hashes of the held-out eval slice
    (doc_id %% eval_mod == eval_rem). Hash convention ==
    dedup._shingle_hash_array (md5_number_lower masked to 61 bits), so
    the whole decontamination pipeline is SQL-reproducible.

    The eval union is benchmark-sized by construction (eval sets are
    small); materializing it on the driver and broadcasting is the
    production-correct design (GPT-3 App. C does exactly this)."""
    tok_re = token_regex()

    def eval_hashes(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids % eval_mod) == eval_rem
        hs = [
            _shingle_hash_array(t, tok_re, k)
            for t, m in zip(batch.column("text").to_pylist(), keep) if m
        ]
        out = (np.unique(np.concatenate(hs)) if hs
               else np.empty(0, dtype=np.int64))
        return pa.table({"h": pa.array(out, pa.int64())})

    parts = ds.map_batches(eval_hashes, batch_format="pyarrow",
                           batch_size=2048).to_pandas()
    if "h" not in parts.columns:  # zero eval-slot docs in the corpus:
        return np.empty(0, np.int64)  # all-empty blocks drop the schema
    return np.unique(parts["h"].to_numpy(dtype=np.int64))


class DecontamBatch:
    """Per-doc n-gram overlap against the broadcast eval shingle set:
    (n_grams, n_hit, contam_frac, contaminated). Membership is one
    sorted-array searchsorted per doc — no shuffle, no joins."""

    def __init__(self, eval_ref, eval_mod: int = 10, eval_rem: int = 7,
                 k: int = 8):
        self._re = token_regex()
        self._eval = ray.get(eval_ref)
        self._mod, self._rem, self._k = eval_mod, eval_rem, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        keep = (ids % self._mod) != self._rem
        out_id, out_n, out_hit = [], [], []
        ev = self._eval
        for d, t, m in zip(ids, texts, keep):
            if not m:
                continue
            hs = _shingle_hash_array(t, self._re, self._k)
            n_hit = 0
            if hs.size and ev.size:
                pos = np.searchsorted(ev, hs)
                pos_c = np.clip(pos, 0, ev.size - 1)
                n_hit = int((ev[pos_c] == hs).sum())
            out_id.append(int(d))
            out_n.append(int(hs.size))
            out_hit.append(n_hit)
        frac = [
            round_half_away(h / n) if n else 0.0
            for h, n in zip(out_hit, out_n)
        ]
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_grams": pa.array(out_n, pa.int64()),
                "n_hit": pa.array(out_hit, pa.int64()),
                "contam_frac": pa.array(frac, pa.float64()),
                "contaminated": pa.array(
                    [1 if h >= 1 else 0 for h in out_hit], pa.int64()),
            }
        )


def decontaminate(ds, eval_mod: int = 10, eval_rem: int = 7, k: int = 8,
                  batch_size: int = 1024):
    """GPT-3-style benchmark decontamination: flag training docs sharing
    any k-gram with the held-out eval slice. Returns non-eval docs only
    (the eval slice itself is the benchmark, not training data)."""
    ev = eval_shingle_set(ds, eval_mod, eval_rem, k)
    ev_ref = ray.put(ev)
    from search_engine_ray.pool import cached_stage

    return ds.map_batches(
        cached_stage(DecontamBatch, ev_ref, eval_mod, eval_rem, k),
        batch_format="pyarrow", batch_size=batch_size,
    )


class LineCleanBatch:
    """C4-style line-level cleaning (Raffel et al., arXiv:1910.10683
    §2.2 rules, deterministic subset): keep a line iff it has >=
    ``min_words`` tokens, ends in terminal punctuation, and does not
    contain 'javascript' (case-insensitive). Emits the cleaned text
    (kept lines joined with \\n) plus kept/total line counts — a text
    TRANSFORM (the output feeds a build), not just a signal."""

    def __init__(self, min_words: int = 3, require_punct: bool = True,
                 blocklist: tuple = ("javascript",)):
        self._re = token_regex()
        self._term = re.compile(r"[.!?]\s*$")
        self._min_words = min_words
        self._require_punct = require_punct
        self._block = tuple(b.lower() for b in blocklist)

    def _keep(self, line: str) -> bool:
        low = line.lower()
        return (len(self._re.findall(line)) >= self._min_words
                and (not self._require_punct
                     or self._term.search(line) is not None)
                and not any(b in low for b in self._block))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out_text, out_kept, out_total = [], [], []
        for t in texts:
            lines = _LINE_SPLIT.split(t) if t else []
            kept = [ln for ln in lines if self._keep(ln)]
            out_text.append("\n".join(kept))
            out_kept.append(len(kept))
            out_total.append(len(lines) if t else 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": pa.array(out_text, pa.string()),
                "n_lines_kept": pa.array(out_kept, pa.int64()),
                "n_lines_total": pa.array(out_total, pa.int64()),
            }
        )


def line_clean(ds, min_words: int = 3, require_punct: bool = True,
               blocklist: tuple = ("javascript",), batch_size: int = 1024):
    """Streaming C4-style line cleaning over a documents-shaped table."""
    return ds.map_batches(
        LineCleanBatch(min_words, require_punct, blocklist),
        batch_format="pyarrow", batch_size=batch_size)


_MOD61 = 1 << 61


def _md5_low61(s: str) -> int:
    """Lower 8 md5 digest bytes little-endian, masked to 61 bits — the
    repo-wide DuckDB ``md5_number_lower`` convention (fingerprints,
    shingle hashes), so sampling decisions replay exactly in SQL."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:],
                          "little") % _MOD61


class StratifiedSampleBatch:
    """Deterministic per-source sampling (data mixing): keep a doc iff
    hash(doc_id:seed)/2^61 < rate(source). The rate is itself a
    deterministic hash of the source name mapped into ``rate_lo..rate_hi``
    unless an explicit ``rates`` dict overrides it — so the demo entry
    needs no source list and the op works on any corpus unchanged.

    Hash-based (not rng-based) sampling is the scale-correct design:
    decisions are per-row pure functions — reproducible across cluster
    sizes, retries and resumes, and a re-run samples the SAME docs."""

    def __init__(self, seed: int = 13, rates: dict | None = None,
                 rate_steps: int = 4, rate_base: float = 8.0):
        self._seed = seed
        self._rates = rates
        self._steps = rate_steps
        self._base = rate_base

    def rate_of(self, source: str) -> float:
        if self._rates is not None:
            return float(self._rates.get(source, 0.0))
        return ((_md5_low61(source) % self._steps) + 1) / self._base

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        keep = [
            _md5_low61(f"{d}:{self._seed}") / _MOD61 < self.rate_of(s)
            for d, s in zip(ids, srcs)
        ]
        return batch.filter(pa.array(keep))


def stratified_sample(ds, seed: int = 13, rates: dict | None = None):
    """Per-source corpus sampling/mixing: a streaming filter, no shuffle,
    no driver state. ``rates`` maps source -> keep probability; omitted
    sources drop to 0 (explicit mixing weights), or leave ``rates=None``
    for the hash-derived demo rates."""
    return ds.map_batches(
        StratifiedSampleBatch(seed=seed, rates=rates),
        batch_format="pyarrow", batch_size=2048,
    )




def _token_counter(bpe_merges):
    """Pluggable per-batch token counter for the budget pipelines
    (sequence_pack / corpus_mix): whitespace-regex words by default, or
    TRAINED-BPE piece counts when a merge table (functions/bpe.learn_bpe
    output) is given — training budgets are denominated in tokenizer
    pieces, not words. The ranks dict is tiny (k merges); the word memo
    makes the greedy encode amortize to a dict hit per zipf-repeated
    word."""
    if bpe_merges is None:
        def count(texts, re_):
            return np.fromiter(
                (len(re_.findall(t)) if t else 0 for t in texts),
                dtype=np.int64, count=len(texts))
        return count
    from search_engine_ray.functions.bpe import encode_word

    ranks = {(l, r): i for i, (l, r) in enumerate(zip(
        bpe_merges.column("left").to_pylist(),
        bpe_merges.column("right").to_pylist()))}
    memo: dict[str, int] = {}

    def count(texts, re_):
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            total = 0
            for w in (re_.findall(t) if t else ()):
                c = memo.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    memo[w] = c
                total += c
            out[i] = total
        return out
    return count

def sequence_pack(ds, budget: int = 2048, range_size: int = 100_000,
                  batch_size: int = 2048, bpe_merges=None):
    """Assign every doc a pack_id by cumulative token budget in doc_id
    order — the streaming form of LM sequence packing: pack_id =
    floor((running_sum_before_doc) / budget). A doc that crosses a
    boundary starts in its computed pack (documents are not split; the
    contiguous-cumsum semantics are exactly SQL's
    ``sum() OVER (ORDER BY doc_id)``, which is the oracle).

    Scale shape — a distributed PREFIX SCAN: docs partition into
    contiguous doc_id ranges (``range_size``); one pass computes
    per-range token totals (range-count-sized, collected to the
    driver); the driver prefix-sums those offsets (tiny); one
    range-bucketed pass computes within-range cumsums + offset. No
    global sort, no sequential bottleneck beyond the range-offset
    scan. The materialized intermediate is the PROJECTED
    (doc_id, n_tokens, range_id) rows (~24 B/doc, object-store
    spillable) feeding both passes without re-tokenizing — never the
    corpus text."""
    import pandas as pd

    from search_engine_ray.stages.agg import bucketed_group_agg

    counter = _token_counter(bpe_merges)

    def tok_rows(batch: pa.Table) -> pa.Table:
        re_ = token_regex()
        texts = batch.column("text").to_pylist()
        n = counter(texts, re_)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n),
            "range_id": pa.array((ids // range_size).astype(np.int64)),
        })

    toks = ds.map_batches(tok_rows, batch_format="pyarrow",
                          batch_size=batch_size).materialize()
    # pass 1: per-range totals -> driver prefix sum (range-count-sized)
    sums = toks.groupby("range_id").sum("n_tokens").to_pandas()
    sums = sums.sort_values("range_id")
    totals = sums["sum(n_tokens)"].to_numpy(dtype=np.int64)
    offsets = dict(zip(
        sums["range_id"].astype("int64"),
        np.concatenate(([0], np.cumsum(totals)[:-1]))))

    # pass 2: within-range ordered cumsum + the range's global offset
    # (a coarse bucket may hold several ranges — handle each separately)
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for rid, gg in g.groupby("range_id", sort=False):
            gg = gg.sort_values("doc_id", kind="mergesort")
            nt = gg["n_tokens"].to_numpy(dtype=np.int64)
            before = offsets[int(rid)] + np.cumsum(nt) - nt
            parts.append(pd.DataFrame({
                "doc_id": gg["doc_id"],
                "n_tokens": nt,
                "pack_id": (before // budget).astype("int64"),
            }))
        if not parts:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64"),
                "pack_id": pd.Series(dtype="int64")})
        return pd.concat(parts, ignore_index=True)

    return bucketed_group_agg(toks, ["range_id"], per_bucket)


class CorpusFilterBatch:
    """Composite keep/reject decision per doc, first-failing-rule reason:

    1. eval_holdout   doc is in the benchmark slice (never train on it)
    2. too_short      n_tokens < min_tokens
    3. low_quality    composite quality score < min_quality
    4. repetitive     dup_3gram_frac > max_dup3
    5. contaminated   shares an 8-gram with the eval set
    else keep.

    FUSED single-tokenize pass: each doc is tokenized exactly once and
    the token list feeds every signal kernel; rules short-circuit in
    reason order, so a doc rejected by an early (cheap) rule never pays
    for trigram counting or shingle hashing. Signal arithmetic is copied
    verbatim from the standalone stages — including the 6-dp
    half-away-from-zero rounding that each standalone stage applies
    BEFORE its value reaches a threshold — so decisions are bit-identical
    to the composed path (``CorpusFilterComposedBatch`` pins this in
    tests). The composite gate reads 100% of the corpus in a real
    curation run, so this pass is the hot path."""

    def __init__(self, eval_ref, eval_mod: int = 10, eval_rem: int = 7,
                 k: int = 8, min_tokens: int = 20, min_quality: float = 0.5,
                 max_dup3: float = 0.6):
        from search_engine_ray.functions.textstats import STOPWORDS_EN

        self._re = token_regex()
        self._alpha = re.compile(r"[A-Za-z]")
        self._stop = frozenset(STOPWORDS_EN)
        self._eval = ray.get(eval_ref)
        self._mod, self._rem, self._k = eval_mod, eval_rem, k
        self._min_tokens = min_tokens
        self._min_quality = min_quality
        self._max_dup3 = max_dup3

    def _reason(self, d: int, t: str | None) -> str:
        if (d % self._mod) == self._rem:
            return "eval_holdout"
        toks = self._re.findall(t) if t else []
        n = len(toks)
        if n < self._min_tokens:
            return "too_short"
        # QualityScoreBatch arithmetic (textstats.py), value-identical
        alpha = (len(self._alpha.findall(t)) / len(t)) if t else 0.0
        stop_hits = sum(1 for w in toks if w in self._stop)
        has_stop = min(1.0, stop_hits / max(1, n) * 10)
        len_ok = min(1.0, n / 50.0)
        q = round_half_away(0.4 * len_ok + 0.3 * min(1.0, alpha * 1.25)
                            + 0.3 * has_stop)
        if q < self._min_quality:
            return "low_quality"
        # RepetitionStatsBatch dup_3gram_frac, rounded like the stage
        dup3 = 0.0
        if n >= 3:
            tg = Counter(zip(toks, toks[1:], toks[2:]))
            dup3 = round_half_away(1.0 - len(tg) / (n - 2))
        if dup3 > self._max_dup3:
            return "repetitive"
        # DecontamBatch membership test on the shared shingle hashes
        hs = shingle_hashes_from_tokens(toks, self._k)
        ev = self._eval
        if hs.size and ev.size:
            pos = np.clip(np.searchsorted(ev, hs), 0, ev.size - 1)
            if (ev[pos] == hs).any():
                return "contaminated"
        return ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        reason = [self._reason(d, t) for d, t in zip(ids, texts)]
        keep = [0 if r else 1 for r in reason]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "keep": pa.array(keep, pa.int64()),
                "reason": pa.array(reason, pa.string()),
            }
        )


class CorpusFilterComposedBatch:
    """The pre-fusion reference composition of the standalone signal
    stages (TokenStatsBatch, QualityScoreBatch, RepetitionStatsBatch,
    DecontamBatch — each re-tokenizes). Kept ONLY as the identity anchor:
    tests assert ``CorpusFilterBatch`` (fused) emits bit-identical
    (keep, reason) rows, and bench.py's paired A/B entry measures the
    fusion speedup against it. Not used by any pipeline."""

    def __init__(self, eval_ref, eval_mod: int = 10, eval_rem: int = 7,
                 k: int = 8, min_tokens: int = 20, min_quality: float = 0.5,
                 max_dup3: float = 0.6):
        from search_engine_ray.functions.textstats import (
            QualityScoreBatch,
            TokenStatsBatch,
        )

        self._tok = TokenStatsBatch()
        self._qual = QualityScoreBatch()
        self._rep = RepetitionStatsBatch()
        self._dec = DecontamBatch(eval_ref, eval_mod, eval_rem, k)
        self._mod, self._rem = eval_mod, eval_rem
        self._min_tokens = min_tokens
        self._min_quality = min_quality
        self._max_dup3 = max_dup3

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ntok = self._tok(batch).column("n_tokens").to_numpy()
        qual = self._qual(batch).column("quality").to_numpy()
        dup3 = self._rep(batch).column("dup_3gram_frac").to_numpy()
        dec = self._dec(batch)
        contam = dict(
            zip(dec.column("doc_id").to_pylist(),
                dec.column("contaminated").to_pylist()))
        keep, reason = [], []
        for i, d in enumerate(ids):
            if (d % self._mod) == self._rem:
                r = "eval_holdout"
            elif ntok[i] < self._min_tokens:
                r = "too_short"
            elif qual[i] < self._min_quality:
                r = "low_quality"
            elif dup3[i] > self._max_dup3:
                r = "repetitive"
            elif contam.get(int(d), 0):
                r = "contaminated"
            else:
                r = ""
            keep.append(0 if r else 1)
            reason.append(r)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "keep": pa.array(keep, pa.int64()),
                "reason": pa.array(reason, pa.string()),
            }
        )


def corpus_filter(ds, batch_size: int = 1024, **kw):
    """The end-to-end webtext keep/reject gate (all signals fused).

    Runs TASK-based on warm workers (``pool.cached_stage``): the gate's
    per-worker state is one broadcast-set fetch + regex compiles, so a
    fresh actor pool's process-spawn wall (~1 s) would rival the whole
    stage at bench scale; the cached-instance task twin keeps the
    amortization without the spawn."""
    ev = eval_shingle_set(ds, kw.get("eval_mod", 10), kw.get("eval_rem", 7),
                          kw.get("k", 8))
    ev_ref = ray.put(ev)
    from search_engine_ray.pool import cached_stage

    return ds.map_batches(
        cached_stage(CorpusFilterBatch, ev_ref, **kw),
        batch_format="pyarrow", batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# Pattern redaction (PII scrub)

# RE2-compatible patterns, identical semantics in pyarrow (RE2) and DuckDB
# (also RE2): email, dotted-quad IP, plus a caller-supplied deny-term list.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def _deny_re(terms: tuple) -> str:
    return r"\b(?:" + "|".join(re.escape(t) for t in terms) + r")\b"


class RedactBatch:
    """PII / deny-list scrubbing: sequentially replace email, IPv4 and
    deny-term matches with typed placeholder tokens, counting matches of
    each pattern on the text state it actually saw (order matters — an
    earlier replacement can consume a later pattern's match, so counts
    are defined sequentially, and the SQL oracle nests its
    ``regexp_replace`` calls in the same order).

    Scale shape: stateless vectorized ``map_batches`` — Arrow
    ``replace_substring_regex`` / ``count_substring_regex`` C++ kernels,
    no shuffle, no per-row Python. The curation analogue of CCNet/C4's
    scrub passes (C4 removes pages by deny-list; production pipelines
    redact spans — both are one streaming regex pass)."""

    def __init__(self, deny_terms: tuple = ("javascript",)):
        self._steps = (
            (EMAIL_RE, "<EMAIL>", "n_email"),
            (IPV4_RE, "<IP>", "n_ip"),
            (_deny_re(deny_terms), "<TERM>", "n_denied"),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.coalesce(batch.column("text"), "")
        cols = {"doc_id": batch.column("doc_id")}
        for pat, rep, name in self._steps:
            cols[name] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64())
            text = pc.replace_substring_regex(text, pat, rep)
        cols["redacted_text"] = text
        return pa.table(cols)


def redact(ds, deny_terms: tuple = ("javascript",),
           batch_size: int = 1024):
    """Streaming redaction over a documents-shaped table."""
    return ds.map_batches(RedactBatch(deny_terms),
                          batch_format="pyarrow", batch_size=batch_size)


class UnicodeNormalizeBatch:
    """Unicode text normalization (the CCNet/OSCAR-style pre-pass,
    Wenzek 2020 §4.1 normalizes before hashing): canonical form
    (NFC/NFKC/NFD/NFKD), optional control + zero-width strip, optional
    horizontal-whitespace collapse. Pure per-batch map, zero shuffle;
    the translate table and regexes compile once per actor. Newlines
    are STRUCTURE (line dedup keys on them) and always survive."""

    # C0/C1 controls minus \n (kept) and \t (whitespace, handled by
    # collapse); plus the zero-width/BOM family that breaks dedup keys.
    _ZAP = dict.fromkeys(
        [c for c in range(0x20) if c not in (0x09, 0x0A)]
        + list(range(0x7F, 0xA0))
        + [0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF])

    def __init__(self, form: str = "NFKC", strip_controls: bool = True,
                 collapse_ws: bool = False):
        import re
        import unicodedata

        if form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError(f"unknown normalization form {form!r}")
        self._norm = unicodedata.normalize
        self._form = form
        self._zap = self._ZAP if strip_controls else None
        # horizontal runs only — [^\S\n] is "whitespace except newline"
        self._ws = re.compile(r"[^\S\n]+") if collapse_ws else None

    def _one(self, t: str) -> str:
        t = self._norm(self._form, t)
        if self._zap is not None:
            t = t.translate(self._zap)
        if self._ws is not None:
            t = self._ws.sub(" ", t)
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = [None if t is None else self._one(t) for t in texts]
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", pa.array(out, pa.string()))


def unicode_normalize(ds, form: str = "NFKC", strip_controls: bool = True,
                      collapse_ws: bool = False, batch_size: int = 1024):
    """Normalize the ``text`` column of a documents/pages-shaped table
    (all other columns pass through). Run BEFORE any hash-keyed dedup —
    visually-identical texts must hash identically."""
    return ds.map_batches(
        UnicodeNormalizeBatch(form, strip_controls, collapse_ws),
        batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# Corpus-GLOBAL exact line dedup (C4-style "one occurrence per distinct
# line across the whole corpus"; Raffel et al., arXiv:1910.10683 dedupe
# three-sentence spans corpus-wide — the same plan at line granularity).


class LineHashExplode:
    """docs -> one (doc_id, line_no, line_hash) row per NON-EMPTY line
    (1-indexed line_no = generate_subscripts; 61-bit md5 hash = the
    repo-wide md5_number_lower convention). Empty lines are structure,
    not content — they never dedup. No line TEXT leaves this stage: the
    winner shuffle moves 24 bytes/line, not the corpus."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_no, out_h = [], [], []
        for d, t in zip(ids, texts):
            if not t:
                continue
            for i, ln in enumerate(_LINE_SPLIT.split(t), start=1):
                if ln:
                    out_doc.append(d)
                    out_no.append(i)
                    out_h.append(_md5_low61(ln))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "line_no": pa.array(out_no, pa.int64()),
            "line_hash": pa.array(out_h, pa.int64()),
        })


def _line_removals(g: pd.DataFrame) -> pd.DataFrame:
    """One line-hash bucket: every occurrence except the first
    (min doc_id, then min line_no) is a removal."""
    g = g.sort_values(["line_hash", "doc_id", "line_no"], kind="mergesort")
    out = g.loc[g.duplicated("line_hash", keep="first"),
                ["doc_id", "line_no"]].copy()
    out["text"] = ""
    return out


def line_dedup(ds, num_buckets: int | None = None):
    """Corpus-global exact line dedup: each distinct non-empty line
    survives only at its FIRST occurrence (lowest doc_id, then lowest
    line_no — including repeats within one doc); emits (doc_id,
    clean_text, n_lines_kept, n_lines_removed).

    Scale shape: two exchanges. (1) hash triplets shuffle on the
    line-hash bucket — winners by sorted-dedup inside each bucket,
    removal pairs out; (2) removals UNION the docs themselves (tagged
    ``line_no = -1``) shuffle on the doc bucket, so each doc meets its
    removal set exactly once and is re-split/reassembled there. Line
    text never enters exchange (1); exchange (2) moves the corpus once —
    the minimum for a transform that rewrites every document.

    ``num_buckets`` defaults to auto (resolve_num_buckets against the
    RAW input, whose file lineage is still visible): 64 at test scale,
    growing so one doc bucket's reassembly task stays a few hundred MB
    at any corpus size.
    """
    from search_engine_ray.stages.agg import (
        bucketed_group_agg,
        resolve_num_buckets,
    )

    num_buckets = resolve_num_buckets(num_buckets, ds)
    hashes = ds.map_batches(LineHashExplode(), batch_format="pyarrow")
    removals = bucketed_group_agg(hashes, ["line_hash"], _line_removals,
                                  num_buckets)

    def tag_docs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.column("text")
        if pa.types.is_null(t.type):  # all-None block (schema inference)
            t = t.cast(pa.string())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "line_no": pa.array([-1] * len(batch), pa.int64()),
            "text": pc.coalesce(t, ""),
        })

    both = removals.union(ds.map_batches(tag_docs, batch_format="pyarrow"))
    return bucketed_group_agg(both, ["doc_id"], _line_reassemble,
                              num_buckets)


def _line_reassemble(g: pd.DataFrame) -> pd.DataFrame:
    """One doc bucket of the line-dedup exchange (2): docs tagged
    ``line_no == -1`` plus their removal pairs -> rebuilt docs.

    Vectorized (VERDICT r4 #3): the split itself stays a compiled-regex
    loop (inherent string work — pandas ``str.split(regex).explode()``
    alone costs more than the whole r4 kernel), but everything after is
    flat numpy: one ``np.fromiter`` flatten, arange line numbers, ONE
    ``np.isin`` over packed (doc-ordinal, line_no) int64 keys for the
    drop test (61-bit doc_ids are first factorized to bucket-local
    ordinals so the pack can't overflow), ``np.bincount`` for the
    kept/removed counts, and C-level ``"\\n".join`` over slices of the
    kept-line list.
    """
    docs = g[g["line_no"] == -1]
    rem = g.loc[g["line_no"] >= 0, ["doc_id", "line_no"]]
    dids = docs["doc_id"].reset_index(drop=True)
    lists = [_LINE_SPLIT.split(t) if t else []
             for t in docs["text"].to_numpy()]
    n_docs = len(lists)
    counts = np.fromiter((len(x) for x in lists), dtype=np.int64,
                         count=n_docs)
    n = int(counts.sum())
    flat = np.fromiter(itertools.chain.from_iterable(lists),
                       dtype=object, count=n)
    starts = np.cumsum(counts) - counts
    doc_ix = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    ln_no = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
    if len(rem) and n:
        # map removal doc_ids -> factorized VALUE codes (not row
        # ordinals: duplicate doc_id rows — tolerated by the r4 loop —
        # must each apply the same removal set); pack (code, line_no)
        # into one int64 key. code < bucket size and line_no <= max
        # lines/doc, so the product stays far below 2^63.
        codes, uniq = pd.factorize(dids.to_numpy())
        rem_ix = pd.Index(uniq).get_indexer(rem["doc_id"].to_numpy())
        rem_ln = rem["line_no"].to_numpy()
        ok = (rem_ix >= 0) & (rem_ln <= counts.max())
        mult = int(counts.max()) + 1
        kept_mask = ~np.isin(codes[doc_ix] * mult + ln_no,
                             rem_ix[ok] * mult + rem_ln[ok])
    else:
        kept_mask = np.ones(n, dtype=bool)
    kept_cnt = np.bincount(doc_ix[kept_mask], minlength=n_docs)
    fk = flat[kept_mask].tolist()
    bounds = np.concatenate(([0], np.cumsum(kept_cnt)))
    texts = ["\n".join(fk[bounds[i]:bounds[i + 1]])
             for i in range(n_docs)]
    return pd.DataFrame({
        "doc_id": dids,
        "clean_text": texts,
        "n_lines_kept": kept_cnt.astype(np.int64),
        "n_lines_removed": (counts - kept_cnt).astype(np.int64),
    })


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction


class DocTermTFBatch:
    """(doc_id, text) -> one (doc_id, term, tf) row per distinct term of
    each doc — the map-side combine, so the term shuffle moves per-doc
    DISTINCT terms, not the token stream."""

    def __init__(self):
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc: list = []
        out_term: list = []
        out_tf: list = []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            cnt = Counter(self._re.findall(t) if t else ())
            out_doc.extend([d] * len(cnt))
            out_term.extend(cnt.keys())
            out_tf.extend(cnt.values())
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
        })


def tfidf_topk(ds, k: int = 3, num_buckets: int | None = None):
    """Top-``k`` TF-IDF keywords per document (smoothed sklearn-style
    idf: ``tf * (ln((1+N)/(1+df)) + 1)``); emits (doc_id, term, tfidf,
    rank), rank 1..k by score desc then term asc.

    Scale shape: two exchanges over the per-doc DISTINCT (doc, term, tf)
    rows — (1) term-bucket shuffle where df is a group-local ``transform
    ('size')`` (each term's rows are co-located, so no separate df join
    materializes), (2) doc-bucket shuffle for the per-doc top-k. N docs
    comes from parquet metadata (``ds.count()`` — footer-only)."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    n_docs = ds.count()
    tf = ds.map_batches(DocTermTFBatch(), batch_format="pyarrow",
                        batch_size=1024)

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("term")["term"].transform("size").to_numpy()
        idf = np.log((1.0 + n_docs) / (1.0 + df)) + 1.0
        return g.assign(s=g["tf"].to_numpy() * idf)[["doc_id", "term", "s"]]

    scored = bucketed_group_agg(tf, ["term"], score_bucket, num_buckets)

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "s", "term"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.assign(rank=(g.groupby("doc_id").cumcount() + 1))
        g = g[g["rank"] <= k]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "term": g["term"].to_numpy(),
            "tfidf": np.array([round_half_away(v) for v in g["s"]]),
            "rank": g["rank"].to_numpy().astype(np.int64),
        })

    return bucketed_group_agg(scored, ["doc_id"], topk_bucket, num_buckets)


# ---------------------------------------------------------------------------
# Exact distributed quantiles over a bounded-domain metric

QUANTILE_PCTS = (25, 50, 75, 90, 99)


def length_quantiles(ds, num_buckets: int | None = None):
    """EXACT per-source quantiles of ``n_chars`` (p25/p50/p75/p90/p99,
    "disc" semantics: the value at 1-indexed position ceil(q*n) of the
    ascending sort). Quantile positions use INTEGER arithmetic
    ``(p*n + 99) // 100`` — ``ceil(0.9 * n)`` in doubles can land an
    ulp above an integer and skew the position by one.

    Scale shape: the shuffle carries (source, n_chars, count) HISTOGRAM
    rows — map-side combined per batch, volume bounded by the value
    domain (~1e6 distinct lengths at 100 TB), never by row count; the
    exact quantile then reads off the merged cumsum. For unbounded /
    continuous metrics the documented evolution is fixed-width binning
    or a mergeable sketch (t-digest) at the same plan shape."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["source", "n_chars"], as_index=False).size()
        return out.rename(columns={"size": "c"})

    hist = ds.map_batches(partial, batch_format="pandas", batch_size=4096)

    def q_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for s, sub in g.groupby("source"):
            sub = (sub.groupby("n_chars", as_index=False)["c"].sum()
                   .sort_values("n_chars"))
            vals = sub["n_chars"].to_numpy()
            cum = np.cumsum(sub["c"].to_numpy())
            n = int(cum[-1])
            qs = [int(vals[np.searchsorted(cum, (p * n + 99) // 100)])
                  for p in QUANTILE_PCTS]
            rows.append([s, n, *qs])
        return pd.DataFrame(rows, columns=[
            "source", "n_docs",
            *[f"p{p}" for p in QUANTILE_PCTS]])

    return bucketed_group_agg(hist, ["source"], q_bucket, num_buckets)


# ---------------------------------------------------------------------------
# Context-window chunking


class ChunkBatch:
    """Split each doc's token stream into fixed-size overlapping chunks
    (the context-window prep step of a training pipeline): chunk i
    covers tokens [i*stride, i*stride + max_tokens) with
    stride = max_tokens - overlap; the final chunk is the first one
    whose end reaches the doc's last token (no fully-redundant tail
    chunk); zero-token docs emit no chunks. Pure map — no shuffle; at
    100 TB the chunk stream feeds ``write_parquet`` partitioned by the
    input shard."""

    def __init__(self, max_tokens: int = 32, overlap: int = 8):
        assert 0 <= overlap < max_tokens
        self._re = token_regex()
        self._mx = max_tokens
        self._stride = max_tokens - overlap

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc: list = []
        out_cid: list = []
        out_n: list = []
        out_text: list = []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            toks = self._re.findall(t) if t else []
            n = len(toks)
            s, cid = 0, 0
            while n:
                e = min(s + self._mx, n)
                out_doc.append(d)
                out_cid.append(cid)
                out_n.append(e - s)
                out_text.append(" ".join(toks[s:e]))
                if e >= n:
                    break
                s += self._stride
                cid += 1
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "n_tokens_chunk": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
        })


def chunk_docs(ds, max_tokens: int = 32, overlap: int = 8,
               batch_size: int = 1024):
    """Streaming overlapping-window chunking over a documents table."""
    return ds.map_batches(ChunkBatch(max_tokens, overlap),
                          batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle (training-order mixing)

def corpus_shuffle(ds, n_shards: int = 8, n_ranges: int = 64,
                   seed: int = 13, batch_size: int = 2048):
    """Deterministic global shuffle for training-order mixing: every doc
    gets a pseudorandom 61-bit key (md5 of ``doc_id:shuf:seed`` — a
    pure per-row function, so the order reproduces across cluster
    sizes, retries and resumes, like ``stratified_sample``); shard =
    key mod ``n_shards``; ``pos`` = DENSE rank of the key within the
    shard (ties by doc_id).

    Scale shape — rank as a distributed PREFIX SCAN (the
    ``sequence_pack`` plan): keys also map to ``n_ranges`` contiguous
    key ranges; one pass counts (shard, range) cells (driver gets a
    bounded n_shards x n_ranges table and prefix-sums offsets); one
    bucketed pass sorts each cell locally and adds its offset. No
    global sort exchange; the materialized intermediate is 24-byte
    projected rows, never text."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    mod = 1 << 61
    range_div = -(-mod // n_ranges)  # ceil: range_id in [0, n_ranges)

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keys = np.fromiter(
            (_md5_low61(f"{d}:shuf:{seed}") for d in ids),
            dtype=np.int64, count=len(ids))
        srid = (keys % n_shards) * n_ranges + keys // range_div
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "skey": pa.array(keys),
            "srid": pa.array(srid.astype(np.int64)),
        })

    rows = ds.map_batches(key_rows, batch_format="pyarrow",
                          batch_size=batch_size).materialize()
    counts = rows.groupby("srid").count().to_pandas()
    counts = counts.sort_values("srid")  # shard-major, then key-range
    srids = counts["srid"].to_numpy(dtype=np.int64)
    c = counts["count()"].to_numpy(dtype=np.int64)
    # offsets restart at every shard boundary (srid // n_ranges)
    cum = np.concatenate(([0], np.cumsum(c)[:-1]))
    shard_of = srids // n_ranges
    first_in_shard = np.concatenate(
        ([True], shard_of[1:] != shard_of[:-1]))
    shard_base = np.maximum.accumulate(np.where(first_in_shard, cum, 0))
    offsets = dict(zip(srids.tolist(), (cum - shard_base).tolist()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for srid, gg in g.groupby("srid", sort=False):
            gg = gg.sort_values(["skey", "doc_id"], kind="mergesort")
            pos = offsets[int(srid)] + np.arange(len(gg), dtype=np.int64)
            parts.append(pd.DataFrame({
                "doc_id": gg["doc_id"].to_numpy(),
                "shard_id": np.full(len(gg), int(srid) // n_ranges,
                                    dtype=np.int64),
                "pos": pos,
            }))
        return pd.concat(parts) if parts else pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "shard_id": pd.Series(dtype="int64"),
            "pos": pd.Series(dtype="int64")})

    return bucketed_group_agg(rows, ["srid"], per_bucket)


def corpus_mix(ds, weights: dict[str, float], token_budget: int,
               seed: int = 13, n_ranges: int = 64,
               batch_size: int = 2048, bpe_merges=None):
    """Final training-mix assembly: fill a global token budget from each
    source in proportion to ``weights`` — per source, docs are taken in
    deterministic pseudorandom order (md5 of ``doc_id:mix:seed``, a pure
    per-row key that replays across cluster sizes and resumes) until the
    source's token target ``floor(weight * token_budget)`` is reached;
    a doc is kept iff its INCLUSIVE running token sum fits the target
    (documents are never split). Sources absent from ``weights`` are
    dropped. Returns (doc_id, source, n_tokens, cum_tokens).

    This is the budgeted complement of ``stratified_sample`` (fixed keep
    RATES, no global state): mixing recipes are usually expressed as
    token shares of a target corpus size, which needs the per-source
    prefix scan. Scale shape is exactly ``sequence_pack``'s two-pass
    distributed scan, partitioned by (source, key range): pass 1 counts
    per-cell token totals (bounded sources x n_ranges table on the
    driver), pass 2 adds each cell's offset and filters — no global
    sort, intermediates are 32-byte projected rows, never text. SQL
    oracle: ``sum() OVER (PARTITION BY source ORDER BY key, doc_id)``.
    """
    from search_engine_ray.stages.agg import bucketed_group_agg

    mod = 1 << 61
    range_div = -(-mod // n_ranges)  # ceil: range_id in [0, n_ranges)
    targets = {s: int(w * token_budget) for s, w in weights.items()}
    counter = _token_counter(bpe_merges)

    def key_rows(batch: pa.Table) -> pa.Table:
        re_ = token_regex()
        keep = np.fromiter(
            (s in targets for s in batch.column("source").to_pylist()),
            dtype=bool, count=batch.num_rows)
        batch = batch.filter(pa.array(keep))
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keys = np.fromiter(
            (_md5_low61(f"{d}:mix:{seed}") for d in ids),
            dtype=np.int64, count=len(ids))
        n = counter(texts, re_)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "n_tokens": pa.array(n),
            "mkey": pa.array(keys),
            "range_id": pa.array((keys // range_div).astype(np.int64)),
        })

    rows = ds.map_batches(key_rows, batch_format="pyarrow",
                          batch_size=batch_size).materialize()
    # pass 1: per-(source, range) token totals -> per-cell offsets
    sums = (rows.groupby(["source", "range_id"]).sum("n_tokens")
            .to_pandas().sort_values(["source", "range_id"]))
    offsets: dict[tuple[str, int], int] = {}
    for src, g in sums.groupby("source", sort=False):
        tot = g["sum(n_tokens)"].to_numpy(dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum(tot)[:-1]))
        for rid, off in zip(g["range_id"].astype("int64"), offs):
            offsets[(src, int(rid))] = int(off)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for (src, rid), gg in g.groupby(["source", "range_id"],
                                        sort=False):
            base = offsets[(src, int(rid))]
            target = targets[src]
            if base >= target:  # the whole cell is past the budget
                continue
            gg = gg.sort_values(["mkey", "doc_id"], kind="mergesort")
            nt = gg["n_tokens"].to_numpy(dtype=np.int64)
            cum = base + np.cumsum(nt)
            keep = cum <= target
            if not keep.any():
                continue
            parts.append(pd.DataFrame({
                "doc_id": gg["doc_id"].to_numpy()[keep],
                "source": src,
                "n_tokens": nt[keep],
                "cum_tokens": cum[keep],
            }))
        return pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "source": pd.Series(dtype="str"),
                          "n_tokens": pd.Series(dtype="int64"),
                          "cum_tokens": pd.Series(dtype="int64")})

    return bucketed_group_agg(rows, ["source", "range_id"], per_bucket)
