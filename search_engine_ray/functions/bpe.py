"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units", ACL —
the published algorithm; no reference-repo counterpart, this is part of
the LLM-training-data operator family).

The standard scale decomposition: the CORPUS is touched exactly once
(map-side-combined word counts, one vocabulary-sized bucketed
aggregate — the same shape as webtext._unigram_model); every merge
iteration then runs over the WORD TABLE, which Heaps' law keeps
corpus-sublinear (tens of millions of rows at web scale, not 10^12).

Two merge-loop tiers, proven identical (tests):

* ``local``  — driver-side incremental-statistics loop (Sennrich's
  published optimization: after merging pair P only words containing P
  update pair stats, via a pair -> words inverted index). Default below
  ``local_max_words`` distinct words.
* ``distributed`` — the word table stays a Ray Dataset; each iteration
  is one map-side pair count + vocabulary-sized bucketed aggregate
  (argmax on the driver) + one broadcast merge applied by map_batches,
  materialized per iteration so lineage does not recompute k times.
  The per-iteration exchange moves (pair, count) rows — bounded by the
  word table's distinct adjacent pairs, never the corpus.

Determinism: ties on pair count break to the lexicographically
SMALLEST (left, right) pair, making the merge sequence a pure function
of the word counts (and therefore of the corpus) at any tier, any
cluster size.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa

from search_engine_ray.functions.textstats import token_regex
from search_engine_ray.pool import actor_pool_size

END = "</w>"  # end-of-word marker (Sennrich §3.2)


# --- shared pure kernels ---------------------------------------------------

def merge_word(sym: tuple, pair: tuple[str, str]) -> tuple:
    """Non-overlapping left-to-right replacement of adjacent (l, r) by
    l+r — the published replacement rule."""
    left, right = pair
    out = []
    i = 0
    n = len(sym)
    while i < n:
        if i < n - 1 and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _pair_counts(words: dict, word_counts: dict) -> Counter:
    c: Counter = Counter()
    for w, sym in words.items():
        cnt = word_counts[w]
        for p in zip(sym, sym[1:]):
            c[p] += cnt
    return c


def _best_pair(stats) -> tuple[tuple[str, str], int] | None:
    if not stats:
        return None
    pair, cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
    return pair, cnt


def reference_learn_bpe(word_counts: dict[str, int], k_merges: int,
                        min_count: int = 2) -> list[tuple[str, str, int]]:
    """Literal full-recount implementation (the paper's Algorithm 1
    verbatim): recompute every pair count each iteration. Quadratic —
    the test anchor for both production tiers, never the scale path."""
    words = {w: tuple(w) + (END,) for w in word_counts}
    merges = []
    for _ in range(k_merges):
        best = _best_pair(_pair_counts(words, word_counts))
        if best is None or best[1] < min_count:
            break
        (left, right), cnt = best
        merges.append((left, right, cnt))
        words = {w: merge_word(s, (left, right)) for w, s in words.items()}
    return merges


def learn_bpe_local(word_counts: dict[str, int], k_merges: int,
                    min_count: int = 2) -> list[tuple[str, str, int]]:
    """Incremental-stats merge loop: stats and a pair -> words index
    update only for words containing the merged pair (each zip
    occurrence contributes word-count once, so the update equals the
    full-recount diff exactly — pinned against reference_learn_bpe)."""
    words = {w: tuple(w) + (END,) for w in word_counts}
    stats: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for w, sym in words.items():
        c = word_counts[w]
        for p in zip(sym, sym[1:]):
            stats[p] += c
            index[p].add(w)
    merges = []
    for _ in range(k_merges):
        best = _best_pair(stats)
        if best is None or best[1] < min_count:
            break
        pair, cnt = best
        merges.append((pair[0], pair[1], cnt))
        for w in list(index.pop(pair, ())):
            old = words[w]
            new = merge_word(old, pair)
            c = word_counts[w]
            for p in zip(old, old[1:]):
                stats[p] -= c
                if stats[p] <= 0:
                    del stats[p]
                index[p].discard(w)
            for p in zip(new, new[1:]):
                stats[p] += c
                index[p].add(w)
            words[w] = new
        # a merged pair cannot reappear (l+r replaces every adjacency)
        stats.pop(pair, None)
    return merges


# --- corpus pass: word counts ----------------------------------------------

class WordCountBatch:
    """(text) -> map-side-combined (word, c) partials."""

    def __init__(self):
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        findall = self._re.findall
        for t in batch.column("text").to_pylist():
            cnt.update(findall(t) if t else ())
        return pa.table({
            "word": pa.array(list(cnt.keys()), pa.string()),
            "c": pa.array(np.fromiter(cnt.values(), dtype=np.int64,
                                      count=len(cnt))),
        })


def corpus_word_counts(ds, num_buckets: int = 64):
    """ONE pass over the corpus -> word-table Dataset (word, c). The
    exchange carries map-side-combined (word, partial) rows only."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    partials = ds.map_batches(WordCountBatch(), batch_format="pyarrow",
                              batch_size=2048)
    return bucketed_group_agg(
        partials, ["word"],
        lambda g: g.groupby("word", as_index=False).agg(c=("c", "sum")),
        num_buckets=num_buckets,
    )


# --- distributed merge loop -------------------------------------------------

class _SymbolPairCountBatch:
    """(symbols: list<str>, c) -> map-side-combined (left, right, c)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for sym, c in zip(batch.column("symbols").to_pylist(),
                          batch.column("c").to_pylist()):
            for p in zip(sym, sym[1:]):
                cnt[p] += c
        ls, rs = ([p[0] for p in cnt], [p[1] for p in cnt])
        return pa.table({
            "left": pa.array(ls, pa.string()),
            "right": pa.array(rs, pa.string()),
            "c": pa.array(np.fromiter(cnt.values(), dtype=np.int64,
                                      count=len(cnt))),
        })


def _apply_merge_batch(batch: pa.Table, *, left: str,
                       right: str) -> pa.Table:
    syms = [
        list(merge_word(tuple(s), (left, right)))
        for s in batch.column("symbols").to_pylist()
    ]
    return pa.table({
        "symbols": pa.array(syms, pa.list_(pa.string())),
        "c": batch.column("c"),
    })


def learn_bpe_distributed(word_ds, k_merges: int, min_count: int = 2,
                          num_buckets: int = 16
                          ) -> list[tuple[str, str, int]]:
    """Merge loop over a word-table Dataset: per iteration one pair-count
    aggregate (vocabulary-bounded exchange) + one broadcast merge map.
    ``materialize()`` per iteration keeps lineage O(1), not O(k)."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    ds = word_ds.map_batches(
        lambda b: pa.table({
            "symbols": pa.array(
                [list(w) + [END] for w in b.column("word").to_pylist()],
                pa.list_(pa.string())),
            "c": b.column("c"),
        }),
        batch_format="pyarrow",
    ).materialize()
    merges: list[tuple[str, str, int]] = []
    for _ in range(k_merges):
        pairs = bucketed_group_agg(
            ds.map_batches(_SymbolPairCountBatch(),
                           batch_format="pyarrow"),
            ["left", "right"],
            lambda g: g.groupby(["left", "right"], as_index=False)
            .agg(c=("c", "sum")),
            num_buckets=num_buckets,
        ).to_pandas()
        if not len(pairs):
            break
        pairs = pairs.sort_values(
            ["c", "left", "right"], ascending=[False, True, True],
            kind="mergesort")
        top = pairs.iloc[0]
        if int(top["c"]) < min_count:
            break
        left, right = str(top["left"]), str(top["right"])
        merges.append((left, right, int(top["c"])))
        ds = ds.map_batches(
            _apply_merge_batch, batch_format="pyarrow",
            fn_kwargs={"left": left, "right": right},
        ).materialize()
    return merges


# --- entry points ------------------------------------------------------------

LOCAL_MAX_WORDS = 2_000_000  # ~100 MB of Python word/state at the cap


def learn_bpe(ds, k_merges: int = 50, min_count: int = 2,
              tier: str = "auto", num_buckets: int = 64) -> pa.Table:
    """Train BPE merges over a documents Dataset (``text`` column).
    Returns (rank, left, right, pair_count) in merge order. Tiers give
    IDENTICAL merges (test-pinned); ``auto`` picks by distinct-word
    count."""
    word_ds = corpus_word_counts(ds, num_buckets=num_buckets)
    if tier == "auto":
        tier = ("local" if word_ds.count() <= LOCAL_MAX_WORDS
                else "distributed")
    if tier == "local":
        # word table (NOT the corpus) comes to the driver — the same
        # vocabulary-sized materialization as the broadcast unigram LM
        wc = {}
        for b in word_ds.iter_batches(batch_format="pyarrow"):
            wc.update(zip(b.column("word").to_pylist(),
                          b.column("c").to_pylist()))
        merges = learn_bpe_local(wc, k_merges, min_count=min_count)
    elif tier == "distributed":
        merges = learn_bpe_distributed(word_ds, k_merges,
                                       min_count=min_count)
    else:
        raise ValueError(f"unknown tier {tier!r}")
    return pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64()),
    })


# --- encoding ---------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]
                ) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE
    encoder): repeatedly merge the present pair with the smallest merge
    rank until none applies."""
    sym: tuple = tuple(word) + (END,)
    while len(sym) > 1:
        best = None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        sym = merge_word(sym, best[1])
    return list(sym)


class BpeEncodeBatch:
    """Per-doc BPE token stats under a trained merge table: the ranks
    dict builds once per actor, distinct words LRU-memoize their
    encoding (zipf reuse makes the memo hit rate very high)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self._re = token_regex()
        self._ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self._memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        findall = self._re.findall
        memo = self._memo
        ranks = self._ranks
        n_words = np.zeros(len(batch), dtype=np.int64)
        n_pieces = np.zeros(len(batch), dtype=np.int64)
        for i, t in enumerate(batch.column("text").to_pylist()):
            toks = findall(t) if t else []
            n_words[i] = len(toks)
            total = 0
            for w in toks:
                np_ = memo.get(w)
                if np_ is None:
                    np_ = len(encode_word(w, ranks))
                    if len(memo) < 1_000_000:
                        memo[w] = np_
                total += np_
            n_pieces[i] = total
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words),
            "n_bpe_pieces": pa.array(n_pieces),
        })


def bpe_encode_stats(ds, merges_table: pa.Table, batch_size: int = 1024):
    """(doc_id, n_words, n_bpe_pieces) per doc under a trained merge
    table — the token-budget estimator a mix/pack pipeline needs."""
    merges = list(zip(merges_table.column("left").to_pylist(),
                      merges_table.column("right").to_pylist()))
    return ds.map_batches(
        BpeEncodeBatch, fn_constructor_args=(merges,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool_size(),
    )
