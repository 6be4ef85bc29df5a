"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS, arXiv:2302.03169). Selects raw web documents whose hashed
n-gram distribution looks like a small TARGET corpus:

1. features: unigrams + bigrams hashed into ``n_buckets`` buckets
   (the paper's hashed n-gram parametrization) with the repo-wide
   md5_number_lower-low-61-bit convention, so every decision replays
   exactly in SQL;
2. two bag-of-buckets models (target = the held-out eval slice,
   doc_id % eval_mod == eval_rem, as in decontaminate; raw = the rest),
   add-one smoothed;
3. per-doc log importance weight  sum_f [ln p_target(f) - ln p_raw(f)];
4. Gumbel-top-k resampling: key = log_iw + Gumbel(0,1), with the Gumbel
   draw derived deterministically from md5(doc_id) — sampling without
   replacement proportional to the importance weights (Gumbel-max
   trick), reproducible across cluster sizes and retries.

Scale shape: ONE corpus read trains both models (map-side-combined
bucket counts, a ``n_buckets``-sized aggregate — n_buckets is 1e4-1e5,
always broadcastable); ONE corpus read scores documents against the
broadcast log-ratio array; selection needs only per-block top-k
candidate lists on the driver (blocks x k rows), never a global sort.
The per-doc weight table is materialized between the two selection
passes — per-doc scalar rows, ~1000x smaller than the corpus; a
production run would write it to parquet as a resumable artifact
instead (the ``dsir`` CLI job does exactly that).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from search_engine_ray.functions.textstats import round_half_away, token_regex
from search_engine_ray.functions.webtext import _MOD61, _md5_low61


def _hashed_features(toks: list[str], n_buckets: int) -> list[int]:
    """Unigram + bigram buckets (bigram key = w1 + ' ' + w2, the
    repo-wide composite convention)."""
    out = [_md5_low61(t) % n_buckets for t in toks]
    out.extend(_md5_low61(a + " " + b) % n_buckets
               for a, b in zip(toks, toks[1:]))
    return out


def gumbel_of_doc(doc_id: int) -> float:
    """Deterministic Gumbel(0,1) draw from md5(doc_id): u in (0,1) from
    the low-61-bit hash, g = -ln(-ln(u))."""
    u = (_md5_low61(str(doc_id)) + 1) / (_MOD61 + 1)
    return -math.log(-math.log(u))


class DsirCountBatch:
    """(doc_id, text) -> map-side-combined (bucket, c_target, c_raw)
    partial feature counts, classed by the holdout rule."""

    def __init__(self, n_buckets: int, eval_mod: int, eval_rem: int):
        self._re = token_regex()
        self._b = n_buckets
        self._mod, self._rem = eval_mod, eval_rem

    def __call__(self, batch: pa.Table) -> pa.Table:
        ct: Counter = Counter()
        cr: Counter = Counter()
        findall = self._re.findall
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            toks = findall(t) if t else []
            feats = _hashed_features(toks, self._b)
            (ct if did % self._mod == self._rem else cr).update(feats)
        buckets = sorted(set(ct) | set(cr))
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "c_target": pa.array([ct.get(b, 0) for b in buckets],
                                 pa.int64()),
            "c_raw": pa.array([cr.get(b, 0) for b in buckets], pa.int64()),
        })


def _dsir_model(ds, n_buckets: int, eval_mod: int, eval_rem: int
                ) -> np.ndarray:
    """Train both bag-of-buckets models in one corpus read -> the dense
    per-bucket log importance ratio  ln p_target(b) - ln p_raw(b)  with
    add-one smoothing (length n_buckets — always broadcast-sized)."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    partials = ds.map_batches(
        DsirCountBatch(n_buckets, eval_mod, eval_rem),
        batch_format="pyarrow", batch_size=1024)
    counts = bucketed_group_agg(
        partials, ["bucket"],
        lambda g: g.groupby("bucket", as_index=False).agg(
            c_target=("c_target", "sum"), c_raw=("c_raw", "sum")),
        num_buckets=16,
    ).to_pandas()
    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    if len(counts) and "bucket" in counts.columns:
        idx = counts["bucket"].to_numpy(dtype=np.int64)
        ct[idx] = counts["c_target"].to_numpy(dtype=np.int64)
        cr[idx] = counts["c_raw"].to_numpy(dtype=np.int64)
    t_tot, r_tot = float(ct.sum()), float(cr.sum())
    return (np.log(ct + 1.0) - math.log(t_tot + n_buckets)
            - np.log(cr + 1.0) + math.log(r_tot + n_buckets))


class DsirWeightBatch:
    """Per-doc DSIR signals against the broadcast log-ratio array:
    (doc_id, is_target, n_feats, log_iw, gumbel_key). log_iw sums the
    doc's per-feature ratios (one vectorized gather); gumbel_key =
    log_iw + deterministic Gumbel(doc_id). 6-dp rounding as everywhere
    (SQL replay)."""

    def __init__(self, ratio_ref, n_buckets: int, eval_mod: int,
                 eval_rem: int):
        self._re = token_regex()
        self._ratio = ray.get(ratio_ref)
        self._b = n_buckets
        self._mod, self._rem = eval_mod, eval_rem

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n = len(ids)
        n_feats = np.zeros(n, dtype=np.int64)
        log_iw = np.zeros(n)
        keys = np.zeros(n)
        findall = self._re.findall
        for i, (did, t) in enumerate(zip(ids, texts)):
            toks = findall(t) if t else []
            feats = _hashed_features(toks, self._b)
            n_feats[i] = len(feats)
            if feats:
                log_iw[i] = float(
                    self._ratio[np.asarray(feats, dtype=np.int64)].sum())
            keys[i] = log_iw[i] + gumbel_of_doc(did)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "is_target": pa.array(
                [1 if d % self._mod == self._rem else 0 for d in ids],
                pa.int64()),
            "n_feats": pa.array(n_feats),
            "log_iw": pa.array([round_half_away(x) for x in log_iw],
                               pa.float64()),
            "gumbel_key": pa.array([round_half_away(x) for x in keys],
                                   pa.float64()),
        })


def dsir_weights(ds, n_buckets: int = 4096, eval_mod: int = 10,
                 eval_rem: int = 7, batch_size: int = 1024,
                 model_ds=None):
    """Per-doc DSIR weight table (lazy Dataset). ``model_ds``: train the
    target/raw models on a DIFFERENT corpus than the one being scored —
    the composition case (prepare: the quality filter already dropped
    the holdout slice from the scored corpus, so the models must train
    on the pre-filter input, which still contains it)."""
    ratio_ref = ray.put(_dsir_model(model_ds if model_ds is not None
                                    else ds, n_buckets, eval_mod,
                                    eval_rem))
    from search_engine_ray.pool import cached_stage

    # warm-task twin of the actor pool: state = one broadcast fetch
    return ds.map_batches(
        cached_stage(DsirWeightBatch, ratio_ref, n_buckets, eval_mod,
                     eval_rem),
        batch_format="pyarrow", batch_size=batch_size,
    )


def _block_topk(batch: pa.Table, *, k: int) -> pa.Table:
    """Per-block Gumbel-top-k candidates (raw docs only)."""
    raw = batch.filter(pa.compute.equal(batch.column("is_target"), 0))
    keys = raw.column("gumbel_key").to_numpy(zero_copy_only=False)
    ids = raw.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -keys))[:k]
    return raw.select(["doc_id", "gumbel_key"]).take(
        pa.array(order, pa.int64()))


def dsir_select(ds, k: int, n_buckets: int = 4096, eval_mod: int = 10,
                eval_rem: int = 7, model_ds=None):
    """Full DSIR selection: weight table + Gumbel-top-k selected flag.
    Returns the per-doc table with a ``selected`` column (exactly
    min(k, n_raw) ones; target docs never selected). The global top-k
    comes from per-block candidate lists (blocks x k rows on the
    driver), then ONE broadcast id-set flag pass — no global sort."""
    w = dsir_weights(ds, n_buckets=n_buckets, eval_mod=eval_mod,
                     eval_rem=eval_rem, model_ds=model_ds).materialize()
    cand = w.map_batches(_block_topk, batch_format="pyarrow",
                         fn_kwargs={"k": k}).take_all()
    keys = np.array([c["gumbel_key"] for c in cand])
    ids = np.array([c["doc_id"] for c in cand], dtype=np.int64)
    top = np.lexsort((ids, -keys))[:k]
    sel_ref = ray.put(frozenset(int(i) for i in ids[top]))

    def flag(batch: pa.Table, *, ref=sel_ref) -> pa.Table:
        sel = ray.get(ref)
        return batch.append_column("selected", pa.array(
            [1 if d in sel else 0
             for d in batch.column("doc_id").to_pylist()], pa.int64()))

    return w.map_batches(flag, batch_format="pyarrow")
