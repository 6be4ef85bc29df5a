"""Dataset profiling: per-column statistics over any Arrow-schema table
(the schema-audit pass run before pointing a 100 TB pipeline at new
data).

Emits one row per column: row/null counts, EXACT distinct count, and
min/max (numeric columns as 6-dp doubles — timestamps as epoch-us —
string columns lexicographic).

Scale shape: counts and min/max are MERGEABLE per-batch partials (one
tiny column-count-sized aggregate); the exact distinct count is the only
shuffle — (column, value-key) rows deduplicated with the coarse-bucket
pattern, volume = table cells, the price of exactness (the documented
approximate evolution is a per-column HLL sketch merged in the partial
pass, zero shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from search_engine_ray.functions.textstats import round_half_away
from search_engine_ray.stages.agg import bucketed_group_agg

_NUM_KINDS = "iuf"


def _col_frame(batch: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for c in batch.columns:
        col = batch[c]
        if np.issubdtype(col.dtype, np.datetime64):
            col = col.astype("datetime64[us]").astype("int64")
        nn = int(col.isna().sum())
        vals = col.dropna()
        if col.dtype.kind in _NUM_KINDS:
            mn = float(vals.min()) if len(vals) else np.nan
            mx = float(vals.max()) if len(vals) else np.nan
            ms, xs = None, None
        else:
            mn, mx = np.nan, np.nan
            ms = str(vals.min()) if len(vals) else None
            xs = str(vals.max()) if len(vals) else None
        rows.append((c, len(col), nn, mn, mx, ms, xs))
    return pd.DataFrame(rows, columns=[
        "column", "n", "n_null", "min_num", "max_num",
        "min_str", "max_str"])


def _distinct_rows(batch: pd.DataFrame) -> pd.DataFrame:
    frames = []
    for c in batch.columns:
        col = batch[c]
        if np.issubdtype(col.dtype, np.datetime64):
            col = col.astype("datetime64[us]").astype("int64")
        u = col.dropna().astype(str).unique()
        frames.append(pd.DataFrame({"column": c, "v": u}))
    return pd.concat(frames) if frames else pd.DataFrame(
        {"column": pd.Series(dtype="str"), "v": pd.Series(dtype="str")})


def profile_table(ds, num_buckets: int = 64):
    """Profile every column of ``ds``; returns one row per column."""
    parts = ds.map_batches(_col_frame, batch_format="pandas",
                           batch_size=4096)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for c, gg in g.groupby("column"):
            mn = gg["min_num"].dropna()
            mx = gg["max_num"].dropna()
            ms = gg["min_str"].dropna()
            xs = gg["max_str"].dropna()
            out.append((
                c, int(gg["n"].sum()), int(gg["n_null"].sum()),
                round_half_away(float(mn.min())) if len(mn) else np.nan,
                round_half_away(float(mx.max())) if len(mx) else np.nan,
                ms.min() if len(ms) else None,
                xs.max() if len(xs) else None))
        return pd.DataFrame(out, columns=[
            "column", "n", "n_null", "min_num", "max_num",
            "min_str", "max_str"])

    merged = bucketed_group_agg(parts, ["column"], merge,
                                num_buckets).to_pandas()

    uniq = ds.map_batches(_distinct_rows, batch_format="pandas",
                          batch_size=4096)
    counts = bucketed_group_agg(
        uniq, ["column", "v"],
        lambda g: g.drop_duplicates(["column", "v"])
        .groupby("column", as_index=False).agg(nd=("v", "size")),
        num_buckets).to_pandas()
    counts = counts.groupby("column", as_index=False)["nd"].sum()

    out = merged.merge(counts, on="column", how="left")
    out["n_distinct"] = out["nd"].fillna(0).astype("int64")
    out = out.drop(columns=["nd"]).sort_values("column") \
        .reset_index(drop=True)
    return out[["column", "n", "n_null", "n_distinct",
                "min_num", "max_num", "min_str", "max_str"]]


# ---------------------------------------------------------------------------
# Approximate distinct (HyperLogLog) — the zero-shuffle evolution of the
# exact distinct count above (Flajolet et al., HLL; the ++ bias table is
# unnecessary at the error budget documented here).

HLL_P = 12  # 4096 registers -> ~1.6% standard error, 4 KiB per sketch


def _hll_registers(col: pd.Series, p: int = HLL_P) -> np.ndarray:
    """One batch's HLL registers for a column (deterministic 64-bit
    value hash; rank via exact float64 frexp — w < 2^52 is exactly
    representable)."""
    h = pd.util.hash_pandas_object(col.dropna().astype(str),
                                   index=False).to_numpy()
    m = 1 << p
    regs = np.zeros(m, dtype=np.int8)
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
    _, e = np.frexp(w)
    rank = np.where(w > 0, (64 - p) - e + 1, 64 - p + 1).astype(np.int8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # linear counting small-range fix
    return float(e)


def approx_distinct(ds, column: str, p: int = HLL_P) -> float:
    """Estimate the column's distinct count with NO shuffle: each batch
    emits its 2^p-register sketch (mergeable by elementwise max), the
    driver folds the batch sketches. At 100 TB the fold itself nests
    (sketches are 4 KiB — max-merge in a tree of map_batches), but the
    driver fold is already O(batches), never O(rows)."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"regs": [_hll_registers(df[column], p)
                                      .tobytes()]})

    parts = ds.map_batches(sketch, batch_format="pandas",
                           batch_size=8192).take_all()
    merged = np.zeros(1 << p, dtype=np.int8)
    for r in parts:
        merged = np.maximum(merged, np.frombuffer(r["regs"], dtype=np.int8))
    return _hll_estimate(merged)


# ---------------------------------------------------------------------------
# Heavy hitters (Count-Min Sketch + local candidates) — the mergeable
# zero-shuffle companion to the HLL sketch: approximate top-k most
# frequent values of a column (Cormode & Muthukrishnan, CMS; the
# candidate union makes it a distributed Misra-Gries-style top-k).

CMS_WIDTH = 2048
CMS_DEPTH = 4
_CMS_MOD = (1 << 61) - 1


def _cms_params(depth: int, seed: int = 23):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _CMS_MOD, size=depth).astype(np.int64)
    b = rng.integers(0, _CMS_MOD, size=depth).astype(np.int64)
    return a, b


def _cms_rows(h: np.ndarray, a: np.ndarray, b: np.ndarray,
              width: int) -> np.ndarray:
    """(depth, n) bucket indices from one 64-bit base hash per value —
    pairwise-independent row hashes h_i(x) = (a_i*h + b_i) mod p mod w.
    int64 wrap-around multiply is deterministic and well-mixed here
    (the base hash is already uniform 64-bit)."""
    hv = h.view(np.int64) if h.dtype != np.int64 else h
    return ((a[:, None] * hv[None, :] + b[:, None]) % _CMS_MOD) % width


def _cms_batch(col: pd.Series, a: np.ndarray, b: np.ndarray,
               width: int, n_cand: int):
    """One batch's (depth x width) CMS counts + its local top candidates
    (value, local_count) — both mergeable (elementwise +, union)."""
    vals = col.dropna().astype(str)
    depth = len(a)
    cms = np.zeros((depth, width), dtype=np.int64)
    if not len(vals):
        return cms, pd.Series(dtype="int64")
    vc = vals.value_counts()  # local exact counts, vocab-sized
    uh = pd.util.hash_pandas_object(vc.index.to_series().reset_index(
        drop=True), index=False).to_numpy()
    rows = _cms_rows(uh, a, b, width)
    cnts = vc.to_numpy()
    for d in range(depth):
        np.add.at(cms[d], rows[d], cnts)
    return cms, vc.head(n_cand)


def heavy_hitters(ds, column: str, k: int = 20, width: int = CMS_WIDTH,
                  depth: int = CMS_DEPTH, candidates_per_batch: int = 128,
                  batch_size: int = 8192) -> pd.DataFrame:
    """Approximate top-k most frequent values with NO shuffle: each batch
    emits a (depth x width) CMS partial (mergeable by +) and its local
    top candidates (union-mergeable); the driver folds the sketches,
    re-estimates every candidate from the MERGED sketch (min over depth
    rows — a one-sided overestimate), and returns the top k.

    Guarantees: est_count >= true count always (CMS never undercounts);
    a true heavy hitter is missed only if it falls outside the local
    top-``candidates_per_batch`` of EVERY batch — impossible once its
    global share exceeds batches' local tail mass (the usual union-of-
    local-top-k argument). The exact twin for validation is the
    coarse-bucket groupby count (see tests); at 100 TB the fold nests
    in a tree exactly like approx_distinct's."""
    a, b = _cms_params(depth)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        cms, cand = _cms_batch(df[column], a, b, width,
                               candidates_per_batch)
        return pd.DataFrame({
            "cms": [cms.tobytes()],
            "cand_v": [list(cand.index)],
            "cand_n": [cand.to_numpy(dtype=np.int64)],
        })

    parts = ds.map_batches(sketch, batch_format="pandas",
                           batch_size=batch_size).take_all()
    merged = np.zeros((depth, width), dtype=np.int64)
    cand: set[str] = set()
    for r in parts:
        merged += np.frombuffer(r["cms"], dtype=np.int64).reshape(
            depth, width)
        cand.update(r["cand_v"])
    if not cand:
        return pd.DataFrame({"value": pd.Series(dtype="str"),
                             "est_count": pd.Series(dtype="int64")})
    cl = sorted(cand)
    uh = pd.util.hash_pandas_object(pd.Series(cl), index=False).to_numpy()
    rows = _cms_rows(uh, a, b, width)
    est = merged[np.arange(depth)[:, None], rows].min(axis=0)
    out = pd.DataFrame({"value": cl, "est_count": est})
    return (out.sort_values(["est_count", "value"],
                            ascending=[False, True])
            .head(k).reset_index(drop=True))


# ---------------------------------------------------------------------------
# t-digest quantile sketch — the mergeable companion for UNBOUNDED /
# continuous metrics, where length_quantiles' exact (value, count)
# histogram plan stops working (the histogram is only bounded when the
# value domain is). Dunning & Ertl, "Computing Extremely Accurate
# Quantiles Using t-Digests" (arXiv:1902.04023): centroids sized by the
# asin scale function k(q) = delta/(2pi) * asin(2q - 1), which keeps
# centroids tiny near q=0/1 (accurate tails) and coarse mid-range.

TDIGEST_DELTA = 200


class TDigest:
    """Merging t-digest: bounded state (<= ~delta centroids + exact
    min/max), deterministic (compression is a greedy left-to-right walk
    over mean-sorted centroids — no RNG), and MERGEABLE (merge =
    concatenate + recompress), so per-batch partials fold in any tree
    shape with no shuffle, exactly like the HLL registers above."""

    __slots__ = ("delta", "means", "weights", "vmin", "vmax")

    def __init__(self, delta: int = TDIGEST_DELTA):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf

    @staticmethod
    def _k(q: np.ndarray, delta: int) -> np.ndarray:
        return delta / (2 * np.pi) * np.arcsin(2 * q - 1)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="mergesort")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w, w_before = means[0], weights[0], 0.0
        for m, w in zip(means[1:], weights[1:]):
            q0 = w_before / total
            q2 = (w_before + cur_w + w) / total
            if (self._k(np.float64(q2), self.delta)
                    - self._k(np.float64(q0), self.delta)) <= 1.0:
                # weighted-mean absorb keeps the centroid the exact mean
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_before += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not v.size:
            return self
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._compress(np.concatenate([self.means, v]),
                       np.concatenate([self.weights,
                                       np.ones(v.size)]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.weights.size:
            self.vmin = min(self.vmin, other.vmin)
            self.vmax = max(self.vmax, other.vmax)
            self._compress(np.concatenate([self.means, other.means]),
                           np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q: float) -> float:
        """Piecewise-linear interpolation between centroid midpoints,
        clamped to the exact stored min/max (the standard estimator)."""
        if not self.weights.size:
            return float("nan")
        total = self.weights.sum()
        if total == 1 or self.weights.size == 1:
            return float(self.means[0]) if 0 < q < 1 else (
                self.vmin if q <= 0 else self.vmax)
        t = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if t <= cum[0]:  # below the first midpoint: lerp from exact min
            return self.vmin + max(0.0, t / cum[0]) * (
                float(self.means[0]) - self.vmin)
        if t >= cum[-1]:
            rem = total - cum[-1]
            if rem <= 0:
                return self.vmax
            return float(self.means[-1]) + (t - cum[-1]) / rem * (
                self.vmax - float(self.means[-1]))
        i = int(np.searchsorted(cum, t) - 1)
        frac = (t - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1]
                                             - self.means[i]))

    # --- serialization for crossing the batch -> driver boundary ----------
    def to_bytes(self) -> bytes:
        head = np.asarray([self.delta, self.weights.size,
                           self.vmin, self.vmax], dtype=np.float64)
        return (head.tobytes() + self.means.tobytes()
                + self.weights.tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        head = np.frombuffer(buf, dtype=np.float64, count=4)
        d = cls(int(head[0]))
        n = int(head[1])
        d.vmin, d.vmax = float(head[2]), float(head[3])
        d.means = np.frombuffer(buf, dtype=np.float64, count=n,
                                offset=32).copy()
        d.weights = np.frombuffer(buf, dtype=np.float64, count=n,
                                  offset=32 + 8 * n).copy()
        return d


def approx_quantiles(ds, column: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                     delta: int = TDIGEST_DELTA, group_col: str | None = None,
                     batch_size: int = 8192) -> pd.DataFrame:
    """Approximate quantiles of a numeric column with NO shuffle: each
    batch emits its serialized t-digest partial (optionally one per
    ``group_col`` value — group cardinality must be bounded, the same
    contract as ``source_stats``), the driver folds them. Returns one
    row per group with a ``q<p>`` column per requested quantile. The
    EXACT path for bounded integer domains stays ``length_quantiles``;
    this is the unbounded/continuous-metric companion (float values,
    latencies, scores) at ~1e-3 rank error mid-range and better tails."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        groups = ([("", df)] if group_col is None
                  else list(df.groupby(group_col, sort=False)))
        rows = []
        for g, sub in groups:
            td = TDigest(delta).add(sub[column].to_numpy(np.float64))
            rows.append((str(g), td.to_bytes()))
        return pd.DataFrame(rows, columns=["g", "td"])

    parts = ds.map_batches(sketch, batch_format="pandas",
                           batch_size=batch_size).take_all()
    merged: dict[str, TDigest] = {}
    for r in parts:
        td = TDigest.from_bytes(r["td"])
        if r["g"] in merged:
            merged[r["g"]].merge(td)
        else:
            merged[r["g"]] = td
    rows = []
    for g in sorted(merged):
        td = merged[g]
        rows.append([g, float(td.weights.sum()),
                     *(td.quantile(q) for q in qs)])
    cols = ["group", "n", *[f"q{int(q * 100)}" for q in qs]]
    out = pd.DataFrame(rows, columns=cols)
    if group_col is None:
        out = out.drop(columns=["group"])
    return out


# ---------------------------------------------------------------------------
# Bloom filter — the mergeable MEMBERSHIP sketch completing the family
# (HLL: distinct counts; CMS: frequencies; t-digest: quantiles; Bloom:
# set membership). The 100 TB use case is snapshot-vs-snapshot dedup:
# build the filter over an existing corpus's content hashes ONCE, then
# filter every new crawl shard map-side with the broadcast bits — no
# join, no shuffle. One-sided error: a member is NEVER missed (no false
# negatives); a non-member passes with probability ~(1-e^{-kn/m})^k
# (false positive = a genuinely-new doc wrongly dropped — size m for
# the corpus, or route survivors through the exact join to reclaim).

BLOOM_BITS = 1 << 23  # 8 Mbit = 1 MiB packed; ~0.6% FPR at 500k keys/k=7
BLOOM_K = 7


class BloomFilter:
    """Deterministic k-hash Bloom filter over 64-bit value hashes.
    Internals are an unpacked uint8 bit array (vectorized scatter/gather
    — this VM's boolean fancy-indexing is slow, integer indexing is
    not); serialization packs to m/8 bytes. Mergeable by OR."""

    __slots__ = ("n_bits", "k", "_a", "_b", "bits", "n_added")

    def __init__(self, n_bits: int = BLOOM_BITS, k: int = BLOOM_K,
                 seed: int = 29):
        self.n_bits = n_bits
        self.k = k
        self._a, self._b = _cms_params(k, seed)
        self.bits = np.zeros(n_bits, dtype=np.uint8)
        self.n_added = 0

    def _idx(self, h: np.ndarray) -> np.ndarray:
        return _cms_rows(np.asarray(h, dtype=np.int64), self._a, self._b,
                         self.n_bits)

    def add_hashes(self, h: np.ndarray) -> "BloomFilter":
        if len(h):
            self.bits[self._idx(h).ravel()] = 1
            self.n_added += int(len(h))
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, dtype=bool)
        return self.bits[self._idx(h)].all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        np.maximum(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def fp_rate(self) -> float:
        """Theoretical FPR from the actual fill factor."""
        fill = float(self.bits.mean())
        return fill ** self.k

    def to_bytes(self) -> bytes:
        head = np.asarray([self.n_bits, self.k, self.n_added],
                          dtype=np.int64)
        return head.tobytes() + np.packbits(self.bits).tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes, seed: int = 29) -> "BloomFilter":
        head = np.frombuffer(buf, dtype=np.int64, count=3)
        bf = cls(int(head[0]), int(head[1]), seed)
        bf.n_added = int(head[2])
        bf.bits = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, offset=24)
        )[: bf.n_bits].astype(np.uint8)
        return bf


def _value_hashes(col: pd.Series) -> np.ndarray:
    """Deterministic 64-bit hashes of a column's (string-cast) values —
    the same convention as the HLL/CMS sketches above."""
    return pd.util.hash_pandas_object(
        col.dropna().astype(str), index=False).to_numpy().view(np.int64)


def build_bloom(ds, column: str, n_bits: int = BLOOM_BITS,
                k: int = BLOOM_K, seed: int = 29,
                batch_size: int = 8192) -> BloomFilter:
    """Membership sketch of a column with NO shuffle: per-batch partial
    filters (mergeable by OR) folded on the driver — the same plan as
    ``approx_distinct``. At 100 TB the fold nests in a tree; the driver
    fold is O(batches), never O(rows)."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(n_bits, k, seed)
        bf.add_hashes(_value_hashes(df[column]))
        return pd.DataFrame({"bf": [bf.to_bytes()]})

    parts = ds.map_batches(sketch, batch_format="pandas",
                           batch_size=batch_size).take_all()
    merged = BloomFilter(n_bits, k, seed)
    for r in parts:
        merged.merge(BloomFilter.from_bytes(r["bf"], seed))
    return merged


def filter_by_bloom(ds, column: str, bloom: BloomFilter,
                    keep_members: bool = False, seed: int = 29,
                    batch_size: int = 8192):
    """Map-side membership filter: broadcast the filter bits once
    (``ray.put``), drop (default) or keep rows whose column value is in
    the sketch. The snapshot-dedup shape: ``filter_by_bloom(new_crawl,
    'text_md5', build_bloom(old_corpus, 'text_md5'))`` keeps only docs
    the old corpus has never seen — up to the one-sided FPR, which
    drops a few genuinely-new docs and never resurrects an old one."""
    import ray

    bloom_ref = ray.put(bloom.to_bytes())

    class Member:
        def __init__(self):
            self._bf = BloomFilter.from_bytes(ray.get(bloom_ref), seed)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vals = df[column].astype(str)
            hit = self._bf.contains_hashes(
                pd.util.hash_pandas_object(
                    vals, index=False).to_numpy().view(np.int64))
            return df[hit] if keep_members else df[~hit]

    from search_engine_ray.pool import actor_pool_size

    return ds.map_batches(Member, batch_format="pandas",
                          batch_size=batch_size,
                          concurrency=actor_pool_size())
