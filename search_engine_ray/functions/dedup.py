"""Deduplication pipelines for training-data corpora (exact + near-dup).

All operate on a ``documents``-shaped Dataset (``doc_id:int64, text:string``)
and follow the scale pattern: hash/signature computed per batch
(``map_batches``, vectorized), candidates co-located by a ``groupby`` on the
signature key, verification inside the group — never a driver-side loop
over the corpus.

* exact: md5(text) -> hash-partitioned keep-min-doc_id
* MinHash + LSH: word shingles -> 64 minhash perms -> 8 bands x 8 rows ->
  band-bucket groupby -> candidate pairs -> exact n-gram Jaccard verify
* SimHash: 64-bit weighted term-hash signature; near-dup candidates share a
  16-bit chunk (4-chunk blocking tolerates <= 3-chunk Hamming distance)
* embedding cosine near-dup: see functions/ann.py (pairs with cos >= t)
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from search_engine_ray.functions.textstats import token_regex

_MERSENNE = (1 << 61) - 1


class ExactHashBatch:
    """doc_id + md5(text) (md5: portable, matches DuckDB's md5())."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_md5": pa.array(
                    [hashlib.md5((t or "").encode()).hexdigest() for t in texts],
                    pa.string(),
                ),
            }
        )


def exact_dedup(ds, batch_size: int = 4096):
    """Canonical representative (min doc_id) per exact text hash.

    Hash cardinality ~ corpus size, so this uses the coarse-bucket
    aggregate (stages/agg.py) instead of a per-group groupby."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    hashed = ds.map_batches(ExactHashBatch(), batch_format="pyarrow",
                            batch_size=batch_size)
    return bucketed_group_agg(
        hashed, ["text_md5"],
        lambda g: g.groupby("text_md5", as_index=False).agg(
            doc_id=("doc_id", "min")),
    )


def _shingles(tokens: list[str], k: int) -> set[bytes]:
    if len(tokens) < k:
        return {" ".join(tokens).encode()} if tokens else set()
    return {" ".join(tokens[i:i + k]).encode() for i in range(len(tokens) - k + 1)}


def _perm_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHashBatch:
    """Per-doc MinHash signature, exploded to (band_id, band_hash, doc_id).

    Universal-hash minhash: h_i(x) = (a_i*x + b_i) mod p over 64-bit shingle
    hashes; the per-batch work is a numpy (n_shingles x n_perm) min-reduce.
    """

    def __init__(self, shingle_k: int = 5, n_perm: int = 64, n_bands: int = 8):
        assert n_perm % n_bands == 0
        self.k = shingle_k
        self.n_perm = n_perm
        self.n_bands = n_bands
        self.rows = n_perm // n_bands
        self._re = token_regex()
        self._a, self._b = _perm_params(n_perm)

    def signature(self, text: str | None) -> np.ndarray | None:
        toks = self._re.findall(text) if text else []
        sh = _shingles(toks, self.k)
        if not sh:
            return None
        x = np.fromiter(
            (int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(),
                            "little") & ((1 << 61) - 1) for s in sh),
            dtype=np.uint64, count=len(sh),
        )
        # (n_shingles, n_perm) via broadcasting, min over shingles
        vals = (x[:, None] * self._a[None, :] + self._b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band, out_hash, out_doc = [], [], []
        for d, t in zip(doc_ids, texts):
            sig = self.signature(t)
            if sig is None:
                continue
            for band in range(self.n_bands):
                chunk = sig[band * self.rows:(band + 1) * self.rows]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_band.append(band)
                out_hash.append(int.from_bytes(bh, "little") >> 1)
                out_doc.append(d)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs from ALL LSH buckets in one coarse partition.

    Vectorized group sizing first (pandas, C); the Python pair loop only
    touches buckets with >=2 docs — the rare case. Per-bucket cap of 50
    docs bounds combinatorial blowup (a hotter bucket means the docs are
    near-identical anyway; the cap is logged via the pair count)."""
    a, b = [], []
    sizes = g.groupby(["band_id", "band_hash"])["doc_id"].nunique()
    multi = sizes[sizes >= 2]
    if len(multi):
        sub = g.set_index(["band_id", "band_hash"]).loc[multi.index]
        for key in multi.index:
            docs = sorted(set(sub.loc[[key]]["doc_id"].tolist()))[:50]
            for x, y in combinations(docs, 2):
                a.append(x)
                b.append(y)
    return pd.DataFrame(
        {"doc_a": pd.Series(a, dtype="int64"),
         "doc_b": pd.Series(b, dtype="int64")}
    )


class JaccardVerify:
    """Stateful actor-pool verifier: exact n-gram Jaccard over a broadcast
    text lookup (docs come as ref via ray.put once, not per batch)."""

    def __init__(self, texts_ref, shingle_k: int = 5, threshold: float = 0.7):
        import ray

        self._texts = ray.get(texts_ref)
        self.k = shingle_k
        self.t = threshold
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(),
                        batch.column("doc_b").to_pylist()):
            sa = _shingles(self._re.findall(self._texts.get(a) or ""), self.k)
            sb = _shingles(self._re.findall(self._texts.get(b) or ""), self.k)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= self.t:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )


def minhash_near_dups(
    ds,
    shingle_k: int = 5,
    n_perm: int = 64,
    n_bands: int = 8,
    threshold: float = 0.7,
    batch_size: int = 2048,
    texts_ref=None,
    verify_concurrency=(1, 4),
):
    """Full MinHash-LSH near-dup pipeline -> verified (doc_a, doc_b, jaccard).

    ``texts_ref`` is a ``ray.put`` handle to a {doc_id: text} dict used by the
    verification actors (broadcast once). At sandbox scale the corpus fits;
    at real scale verification joins text back by doc-bucket instead.
    """
    import ray

    if texts_ref is None:
        rows = ds.select_columns(["doc_id", "text"]).take_all()
        texts_ref = ray.put({r["doc_id"]: r["text"] for r in rows})
    sigs = ds.map_batches(
        MinHashBatch(shingle_k, n_perm, n_bands),
        batch_format="pyarrow", batch_size=batch_size,
    )
    from search_engine_ray.stages.agg import bucketed_distinct, bucketed_group_agg

    pairs = bucketed_group_agg(sigs, ["band_id", "band_hash"], _bucket_pairs)
    # distinct pairs (several bands can propose the same pair)
    pairs = bucketed_distinct(pairs, ["doc_a", "doc_b"])
    verified = pairs.map_batches(
        JaccardVerify,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=verify_concurrency,
        fn_constructor_kwargs={
            "texts_ref": texts_ref, "shingle_k": shingle_k,
            "threshold": threshold,
        },
    )
    return verified


class SimHashBatch:
    """64-bit SimHash per doc + 16-bit chunk blocking keys (4 chunks)."""

    def __init__(self):
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_sim, out_chunk_id, out_chunk_val = [], [], [], []
        for d, t in zip(doc_ids, texts):
            toks = self._re.findall(t) if t else []
            if not toks:
                continue
            votes = np.zeros(64, dtype=np.int64)
            uniq, counts = np.unique(np.array(toks, dtype=object),
                                     return_counts=True)
            for w, c in zip(uniq, counts):
                h = int.from_bytes(
                    hashlib.blake2b(str(w).encode(), digest_size=8).digest(),
                    "little",
                )
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)
                        ) & np.uint64(1)
                votes += np.where(bits == 1, c, -c)
            sim = int((((votes > 0).astype(np.uint64)
                        << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)))
            sim_signed = sim - (1 << 64) if sim >= (1 << 63) else sim
            for chunk in range(4):
                out_doc.append(d)
                out_sim.append(sim_signed)
                out_chunk_id.append(chunk)
                out_chunk_val.append((sim >> (16 * chunk)) & 0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "simhash": pa.array(out_sim, pa.int64()),
                "chunk_id": pa.array(out_chunk_id, pa.int32()),
                "chunk_val": pa.array(out_chunk_val, pa.int32()),
            }
        )


def _simhash_bucket_pairs(g: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """Pairs from all chunk buckets in one coarse partition (>=2-doc
    buckets only; 50-doc cap per bucket as in _bucket_pairs)."""
    out_a, out_b, out_h = [], [], []
    sizes = g.groupby(["chunk_id", "chunk_val"])["doc_id"].nunique()
    multi = sizes[sizes >= 2]
    if len(multi):
        sub = g.set_index(["chunk_id", "chunk_val"])
        for key in multi.index:
            rows = (sub.loc[[key]][["doc_id", "simhash"]]
                    .drop_duplicates("doc_id").sort_values("doc_id")
                    .itertuples(index=False))
            for (da, sa), (db, sb) in combinations(list(rows)[:50], 2):
                h = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
                if h <= max_hamming:
                    out_a.append(da)
                    out_b.append(db)
                    out_h.append(h)
    return pd.DataFrame(
        {"doc_a": pd.Series(out_a, dtype="int64"),
         "doc_b": pd.Series(out_b, dtype="int64"),
         "hamming": pd.Series(out_h, dtype="int64")}
    )


def simhash_near_dups(ds, max_hamming: int = 3, batch_size: int = 2048):
    """SimHash blocking + Hamming verification -> (doc_a, doc_b, hamming)."""
    from search_engine_ray.stages.agg import bucketed_distinct, bucketed_group_agg

    sigs = ds.map_batches(SimHashBatch(), batch_format="pyarrow",
                          batch_size=batch_size)
    pairs = bucketed_group_agg(
        sigs, ["chunk_id", "chunk_val"], _simhash_bucket_pairs)
    return bucketed_distinct(pairs, ["doc_a", "doc_b", "hamming"])
