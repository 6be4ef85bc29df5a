"""Deduplication pipelines for training-data corpora (exact + near-dup).

All operate on a ``documents``-shaped Dataset (``doc_id:int64, text:string``)
and follow the scale pattern: hash/signature computed per batch
(``map_batches``, vectorized), candidates co-located by a ``groupby`` on the
signature key, verification inside the group — never a driver-side loop
over the corpus.

* exact: md5(text) -> hash-partitioned keep-min-doc_id
* MinHash + LSH: word shingles -> 64 minhash perms -> 8 bands x 8 rows ->
  band-bucket groupby -> candidate pairs -> exact Jaccard verify via a
  distributed two-step hash join of pairs with per-doc shingle-hash sets
  (broadcast-texts fast path available for small corpora)
* SimHash: 64-bit weighted term-hash signature; near-dup candidates share a
  16-bit chunk (4-chunk blocking tolerates <= 3-chunk Hamming distance)
* embedding cosine near-dup: see functions/ann.py (pairs with cos >= t)
"""

from __future__ import annotations

import hashlib
import logging
import math
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


from search_engine_ray.functions.textstats import round_half_away, token_regex

_MERSENNE = (1 << 61) - 1

logger = logging.getLogger("search_engine_ray.dedup")


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


def _shingle_hash_array(text: str | None, tok_re, k: int) -> np.ndarray:
    """Sorted unique 61-bit shingle-hash set of a doc as int64 ndarray —
    the shared representation for MinHash signatures AND exact Jaccard
    verification (both paths agree bit-for-bit on hash-set Jaccard).

    Hash = low 8 md5 digest bytes little-endian (== DuckDB's
    ``md5_number_lower``, the same convention as FingerprintBatch) masked
    to 61 bits — so the whole MinHash pipeline, banding included, is
    reproducible in SQL and oracle-checkable cross-engine."""
    return shingle_hashes_from_tokens(tok_re.findall(text) if text else [],
                                      k)


def shingle_hashes_from_tokens(toks: list[str], k: int) -> np.ndarray:
    """``_shingle_hash_array`` on a pre-tokenized document — the entry
    point for fused stages (``webtext.CorpusFilterBatch``) that tokenize
    once per doc and feed several signal kernels."""
    sh = _shingles(toks, k)
    if not sh:
        return np.empty(0, dtype=np.int64)
    x = np.fromiter(
        (int.from_bytes(hashlib.md5(s).digest()[8:], "little") & _MERSENNE
         for s in sh),
        dtype=np.int64, count=len(sh),
    )
    x.sort()
    return x


def _hashset_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


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
        x = _shingle_hash_array(text, self._re, self.k).astype(np.uint64)
        if not x.size:
            return None
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


BUCKET_CAP_DEFAULT = 50


def _bucket_pairs(g: pd.DataFrame, bucket_cap: int = BUCKET_CAP_DEFAULT
                  ) -> pd.DataFrame:
    """Candidate pairs from ALL LSH buckets in one coarse partition.

    Fully vectorized: one sort + contiguous group coding, then size-2
    buckets (the overwhelmingly common case — a true dup pair collides
    as a 2-doc bucket in each agreeing band) emit in ONE numpy gather;
    only buckets with 3+ docs take the per-bucket ``triu_indices``
    path. The r4 per-key ``DataFrame.loc`` probe cost ~1 ms per hot
    bucket and dominated the stage wall. ``bucket_cap`` bounds
    combinatorial blowup in a hot bucket (boilerplate pages); every
    truncation is LOGGED with the dropped-doc count so a capped run is
    never silent."""
    u = (g.drop_duplicates(["band_id", "band_hash", "doc_id"])
          .sort_values(["band_id", "band_hash", "doc_id"],
                       kind="mergesort"))
    if not len(u):
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64")})
    codes = u.groupby(["band_id", "band_hash"], sort=False).ngroup() \
             .to_numpy()
    docs = u["doc_id"].to_numpy()
    counts = np.bincount(codes)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    a_parts, b_parts = [], []
    n_trunc = n_dropped = 0
    s2 = np.flatnonzero(counts == 2)
    if s2.size:
        st = starts[s2]
        a_parts.append(docs[st])
        b_parts.append(docs[st + 1])
    for gi in np.flatnonzero(counts > 2):
        d = docs[starts[gi]: starts[gi] + counts[gi]]
        if d.size > bucket_cap:
            n_trunc += 1
            n_dropped += int(d.size) - bucket_cap
            d = d[:bucket_cap]
        iu, ju = np.triu_indices(d.size, k=1)
        a_parts.append(d[iu])
        b_parts.append(d[ju])
    if n_trunc:
        logger.warning(
            "minhash LSH: %d hot bucket(s) truncated to cap=%d "
            "(%d candidate docs dropped) in this partition",
            n_trunc, bucket_cap, n_dropped)
    a = np.concatenate(a_parts) if a_parts else np.empty(0, np.int64)
    b = np.concatenate(b_parts) if b_parts else np.empty(0, np.int64)
    return pd.DataFrame(
        {"doc_a": pd.Series(a, dtype="int64"),
         "doc_b": pd.Series(b, dtype="int64")}
    )


class ShingleHashBatch:
    """(doc_id, text) -> (doc_id, sh: binary) where ``sh`` is the doc's
    sorted shingle-hash set packed as an int64 little-endian blob — the
    join payload for distributed Jaccard verification (Acero hash join
    carries binary columns; list columns it does not)."""

    def __init__(self, shingle_k: int = 5):
        self.k = shingle_k
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        blobs = [
            _shingle_hash_array(t, self._re, self.k).tobytes() for t in texts
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "sh": pa.array(blobs, pa.binary())}
        )


def _verify_joined(batch: pa.Table, threshold: float) -> pa.Table:
    """Exact hash-set Jaccard over co-shuffled (sh_a, sh_b) blobs."""
    out_a, out_b, out_j = [], [], []
    for a, b, ba, bb in zip(batch.column("doc_a").to_pylist(),
                            batch.column("doc_b").to_pylist(),
                            batch.column("sh_a").to_pylist(),
                            batch.column("sh_b").to_pylist()):
        ha = np.frombuffer(ba or b"", dtype=np.int64)
        hb = np.frombuffer(bb or b"", dtype=np.int64)
        if not ha.size or not hb.size:
            continue
        j = _hashset_jaccard(ha, hb)
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            # half-away rounding == SQL round(): jaccard is a dyadic-able
            # rational (inter/union) that can hit exact 6-dp ties
            out_j.append(round_half_away(j))
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


class JaccardVerify:
    """Stateful actor-pool verifier for the SMALL-corpus fast path: exact
    hash-set Jaccard over a broadcast text lookup (ray.put once per run,
    fetched once per actor). Same Jaccard values as the join path (both
    operate on _shingle_hash_array sets)."""

    def __init__(self, texts_ref, shingle_k: int = 5, threshold: float = 0.7):
        import ray

        self._texts = ray.get(texts_ref)
        self.k = shingle_k
        self.t = threshold
        self._re = token_regex()
        self._memo: dict[int, np.ndarray] = {}  # docs repeat across pairs

    def _hashes(self, doc_id: int) -> np.ndarray:
        h = self._memo.get(doc_id)
        if h is None:
            h = _shingle_hash_array(self._texts.get(doc_id) or "",
                                    self._re, self.k)
            self._memo[doc_id] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(),
                        batch.column("doc_b").to_pylist()):
            ha, hb = self._hashes(a), self._hashes(b)
            if not ha.size or not hb.size:
                continue
            j = _hashset_jaccard(ha, hb)
            if j >= self.t:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round_half_away(j))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )


def _verify_candidate_pairs(
    ds,
    pairs,
    *,
    shingle_k: int,
    threshold: float,
    batch_size: int = 2048,
    texts_ref=None,
    verify_concurrency=(1, 4),
    join_partitions: int | None = None,
    broadcast_max_pairs: int = 64_000_000,
    broadcast_max_bytes: int = 1 << 30,
):
    """Tiered EXACT shingle-set-Jaccard verification of candidate
    (doc_a, doc_b) pairs against the corpus ``ds`` — the shared tail of
    the MinHash-LSH and exact n-gram-Jaccard paths. Tier selection and
    scale reasoning are documented on minhash_near_dups.

    The broadcast tier is gated by SUSPECT-BLOB BYTES
    (``broadcast_max_bytes``), not pair count: pair count measures how
    many rows stream THROUGH the verifiers (cheap), while blob bytes
    measure what every node must HOLD (the real bound). The r4 1M-pair
    pre-gate pushed the 500k-doc probe's 7.6M boilerplate-collision
    pairs onto the join tier, which re-ships each doc's ~1 KB blob once
    per pair (~10 GB exchanged, 116 s); the broadcast tier holds the
    500k unique suspects' blobs ONCE per node (~360 MB in plasma) and
    streams the pairs. ``broadcast_max_pairs`` survives as the forced
    tier switch (0 = always join) and a driver-side unique() bound."""
    import ray

    if texts_ref is not None:
        return pairs.map_batches(
            JaccardVerify,
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=verify_concurrency,
            fn_constructor_kwargs={
                "texts_ref": texts_ref, "shingle_k": shingle_k,
                "threshold": threshold,
            },
        )
    # scale path: co-shuffle pairs with shingle sets via two partitioned
    # hash joins (each moves candidate-pair rows + each doc's hash blob
    # once; partition count bounds per-task memory)
    if join_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        join_partitions = max(8, cpus)
    pairs = pairs.materialize()  # candidate pairs: bounded by the LSH
    # bucket caps, tiny relative to the corpus; consumed twice below
    # Semi-join reduction: only docs that appear in a candidate pair need
    # a shingle blob. When the candidate set is small (the normal case —
    # LSH collisions are a corpus fraction), ONE filtered corpus pass
    # computes suspects' blobs and verification runs against a broadcast
    # {id: blob} map. Past the bound, two partitioned hash joins move each
    # blob once — no driver state of corpus size on either path.
    n_pairs = pairs.count()
    if n_pairs <= broadcast_max_pairs:
        # suspect ids: incremental bounded unique (re-compress whenever
        # the accumulated per-batch uniques pass ~64M entries, so driver
        # memory is O(unique suspects), never O(pairs))
        chunks: list[np.ndarray] = []
        acc = 0
        for b in pairs.iter_batches(batch_format="numpy",
                                    batch_size=1 << 20):
            u = np.unique(np.concatenate([b["doc_a"], b["doc_b"]]))
            chunks.append(u)
            acc += u.size
            if acc > (1 << 26):
                chunks = [np.unique(np.concatenate(chunks))]
                acc = chunks[0].size
        id_arr = (np.unique(np.concatenate(chunks)) if chunks
                  else np.empty(0, np.int64))
        id_ref = ray.put(id_arr)

        def candidate_blobs(t: pa.Table) -> pa.Table:
            ids = ray.get(id_ref)
            keep = np.isin(t.column("doc_id").to_numpy(), ids,
                           assume_unique=False)
            return t.filter(pa.array(keep))

        sh_small = ds.map_batches(candidate_blobs, batch_format="pyarrow",
                                  batch_size=batch_size) \
            .map_batches(ShingleHashBatch(shingle_k),
                         batch_format="pyarrow", batch_size=batch_size)
        # pack suspect blobs into ONE numpy triple (sorted ids, offsets,
        # byte buffer): ray.put of numpy arrays is plasma-backed, so
        # every worker on a node shares one zero-copy mapping instead of
        # each actor deserializing a python dict of bytes objects
        ids_l: list[int] = []
        blobs_l: list[bytes] | None = []
        total = 0
        for b in sh_small.iter_batches(batch_format="pyarrow",
                                       batch_size=8192):
            for d, blob in zip(b.column("doc_id").to_pylist(),
                               b.column("sh").to_pylist()):
                total += len(blob)
                ids_l.append(d)
                blobs_l.append(blob)
            if total > broadcast_max_bytes:
                logger.warning(
                    "minhash verify: candidate blobs exceed broadcast "
                    "budget (%d B) — falling back to the join path", total)
                blobs_l = None
                break
        if blobs_l is not None:
            ids_np = np.asarray(ids_l, dtype=np.int64)
            order = np.argsort(ids_np, kind="stable")
            ids_np = ids_np[order]
            lens = np.fromiter((len(blobs_l[i]) for i in order),
                               dtype=np.int64, count=order.size)
            offs = np.zeros(order.size + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            buf = np.frombuffer(
                b"".join(blobs_l[i] for i in order) or b"\x00",
                dtype=np.uint8)
            blob_ref = ray.put((ids_np, offs, buf))

            def verify_broadcast(t: pa.Table) -> pa.Table:
                s_ids, s_offs, s_buf = ray.get(blob_ref)
                mv = memoryview(s_buf)

                def lookup(col: str) -> list[bytes | None]:
                    vals = t.column(col).to_numpy()
                    if s_ids.size == 0 or vals.size == 0:
                        return [None] * vals.size
                    ix = np.searchsorted(s_ids, vals)
                    ix_c = np.minimum(ix, s_ids.size - 1)
                    ok = s_ids[ix_c] == vals
                    return [bytes(mv[s_offs[i]:s_offs[i + 1]]) if o
                            else None
                            for i, o in zip(ix_c, ok)]

                sh_a = lookup("doc_a")
                sh_b = lookup("doc_b")
                return _verify_joined(
                    t.append_column("sh_a", pa.array(sh_a, pa.binary()))
                     .append_column("sh_b", pa.array(sh_b, pa.binary())),
                    threshold)

            # 8k pairs/batch: each batch materializes ~2 x 8k blob
            # slices (~12 MB at 750 B/blob) — small heap, and an
            # order of magnitude fewer tasks than 1k batches when the
            # candidate set runs to millions (the 500k-probe regime)
            return pairs.map_batches(verify_broadcast,
                                     batch_format="pyarrow",
                                     batch_size=8192)
    sh = ds.map_batches(ShingleHashBatch(shingle_k),
                        batch_format="pyarrow", batch_size=batch_size)
    j = pairs.join(sh, "inner", join_partitions,
                   on=("doc_a",), right_on=("doc_id",))
    j = j.rename_columns({"sh": "sh_a"})
    # repartition between the two hash joins: chaining Join->Join directly
    # makes the second join's aggregator resolve its keys against the
    # wrong side (Ray 2.49 ArrowInvalid "no match for FieldRef doc_b");
    # a shuffle boundary isolates them. Cost: one exchange of the
    # (pairs + blob_a) rows — small relative to the corpus.
    j = j.repartition(join_partitions)
    j = j.join(sh, "inner", join_partitions,
               on=("doc_b",), right_on=("doc_id",))
    j = j.rename_columns({"sh": "sh_b"})
    return j.map_batches(
        _verify_joined, batch_format="pyarrow", batch_size=1024,
        fn_kwargs={"threshold": threshold},
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
    bucket_cap: int = BUCKET_CAP_DEFAULT,
    join_partitions: int | None = None,
    broadcast_max_pairs: int = 64_000_000,
    broadcast_max_bytes: int = 1 << 30,
):
    """Full MinHash-LSH near-dup pipeline -> verified (doc_a, doc_b, jaccard).

    Verification never materializes the corpus on the driver; it picks the
    cheapest scale-safe tier:

    1. suspect-blob bytes within ``broadcast_max_bytes`` (the REAL
       bound — what each node must hold; ``broadcast_max_pairs`` is a
       generous pre-gate on what streams through, and 0 forces tier 2):
       ONE corpus pass filtered to suspect docs computes their
       shingle-hash blobs, packed into a numpy (ids, offsets, buffer)
       triple that lives once per node in plasma (semi-join reduction —
       driver memory is bounded by the SUSPECT set, never the corpus);
    2. otherwise: two partitioned hash joins co-shuffle pairs with blobs
       (fully streaming at any size);
    3. ``texts_ref`` (a ``ray.put`` {doc_id: text} dict) forces the
       legacy broadcast-texts path for callers that already hold one.

    All tiers compute Jaccard on the same shingle-hash sets, so results
    are identical (tests/test_functions.py proves path identity).
    """
    import ray

    sigs = ds.map_batches(
        MinHashBatch(shingle_k, n_perm, n_bands),
        batch_format="pyarrow", batch_size=batch_size,
    )
    from search_engine_ray.stages.agg import (
        bucketed_distinct,
        bucketed_group_agg,
        resolve_num_buckets,
    )

    # size both exchanges from the RAW input's lineage (sigs has none):
    # tiny corpora drop to the scaled floor instead of 64 fixed buckets
    nb = resolve_num_buckets(None, ds)
    pairs = bucketed_group_agg(
        sigs, ["band_id", "band_hash"],
        lambda g: _bucket_pairs(g, bucket_cap=bucket_cap), nb)
    # distinct pairs (several bands can propose the same pair)
    pairs = bucketed_distinct(pairs, ["doc_a", "doc_b"], nb)
    return _verify_candidate_pairs(
        ds, pairs, shingle_k=shingle_k, threshold=threshold,
        batch_size=batch_size, texts_ref=texts_ref,
        verify_concurrency=verify_concurrency,
        join_partitions=join_partitions,
        broadcast_max_pairs=broadcast_max_pairs,
        broadcast_max_bytes=broadcast_max_bytes,
    )


class PrefixEmitBatch:
    """(doc_id, text) -> (px, doc_id, n_sh): prefix-filtering emission for
    the EXACT n-gram-Jaccard self-join.

    Order the shingle universe by hash value (any global total order
    works); if J(A, B) >= t then |A ∩ B| >= t * max(|A|, |B|), so A and B
    must collide on at least one hash inside each one's first
    ``n - ceil(t*n) + 1`` sorted shingle hashes (prefix filtering,
    Chaudhuri et al. ICDE'06 / Xiao et al. PPJoin). The emitted candidate
    set is therefore a SUPERSET of the true pairs — exact verification
    downstream makes the result identical to brute force. ``n_sh`` (the
    doc's shingle-set size) rides along for the length filter and
    ``pos`` (the shingle's rank in the doc's sorted order) for the
    positional filter (both applied in ``_prefix_bucket_pairs``)."""

    def __init__(self, shingle_k: int = 5, threshold: float = 0.5):
        self.k = shingle_k
        self.t = threshold
        self._re = token_regex()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_px, out_doc, out_n, out_pos = [], [], [], []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            xs = _shingle_hash_array(text, self._re, self.k)
            n = xs.size
            if not n:
                continue
            plen = n - math.ceil(self.t * n) + 1
            out_px.append(xs[:plen])
            out_doc.append(np.full(plen, d, dtype=np.int64))
            out_n.append(np.full(plen, n, dtype=np.int64))
            out_pos.append(np.arange(plen, dtype=np.int64))
        if not out_px:
            return pa.table({"px": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_sh": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({
            "px": pa.array(np.concatenate(out_px)),
            "doc_id": pa.array(np.concatenate(out_doc)),
            "n_sh": pa.array(np.concatenate(out_n)),
            "pos": pa.array(np.concatenate(out_pos)),
        })


def _prefix_bucket_pairs(g: pd.DataFrame, threshold: float,
                         group_log_size: int = 1000) -> pd.DataFrame:
    """Candidate pairs from all prefix-hash groups in one coarse partition.

    UNCAPPED — prefix filtering must stay lossless for the final result to
    equal brute force. A group of s docs yields s*(s-1)/2 pairs, which is
    quadratic only in the size of a genuine near-identical cluster (every
    group member shares an identical k-shingle in its prefix); groups past
    ``group_log_size`` are logged. Two lossless vectorized prunes:

    - LENGTH filter (PPJoin): min(n_a, n_b) >= t * max(n_a, n_b) — J >= t
      bounds the size ratio.
    - POSITIONAL filter (Xiao et al. PPJoin): a pair colliding on a
      shingle ranked pos_a / pos_b in each doc's sorted order can overlap
      at most 1 + min(n_a - pos_a - 1, n_b - pos_b - 1); J >= t needs
      overlap >= ceil(t * (n_a + n_b) / (1 + t)). Lossless under the
      pair-dedup union downstream: a true pair's FIRST shared shingle (in
      global hash order) lies inside both prefixes and satisfies the
      bound there, so the pair survives in at least that group. This is
      what kills the boilerplate blowup — thousands of docs sharing one
      footer line collide on its few shingles, but with only ~k shared
      shingles the bound can't reach the required overlap for most
      collision positions (measured 500k-doc probe: the dominant cost).

    All group work is sorted-array slicing (one sort + boundary scan) —
    per-key pandas indexing was the partition hot spot; triu index
    templates are memoized by group size (groups are overwhelmingly
    tiny)."""
    sub = (g[["px", "doc_id", "n_sh", "pos"]]
           .drop_duplicates(["px", "doc_id"])
           .sort_values(["px", "doc_id"]))
    px = sub["px"].to_numpy()
    docs = sub["doc_id"].to_numpy(dtype=np.int64)
    ns = sub["n_sh"].to_numpy(dtype=np.int64)
    ps = sub["pos"].to_numpy(dtype=np.int64)
    a, b = [], []

    def emit(ai, bi):
        """Apply the length + positional filters to index-pair arrays
        (indices into the partition's sorted rows) and collect pairs."""
        na, nb = ns[ai], ns[bi]
        keep = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
        pa_, pb_ = ps[ai], ps[bi]
        ubound = 1 + np.minimum(na - pa_ - 1, nb - pb_ - 1)
        # required overlap; tiny eps guards float-exact thresholds
        # (t=0.5, na+nb divisible by 3) against spurious round-up
        alpha = np.ceil(threshold * (na + nb) / (1.0 + threshold)
                        - 1e-9)
        keep &= ubound >= alpha
        a.append(docs[ai[keep]])
        b.append(docs[bi[keep]])

    if px.size:
        bounds = np.flatnonzero(np.r_[True, px[1:] != px[:-1], True])
        sizes = np.diff(bounds)
        # size-2 groups are the overwhelming case (random shingle
        # collisions): ONE vectorized emit for all of them, no Python
        # loop — the per-group loop below only touches cnt >= 3
        s2 = bounds[:-1][sizes == 2]
        if s2.size:
            emit(s2, s2 + 1)
        triu_memo: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for s, e in zip(bounds[:-1][sizes > 2], bounds[1:][sizes > 2]):
            cnt = e - s
            if cnt > group_log_size:
                logger.warning(
                    "ngram-jaccard: prefix group px=%d has %d docs "
                    "(%d candidate pairs) — hot shingle / dup cluster",
                    int(px[s]), cnt, cnt * (cnt - 1) // 2)
            if cnt not in triu_memo:
                triu_memo[cnt] = np.triu_indices(cnt, k=1)
            ia, ib = triu_memo[cnt]
            emit(s + ia, s + ib)
    if a:
        av = np.concatenate(a)
        bv = np.concatenate(b)
    else:
        av = bv = np.empty(0, np.int64)
    return pd.DataFrame({"doc_a": pd.Series(av, dtype="int64"),
                         "doc_b": pd.Series(bv, dtype="int64")})


def ngram_jaccard_near_dups(
    ds,
    shingle_k: int = 5,
    threshold: float = 0.5,
    batch_size: int = 2048,
    texts_ref=None,
    verify_concurrency=(1, 4),
    join_partitions: int | None = None,
    broadcast_max_pairs: int = 64_000_000,
    broadcast_max_bytes: int = 1 << 30,
):
    """EXACT n-gram (k-shingle-set) Jaccard near-dup join: every unordered
    doc pair with J >= threshold — no approximation anywhere.

    Candidate generation is a lossless prefix-filtering self-join
    (PrefixEmitBatch/_prefix_bucket_pairs) instead of the MinHash path's
    probabilistic banding, then the same tiered exact verify
    (_verify_candidate_pairs), so the output equals brute-force all-pairs
    — the DuckDB oracle runs literal brute force and hash-matches.

    Scale: emission is ~(1-t) of total shingles at 24 B/row, shuffled once
    on the coarse hash bucket of px; pair blowup is bounded by true dup
    cluster sizes (logged), and verification never materializes the
    corpus. ref: DocumentIndexManager.java:334-336 (the reference's exact
    dedup-check analogue)."""
    from search_engine_ray.stages.agg import (
        bucketed_distinct,
        bucketed_group_agg,
        resolve_num_buckets,
    )

    em = ds.map_batches(PrefixEmitBatch(shingle_k, threshold),
                        batch_format="pyarrow", batch_size=batch_size)
    nb = resolve_num_buckets(None, ds)  # raw-input lineage (em has none)
    pairs = bucketed_group_agg(
        em, ["px"], lambda g: _prefix_bucket_pairs(g, threshold), nb)
    # the same pair usually collides on several prefix hashes
    pairs = bucketed_distinct(pairs, ["doc_a", "doc_b"], nb)
    return _verify_candidate_pairs(
        ds, pairs, shingle_k=shingle_k, threshold=threshold,
        batch_size=batch_size, texts_ref=texts_ref,
        verify_concurrency=verify_concurrency,
        join_partitions=join_partitions,
        broadcast_max_pairs=broadcast_max_pairs,
        broadcast_max_bytes=broadcast_max_bytes,
    )


class SimHashBatch:
    """64-bit SimHash per doc + 16-bit chunk blocking keys (4 chunks).

    Term hash = low 8 md5 bytes little-endian (DuckDB
    ``md5_number_lower`` — SQL-oracle-checkable, same convention as
    FingerprintBatch/minhash). The term -> (+/-1)^64 vote row is memoized
    PER ACTOR (the vocabulary is Zipf, like the tokenizer's bucket memo
    at stages/tokenize.py:72-74), so repeated terms skip hashing and bit
    unpacking entirely; per doc the vote tally is one int64 matvec."""

    _MEMO_MAX = 1 << 20  # vote rows are 512 B — cap actor heap at ~0.5 GB

    def __init__(self):
        self._re = token_regex()
        self._memo: dict[str, np.ndarray] = {}
        self._bitpos = np.arange(64, dtype=np.uint64)

    def _row(self, w: str) -> np.ndarray:
        r = self._memo.get(w)
        if r is None:
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:],
                               "little")
            bits = (np.uint64(h) >> self._bitpos) & np.uint64(1)
            r = np.where(bits == 1, 1, -1).astype(np.int64)
            if len(self._memo) >= self._MEMO_MAX:
                self._memo.clear()
            self._memo[w] = r
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_sim, out_chunk_id, out_chunk_val = [], [], [], []
        weights = (np.uint64(1) << self._bitpos)
        for d, t in zip(doc_ids, texts):
            toks = self._re.findall(t) if t else []
            if not toks:
                continue
            uniq, counts = np.unique(np.array(toks, dtype=object),
                                     return_counts=True)
            rows = np.empty((len(uniq), 64), dtype=np.int64)
            for i, w in enumerate(uniq):
                rows[i] = self._row(str(w))
            votes = counts.astype(np.int64) @ rows
            sim = int(((votes > 0).astype(np.uint64) * weights)
                      .sum(dtype=np.uint64))
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


def _simhash_bucket_pairs(g: pd.DataFrame, max_hamming: int = 3,
                          bucket_cap: int = BUCKET_CAP_DEFAULT
                          ) -> pd.DataFrame:
    """Pairs from all chunk buckets in one coarse partition (>=2-doc
    buckets only; hot buckets truncated to ``bucket_cap`` WITH a logged
    count, as in _bucket_pairs)."""
    out_a, out_b, out_h = [], [], []
    n_trunc = n_dropped = 0
    sizes = g.groupby(["chunk_id", "chunk_val"])["doc_id"].nunique()
    multi = sizes[sizes >= 2]
    if len(multi):
        sub = g.set_index(["chunk_id", "chunk_val"])
        for key in multi.index:
            rows = list(sub.loc[[key]][["doc_id", "simhash"]]
                        .drop_duplicates("doc_id").sort_values("doc_id")
                        .itertuples(index=False))
            if len(rows) > bucket_cap:
                n_trunc += 1
                n_dropped += len(rows) - bucket_cap
                rows = rows[:bucket_cap]
            for (da, sa), (db, sb) in combinations(rows, 2):
                h = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
                if h <= max_hamming:
                    out_a.append(da)
                    out_b.append(db)
                    out_h.append(h)
    if n_trunc:
        logger.warning(
            "simhash blocking: %d hot bucket(s) truncated to cap=%d "
            "(%d candidate docs dropped) in this partition",
            n_trunc, bucket_cap, n_dropped)
    return pd.DataFrame(
        {"doc_a": pd.Series(out_a, dtype="int64"),
         "doc_b": pd.Series(out_b, dtype="int64"),
         "hamming": pd.Series(out_h, dtype="int64")}
    )


def simhash_near_dups(ds, max_hamming: int = 3, batch_size: int = 2048):
    """SimHash blocking + Hamming verification -> (doc_a, doc_b, hamming)."""
    from search_engine_ray.stages.agg import (
        bucketed_distinct,
        bucketed_group_agg,
        resolve_num_buckets,
    )

    # actor pool (class, not instance) so the term-hash memo lives for the
    # whole actor, not one task
    from search_engine_ray.pool import cached_stage

    # warm-task twin of the actor pool; the per-worker term-hash memo
    # still lives for the whole stage via the cached instance
    sigs = ds.map_batches(cached_stage(SimHashBatch),
                          batch_format="pyarrow", batch_size=batch_size)
    nb = resolve_num_buckets(None, ds)  # raw-input lineage (sigs has none)
    pairs = bucketed_group_agg(
        sigs, ["chunk_id", "chunk_val"], _simhash_bucket_pairs, nb)
    return bucketed_distinct(pairs, ["doc_a", "doc_b", "hamming"], nb)


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (pairs -> connected components)

# Pair sets up to this size resolve on the driver (vectorized union-find
# over int64 arrays, ~16 B/pair); beyond it the distributed min-label
# propagation path runs (Kiveris et al., "Connected Components in
# MapReduce and Beyond" — alternating small-star/large-star is the
# published scale-out; plain propagation converges in O(diameter)
# rounds, and near-dup clusters are shallow).
CLUSTER_DRIVER_PAIR_BUDGET = 5_000_000


def _unionfind_labels(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """Vectorized-ish union-find with path compression; returns
    node -> min-node-of-component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by MIN id keeps the representative deterministic
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def near_dup_clusters(pairs, num_buckets: int = 64,
                      driver_budget: int = CLUSTER_DRIVER_PAIR_BUDGET,
                      max_rounds: int = 50):
    """Resolve a near-dup PAIR dataset (doc_a < doc_b) into duplicate
    clusters: (doc_id, cluster_rep) for every doc that appears in any
    pair, rep = the MINIMUM doc_id reachable through the pair graph —
    the doc a dedup keep-one-per-cluster pass retains.

    Tiered like the MinHash verify: the pair set is the DEDUP OUTPUT
    (orders of magnitude smaller than the corpus), so up to
    ``driver_budget`` pairs a driver union-find resolves it exactly;
    larger graphs take distributed min-label propagation (each round =
    one coarse exchange; rounds ~ component diameter, which is small
    for near-dup cliques). Both paths produce identical labels."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    pairs = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs <= driver_budget:
        t = pairs.to_pandas()
        labels = _unionfind_labels(t["doc_a"].to_numpy(np.int64),
                                   t["doc_b"].to_numpy(np.int64))
        items = sorted(labels.items())
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([k for k, _ in items], pa.int64()),
            "cluster_rep": pa.array([v for _, v in items], pa.int64()),
        }))

    logger.info("near_dup_clusters: %d pairs > driver budget %d -> "
             "distributed label propagation", n_pairs, driver_budget)

    def both_dirs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = batch.column("doc_a")
        b = batch.column("doc_b")
        return pa.table({
            "node": pa.concat_arrays([pc.cast(c, pa.int64()).combine_chunks()
                                      for c in (a, b)]),
            "nbr": pa.concat_arrays([pc.cast(c, pa.int64()).combine_chunks()
                                     for c in (b, a)]),
        })

    edges = pairs.map_batches(both_dirs,
                              batch_format="pyarrow").materialize()
    # labels start as identity over the nodes present
    labels = bucketed_group_agg(
        edges, ["node"],
        lambda g: g.groupby("node", as_index=False).agg(
            label=("node", "min")),
        num_buckets).materialize()

    for _ in range(max_rounds):
        # propagate: every node takes min(own label, neighbors' labels).
        # neighbor labels arrive by keying the edge on nbr (one exchange
        # co-locating edges with the nbr's label row via tagged union).
        lab_rows = labels.map_batches(
            lambda df: df.rename(columns={"node": "key"}).assign(src=-1),
            batch_format="pandas")
        edge_rows = edges.map_batches(
            lambda df: df.rename(columns={"nbr": "key"})[
                ["key", "node"]].assign(label=-1, src=0)[
                ["key", "label", "src", "node"]],
            batch_format="pandas")
        lab_rows = lab_rows.map_batches(
            lambda df: df.assign(node=df["key"])[
                ["key", "label", "src", "node"]],
            batch_format="pandas")

        def send(g: pd.DataFrame) -> pd.DataFrame:
            # vectorized message fan-out: each node's label row (src=-1,
            # one per key by construction) merges onto its incident edge
            # rows (src=0) in ONE pandas hash join; the node also
            # messages itself so its own label survives the round
            lab = g.loc[g["src"] == -1, ["key", "label"]]
            tgt = g.loc[g["src"] == 0, ["key", "node"]]
            fwd = tgt.merge(lab, on="key", how="inner")[["node", "label"]]
            own = lab.rename(columns={"key": "node"})[["node", "label"]]
            out = pd.concat([own, fwd], ignore_index=True)
            return out.astype({"node": "int64", "label": "int64"})

        msgs = bucketed_group_agg(lab_rows.union(edge_rows), ["key"],
                                  send, num_buckets)
        new_labels = bucketed_group_agg(
            msgs, ["node"],
            lambda g: g.groupby("node", as_index=False).agg(
                label=("label", "min")),
            num_buckets).materialize()
        # converged when no label decreased (sum of labels is a strictly
        # decreasing monovariant while any change remains)
        old_sum = labels.map_batches(
            lambda df: pd.DataFrame({"s": [df["label"].sum()]}),
            batch_format="pandas").sum("s")
        new_sum = new_labels.map_batches(
            lambda df: pd.DataFrame({"s": [df["label"].sum()]}),
            batch_format="pandas").sum("s")
        labels = new_labels
        if old_sum == new_sum:
            break
    return labels.map_batches(
        lambda df: df.rename(columns={"node": "doc_id",
                                      "label": "cluster_rep"}),
        batch_format="pandas")


# --- windowed exact substring dedup (duplicated-span flagging) -------------


class WindowHashBatch:
    """(h, doc_id, start) for EVERY ``window``-token window of each doc —
    the emit stage of substring-level exact dedup (the distributed
    analogue of suffix-array substring dedup a la Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better": fixed-
    width window fingerprints instead of suffix arrays, which is the
    standard shuffle-friendly formulation).

    Window hash = md5 of the space-joined token window, low 8 bytes
    little-endian masked to 61 bits — the corpus-wide
    ``md5_number_lower`` convention (SQL-oracle-checkable). Adjacent
    windows share window-1 tokens, so the documented scale evolution is
    a rolling polynomial hash with an exact second pass; md5 keeps the
    engine bit-reproducible in DuckDB. ``start`` is the 1-based token
    position (matches SQL ``range(1, len(ts)-w+2)``)."""

    def __init__(self, window: int, num_buckets: int):
        self._re = token_regex()
        self._w = window
        self._nb = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self._w
        ids: list[int] = []
        hs: list[int] = []
        starts: list[int] = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = self._re.findall(text) if text else []
            n = len(toks) - w + 1
            if n <= 0:
                continue
            ids.extend([doc_id] * n)
            starts.extend(range(1, n + 1))
            hs.extend(
                int.from_bytes(
                    hashlib.md5(" ".join(toks[i:i + w]).encode())
                    .digest()[8:], "little") & _MERSENNE
                for i in range(n))
        h_arr = np.asarray(hs, dtype=np.int64)
        return pa.table({
            "h": pa.array(h_arr, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "start": pa.array(starts, pa.int64()),
            "hbucket": pa.array(h_arr % np.int64(self._nb), pa.int64()),
        })


# Two independent 31-bit prime channels for the rolling window
# fingerprint: values stay < 2^31, so numpy int64 holds every product
# (< 2^62) and every cumulative sum without overflow; the combined
# 62-bit fingerprint keeps candidate collisions negligible while the
# md5 VERIFY pass keeps the final output on the exact md5 convention.
_RP1, _RB1 = 2147483647, 1_000_003        # 2^31 - 1 (Mersenne prime)
_RP2, _RB2 = 2147483629, 1_000_033
_RB1_INV = pow(_RB1, _RP1 - 2, _RP1)      # modular inverses (Fermat)
_RB2_INV = pow(_RB2, _RP2 - 2, _RP2)


def _mod_pow_table(base: int, mod: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    v = 1
    for i in range(n):
        out[i] = v
        v = (v * base) % mod
    return out


class RollingWindowHashBatch:
    """Candidate-generation twin of ``WindowHashBatch``: the same
    (h, doc_id, start, hbucket) rows, but ``h`` is a 62-bit POLYNOMIAL
    rolling fingerprint of the token window instead of a per-window md5
    — equal window content always yields equal ``h`` (so candidate
    recall is 1.0), and the whole doc is fingerprinted with vectorized
    numpy (one cumsum + two gathers per channel) instead of O(n_windows)
    Python md5 calls. The md5 verify pass downstream removes the (rare)
    62-bit collisions, so the operator's OUTPUT stays on the md5 oracle
    convention.

    Per-channel maths (c_k = md5_number_lower(token_k) mod p, memoized
    per distinct token per actor): v_k = c_k * B^k mod p; prefix sums
    S; window sum W_i = S[i+w] - S[i] (int64-exact: each v < 2^31 and
    docs are << 2^32 tokens); normalized N_i = W_i * B^-i mod p, so
    equal windows at different offsets agree. h = N1 + (N2 << 31)."""

    def __init__(self, window: int, num_buckets: int):
        self._re = token_regex()
        self._w = window
        self._nb = num_buckets
        self._memo: dict[str, int] = {}
        self._pow1 = _mod_pow_table(_RB1, _RP1, 1024)
        self._pow2 = _mod_pow_table(_RB2, _RP2, 1024)
        self._inv1 = _mod_pow_table(_RB1_INV, _RP1, 1024)
        self._inv2 = _mod_pow_table(_RB2_INV, _RP2, 1024)

    def _grow_tables(self, n: int) -> None:
        while len(self._pow1) < n:
            m = len(self._pow1) * 2
            self._pow1 = _mod_pow_table(_RB1, _RP1, m)
            self._pow2 = _mod_pow_table(_RB2, _RP2, m)
            self._inv1 = _mod_pow_table(_RB1_INV, _RP1, m)
            self._inv2 = _mod_pow_table(_RB2_INV, _RP2, m)

    def _codes(self, toks: list[str]) -> np.ndarray:
        memo = self._memo
        miss = [t for t in toks if t not in memo]
        for t in set(miss):
            memo[t] = int.from_bytes(
                hashlib.md5(t.encode()).digest()[8:], "little") & _MERSENNE
        return np.fromiter((memo[t] for t in toks), dtype=np.int64,
                           count=len(toks))

    def _doc_hashes(self, toks: list[str]) -> np.ndarray:
        w = self._w
        n_win = len(toks) - w + 1
        self._grow_tables(len(toks) + 1)
        c = self._codes(toks)
        idx = np.arange(n_win)
        out = np.empty(n_win, dtype=np.int64)
        acc = None
        for p, powt, invt, shift in ((_RP1, self._pow1, self._inv1, 0),
                                     (_RP2, self._pow2, self._inv2, 31)):
            v = ((c % p) * powt[:len(c)]) % p
            s = np.concatenate(([0], np.cumsum(v)))
            wsum = (s[w:] - s[:-w]) % p
            norm = (wsum * invt[idx]) % p
            if acc is None:
                acc = norm
            else:
                acc = acc + (norm << np.int64(shift))
        return acc

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self._w
        ids: list[np.ndarray] = []
        hs: list[np.ndarray] = []
        starts: list[np.ndarray] = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = self._re.findall(text) if text else []
            n = len(toks) - w + 1
            if n <= 0:
                continue
            hs.append(self._doc_hashes(toks))
            ids.append(np.full(n, doc_id, dtype=np.int64))
            starts.append(np.arange(1, n + 1, dtype=np.int64))
        h_arr = (np.concatenate(hs) if hs else np.empty(0, dtype=np.int64))
        return pa.table({
            "h": pa.array(h_arr, pa.int64()),
            "doc_id": pa.array(
                np.concatenate(ids) if ids else np.empty(0, np.int64),
                pa.int64()),
            "start": pa.array(
                np.concatenate(starts) if starts else np.empty(0, np.int64),
                pa.int64()),
            "hbucket": pa.array(h_arr % np.int64(self._nb), pa.int64()),
        })


DUP_SPAN_BROADCAST_CAP = 5_000_000
# below this corpus size the direct-md5 single-execution plan wins on
# Ray's fixed per-pipeline costs; above it the rolling plan's saved
# O(corpus) md5 CPU dominates (emit kernel ~2.5-4x faster)
DUP_SPAN_ROLLING_MIN_DOCS = 200_000


def duplicate_spans(ds, window: int = 25, num_buckets: int | None = None,
                    batch_size: int = 1024, rolling: bool | None = None,
                    broadcast_cap: int = DUP_SPAN_BROADCAST_CAP):
    """Flag maximal duplicated token spans: every run of tokens covered
    by ``window``-token windows whose exact content appears in >= 2
    DISTINCT documents -> (doc_id, span_start, span_end, span_len),
    1-based inclusive token positions.

    ``rolling=None`` (default) auto-tiers by corpus size — the same
    size-guard pattern as the minhash verify tiers: at or above
    ``DUP_SPAN_ROLLING_MIN_DOCS`` docs the rolling plan's saved
    O(corpus-tokens) md5 CPU beats its two extra pipeline executions;
    below it Ray's fixed per-pipeline costs dominate and the direct-md5
    single-execution plan is faster. Both plans are bit-identical
    (pinned by test), so the tier choice is pure performance.

    Rolling plan (``rolling=True``): rolling-fingerprint candidates +
    md5 exact verify — the hot emit stage is vectorized numpy instead of
    one Python md5 per token window (the r3 verdict's one row-at-a-time
    loop in a headline pipeline):

    1. map: 62-bit polynomial rolling fingerprints per window
       (``RollingWindowHashBatch`` — equal content => equal h, so no
       true pair is ever missed);
    2. exchange on ``h %% num_buckets``: windows whose fingerprint spans
       >= 2 distinct docs become CANDIDATES (a tiny superset of the true
       duplicates: true dups + 62-bit collisions);
    3. verify: md5 window hashes computed ONLY for candidate windows,
       tiered like the minhash verify — <= ``broadcast_cap`` candidates
       broadcast once via ``ray.put`` and the corpus is re-SCANNED
       map-side (a second read beats shuffling text); above the cap
       (dup-heavy corpus) the candidates co-shuffle with the text rows
       on the doc bucket (the cut_duplicate_spans tagged-union plan) —
       both tiers are built and proven identical by test;
    4. exchange on the md5 hash: >= 2 distinct docs survive (same rule
       as the SQL oracle's ``count(DISTINCT doc_id) >= 2``, so the
       OUTPUT is bit-identical to the direct-md5 plan — pinned by test);
    5. exchange on ``doc_id %% num_buckets``: merge overlapping-or-
       adjacent windows per doc into maximal spans (vectorized islands:
       break where start > prev_start + window).

    ``rolling=False`` is the direct-md5 two-exchange plan (every window
    md5-hashed map-side) — kept as the identity anchor and A/B baseline.

    Downstream policy (cut vs keep-one-occurrence) is a separate map —
    this operator is the corpus-wide report it needs."""
    from search_engine_ray.stages.agg import resolve_num_buckets

    num_buckets = resolve_num_buckets(num_buckets, ds)
    if rolling is None:
        try:  # parquet-backed inputs answer from footers (no scan)
            rolling = ds.count() >= DUP_SPAN_ROLLING_MIN_DOCS
        except Exception:
            rolling = True  # unknown size: assume the scale path
    if rolling:
        return _duplicate_spans_rolling(ds, window, num_buckets,
                                        batch_size, broadcast_cap)
    hashed = ds.map_batches(WindowHashBatch(window, num_buckets),
                            batch_format="pyarrow", batch_size=batch_size)

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["doc_id"].transform("nunique")
        out = g.loc[nd >= 2, ["doc_id", "start"]].copy()
        out["dbucket"] = (out["doc_id"].to_numpy() % np.int64(num_buckets))
        return out

    hits = hashed.groupby("hbucket").map_groups(survivors,
                                                batch_format="pandas")
    return _spans_from_hits(hits, window, num_buckets)


def _spans_islands_fn(window: int):
    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "start"])
        d = g["doc_id"].to_numpy()
        s = g["start"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (d[1:] != d[:-1]) | (s[1:] > s[:-1] + window)
        first = np.flatnonzero(brk)
        last = np.concatenate((first[1:] - 1,
                               [len(g) - 1])) if len(g) else first
        return pd.DataFrame({
            "doc_id": d[first],
            "span_start": s[first],
            "span_end": s[last] + window - 1,
            "span_len": s[last] - s[first] + window,
        })

    return islands


def _spans_from_hits(hits, window: int, num_buckets: int):
    """(doc_id, start, dbucket) hit rows -> maximal spans per doc."""
    return hits.groupby("dbucket").map_groups(_spans_islands_fn(window),
                                              batch_format="pandas")


def _md5_window_hashes(toks: list[str], starts: np.ndarray,
                       w: int) -> list[int]:
    return [
        int.from_bytes(
            hashlib.md5(" ".join(toks[s - 1:s - 1 + w]).encode())
            .digest()[8:], "little") & _MERSENNE
        for s in starts.tolist()
    ]


def _verified_window_hashes(ds, window: int, num_buckets: int,
                            batch_size: int, broadcast_cap: int):
    """Rolling-fingerprint candidate generation + tiered md5 verify:
    returns the (h, doc_id, start) Dataset of md5 window hashes for
    every CANDIDATE window (rolling fingerprint shared by >= 2 distinct
    docs — a lossless superset of the true duplicates), or ``None``
    when no fingerprint crosses documents. Shared by duplicate_spans
    and cut_duplicate_spans; see duplicate_spans for the tier notes."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    cand = ds.map_batches(RollingWindowHashBatch(window, num_buckets),
                          batch_format="pyarrow", batch_size=batch_size)

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["doc_id"].transform("nunique")
        return g.loc[nd >= 2, ["doc_id", "start"]]

    cand_ds = bucketed_group_agg(cand, ["hbucket"], candidates,
                                 num_buckets).materialize()
    n_cand = cand_ds.count()
    if n_cand == 0:
        return None

    if n_cand <= broadcast_cap:
        # verify tier 1: broadcast the candidate set once (ray.put) and
        # RE-SCAN the corpus map-side — text never enters an exchange
        cand_df = cand_ds.to_pandas()
        starts_by_doc = {
            int(d): np.sort(sub["start"].to_numpy(dtype=np.int64))
            for d, sub in cand_df.groupby("doc_id")
        }
        cand_ref = ray.put(starts_by_doc)

        class VerifyHash:
            """md5 window hashes for CANDIDATE windows only."""

            def __init__(self, ref):
                self._re = token_regex()
                self._cand = ray.get(ref)
                self._w = window

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids: list[int] = []
                hs: list[int] = []
                starts: list[int] = []
                for doc_id, text in zip(
                        batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
                    st = self._cand.get(int(doc_id))
                    if st is None:
                        continue
                    toks = self._re.findall(text) if text else []
                    ids.extend([doc_id] * len(st))
                    starts.extend(st.tolist())
                    hs.extend(_md5_window_hashes(toks, st, self._w))
                return pa.table({
                    "h": pa.array(np.asarray(hs, dtype=np.int64),
                                  pa.int64()),
                    "doc_id": pa.array(ids, pa.int64()),
                    "start": pa.array(starts, pa.int64()),
                })

        from search_engine_ray.pool import cached_stage

        verified = ds.map_batches(
            cached_stage(VerifyHash, cand_ref),
            batch_format="pyarrow", batch_size=batch_size)
    else:
        # verify tier 2 (dup-heavy corpus, candidates exceed what the
        # driver should hold): tagged-union co-shuffle of candidates
        # with the text rows on the doc bucket — the
        # cut_duplicate_spans plan; the corpus moves through ONE
        # exchange instead of a broadcast
        logger.info(
            "duplicate_spans: %d candidates > broadcast cap %d — "
            "using the co-shuffle verify tier", n_cand, broadcast_cap)

        def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(),
                "start": df["start"].to_numpy(),
                "text": "",  # typed, never None (union schema)
            })

        def tag_text(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(),
                "start": np.int64(-1),
                "text": b["text"].astype(object),
            })

        both = cand_ds.map_batches(tag_cand, batch_format="pandas") \
            .union(ds.map_batches(tag_text, batch_format="pandas",
                                  batch_size=batch_size))

        def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
            tok_re = token_regex()
            wins = g[g["start"] >= 0]
            by_doc = {d: np.sort(sub["start"].to_numpy(dtype=np.int64))
                      for d, sub in wins.groupby("doc_id")}
            out_d: list[int] = []
            out_s: list[int] = []
            out_h: list[int] = []
            for row in g[g["start"] < 0].itertuples(index=False):
                st = by_doc.get(row.doc_id)
                if st is None:
                    continue
                toks = tok_re.findall(row.text) if row.text else []
                out_d.extend([row.doc_id] * len(st))
                out_s.extend(st.tolist())
                out_h.extend(_md5_window_hashes(toks, st, window))
            return pd.DataFrame({
                "h": np.asarray(out_h, dtype=np.int64),
                "doc_id": np.asarray(out_d, dtype=np.int64),
                "start": np.asarray(out_s, dtype=np.int64)})

        verified = bucketed_group_agg(both, ["doc_id"], verify_bucket,
                                      num_buckets)
    return verified


def _empty_spans():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "span_start": pa.array([], pa.int64()),
        "span_end": pa.array([], pa.int64()),
        "span_len": pa.array([], pa.int64())}))


def _duplicate_spans_rolling(ds, window: int, num_buckets: int,
                             batch_size: int, broadcast_cap: int):
    """The rolling-candidates + md5-verify plan (see duplicate_spans)."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    verified = _verified_window_hashes(ds, window, num_buckets,
                                       batch_size, broadcast_cap)
    if verified is None:  # no fingerprint collides across docs
        return _empty_spans()

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["doc_id"].transform("nunique")
        out = g.loc[nd >= 2, ["doc_id", "start"]].copy()
        out["dbucket"] = (out["doc_id"].to_numpy() % np.int64(num_buckets))
        return out

    hits = bucketed_group_agg(verified, ["h"], survivors, num_buckets)
    return _spans_from_hits(hits, window, num_buckets)


def cut_duplicate_spans(ds, window: int = 50, num_buckets: int | None = None,
                        batch_size: int = 1024,
                        rolling: bool | None = None,
                        broadcast_cap: int = DUP_SPAN_BROADCAST_CAP):
    """Rewrite the corpus with duplicated substrings removed, keeping ONE
    occurrence globally (the Lee et al. 2021 cut policy, distributed):

    * keeper election per duplicated window hash: the (min doc_id, min
      start) occurrence survives (deterministic, shuffle-free to decide
      inside the hash bucket),
    * a token is cut iff it is covered by >= 1 NON-keeper duplicated
      window and by NO keeper window of the same doc,
    * the cut is by exact CHARACTER spans of the removed tokens
      (token_regex ``finditer`` offsets) — all surviving bytes,
      separators included, are preserved verbatim.

    ``rolling`` auto-tiers exactly like ``duplicate_spans``: above
    ``DUP_SPAN_ROLLING_MIN_DOCS`` the window hashes come from the
    rolling-fingerprint candidate + md5-verify plan
    (``_verified_window_hashes`` — the emit stage stops md5-hashing
    every window of the corpus); below it every window is md5-hashed
    map-side in one pipeline execution. Keeper election runs on the md5
    hashes in both tiers, so the rewrite is bit-identical (pinned by
    test).

    Exchanges: window hashes by hash bucket (elect keepers), then
    flagged windows co-shuffled with the TEXT rows by doc bucket
    (tagged union — the same single-exchange trick as
    functions/join.bucketed_hash_join) for the per-doc rewrite.
    Returns (doc_id, clean_text, n_cut_tokens). Re-running
    ``duplicate_spans`` on the output finds nothing (pinned by test)."""
    from search_engine_ray.stages.agg import (
        bucketed_group_agg,
        resolve_num_buckets,
    )

    tok_re = token_regex()
    num_buckets = resolve_num_buckets(num_buckets, ds)
    if rolling is None:
        try:
            rolling = ds.count() >= DUP_SPAN_ROLLING_MIN_DOCS
        except Exception:
            rolling = True
    if rolling:
        hashed = _verified_window_hashes(ds, window, num_buckets,
                                         batch_size, broadcast_cap)
    else:
        hashed = ds.map_batches(WindowHashBatch(window, num_buckets),
                                batch_format="pyarrow",
                                batch_size=batch_size)

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["doc_id"].transform("nunique")
        g = g.loc[nd >= 2, ["h", "doc_id", "start"]]
        if not len(g):
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "start": pd.Series(dtype="int64"),
                "keeper": pd.Series(dtype="int64"),
                "text": pd.Series(dtype="str"),
                "dbucket": pd.Series(dtype="int64")})
        g = g.sort_values(["h", "doc_id", "start"])
        first = ~g["h"].duplicated()
        out = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "start": g["start"].to_numpy(),
            "keeper": first.to_numpy().astype(np.int64),
            # empty string, NOT None: an all-None block would type the
            # column null and break the union with the text rows
            "text": "",
        })
        out["dbucket"] = out["doc_id"].to_numpy() % np.int64(num_buckets)
        return out

    if hashed is None:  # no cross-doc candidates: identity rewrite
        def identity(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(),
                "clean_text": b["text"].fillna("").astype(object),
                "n_cut_tokens": np.int64(0),
            })

        return ds.map_batches(identity, batch_format="pandas",
                              batch_size=batch_size)
    if rolling:
        flagged = bucketed_group_agg(hashed, ["h"], elect, num_buckets)
    else:
        flagged = hashed.groupby("hbucket").map_groups(
            elect, batch_format="pandas")

    def tag_text(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "start": np.int64(-1),
            "keeper": np.int64(0),
            "text": b["text"].astype(object),
            "dbucket": b["doc_id"].to_numpy() % np.int64(num_buckets),
        })

    tagged = ds.map_batches(tag_text, batch_format="pandas",
                            batch_size=batch_size).union(flagged)

    def rewrite(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        wins = g[g["start"] >= 0]
        by_doc = {d: sub for d, sub in wins.groupby("doc_id")}
        for row in g[g["start"] < 0].itertuples(index=False):
            text = row.text or ""
            sub = by_doc.get(row.doc_id)
            if sub is None or not len(sub):
                out.append((row.doc_id, text, 0))
                continue
            spans = [m.span() for m in tok_re.finditer(text)]
            n = len(spans)
            cut = np.zeros(n, dtype=bool)
            keep = np.zeros(n, dtype=bool)
            for s, k in zip(sub["start"].to_numpy(),
                            sub["keeper"].to_numpy()):
                lo = int(s) - 1  # starts are 1-based token positions
                (keep if k else cut)[lo:lo + window] = True
            drop = np.flatnonzero(cut & ~keep)
            if not len(drop):
                out.append((row.doc_id, text, 0))
                continue
            pieces, prev = [], 0
            for i in drop:
                a, b = spans[i]
                pieces.append(text[prev:a])
                prev = b
            pieces.append(text[prev:])
            out.append((row.doc_id, "".join(pieces), int(len(drop))))
        return pd.DataFrame(out, columns=["doc_id", "clean_text",
                                          "n_cut_tokens"])

    return tagged.groupby("dbucket").map_groups(rewrite,
                                                batch_format="pandas")


def cross_near_dups(ds_new, ds_ref, shingle_k: int = 5,
                    threshold: float = 0.5, batch_size: int = 2048,
                    num_buckets: int = 64):
    """Cross-corpus exact near-dedup: flag every NEW-corpus document
    whose shingle-set Jaccard vs some REFERENCE-corpus document reaches
    ``threshold`` — the fresh-crawl-vs-training-set decontamination
    sweep (the document-level complement of the 8-gram eval
    decontamination in functions/webtext).

    Composition, all corpus-shaped: run the LOSSLESS prefix-filtering
    join (``ngram_jaccard_near_dups`` — provably equal to brute force)
    over the tagged union of both corpora, then two
    ``bucketed_hash_join``s of the PAIR list (pair-sized, never
    corpus-sized) against the (doc_id, side) projections to keep only
    cross-side pairs. Returns (doc_new, doc_ref, jaccard).

    ``doc_id``s must be globally unique across the two corpora (they
    are blake2b64(url)-derived engine-wide, so this holds by
    construction for real corpora)."""
    from search_engine_ray.functions.join import bucketed_hash_join

    def proj(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "_side": pa.array(
                    np.full(batch.num_rows, side, dtype=np.int64)),
            })
        return f

    tagged = ds_new.map_batches(proj(1), batch_format="pyarrow",
                                batch_size=batch_size).union(
        ds_ref.map_batches(proj(0), batch_format="pyarrow",
                           batch_size=batch_size))
    sides = tagged.select_columns(["doc_id", "_side"]).materialize()
    pairs = ngram_jaccard_near_dups(
        tagged.select_columns(["doc_id", "text"]),
        shingle_k=shingle_k, threshold=threshold, batch_size=batch_size)

    a_side = sides.map_batches(
        lambda b: b.rename_columns(["a_id", "side_a"]),
        batch_format="pyarrow")
    b_side = sides.map_batches(
        lambda b: b.rename_columns(["b_id", "side_b"]),
        batch_format="pyarrow")
    j1 = bucketed_hash_join(pairs, a_side, "doc_a", "a_id",
                            num_buckets=num_buckets)
    j2 = bucketed_hash_join(j1, b_side, "doc_b", "b_id",
                            num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["side_a"] != df["side_b"]]
        new_is_a = df["side_a"].to_numpy() == 1
        return pd.DataFrame({
            "doc_new": np.where(new_is_a, df["doc_a"], df["doc_b"])
                .astype(np.int64),
            "doc_ref": np.where(new_is_a, df["doc_b"], df["doc_a"])
                .astype(np.int64),
            "jaccard": df["jaccard"].to_numpy(),
        })

    return j2.map_batches(finish, batch_format="pandas")


def corpus_diff(ds_old, ds_new, num_buckets: int = 64,
                batch_size: int = 4096):
    """CDC between two corpus snapshots: (doc_id, status) for every doc
    whose membership or content changed — status in {'added',
    'removed', 'changed'} (unchanged docs emit nothing). 'changed' =
    same doc_id, different md5(text).

    This is the input feed for incremental index maintenance: route
    'removed' + the old side of 'changed' to ``incremental.apply_delta``
    removals and 'added' + the new side of 'changed' to its adds, and
    the index follows the snapshot without a rebuild (the vecindex
    ``apply_ivf_delta`` consumes the same split).

    Scale shape: each side projects to (doc_id, md5) map-side — 48
    bytes/doc, never text — then ONE tagged-union exchange on the doc_id
    bucket compares the sides per doc. The md5 convention matches
    ``exact_dedup``/DuckDB, so the diff is SQL-reproducible."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    def project(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "md5": pa.array(
                    [hashlib.md5((t or "").encode()).hexdigest()
                     for t in texts], pa.string()),
                "side": pa.array(
                    np.full(len(texts), side, dtype=np.int8)),
            })

        return fn

    both = ds_old.map_batches(project(0), batch_format="pyarrow",
                              batch_size=batch_size).union(
        ds_new.map_batches(project(1), batch_format="pyarrow",
                           batch_size=batch_size))

    def compare(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.pivot_table(index="doc_id", columns="side", values="md5",
                            aggfunc="first")
        old = piv[0] if 0 in piv.columns else pd.Series(index=piv.index,
                                                        dtype=object)
        new = piv[1] if 1 in piv.columns else pd.Series(index=piv.index,
                                                        dtype=object)
        status = np.where(
            old.isna(), "added",
            np.where(new.isna(), "removed",
                     np.where(old != new, "changed", "")))
        out = pd.DataFrame({"doc_id": piv.index.to_numpy(np.int64),
                            "status": status})
        return out[out["status"] != ""]

    return bucketed_group_agg(both, ["doc_id"], compare, num_buckets)
