"""Approximate / exact nearest-neighbour search over an embedding column.

Input: ``embeddings``-shaped Dataset (``vec_id:int64, embedding:list<float>``).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is broadcast
  (``ray.put`` once, fetched in each task), each batch does one float64
  numpy matmul and emits only its LOCAL top-k per query (so the shuffle
  carries k x n_queries rows per batch, not the whole corpus), and a final
  per-query group merge takes the global top-k. This is the baseline and
  the oracle target (DuckDB list_cosine_similarity).
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets; each query
  probes only its own bucket. Approximate (rows-only check).
* ``cosine_near_dup_pairs`` — embedding near-duplicate pairs (cos >= t)
  via the same LSH bucketing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(batch_col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (float64 so the math
    matches DuckDB's double-precision cosine)."""
    arr = batch_col.combine_chunks() if hasattr(batch_col, "combine_chunks") else batch_col
    lists = arr.to_pylist()
    return np.asarray(lists, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BatchTopK:
    """Stateful stage: holds the normalized query matrix (fetched from the
    object store ONCE per actor), emits per-batch local top-k."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref)
        self._q = _normalize(np.asarray(q, dtype=np.float64))  # (nq, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _matrix(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sims = _normalize(vecs) @ self._q.T  # (n, nq)
        k = min(self.k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            idx = np.argpartition(-col, k - 1)[:k] if k < col.size else np.arange(col.size)
            for j in idx:
                out_q.append(qi)
                out_v.append(int(vec_ids[j]))
                out_s.append(float(col[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk(g: pd.DataFrame, k: int, round_to: int) -> pd.DataFrame:
    g = g.sort_values(["cos", "vec_id"], ascending=[False, True],
                      kind="mergesort").head(k)
    g["cos"] = g["cos"].round(round_to)
    return g


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     batch_size: int = 4096, round_to: int = 6):
    """Exact cosine top-k -> (query_id, vec_id, cos)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    # task-based on warm workers (pool.cached_stage): the stage state is
    # one broadcast fetch + a normalize — actor-process spawn would cost
    # more than the whole stage at bench scale
    from search_engine_ray.pool import cached_stage

    local = ds.map_batches(
        cached_stage(BatchTopK, qref, k),
        batch_format="pyarrow", batch_size=batch_size,
    )
    return local.groupby("query_id").map_groups(
        _final_topk, batch_format="pandas",
        fn_kwargs={"k": k, "round_to": round_to},
    )


class HyperplaneLSH:
    """Random-hyperplane signature stage (shared by index and query sides)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits.astype(np.int64)
                * (1 << np.arange(bits.shape[1], dtype=np.int64))).sum(axis=1)


def lsh_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 6,
             batch_size: int = 4096, round_to: int = 6, n_probe: int = 1):
    """Approximate top-k: only vectors whose LSH bucket is within Hamming
    distance ``n_probe`` of the query's bucket are scored (multi-probe —
    probing the 1-bit-flip neighbours recovers most of the recall a single
    bucket loses). Same output schema as brute_force_topk."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    lsh = HyperplaneLSH(q.shape[1], n_planes)
    q_buckets = lsh.bucket_of(q)
    qref = ray.put(q)
    bref = ray.put(q_buckets)
    planes_ref = ray.put(lsh.planes)

    class BucketedTopK:
        def __init__(self):
            self._q = ray.get(qref)
            self._qb = ray.get(bref)
            self._planes = ray.get(planes_ref)
            self.k = k
            # probe sets computed once per actor: bucket ids within
            # Hamming distance n_probe of each query bucket
            def expand(b: int, d: int) -> set[int]:
                out = {b}
                frontier = {b}
                for _ in range(d):
                    frontier = {f ^ (1 << i)
                                for f in frontier for i in range(n_planes)}
                    out |= frontier
                return out

            self._probes = [np.array(sorted(expand(int(b), n_probe)),
                                     dtype=np.int64) for b in self._qb]

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_matrix(batch.column("embedding")))
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            vb = ((vecs @ self._planes) > 0).astype(np.int64)
            vb = (vb * (1 << np.arange(vb.shape[1], dtype=np.int64))).sum(axis=1)
            out_q, out_v, out_s = [], [], []
            for qi in range(self._q.shape[0]):
                mask = np.isin(vb, self._probes[qi])
                if not mask.any():
                    continue
                sims = vecs[mask] @ self._q[qi]
                ids = vec_ids[mask]
                kk = min(self.k, sims.size)
                idx = (np.argpartition(-sims, kk - 1)[:kk]
                       if kk < sims.size else np.arange(sims.size))
                for j in idx:
                    out_q.append(qi)
                    out_v.append(int(ids[j]))
                    out_s.append(float(sims[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int32()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cos": pa.array(out_s, pa.float64()),
                }
            )

    local = ds.map_batches(BucketedTopK, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=(1, 4))
    return local.groupby("query_id").map_groups(
        _final_topk, batch_format="pandas",
        fn_kwargs={"k": k, "round_to": round_to},
    )


def _kmeans(sample: np.ndarray, k: int, seed: int, iters: int = 10
            ) -> np.ndarray:
    """Deterministic spherical k-means on a normalized sample: seeded
    k-means++ init, Lloyd iterations with renormalized means. Pure numpy,
    driver-side — the sample is small by construction."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    k = min(k, n)
    # k-means++ seeding on cosine distance (1 - dot)
    cent = [sample[int(rng.integers(n))]]
    for _ in range(1, k):
        d = 1.0 - np.max(np.stack([sample @ c for c in cent]), axis=0)
        d = np.clip(d, 1e-12, None)
        probs = d / d.sum()
        cent.append(sample[int(rng.choice(n, p=probs))])
    C = np.stack(cent)
    for _ in range(iters):
        assign = np.argmax(sample @ C.T, axis=1)
        for j in range(k):
            m = sample[assign == j]
            if len(m):
                C[j] = m.sum(axis=0)
        C = _normalize(C)
    return C


def train_codebook(ds, n_centroids: int, sample_size: int = 10_000,
                   seed: int = 17) -> np.ndarray:
    """Deterministic IVF codebook from an unbiased seeded sample — the
    shared trainer for the in-memory ``ivf_topk`` and the persisted
    ``vecindex.build_ivf_index`` (both must agree bit-for-bit so the
    persisted index is provably the in-memory pipeline + a layout).

    A first-N sample would bias the codebook on any corpus
    sorted/clustered by a key and degrade recall at partial n_probe.
    Take ALL sampled rows (expected 2x sample_size — a ``.limit()``
    here would keep the first-in-dataset-order rows and re-introduce
    front-of-corpus bias), sort by vec_id (take_all block order varies
    run to run, and k-means++ seeding is index-dependent), then
    seeded-subsample down to sample_size — every corpus region is
    equally represented, bit-for-bit reproducible."""
    n_rows = ds.count()
    emb = ds.select_columns(["vec_id", "embedding"])
    if n_rows > sample_size:
        frac = min(1.0, (2.0 * sample_size) / n_rows)
        emb = emb.random_sample(frac, seed=seed)
    rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    if len(rows) > sample_size:
        rng = np.random.default_rng(seed)
        keep = rng.choice(len(rows), size=sample_size, replace=False)
        rows = [rows[i] for i in np.sort(keep)]
    sample = _normalize(np.asarray([r["embedding"] for r in rows],
                                   dtype=np.float64))
    return _kmeans(sample, n_centroids, seed)


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
             n_probe: int = 4, sample_size: int = 10_000, seed: int = 17,
             batch_size: int = 4096, round_to: int = 6):
    """IVF (inverted-file) approximate top-k — the classic scale path for
    ANN: a spherical k-means codebook from a driver-side sample, one
    assignment pass over the corpus, and each query scores ONLY the
    vectors in its ``n_probe`` nearest centroid lists (corpus fraction
    ~ n_probe/n_centroids). ``n_probe == n_centroids`` scores everything
    and is EXACTLY brute_force_topk (the correctness anchor in tests).
    Same output schema as brute_force_topk."""
    import ray

    C = train_codebook(ds, n_centroids, sample_size, seed)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    # per-query probe set: its n_probe nearest centroids
    q_cent = np.argsort(-(q @ C.T), axis=1)[:, :min(n_probe, C.shape[0])]
    cref = ray.put(C)
    qref = ray.put(q)
    pref = ray.put(q_cent)

    class IVFTopK:
        def __init__(self):
            self._C = ray.get(cref)
            self._q = ray.get(qref)
            self._probes = ray.get(pref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_matrix(batch.column("embedding")))
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            assign = np.argmax(vecs @ self._C.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for qi in range(self._q.shape[0]):
                mask = np.isin(assign, self._probes[qi])
                if not mask.any():
                    continue
                sims = vecs[mask] @ self._q[qi]
                ids = vec_ids[mask]
                kk = min(self.k, sims.size)
                idx = (np.argpartition(-sims, kk - 1)[:kk]
                       if kk < sims.size else np.arange(sims.size))
                for j in idx:
                    out_q.append(qi)
                    out_v.append(int(ids[j]))
                    out_s.append(float(sims[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int32()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cos": pa.array(out_s, pa.float64()),
                }
            )

    local = ds.map_batches(IVFTopK, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=(1, 4))
    return local.groupby("query_id").map_groups(
        _final_topk, batch_format="pandas",
        fn_kwargs={"k": k, "round_to": round_to},
    )


def _auto_n_planes(n_rows: int, target_bucket: int = 512,
                   lo: int = 2, hi: int = 24) -> int:
    """Plane count sized to the corpus: expected bucket population
    n / 2^P ~ target_bucket, clamped. At 10^10 vectors this yields ~24
    planes; at the 500-row sandbox it yields the minimum."""
    import math

    return min(hi, max(lo, int(math.ceil(
        math.log2(max(2.0, n_rows / target_bucket))))))


def cosine_near_dup_pairs(ds, threshold: float = 0.95,
                          n_planes: int | None = None, n_tables: int = 4,
                          batch_size: int = 4096, bucket_cap: int = 4096,
                          seed: int = 13, verify_block: int = 512):
    """Embedding near-dup pairs (cos >= threshold) at any corpus size.

    Scale shape:

    * ``n_planes`` defaults to corpus-sized (``_auto_n_planes``) so the
      expected bucket stays small — the per-bucket verify is O(bucket^2),
      never O(corpus^2);
    * ``n_tables`` independent hyperplane tables raise recall
      (1-(1-p^P)^T): a pair missed by one table's banding is caught by
      another; candidate pairs are deduped across tables;
    * hot buckets beyond ``bucket_cap`` are truncated WITH a logged count
      (a hot bucket means near-identical vectors — representatives
      survive), and the in-bucket matmul is blocked (``verify_block``) so
      per-task memory is bounded regardless of bucket size.
    """
    import logging

    logger = logging.getLogger("search_engine_ray.ann")
    if n_planes is None:
        n_planes = _auto_n_planes(ds.count())
    holder: dict = {}

    def add_buckets(batch: pa.Table) -> pa.Table:
        """Replicate each vector into its bucket of every table (T small,
        documented shuffle-volume multiplier)."""
        vecs = _normalize(_matrix(batch.column("embedding")))
        if "tables" not in holder:
            holder["tables"] = [
                HyperplaneLSH(vecs.shape[1], n_planes, seed=seed + 9973 * t)
                for t in range(n_tables)
            ]
        parts = []
        for t, lsh in enumerate(holder["tables"]):
            b = lsh.bucket_of(vecs)
            parts.append(pa.table(
                {
                    "vec_id": batch.column("vec_id"),
                    "embedding": batch.column("embedding"),
                    "table_id": pa.array(
                        np.full(len(b), t, dtype=np.int32)),
                    "bucket": pa.array(b, pa.int64()),
                }
            ))
        return pa.concat_tables(parts)

    _EMPTY = pd.DataFrame(
        {"vec_a": pd.Series(dtype="int64"),
         "vec_b": pd.Series(dtype="int64"),
         "cos": pd.Series(dtype="float64")})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _EMPTY
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        g = g.iloc[order]
        ids = ids[order]
        if len(ids) > bucket_cap:
            logger.warning(
                "cosine near-dup: bucket of %d > cap=%d truncated "
                "(%d vectors dropped)", len(ids), bucket_cap,
                len(ids) - bucket_cap)
            g = g.iloc[:bucket_cap]
            ids = ids[:bucket_cap]
        vecs = _normalize(np.asarray(g["embedding"].tolist(),
                                     dtype=np.float64))
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        B = verify_block
        for i0 in range(0, n, B):
            ai = vecs[i0:i0 + B]
            for j0 in range(i0, n, B):
                sims = ai @ vecs[j0:j0 + B].T
                ii, jj = np.nonzero(sims >= threshold)
                gi, gj = ii + i0, jj + j0
                keep = gi < gj  # strict upper triangle across blocks
                for x, y, s in zip(gi[keep], gj[keep],
                                   sims[ii[keep], jj[keep]]):
                    out_a.append(int(ids[x]))
                    out_b.append(int(ids[y]))
                    out_c.append(round(float(s), 6))
        return pd.DataFrame(
            {
                "vec_a": pd.Series(out_a, dtype="int64"),
                "vec_b": pd.Series(out_b, dtype="int64"),
                "cos": pd.Series(out_c, dtype="float64"),
            }
        )

    def per_partition(gdf: pd.DataFrame) -> pd.DataFrame:
        """All (table, bucket) groups of one coarse shuffle partition —
        ONE Python call per partition, not per LSH bucket (the shuffle key
        cardinality at scale is n_tables x 2^n_planes; see stages/agg.py)."""
        outs = [verify(sub) for _, sub
                in gdf.groupby(["table_id", "bucket"], sort=False)
                if len(sub) >= 2]
        return (pd.concat(outs, ignore_index=True)
                if outs else _EMPTY.copy())

    with_b = ds.map_batches(add_buckets, batch_format="pyarrow",
                            batch_size=batch_size)
    from search_engine_ray.stages.agg import (
        bucketed_distinct,
        bucketed_group_agg,
        resolve_num_buckets,
    )

    nb = resolve_num_buckets(None, ds)  # raw-input lineage (with_b has none)
    pairs = bucketed_group_agg(with_b, ["table_id", "bucket"],
                               per_partition, nb)
    # several tables can propose the same pair — dedup on the pair key
    return bucketed_distinct(pairs, ["vec_a", "vec_b", "cos"], nb)


def cosine_all_pairs_exact(ds, threshold: float = 0.5,
                           block_rows: int = 4096, round_to: int = 6):
    """EXACT all-pairs cosine near-dups (``round(cos, 6) >= threshold``) —
    the quadratic exactness anchor for ``cosine_near_dup_pairs``, same
    output schema ``(vec_a, vec_b, cos)``.

    Shape: one streaming pass snapshots L2-normalized row blocks into the
    object store (the driver holds ONE block at a time, never the corpus),
    then ONE Ray task per upper-triangle block pair runs a bounded
    ``block_rows x block_rows`` matmul; results assemble via
    ``from_arrow_refs`` (pair tables never transit the driver). O(n^2/2)
    FLOPs by definition — usable to ~1M vectors; beyond that the
    LSH-bucketed ``cosine_near_dup_pairs`` is the scale path. Raw Ray
    tasks are justified here: a self cross-join of blocks is not
    expressible as a Dataset transform; every block pair is independent
    (no partitioning assumption). SQL oracle: DuckDB
    ``list_cosine_similarity`` over ``DOUBLE[]`` — hash-identical at 6dp.
    """
    import ray
    import ray.data as rd

    refs = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=block_rows):
        ids = b.column("vec_id").to_numpy()
        mat = _normalize(_matrix(b.column("embedding")))
        refs.append(ray.put((ids, mat)))

    @ray.remote
    def block_pair(a, b, same: bool) -> pa.Table:
        ids_a, ma = a
        ids_b, mb = b
        cf = np.round(ma @ mb.T, round_to)
        if same:
            iu, ju = np.triu_indices(len(ids_a), 1)
            keep = cf[iu, ju] >= threshold
            va, vb = ids_a[iu[keep]], ids_b[ju[keep]]
            cv = cf[iu[keep], ju[keep]]
        else:
            ia, ib = np.nonzero(cf >= threshold)
            va, vb, cv = ids_a[ia], ids_b[ib], cf[ia, ib]
        lo = np.minimum(va, vb)
        hi = np.maximum(va, vb)
        return pa.table({"vec_a": pa.array(lo, pa.int64()),
                         "vec_b": pa.array(hi, pa.int64()),
                         "cos": pa.array(cv, pa.float64())})

    if not refs:
        return rd.from_arrow(pa.table(
            {"vec_a": pa.array([], pa.int64()),
             "vec_b": pa.array([], pa.int64()),
             "cos": pa.array([], pa.float64())}))
    futs = [block_pair.remote(refs[i], refs[j], i == j)
            for i in range(len(refs)) for j in range(i, len(refs))]
    return rd.from_arrow_refs(futs)


def assign_clusters(ds, codebook: np.ndarray, batch_size: int = 4096):
    """Nearest-centroid (max cosine) assignment pass: appends an int32
    ``cluster`` column. The codebook broadcasts once (ray.put); ties
    resolve to the lowest centroid id (np.argmax), so assignments are
    deterministic given the codebook."""
    import ray

    cref = ray.put(np.asarray(codebook, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        vecs = _normalize(_matrix(batch.column("embedding")))
        cl = np.argmax(vecs @ C.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(cl))

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=batch_size)


def semantic_dedup(ds, n_clusters: int = 16, threshold: float = 0.95,
                   sample_size: int = 10_000, seed: int = 17,
                   batch_size: int = 4096, block_rows: int = 2048,
                   round_to: int = 6):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): spherical-k-means
    cluster the embeddings, then inside each cluster drop every vector
    that has an EARLIER (lower vec_id) cluster-mate with
    ``round(cos, round_to) >= threshold`` — semantic near-duplicates
    never survive twice, and the survivor set is deterministic
    (keep-first, the exact-dedup convention). Returns the DROPPED rows
    as ``(vec_id, keeper_id, cluster, cos)`` where ``keeper_id`` is the
    lowest-id qualifying neighbor; the kept corpus is
    ``ds`` minus these vec_ids.

    Scale shape: one broadcast assignment pass + ONE cluster-keyed
    exchange; the within-cluster kernel is a blocked
    ``block_rows x cluster`` matmul (bounded memory), quadratic only in
    the CLUSTER size — size ``n_clusters ~ n / 10k`` at scale (SemDeDup
    uses 50k clusters for LAION) so the per-group work stays flat. The
    pairwise-within-cluster restriction is the paper's own
    approximation; the exactness anchor in tests is a literal
    full-matrix within-cluster twin under the SAME codebook."""
    C = train_codebook(ds, n_clusters, sample_size, seed)

    _EMPTY = pd.DataFrame(
        {"vec_id": pd.Series(dtype="int64"),
         "keeper_id": pd.Series(dtype="int64"),
         "cluster": pd.Series(dtype="int32"),
         "cos": pd.Series(dtype="float64")})

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _EMPTY
        g = g.sort_values("vec_id", kind="mergesort")
        ids = g["vec_id"].to_numpy()
        M = _normalize(np.stack(
            [np.asarray(e, dtype=np.float64) for e in g["embedding"]]))
        n = len(ids)
        drop_i: list[np.ndarray] = []
        keep_j: list[np.ndarray] = []
        sims: list[np.ndarray] = []
        for s in range(1, n, block_rows):
            e = min(s + block_rows, n)
            # rows s..e scored against ALL earlier rows 0..e (then the
            # j < i triangle mask) — ids are sorted, so the FIRST
            # qualifying column is the minimum keeper_id
            sim = np.round(M[s:e] @ M[:e].T, round_to)
            jcol = np.arange(e)
            mask = (sim >= threshold) & (jcol[None, :]
                                         < np.arange(s, e)[:, None])
            hit = mask.any(axis=1)
            if not hit.any():
                continue
            first = np.argmax(mask[hit], axis=1)
            rows = np.flatnonzero(hit)
            drop_i.append(rows + s)
            keep_j.append(first)
            sims.append(sim[rows, first])
        if not drop_i:
            return _EMPTY
        di = np.concatenate(drop_i)
        kj = np.concatenate(keep_j)
        return pd.DataFrame(
            {"vec_id": ids[di].astype(np.int64),
             "keeper_id": ids[kj].astype(np.int64),
             "cluster": np.full(di.size, int(g["cluster"].iloc[0]),
                                dtype=np.int32),
             "cos": np.concatenate(sims)})

    return (assign_clusters(ds, C, batch_size)
            .groupby("cluster")
            .map_groups(per_cluster, batch_format="pandas"))


def knn_join(ds_left, ds_right, k: int = 10, batch_size: int = 1024,
             block_rows: int = 4096, round_to: int = 6,
             exclude_self: bool = False):
    """Exact cosine kNN JOIN: for every left vector, its ``k`` nearest
    right vectors -> (left_id, right_id, rank, cos); ties break
    (cos desc, right_id asc) after 6-dp rounding, the repo convention.

    Scale shape: the RIGHT side snapshots once into normalized
    object-store blocks (one streaming pass; each worker ray.get is a
    zero-copy shared-memory read, so the right side lives in plasma
    ONCE per node, not per actor); the LEFT side streams through
    map_batches, each batch keeping a bounded candidate set (k per
    right block) and selecting its final top-k locally — NO shuffle and
    no groupby: a batch's output is final. O(|L| x |R|) FLOPs by
    definition — the exactness anchor; when the right side outgrows
    plasma, the IVF path (train_codebook + probe the nearest lists,
    ``ivf_topk``) is the approximate scale twin. ``exclude_self=True``
    drops left_id == right_id matches (kNN-graph over one corpus)."""
    import ray
    import ray.data as rd

    refs = []
    for b in ds_right.iter_batches(batch_format="pyarrow",
                                   batch_size=block_rows):
        ids = b.column("vec_id").to_numpy().astype(np.int64)
        refs.append(ray.put((ids, _normalize(_matrix(b.column("embedding"))))))

    if not refs:
        return rd.from_arrow(pa.table(
            {"left_id": pa.array([], pa.int64()),
             "right_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int32()),
             "cos": pa.array([], pa.float64())}))

    class KnnJoinBatch:
        def __init__(self):
            self._refs = refs

        def __call__(self, batch: pa.Table) -> pa.Table:
            lids = batch.column("vec_id").to_numpy().astype(np.int64)
            L = _normalize(_matrix(batch.column("embedding")))
            na = len(lids)
            cand_s, cand_i = [], []
            for ref in self._refs:
                rids, R = ray.get(ref)  # zero-copy plasma read
                sims = np.round(L @ R.T, round_to)
                if exclude_self:
                    eq = lids[:, None] == rids[None, :]
                    sims = np.where(eq, -np.inf, sims)
                kk = min(k, sims.shape[1])
                # per-row top-kk by (cos desc, right_id asc): a plain
                # argpartition keeps ARBITRARY members of a cos-tie at
                # the boundary and could drop the lowest-id candidate
                rmat = np.broadcast_to(rids, sims.shape)
                part = np.lexsort((rmat, -sims), axis=1)[:, :kk]
                cand_s.append(np.take_along_axis(sims, part, axis=1))
                cand_i.append(rids[part])
            S = np.concatenate(cand_s, axis=1)   # (na, k*n_blocks)
            Ids = np.concatenate(cand_i, axis=1)
            # final per-row selection: (cos desc, right_id asc)
            order = np.lexsort((Ids, -S), axis=1)
            kk = min(k, S.shape[1])
            sel = order[:, :kk]
            s_out = np.take_along_axis(S, sel, axis=1)
            i_out = np.take_along_axis(Ids, sel, axis=1)
            good = np.isfinite(s_out)            # exclude_self leftovers
            rank = np.broadcast_to(np.arange(1, kk + 1, dtype=np.int32),
                                   s_out.shape)
            lrep = np.repeat(lids, kk).reshape(na, kk)
            return pa.table(
                {"left_id": pa.array(lrep[good], pa.int64()),
                 "right_id": pa.array(i_out[good], pa.int64()),
                 "rank": pa.array(rank[good], pa.int32()),
                 "cos": pa.array(s_out[good], pa.float64())})

    from search_engine_ray.pool import actor_pool_size

    return ds_left.map_batches(
        KnnJoinBatch, batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool_size())
