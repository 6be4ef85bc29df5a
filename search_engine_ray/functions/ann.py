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
    local = ds.map_batches(
        BatchTopK, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4),
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
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
             batch_size: int = 4096, round_to: int = 6):
    """Approximate top-k: only vectors whose LSH bucket matches the query's
    bucket are scored. Same output schema as brute_force_topk."""
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

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_matrix(batch.column("embedding")))
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            vb = ((vecs @ self._planes) > 0).astype(np.int64)
            vb = (vb * (1 << np.arange(vb.shape[1], dtype=np.int64))).sum(axis=1)
            out_q, out_v, out_s = [], [], []
            for qi in range(self._q.shape[0]):
                mask = vb == self._qb[qi]
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


def cosine_near_dup_pairs(ds, threshold: float = 0.95, n_planes: int = 10,
                          batch_size: int = 4096):
    """Embedding near-dup pairs via LSH bucket groupby -> exact verify."""
    planes_holder: dict = {}

    def add_bucket(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_matrix(batch.column("embedding")))
        if "lsh" not in planes_holder:
            planes_holder["lsh"] = HyperplaneLSH(vecs.shape[1], n_planes)
        b = planes_holder["lsh"].bucket_of(vecs)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
                "bucket": pa.array(b, pa.int64()),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.asarray(g["embedding"].tolist(), dtype=np.float64))
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        vecs, ids = vecs[order], ids[order]
        sims = vecs @ vecs.T
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_c.append(round(float(sims[i, j]), 6))
        return pd.DataFrame(
            {
                "vec_a": pd.Series(out_a, dtype="int64"),
                "vec_b": pd.Series(out_b, dtype="int64"),
                "cos": pd.Series(out_c, dtype="float64"),
            }
        )

    with_b = ds.map_batches(add_bucket, batch_format="pyarrow",
                            batch_size=batch_size)
    return with_b.groupby("bucket").map_groups(verify, batch_format="pandas")
