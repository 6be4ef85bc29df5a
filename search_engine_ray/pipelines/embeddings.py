"""Similarity-search pipelines over the driver's ``embeddings`` table
(``vec_id:int64, embedding:list<float>, label:int32``)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from search_engine_ray.functions.textstats import round_half_away

ANN_K = 10
N_QUERY_VECS = 5


def load_embeddings(sf_dir: str):
    # matmul-heavy consumers: 128 KiB blocks keep cores busy at test
    # scale without Ray's ~2xCPU oversplit of a tiny file
    from search_engine_ray.sources import sized_read_parquet
    return sized_read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"],
                              min_block_bytes=128 << 10)


def query_matrix(sf_dir: str) -> np.ndarray:
    """The fixed query set: the first N_QUERY_VECS vectors by vec_id."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy())[:N_QUERY_VECS]
    vecs = t.column("embedding").to_pylist()
    return np.asarray([vecs[i] for i in order], dtype=np.float64)


def ann_bruteforce_topk(sf_dir: str):
    """Exact cosine top-k -> (query_id, vec_id, cos) — SQL-checkable."""
    from search_engine_ray.functions.ann import brute_force_topk

    return brute_force_topk(load_embeddings(sf_dir), query_matrix(sf_dir),
                            k=ANN_K)


def _with_recall(approx, exact, k: int):
    """Append per-query ``recall_at_k`` (|approx ∩ brute-force| / k) so
    the rows-only driver check certifies RETRIEVAL QUALITY, not just
    shape. Both inputs are k x n_queries result sets — driver-side set
    math on ~50 rows, not a corpus operation."""
    import pyarrow as pa

    ap = approx.to_pandas()
    ex = exact.to_pandas()
    truth = ex.groupby("query_id")["vec_id"].agg(set).to_dict()
    rec = {}
    for q, sub in ap.groupby("query_id"):
        t = truth.get(q, set())
        rec[q] = round(len(set(sub["vec_id"]) & t) / max(1, len(t)), 6)
    ap["recall_at_k"] = ap["query_id"].map(rec).astype("float64")
    return pa.Table.from_pandas(ap, preserve_index=False)


def ann_lsh_topk(sf_dir: str):
    """LSH-bucketed approximate top-k with per-query recall@k vs the
    brute-force truth (rows-only check; the recall column is pinned by
    tests/test_entry_contract.py)."""
    from search_engine_ray.functions.ann import brute_force_topk, lsh_topk

    q = query_matrix(sf_dir)
    approx = lsh_topk(load_embeddings(sf_dir), q, k=ANN_K, n_probe=2)
    exact = brute_force_topk(load_embeddings(sf_dir), q, k=ANN_K)
    return _with_recall(approx, exact, ANN_K)


def ann_ivf_topk(sf_dir: str):
    """IVF-codebook approximate top-k with per-query recall@k vs the
    brute-force truth (rows-only check; exactness anchor — n_probe ==
    n_centroids == brute force — is pinned by tests/test_functions.py)."""
    from search_engine_ray.functions.ann import brute_force_topk, ivf_topk

    q = query_matrix(sf_dir)
    approx = ivf_topk(load_embeddings(sf_dir), q, k=ANN_K,
                      n_centroids=16, n_probe=6)
    exact = brute_force_topk(load_embeddings(sf_dir), q, k=ANN_K)
    return _with_recall(approx, exact, ANN_K)


def embedding_near_dups(sf_dir: str, threshold: float = 0.5):
    """Embedding-cosine near-duplicate pairs (rows-only).

    Threshold 0.5 for the random testdata embeddings (their max off-diag
    cosine is ~0.51 — production near-dup corpora use ~0.95). Random
    embeddings at a 0.5 threshold are LSH-adversarial (60-degree angle),
    so recall comes from table count: 8 independent 2-plane tables give
    1-(1-(2/3)^2)^8 ~ 0.99 pair recall; at production thresholds the
    auto-sized default (n_planes=None) is the right call. The result is
    materialized to a schema-stable pyarrow table so an empty result still
    carries its columns.
    """
    import pandas as pd
    import pyarrow as pa

    from search_engine_ray.functions.ann import cosine_near_dup_pairs

    df = cosine_near_dup_pairs(load_embeddings(sf_dir), threshold=threshold,
                               n_planes=2, n_tables=8).to_pandas()
    if df.empty or "vec_a" not in df.columns:
        df = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                           "vec_b": pd.Series(dtype="int64"),
                           "cos": pd.Series(dtype="float64")})
    return pa.Table.from_pandas(df[["vec_a", "vec_b", "cos"]],
                                preserve_index=False)


def embedding_near_dups_exact(sf_dir: str, threshold: float = 0.4):
    """EXACT all-pairs cosine near-dups — SQL-hash-checked against DuckDB
    ``list_cosine_similarity`` brute force. Threshold 0.4 yields a
    meaningful pair set on the random testdata embeddings (~60 pairs at
    sf0.01); the approximate ``embedding_near_dups`` is anchored to this
    result by test (approx ⊆ exact)."""
    from search_engine_ray.functions.ann import cosine_all_pairs_exact

    return cosine_all_pairs_exact(load_embeddings(sf_dir),
                                  threshold=threshold)


def quantize_int8(sf_dir: str):
    """Symmetric per-vector int8 quantization (the embedding-compression
    step of a 100 TB vector pipeline — 4x smaller than float32 before
    any index): q_i = round_half_away(e_i * 127 / max|e|), scale =
    max|e| / 127; all-zero vectors quantize to zeros with scale 0.

    Pure vectorized map — no shuffle. Quantized values are emitted as a
    comma-joined string (`q_csv`) so the cross-engine value hash
    compares exact list CONTENT, not container formatting."""
    import pyarrow as pa

    def quant(batch: pa.Table) -> pa.Table:
        import numpy as np

        embs = batch.column("embedding")
        ids = batch.column("vec_id")
        out_scale, out_csv = [], []
        m = np.stack([np.asarray(e, dtype=np.float64)
                      for e in embs.to_pylist()])
        amax = np.abs(m).max(axis=1)
        scale = np.where(amax > 0, amax / 127.0, 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.where(amax[:, None] > 0, m * (127.0 / amax[:, None]),
                         0.0)
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        for i in range(len(m)):
            out_scale.append(round_half_away(scale[i]))
            out_csv.append(",".join(str(v) for v in q[i]))
        return pa.table({
            "vec_id": ids,
            "scale": pa.array(out_scale, pa.float64()),
            "q_csv": pa.array(out_csv, pa.string()),
        })

    return load_embeddings(sf_dir).map_batches(
        quant, batch_format="pyarrow", batch_size=1024)


def embedding_near_dups_all(sf_dir: str):
    """embedding_near_dups (multi-table LSH, t=0.5) + the exact
    all-pairs twin (t=0.4) as one tagged union — (method, vec_a, vec_b,
    cos), method in {'lsh', 'exact'} (merged driver entry; both remain
    standalone operators). The exact set at the lower threshold is a
    superset anchor: every 'lsh' pair must also appear under 'exact'."""
    import pandas as pd
    import pyarrow as pa

    lsh = embedding_near_dups(sf_dir).to_pandas()
    exact = embedding_near_dups_exact(sf_dir).to_pandas()
    lsh.insert(0, "method", "lsh")
    exact.insert(0, "method", "exact")
    out = pd.concat([lsh, exact], ignore_index=True)
    return pa.Table.from_pandas(out[["method", "vec_a", "vec_b", "cos"]],
                                preserve_index=False)
