"""Hybrid retrieval: BM25 lexical + embedding-cosine semantic top-k
fused with Reciprocal Rank Fusion (Cormack et al. 2009, SIGIR — the
standard score-free fusion: rrf(d) = sum over lists 1/(K + rank_d)).

The two legs reuse the existing engines end to end: BM25 comes from the
shared positions-on documents index (one LocalSearcher over-fetch per
query, ranks re-broken on the ORIGINAL doc_id exactly like
bm25_topk_docs); cosine comes from functions.ann.brute_force_topk
(broadcast query matrix, blocked matmul per batch, per-block top-k).
``embeddings.vec_id`` is aligned with ``documents.doc_id`` by the
testdata contract, so the fusion join is the identity.

Scale shape: each leg is already distributed; the fusion itself touches
only 2 x depth rows per query on the driver. depth (the per-leg list
length) bounds both the transfer and the quality — the standard RRF
deployment knob.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from search_engine_ray.pipelines.documents import ensure_documents_index
from search_engine_ray.pipelines.embeddings import load_embeddings

# (label, bm25 terms, query vec_id) — vec ids point into embeddings
HYBRID_QUERIES: list[tuple[str, list[str], int]] = [
    ("hybrid:stream|window@0", ["stream", "window"], 0),
    ("hybrid:batch@1", ["batch"], 1),
    ("hybrid:customer|vector@2", ["customer", "vector"], 2),
]

RRF_K = 60  # the paper's (and every engine's) default constant


def _bm25_ranked(searcher, terms: list[str], depth: int
                 ) -> list[tuple[int, int]]:
    """[(orig doc_id, rank)] for the OR query, rank order
    (score desc, ORIGINAL doc_id asc) — engine ties break on the
    internal hashed id, so over-fetch the boundary and re-break on the
    original id (the bm25_topk_docs convention)."""
    res = searcher.search(terms, "or", k=depth + 50)
    rows = sorted(
        (-sc, int(u[6:]))
        for u, sc in zip(res.column("url").to_pylist(),
                         res.column("score").to_pylist()))[:depth]
    return [(d, r + 1) for r, (_, d) in enumerate(rows)]


def _cos_ranked(sf_dir: str, vec_ids: list[int], depth: int
                ) -> dict[int, list[tuple[int, int]]]:
    """vec_id -> [(doc_id, rank)] by (cos desc, vec_id asc), one
    distributed brute-force pass for ALL hybrid queries."""
    import os

    import pyarrow.parquet as pq

    from search_engine_ray.functions.ann import brute_force_topk

    # query vectors: predicate-pushdown parquet read — row-group stats
    # prune to the query rows; the DRIVER holds only len(vec_ids) rows,
    # never the corpus-sized embedding table
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", list(set(vec_ids)))])
    pos = {int(v): i for i, v in enumerate(t.column("vec_id").to_numpy())}
    vecs = t.column("embedding")
    queries = np.asarray([vecs[pos[v]].as_py() for v in vec_ids],
                         dtype=np.float64)
    top = brute_force_topk(load_embeddings(sf_dir), queries,
                           k=depth).to_pandas()
    out: dict[int, list[tuple[int, int]]] = {}
    for qi, v in enumerate(vec_ids):
        g = top[top["query_id"] == qi].sort_values(
            ["cos", "vec_id"], ascending=[False, True], kind="mergesort")
        out[v] = [(int(d), r + 1) for r, d in enumerate(g["vec_id"])]
    return out


def hybrid_topk(sf_dir: str, k: int = 10, depth: int = 50,
                rrf_k: int = RRF_K) -> pa.Table:
    """(query, doc_id, rrf_score, bm25_rank, cos_rank) top-k per hybrid
    query by (rrf desc, doc_id asc); absent-from-a-list legs contribute
    0 and report rank 0. rrf rounded 6 dp (SQL replay)."""
    from search_engine_ray.search import LocalSearcher

    searcher = LocalSearcher(ensure_documents_index(sf_dir))
    cos = _cos_ranked(sf_dir, [v for _, _, v in HYBRID_QUERIES], depth)
    out_q, out_d, out_s, out_rb, out_rc = [], [], [], [], []
    for label, terms, vec_id in HYBRID_QUERIES:
        rb = dict(_bm25_ranked(searcher, terms, depth))
        rc = dict(cos[vec_id])
        fused = []
        for d in set(rb) | set(rc):
            s = (1.0 / (rrf_k + rb[d]) if d in rb else 0.0) \
                + (1.0 / (rrf_k + rc[d]) if d in rc else 0.0)
            fused.append((-s, d))
        for neg_s, d in sorted(fused)[:k]:
            out_q.append(label)
            out_d.append(d)
            out_s.append(round(-neg_s, 6))
            out_rb.append(rb.get(d, 0))
            out_rc.append(rc.get(d, 0))
    return pa.table({
        "query": pa.array(out_q, pa.string()),
        "doc_id": pa.array(out_d, pa.int64()),
        "rrf_score": pa.array(out_s, pa.float64()),
        "bm25_rank": pa.array(out_rb, pa.int64()),
        "cos_rank": pa.array(out_rc, pa.int64()),
    })
