"""Hybrid BM25 + cosine retrieval with RRF fusion: full DuckDB replay
(both legs' rank lists + the fusion arithmetic) on the sf0.001 testdata,
plus structural invariants."""

import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _hybrid_sql(depth: int, k: int, rrf_k: int = 60) -> str:
    from search_engine_ray.functions.textstats import sql_token_pattern

    tok = sql_token_pattern()
    bm25_partial = ("tf.tf*(1.2+1)/(tf.tf + 1.2*"
                    "(1 - 0.75 + 0.75*(dl.dl/stats.avgdl)))")
    idf = "ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5))"
    return f"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '{tok}'))
                     AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                 (SELECT count(*)::DOUBLE FROM toks)
                 / (SELECT count(*)::DOUBLE FROM documents) AS avgdl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
q(query, term, vec_id) AS (VALUES
    ('hybrid:stream|window@0', 'stream', 0),
    ('hybrid:stream|window@0', 'window', 0),
    ('hybrid:batch@1', 'batch', 1),
    ('hybrid:customer|vector@2', 'customer', 2),
    ('hybrid:customer|vector@2', 'vector', 2)),
scores AS (SELECT q.query, tf.doc_id,
                  sum({idf} * {bm25_partial}) AS score
           FROM q JOIN tf ON tf.term = q.term
                 JOIN df ON df.term = q.term
                 JOIN dl ON dl.doc_id = tf.doc_id
           CROSS JOIN stats GROUP BY q.query, tf.doc_id),
bm AS (SELECT query, doc_id, rb FROM (
           SELECT query, doc_id, row_number() OVER
               (PARTITION BY query ORDER BY score DESC, doc_id) AS rb
           FROM scores) WHERE rb <= {depth}),
qv AS (SELECT DISTINCT query, vec_id FROM q),
qe AS (SELECT qv.query, e.embedding::DOUBLE[] AS v
       FROM qv JOIN embeddings e ON e.vec_id = qv.vec_id),
sims AS (SELECT qe.query, e.vec_id AS doc_id,
                list_cosine_similarity(qe.v, e.embedding::DOUBLE[]) AS cos
         FROM qe CROSS JOIN embeddings e),
cosr AS (SELECT query, doc_id, rc FROM (
             SELECT query, doc_id, row_number() OVER
                 (PARTITION BY query ORDER BY cos DESC, doc_id) AS rc
             FROM sims) WHERE rc <= {depth}),
fused AS (SELECT query, doc_id,
                 coalesce(1.0/({rrf_k} + rb), 0)
                 + coalesce(1.0/({rrf_k} + rc), 0) AS rrf,
                 coalesce(rb, 0) AS bm25_rank,
                 coalesce(rc, 0) AS cos_rank
          FROM bm FULL JOIN cosr USING (query, doc_id))
SELECT query, doc_id, round(rrf, 6) AS rrf_score, bm25_rank, cos_rank
FROM (SELECT *, row_number() OVER
          (PARTITION BY query ORDER BY rrf DESC, doc_id) AS rn
      FROM fused)
WHERE rn <= {k}
ORDER BY query, rrf_score DESC, doc_id
"""


@pytest.mark.parametrize("depth,k", [(50, 10), (20, 5)])
def test_hybrid_matches_sql_replay(ray_session, depth, k):
    from search_engine_ray.pipelines.hybrid import hybrid_topk

    eng = hybrid_topk(SF, k=k, depth=depth).to_pandas() \
        .sort_values(["query", "rrf_score", "doc_id"],
                     ascending=[True, False, True]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{os.path.join(SF, 'documents.parquet')}')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{os.path.join(SF, 'embeddings.parquet')}')")
    want = con.execute(_hybrid_sql(depth, k)).df()
    pd.testing.assert_frame_equal(
        eng, want.astype({"doc_id": "int64", "bm25_rank": "int64",
                          "cos_rank": "int64"}), check_dtype=False)


def test_hybrid_invariants(ray_session):
    from search_engine_ray.pipelines.hybrid import HYBRID_QUERIES, hybrid_topk

    t = hybrid_topk(SF, k=10, depth=50).to_pandas()
    assert set(t["query"]) == {q for q, _, _ in HYBRID_QUERIES}
    for _, g in t.groupby("query"):
        assert len(g) == 10
        # descending fused score, doc_id tie-break
        assert (g["rrf_score"].to_numpy()[:-1]
                >= g["rrf_score"].to_numpy()[1:]).all()
        # a doc in BOTH legs outscores the best single-leg-only doc at
        # equal ranks: rank-1-in-both > anything with one leg absent
        both = g[(g["bm25_rank"] > 0) & (g["cos_rank"] > 0)]
        single = g[(g["bm25_rank"] == 0) | (g["cos_rank"] == 0)]
        if len(both) and len(single):
            assert both["rrf_score"].max() > single["rrf_score"].max()
        # every rank is within depth
        assert g["bm25_rank"].max() <= 50 and g["cos_rank"].max() <= 50
    # the cosine self-match (query vec is also a corpus vector) is rank 1
    q0 = t[t["query"] == "hybrid:stream|window@0"]
    self_row = q0[q0["doc_id"] == 0]
    assert len(self_row) == 1 and int(self_row["cos_rank"].iloc[0]) == 1
