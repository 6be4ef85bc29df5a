"""DSIR importance resampling: full DuckDB SQL replay of the hashed
n-gram weight computation (md5 convention), semantic selection behavior,
Gumbel-top-k flag exactness, CLI."""

import json
import math
import os
import subprocess
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

B = 512
TOK = None  # filled from the engine's sql_token_pattern at import


def _tbl(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _fixture_docs():
    """Target slice (doc_id % 10 == 7) speaks 'astro' vocabulary; raw
    docs 1-3 share it, raw docs 4-6 speak unrelated 'cooking'."""
    texts_ids = [
        ("quasar pulsar nebula quasar redshift", 7),
        ("pulsar nebula parallax quasar", 17),
        ("nebula quasar pulsar redshift drift", 1),   # astro-like raw
        ("parallax quasar nebula pulsar", 2),          # astro-like raw
        ("redshift nebula pulsar quasar zz", 3),       # astro-like raw
        ("flour butter sugar yeast oven", 4),
        ("butter oven flour sugar salt", 5),
        ("yeast salt oven butter pan", 6),
    ]
    return _tbl([t for t, _ in texts_ids], ids=[i for _, i in texts_ids])


def _dsir_sql(n_buckets: int) -> str:
    from search_engine_ray.functions.textstats import sql_token_pattern

    tok = sql_token_pattern()
    return f"""
WITH toksl AS (SELECT doc_id, regexp_extract_all(text, '{tok}') AS ts
               FROM docs),
feats AS (
    SELECT doc_id,
           ((md5_number_lower(f) % 2305843009213693952) % {n_buckets})
               ::BIGINT AS b
    FROM (
        SELECT doc_id, unnest(ts) AS f FROM toksl
        UNION ALL
        SELECT doc_id, w1 || ' ' || w2 AS f FROM (
            SELECT doc_id, unnest(ts[1:len(ts)-1]) AS w1,
                   unnest(ts[2:len(ts)]) AS w2
            FROM toksl WHERE len(ts) >= 2))),
counts AS (
    SELECT b,
           sum(CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END)::BIGINT AS ct,
           sum(CASE WHEN doc_id % 10 = 7 THEN 0 ELSE 1 END)::BIGINT AS cr
    FROM feats GROUP BY b),
tot AS (SELECT sum(ct)::DOUBLE AS tt, sum(cr)::DOUBLE AS rt FROM counts),
ratio AS (SELECT b, ln(ct + 1) - ln(tt + {n_buckets})
                   - ln(cr + 1) + ln(rt + {n_buckets}) AS lr
          FROM counts CROSS JOIN tot),
per AS (SELECT feats.doc_id, count(*)::BIGINT AS n_feats,
               sum(ratio.lr) AS iw
        FROM feats JOIN ratio USING (b) GROUP BY feats.doc_id),
gum AS (SELECT doc_id,
               -ln(-ln((((md5_number_lower(doc_id::VARCHAR)
                          % 2305843009213693952) + 1)
                        / 2305843009213693953.0))) AS g
        FROM docs)
SELECT d.doc_id,
       (CASE WHEN d.doc_id % 10 = 7 THEN 1 ELSE 0 END)::BIGINT AS is_target,
       coalesce(per.n_feats, 0) AS n_feats,
       round(coalesce(per.iw, 0.0), 6) AS log_iw,
       round(coalesce(per.iw, 0.0) + gum.g, 6) AS gumbel_key
FROM docs d LEFT JOIN per USING (doc_id) JOIN gum USING (doc_id)
ORDER BY d.doc_id
"""


def test_weights_match_sql_replay(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.dsir import dsir_weights

    docs = _fixture_docs()
    eng = dsir_weights(rd.from_arrow(docs), n_buckets=B) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", docs)
    want = con.execute(_dsir_sql(B)).df()
    pd.testing.assert_frame_equal(
        eng[["doc_id", "is_target", "n_feats", "log_iw", "gumbel_key"]],
        want.astype({"doc_id": "int64", "is_target": "int64",
                     "n_feats": "int64"}),
        check_dtype=False)


def test_selection_prefers_target_like_docs(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.dsir import dsir_select

    out = dsir_select(rd.from_arrow(_fixture_docs()), k=3, n_buckets=B) \
        .to_pandas().set_index("doc_id")
    # astro-like raw docs carry strictly higher importance weights
    astro = out.loc[[1, 2, 3], "log_iw"]
    cooking = out.loc[[4, 5, 6], "log_iw"]
    assert astro.min() > cooking.max()
    # exactly k selected; never a target doc
    assert int(out["selected"].sum()) == 3
    assert out.loc[[7, 17], "selected"].sum() == 0
    # the selected set IS the Gumbel-top-k over raw docs
    raw = out[out["is_target"] == 0].reset_index()
    want = set(raw.sort_values(["gumbel_key", "doc_id"],
                               ascending=[False, True])
               .head(3)["doc_id"])
    assert set(out[out["selected"] == 1].index) == want


def test_k_larger_than_raw_selects_all_raw(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.dsir import dsir_select

    out = dsir_select(rd.from_arrow(_fixture_docs()), k=100,
                      n_buckets=B).to_pandas()
    assert int(out["selected"].sum()) == int((out["is_target"] == 0).sum())


def test_gumbel_is_deterministic():
    from search_engine_ray.functions.dsir import gumbel_of_doc

    assert gumbel_of_doc(42) == gumbel_of_doc(42)
    assert gumbel_of_doc(42) != gumbel_of_doc(43)
    # sane range for a Gumbel(0,1) draw
    assert -3.0 < gumbel_of_doc(7) < 30.0


def test_cli_dsir(ray_session, tmp_path):
    import pyarrow.parquet as pq

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_fixture_docs(), src)
    out = str(tmp_path / "dsir_out")
    env = {**os.environ, "RAY_GRAFT_CPUS": "2"}
    res = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "dsir",
         "--input", src, "--out", out, "-k", "3", "--buckets", str(B)],
        capture_output=True, text=True, env=env, check=True)
    rep = json.loads(res.stdout.strip().splitlines()[-1])
    assert rep["n_selected"] == 3
    assert rep["mean_iw_selected"] > rep["mean_iw_rest"]
    t = duckdb.sql(
        f"SELECT count(*) c FROM read_parquet('{out}/*.parquet')").df()
    assert int(t["c"][0]) == 8


def test_prepare_with_dsir_stage(ray_session, tmp_path):
    """prepare --dsir-k composes: filter -> line-dedup -> DSIR selection
    (models trained on the PRE-filter input so the holdout slice exists)
    -> shuffle -> sharded write. The astro-flavoured survivors (sharing
    target vocabulary with the eval doc, but no 8-gram) are selected;
    cooking docs are not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    filler = ("the data of table and value for index in row stream it "
              "is that a to batch sort key scan merge part hash fast")
    astro = "quasar pulsar nebula redshift parallax drift"
    cook = "flour butter sugar yeast oven salt"
    texts = {}
    # eval/target doc (doc_id % 10 == 7): astro vocabulary, textually
    # disjoint as a sequence (no shared 8-gram with training docs)
    texts[7] = ("quasar orbit pulsar halo nebula flux redshift wave "
                "parallax beam drift arc")
    for i, d in enumerate([0, 1, 2]):  # astro-like survivors
        texts[d] = f"{filler} a{i} {astro} x{i} {astro.upper().lower()}"
    for i, d in enumerate([3, 4, 5]):  # cooking survivors
        texts[d] = f"{filler} b{i} {cook} y{i} {cook}"
    ids = sorted(texts)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([texts[d] for d in ids], pa.string())})
    src = tmp_path / "docs.parquet"
    pq.write_table(t, str(src))
    out = tmp_path / "prepared"
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "prepare",
         "--input", str(src), "--out", str(out), "--n-shards", "2",
         "--dsir-k", "3", "--dsir-buckets", str(B)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["rows"] == 3
    import pyarrow.dataset as pds

    got = (pds.dataset(str(out), format="parquet", partitioning="hive")
           .to_table().to_pandas())
    assert sorted(got["doc_id"]) == [0, 1, 2]  # the astro survivors
    assert rep["dense_positions"] is True
