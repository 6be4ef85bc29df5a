"""Corpus unicode normalization (functions/webtext.unicode_normalize):
NFC twin vs DuckDB's nfc_normalize, NFKC goldens, control/zero-width
strip, whitespace collapse, and the dedup-key stabilization it exists
for (CCNet, Wenzek 2020 S4.1 normalizes before hashing).

All non-ASCII fixture text is built from \\u escapes so no editor or
tool can silently re-normalize the fixtures themselves.
"""

import hashlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from search_engine_ray.functions.webtext import (
    UnicodeNormalizeBatch,
    unicode_normalize,
)

DECOMPOSED_CAFE = "Cafe\u0301"        # e + COMBINING ACUTE
COMPOSED_CAFE = "Caf\u00e9"           # precomposed e-acute


def test_nfc_matches_duckdb(ray_session, tmp_path):
    texts = [DECOMPOSED_CAFE + " du Monde",
             "\u00c5ngstr\u00f6m",         # composed stays
             "\u00c5 + \u212b",            # ring A + ANGSTROM SIGN
             "plain ascii", "", None]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    p = str(tmp_path / "u.parquet")
    pq.write_table(t, p)
    eng = unicode_normalize(
        rd.read_parquet(p), form="NFC", strip_controls=False) \
        .to_pandas().sort_values("doc_id")["text"].tolist()
    want = duckdb.sql(f"""
        SELECT CASE WHEN text IS NULL THEN NULL
               ELSE nfc_normalize(text) END AS t
        FROM read_parquet('{p}') ORDER BY doc_id
    """).df()["t"].tolist()
    want = [None if w is None or w != w else w for w in want]
    assert eng == want
    assert eng[0] == COMPOSED_CAFE + " du Monde"


def test_nfkc_controls_whitespace(ray_session):
    k = UnicodeNormalizeBatch(form="NFKC", strip_controls=True,
                              collapse_ws=True)
    cases = {
        "\ufb01le \u2460": "file 1",   # fi-ligature + circled one
        "\uff21\uff22": "AB",          # fullwidth A B
        "a\u200bb c\x1bd": "ab cd",    # zero-width + ESC control
        "a \t  b\nc": "a b\nc",       # collapse; newline kept
        "x\u00a0y": "x y",              # NBSP -> NFKC space
        "\ufeffbom": "bom",             # BOM stripped
    }
    t = pa.table({"text": pa.array(list(cases), pa.string())})
    assert k(t).column("text").to_pylist() == list(cases.values())

    with pytest.raises(ValueError):
        UnicodeNormalizeBatch(form="NFX")

    # through the Dataset surface: other columns pass through untouched
    ds = rd.from_items(
        [{"doc_id": 7, "text": "\ufb03x", "lang": "en"}])
    out = unicode_normalize(ds, form="NFKC").to_pandas()
    assert out.iloc[0]["text"] == "ffix"
    assert out.iloc[0]["doc_id"] == 7 and out.iloc[0]["lang"] == "en"


def test_normalization_stabilizes_dedup_keys():
    a, b = DECOMPOSED_CAFE, COMPOSED_CAFE  # same glyphs, two encodings
    assert hashlib.md5(a.encode()).digest() != \
        hashlib.md5(b.encode()).digest()
    k = UnicodeNormalizeBatch(form="NFC", strip_controls=False)
    na, nb = k(pa.table({"text": pa.array([a, b])})) \
        .column("text").to_pylist()
    assert na == nb == COMPOSED_CAFE


def test_curate_normalize_flag(ray_session, tmp_path):
    """curate --normalize NFKC rewrites text before the gates; kept
    output text is the normalized form and the eval-shingle pass sees
    the same normalization (keys agree)."""
    import json
    import subprocess
    import sys

    filler = ("the data of table and value for index in row stream it "
              "is that a to batch sort key scan merge part hash fast")
    deco = filler + " cafe\u0301 \ufb01nal words"
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([deco, "tiny"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(t, src)
    out = tmp_path / "curated"
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "curate",
         "--input", str(src), "--out", str(out),
         "--normalize", "NFKC"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["reasons"].get("kept", 0) == 1
    kept = duckdb.sql(
        f"SELECT text FROM read_parquet('{out}/keep=1/*.parquet')"
    ).df()["text"].tolist()
    assert kept == [filler + " caf\u00e9 final words"]
