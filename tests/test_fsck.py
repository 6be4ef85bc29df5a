"""Index integrity checker: green on a healthy index, red on tampering."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages
from search_engine_ray.fsck import verify_index


@pytest.fixture()
def idx(ray_session, tmp_path):
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(generate_pages(60, seed=9), str(pdir / "p.parquet"))
    root = str(tmp_path / "idx")
    build_index(str(pdir), root, BuildConfig(num_buckets=4))
    return root


def test_healthy_index_passes(idx):
    rep = verify_index(idx, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["checks"]["deep_tf_vs_doclen"] > 0


def test_detects_stats_tampering(idx):
    p = os.path.join(idx, "global_stats.json")
    s = json.load(open(p))
    s["total_tokens"] += 7
    json.dump(s, open(p, "w"))
    rep = verify_index(idx)
    assert not rep["ok"]
    assert any("total_tokens" in e or "avgdl" in e for e in rep["errors"])


def test_detects_swapped_bucket(idx):
    """A bucket file restored into the wrong slot (the torn-rsync case):
    every term hash-routes to the wrong bucket."""
    a = os.path.join(idx, "buckets", "bucket=0", "postings.parquet")
    b = os.path.join(idx, "buckets", "bucket=1", "postings.parquet")
    shutil.copy(b, a)
    rep = verify_index(idx)
    assert not rep["ok"]
    assert any("wrong bucket" in e or "n_terms" in e for e in rep["errors"])


def test_detects_truncated_docs_clean(idx):
    d = os.path.join(idx, "docs_clean")
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    t = pq.read_table(os.path.join(d, files[0]))
    pq.write_table(t.slice(0, max(t.num_rows - 3, 0)),
                   os.path.join(d, files[0]))
    rep = verify_index(idx, deep=True)
    assert not rep["ok"]


def test_detects_missing_docmap(idx):
    shutil.rmtree(os.path.join(idx, "docmap"))
    rep = verify_index(idx)
    assert not rep["ok"]
    assert any("docmap" in e for e in rep["errors"])


def test_sharded_fsck(ray_session, tmp_path):
    """Sharded root passes (incl. sidecar df == cross-shard sum); a
    tampered sidecar df is caught."""
    from search_engine_ray.fsck import verify_sharded
    from search_engine_ray.sharded import build_sharded

    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(generate_pages(50, seed=13), str(pdir / "p.parquet"))
    root = str(tmp_path / "sharded")
    build_sharded(str(pdir), root, num_doc_shards=3,
                  config=BuildConfig(num_buckets=4))
    rep = verify_sharded(root, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["checks"]["shards"] == 3
    assert rep["checks"]["sidecar_buckets"] == 4
    # tamper: bump one sidecar df
    p = os.path.join(root, "term_stats", "bucket=0", "df.parquet")
    t = pq.read_table(p).to_pandas()
    t.loc[0, "df"] += 1
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), p)
    rep = verify_sharded(root)
    assert not rep["ok"]
    assert any("sidecar" in e for e in rep["errors"])
