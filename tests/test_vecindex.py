"""Persisted IVF vector index (vecindex.py): bit-identity with the
in-memory ivf_topk pipeline, brute-force anchor at full probe, resume
semantics, and the ann-build/ann-query CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from search_engine_ray.pipelines.embeddings import load_embeddings
    from search_engine_ray.vecindex import VecIndexConfig, build_ivf_index

    root = str(tmp_path_factory.mktemp("vecidx") / "ivf")
    cfg = VecIndexConfig(n_centroids=16, sample_size=10_000, seed=17)
    m = build_ivf_index(load_embeddings(SF), root, cfg)
    return root, cfg, m


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(["query_id", "vec_id"])
            .reset_index(drop=True)
            .astype({"query_id": "int64", "vec_id": "int64"}))


def test_manifest_counts(built):
    root, cfg, m = built
    assert m["n_vectors"] == 500 and m["n_lists"] == 16
    assert os.path.exists(os.path.join(root, "centroids.npy"))


def test_searcher_equals_inmemory_ivf(built):
    """Same codebook (shared train_codebook) + same probe maths ==>
    the persisted index must return EXACTLY ivf_topk's rows."""
    from search_engine_ray.functions.ann import ivf_topk
    from search_engine_ray.pipelines.embeddings import (
        load_embeddings,
        query_matrix,
    )
    from search_engine_ray.vecindex import IvfSearcher

    q = query_matrix(SF)
    root, cfg, _ = built
    for n_probe in (2, 6):
        got = _canon(IvfSearcher(root).search(q, k=10, n_probe=n_probe))
        want = _canon(ivf_topk(load_embeddings(SF), q, k=10,
                               n_centroids=cfg.n_centroids, n_probe=n_probe,
                               sample_size=cfg.sample_size,
                               seed=cfg.seed).to_pandas())
        pd.testing.assert_frame_equal(got, want)


def test_full_probe_equals_bruteforce(built):
    from search_engine_ray.functions.ann import brute_force_topk
    from search_engine_ray.pipelines.embeddings import (
        load_embeddings,
        query_matrix,
    )
    from search_engine_ray.vecindex import IvfSearcher

    q = query_matrix(SF)
    root, cfg, _ = built
    got = _canon(IvfSearcher(root).search(q, k=10,
                                          n_probe=cfg.n_centroids))
    want = _canon(brute_force_topk(load_embeddings(SF), q,
                                   k=10).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_probe_prunes_partitions(built):
    """The scale property: a 1-probe search must touch exactly one list
    directory (partition pruning is what makes the artifact an index)."""
    from search_engine_ray.pipelines.embeddings import query_matrix
    from search_engine_ray.vecindex import IvfSearcher

    root, _, _ = built
    s = IvfSearcher(root)
    read_dirs = []
    orig = s._read_lists

    def spy(list_ids):
        read_dirs.append(list(map(int, list_ids)))
        return orig(list_ids)

    s._read_lists = spy
    s.search(query_matrix(SF)[:1], k=5, n_probe=1)
    assert read_dirs == [read_dirs[0]] and len(read_dirs[0]) == 1


def test_resume_and_config_change(built, ray_session):
    from search_engine_ray.pipelines.embeddings import load_embeddings
    from search_engine_ray.vecindex import (
        IvfSearcher,
        VecIndexConfig,
        build_ivf_index,
    )

    root, cfg, _ = built
    mpath = os.path.join(root, "manifest.json")
    mtime = os.path.getmtime(mpath)
    m2 = build_ivf_index(load_embeddings(SF), root, cfg)  # resume: no-op
    assert os.path.getmtime(mpath) == mtime and m2["n_vectors"] == 500
    # changed config rebuilds
    cfg2 = VecIndexConfig(n_centroids=8, sample_size=10_000, seed=17)
    m3 = build_ivf_index(load_embeddings(SF), root, cfg2)
    assert m3["n_lists"] == 8
    assert IvfSearcher(root).centroids.shape[0] == 8
    # restore the module-scoped fixture's index for any later test
    build_ivf_index(load_embeddings(SF), root, cfg)


def test_missing_manifest_raises(tmp_path):
    from search_engine_ray.vecindex import IvfSearcher

    with pytest.raises(FileNotFoundError):
        IvfSearcher(str(tmp_path / "nope"))


def test_ann_cli_build_and_query(tmp_path):
    import pyarrow.parquet as pq

    root = str(tmp_path / "ivf")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "ann-build",
         "--input", f"{SF}/embeddings.parquet", "--root", root,
         "--n-centroids", "8"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["n_vectors"] == 500 and m["n_lists"] == 8

    # use the first rows of the embeddings table as the query file
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy())[:3]
    pq.write_table(t.take(order), str(tmp_path / "q.parquet"))
    r2 = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "ann-query",
         "--root", root, "--queries", str(tmp_path / "q.parquet"),
         "-k", "5", "--n-probe", "8"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    rows = json.loads(r2.stdout.strip().splitlines()[-1])
    assert len(rows) == 15  # 3 queries x k=5 at full probe
    by_q = {}
    for row in rows:
        by_q.setdefault(row["query_id"], []).append(row)
    # each query's own vector must be its top hit at full probe
    for qi, sub in by_q.items():
        best = max(sub, key=lambda r: r["cos"])
        assert best["cos"] == pytest.approx(1.0, abs=1e-6)
