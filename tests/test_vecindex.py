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


def _list_contents(root) -> pd.DataFrame:
    """Every (vec_id, list_id, embedding-tuple) in the index, canonical
    order — the content-identity canonicalization for delta tests."""
    import pyarrow.dataset as pds

    t = pds.dataset(os.path.join(root, "lists"), format="parquet",
                    partitioning="hive").to_table()
    df = t.to_pandas()
    df["emb"] = df["embedding"].map(tuple)
    return (df[["vec_id", "list_id", "emb"]]
            .astype({"vec_id": "int64", "list_id": "int64"})
            .sort_values(["vec_id"]).reset_index(drop=True))


def test_apply_ivf_delta_equals_scratch_rebuild(ray_session, tmp_path):
    """Adds + removes + an update through apply_ivf_delta must leave the
    index CONTENT bit-identical to a scratch rebuild of the updated
    corpus with the SAME codebook, and full-probe search must equal
    brute force over the updated corpus."""
    import ray.data as rd
    import pyarrow as pa

    from search_engine_ray.functions.ann import brute_force_topk
    from search_engine_ray.pipelines.embeddings import (
        load_embeddings,
        query_matrix,
    )
    from search_engine_ray.vecindex import (
        IvfSearcher,
        VecIndexConfig,
        apply_ivf_delta,
        build_ivf_index,
    )

    base = load_embeddings(SF).to_pandas()
    root = str(tmp_path / "ivf")
    cfg = VecIndexConfig(n_centroids=8, sample_size=10_000, seed=17)
    build_ivf_index(rd.from_pandas(base), root, cfg)
    C = np.load(os.path.join(root, "centroids.npy"))

    rng = np.random.default_rng(5)
    dim = len(base["embedding"].iloc[0])
    remove = base["vec_id"].iloc[[3, 40, 127]].tolist()
    upd_id = int(base["vec_id"].iloc[200])
    new_ids = [10_001, 10_002, 10_003]
    new_vecs = [rng.standard_normal(dim).tolist() for _ in new_ids]
    upd_vec = rng.standard_normal(dim).tolist()

    adds = pa.table({
        "vec_id": pa.array(new_ids + [upd_id], pa.int64()),
        "embedding": pa.array(new_vecs + [upd_vec],
                              pa.list_(pa.float64())),
    })
    m = apply_ivf_delta(root, adds=rd.from_arrow(adds),
                        remove_ids=remove + [upd_id])
    assert m["n_vectors"] == len(base) - 3 + 3  # update is remove+add
    assert m["last_delta"] == {"added": 4, "removed": 4}

    # scratch rebuild of the UPDATED corpus with the same codebook
    upd = base[~base["vec_id"].isin(remove + [upd_id])].copy()
    upd = pd.concat([upd, pd.DataFrame({
        "vec_id": new_ids + [upd_id],
        "embedding": [np.asarray(v) for v in new_vecs + [upd_vec]],
    })], ignore_index=True)
    root2 = str(tmp_path / "ivf_scratch")
    build_ivf_index(rd.from_pandas(upd[["vec_id", "embedding"]]), root2,
                    cfg, codebook=C)
    pd.testing.assert_frame_equal(_list_contents(root), _list_contents(root2))

    # full probe == brute force over the updated corpus
    q = query_matrix(SF)
    got = _canon(IvfSearcher(root).search(q, k=10, n_probe=8))
    want = _canon(brute_force_topk(
        rd.from_pandas(upd[["vec_id", "embedding"]]), q, k=10).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_ann_delta_cli(ray_session, tmp_path):
    """ann-delta job: remove two ids + add one vector, verify the
    manifest counts and that a full-probe query finds the new vector."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    env = dict(os.environ, RAY_ADDRESS="")
    root = str(tmp_path / "ivf")
    emb = os.path.join(SF, "embeddings.parquet")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "ann-build",
         "--input", emb, "--root", root, "--n-centroids", "8"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    n0 = json.loads(r.stdout.strip().splitlines()[-1])["n_vectors"]

    addp = str(tmp_path / "adds.parquet")
    dim = 64
    pq.write_table(pa.table({
        "vec_id": pa.array([99_999], pa.int64()),
        "embedding": pa.array(
            [np.linspace(-1, 1, dim).tolist()], pa.list_(pa.float64())),
    }), addp)
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "ann-delta",
         "--root", root, "--add", addp, "--remove", "0,1"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["n_vectors"] == n0 - 2 + 1

    qp = str(tmp_path / "q.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([0], pa.int64()),
        "embedding": pa.array(
            [np.linspace(-1, 1, dim).tolist()], pa.list_(pa.float64())),
    }), qp)
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "ann-query",
         "--root", root, "--queries", qp, "-k", "1", "--n-probe", "8"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    rows = json.loads(r.stdout.strip().splitlines()[-1])
    assert rows[0]["vec_id"] == 99_999 and rows[0]["cos"] == 1.0


def test_fsck_vecindex_green_and_detects_tamper(built, tmp_path):
    import shutil

    import pyarrow.parquet as pq_

    from search_engine_ray.fsck import verify_vecindex

    root, cfg, m = built
    rep = verify_vecindex(root, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["checks"]["vectors"] == m["n_vectors"]

    # tamper 1: move a list file into the WRONG partition -> deep
    # assignment check + (possibly) structural counts flag it
    bad = str(tmp_path / "bad1")
    shutil.copytree(root, bad)
    lists = sorted(d for d in os.listdir(os.path.join(bad, "lists"))
                   if d.startswith("list_id="))
    src = os.path.join(bad, "lists", lists[0])
    dst = os.path.join(bad, "lists", lists[1])
    fname = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    os.rename(os.path.join(src, fname),
              os.path.join(dst, "smuggled-" + fname))
    rep = verify_vecindex(bad, deep=True)
    assert not rep["ok"]
    assert any("not nearest" in e for e in rep["errors"])

    # tamper 2: duplicate vec_id (a delta double-insert)
    bad2 = str(tmp_path / "bad2")
    shutil.copytree(root, bad2)
    src = os.path.join(bad2, "lists", lists[0])
    fname = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    t = pq_.read_table(os.path.join(src, fname))
    pq_.write_table(t.slice(0, 1),
                    os.path.join(src, "delta-999999.parquet"))
    rep = verify_vecindex(bad2)
    assert not rep["ok"]
    assert any("duplicate vec_id" in e or "n_vectors" in e
               for e in rep["errors"])

    # CLI routing: a vecindex root goes through verify_vecindex
    env = {**os.environ, "RAY_GRAFT_CPUS": "2"}
    res = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "fsck",
         "--index", root, "--deep"],
        capture_output=True, text=True, env=env)
    assert res.returncode == 0, res.stdout + res.stderr
    rep = json.loads(res.stdout.strip().splitlines()[-1])
    assert rep["ok"] and rep["checks"]["vectors"] == m["n_vectors"]
