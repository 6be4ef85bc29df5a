"""Embedding-generation stage (functions/embed.py): the model-in-actor
inference shape over raw text. The model is a real dependency-free
baseline (hashed unigram+bigram features x seeded Gaussian projection,
L2-normalized), so everything here is exact and deterministic."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_embedder_deterministic_across_actors():
    """Two independently-constructed actors (fresh __init__, like two
    pool workers on different nodes) embed identically."""
    import pyarrow as pa

    from search_engine_ray.functions.embed import EmbedBatch

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["spark row batch column", "totally different words here"],
    })
    a = EmbedBatch(dim=32, seed=5)(batch)
    b = EmbedBatch(dim=32, seed=5)(batch)
    assert a.equals(b)
    # a different seed is a different model
    c = EmbedBatch(dim=32, seed=6)(batch)
    assert not a.column("embedding").equals(c.column("embedding"))


def test_embedder_unit_norm_and_empty_text():
    import pyarrow as pa

    from search_engine_ray.functions.embed import EmbedBatch

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["some ordinary document text", "", None],
    })
    out = EmbedBatch(dim=16)(batch)
    emb = np.asarray(out.column("embedding").to_pylist(), dtype=np.float32)
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(emb[0]), 1.0, rtol=1e-5)
    # empty / null text -> all-zero vector (no NaNs from 0-norm divide)
    assert np.all(emb[1] == 0.0) and np.all(emb[2] == 0.0)


def test_embedder_cosine_structure():
    """Near-duplicate texts must be closer than unrelated texts —
    the property every downstream dedup/ANN operator relies on."""
    import pyarrow as pa

    from search_engine_ray.functions.embed import EmbedBatch

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank while the sun sets slowly behind distant mountains")
    near = base.replace("slowly", "quickly").replace("river", "creek")
    far = ("parquet codec shuffles posting lists through arrow buffers "
           "inside the object store with zero copy semantics")
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, near, far],
    })
    emb = np.asarray(EmbedBatch(dim=64)(batch)
                     .column("embedding").to_pylist(), dtype=np.float64)
    cos_near = float(emb[0] @ emb[1])
    cos_far = float(emb[0] @ emb[2])
    assert cos_near > 0.8, cos_near
    assert cos_near > cos_far + 0.3, (cos_near, cos_far)


def test_embed_documents_feeds_knn_join(ray_session):
    """End-to-end: text -> embed_documents (actor pool) -> self-kNN.
    Each planted near-dup pair must be mutual rank-1 neighbors."""
    import ray.data as rd

    from search_engine_ray.functions.ann import knn_join
    from search_engine_ray.functions.embed import embed_documents

    rng = np.random.default_rng(11)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lamda mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    for i in range(10):
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), 40)]
        rows.append({"doc_id": 2 * i, "text": " ".join(toks)})
        toks2 = list(toks)
        toks2[7] = "changed"
        rows.append({"doc_id": 2 * i + 1, "text": " ".join(toks2)})
    emb = embed_documents(rd.from_items(rows), dim=64).map_batches(
        lambda b: b.rename_columns(["vec_id", "embedding"]),
        batch_format="pyarrow")
    nn1 = {r["left_id"]: r["right_id"]
           for r in knn_join(emb, emb, k=1, exclude_self=True).take_all()}
    for i in range(10):
        assert nn1[2 * i] == 2 * i + 1, (2 * i, nn1[2 * i])
        assert nn1[2 * i + 1] == 2 * i, (2 * i + 1, nn1[2 * i + 1])


@pytest.mark.usefixtures("ray_session")
def test_embed_cli_output_consumable_by_knn_join(tmp_path):
    """`jobs embed` writes (vec_id, embedding) that `jobs knn-join`
    accepts unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["one shared document body text",
                 "one shared document body copy",
                 "completely unrelated vocabulary cluster"],
    }), docs)
    env = {**os.environ, "RAY_ADDRESS": ""}
    out = str(tmp_path / "emb")
    res = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "embed",
         "--input", str(docs), "--out", out, "--dim", "32"],
        capture_output=True, text=True, env=env, check=True, cwd="/root/repo")
    rep = json.loads(res.stdout.strip().splitlines()[-1])
    assert rep["dim"] == 32
    t = pq.read_table(out)
    assert t.column_names == ["vec_id", "embedding"]
    assert t.num_rows == 3
    res = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "knn-join",
         "--left", out, "--out", str(tmp_path / "knn"), "-k", "1"],
        capture_output=True, text=True, env=env, check=True, cwd="/root/repo")
    knn = pq.read_table(str(tmp_path / "knn")).to_pylist()
    nn = {r["left_id"]: r["right_id"] for r in knn}
    assert nn[1] == 2 and nn[2] == 1
