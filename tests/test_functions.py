"""Unit/integration tests for the training-data function modules
(dedup, ANN, text stats, multimodal plumbing)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest tonight").split()
    texts = []
    for i in range(20):
        words = list(base)
        words[0] = f"uniq{i}"
        np.random.default_rng(i).shuffle(words)
        texts.append(" ".join(words))
    # plant near-dups: doc 20 ~= doc 0 (one word changed), 21 == 0 exactly
    texts.append(texts[0].replace("quick", "swift"))
    texts.append(texts[0])
    t = pa.table({"doc_id": pa.array(range(22), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return rd.from_arrow(t)


def test_exact_dedup(docs_ds):
    from search_engine_ray.functions.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas()
    assert len(out) == 21  # 22 docs, one exact duplicate pair
    reps = set(out["doc_id"])
    assert 0 in reps and 21 not in reps


def test_minhash_finds_planted_near_dup(docs_ds):
    from search_engine_ray.functions.dedup import minhash_near_dups

    pairs = minhash_near_dups(docs_ds, threshold=0.5).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 21) in found  # exact dup always survives
    assert all(j >= 0.5 for j in pairs["jaccard"])


def test_simhash_finds_exact_dup(docs_ds):
    from search_engine_ray.functions.dedup import simhash_near_dups

    pairs = simhash_near_dups(docs_ds, max_hamming=3).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 21) in found
    assert all(h <= 3 for h in pairs["hamming"])


def test_ann_bruteforce_matches_numpy(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.ann import brute_force_topk

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(100), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32()))})
    queries = vecs[:3].astype(np.float64)
    out = brute_force_topk(rd.from_arrow(t), queries, k=5).to_pandas()
    v64 = vecs.astype(np.float64)
    v64 /= np.linalg.norm(v64, axis=1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = v64 @ q.T
    for qi in range(3):
        top = np.argsort(-sims[:, qi], kind="mergesort")[:5]
        got = out[out["query_id"] == qi].sort_values(
            ["cos", "vec_id"], ascending=[False, True])
        assert list(got["vec_id"]) == list(top)
        np.testing.assert_allclose(got["cos"], np.round(sims[top, qi], 6),
                                   atol=1e-6)
        # self-similarity: the query IS vector qi
        assert got.iloc[0]["vec_id"] == qi and got.iloc[0]["cos"] == 1.0


def test_ann_lsh_subset_of_bruteforce_space(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.ann import lsh_topk

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32()))})
    out = lsh_topk(rd.from_arrow(t), vecs[:2].astype(np.float64), k=5
                   ).to_pandas()
    # approximate: every returned id must at least share the query bucket,
    # and the query vector itself is always in its own bucket
    for qi in (0, 1):
        sub = out[out["query_id"] == qi]
        assert qi in set(sub["vec_id"])


def test_media_features_deterministic_and_stub(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.multimodal import (
        RealDecoder,
        media_features,
        synthetic_media,
    )

    ds1 = media_features(rd.from_arrow(synthetic_media(12))).to_pandas()
    ds2 = media_features(rd.from_arrow(synthetic_media(12))).to_pandas()
    a = ds1.sort_values("media_id").reset_index(drop=True)
    b = ds2.sort_values("media_id").reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))
    assert all(len(f) == 64 for f in a["feature"])
    with pytest.raises(NotImplementedError):
        RealDecoder().decode_image(b"xx")


def test_textstats_quality_and_langid(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.textstats import (
        LangIdBatch,
        QualityScoreBatch,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(
            ["the cat sat on the mat and it is a fine day for all of us",
             "der hund ist nicht ein katze und das ist gut",
             ""], pa.string()),
    })
    ds = rd.from_arrow(t)
    q = ds.map_batches(QualityScoreBatch(), batch_format="pyarrow").to_pandas()
    assert q.loc[q.doc_id == 1, "quality"].iloc[0] > \
        q.loc[q.doc_id == 3, "quality"].iloc[0]
    lang = ds.map_batches(LangIdBatch(), batch_format="pyarrow").to_pandas()
    assert lang.loc[lang.doc_id == 1, "lang_pred"].iloc[0] == "en"
    assert lang.loc[lang.doc_id == 2, "lang_pred"].iloc[0] == "de"
    assert lang.loc[lang.doc_id == 3, "lang_pred"].iloc[0] == "und"
