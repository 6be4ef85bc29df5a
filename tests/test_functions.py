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


def test_minhash_join_and_broadcast_paths_identical(docs_ds):
    """The scale path (two hash joins, no driver materialization) and the
    broadcast fast path must produce the IDENTICAL verified pair set with
    identical Jaccard values."""
    import ray

    from search_engine_ray.functions.dedup import minhash_near_dups

    def norm(df):
        return (df.sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True)[["doc_a", "doc_b", "jaccard"]])

    # tier 1: semi-join blob broadcast (the default at this scale)
    blob_df = norm(minhash_near_dups(docs_ds, threshold=0.5).to_pandas())
    # tier 2: forced two-join path
    join_df = norm(minhash_near_dups(docs_ds, threshold=0.5,
                                     broadcast_max_pairs=0).to_pandas())
    # tier 3: legacy broadcast texts
    rows = docs_ds.take_all()
    ref = ray.put({r["doc_id"]: r["text"] for r in rows})
    bc_df = norm(minhash_near_dups(docs_ds, threshold=0.5,
                                   texts_ref=ref).to_pandas())
    assert len(blob_df) > 0
    assert blob_df.equals(join_df)
    assert blob_df.equals(bc_df)


def test_minhash_bucket_cap_logs_truncation(ray_session, caplog):
    """A hot LSH bucket beyond bucket_cap must emit a logged truncation
    count — never a silent drop."""
    import logging

    import ray.data as rd

    from search_engine_ray.functions.dedup import minhash_near_dups

    # 12 identical docs -> every band bucket holds 12 docs > cap of 8
    t = pa.table({"doc_id": pa.array(range(12), pa.int64()),
                  "text": pa.array(["alpha beta gamma delta epsilon zeta "
                                    "eta theta iota kappa"] * 12)})
    with caplog.at_level(logging.WARNING, "search_engine_ray.dedup"):
        pairs = minhash_near_dups(rd.from_arrow(t), threshold=0.9,
                                  bucket_cap=8).to_pandas()
    # groupby/map_groups runs in-process on local Ray for small data often,
    # but the log may be emitted in a worker; assert on results instead
    # when no records were captured locally.
    assert len(pairs) == 8 * 7 // 2  # capped pair count
    if caplog.records:
        assert any("truncated" in r.message for r in caplog.records)


def test_simhash_finds_exact_dup(docs_ds):
    from search_engine_ray.functions.dedup import simhash_near_dups

    pairs = simhash_near_dups(docs_ds, max_hamming=3).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 21) in found
    assert all(h <= 3 for h in pairs["hamming"])


def test_ngram_jaccard_equals_brute_force(docs_ds):
    """The prefix-filtering self-join is LOSSLESS: the verified output must
    equal literal brute-force all-pairs exact Jaccard (same claim the
    DuckDB oracle checks at sf0.01)."""
    from search_engine_ray.functions.dedup import (
        _hashset_jaccard, _shingle_hash_array, ngram_jaccard_near_dups)
    from search_engine_ray.functions.textstats import (
        round_half_away, token_regex)

    got = ngram_jaccard_near_dups(docs_ds, threshold=0.5).to_pandas()
    got_set = sorted((int(a), int(b), float(j)) for a, b, j in
                     zip(got["doc_a"], got["doc_b"], got["jaccard"]))

    tok = token_regex()
    rows = docs_ds.take_all()
    hs = {r["doc_id"]: _shingle_hash_array(r["text"], tok, 5) for r in rows}
    ids = sorted(hs)
    bf = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not hs[a].size or not hs[b].size:
                continue
            j = _hashset_jaccard(hs[a], hs[b])
            if j >= 0.5:
                bf.append((a, b, round_half_away(j)))
    assert got_set == sorted(bf)
    assert (0, 21, 1.0) in got_set  # the planted exact dup


def test_ngram_jaccard_positional_filter_lossless_on_boilerplate(ray_session):
    """The positional filter targets exactly this shape — many otherwise-
    unrelated docs sharing one short boilerplate line (the 500k-probe
    candidate blowup). Output must STILL equal brute force: planted
    near-dup pairs survive, boilerplate-only pairs are (correctly)
    absent, at several thresholds."""
    import numpy as np
    import ray.data as rd

    from search_engine_ray.functions.dedup import (
        _hashset_jaccard, _shingle_hash_array, ngram_jaccard_near_dups)
    from search_engine_ray.functions.textstats import (
        round_half_away, token_regex)

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(400)]
    footers = [f"footer variant {i} all rights reserved" for i in range(5)]
    texts = []
    for i in range(60):
        toks = [vocab[int(j)] for j in rng.integers(0, 400, 40)]
        if i % 3 == 0:  # 20 docs share each footer -> hot prefix groups
            toks += footers[i % 5].split()
        texts.append(" ".join(toks))
        if i % 10 == 1:  # planted near-dups: mutate 2 tokens
            toks2 = list(toks)
            toks2[5], toks2[17] = "mut", "ated"
            texts.append(" ".join(toks2))
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    tok = token_regex()
    hs = {i: _shingle_hash_array(x, tok, 5) for i, x in enumerate(texts)}
    for thr in (0.3, 0.5, 0.8):
        got = ngram_jaccard_near_dups(rd.from_arrow(t), threshold=thr
                                      ).to_pandas()
        got_set = [] if got.empty else sorted(
            (int(a), int(b), float(j)) for a, b, j in
            zip(got["doc_a"], got["doc_b"], got["jaccard"]))
        bf = sorted(
            (a, b, round_half_away(_hashset_jaccard(hs[a], hs[b])))
            for a in hs for b in hs if a < b and hs[a].size and hs[b].size
            and _hashset_jaccard(hs[a], hs[b]) >= thr)
        assert got_set == bf, thr
        if thr <= 0.5:
            assert len(bf) >= 6  # the planted pairs are actually in play


def test_ngram_jaccard_edge_semantics(ray_session):
    """threshold=1.0 (prefix length collapses to the single min hash)
    still finds exact duplicates; sub-k-token docs shingle as their whole
    text; empty/None docs never pair; containment scores exactly."""
    import ray.data as rd

    from search_engine_ray.functions.dedup import ngram_jaccard_near_dups

    texts = ["short doc", "short doc", "", None,
             "one two three four five six",
             "one two three four five six seven"]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = ngram_jaccard_near_dups(rd.from_arrow(t), threshold=1.0
                                  ).to_pandas()
    assert sorted(zip(out.doc_a, out.doc_b, out.jaccard)) == [(0, 1, 1.0)]
    out2 = ngram_jaccard_near_dups(rd.from_arrow(t), threshold=0.3
                                   ).to_pandas()
    # 6-token doc's 2 shingles ⊂ 7-token doc's 3 -> J = 2/3
    assert sorted(zip(out2.doc_a, out2.doc_b, out2.jaccard)) == \
        [(0, 1, 1.0), (4, 5, 0.666667)]


def test_ngram_jaccard_tiers_identical(docs_ds):
    """Broadcast and two-join verify tiers agree for the ngram path too
    (the shared _verify_candidate_pairs contract)."""
    from search_engine_ray.functions.dedup import ngram_jaccard_near_dups

    def norm(df):
        return (df.sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True)[["doc_a", "doc_b", "jaccard"]])

    bc = norm(ngram_jaccard_near_dups(docs_ds, threshold=0.5).to_pandas())
    jn = norm(ngram_jaccard_near_dups(docs_ds, threshold=0.5,
                                      broadcast_max_pairs=0).to_pandas())
    assert len(bc) > 0
    assert bc.equals(jn)


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


def test_cosine_near_dups_planted_pair_and_capped_hot_bucket(ray_session,
                                                            caplog):
    """Multi-table banding finds a planted near-dup pair; a hot bucket of
    identical vectors is truncated to bucket_cap with a LOGGED count and
    still yields the capped pair set."""
    import logging

    import ray.data as rd

    from search_engine_ray.functions.ann import cosine_near_dup_pairs

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 16))
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16)  # planted near-dup
    t = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    out = cosine_near_dup_pairs(rd.from_arrow(t), threshold=0.95,
                                n_planes=4, n_tables=8).to_pandas()
    assert (0, 1) in set(zip(out["vec_a"], out["vec_b"]))

    # hot bucket: 20 identical vectors, cap 6 -> C(6,2)=15 pairs + log
    same = np.tile(rng.standard_normal(16), (20, 1))
    t2 = pa.table({"vec_id": pa.array(range(20), pa.int64()),
                   "embedding": pa.array(same.tolist(),
                                         pa.list_(pa.float64()))})
    with caplog.at_level(logging.WARNING, "search_engine_ray.ann"):
        out2 = cosine_near_dup_pairs(rd.from_arrow(t2), threshold=0.99,
                                     n_planes=2, n_tables=2,
                                     bucket_cap=6).to_pandas()
    assert len(out2) == 15
    if caplog.records:
        assert any("truncated" in r.message for r in caplog.records)


def test_cosine_near_dups_blocked_matmul_matches_unblocked(ray_session):
    """verify_block smaller than the bucket must not change the pair set
    (strict-upper-triangle bookkeeping across blocks)."""
    import ray.data as rd

    from search_engine_ray.functions.ann import cosine_near_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 8))
    # cluster: vectors 0..9 all close to one center
    base[:10] = base[0] + 0.05 * rng.standard_normal((10, 8))
    t = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                  "embedding": pa.array(base.tolist(),
                                        pa.list_(pa.float64()))})

    def run(block):
        return (cosine_near_dup_pairs(
            rd.from_arrow(t), threshold=0.9, n_planes=2, n_tables=4,
            verify_block=block).to_pandas()
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))

    a, b = run(512), run(4)
    assert len(a) > 0 and a.equals(b)


def test_cosine_all_pairs_exact_matches_numpy_and_anchors_approx(
        ray_session):
    """The blocked exact all-pairs kernel equals local numpy brute force
    across block boundaries (block_rows < n), and the approximate LSH
    path's pairs are a subset of it at the same threshold."""
    import ray.data as rd

    from search_engine_ray.functions.ann import (cosine_all_pairs_exact,
                                                 cosine_near_dup_pairs)

    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((50, 12))
    vecs[:6] = vecs[0] + 0.05 * rng.standard_normal((6, 12))  # dup cluster
    t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    got = (cosine_all_pairs_exact(rd.from_arrow(t), threshold=0.8,
                                  block_rows=16).to_pandas()
           .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))

    mn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = np.round(mn @ mn.T, 6)
    iu, ju = np.triu_indices(50, 1)
    keep = cos[iu, ju] >= 0.8
    ref = sorted(zip(iu[keep].tolist(), ju[keep].tolist(),
                     cos[iu, ju][keep].tolist()))
    assert ref == list(zip(got["vec_a"], got["vec_b"], got["cos"]))
    assert len(ref) >= 10  # the planted cluster alone gives C(6,2)

    approx = cosine_near_dup_pairs(rd.from_arrow(t), threshold=0.8,
                                   n_planes=3, n_tables=6).to_pandas()
    exact_set = set(zip(got["vec_a"], got["vec_b"]))
    assert set(zip(approx["vec_a"], approx["vec_b"])) <= exact_set


def test_lsh_topk_multiprobe_recall(ray_session):
    """Multi-probe must return >= the single-bucket candidate coverage:
    every query fills all k slots on this corpus."""
    import ray.data as rd

    from search_engine_ray.functions.ann import lsh_topk

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 16))
    t = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    out = lsh_topk(rd.from_arrow(t), vecs[:4], k=5, n_probe=1).to_pandas()
    assert len(out) == 20  # 4 queries x 5 full slots
    for qi in range(4):
        assert qi in set(out[out["query_id"] == qi]["vec_id"])


def test_ivf_full_probe_equals_bruteforce(ray_session):
    """IVF with n_probe == n_centroids scores every vector and must equal
    brute_force_topk exactly (same math, same rounding, same ties)."""
    import ray.data as rd

    from search_engine_ray.functions.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((250, 12))
    t = pa.table({"vec_id": pa.array(range(250), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    q = vecs[:3]

    def norm(df):
        return (df.sort_values(["query_id", "cos", "vec_id"],
                               ascending=[True, False, True])
                .reset_index(drop=True))

    exact = norm(brute_force_topk(rd.from_arrow(t), q, k=7).to_pandas())
    ivf = norm(ivf_topk(rd.from_arrow(t), q, k=7, n_centroids=8,
                        n_probe=8).to_pandas())
    assert ivf.equals(exact)


def test_ivf_partial_probe_recall_on_clustered_data(ray_session):
    """On clustered data (IVF's habitat) a partial probe keeps high
    recall: every query's true top-1 (its own cluster center-mate) is
    found, and all k slots fill."""
    import ray.data as rd

    from search_engine_ray.functions.ann import ivf_topk

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((8, 16)) * 4
    vecs = np.concatenate([c + 0.1 * rng.standard_normal((40, 16))
                           for c in centers])
    t = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    q = vecs[[0, 40, 80, 120]]
    out = ivf_topk(rd.from_arrow(t), q, k=5, n_centroids=8,
                   n_probe=2).to_pandas()
    assert len(out) == 20  # all slots filled
    for qi, self_id in enumerate([0, 40, 80, 120]):
        sub = out[out["query_id"] == qi]
        assert self_id in set(sub["vec_id"])  # exact self-match found
        assert sub["cos"].max() == 1.0


def test_pure_decoder_golden_roundtrip():
    """Golden values through the REAL dependency-free codecs: a known
    BMP gradient, a known PCM-16 WAV, a multi-frame GVID container —
    encode -> decode must reproduce the exact pixels/samples; malformed
    payloads raise."""
    from search_engine_ray.functions.multimodal import (
        PureDecoder,
        encode_bmp,
        encode_video,
        encode_wav,
    )

    dec = PureDecoder()
    img = np.array([[0, 85], [170, 255]], dtype=np.uint8)
    got = dec.decode_image(encode_bmp(img))
    assert got.shape == (2, 2)
    assert np.allclose(got, img.astype(np.float32) / 255.0)
    # odd width exercises the 4-byte row padding path
    img2 = np.arange(15, dtype=np.uint8).reshape(3, 5) * 17
    assert np.allclose(dec.decode_image(encode_bmp(img2)),
                       img2.astype(np.float32) / 255.0)

    samples = np.array([0, 16384, -32768, 32767], dtype=np.int16)
    aud = dec.decode_audio(encode_wav(samples))
    assert np.allclose(aud, [0.0, 0.5, -1.0, 32767 / 32768])

    frames = [np.full((2, 3), v, dtype=np.uint8) for v in (10, 20, 30)]
    out = dec.decode_video_frames(encode_video(frames))
    assert len(out) == 3
    assert all(np.allclose(o, f / 255.0) for o, f in zip(out, frames))
    # exact-n subsampling, repeats when the clip is shorter
    assert len(dec.decode_video_frames(encode_video(frames), 2)) == 2
    assert len(dec.decode_video_frames(encode_video(frames), 5)) == 5

    for bad in (b"xx", b"BMshort", b"RIFFxxxxNOPE"):
        with pytest.raises(ValueError):
            dec.decode_image(bad)
        with pytest.raises(ValueError):
            dec.decode_audio(bad)
        with pytest.raises(ValueError):
            dec.decode_video_frames(bad)


def test_media_features_real_decode_stats(ray_session):
    """media_features over the real-payload fixture decodes actual
    bytes: width/height match the encoded raster, audio n_units counts
    real samples, sig_mean/sig_rms reproduce numpy on the decoded
    signal; the run is deterministic."""
    import ray.data as rd

    from search_engine_ray.functions.multimodal import (
        PureDecoder,
        media_features,
        synthetic_media,
    )

    t = synthetic_media(12)
    ds1 = media_features(rd.from_arrow(t)).to_pandas()
    ds2 = media_features(rd.from_arrow(t)).to_pandas()
    a = ds1.sort_values("media_id").reset_index(drop=True)
    b = ds2.sort_values("media_id").reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))
    assert all(len(f) == 64 for f in a["feature"])
    # decoded dims must equal the fixture's encoded metadata columns
    meta = t.to_pandas().set_index("media_id")
    got = a.set_index("media_id")
    for mid in meta.index:
        if meta.loc[mid, "kind"] != "audio":
            assert got.loc[mid, "width"] == meta.loc[mid, "width"]
            assert got.loc[mid, "height"] == meta.loc[mid, "height"]
    # golden stats on one audio row
    dec = PureDecoder()
    arow = meta[meta["kind"] == "audio"].iloc[0]
    sig = dec.decode_audio(arow["payload"]).astype(np.float64)
    mid = arow.name
    assert got.loc[mid, "n_units"] == sig.size
    assert got.loc[mid, "sig_mean"] == round(float(sig.mean()), 6)
    assert got.loc[mid, "sig_rms"] == round(
        float(np.sqrt((sig * sig).mean())), 6)


def test_media_resize_and_frame_sample(ray_session):
    """Resize emits out_h x out_w pixel blocks for image rows only;
    frame sampling explodes each video row into n deterministic frames."""
    import ray.data as rd

    from search_engine_ray.functions.multimodal import (
        resize_images,
        sample_video_frames,
        synthetic_media,
    )

    t = synthetic_media(12)
    n_img = sum(1 for k in t.column("kind").to_pylist() if k == "image")
    n_vid = sum(1 for k in t.column("kind").to_pylist() if k == "video")
    rs = resize_images(rd.from_arrow(t), out_w=4, out_h=4).to_pandas()
    assert len(rs) == n_img
    assert all(len(p) == 16 for p in rs["pixels"])
    rs2 = resize_images(rd.from_arrow(t), out_w=4, out_h=4).to_pandas()
    a = rs.sort_values("media_id").reset_index(drop=True)
    b = rs2.sort_values("media_id").reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["pixels"], b["pixels"]))

    fr = sample_video_frames(rd.from_arrow(t), n_frames=3).to_pandas()
    assert len(fr) == n_vid * 3
    assert set(fr["frame_idx"]) == {0, 1, 2}
    one = fr[fr.media_id == fr.media_id.iloc[0]]
    # distinct frames per video (decoder varies by frame index)
    assert not np.array_equal(one.iloc[0]["frame"], one.iloc[1]["frame"])


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


def test_near_dup_clusters_driver_vs_distributed(ray_session):
    """Random pair graphs: the driver union-find and the distributed
    min-label propagation produce IDENTICAL (doc_id, cluster_rep)
    labelings, and both equal a brute-force transitive closure."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.functions.dedup import near_dup_clusters

    rng = np.random.default_rng(31)
    for trial in range(3):
        n_nodes, n_edges = 60, 45
        a = rng.integers(0, n_nodes, size=n_edges)
        b = rng.integers(0, n_nodes, size=n_edges)
        keep = a != b
        lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
        pairs_df = pd.DataFrame({"doc_a": lo, "doc_b": hi,
                                 "jaccard": 1.0}).drop_duplicates(
            ["doc_a", "doc_b"])
        # brute force components
        comp = {int(x): {int(x)} for x in np.concatenate([lo, hi])}
        for x, y in zip(lo.tolist(), hi.tolist()):
            merged = comp[x] | comp[y]
            for m in merged:
                comp[m] = merged
        want = {n: min(c) for n, c in comp.items()}

        got_d = (near_dup_clusters(rd.from_pandas(pairs_df))
                 .to_pandas().set_index("doc_id")["cluster_rep"])
        assert dict(got_d) == want
        got_p = (near_dup_clusters(rd.from_pandas(pairs_df),
                                   driver_budget=0, num_buckets=8)
                 .to_pandas().set_index("doc_id")["cluster_rep"])
        assert dict(got_p) == want


def test_profile_table_with_nulls(ray_session):
    """Profiler semantics on a table WITH nulls: null-aware counts,
    exact distinct (nulls excluded), numeric vs string min/max lanes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.functions.profile import profile_table

    t = pa.table({
        "a": pa.array([1, 2, 2, None, 5], pa.int64()),
        "s": pa.array(["b", None, "a", "a", "c"], pa.string()),
        "f": pa.array([0.5, 0.5, None, None, -1.25], pa.float64()),
    })
    out = profile_table(rd.from_arrow(t)).set_index("column")
    assert (out.loc["a", "n"], out.loc["a", "n_null"],
            out.loc["a", "n_distinct"]) == (5, 1, 3)
    assert (out.loc["a", "min_num"], out.loc["a", "max_num"]) == (1.0, 5.0)
    assert out.loc["s", "n_distinct"] == 3
    assert (out.loc["s", "min_str"], out.loc["s", "max_str"]) == ("a", "c")
    assert np.isnan(out.loc["s", "min_num"])
    assert (out.loc["f", "n_null"], out.loc["f", "n_distinct"]) == (2, 2)
    assert (out.loc["f", "min_num"], out.loc["f", "max_num"]) == (-1.25, 0.5)


def test_hll_approx_distinct_accuracy_and_merge(ray_session):
    """HLL estimate within 5% (3 sigma at p=12) of truth across
    cardinalities, and the sketch is a true mergeable max (union of
    two halves == elementwise max of their sketches)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.functions.profile import (
        _hll_estimate,
        _hll_registers,
        approx_distinct,
    )

    rng = np.random.default_rng(41)
    for true_n in (500, 50_000):
        vals = rng.integers(0, 10**15, size=true_n)
        ds = rd.from_pandas(pd.DataFrame({"x": np.repeat(vals, 2)}))
        est = approx_distinct(ds, "x")
        assert abs(est / len(set(vals.tolist())) - 1) < 0.05, (true_n, est)
    a = pd.Series(rng.integers(0, 10**12, size=3000))
    b = pd.Series(rng.integers(0, 10**12, size=3000))
    ra, rb = _hll_registers(a), _hll_registers(b)
    rall = _hll_registers(pd.concat([a, b]))
    assert (np.maximum(ra, rb) == rall).all()
    assert abs(_hll_estimate(rall) / len(set(a) | set(b)) - 1) < 0.05


# --- substring-level exact dedup (duplicate_spans) -------------------------


def _brute_spans(texts: dict[int, str], window: int):
    """Literal reference: all windows, dup = text in >=2 distinct docs,
    merge overlapping/adjacent per doc."""
    import re

    from search_engine_ray.functions.textstats import token_regex

    tok = token_regex()
    wins: dict[str, set[int]] = {}
    per_doc: dict[int, list[int]] = {}
    for d, t in texts.items():
        toks = tok.findall(t or "")
        for i in range(len(toks) - window + 1):
            wins.setdefault(" ".join(toks[i:i + window]), set()).add(d)
    for d, t in texts.items():
        toks = tok.findall(t or "")
        per_doc[d] = [i + 1 for i in range(len(toks) - window + 1)
                      if len(wins[" ".join(toks[i:i + window])]) >= 2]
    out = []
    for d, starts in sorted(per_doc.items()):
        run: list[int] = []
        for s in starts:
            if run and s > run[-1] + window:
                out.append((d, run[0], run[-1] + window - 1,
                            run[-1] - run[0] + window))
                run = []
            run.append(s)
        if run:
            out.append((d, run[0], run[-1] + window - 1,
                        run[-1] - run[0] + window))
    return sorted(out)


def _spans_rows(ds):
    df = ds.to_pandas()
    if df.empty:  # zero spans: legacy md5 plan yields a column-less frame
        return []
    return sorted(map(tuple, df[["doc_id", "span_start", "span_end",
                                 "span_len"]].itertuples(index=False)))


def test_duplicate_spans_planted(ray_session):
    """Two docs share an exact 8-token run embedded in unique filler;
    a third doc is unique; a fourth is too short to window."""
    import ray.data as rd

    from search_engine_ray.functions.dedup import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    texts = {
        0: "u00 u01 u02 " + shared + " u03 u04 u05",   # tokens 4..11
        1: "v00 " + shared + " v01 v02 v03 v04 v05",   # tokens 2..9
        2: "w00 w01 w02 w03 w04 w05 w06 w07 w08 w09 w10 w11 w12 w13",
        3: "x00 x01",                                   # shorter than window
    }
    t = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[k] for k in sorted(texts)])})
    got = _spans_rows(duplicate_spans(rd.from_arrow(t), window=8,
                                      num_buckets=4))
    assert got == [(0, 4, 11, 8), (1, 2, 9, 8)]
    assert got == _brute_spans(texts, 8)


def test_duplicate_spans_merge_and_within_doc_rule(ray_session):
    """Overlapping dup windows merge into ONE maximal span; a repeat
    WITHIN a single doc (no second doc) is not flagged."""
    import ray.data as rd

    from search_engine_ray.functions.dedup import duplicate_spans

    run = " ".join(f"s{i:02d}" for i in range(12))  # 12 shared tokens
    texts = {
        7: "a0 a1 " + run + " a2",       # windows at 3..8 all dup -> merge
        8: run + " b0 b1 b2 b3",
        9: "c0 c1 c2 c0 c1 c2 c0 c1 c2 c0 c1 c2",  # self-repeat only
    }
    t = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[k] for k in sorted(texts)])})
    got = _spans_rows(duplicate_spans(rd.from_arrow(t), window=7,
                                      num_buckets=4))
    # doc 7: dup windows start 3..8 (1-based), merged span tokens 3..14
    # doc 8: dup windows start 1..6, merged span tokens 1..12
    assert got == [(7, 3, 14, 12), (8, 1, 12, 12)]
    assert got == _brute_spans(texts, 7)


def test_duplicate_spans_randomized_vs_brute(ray_session):
    """Randomized corpus from a tiny vocab (forces cross-doc window
    collisions) must match the literal brute-force reference."""
    import ray.data as rd

    from search_engine_ray.functions.dedup import duplicate_spans

    rng = np.random.default_rng(42)
    vocab = [f"t{i}" for i in range(6)]
    texts = {d: " ".join(vocab[i] for i in rng.integers(0, 6, size=int(n)))
             for d, n in enumerate(rng.integers(0, 30, size=25))}
    t = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[k] for k in sorted(texts)])})
    for w in (3, 5):
        got = _spans_rows(duplicate_spans(rd.from_arrow(t), window=w,
                                          num_buckets=8))
        assert got == _brute_spans(texts, w), w


def test_rolling_window_hash_kernel_and_plan_identity(ray_session):
    """The rolling-fingerprint kernel: equal window CONTENT (across docs
    and offsets) always hashes equal, different content differs; and the
    rolling+verify plan (default) returns bit-identical spans to the
    direct-md5 plan (rolling=False) on planted and randomized corpora."""
    import ray.data as rd

    from search_engine_ray.functions.dedup import (
        RollingWindowHashBatch,
        duplicate_spans,
    )

    shared = "alpha beta gamma delta epsilon"
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["x0 x1 " + shared + " x2",
                          shared + " y0 y1 y2 y3"]),
    })
    out = RollingWindowHashBatch(5, 4)(t).to_pandas()
    h0 = out[(out.doc_id == 0) & (out.start == 3)]["h"].iloc[0]
    h1 = out[(out.doc_id == 1) & (out.start == 1)]["h"].iloc[0]
    assert h0 == h1  # same 5-token content at different offsets/docs
    assert out["h"].nunique() == out["h"].size - 1  # everything else differs

    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(6)]
    texts = {d: " ".join(vocab[i] for i in rng.integers(0, 6, size=int(n)))
             for d, n in enumerate(rng.integers(0, 40, size=30))}
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[k] for k in sorted(texts)])})
    for w in (3, 6):
        roll = _spans_rows(duplicate_spans(rd.from_arrow(tbl), window=w,
                                           num_buckets=8, rolling=True))
        md5p = _spans_rows(duplicate_spans(rd.from_arrow(tbl), window=w,
                                           num_buckets=8, rolling=False))
        # co-shuffle verify tier (broadcast_cap=0 forces it)
        cosh = _spans_rows(duplicate_spans(rd.from_arrow(tbl), window=w,
                                           num_buckets=8, rolling=True,
                                           broadcast_cap=0))
        assert roll == md5p == cosh == _brute_spans(texts, w), w


def test_cms_heavy_hitters_exact_anchor_and_bounds(ray_session):
    """CMS top-k on a zipf-skewed column: the returned set and order
    match the exact value_counts top-k at ample width; every estimate
    is >= the true count (CMS never undercounts) and the sketch is a
    true mergeable sum (two halves + == whole)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.functions.profile import (
        _cms_batch,
        _cms_params,
        heavy_hitters,
    )

    rng = np.random.default_rng(17)
    # zipf-ish: value i appears ~ 3000 / (i + 1) times, plus noise tail
    vals = np.concatenate(
        [np.full(3000 // (i + 1), f"v{i:02d}") for i in range(40)]
        + [np.char.add("noise", rng.integers(0, 5000, 4000).astype(str))])
    rng.shuffle(vals)
    df = pd.DataFrame({"x": vals})
    ds = rd.from_pandas(df).repartition(8)
    got = heavy_hitters(ds, "x", k=10)
    truth = df["x"].value_counts()
    want = truth.head(10)
    assert list(got["value"]) == list(want.index)
    full_truth = truth.to_dict()
    for v, e in zip(got["value"], got["est_count"]):
        assert e >= full_truth[v], (v, e)
    # tight width => still one-sided even under heavy collision
    tight = heavy_hitters(ds, "x", k=10, width=32, depth=2)
    for v, e in zip(tight["value"], tight["est_count"]):
        assert e >= full_truth[v]
    # merge property: sum of half-sketches == whole-corpus sketch
    a, b = _cms_params(3)
    half = len(df) // 2
    c1, _ = _cms_batch(df["x"][:half], a, b, 64, 8)
    c2, _ = _cms_batch(df["x"][half:], a, b, 64, 8)
    call, _ = _cms_batch(df["x"], a, b, 64, 8)
    assert (c1 + c2 == call).all()


def test_cms_heavy_hitters_empty_and_nulls(ray_session):
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.functions.profile import heavy_hitters

    ds = rd.from_pandas(pd.DataFrame({"x": pd.array(
        [None, None, "only", "only"], dtype="string")}))
    got = heavy_hitters(ds, "x", k=5)
    assert list(got["value"]) == ["only"]
    assert int(got["est_count"][0]) == 2


def test_cut_duplicate_spans_keep_one_occurrence(ray_session):
    """The Lee-et-al cut policy: the global (min doc_id, min start)
    occurrence of a duplicated run survives byte-exact; every other
    occurrence (cross-doc AND within-doc) is removed; non-duplicated
    bytes are untouched; a re-scan of the output finds nothing."""
    import ray.data as rd

    from search_engine_ray.functions.dedup import (
        cut_duplicate_spans,
        duplicate_spans,
    )

    shared = " ".join(f"s{i:02d}" for i in range(8))
    texts = {
        1: "u1 u2 " + shared + " u3",
        2: "v1 " + shared + "  v2,v3",          # double space + comma kept
        3: "w1 " + shared + " w2 " + shared,    # second copy within doc
        4: "x1 x2 x3",
    }
    t = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[k] for k in sorted(texts)])})
    got = (cut_duplicate_spans(rd.from_arrow(t), window=8, num_buckets=4)
           .to_pandas().set_index("doc_id").sort_index())
    # the rolling-candidate tier rewrites bit-identically (and the
    # identity path covers a corpus with no cross-doc candidates)
    got_roll = (cut_duplicate_spans(rd.from_arrow(t), window=8,
                                    num_buckets=4, rolling=True)
                .to_pandas().set_index("doc_id").sort_index())
    import pandas as _pd

    _pd.testing.assert_frame_equal(got.sort_index(axis=1),
                                   got_roll.sort_index(axis=1))
    nodup = pa.table({"doc_id": pa.array([8, 9], pa.int64()),
                      "text": pa.array(["a b c", "d e f"])})
    ident = (cut_duplicate_spans(rd.from_arrow(nodup), window=3,
                                 num_buckets=4, rolling=True)
             .to_pandas().set_index("doc_id"))
    assert ident.loc[8, "clean_text"] == "a b c"
    assert int(ident["n_cut_tokens"].sum()) == 0
    assert got.loc[1, "clean_text"] == texts[1]          # keeper intact
    assert int(got.loc[1, "n_cut_tokens"]) == 0
    # 8 cut tokens leave their 7 internal separator spaces behind
    assert got.loc[2, "clean_text"] == "v1 " + " " * 7 + "  v2,v3"
    assert int(got.loc[2, "n_cut_tokens"]) == 8
    assert got.loc[3, "clean_text"].replace(" ", "") == "w1w2"
    assert int(got.loc[3, "n_cut_tokens"]) == 16
    assert got.loc[4, "clean_text"] == texts[4]
    # the rewritten corpus has no duplicated window left
    t2 = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                   "text": pa.array([got.loc[k, "clean_text"]
                                     for k in sorted(texts)])})
    assert duplicate_spans(rd.from_arrow(t2), window=8,
                           num_buckets=4).count() == 0


def test_cut_duplicate_spans_overlap_keeper_wins(ray_session):
    """Tokens covered by BOTH a keeper window and a non-keeper window
    (overlapping flagged regions within the keeper doc) survive."""
    import ray.data as rd

    from search_engine_ray.functions.dedup import cut_duplicate_spans

    run = " ".join(f"r{i}" for i in range(10))  # 10-token shared run
    texts = {5: run, 6: run + " z0"}
    t = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[k] for k in sorted(texts)])})
    got = (cut_duplicate_spans(rd.from_arrow(t), window=6, num_buckets=4)
           .to_pandas().set_index("doc_id"))
    # doc 5 is keeper of every window it contains (min doc_id)
    assert got.loc[5, "clean_text"] == run
    # doc 6 loses all 10 run tokens (every one covered by a dup window,
    # none by a keeper window of doc 6), keeps its unique tail
    assert got.loc[6, "clean_text"].strip() == "z0"
    assert int(got.loc[6, "n_cut_tokens"]) == 10


def test_cross_near_dups_sides(ray_session):
    """Only NEW-vs-REF pairs survive: a same-side duplicate pair is
    excluded, a cross pair is reported as (doc_new, doc_ref)."""
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.functions.dedup import cross_near_dups

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu")
    uniq = ["red green blue yellow purple orange pink brown black white "
            "cyan gray",
            "one two three four five six seven eight nine ten eleven "
            "twelve"]
    new = pd.DataFrame({"doc_id": [101, 103, 105],
                        "text": [base, base + " tail", uniq[0]]})
    ref = pd.DataFrame({"doc_id": [2, 4],
                        "text": [base, uniq[1]]})
    got = (cross_near_dups(rd.from_pandas(new), rd.from_pandas(ref),
                           threshold=0.5)
           .to_pandas().sort_values(["doc_new", "doc_ref"]))
    # 101-103 is a NEW-NEW dup pair -> excluded; 101-2 and 103-2 cross
    assert list(map(tuple, got[["doc_new", "doc_ref"]]
                    .itertuples(index=False))) == [(101, 2), (103, 2)]
    assert (got["jaccard"] >= 0.5).all()
    assert float(got[got["doc_new"] == 101]["jaccard"].iloc[0]) == 1.0


def test_tdigest_accuracy_merge_determinism():
    """t-digest: <= ~1e-3 rank error on 200k uniform + heavy-tailed
    samples, mergeable (split-merge == one-shot to rank-error
    tolerance), deterministic centroids, exact on tiny inputs,
    byte-serialization round-trip."""
    from search_engine_ray.functions.profile import TDigest

    rng = np.random.default_rng(3)
    for data in (rng.uniform(0, 1000, 200_000),
                 rng.lognormal(0, 2, 200_000)):
        td = TDigest()
        for chunk in np.array_split(data, 25):
            td.add(chunk)
        assert td.means.size < 300  # bounded state
        for q in (0.01, 0.25, 0.5, 0.9, 0.99, 0.999):
            rank = (data < td.quantile(q)).mean()
            assert abs(rank - q) < 1e-3, q
        a = TDigest().add(data[:100_000])
        b = TDigest().add(data[100_000:])
        m = a.merge(b)
        assert abs((data < m.quantile(0.5)).mean() - 0.5) < 1e-3
        rt = TDigest.from_bytes(m.to_bytes())
        assert np.array_equal(rt.means, m.means)
        assert rt.quantile(0.9) == m.quantile(0.9)

    t1 = TDigest().add(data)
    t2 = TDigest().add(data)
    assert np.array_equal(t1.means, t2.means)
    assert np.array_equal(t1.weights, t2.weights)

    tiny = TDigest().add(np.array([1.0, 2, 3, 4, 5]))
    assert tiny.means.size == 5  # singletons survive under delta
    assert tiny.quantile(0.5) == 3.0
    assert tiny.quantile(0.0) == 1.0 and tiny.quantile(1.0) == 5.0


def test_approx_quantiles_operator(ray_session):
    """approx_quantiles over the events value column: zero-shuffle
    partial-digest fold; every estimate within 1% rank error of exact,
    grouped variant partitions correctly by event_type."""
    import ray.data as rd

    from search_engine_ray.functions.profile import approx_quantiles

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["event_type", "value"])
    vals = ds.to_pandas()
    got = approx_quantiles(ds, "value", qs=(0.25, 0.5, 0.9))
    assert got["n"].iloc[0] == len(vals)
    for q, col in ((0.25, "q25"), (0.5, "q50"), (0.9, "q90")):
        rank = (vals["value"] < got[col].iloc[0]).mean()
        assert abs(rank - q) < 0.01, col

    byg = approx_quantiles(ds, "value", qs=(0.5,),
                           group_col="event_type").set_index("group")
    for et, sub in vals.groupby("event_type"):
        rank = (sub["value"] < byg.loc[et, "q50"]).mean()
        assert abs(rank - 0.5) < 0.02, et


def test_bloom_filter_bounds_merge_roundtrip():
    """Bloom sketch: NO false negatives ever; observed FPR within 3x of
    the fill-factor theory; merge(A, B) == one-shot(A+B); bytes
    round-trip exactly."""
    from search_engine_ray.functions.profile import BloomFilter

    rng = np.random.default_rng(11)
    members = rng.integers(-(2 ** 62), 2 ** 62, 50_000).astype(np.int64)
    others = rng.integers(-(2 ** 62), 2 ** 62, 50_000).astype(np.int64)
    others = np.setdiff1d(others, members)

    bf = BloomFilter().add_hashes(members)
    assert bf.contains_hashes(members).all()  # one-sided: never missed
    fpr = bf.contains_hashes(others).mean()
    assert fpr <= max(3 * bf.fp_rate(), 1e-3)

    a = BloomFilter().add_hashes(members[:25_000])
    b = BloomFilter().add_hashes(members[25_000:])
    m = a.merge(b)
    assert np.array_equal(m.bits, bf.bits)
    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert np.array_equal(rt.bits, bf.bits)
    assert rt.n_added == bf.n_added


def test_bloom_snapshot_dedup(ray_session):
    """filter_by_bloom: dedup a new crawl snapshot against an old corpus
    with no join — no old doc ever survives (one-sided), nearly all
    genuinely-new docs do; keep_members=True returns the complement."""
    import ray.data as rd

    from search_engine_ray.functions.profile import (
        build_bloom,
        filter_by_bloom,
    )

    old = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "text": pa.array([f"old doc body {i}" for i in range(300)]),
    })
    # new snapshot: 100 docs overlap old texts, 200 genuinely new
    new = pa.table({
        "doc_id": pa.array(range(1000, 1300), pa.int64()),
        "text": pa.array([f"old doc body {200 + i}" if i < 100
                          else f"new doc body {i}" for i in range(300)]),
    })
    bloom = build_bloom(rd.from_arrow(old), "text")
    kept = filter_by_bloom(rd.from_arrow(new), "text", bloom).to_pandas()
    assert not kept["text"].str.startswith("old").any()  # one-sided
    assert len(kept) >= 0.95 * 200  # FPR may drop a few new docs
    dupes = filter_by_bloom(rd.from_arrow(new), "text", bloom,
                            keep_members=True).to_pandas()
    assert len(dupes) + len(kept) == 300
    assert dupes["text"].str.startswith("old").sum() == 100


def test_corpus_diff_cdc(ray_session):
    """corpus_diff: added/removed/changed detection between snapshots;
    unchanged docs emit nothing; brute-force dict reference."""
    import ray.data as rd

    from search_engine_ray.functions.dedup import corpus_diff

    old = {i: f"body {i}" for i in range(40)}
    new = dict(old)
    for i in (3, 17):
        del new[i]                       # removed
    for i in (5, 25):
        new[i] = f"edited body {i}"      # changed
    new[100] = "brand new"               # added
    new[101] = "also new"

    def tbl(d):
        ks = sorted(d)
        return pa.table({"doc_id": pa.array(ks, pa.int64()),
                         "text": pa.array([d[k] for k in ks])})

    got = (corpus_diff(rd.from_arrow(tbl(old)), rd.from_arrow(tbl(new)),
                       num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = sorted([(3, "removed"), (17, "removed"), (5, "changed"),
                   (25, "changed"), (100, "added"), (101, "added")])
    assert list(map(tuple, got.itertuples(index=False))) == want


def _semdedup_brute(ids, vecs, clusters, threshold, round_to=6):
    """Literal SemDeDup reference: full within-cluster matrix, drop any
    vector with a lower-id cluster-mate at round(cos) >= t; keeper = the
    lowest-id such mate."""
    from search_engine_ray.functions.ann import _normalize

    order = np.argsort(ids, kind="stable")
    ids, vecs, clusters = ids[order], vecs[order], clusters[order]
    M = _normalize(vecs.astype(np.float64))
    dropped = {}
    for i in range(len(ids)):
        for j in range(i):
            if clusters[j] != clusters[i]:
                continue
            c = round(float(M[i] @ M[j]), round_to)
            if c >= threshold:
                dropped[int(ids[i])] = (int(ids[j]), c,
                                        int(clusters[i]))
                break
    return dropped


def test_semantic_dedup_matches_brute_force(ray_session):
    """Engine (blocked within-cluster kernel, two block sizes) == the
    literal quadratic reference under the SAME codebook/assignments."""
    import ray.data as rd

    from search_engine_ray.functions.ann import (
        _matrix,
        _normalize,
        assign_clusters,
        semantic_dedup,
        train_codebook,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((8, 12))           # 8 semantic "topics"
    vecs = base[rng.integers(0, 8, 120)] + 0.02 * rng.standard_normal(
        (120, 12))                                # dense near-dup groups
    vecs[50] = vecs[20] + 1e-6                    # planted exact-ish dup
    t = pa.table({"vec_id": pa.array(range(120), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    ds = rd.from_arrow(t)
    C = train_codebook(ds, 8, seed=17)
    assigned = assign_clusters(ds, C).to_pandas()
    clusters = assigned.sort_values("vec_id")["cluster"].to_numpy()
    want = _semdedup_brute(np.arange(120), vecs, clusters, 0.97)

    for br in (2048, 7):  # block smaller than clusters must not matter
        got = semantic_dedup(rd.from_arrow(t), n_clusters=8,
                             threshold=0.97, block_rows=br).to_pandas()
        got_map = {int(r.vec_id): (int(r.keeper_id), float(r.cos),
                                   int(r.cluster))
                   for r in got.itertuples()}
        assert got_map == want, br
    # the planted dup is dropped (its keeper is its LOWEST-id near
    # neighbor, which may precede 20 — the dense topic groups overlap)
    assert 50 in want and want[50][0] < 50


def test_semantic_dedup_keeps_singletons_and_empty(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.ann import semantic_dedup

    rng = np.random.default_rng(3)
    # mutually orthogonal-ish vectors: nothing is dropped
    vecs = np.eye(10) + 0.001 * rng.standard_normal((10, 10))
    t = pa.table({"vec_id": pa.array(range(10), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    out = semantic_dedup(rd.from_arrow(t), n_clusters=4,
                         threshold=0.99).to_pandas()
    assert len(out) == 0


def test_knn_join_matches_numpy_reference(ray_session):
    """knn_join (streamed left x plasma-snapshot right, blocked exact
    selection) == a literal full-matmul reference with the same
    (cos desc, right_id asc) tie-break — for several block sizes, with
    k > |right|, and with exclude_self."""
    import ray.data as rd

    from search_engine_ray.functions.ann import _normalize, knn_join

    rng = np.random.default_rng(23)
    L = rng.standard_normal((37, 8))
    R = rng.standard_normal((53, 8))
    R[10] = R[11]  # planted exact cos tie -> id tie-break matters
    tl = pa.table({"vec_id": pa.array(range(100, 137), pa.int64()),
                   "embedding": pa.array(L.tolist(), pa.list_(pa.float64()))})
    tr = pa.table({"vec_id": pa.array(range(53), pa.int64()),
                   "embedding": pa.array(R.tolist(), pa.list_(pa.float64()))})

    def reference(k, exclude_self=False, lids=None, rids=None):
        sims = np.round(_normalize(L.astype(np.float64))
                        @ _normalize(R.astype(np.float64)).T, 6)
        out = {}
        for i in range(sims.shape[0]):
            cand = [(-sims[i, j], rids[j]) for j in range(sims.shape[1])
                    if not (exclude_self and lids[i] == rids[j])]
            cand.sort()
            out[lids[i]] = [(rid, -negs) for negs, rid in
                            cand[:min(k, len(cand))]]
        return out

    lids = np.arange(100, 137)
    rids = np.arange(53)
    for k, br in [(5, 7), (5, 4096), (60, 10)]:  # k > |right| in the last
        got = knn_join(rd.from_arrow(tl), rd.from_arrow(tr), k=k,
                       block_rows=br).to_pandas()
        want = reference(k, lids=lids, rids=rids)
        for lid, grp in got.groupby("left_id"):
            grp = grp.sort_values("rank")
            assert list(zip(grp["right_id"], grp["cos"])) == want[lid], \
                (lid, k, br)
        assert set(got["left_id"]) == set(lids)

    # self-join kNN graph: exclude_self drops the trivial cos=1 match
    got = knn_join(rd.from_arrow(tr), rd.from_arrow(tr), k=3,
                   block_rows=9, exclude_self=True).to_pandas()
    want = reference(3, exclude_self=True, lids=rids, rids=rids)
    # reference uses L; rebuild for the self case
    sims = np.round(_normalize(R.astype(np.float64))
                    @ _normalize(R.astype(np.float64)).T, 6)
    for i in range(53):
        cand = sorted((-sims[i, j], j) for j in range(53) if j != i)
        exp = [(j, -negs) for negs, j in cand[:3]]
        grp = got[got["left_id"] == i].sort_values("rank")
        assert list(zip(grp["right_id"], grp["cos"])) == exp, i
    assert not (got["left_id"] == got["right_id"]).any()


def test_auto_num_buckets_sizing():
    """Exchange self-sizing (stages/agg): floor scales DOWN with tiny
    inputs (a sub-256 KB bucket is pure scheduling overhead), holds at
    64 from 16 MB, grows linearly past the per-bucket target, hard cap;
    unknown volume -> the full floor."""
    from search_engine_ray.stages.agg import auto_num_buckets

    assert auto_num_buckets(None) == 64
    assert auto_num_buckets(0) == 64
    assert auto_num_buckets(600 << 10) == 8          # tiny -> scaled floor
    assert auto_num_buckets(10 << 20) == 40          # 10 MB -> 40 buckets
    assert auto_num_buckets(16 << 20) == 64          # full floor restored
    assert auto_num_buckets(64 * (256 << 20)) == 64  # exactly floor*target
    assert auto_num_buckets(100 * (256 << 20)) == 100
    assert auto_num_buckets(100 << 40) == 65536      # 100 TB -> cap
    assert auto_num_buckets(1 << 30, floor=8, target_bucket_bytes=1 << 27,
                            cap=16) == 8


def test_parquet_input_bytes_and_lineage(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.stages.agg import (
        dataset_input_bytes,
        parquet_input_bytes,
        resolve_num_buckets,
    )

    t = pa.table({"doc_id": list(range(100)), "text": ["x"] * 100})
    pq.write_table(t, str(tmp_path / "a.parquet"))
    pq.write_table(t, str(tmp_path / "b.parquet"))
    want = sum(os.path.getsize(str(tmp_path / f))
               for f in ("a.parquet", "b.parquet"))
    assert parquet_input_bytes(str(tmp_path)) == want
    assert parquet_input_bytes([str(tmp_path / "a.parquet"),
                                str(tmp_path / "b.parquet")]) == want
    assert parquet_input_bytes(str(tmp_path / "missing")) is None

    ds = rd.read_parquet(str(tmp_path))
    assert dataset_input_bytes(ds) == want
    # explicit wins; None auto-resolves to the SCALED floor at this
    # tiny size (sub-256 KB buckets are pure scheduling overhead)
    assert resolve_num_buckets(128, ds) == 128
    assert resolve_num_buckets(None, ds) == 8
    # mid-pipeline datasets lose file lineage -> floor (the historical
    # fixed default), never an error
    assert resolve_num_buckets(None, ds.map_batches(lambda b: b)) == 64


def test_bucket_pairs_vectorized_matches_reference_loop():
    """The vectorized LSH pair emitter (functions/dedup._bucket_pairs)
    must emit exactly the per-bucket combinations the r4 loop emitted:
    unique docs per (band_id, band_hash), sorted, capped at bucket_cap,
    all unordered pairs — pinned against a literal itertools reference
    on random partitions (pair SET equality; downstream
    bucketed_distinct owns ordering)."""
    from itertools import combinations

    import numpy as np
    import pandas as pd

    from search_engine_ray.functions.dedup import (
        BUCKET_CAP_DEFAULT,
        _bucket_pairs,
    )

    def reference(g, bucket_cap=BUCKET_CAP_DEFAULT):
        a, b = [], []
        sizes = g.groupby(["band_id", "band_hash"])["doc_id"].nunique()
        for key in sizes[sizes >= 2].index:
            sub = g.set_index(["band_id", "band_hash"]).loc[[key]]
            docs = sorted(set(sub["doc_id"].tolist()))[:bucket_cap]
            for x, y in combinations(docs, 2):
                a.append(x)
                b.append(y)
        return set(zip(a, b))

    rng = np.random.default_rng(1234)
    for _ in range(10):
        n = int(rng.integers(0, 2000))
        g = pd.DataFrame({
            "band_id": rng.integers(0, 8, n).astype(np.int32),
            "band_hash": rng.integers(0, 50, n).astype(np.int64),
            "doc_id": rng.integers(0, 300, n).astype(np.int64)})
        got = _bucket_pairs(g)
        assert set(zip(got["doc_a"], got["doc_b"])) == reference(g)

    # hot-bucket cap: 200 docs in one bucket truncate to the first 50
    g = pd.DataFrame({
        "band_id": np.zeros(200, np.int32),
        "band_hash": np.zeros(200, np.int64),
        "doc_id": np.arange(200, dtype=np.int64)})
    got = _bucket_pairs(g, bucket_cap=50)
    assert len(got) == 50 * 49 // 2
    assert int(got["doc_a"].max()) <= 49
