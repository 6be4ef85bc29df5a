"""Property tests pinning the optimized codec / scoring fast paths to their
reference behaviors (uniform-width, head+uniform-tail, width-grouped decode;
argpartition top-k; dense vs sort-merge accumulation)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.codec import (
    decode_positions,
    encode_positions,
    varbyte_decode,
    varbyte_encode,
)
from search_engine_ray.search import _accumulate_topk, _topk_indices


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=2**45),
                         min_size=1, max_size=8),
                min_size=1, max_size=40))
def test_positions_roundtrip_property(segments):
    # positions strictly increasing within each segment
    flats, lens = [], []
    for seg in segments:
        vals = np.unique(np.array(seg, dtype=np.int64))
        flats.append(vals)
        lens.append(len(vals))
    flat = np.concatenate(flats)
    lens = np.array(lens, dtype=np.int64)
    out = decode_positions(encode_positions(flat, lens), lens)
    np.testing.assert_array_equal(out, flat)


def test_varbyte_decode_path_selection():
    # uniform width path
    u = np.arange(1, 100, dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(u)), u)
    # head + uniform tail (delta-stream shape)
    h = np.concatenate(([2**44], np.arange(1, 100))).astype(np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(h)), h)
    # fully mixed widths
    rng = np.random.default_rng(5)
    m = rng.integers(0, 2**50, 5000).astype(np.uint64)
    m[::7] = rng.integers(0, 100, len(m[::7])).astype(np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(m)), m)
    # n == 2 with distinct widths (head-tail guard requires n > 2)
    two = np.array([2**40, 1], dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(two)), two)


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=12))
def test_topk_indices_equals_full_lexsort(n, k):
    rng = np.random.default_rng(n * 1000 + k)
    uids = np.sort(rng.choice(10_000, size=n, replace=False))
    # force score ties to exercise the tie-widening logic
    totals = rng.integers(0, max(2, n // 3), size=n).astype(np.float64)
    got = _topk_indices(uids, totals, k)
    want = np.lexsort((uids, -totals))[:k]
    np.testing.assert_array_equal(got, want)


def test_topk_large_input_partition_path():
    rng = np.random.default_rng(9)
    n = 50_000  # > the 1024 full-sort cutoff
    uids = np.arange(n, dtype=np.int64)
    totals = np.round(rng.random(n), 2)  # many exact ties
    got = _topk_indices(uids, totals, 25)
    want = np.lexsort((uids, -totals))[:25]
    np.testing.assert_array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=6),
       st.integers(min_value=5, max_value=60))
def test_dense_equals_sortmerge_accumulation(n_terms, n_docs):
    rng = np.random.default_rng(n_terms * 100 + n_docs)
    id_parts, sc_parts = [], []
    for _ in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        id_parts.append(ids)
        sc_parts.append(rng.random(df))
    dense = _accumulate_topk(id_parts, sc_parts, 10, n_docs)
    merge = _accumulate_topk(id_parts, sc_parts, 10, 10**9)  # force sort path
    np.testing.assert_array_equal(dense[0], merge[0])
    np.testing.assert_allclose(dense[1], merge[1], rtol=0, atol=0)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.booleans())
def test_encode_token_table_equals_per_term_reference(seed, with_pos):
    """The vectorized one-stream-per-column kernel must be byte-identical
    to the straightforward per-term encoder (Arrow string sort +
    delta_encode/varbyte_encode/encode_blockmax per term) on random token
    tables — duplicate (term, doc) rows excluded (upstream tokenize
    guarantees one row per (term, doc))."""
    import pyarrow as pa

    from search_engine_ray.codec import (
        bm25_partial,
        delta_encode,
        encode_blockmax,
        encode_positions_rowwise,
        varbyte_encode,
    )
    from search_engine_ray.stages.postings import (
        POSTINGS_SCHEMA,
        encode_token_table,
    )

    rng = np.random.default_rng(seed)
    n_terms = int(rng.integers(1, 30))
    vocab = [f"t{rng.integers(0, 10**6):06d}" for _ in range(n_terms)]
    rows = []
    for term in vocab:
        docs = np.unique(rng.integers(0, 400, size=rng.integers(1, 50)))
        for d in docs:
            tf = int(rng.integers(1, 6))
            pos = np.sort(rng.choice(10**6, size=tf, replace=False)) \
                if with_pos else np.empty(0, np.int64)
            rows.append((term, int(d), tf, pos))
    doclens = rng.integers(1, 500, size=400).astype(np.int64)
    avgdl = float(doclens.mean())

    # token-shaped input with per-doc pre-encoded blobs (tokens v2)
    blobs = []
    for _, _, tf, pos in rows:
        data, _ = encode_positions_rowwise(pos.astype(np.int64),
                                           np.array([tf]))
        blobs.append(data if with_pos else b"")
    t = pa.table({
        "term": pa.array([r[0] for r in rows], pa.string()),
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "tf": pa.array([r[2] for r in rows], pa.int64()),
        "pos_vb": pa.array(blobs, pa.large_binary()),
    })
    got, n_post = encode_token_table(t, doclens, avgdl, with_pos)
    assert n_post == len(rows)

    # reference: per-term encode over the Arrow-sorted table
    ts = t.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    terms = ts.column("term").to_pylist()
    di = ts.column("doc_id").to_numpy()
    tf_a = ts.column("tf").to_numpy().astype(np.int64)
    pos_a = ts.column("pos_vb").to_pylist()
    want = {k: [] for k in POSTINGS_SCHEMA.names}
    starts = [0] + [i for i in range(1, len(terms))
                    if terms[i] != terms[i - 1]]
    ends = starts[1:] + [len(terms)]
    for s, e in zip(starts, ends):
        docids = di[s:e]
        tfs = tf_a[s:e]
        lens = doclens[docids]
        partials = bm25_partial(tfs, lens, avgdl)
        want["term"].append(terms[s])
        want["df"].append(e - s)
        want["docs_vb"].append(varbyte_encode(delta_encode(docids)))
        want["tfs_vb"].append(varbyte_encode(tfs))
        want["lens_vb"].append(varbyte_encode(lens))
        want["pos_vb"].append(b"".join(pos_a[s:e]))
        want["blockmax"].append(encode_blockmax(docids, partials))
        want["max_partial"].append(float(partials.max()))
    ref = pa.table({k: pa.array(v, POSTINGS_SCHEMA.field(k).type)
                    for k, v in want.items()}, schema=POSTINGS_SCHEMA)
    assert got.equals(ref)
