"""Varbyte / delta / block-max codec tests (round-trip + properties)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.codec import (
    BLOCK_SIZE,
    bm25_partial,
    decode_blockmax,
    decode_posting,
    delta_decode,
    delta_encode,
    encode_blockmax,
    encode_posting,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_known_values():
    # 0 -> single byte 0x80; 127 -> 0xFF; 128 -> 0x00 0x81
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x80"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\xff"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x00\x81"


def test_varbyte_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**63 - 1, 2**64 - 1],
        dtype=np.uint64,
    )
    out = varbyte_decode(varbyte_encode(vals))
    np.testing.assert_array_equal(out, vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varbyte_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(vals)), vals)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300))
def test_delta_roundtrip_property(ids):
    sorted_ids = np.array(sorted(ids), dtype=np.int64)
    np.testing.assert_array_equal(
        delta_decode(delta_encode(sorted_ids)), sorted_ids
    )


def test_varbyte_count_mismatch_raises():
    data = varbyte_encode(np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(ValueError):
        varbyte_decode(data, count=4)


def test_blockmax_bounds_every_block():
    rng = np.random.default_rng(7)
    n = 1000
    docids = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n)
    lens = rng.integers(10, 500, size=n)
    partials = bm25_partial(tfs, lens, avgdl=120.0)
    lasts, maxs = decode_blockmax(encode_blockmax(docids, partials))
    assert lasts.size == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    for i in range(lasts.size):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, n)
        assert lasts[i] == docids[hi - 1]
        assert maxs[i] == partials[lo:hi].max()  # exact, not approximate


def test_posting_roundtrip_with_positions():
    docids = np.array([10, 999, 12345678901], dtype=np.int64)
    tfs = np.array([1, 3, 2], dtype=np.int64)
    lens = np.array([5, 40, 17], dtype=np.int64)
    pos = np.array([(1 << 32) | 0, (1 << 32) | 4, (2 << 32) | 9,
                    (3 << 32) | 1, (1 << 32) | 2, (5 << 32) | 7], dtype=np.int64)
    rec = encode_posting(docids, tfs, lens, avgdl=20.0, positions=pos)
    assert rec["df"] == 3
    dec = decode_posting(rec, with_positions=True)
    np.testing.assert_array_equal(dec["docids"], docids)
    np.testing.assert_array_equal(dec["tfs"], tfs)
    np.testing.assert_array_equal(dec["doc_lens"], lens)
    np.testing.assert_array_equal(dec["positions"], pos)
