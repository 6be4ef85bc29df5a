"""Posting-list codecs: delta + varbyte compression and block-max metadata.

The reference's "posting list" is a radix-tree node holding a Trove int set
of doc IDs — uncompressed, in-heap, no tf / positions / lengths
(ref: engine/src/main/java/org/search/engine/tree/TreeNode.java:18,
tree/SearchEngineTree.java:10-12). At 10^12-doc scale postings must be
compressed, skippable artifacts instead; this module provides:

* ``varbyte_encode`` / ``varbyte_decode`` — classic IR varbyte (7-bit groups,
  little-endian group order, MSB set on the LAST byte of each value), fully
  vectorized with numpy (no per-value Python loop; encode loops over the <=10
  byte positions, decode uses ``np.add.reduceat`` over continuation groups).
* delta coding for sorted doc-id arrays,
* block-max metadata: per 128-entry block, ``(last_docid, max_partial)``
  where ``max_partial`` is the idf-free BM25 term partial
  ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` — idf is a per-term constant
  applied at query time, so the bound is exact for block-max WAND.

Everything is lossless; compression must not change ranking.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
BM25_K1 = 1.2
BM25_B = 0.75

_U64 = np.uint64


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64/int64 array to varbyte bytes (vectorized)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    n = v.size
    if n == 0:
        return b""
    # bytes needed per value: 1 + number of 7-bit groups above the first
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nb[v >= (_U64(1) << _U64(7 * k))] = k + 1
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        out[starts[mask] + j] = (v[mask] >> _U64(7 * j)).astype(np.uint8) & 0x7F
    out[ends - 1] |= 0x80
    return out.tobytes()


def varbyte_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array (vectorized)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=_U64)
    is_last = (arr & 0x80) != 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    offsets = np.arange(arr.size, dtype=np.int64) - np.repeat(starts, lens)
    contrib = (arr & 0x7F).astype(_U64) << (_U64(7) * offsets.astype(_U64))
    vals = np.add.reduceat(contrib, starts)
    if count is not None and vals.size != count:
        raise ValueError(f"varbyte_decode: expected {count} values, got {vals.size}")
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids -> positive deltas (uint64)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    out = np.empty(ids.size, dtype=_U64)
    if ids.size:
        out[0] = _U64(ids[0])
        np.subtract(ids[1:].astype(_U64), ids[:-1].astype(_U64), out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(_U64)).astype(np.int64)


def bm25_partial(
    tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float,
    k1: float = BM25_K1, b: float = BM25_B,
) -> np.ndarray:
    """idf-free BM25 term partial, float64, fixed operation order."""
    tf = tfs.astype(np.float64)
    dl = doc_lens.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def bm25_idf(n_docs: int, df: int) -> float:
    """Robertson-Sparck-Jones idf with +1 smoothing (always positive)."""
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def encode_blockmax(
    docids: np.ndarray, partials: np.ndarray, block_size: int = BLOCK_SIZE
) -> bytes:
    """Per-block (last_docid:int64, max_partial:float64), raw little-endian."""
    n = docids.size
    n_blocks = (n + block_size - 1) // block_size
    lasts = np.empty(n_blocks, dtype="<i8")
    maxs = np.empty(n_blocks, dtype="<f8")
    for i in range(n_blocks):
        lo, hi = i * block_size, min((i + 1) * block_size, n)
        lasts[i] = docids[hi - 1]
        maxs[i] = partials[lo:hi].max()
    return lasts.tobytes() + maxs.tobytes()


def decode_blockmax(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    n_blocks = len(data) // 16
    lasts = np.frombuffer(data[: 8 * n_blocks], dtype="<i8")
    maxs = np.frombuffer(data[8 * n_blocks:], dtype="<f8")
    return lasts, maxs


def encode_posting(
    docids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    avgdl: float,
    positions: np.ndarray | None = None,
) -> dict:
    """Encode one term's posting list (docids must be sorted unique int64).

    ``positions`` is the flattened int64 array of packed (row<<32|col)
    positions, concatenated per doc in docid order (sum == sum(tfs));
    per-doc slicing at decode uses the stored tfs.
    """
    partials = bm25_partial(tfs, doc_lens, avgdl)
    rec = {
        "df": int(docids.size),
        "docs_vb": varbyte_encode(delta_encode(docids)),
        "tfs_vb": varbyte_encode(tfs),
        "lens_vb": varbyte_encode(doc_lens),
        "blockmax": encode_blockmax(docids, partials),
        "max_partial": float(partials.max()) if partials.size else 0.0,
    }
    rec["pos_vb"] = varbyte_encode(positions) if positions is not None else b""
    return rec


def decode_posting(rec: dict, with_positions: bool = False) -> dict:
    df = int(rec["df"])
    docids = delta_decode(varbyte_decode(rec["docs_vb"], df))
    tfs = varbyte_decode(rec["tfs_vb"], df).astype(np.int64)
    doc_lens = varbyte_decode(rec["lens_vb"], df).astype(np.int64)
    out = {"docids": docids, "tfs": tfs, "doc_lens": doc_lens}
    if with_positions and rec.get("pos_vb"):
        out["positions"] = varbyte_decode(rec["pos_vb"]).astype(np.int64)
    return out
