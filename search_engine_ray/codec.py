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
_ENC_CHUNK = 1 << 20  # values per encode chunk (temps ~8 MB, heap-reused)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64/int64 array to varbyte bytes (vectorized).

    Fast paths: int64 arithmetic throughout when every value fits in 63
    bits (always true for deltas / tfs / lens / packed positions — uint64
    kernels and boolean-masked writes are 10-100x slower on some numpy
    builds), width computed by summed comparisons (no masked assignment),
    and the mixed-width writer grouped BY WIDTH with integer-index
    gathers (one gather/scatter pair per distinct width instead of one
    boolean-masked pass per byte position). A dense column-wise writer
    covers the uniform-width case; full-range uint64 values take the
    legacy path below. Output bytes are identical on every path."""
    v0 = np.ascontiguousarray(values, dtype=_U64)
    n = v0.size
    if n == 0:
        return b""
    if n > _ENC_CHUNK:
        # chunked: varbyte is value-delimited, so per-chunk encoding is
        # byte-identical — and the ~8 MB per-chunk temporaries stay in
        # glibc's reused heap instead of fresh mmaps (first-touch faults
        # on 100MB+ temporaries cost seconds on this hypervisor)
        return b"".join(varbyte_encode(v0[lo:lo + _ENC_CHUNK])
                        for lo in range(0, n, _ENC_CHUNK))
    vi = v0.view(np.int64)
    if int(vi.min()) < 0:  # some value >= 2**63: rare legacy path
        return _vb_encode_u64(v0)
    v = vi
    # bytes per value: 1 + #{k : v >= 2^(7k)}; bool adds, no masked writes
    nb = np.ones(n, dtype=np.int64)
    w_max = 1
    for k in range(1, 9):  # width <= 9 since v < 2**63
        m = v >= (np.int64(1) << np.int64(7 * k))
        if not m.any():
            break
        nb += m
        w_max = k + 1
    w_min = int(nb.min()) if n > 1 else w_max
    if w_min == w_max:
        # uniform width: write column-wise into an (n, w) matrix — no
        # fancy-index scatter
        w = w_max
        out = np.empty((n, w), dtype=np.uint8)
        for j in range(w):
            out[:, j] = ((v >> np.int64(7 * j)) & 0x7F).astype(np.uint8)
        out[:, w - 1] |= 0x80
        return out.tobytes()
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for w in range(w_min, w_max + 1):
        sel = np.flatnonzero(nb == w)
        if sel.size == 0:
            continue
        sv = v[sel]
        s_w = starts[sel]
        for j in range(w):
            out[s_w + j if j else s_w] = \
                ((sv >> np.int64(7 * j)) & 0x7F).astype(np.uint8)
    out[ends - 1] |= 0x80
    return out.tobytes()


def _vb_encode_u64(v: np.ndarray) -> bytes:
    """Legacy uint64 writer for values with the top bit set."""
    n = v.size
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        mask = v >= (_U64(1) << _U64(7 * k))
        if not mask.any():
            break
        nb[mask] = k + 1
    w_min, w_max = int(nb[0]), int(nb[0])
    if n > 1:
        w_min, w_max = int(nb.min()), int(nb.max())
    if w_min == w_max:
        w = w_min
        out = np.empty((n, w), dtype=np.uint8)
        for j in range(w):
            out[:, j] = (v >> _U64(7 * j)).astype(np.uint8) & 0x7F
        out[:, w - 1] |= 0x80
        return out.tobytes()
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
    """Decode varbyte bytes back to a uint64 array (vectorized).

    Assembly is <=10 gather-OR passes over int64 (bitwise ops are
    width-exact, and int64 kernels stay on numpy's fast path — uint64
    cumsum/reduceat fall off it by an order of magnitude)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=_U64)
    ends = np.flatnonzero(arr & 0x80)
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    widths = ends - starts + 1
    payload = (arr & 0x7F).astype(np.int64)
    vals = np.zeros(n, dtype=np.int64)
    w_max = int(widths.max())
    w_min = int(widths.min())
    if w_max == w_min:
        # uniform width: dense reshape, no gathers
        mat = payload.reshape(n, w_max)
        for j in range(w_max):
            vals |= mat[:, j] << (7 * j)
    elif n > 2 and int(widths[1:].min()) == int(widths[1:].max()):
        # delta streams: one absolute head value, uniform tail — decode the
        # tail densely, the head scalar-wise
        w0 = int(widths[0])
        head = 0
        for j in range(w0):
            head |= int(payload[j]) << (7 * j)
        vals[0] = np.uint64(head & 0xFFFFFFFFFFFFFFFF).astype(np.int64)
        wt = int(widths[1])
        mat = payload[w0:].reshape(n - 1, wt)
        tail = vals[1:]
        for j in range(wt):
            tail |= mat[:, j] << (7 * j)
    else:
        # width-grouped dense decode: integer-index gathers per distinct
        # width (boolean-masked |= passes are far slower on wide mixes)
        for w in range(w_min, w_max + 1):
            sel = np.flatnonzero(widths == w)
            if sel.size == 0:
                continue
            s_w = starts[sel]
            acc = payload[s_w].copy()
            for j in range(1, w):
                acc |= payload[s_w + j] << (7 * j)
            vals[sel] = acc
    out = vals.view(_U64)
    if count is not None and out.size != count:
        raise ValueError(f"varbyte_decode: expected {count} values, got {out.size}")
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids -> positive deltas (uint64)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    out = np.empty(ids.size, dtype=np.int64)
    if ids.size:
        out[0] = ids[0]
        # int64 subtract == uint64 subtract bit-for-bit (modular wrap)
        np.subtract(ids[1:], ids[:-1], out=out[1:])
    return out.view(_U64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    # int64 cumsum (fast path); two's-complement wrap == modular uint64,
    # so bit-level results are exact for any 64-bit payload
    return np.cumsum(deltas.view(np.int64) if deltas.dtype == _U64
                     else deltas.astype(np.int64))


def encode_positions(flat: np.ndarray, seg_lens: np.ndarray) -> bytes:
    """Delta+varbyte a flattened positions array segmented per doc.

    ``flat`` concatenates each doc's packed (row<<32|col) positions in
    docid order; positions are STRICTLY INCREASING within a doc, so
    per-segment deltas (first value absolute) are small — usually 1-2
    bytes instead of 5. ``seg_lens`` = tfs (one segment per doc)."""
    if flat.size == 0:
        return b""
    # int64 end-to-end: packed positions are < 2**63, in-segment deltas
    # are positive, and boundary diffs are overwritten with absolutes —
    # two's-complement wrap makes the bytes identical to uint64 math.
    # Chunked like varbyte_encode: head-term position streams reach 10^7+
    # values, and a single full-size delta temporary would re-fault
    # hundreds of MB per call on this hypervisor.
    u = np.ascontiguousarray(flat, dtype=np.int64)
    seg_lens = np.asarray(seg_lens, dtype=np.int64)
    seg_ends = np.cumsum(seg_lens)
    seg_starts = seg_ends - seg_lens  # includes 0
    n = u.size
    parts = []
    for lo in range(0, n, _ENC_CHUNK):
        hi = min(lo + _ENC_CHUNK, n)
        d = np.empty(hi - lo, dtype=np.int64)
        d[0] = (u[lo] - u[lo - 1]) if lo else u[0]
        np.subtract(u[lo + 1:hi], u[lo:hi - 1], out=d[1:])
        a = np.searchsorted(seg_starts, lo, side="left")
        b = np.searchsorted(seg_starts, hi, side="left")
        ss = seg_starts[a:b]
        d[ss - lo] = u[ss]
        parts.append(varbyte_encode(d.view(_U64)))
    return parts[0] if len(parts) == 1 else b"".join(parts)


def encode_positions_rowwise(
    flat: np.ndarray, seg_lens: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode per-segment positions into ONE varbyte buffer + per-segment
    byte offsets (len(seg_lens)+1 int64).

    Each segment is independently delta-coded (absolute first value), so
    slicing ``data[offsets[i]:offsets[i+1]]`` yields segment i's blob and
    ``b"".join`` of any segments in any order is byte-identical to
    ``encode_positions`` over those segments in that order — the property
    the tokenize stage uses to pre-encode per-(term, doc) blobs that the
    postings reducer later concatenates without re-encoding."""
    seg_lens = np.asarray(seg_lens, dtype=np.int64)
    offsets = np.zeros(seg_lens.size + 1, dtype=np.int64)
    if flat.size == 0:
        return b"", offsets
    u = np.ascontiguousarray(flat, dtype=np.int64)
    seg_ends = np.cumsum(seg_lens)
    seg_starts = seg_ends - seg_lens
    d = np.empty(u.size, dtype=np.int64)
    d[0] = u[0]
    np.subtract(u[1:], u[:-1], out=d[1:])
    d[seg_starts] = u[seg_starts]
    nb = np.ones(u.size, dtype=np.int64)
    for k in range(1, 9):
        m = d >= (np.int64(1) << np.int64(7 * k))
        if not m.any():
            break
        nb += m
    byte_ends = np.cumsum(nb)
    offsets[1:] = byte_ends[seg_ends - 1]
    return varbyte_encode(d.view(_U64)), offsets


def decode_positions(data: bytes, seg_lens: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions -> flat int64 positions."""
    if not data:
        return np.empty(0, dtype=np.int64)
    seg_lens = np.asarray(seg_lens, dtype=np.int64)
    vals = varbyte_decode(data, int(seg_lens.sum())).view(np.int64)
    c = np.cumsum(vals)  # int64 fast path; wrap-safe (bitwise-exact)
    seg_ends = np.cumsum(seg_lens)
    bases = np.zeros(seg_lens.size, dtype=np.int64)
    bases[1:] = c[seg_ends[:-1] - 1]
    return c - np.repeat(bases, seg_lens)


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
    rec["pos_vb"] = (
        encode_positions(positions, tfs) if positions is not None else b""
    )
    return rec


def decode_posting(rec: dict, with_positions: bool = False) -> dict:
    df = int(rec["df"])
    docids = delta_decode(varbyte_decode(rec["docs_vb"], df))
    tfs = varbyte_decode(rec["tfs_vb"], df).astype(np.int64)
    doc_lens = varbyte_decode(rec["lens_vb"], df).astype(np.int64)
    out = {"docids": docids, "tfs": tfs, "doc_lens": doc_lens}
    if with_positions and rec.get("pos_vb"):
        out["positions"] = decode_positions(rec["pos_vb"], tfs)
    return out
