"""Stage 3: term-partitioned posting-list construction.

The reference builds its index by inserting tokens one at a time into a
shared radix tree under a global write lock, on a single thread
(ref: engine/src/main/java/org/search/engine/tree/
SearchEngineConcurrentTree.java:47-147, index/IndexationSchedulerTask.java:33-63).
The bulk-equivalent relation (term -> sorted doc set with tf/positions) is
computed here as a shuffle: ``groupby(bucket)`` where
``bucket = hash(term) % P`` co-locates each term's rows, then a vectorized
per-bucket build (numpy sort + run-boundary split — ONE Python call per
bucket, one vectorized encode per term).

Skew handling (north-rule requirement): Zipf head terms make some buckets
hot. With ``salt = S > 1`` the shuffle key becomes ``(bucket, doc_id % S)``
— each salted sub-group holds a disjoint doc-id slice of the bucket, so no
single task materializes a head bucket. ``encode_run`` builds per-salt
sorted runs; ``merge_runs`` then merges the <=S runs per term (doc-id slices
are disjoint, so merge = concat + sort) and writes the final artifact.
``S == 1`` takes the direct single-phase path.

Artifact per bucket (``buckets/bucket={b}/postings.parquet``; term-sorted —
the flat equivalent of the reference's radix-tree ordering, which is what
serves prefix queries, ref: SearchEngineConcurrentTree.java:176-195):

    term, df, docs_vb, tfs_vb, lens_vb, pos_vb, blockmax, max_partial

Files are committed atomically (write temp + rename) with a per-bucket
manifest — the resume unit for mid-shuffle restart (state/manifest.py).
"""

from __future__ import annotations

import os
import tempfile
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_ray.codec import (
    bm25_partial,
    delta_decode,
    delta_encode,
    encode_blockmax,
    varbyte_decode,
    varbyte_encode,
)
from search_engine_ray.state.manifest import write_manifest

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("docs_vb", pa.binary()),
        ("tfs_vb", pa.binary()),
        ("lens_vb", pa.binary()),
        ("pos_vb", pa.binary()),
        ("blockmax", pa.binary()),
        ("max_partial", pa.float64()),
    ]
)

RUN_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("salt", pa.int32()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("docs_vb", pa.binary()),
        ("tfs_vb", pa.binary()),
        ("lens_vb", pa.binary()),
        ("pos_vb", pa.binary()),
    ]
)


def _term_slices(terms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end offsets of equal-term runs in a term-sorted array."""
    n = len(terms)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return starts, ends


def encode_run(
    g: pd.DataFrame, store_positions: bool = True, doclen_ref=None
) -> pd.DataFrame:
    """Phase-1 (salted path): one sorted, varbyte-encoded run per term for a
    (bucket, salt) group. No blockmax yet — that needs the full merged list.

    Tokens format v2: rows carry pre-encoded per-doc position blobs
    (``pos_vb``), so a run's positions are a byte concatenation; BM25 doc
    lengths come from the broadcast ordinal->doc_len array."""
    import ray

    order = np.lexsort(
        (g["doc_id"].to_numpy(), g["term"].to_numpy(dtype=object))
    )
    terms = g["term"].to_numpy(dtype=object)[order]
    di = g["doc_id"].to_numpy()[order]
    tf = g["tf"].to_numpy()[order].astype(np.int64)
    dl = ray.get(doclen_ref)[di]
    pos_cells = g["pos_vb"].to_numpy(dtype=object)[order]
    starts, ends = _term_slices(terms)
    bucket = int(g["bucket"].iloc[0])
    salt = int(g["salt"].iloc[0])
    rows = {k: [] for k in ("term", "df", "docs_vb", "tfs_vb", "lens_vb", "pos_vb")}
    for s, e in zip(starts, ends):
        rows["term"].append(terms[s])
        rows["df"].append(int(e - s))
        rows["docs_vb"].append(varbyte_encode(delta_encode(di[s:e])))
        rows["tfs_vb"].append(varbyte_encode(tf[s:e]))
        rows["lens_vb"].append(varbyte_encode(dl[s:e]))
        rows["pos_vb"].append(
            b"".join(pos_cells[s:e]) if store_positions else b"")
    n = len(rows["term"])
    return pd.DataFrame(
        {"bucket": [bucket] * n, "salt": [salt] * n, **rows}
    )


def _write_bucket(
    index_root: str,
    bucket: int,
    table: pa.Table,
    cfg_hash: str,
    n_postings: int,
    t0: float,
) -> None:
    bdir = os.path.join(index_root, "buckets", f"bucket={bucket}")
    os.makedirs(bdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=bdir, suffix=".parquet.tmp")
    os.close(fd)
    pq.write_table(table, tmp, compression="zstd")
    final = os.path.join(bdir, "postings.parquet")
    os.replace(tmp, final)
    write_manifest(
        bdir,
        cfg_hash,
        metrics={
            "n_terms": table.num_rows,
            "n_postings": n_postings,
            "bytes": os.path.getsize(final),
            "seconds": round(time.monotonic() - t0, 3),
        },
        extra={"bucket": bucket},
    )


def _manifest_row(bucket: int, n_terms: int, n_postings: int) -> pd.DataFrame:
    return pd.DataFrame(
        {"bucket": [bucket], "n_terms": [n_terms], "n_postings": [n_postings]}
    )


def _vb_widths(v: np.ndarray) -> np.ndarray:
    """Per-value varbyte byte widths (int64 values < 2**63)."""
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, 9):
        m = v >= (np.int64(1) << np.int64(7 * k))
        if not m.any():
            break
        nb += m
    return nb


def _bin_from_stream(stream: bytes, byte_offsets: np.ndarray) -> pa.Array:
    """Zero-copy-ish binary array from one encoded stream + per-cell byte
    offsets (len = cells + 1)."""
    return pa.Array.from_buffers(
        pa.binary(), byte_offsets.size - 1,
        [None, pa.py_buffer(byte_offsets.astype(np.int32).tobytes()),
         pa.py_buffer(stream)])


def _concat_aranges(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]), [0..lens[1]), ... concatenated (lens all >= 1)."""
    total = int(lens.sum())
    step = np.ones(total, dtype=np.int64)
    step[0] = 0
    seg = np.cumsum(lens)[:-1]
    step[seg] -= lens[:-1]
    return np.cumsum(step)


def encode_token_table(
    t: pa.Table, doclens: np.ndarray, avgdl: float, store_positions: bool
) -> tuple[pa.Table, int]:
    """Sort a token-shaped table — (term, doc_id ORDINAL, tf, pos_vb
    per-doc blob) — by (term, doc_id) and encode it into the postings
    schema; returns (table, n_postings).

    The ONE encode kernel: both the full-build reducer
    (``build_bucket_from_files``) and the delta merge
    (``incremental._merge_bucket``) feed it, so an index produced by
    apply_delta is byte-identical to a from-scratch build by
    construction, not by parallel-implementation luck.

    Fully vectorized — no per-term Python encode loop and no Arrow
    string sort:

    * the (term, doc_id) order comes from dictionary-encoding the term
      column, ranking the (small) dictionary with an Arrow sort (UTF-8
      bytewise — identical order to the previous ``Table.sort_by``), and
      ONE numpy lexsort over (doc_id, rank) — term strings are never
      gathered per row;
    * ``docs_vb`` / ``tfs_vb`` / ``lens_vb`` are encoded as ONE varbyte
      stream each with per-term byte offsets (varbyte is value-delimited,
      so the stream slice for a term is byte-identical to encoding that
      term alone — the tokens-v2 property, cf. ``encode_positions_rowwise``);
      docs deltas restart with an absolute head at each term start;
    * block-max metadata is one ``np.maximum.reduceat`` over global block
      starts; per-doc position blobs (tokens v2) are re-packed in sorted
      order with a single ragged gather and byte-sliced per term.

    BM25 doc lengths are gathered from the ordinal->doc_len array."""
    import pyarrow.compute as pc

    from search_engine_ray.codec import BLOCK_SIZE

    t = t.combine_chunks()
    n = t.num_rows
    if n == 0:
        return POSTINGS_SCHEMA.empty_table(), 0
    term_col = t.column("term").chunk(0)
    di = t.column("doc_id").to_numpy()
    tf = t.column("tf").to_numpy().astype(np.int64)

    # ---- (term, doc_id) permutation via dictionary ranks ----------------
    enc = pc.dictionary_encode(term_col)
    codes = enc.indices.to_numpy().astype(np.int64)
    dict_arr = enc.dictionary
    dsort = pc.array_sort_indices(dict_arr).to_numpy().astype(np.int64)
    rank = np.empty(dsort.size, dtype=np.int64)
    rank[dsort] = np.arange(dsort.size)
    key = rank[codes]
    order = np.lexsort((di, key))
    di = di[order]
    tf = tf[order]
    key = key[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(np.diff(key) != 0) + 1)) \
        if n > 1 else np.zeros(1, dtype=np.int64)
    ends = np.concatenate((starts[1:], [n]))
    df = ends - starts
    dl = doclens[di]
    partials = bm25_partial(tf, dl, avgdl)

    # ---- one varbyte stream per column, per-term byte offsets -----------
    d = np.empty(n, dtype=np.int64)
    d[0] = di[0]
    np.subtract(di[1:], di[:-1], out=d[1:])
    d[starts] = di[starts]  # absolute head per term
    cells = {}
    for name, vals in (("docs_vb", d), ("tfs_vb", tf), ("lens_vb", dl)):
        byte_ends = np.cumsum(_vb_widths(vals))
        offs = np.zeros(starts.size + 1, dtype=np.int64)
        offs[1:] = byte_ends[ends - 1]
        cells[name] = _bin_from_stream(varbyte_encode(vals.view(np.uint64)),
                                       offs)

    # ---- block-max metadata, vectorized over all terms ------------------
    nblk = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_starts = np.repeat(starts, nblk) + _concat_aranges(nblk) * BLOCK_SIZE
    blk_ends = np.minimum(blk_starts + BLOCK_SIZE, np.repeat(ends, nblk))
    lasts = di[blk_ends - 1].astype("<i8")
    maxs = np.maximum.reduceat(partials, blk_starts).astype("<f8")
    blk_bounds = np.concatenate(([0], np.cumsum(nblk)))
    max_partial = np.maximum.reduceat(maxs, blk_bounds[:-1])
    blockmax_cells = [
        lasts[a:b].tobytes() + maxs[a:b].tobytes()
        for a, b in zip(blk_bounds[:-1], blk_bounds[1:])
    ]

    # ---- per-doc position blobs: ragged gather into sorted order --------
    pos_chunk = t.column("pos_vb").chunk(0) if (
        store_positions and t.column("pos_vb").num_chunks) else None
    if pos_chunk is not None:
        # Arrow's C++ take does the ragged per-row byte gather natively
        # (a numpy fancy-gather here needs 8x-amplified int64 index
        # temporaries — measured 10x slower cold on this hypervisor)
        sorted_pos = pos_chunk.take(pa.array(order))
        bufs = sorted_pos.buffers()
        off_dt = np.int64 if pa.types.is_large_binary(sorted_pos.type) \
            else np.int32  # tokens write large_binary; merges may not
        p_offs = np.frombuffer(bufs[1], dtype=off_dt)[
            sorted_pos.offset:sorted_pos.offset + n + 1].astype(np.int64)
        pdata = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, np.uint8)
        pos_offs = p_offs[np.concatenate((starts, [n]))] - p_offs[0]
        pos_cell = _bin_from_stream(
            pdata[p_offs[0]:p_offs[-1]].tobytes(), pos_offs)
    else:
        pos_cell = _bin_from_stream(
            b"", np.zeros(starts.size + 1, dtype=np.int64))

    table = pa.table(
        {
            "term": dict_arr.take(pa.array(dsort)).cast(pa.string()),
            "df": pa.array(df, pa.int64()),
            "docs_vb": cells["docs_vb"],
            "tfs_vb": cells["tfs_vb"],
            "lens_vb": cells["lens_vb"],
            "pos_vb": pos_cell,
            "blockmax": pa.array(blockmax_cells, pa.binary()),
            "max_partial": pa.array(max_partial, pa.float64()),
        },
        schema=POSTINGS_SCHEMA,
    )
    return table, n


def build_bucket_from_files(
    batch: pd.DataFrame,
    index_root: str,
    cfg_hash: str,
    avgdl: float,
    store_positions: bool,
    doclen_ref=None,
) -> pd.DataFrame:
    """Reducer task for the partitioned-write shuffle: the tokenize stage
    already wrote tokens hash-partitioned by bucket (``bucket_part=``), so
    the map side of the shuffle lives on shared storage — each task here
    reads ONE bucket's files directly and encodes it, with no Ray-level
    sort/groupby exchange at all (classic external shuffle; the bucket is
    also the resume unit).

    Everything stays in Arrow/numpy C kernels (``encode_token_table``):
    one dataset read per bucket, ``Table.sort_by`` for the (term, doc_id)
    order, term-run boundaries via a vectorized not-equal on the sorted
    column. Positions arrive as pre-encoded per-doc blobs (tokens format
    v2), so a term's ``pos_vb`` is a zero-decode byte-slice of the sorted
    binary column — the reducer is memory-bandwidth-bound, and this moves
    ~1-2 bytes per position through the sort instead of a list<int64>'s 8.
    BM25 doc lengths are gathered from the broadcast ordinal->doc_len
    array (fetched once per worker from the object store)."""
    import pyarrow.dataset as pds
    import ray

    doclens = ray.get(doclen_ref)
    out = []
    for _, row in batch.iterrows():
        t0 = time.monotonic()
        bucket = int(row["bucket"])
        t = pds.dataset(list(row["files"])).to_table(
            columns=["term", "doc_id", "tf", "pos_vb"]
        )
        table, n_post = encode_token_table(t, doclens, avgdl,
                                           store_positions)
        _write_bucket(index_root, bucket, table, cfg_hash, n_post, t0)
        out.append((bucket, table.num_rows, n_post))
    return pd.DataFrame(out, columns=["bucket", "n_terms", "n_postings"])


def merge_runs(
    g: pd.DataFrame,
    index_root: str,
    cfg_hash: str,
    avgdl: float,
    store_positions: bool,
) -> pd.DataFrame:
    """Phase-2 (salted path): merge per-salt runs of each term into the final
    posting list + blockmax. Doc-id slices are disjoint across salts, so the
    merge is concat + argsort (mergesort of disjoint interleaved sets)."""
    t0 = time.monotonic()
    bucket = int(g["bucket"].iloc[0])
    g = g.sort_values(["term", "salt"], kind="mergesort")
    terms = g["term"].to_numpy(dtype=object)
    starts, ends = _term_slices(terms)
    rows = {k: [] for k in POSTINGS_SCHEMA.names}
    n_postings = 0
    for s, e in zip(starts, ends):
        sub = g.iloc[s:e]
        docid_parts, tf_parts, len_parts, pos_parts = [], [], [], []
        for _, run in sub.iterrows():
            df = int(run["df"])
            docids = delta_decode(varbyte_decode(run["docs_vb"], df))
            tfs = varbyte_decode(run["tfs_vb"], df).astype(np.int64)
            lens = varbyte_decode(run["lens_vb"], df).astype(np.int64)
            docid_parts.append(docids)
            tf_parts.append(tfs)
            len_parts.append(lens)
            if store_positions and run["pos_vb"]:
                # per-doc blobs are independently delta-coded, so the
                # merge never decodes positions: split the run's bytes at
                # per-doc boundaries (value ends = MSB bytes) and rejoin
                # in merged doc order below
                blob = run["pos_vb"]
                arr = np.frombuffer(blob, dtype=np.uint8)
                vends = np.flatnonzero(arr & 0x80)
                byte_ends = vends[np.cumsum(tfs) - 1] + 1
                byte_starts = np.concatenate(([0], byte_ends[:-1]))
                pos_parts.extend(
                    blob[bs:be] for bs, be in zip(byte_starts, byte_ends))
            elif store_positions:
                pos_parts.extend([b""] * df)
        docids = np.concatenate(docid_parts)
        order = np.argsort(docids, kind="mergesort")
        docids = docids[order]
        tfs = np.concatenate(tf_parts)[order]
        lens = np.concatenate(len_parts)[order]
        partials = bm25_partial(tfs, lens, avgdl)
        n_postings += docids.size
        rows["term"].append(terms[s])
        rows["df"].append(int(docids.size))
        rows["docs_vb"].append(varbyte_encode(delta_encode(docids)))
        rows["tfs_vb"].append(varbyte_encode(tfs))
        rows["lens_vb"].append(varbyte_encode(lens))
        if store_positions:
            rows["pos_vb"].append(b"".join(pos_parts[i] for i in order))
        else:
            rows["pos_vb"].append(b"")
        rows["blockmax"].append(encode_blockmax(docids, partials))
        rows["max_partial"].append(float(partials.max()))
    table = pa.table({k: pa.array(v, POSTINGS_SCHEMA.field(k).type)
                      for k, v in rows.items()}, schema=POSTINGS_SCHEMA)
    _write_bucket(index_root, bucket, table, cfg_hash, n_postings, t0)
    return _manifest_row(bucket, table.num_rows, n_postings)
