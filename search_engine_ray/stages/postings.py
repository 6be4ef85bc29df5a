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
    construction, not by parallel-implementation luck. BM25 doc lengths
    are gathered from the ordinal->doc_len array; per-doc position blobs
    (tokens v2) concatenate into a term's ``pos_vb`` as zero-decode byte
    slices of the sorted binary column."""
    import pyarrow.compute as pc

    t = t.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    t = t.combine_chunks()
    term_col = t.column("term").chunk(0) if t.column("term").num_chunks \
        else pa.array([], pa.string())
    n = len(term_col)
    if n > 1:
        neq = pc.not_equal(term_col.slice(1), term_col.slice(0, n - 1))
        starts = np.concatenate(
            ([0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1))
    else:
        starts = np.zeros(min(n, 1), dtype=np.int64)
    ends = np.concatenate((starts[1:], [n])) if n else starts
    di = t.column("doc_id").to_numpy()
    tf = t.column("tf").to_numpy().astype(np.int64)
    dl = doclens[di] if n else np.empty(0, np.int64)
    pos_chunk = t.column("pos_vb").chunk(0) if (
        store_positions and t.column("pos_vb").num_chunks) else None
    if pos_chunk is not None:
        bufs = pos_chunk.buffers()
        off_dt = np.int64 if pa.types.is_large_binary(pos_chunk.type) \
            else np.int32  # tokens write large_binary; merges may not
        offs = np.frombuffer(bufs[1], dtype=off_dt)[
            pos_chunk.offset:pos_chunk.offset + n + 1]
        pdata = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, np.uint8)

    rows = {k: [] for k in POSTINGS_SCHEMA.names}
    for s, e in zip(starts, ends):
        docids = di[s:e]
        tfs = tf[s:e]
        lens = dl[s:e]
        partials = bm25_partial(tfs, lens, avgdl)
        rows["term"].append(term_col[s].as_py())
        rows["df"].append(int(e - s))
        rows["docs_vb"].append(varbyte_encode(delta_encode(docids)))
        rows["tfs_vb"].append(varbyte_encode(tfs))
        rows["lens_vb"].append(varbyte_encode(lens))
        rows["pos_vb"].append(
            pdata[offs[s]:offs[e]].tobytes()
            if pos_chunk is not None else b"")
        rows["blockmax"].append(encode_blockmax(docids, partials))
        rows["max_partial"].append(float(partials.max()))
    table = pa.table({k: pa.array(v, POSTINGS_SCHEMA.field(k).type)
                      for k, v in rows.items()}, schema=POSTINGS_SCHEMA)
    return table, t.num_rows


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
