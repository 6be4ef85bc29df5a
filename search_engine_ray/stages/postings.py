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
    decode_positions,
    delta_decode,
    delta_encode,
    encode_blockmax,
    encode_positions,
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


def _sorted_group_arrays(g: pd.DataFrame) -> dict:
    """Sort a token group by (term, doc_id); return plain numpy columns."""
    order = np.lexsort(
        (g["doc_id"].to_numpy(), g["term"].to_numpy(dtype=object))
    )
    return {
        "term": g["term"].to_numpy(dtype=object)[order],
        "doc_id": g["doc_id"].to_numpy()[order],
        "tf": g["tf"].to_numpy()[order].astype(np.int64),
        "doc_len": g["doc_len"].to_numpy()[order].astype(np.int64),
        "positions": g["positions"].to_numpy(dtype=object)[order],
    }


def _flat_positions(pos_cells, store_positions: bool) -> bytes:
    if not store_positions:
        return b""
    arrs = [np.asarray(p, dtype=np.int64) for p in pos_cells if p is not None and len(p)]
    if not arrs:
        return b""
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    return encode_positions(np.concatenate(arrs), lens)


def encode_run(g: pd.DataFrame, store_positions: bool = True) -> pd.DataFrame:
    """Phase-1 (salted path): one sorted, varbyte-encoded run per term for a
    (bucket, salt) group. No blockmax yet — that needs the full merged list."""
    cols = _sorted_group_arrays(g)
    starts, ends = _term_slices(cols["term"])
    bucket = int(g["bucket"].iloc[0])
    salt = int(g["salt"].iloc[0])
    store_pos = store_positions
    rows = {k: [] for k in ("term", "df", "docs_vb", "tfs_vb", "lens_vb", "pos_vb")}
    for s, e in zip(starts, ends):
        rows["term"].append(cols["term"][s])
        rows["df"].append(int(e - s))
        rows["docs_vb"].append(varbyte_encode(delta_encode(cols["doc_id"][s:e])))
        rows["tfs_vb"].append(varbyte_encode(cols["tf"][s:e]))
        rows["lens_vb"].append(varbyte_encode(cols["doc_len"][s:e]))
        rows["pos_vb"].append(_flat_positions(cols["positions"][s:e], store_pos))
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


def _encode_sorted_bucket(
    cols: dict, avgdl: float, store_positions: bool
) -> pa.Table:
    """Encode a (term, doc_id)-sorted column dict into the postings table."""
    starts, ends = _term_slices(cols["term"])
    rows = {k: [] for k in POSTINGS_SCHEMA.names}
    for s, e in zip(starts, ends):
        docids = cols["doc_id"][s:e]
        tfs = cols["tf"][s:e]
        lens = cols["doc_len"][s:e]
        partials = bm25_partial(tfs, lens, avgdl)
        rows["term"].append(cols["term"][s])
        rows["df"].append(int(e - s))
        rows["docs_vb"].append(varbyte_encode(delta_encode(docids)))
        rows["tfs_vb"].append(varbyte_encode(tfs))
        rows["lens_vb"].append(varbyte_encode(lens))
        rows["pos_vb"].append(_flat_positions(cols["positions"][s:e], store_positions))
        rows["blockmax"].append(encode_blockmax(docids, partials))
        rows["max_partial"].append(float(partials.max()))
    return pa.table({k: pa.array(v, POSTINGS_SCHEMA.field(k).type)
                     for k, v in rows.items()}, schema=POSTINGS_SCHEMA)


def build_bucket_direct(
    g: pd.DataFrame,
    index_root: str,
    cfg_hash: str,
    avgdl: float,
    store_positions: bool,
) -> pd.DataFrame:
    """Single-phase bucket build (salt == 1): sort, split, encode, write."""
    t0 = time.monotonic()
    bucket = int(g["bucket"].iloc[0])
    cols = _sorted_group_arrays(g)
    table = _encode_sorted_bucket(cols, avgdl, store_positions)
    _write_bucket(index_root, bucket, table, cfg_hash, len(g), t0)
    return _manifest_row(bucket, table.num_rows, len(g))


def build_bucket_from_files(
    batch: pd.DataFrame,
    index_root: str,
    cfg_hash: str,
    avgdl: float,
    store_positions: bool,
) -> pd.DataFrame:
    """Reducer task for the partitioned-write shuffle: the tokenize stage
    already wrote tokens hash-partitioned by bucket (``bucket_part=``), so
    the map side of the shuffle lives on shared storage — each task here
    reads ONE bucket's files directly and encodes it, with no Ray-level
    sort/groupby exchange at all (classic external shuffle; the bucket is
    also the resume unit).

    Everything stays in Arrow/numpy C kernels: one dataset read per bucket,
    ``Table.sort_by`` for the (term, doc_id) order, term-run boundaries via
    a vectorized not-equal on the sorted column, and positions flattened
    through the ListArray's offsets — no per-row Python objects."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pds

    out = []
    for _, row in batch.iterrows():
        t0 = time.monotonic()
        bucket = int(row["bucket"])
        t = pds.dataset(list(row["files"])).to_table(
            columns=["term", "doc_id", "tf", "doc_len", "positions"]
        )
        t = t.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        t = t.combine_chunks()
        term_col = t.column("term").chunk(0) if t.column("term").num_chunks \
            else pa.array([], pa.string())
        n = len(term_col)
        if n > 1:
            neq = pc.not_equal(term_col.slice(1), term_col.slice(0, n - 1))
            starts = np.concatenate(
                ([0],
                 np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1)
            )
        else:
            starts = np.zeros(min(n, 1), dtype=np.int64)
        ends = np.concatenate((starts[1:], [n])) if n else starts
        di = t.column("doc_id").to_numpy()
        tf = t.column("tf").to_numpy().astype(np.int64)
        dl = t.column("doc_len").to_numpy().astype(np.int64)
        pos_list = t.column("positions").chunk(0) if (
            store_positions and t.column("positions").num_chunks) else None
        if pos_list is not None:
            pos_offsets = pos_list.offsets.to_numpy()
            pos_values = pos_list.values.to_numpy() if len(pos_list.values) \
                else np.empty(0, np.int64)

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
            if pos_list is not None:
                flat = pos_values[pos_offsets[s]:pos_offsets[e]]
                rows["pos_vb"].append(
                    encode_positions(flat, tfs) if flat.size else b"")
            else:
                rows["pos_vb"].append(b"")
            rows["blockmax"].append(encode_blockmax(docids, partials))
            rows["max_partial"].append(float(partials.max()))
        table = pa.table({k: pa.array(v, POSTINGS_SCHEMA.field(k).type)
                          for k, v in rows.items()}, schema=POSTINGS_SCHEMA)
        _write_bucket(index_root, bucket, table, cfg_hash, t.num_rows, t0)
        out.append((bucket, table.num_rows, t.num_rows))
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
                flat = decode_positions(run["pos_vb"], tfs)
                splits = np.cumsum(tfs)[:-1]
                pos_parts.extend(np.split(flat, splits))
            elif store_positions:
                pos_parts.extend([np.empty(0, np.int64)] * df)
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
            reordered = [pos_parts[i] for i in order]
            rows["pos_vb"].append(_flat_positions(reordered, True))
        else:
            rows["pos_vb"].append(b"")
        rows["blockmax"].append(encode_blockmax(docids, partials))
        rows["max_partial"].append(float(partials.max()))
    table = pa.table({k: pa.array(v, POSTINGS_SCHEMA.field(k).type)
                      for k, v in rows.items()}, schema=POSTINGS_SCHEMA)
    _write_bucket(index_root, bucket, table, cfg_hash, n_postings, t0)
    return _manifest_row(bucket, table.num_rows, n_postings)
