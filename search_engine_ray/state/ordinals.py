"""Dense per-index doc ordinals.

Posting lists store ORDINALS (positions in the sorted array of the index's
doc ids), not the raw blake2b64 url hashes: random 63-bit ids have ~44-bit
deltas (6-7 varbyte bytes each), while dense ordinals delta-code to 1-3
bytes — several-fold smaller postings and faster decode. The mapping is a
pure function of the committed doc set (sorted unique doc_ids), so it is
deterministic across cluster sizes and retries; ordinal order == doc_id
order, which keeps the (score desc, doc_id asc) tie-break bit-identical.

External surfaces (search results, matched_rows, oracle comparisons) always
speak REAL doc ids; the translation happens at the edges (tokenize in,
top-k out).

Scale note: the mapping array costs 8 B/doc in each worker that needs it
(broadcast once per build via ray.put). At 10^12 docs a single global index
would need doc-space sharding anyway (as all production engines do —
ordinals are then shard-local and stay small); within a shard of 10^8-10^9
docs the array is 0.8-8 GB, loadable per node.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ORDINALS_FILE = "doc_ordinals.parquet"


def write_ordinals(index_root: str, docs_clean_dir: str) -> np.ndarray:
    """Sorted unique doc_ids of the committed docs_clean -> artifact."""
    t = pq.read_table(docs_clean_dir, columns=["doc_id"])
    ids = np.sort(t.column("doc_id").to_numpy())
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        os.path.join(index_root, ORDINALS_FILE),
    )
    return ids


def doclens_by_ordinal(docs_clean_dir: str) -> np.ndarray:
    """doc_len per ORDINAL (int64): the postings reducers gather BM25
    lengths from this one broadcast array instead of carrying a doc_len
    on every shuffled token row (tokens format v2). Same 8 B/doc scale
    ceiling as the ordinal map above."""
    t = pq.read_table(docs_clean_dir, columns=["doc_id", "doc_len"])
    ids = t.column("doc_id").to_numpy()
    lens = t.column("doc_len").to_numpy().astype(np.int64)
    return lens[np.argsort(ids, kind="stable")]


def load_ordinals(index_root: str) -> np.ndarray:
    return pq.read_table(
        os.path.join(index_root, ORDINALS_FILE)).column("doc_id").to_numpy()


def to_ordinals(doc_ids: np.ndarray, sorted_ids: np.ndarray) -> np.ndarray:
    """Map real doc ids -> ordinals; raises if an id is not in the index."""
    ords = np.searchsorted(sorted_ids, doc_ids)
    if ords.size and (
        (ords >= sorted_ids.size).any()
        or (sorted_ids[np.minimum(ords, sorted_ids.size - 1)]
            != doc_ids).any()
    ):
        raise KeyError("doc_id not present in the ordinal map")
    return ords


def from_ordinals(ords: np.ndarray, sorted_ids: np.ndarray) -> np.ndarray:
    return sorted_ids[ords]
