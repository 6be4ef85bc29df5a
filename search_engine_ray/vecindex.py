"""Persisted IVF vector index: build once, query many.

The in-memory ANN pipelines (functions/ann.py) re-scan the embedding
table per call — right for one-shot dedup jobs, wrong for a serving
path over a 100-TB embedding corpus. This module persists the IVF
layout the way build.py persists the inverted index:

    root/
      manifest.json            config + counts (atomic, written last)
      centroids.npy            (n_centroids x dim) float64 codebook
      lists/list_id=<c>/*.parquet   raw vectors of centroid list c

Build = ONE streaming assignment pass (map_batches with the broadcast
codebook) -> ``write_parquet(partition_cols=["list_id"])``. Query =
probe-list PARTITION PRUNING: a search with ``n_probe`` probes reads
only ``n_probe/n_centroids`` of the corpus from disk — the artifact is
what turns ANN from a scan into an index. Vectors are stored RAW and
re-normalized on read, so results are bit-identical to the in-memory
``functions.ann.ivf_topk`` with the same codebook (pinned by test);
``n_probe == n_centroids`` is exactly brute force.

Scale notes: ``n_centroids`` should grow ~sqrt(n_vectors); above a few
thousand lists, hive-partitioning one directory per list makes many
small files — the documented layout evolution is a coarse
``list_bucket = list_id % B`` partition column with ``list_id`` kept as
an ordinary column and row-group-sorted, pruning via parquet row-group
stats instead of directories (same read volume, bounded file count).

ref: the build/search split mirrors the reference's index persistence
(DocumentIndexManager.java builds; SimpleSearchManager.java queries).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa

from search_engine_ray.pool import actor_pool_size
import pyarrow.dataset as pds

from search_engine_ray.functions.ann import (
    _final_topk,
    _matrix,
    _normalize,
    train_codebook,
)


@dataclass(frozen=True)
class VecIndexConfig:
    n_centroids: int = 16
    sample_size: int = 10_000
    seed: int = 17


def _assign_lists(ds, C: np.ndarray, batch_size: int):
    """Streaming nearest-centroid assignment: + ``list_id`` column."""
    import ray

    cref = ray.put(C)

    class AssignBatch:
        def __init__(self):
            self._C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_matrix(batch.column("embedding")))
            assign = np.argmax(vecs @ self._C.T, axis=1).astype(np.int32)
            return batch.append_column("list_id", pa.array(assign))

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        AssignBatch, batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool_size(),
    )


def build_ivf_index(ds, root: str, cfg: VecIndexConfig = VecIndexConfig(),
                    batch_size: int = 4096, resume: bool = True,
                    codebook: np.ndarray | None = None) -> dict:
    """Train the codebook, assign every vector to its nearest-centroid
    list in one streaming pass, write the list-partitioned parquet and
    the manifest (last — its presence marks a complete build, the same
    atomic-commit convention as build.py). ``codebook`` overrides the
    trained centroids — the shared-codebook path for sharded builds and
    for the delta-vs-scratch identity test."""
    manifest_path = os.path.join(root, "manifest.json")
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("config") == asdict(cfg):
            return m
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    C = (np.asarray(codebook, dtype=np.float64) if codebook is not None
         else train_codebook(ds, cfg.n_centroids, cfg.sample_size,
                             cfg.seed))
    np.save(os.path.join(root, "centroids.npy"), C)
    assigned = _assign_lists(ds, C, batch_size)
    assigned.write_parquet(os.path.join(root, "lists"),
                           partition_cols=["list_id"])
    n_vectors = int(
        pds.dataset(os.path.join(root, "lists"), format="parquet",
                    partitioning="hive").count_rows())
    m = {"config": asdict(cfg), "n_vectors": n_vectors,
         "dim": int(C.shape[1]), "n_lists": int(C.shape[0])}
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, manifest_path)
    return m


def apply_ivf_delta(root: str, adds=None, remove_ids=None,
                    batch_size: int = 4096) -> dict:
    """Incremental maintenance of a persisted IVF index — the
    ``incremental.apply_delta`` analogue for the vector artifact:

    * ``adds`` (a (vec_id, embedding) Dataset, or None): assigned to the
      EXISTING lists with the stored codebook (centroids are immutable
      under deltas, like the inverted index's tokenizer config) and
      APPENDED as new ``delta-<seq>-*.parquet`` files inside each
      touched list directory — zero rewrite for pure inserts.
    * ``remove_ids`` (iterable of vec_ids, or None): located by a
      vec_id-COLUMN-ONLY scan of the list files (footer min/max stats
      prune fragments that cannot contain a removed id; the id column is
      ~1-2%% of the vector payload, so even the unpruned worst case reads
      a sliver of the index); ONLY files that actually contain a removed
      id are rewritten in place (original row order preserved).
    * an update is remove + add of the same vec_id, as in incremental.py.

    The manifest is rewritten LAST with the new ``n_vectors`` and a
    bumped ``delta_seq`` (atomic ``os.replace`` — a crash mid-delta
    leaves the previous manifest; re-running the delta is idempotent for
    removals and safe for adds because the delta file name carries the
    sequence number and is replaced whole). Searches need no code path
    change: ``IvfSearcher`` already reads every parquet file in a probed
    list directory. Equivalence contract (pinned by test): after a
    delta, the index is bit-identical in CONTENT to a scratch rebuild of
    the updated corpus with the same codebook, and searches equal brute
    force at full probe width."""
    import pyarrow.parquet as pq

    manifest_path = os.path.join(root, "manifest.json")
    with open(manifest_path) as f:
        m = json.load(f)
    C = np.load(os.path.join(root, "centroids.npy"))
    lists_dir = os.path.join(root, "lists")
    seq = int(m.get("delta_seq", 0)) + 1
    n_removed = 0
    n_added = 0

    if remove_ids is not None:
        rm = np.unique(np.asarray(list(remove_ids), dtype=np.int64))
        if rm.size:
            for dirpath, _dirs, files in os.walk(lists_dir):
                for fname in sorted(files):
                    if not fname.endswith(".parquet"):
                        continue
                    path = os.path.join(dirpath, fname)
                    md = pq.read_metadata(path)
                    # footer stats prune: can this file hold any rm id?
                    idx = md.schema.to_arrow_schema().get_field_index(
                        "vec_id")
                    may = False
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            may = True
                            break
                        lo = np.searchsorted(rm, st.min)
                        if lo < rm.size and rm[lo] <= st.max:
                            may = True
                            break
                    if not may:
                        continue
                    ids = pq.read_table(
                        path, columns=["vec_id"]).column(
                            "vec_id").to_numpy(zero_copy_only=False)
                    pos = np.searchsorted(rm, ids)
                    hit = (pos < rm.size) & (rm[np.minimum(
                        pos, rm.size - 1)] == ids)
                    if not hit.any():
                        continue
                    t = pq.read_table(path)
                    kept = t.filter(pa.array(~hit))
                    n_removed += int(hit.sum())
                    tmp = path + ".tmp"
                    pq.write_table(kept, tmp)
                    os.replace(tmp, path)

    if adds is not None:
        assigned = _assign_lists(adds, C, batch_size).to_pandas()
        n_added = len(assigned)
        for list_id, sub in assigned.groupby("list_id"):
            d = os.path.join(lists_dir, f"list_id={int(list_id)}")
            os.makedirs(d, exist_ok=True)
            out = pa.table({
                "vec_id": pa.array(sub["vec_id"].to_numpy(np.int64)),
                "embedding": pa.array(
                    [list(map(float, v)) for v in sub["embedding"]],
                    pa.list_(pa.float64())),
            })
            pq.write_table(out, os.path.join(
                d, f"delta-{seq:06d}.parquet"))

    m["n_vectors"] = int(m["n_vectors"]) - n_removed + n_added
    m["delta_seq"] = seq
    m["last_delta"] = {"added": n_added, "removed": n_removed}
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, manifest_path)
    return m


class IvfSearcher:
    """Query side of the persisted IVF index. Loads only the codebook +
    manifest up front; each search reads ONLY the probed list
    partitions (directory-pruned parquet scan)."""

    def __init__(self, root: str):
        manifest_path = os.path.join(root, "manifest.json")
        if not os.path.exists(manifest_path):
            raise FileNotFoundError(
                f"no vector-index manifest at {manifest_path}")
        with open(manifest_path) as f:
            self.manifest = json.load(f)
        self.centroids = np.load(os.path.join(root, "centroids.npy"))
        self._lists_dir = os.path.join(root, "lists")

    def _read_lists(self, list_ids: np.ndarray) -> pa.Table:
        paths = [
            os.path.join(self._lists_dir, f"list_id={int(c)}")
            for c in list_ids
        ]
        frags = [
            os.path.join(p, f)
            for p in paths if os.path.isdir(p)
            for f in sorted(os.listdir(p)) if f.endswith(".parquet")
        ]
        if not frags:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(
                                 pa.float64()))})
        return pds.dataset(frags, format="parquet").to_table(
            columns=["vec_id", "embedding"])

    def search(self, queries: np.ndarray, k: int = 10, n_probe: int = 4,
               round_to: int = 6):
        """(query_id, vec_id, cos) — same schema, ordering and rounding
        as ``functions.ann.ivf_topk``; exact cosine within the probed
        lists over re-normalized float64 vectors."""
        import pandas as pd

        q = _normalize(np.asarray(queries, dtype=np.float64))
        n_probe = min(n_probe, self.centroids.shape[0])
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :n_probe]
        out = []
        # group queries by identical probe sets? at serving scale each
        # query reads its own n_probe lists; here we just union per query
        for qi in range(q.shape[0]):
            t = self._read_lists(probes[qi])
            if t.num_rows == 0:
                continue
            vecs = _normalize(_matrix(t.column("embedding")))
            sims = vecs @ q[qi]
            df = pd.DataFrame({
                "query_id": np.full(t.num_rows, qi, dtype=np.int32),
                "vec_id": t.column("vec_id").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "cos": sims,
            })
            out.append(_final_topk(df, k=k, round_to=round_to))
        if not out:
            return pd.DataFrame({"query_id": pd.array([], "int32"),
                                 "vec_id": pd.array([], "int64"),
                                 "cos": pd.array([], "float64")})
        return pd.concat(out, ignore_index=True)
