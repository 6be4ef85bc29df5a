"""doc_id-sorted (doc_id, url) artifact + result-only url resolution.

The reference resolves docId -> path by scanning its in-heap registry
(ref: engine/src/main/java/org/search/engine/search/
SimpleSearchManager.java:64-65). The r1/r2 engine analogue loaded the
ENTIRE (doc_id -> url) dict per searcher process — multi-GB of Python
dict at the 50M-doc shard ceiling, paid to resolve k=10 urls per query.

This module replaces it: the build writes ``docmap/`` — the two columns
SORTED by doc_id with small row groups — and the query path binary-
searches parquet row-group footer statistics to read ONLY the row
group(s) containing its hit ids (LRU-cached decoded). Serving memory is
O(row-group stats) + the LRU, never O(corpus); a query touches ~1 row
group per k hits.

Indexes built before this artifact existed fall back to one sorted
compact Arrow load of docs_clean (numpy ids + Arrow string url array —
still no Python dict).
"""

from __future__ import annotations

import glob
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOCMAP_DIR = "docmap"
ROW_GROUP = 65536  # ~64k (id, url) pairs per row group: ~4 MB decoded


def write_docmap(index_root: str, docs_clean_dir: str) -> None:
    """Write the sorted docmap artifact (atomic replace).

    Driver-side sort below ~2M docs (two small columns — cheaper than a
    Ray job's launch cost); a distributed ``Dataset.sort`` above (row-
    group stats keep resolution correct for any file layout as long as
    groups are internally sorted and mutually disjoint, which a sort
    guarantees)."""
    import shutil

    from search_engine_ray.build import _count_rows, _expand_inputs

    out_dir = os.path.join(index_root, DOCMAP_DIR)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    n = _count_rows(docs_clean_dir)
    if n <= 2_000_000:
        t = pq.read_table(docs_clean_dir, columns=["doc_id", "url"])
        order = np.argsort(t.column("doc_id").to_numpy(), kind="stable")
        t = t.take(pa.array(order))
        pq.write_table(t, os.path.join(tmp, "docmap.parquet"),
                       row_group_size=ROW_GROUP)
    else:
        import ray.data as rd

        ds = rd.read_parquet(_expand_inputs(docs_clean_dir),
                             columns=["doc_id", "url"])
        # NOTE: row_group_size must be a direct kwarg — Ray 2.49's
        # write_parquet(**arrow_parquet_args) forwards an
        # arrow_parquet_args dict verbatim and the writer rejects it
        ds.sort("doc_id").write_parquet(tmp, row_group_size=ROW_GROUP)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)


class DocMap:
    """Row-group-granular docId -> url resolver (footer stats only at
    load; url bytes read per bucket of hits, LRU-cached)."""

    _CACHE_MAX = 128  # decoded row groups kept hot (~0.5 GB worst case)

    def __init__(self, index_root: str):
        self._files: list[str] = sorted(glob.glob(
            os.path.join(index_root, DOCMAP_DIR, "*.parquet")))
        self._fallback: tuple[np.ndarray, pa.Array] | None = None
        self._cache: OrderedDict[tuple[int, int],
                                 tuple[np.ndarray, pa.Array]] = OrderedDict()
        if not self._files:
            # pre-docmap index: one sorted compact load of docs_clean
            # (numpy ids + Arrow string array — no Python dict)
            t = pq.read_table(os.path.join(index_root, "docs_clean"),
                              columns=["doc_id", "url"])
            ids = t.column("doc_id").to_numpy()
            order = np.argsort(ids, kind="stable")
            self._fallback = (
                ids[order],
                t.column("url").combine_chunks().take(pa.array(order)),
            )
            return
        mins, maxs, keys = [], [], []
        for fi, f in enumerate(self._files):
            md = pq.ParquetFile(f).metadata
            schema_idx = {md.schema.column(i).name: i
                          for i in range(md.num_columns)}
            ci = schema_idx["doc_id"]
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
                keys.append((fi, g))
        order = np.argsort(np.asarray(mins, dtype=np.int64), kind="stable")
        self._mins = np.asarray(mins, dtype=np.int64)[order]
        self._maxs = np.asarray(maxs, dtype=np.int64)[order]
        self._keys = [keys[i] for i in order]

    def _row_group(self, key: tuple[int, int]) -> tuple[np.ndarray, pa.Array]:
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        fi, g = key
        t = pq.ParquetFile(self._files[fi]).read_row_group(
            g, columns=["doc_id", "url"])
        hit = (t.column("doc_id").to_numpy(),
               t.column("url").combine_chunks())
        self._cache[key] = hit
        if len(self._cache) > self._CACHE_MAX:
            self._cache.popitem(last=False)
        return hit

    def urls_for(self, doc_ids) -> list[str]:
        """Resolve a (small) hit list; unknown ids resolve to ''."""
        ids = np.asarray(doc_ids, dtype=np.int64)
        out = [""] * len(ids)
        if not len(ids):
            return out
        if self._fallback is not None:
            s_ids, s_urls = self._fallback
            pos = np.searchsorted(s_ids, ids)
            for i, (p, d) in enumerate(zip(pos, ids)):
                if p < len(s_ids) and s_ids[p] == d:
                    out[i] = s_urls[int(p)].as_py()
            return out
        # route each id to its row group via the footer-stats ranges,
        # then read each touched group once
        rg_of = np.searchsorted(self._mins, ids, side="right") - 1
        by_group: dict[int, list[int]] = {}
        for i, (r, d) in enumerate(zip(rg_of, ids)):
            if r < 0 or d > self._maxs[r]:
                continue  # id outside every group's range
            by_group.setdefault(int(r), []).append(i)
        for r, idxs in by_group.items():
            g_ids, g_urls = self._row_group(self._keys[r])
            pos = np.searchsorted(g_ids, ids[idxs])
            for i, p in zip(idxs, pos):
                if p < len(g_ids) and g_ids[p] == ids[i]:
                    out[i] = g_urls[int(p)].as_py()
        return out
