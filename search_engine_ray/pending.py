"""Query-time existence filter (reference M8).

The reference drops search results whose backing file vanished between
indexation and the query (SimpleSearchManager.java:66: every hit is
re-checked with ``Files.exists`` before it is returned). Our corpus is an
immutable snapshot, so "the file vanished" maps to: *a document was
reported deleted after this index generation was committed, and the
physical tombstone merge (incremental.apply_delta) has not run yet*.

Mechanism — a tiny sidecar, not an index mutation:

* ``mark_deleted(index_root, urls=..., doc_ids=...)`` unions the ids into
  ``_pending_deletes.json`` (sorted int64 ids + a monotonic ``seq``),
  written atomically (tmp + rename). Doc ids are ``blake2b64(url)``
  (idhash.py), so marking by url needs NO index read — O(deleted) work,
  independent of corpus size, safe to call from a watcher the moment a
  source disappears.
* ``LocalSearcher`` stats the sidecar per query (an ``os.stat`` — the
  direct analogue of the reference's per-hit ``Files.exists``, but O(1)
  per query instead of O(k) filesystem probes) and folds the ids into the
  ranking mask (search.LocalSearcher.live_mask): dead docs are excluded
  BEFORE top-k selection, so a page still returns k live hits — strictly
  better than the reference's post-filter, and identical whenever the
  post-filter wouldn't have truncated the page.
* ``apply_delta`` prunes the sidecar after every physical merge
  (``prune_pending``): ids that no longer exist in the ordinal map are
  dropped, so the sidecar stays bounded by the *unmerged* delete backlog,
  never grows with history, and a full sync clears it entirely.

At 100 TB the sidecar is per shard root and holds only deletes reported
since the shard's last delta merge — typically thousands of ids (~8 B
each), re-read only when its (mtime, size, seq) signature changes.

Writes are atomic (tmp + rename: a reader never sees a torn file) but
follow the index's single-writer discipline (reference U3 /
IndexationSchedulerTask): concurrent ``mark_deleted`` callers should
route through one ``writer.IndexWriter`` — two simultaneous
read-modify-write cycles could drop one side's ids, exactly like two
uncoordinated delta merges would.
"""

from __future__ import annotations

import json
import os

import numpy as np

from search_engine_ray.idhash import doc_ids_for_urls

PENDING_FILE = "_pending_deletes.json"


def _path(index_root: str) -> str:
    return os.path.join(index_root, PENDING_FILE)


def shard_roots(index_root: str) -> list[str] | None:
    """Doc-sharded root (sharded.build_sharded layout) → its per-shard
    index roots, else None. Detection: a ``shard=0`` subdir and no own
    ``buckets/`` (every unsharded root has one); the shard count comes
    from the root ``global_stats.json`` the sharded build writes."""
    if (os.path.isdir(os.path.join(index_root, "buckets"))
            or not os.path.isdir(os.path.join(index_root, "shard=0"))):
        return None
    gs = os.path.join(index_root, "global_stats.json")
    if not os.path.exists(gs):
        return None
    with open(gs) as f:
        n = int(json.load(f).get("num_doc_shards", 0))
    if n <= 0:
        return None
    return [os.path.join(index_root, f"shard={s}") for s in range(n)]


def read_pending(index_root: str) -> tuple[np.ndarray, int]:
    """(sorted int64 doc ids, seq). Missing/empty sidecar -> ([], 0)."""
    p = _path(index_root)
    if not os.path.exists(p):
        return np.empty(0, np.int64), 0
    with open(p) as f:
        d = json.load(f)
    return (np.asarray(sorted(d.get("doc_ids", [])), dtype=np.int64),
            int(d.get("seq", 0)))


def pending_signature(index_root: str) -> tuple[int, int] | None:
    """Cheap per-query change detector: (mtime_ns, size) of the sidecar,
    None when absent. One ``os.stat`` — the searcher re-reads ids only
    when this changes."""
    try:
        st = os.stat(_path(index_root))
    except FileNotFoundError:
        return None
    return (st.st_mtime_ns, st.st_size)


def _write(index_root: str, ids: np.ndarray, seq: int) -> None:
    p = _path(index_root)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"seq": seq, "doc_ids": [int(i) for i in ids]}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def mark_deleted(index_root: str, urls: list[str] | None = None,
                 doc_ids=None) -> dict:
    """Report documents as deleted, effective at the NEXT query (M8).

    Unions the ids into the sidecar; the physical postings merge happens
    later (incremental.remove_urls / apply_delta / IndexWriter.drain).
    Returns {"seq", "pending"} — the new sidecar state.

    A doc-SHARDED root routes each id to its owning shard's sidecar by
    the build's own key (``doc_id % num_doc_shards`` — sharded.py:82),
    so `mark_deleted(sharded_root, ...)` works unchanged and untouched
    shards are not even opened; returns {"sharded", "pending"}.
    """
    roots = shard_roots(index_root)
    if roots is not None:
        parts = []
        if urls:
            parts.append(doc_ids_for_urls(list(urls)))
        if doc_ids is not None and len(doc_ids):
            parts.append(np.asarray(doc_ids, dtype=np.int64))
        ids = (np.unique(np.concatenate(parts)) if parts
               else np.empty(0, np.int64))
        total = 0
        for s, sroot in enumerate(roots):
            mine = ids[ids % len(roots) == s]
            if mine.size:
                total += mark_deleted(sroot, doc_ids=mine)["pending"]
        return {"sharded": len(roots), "pending": int(total)}
    new = []
    if urls:
        new.append(doc_ids_for_urls(list(urls)))
    if doc_ids is not None and len(doc_ids):
        new.append(np.asarray(doc_ids, dtype=np.int64))
    cur, seq = read_pending(index_root)
    merged = np.union1d(cur, np.concatenate(new)) if new else cur
    if merged.size == cur.size and seq > 0:
        return {"seq": seq, "pending": int(cur.size)}
    seq += 1
    _write(index_root, merged, seq)
    return {"seq": seq, "pending": int(merged.size)}


def prune_pending(index_root: str, live_doc_ids: np.ndarray,
                  processed_ids: np.ndarray | None = None) -> dict:
    """Sidecar maintenance after a physical merge commits:
    ``pending := (pending − processed) ∩ live``.

    * ``processed_ids`` — the delta's affected set (upserts ∪ tombstones):
      an upsert SUPERSEDES an earlier delete of the same doc (the doc
      exists again with new content), so it must leave the sidecar even
      though it is live; a tombstoned id leaves via the live intersect.
    * ids absent from ``live_doc_ids`` (sorted) were removed or never
      existed — dropped either way.
    """
    cur, seq = read_pending(index_root)
    orig_size = cur.size
    if not cur.size:
        return {"seq": seq, "pending": 0}
    if processed_ids is not None and len(processed_ids):
        cur = cur[~np.isin(cur, processed_ids)]
    pos = np.searchsorted(live_doc_ids, cur)
    pos_c = np.minimum(pos, max(len(live_doc_ids) - 1, 0))
    still = (cur == live_doc_ids[pos_c]) if len(live_doc_ids) else \
        np.zeros(cur.size, dtype=bool)
    kept = cur[still]
    if kept.size == orig_size:
        return {"seq": seq, "pending": int(kept.size)}
    seq += 1
    _write(index_root, kept, seq)
    return {"seq": seq, "pending": int(kept.size)}
