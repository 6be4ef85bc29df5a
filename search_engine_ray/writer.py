"""Indexation event consumer — the single-writer drain loop (reference U3).

The reference funnels every mutation through one queue drained by a
scheduler thread every second (IndexationSchedulerTask.java:33-63: drain →
ADD insert / UPDATE notify / REMOVE delete → fire ``onIndexationFinished``
when the queue is empty; scheduling DocumentIndexManager.java:345-351).
That single writer is what serializes index mutations against a mutable
in-heap radix tree.

Ray-natively the index is an immutable snapshot plus delta *generations*
(incremental.apply_delta), so the consumer loop becomes: buffer events,
coalesce per url (last write wins — the queue's replace-on-requeue
semantics), and apply ONE delta generation per drain. The expensive part
(tokenize + per-bucket merge) is a distributed Ray Data job; the queue and
the drain tick stay driver-side exactly like the reference's scheduler —
O(events) metadata, never corpus-sized.

Semantics preserved:

* **ADD / UPDATE** — both are upserts (apply_delta replaces affected docs
  by doc_id); the reference's distinction (UPDATE = diff reindex) is
  internal to the merge, which already anti-joins old vs new postings.
* **REMOVE** — visible at the *next query* via the M8 pending-deletes
  sidecar (pending.mark_deleted at enqueue time — the analogue of the
  vanished file failing ``Files.exists``), then physically merged out at
  the next drain.
* **onIndexationFinished** — listeners fire after every drain that
  applied a generation, with the apply metrics.
* Events enqueued DURING a drain land in the next generation (the
  reference's queue keeps accepting while the scheduler runs).

At 100 TB this is the ingest front door for trickle updates: drains stay
proportional to the event batch (SURVEY.md §2.6), while bulk recrawls go
through watch.sync_index which diffs whole snapshots.
"""

from __future__ import annotations

import os
import shutil
import threading
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_EPOCH_DEFAULT = 1704067200000000  # 2024-01-01T00:00:00Z in us


class IndexWriter:
    """Single-writer event queue over one index root.

    >>> w = IndexWriter(index_root)
    >>> w.add_document("https://x/a", text="hello world")
    >>> w.remove_document("https://x/b")          # dead at next query (M8)
    >>> w.drain()                                  # one delta generation
    """

    def __init__(self, index_root: str):
        self.index_root = index_root
        self._lock = threading.Lock()
        self._queue: list[dict] = []
        self._listeners: list = []
        self.drains_applied = 0

    # ---- producers (reference DocumentIndexManager.index/remove) --------
    def _enqueue(self, op: str, url: str, **fields) -> None:
        if not isinstance(url, str) or not url:
            raise ValueError("url must be a non-empty string")
        with self._lock:
            self._queue.append({"op": op, "url": url, **fields})

    def add_document(self, url: str, text: str | None = None,
                     html: bytes | None = None,
                     warc_ts: int | None = None,
                     lang: str = "en") -> None:
        """Enqueue an ADD/UPDATE (upsert). ``text`` or ``html`` required;
        a null text is extracted from html by the build's own clean stage
        (stages/clean.py) — same path, same byte-identity guarantees."""
        if text is None and html is None:
            raise ValueError("add_document needs text or html")
        self._enqueue("upsert", url, text=text, html=html,
                      warc_ts=(_EPOCH_DEFAULT if warc_ts is None
                               else int(warc_ts)), lang=lang)

    # UPDATE == ADD of the new content: the delta merge computes the
    # kept/new/removed token sets itself (reference DocumentUpdateTask)
    update_document = add_document

    def remove_document(self, url: str) -> None:
        """Enqueue a REMOVE. The doc stops matching queries IMMEDIATELY
        (M8 existence filter — pending.mark_deleted here, before any
        drain); the postings merge happens at the next drain."""
        from search_engine_ray.pending import mark_deleted

        self._enqueue("remove", url)
        mark_deleted(self.index_root, urls=[url])

    def on_indexation_finished(self, fn) -> None:
        """Register a listener called as ``fn(summary)`` after every
        drain (reference onIndexationFinished)."""
        self._listeners.append(fn)

    def pending_events(self) -> int:
        with self._lock:
            return len(self._queue)

    # ---- the consumer (reference IndexationSchedulerTask.run) -----------
    def drain(self) -> dict:
        """Drain the queue into ONE delta generation. Coalesces events
        per url (last wins — an upsert after a remove re-adds the doc, a
        remove after upserts deletes it); returns apply metrics or
        ``{"applied": False}`` on an empty queue."""
        with self._lock:
            events, self._queue = self._queue, []
        if not events:
            summary = {"applied": False, "events": 0}
            for fn in self._listeners:
                fn(summary)
            return summary

        last: dict[str, dict] = {}
        for ev in events:  # arrival order => last write wins
            last[ev["url"]] = ev
        upserts = [e for e in last.values() if e["op"] == "upsert"]
        removes = sorted(e["url"] for e in last.values()
                         if e["op"] == "remove")

        from search_engine_ray.incremental import apply_delta

        frag_dir = None
        try:
            if upserts:
                upserts.sort(key=lambda e: e["url"])  # deterministic page
                frag_dir = os.path.join(
                    self.index_root, f"_writer_tmp_{uuid.uuid4().hex[:8]}")
                os.makedirs(frag_dir)
                t = pa.table({
                    "url": [e["url"] for e in upserts],
                    "warc_ts": pa.array([e["warc_ts"] for e in upserts],
                                        pa.timestamp("us")),
                    "html": pa.array([e["html"] for e in upserts],
                                     pa.binary()),
                    "text": pa.array([e["text"] for e in upserts],
                                     pa.string()),
                    "lang": [e["lang"] for e in upserts],
                }, schema=PAGES_SCHEMA)
                pq.write_table(t, os.path.join(frag_dir, "events.parquet"))
            metrics = apply_delta(
                self.index_root,
                frag_dir,
                deleted_urls=removes or None,
            )
        finally:
            if frag_dir is not None:
                shutil.rmtree(frag_dir, ignore_errors=True)
        self.drains_applied += 1
        summary = {"applied": True, "events": len(events),
                   "upserts": len(upserts), "removes": len(removes),
                   "metrics": metrics}
        for fn in self._listeners:
            fn(summary)
        return summary

    def run_loop(self, interval_s: float = 1.0, stop=None,
                 max_iterations: int | None = None) -> int:
        """The 1-second scheduler tick (reference
        DocumentIndexManager.java:345-351 schedules the consumer at a
        fixed rate). Returns the number of drains that applied a
        generation. ``stop`` is a ``threading.Event``."""
        applied = 0
        n = 0
        while (stop is None or not stop.is_set()) and (
                max_iterations is None or n < max_iterations):
            if self.drain()["applied"]:
                applied += 1
            n += 1
            if max_iterations is not None and n >= max_iterations:
                break
            if stop is not None:
                if stop.wait(interval_s):
                    break
            else:
                time.sleep(interval_s)
        return applied
