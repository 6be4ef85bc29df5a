"""Text-folder source — the reference's ACTUAL input mode (S1/S2/S3).

The reference indexes a folder of plain-text files: walk the tree, skip
hidden files and directories, read each file line by line
(ref: engine/src/main/java/org/search/engine/index/DocumentIndexManager.java:69-121
``indexFolder``; hidden filter :94-99,338-343; per-line reader
AbstractDocumentReadTask.java:31-50; single-file ``indexFile`` :123-134).
This source adapts that world to the engine's pages schema, so a user of
the reference can point the Ray engine at the same folder:

* ``url``     = ``file://<absolute path>`` (stable doc identity),
* ``warc_ts`` = file mtime (so re-indexing after an edit keeps the newest
  version under the engine's max-warc_ts dedup rule, M6),
* ``text``    = utf-8 decoded content (``errors="replace"``), ``html=b""``,
* hidden files and files under hidden directories are SKIPPED (M4).

Enumeration walks metadata only on the driver (names + mtimes); contents
are read DISTRIBUTED via ``read_binary_files`` (one task per file group).
In local mode workers share the filesystem; on a cluster the folder must
be on shared storage — the same assumption the parquet sources make.

``index_folder`` is the ``SearchEngine.indexFolder`` equivalent: it
snapshots the folder to a pages-parquet (skipped when the folder
fingerprint is unchanged — the snapshot is the resume unit) and runs the
normal ``build_index``. ``index_file`` is ``indexFile``: one file applied
as a delta to an existing index.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data as rd

from search_engine_ray.state.manifest import atomic_write_json, input_fingerprint

PAGES_SCHEMA_TEXTDIR = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def list_text_files(root: str, include_hidden: bool = False) -> list[str]:
    """Walk the tree like the reference's folder scan; hidden files and
    hidden directories are pruned unless ``include_hidden``."""
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        if not include_hidden:
            dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        for f in filenames:
            if include_hidden or not f.startswith("."):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _to_pages(batch: pa.Table) -> pa.Table:
    paths = batch.column("path").to_pylist()
    blobs = batch.column("bytes").to_pylist()
    n = len(paths)
    texts = [b.decode("utf-8", errors="replace") for b in blobs]
    urls = ["file://" + os.path.abspath(p) for p in paths]
    ts = [os.stat(p).st_mtime_ns // 1000 for p in paths]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array([b""] * n, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([""] * n, pa.string()),
        },
        schema=PAGES_SCHEMA_TEXTDIR,
    )


def read_text_folder(path: str, include_hidden: bool = False):
    """Pages-schema Dataset over a folder of plain-text files."""
    files = list_text_files(path, include_hidden)
    if not files:
        raise FileNotFoundError(f"no text files under {path!r}")
    ds = rd.read_binary_files(files, include_paths=True)
    return ds.map_batches(_to_pages, batch_format="pyarrow")


def _snapshot_path(index_root: str) -> str:
    return os.path.join(index_root, "source_pages")


def snapshot_text_folder(folder: str, index_root: str,
                         include_hidden: bool = False) -> str:
    """Write (or reuse) the folder's pages-parquet snapshot under the
    index root. Skipped when the folder's (path, size, mtime_ns)
    fingerprint matches the recorded one — so repeated ``index_folder``
    calls resume instead of rewriting."""
    snap = _snapshot_path(index_root)
    marker = snap + ".fingerprint.json"
    fp = input_fingerprint(list_text_files(folder, include_hidden))
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == fp:
                    return snap
        except (json.JSONDecodeError, OSError):
            pass
    import shutil

    tmp = snap + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    read_text_folder(folder, include_hidden).write_parquet(tmp)
    if os.path.exists(snap):
        shutil.rmtree(snap)
    os.replace(tmp, snap)
    atomic_write_json(marker, fp)
    return snap


def index_folder(folder: str, index_root: str, config=None,
                 resume: bool = True, include_hidden: bool = False) -> dict:
    """``SearchEngine.indexFolder`` equivalent: snapshot + full build
    (resumable end to end)."""
    from search_engine_ray.build import build_index

    os.makedirs(index_root, exist_ok=True)
    snap = snapshot_text_folder(folder, index_root, include_hidden)
    return build_index(snap, index_root, config, resume=resume)


def index_file(path: str, index_root: str) -> dict:
    """``SearchEngine.indexFile`` equivalent: one text file added/updated
    as a delta against an existing index (uses the index's stored
    config, incremental.apply_delta)."""
    import pyarrow.parquet as pq

    from search_engine_ray.incremental import apply_delta

    batch = pa.table(
        {"path": pa.array([path], pa.string()),
         "bytes": pa.array([open(path, "rb").read()], pa.binary())}
    )
    pages = _to_pages(batch)
    delta_dir = os.path.join(index_root, "_onefile_delta")
    os.makedirs(delta_dir, exist_ok=True)
    frag = os.path.join(delta_dir, "delta.parquet")
    pq.write_table(pages, frag)
    try:
        return apply_delta(index_root, frag)
    finally:
        import shutil

        shutil.rmtree(delta_dir, ignore_errors=True)
