"""Corpus sources (reference S1-S3 analogues, SURVEY.md §2.1).

The reference walks a filesystem tree and streams files line by line
(ref: engine/src/main/java/org/search/engine/index/DocumentIndexManager.java:69-121,
AbstractDocumentReadTask.java:31-50). Here the corpus is Parquet pages;
"file enumeration + read parallelism" is Ray Data's parquet reader with
column pruning, and the single-file source (S3) is a pushed-down url
filter.
"""

from __future__ import annotations

import glob
import os

import pyarrow.compute as pc
import ray.data as rd

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def snapshot_inputs(input_path: str | list[str]) -> list[str]:
    """Enumerate the parquet fragments of a corpus snapshot (S1)."""
    paths = [input_path] if isinstance(input_path, str) else list(input_path)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(
                os.path.join(p, "**", "*.parquet"), recursive=True)))
        else:
            files.append(p)
    return files


def read_pages(input_path: str | list[str],
               columns: list[str] | None = None,
               langs: list[str] | None = None):
    """Pages Dataset with column pruning and optional lang row filter
    pushed into the parquet scan (M4/M5 analogue)."""
    files = snapshot_inputs(input_path)
    filt = pc.field("lang").isin(langs) if langs else None
    return rd.read_parquet(files, columns=columns or PAGES_COLUMNS,
                           filter=filt)


def read_url(input_path: str | list[str], url: str):
    """Single-document source (S3: indexFile) — pushed-down url equality."""
    files = snapshot_inputs(input_path)
    return rd.read_parquet(files, columns=PAGES_COLUMNS,
                           filter=(pc.field("url") == url))
