"""Per-partition checkpoint manifests with lineage + metrics.

The reference persists a full-index FST snapshot after each indexation and
catches up at startup by diffing persisted registry mtimes vs disk
(ref: engine/src/main/java/org/search/engine/SearchEngineInitializer.java:68-78,133-211).
That is single-machine, whole-index granularity. Our equivalent is
per-partition: every pipeline stage writes its output under a directory with
a ``manifest.json`` recording

* ``config_hash`` — sha256 of the full pipeline config (tokenizer name,
  extractor version, codec version, bucket/salt counts ...); any config
  change invalidates the artifact, like the reference's ``invalidateCache``
  (ref: SearchEngineInitializer.java:108-114),
* ``input`` — fingerprint of the exact input fragments (path, size) the
  partition was built from (lineage),
* ``metrics`` — rows/bytes/seconds for the build of this partition,
* ``status: committed`` — written LAST via atomic write-temp+rename, so a
  partial write is never mistaken for a finished partition.

Resume rule: a partition whose committed manifest matches the current
``config_hash`` + input fingerprint is skipped (build.py) — an index build
therefore resumes mid-shuffle: completed term buckets are not rebuilt and,
when the token checkpoint is committed, documents are not re-tokenized.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any

# Manifests are SIBLING files ("<dir>.manifest.json"), never inside the data
# directory — readers like read_parquet(dir) must only ever see data files.
MANIFEST_SUFFIX = ".manifest.json"


def manifest_path(dir_path: str) -> str:
    return dir_path.rstrip("/") + MANIFEST_SUFFIX


def config_hash(config: dict) -> str:
    blob = json.dumps(config, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def input_fingerprint(paths: list[str]) -> list[dict]:
    """Lineage record for a list of input files: (path, size, mtime_ns).

    mtime_ns catches in-place rewrites that keep the byte size unchanged —
    without it a resume (or watch.diff_snapshot) would silently treat stale
    data as fresh."""
    out = []
    for p in sorted(paths):
        st = os.stat(p)
        out.append({"path": p, "size": st.st_size,
                    "mtime_ns": st.st_mtime_ns})
    return out


def atomic_write_json(path: str, obj: Any) -> None:
    """write-temp + rename: readers never observe a partial manifest."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def write_manifest(
    dir_path: str,
    cfg_hash: str,
    inputs: list[dict] | None = None,
    metrics: dict | None = None,
    extra: dict | None = None,
) -> dict:
    m = {
        "status": "committed",
        "config_hash": cfg_hash,
        "input": inputs or [],
        "metrics": metrics or {},
    }
    if extra:
        m.update(extra)
    atomic_write_json(manifest_path(dir_path), m)
    return m


def invalidate(dir_path: str) -> None:
    p = manifest_path(dir_path)
    if os.path.exists(p):
        os.unlink(p)


def read_manifest(dir_path: str) -> dict | None:
    p = manifest_path(dir_path)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    return m if m.get("status") == "committed" else None


def is_fresh(
    dir_path: str, cfg_hash: str, inputs: list[dict] | None = None
) -> bool:
    """True iff a committed manifest matches config hash (and inputs if given)."""
    m = read_manifest(dir_path)
    if m is None or m.get("config_hash") != cfg_hash:
        return False
    if inputs is not None and m.get("input") != inputs:
        return False
    return True
