"""Corpus-watch loop: the batch analogue of filesystem notification (U4).

The reference polls a Java WatchService every 2 s and replays
CREATE/MODIFY/DELETE events into the indexer
(ref: engine/src/main/java/org/search/engine/filesystem/
FilesystemNotificationScheduler.java:32-73, DocumentIndexManager.java:136-178).
For a Parquet corpus the equivalent signal is "the fragment set changed":
``diff_snapshot`` compares the current fragment list + (size) fingerprint
against the one recorded in the index manifest, and ``sync_index`` applies
the difference — new/changed fragments run through the delta pipeline
(incremental.apply_delta), matching the reference's startup catch-up
(SearchEngineInitializer.calculateIndexChanges:133-211) without any
long-running watcher process. Call it from cron / a driver loop at
whatever cadence the corpus updates.
"""

from __future__ import annotations

import json
import os

from search_engine_ray.build import BuildConfig
from search_engine_ray.sources.pages import snapshot_inputs
from search_engine_ray.state.manifest import input_fingerprint


def diff_snapshot(index_root: str, input_path: str | list[str]) -> dict:
    """Compare the corpus fragment set against the index's lineage.

    Returns {"new": [...], "changed": [...], "removed": [...]} of fragment
    paths (the reference's IndexChanges, model/IndexChanges.java:6-21).
    """
    current = {f["path"]: f for f in
               input_fingerprint(snapshot_inputs(input_path))}
    manifest_path = os.path.join(index_root, "_manifest.json")
    known: dict[str, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        for frag in m.get("input", []):
            known[frag["path"]] = frag
        for gen in m.get("generations", []):
            for frag in gen.get("delta_inputs", []):
                known[frag["path"]] = frag
    new = [p for p in current if p not in known]
    changed = [p for p in current
               if p in known and known[p] != current[p]]
    removed = [p for p in known if p not in current]
    return {"new": sorted(new), "changed": sorted(changed),
            "removed": sorted(removed)}


def sync_index(index_root: str, input_path: str | list[str],
               config: BuildConfig | None = None) -> dict:
    """Bring the index up to date with the corpus directory.

    New/changed fragments are applied as a delta build. Removed fragments
    require the caller to supply deletions by url (a parquet fragment does
    not record which urls vanished), so they are only reported.
    """
    from search_engine_ray.incremental import apply_delta

    diff = diff_snapshot(index_root, input_path)
    pending = diff["new"] + diff["changed"]
    result = {"diff": diff, "applied": False}
    if pending:
        metrics = apply_delta(index_root, pending, config=config)
        result.update({"applied": True, "metrics": metrics})
    return result
