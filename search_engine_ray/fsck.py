"""Index artifact integrity check (fsck): structural invariants fast,
full-decode invariants behind ``--deep``.

At 100 TB an index is thousands of parquet artifacts written by many
workers across retries; a torn write or a stale partial must be
detectable WITHOUT trusting the writer. Every check below re-derives an
invariant from independent artifacts (the reference has no analogue —
its index is one in-heap tree; durability checks are this engine's
extension, same spirit as its atomic-commit manifests):

structural (footer/metadata reads only where possible)
  * root manifest committed + config parseable,
  * global_stats arithmetic: avgdl == total_tokens / n_docs (float64),
  * doc_ordinals: row count == n_docs, strictly increasing,
  * docmap row count == n_docs,
  * docs_clean: row count == n_docs, sum(doc_len) == total_tokens,
  * every bucket 0..B-1 present, manifest committed, term column
    strictly ascending, every term hash-routes to ITS bucket
    (term_bucket), df >= 1, bucket-manifest n_terms/n_postings match
    the parquet content.

deep (--deep: one full postings decode per bucket)
  * per term: decoded doc-ordinal count == df, ordinals strictly
    increasing and < n_docs,
  * cross-artifact: the per-ordinal sum of tf over ALL terms in ALL
    buckets equals docs_clean's doc_len column — tokenize, shuffle,
    encode and the docs_clean rewrite all agree doc by doc.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

from search_engine_ray.stages.tokenize import term_bucket


def verify_index(index_root: str, deep: bool = False) -> dict:
    """Returns {"ok": bool, "errors": [...], "checks": {name: count}}."""
    errors: list[str] = []
    checks: dict[str, int] = {}

    def err(msg: str) -> None:
        errors.append(msg)

    try:
        with open(os.path.join(index_root, "_manifest.json")) as f:
            man = json.load(f)
    except Exception as e:  # noqa: BLE001 - report, don't crash
        return {"ok": False, "errors": [f"root manifest unreadable: {e}"],
                "checks": {}}
    if man.get("status") != "committed":
        err(f"root manifest status={man.get('status')!r}")
    cfg = man.get("config") or {}
    nb = int(cfg.get("num_buckets", 0))
    if nb <= 0:
        err("config.num_buckets missing/invalid")
    checks["manifest"] = 1

    try:
        with open(os.path.join(index_root, "global_stats.json")) as f:
            stats = json.load(f)
        n_docs = int(stats["n_docs"])
        total_tokens = int(stats["total_tokens"])
        if n_docs and stats["avgdl"] != total_tokens / n_docs:
            err("global_stats: avgdl != total_tokens / n_docs")
        checks["global_stats"] = 1
    except Exception as e:  # noqa: BLE001
        err(f"global_stats unreadable: {e}")
        return {"ok": False, "errors": errors, "checks": checks}

    # ordinals
    ords = None
    try:
        ords = pq.read_table(
            os.path.join(index_root, "doc_ordinals.parquet")
        ).column("doc_id").to_numpy()
        if len(ords) != n_docs:
            err(f"doc_ordinals rows {len(ords)} != n_docs {n_docs}")
        if len(ords) > 1 and not (np.diff(ords) > 0).all():
            err("doc_ordinals not strictly increasing")
        checks["ordinals"] = len(ords)
    except Exception as e:  # noqa: BLE001
        err(f"doc_ordinals unreadable: {e}")

    # docmap + docs_clean (footer row counts; one doc_len column scan)
    for name, path in (("docmap", os.path.join(index_root, "docmap")),
                       ("docs_clean",
                        os.path.join(index_root, "docs_clean"))):
        try:
            import pyarrow.dataset as pds

            d = pds.dataset(path)
            rows = d.count_rows()
            if rows != n_docs:
                err(f"{name} rows {rows} != n_docs {n_docs}")
            checks[name] = rows
        except Exception as e:  # noqa: BLE001
            err(f"{name} unreadable: {e}")
    doclens = None
    try:
        t = pq.read_table(os.path.join(index_root, "docs_clean"),
                          columns=["doc_id", "doc_len"])
        dl = t.column("doc_len").to_numpy().astype(np.int64)
        if int(dl.sum()) != total_tokens:
            err(f"docs_clean sum(doc_len) {int(dl.sum())} != "
                f"total_tokens {total_tokens}")
        if ords is not None and len(ords) == len(dl):
            doclens = dl[np.argsort(t.column("doc_id").to_numpy(),
                                    kind="stable")]
    except Exception as e:  # noqa: BLE001
        err(f"docs_clean doc_len scan failed: {e}")

    # buckets
    tf_by_ord = (np.zeros(n_docs, dtype=np.int64)
                 if deep and doclens is not None else None)
    n_terms_total = 0
    for b in range(nb):
        bdir = os.path.join(index_root, "buckets", f"bucket={b}")
        mpath = os.path.join(index_root, "buckets",
                             f"bucket={b}.manifest.json")
        try:
            with open(mpath) as f:
                bman = json.load(f)
            if bman.get("status") != "committed":
                err(f"bucket {b} manifest status="
                    f"{bman.get('status')!r}")
        except Exception as e:  # noqa: BLE001
            err(f"bucket {b} manifest unreadable: {e}")
            bman = {}
        try:
            t = pq.read_table(os.path.join(bdir, "postings.parquet"))
        except Exception as e:  # noqa: BLE001
            err(f"bucket {b} postings unreadable: {e}")
            continue
        terms = t.column("term").to_pylist()
        df = t.column("df").to_numpy().astype(np.int64)
        n_terms_total += len(terms)
        if any(terms[i] >= terms[i + 1] for i in range(len(terms) - 1)):
            err(f"bucket {b}: terms not strictly ascending")
        bad = [x for x in terms if term_bucket(x, nb) != b]
        if bad:
            err(f"bucket {b}: {len(bad)} terms routed to the wrong "
                f"bucket (e.g. {bad[:3]})")
        if (df < 1).any():
            err(f"bucket {b}: df < 1")
        bm = (bman.get("metrics") or {})
        if "n_terms" in bm and int(bm["n_terms"]) != len(terms):
            err(f"bucket {b}: manifest n_terms {bm['n_terms']} != "
                f"{len(terms)}")
        if "n_postings" in bm and int(bm["n_postings"]) != int(df.sum()):
            err(f"bucket {b}: manifest n_postings {bm['n_postings']} "
                f"!= sum(df) {int(df.sum())}")
        if deep and t.num_rows:
            from search_engine_ray.codec import (
                decode_positions,
                varbyte_decode,
            )
            from search_engine_ray.incremental import _bin_col_bytes

            total = int(df.sum())
            t = t.combine_chunks()
            o = decode_positions(
                _bin_col_bytes(t.column("docs_vb")).tobytes(), df)
            tfs = varbyte_decode(
                _bin_col_bytes(t.column("tfs_vb")).tobytes(),
                total).astype(np.int64)
            if o.size != total:
                err(f"bucket {b}: decoded postings {o.size} != "
                    f"sum(df) {total}")
            if (o < 0).any() or (o >= n_docs).any():
                err(f"bucket {b}: doc ordinal out of range")
            # strictly increasing WITHIN each term's df-segment
            seg_end = np.cumsum(df)[:-1]
            d = np.diff(o)
            inner = np.ones(max(o.size - 1, 0), dtype=bool)
            inner[seg_end - 1] = False  # cross-term boundaries exempt
            if (d[inner] <= 0).any():
                err(f"bucket {b}: doc ordinals not strictly increasing "
                    "within a term")
            if (tfs < 1).any():
                err(f"bucket {b}: tf < 1")
            if tf_by_ord is not None:
                np.add.at(tf_by_ord, o, tfs)
    checks["buckets"] = nb
    checks["n_terms"] = n_terms_total

    if tf_by_ord is not None:
        if not np.array_equal(tf_by_ord, doclens):
            n_bad = int((tf_by_ord != doclens).sum())
            err(f"deep: per-doc tf sums != docs_clean doc_len for "
                f"{n_bad} docs")
        checks["deep_tf_vs_doclen"] = n_docs

    return {"ok": not errors, "errors": errors, "checks": checks}


def verify_sharded(root: str, deep: bool = False) -> dict:
    """fsck for a doc-sharded root: every shard passes ``verify_index``,
    the root stats equal the shard sums, and the term-stats sidecar's
    df(term) equals the cross-shard df sum per bucket (the invariant the
    query path's global-idf injection relies on)."""
    errors: list[str] = []
    checks: dict[str, int] = {}
    try:
        with open(os.path.join(root, "global_stats.json")) as f:
            stats = json.load(f)
        n_shards = int(stats["num_doc_shards"])
        n_docs = int(stats["n_docs"])
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "errors": [f"root stats unreadable: {e}"],
                "checks": {}}

    shard_docs = 0
    shard_tokens = 0
    nb = 0
    for s in range(n_shards):
        sroot = os.path.join(root, f"shard={s}")
        rep = verify_index(sroot, deep=deep)
        if not rep["ok"]:
            errors.extend(f"shard {s}: {e}" for e in rep["errors"])
        try:
            with open(os.path.join(sroot, "global_stats.json")) as f:
                ss = json.load(f)
            shard_docs += int(ss["n_docs"])
            shard_tokens += int(ss["total_tokens"])
            with open(os.path.join(sroot, "_manifest.json")) as f:
                nb = int(json.load(f)["config"]["num_buckets"])
        except Exception as e:  # noqa: BLE001
            errors.append(f"shard {s} stats unreadable: {e}")
    if shard_docs != n_docs:
        errors.append(f"root n_docs {n_docs} != shard sum {shard_docs}")
    if int(stats.get("total_tokens", shard_tokens)) != shard_tokens:
        errors.append(f"root total_tokens {stats.get('total_tokens')} "
                      f"!= shard sum {shard_tokens}")
    checks["shards"] = n_shards

    sidecar = os.path.join(root, "term_stats")
    if os.path.isdir(sidecar) and nb:
        import pandas as pd

        for b in range(nb):
            try:
                side = pq.read_table(
                    os.path.join(sidecar, f"bucket={b}", "df.parquet")
                ).to_pandas()
            except Exception as e:  # noqa: BLE001
                errors.append(f"sidecar bucket {b} unreadable: {e}")
                continue
            parts = []
            for s in range(n_shards):
                p = os.path.join(root, f"shard={s}", "buckets",
                                 f"bucket={b}", "postings.parquet")
                try:
                    parts.append(pq.read_table(
                        p, columns=["term", "df"]).to_pandas())
                except Exception:  # noqa: BLE001 - empty shard bucket ok
                    continue
            want = (pd.concat(parts).groupby("term", as_index=False)
                    ["df"].sum().sort_values("term")
                    if parts else pd.DataFrame({"term": [], "df": []}))
            got = side.sort_values("term").reset_index(drop=True)
            want = want.reset_index(drop=True)
            if not (len(got) == len(want)
                    and (got["term"].to_numpy() ==
                         want["term"].to_numpy()).all()
                    and (got["df"].to_numpy(dtype=np.int64) ==
                         want["df"].to_numpy(dtype=np.int64)).all()):
                errors.append(f"sidecar bucket {b}: df != cross-shard sum")
        checks["sidecar_buckets"] = nb

    return {"ok": not errors, "errors": errors, "checks": checks}


def verify_vecindex(root: str, deep: bool = False) -> dict:
    """fsck for a persisted IVF vector index (vecindex.py layout):

    structural
      * manifest.json parseable with config / n_vectors / dim / n_lists,
      * centroids.npy shape == (n_lists, dim), all values finite,
      * every ``lists/list_id=<c>`` partition id within [0, n_lists),
      * total stored rows == manifest n_vectors (footer counts only),
      * vec_id globally unique (deltas must not double-insert).

    deep (--deep: full vector read)
      * every embedding has dim values, all finite,
      * every vector's nearest centroid (argmax of normalized cosine,
        first-index tie-break — the _assign_lists kernel) IS its
        partition's list_id: assignment survived build + deltas.
    """
    errors: list[str] = []
    checks: dict[str, int] = {}
    try:
        with open(os.path.join(root, "manifest.json")) as f:
            man = json.load(f)
        n_vectors = int(man["n_vectors"])
        dim = int(man["dim"])
        n_lists = int(man["n_lists"])
        man["config"]  # noqa: B018 - presence check
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "errors": [f"manifest unreadable: {e}"],
                "checks": {}}

    try:
        C = np.load(os.path.join(root, "centroids.npy"))
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "errors": [f"centroids unreadable: {e}"],
                "checks": {}}
    if C.shape != (n_lists, dim):
        errors.append(f"centroids shape {C.shape} != ({n_lists}, {dim})")
    if not np.isfinite(C).all():
        errors.append("centroids contain non-finite values")

    lists_dir = os.path.join(root, "lists")
    total = 0
    all_ids: list[np.ndarray] = []
    n_parts = 0
    for d in sorted(os.listdir(lists_dir)) if os.path.isdir(lists_dir) \
            else []:
        if not d.startswith("list_id="):
            continue
        lid = int(d.split("=", 1)[1])
        n_parts += 1
        if not (0 <= lid < n_lists):
            errors.append(f"partition {d}: list_id out of range")
            continue
        for fname in sorted(os.listdir(os.path.join(lists_dir, d))):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(lists_dir, d, fname)
            try:
                md = pq.read_metadata(path)
            except Exception as e:  # noqa: BLE001
                errors.append(f"{d}/{fname}: unreadable footer ({e})")
                continue
            total += md.num_rows
            ids = pq.read_table(path, columns=["vec_id"]).column(
                "vec_id").to_numpy(zero_copy_only=False)
            all_ids.append(ids)
            if deep:
                emb = pq.read_table(path, columns=["embedding"]).column(
                    "embedding")
                m = np.array(emb.to_pylist(), dtype=np.float64) \
                    if len(emb) else np.zeros((0, dim))
                if m.size and m.shape[1] != dim:
                    errors.append(f"{d}/{fname}: embedding dim "
                                  f"{m.shape[1]} != {dim}")
                    continue
                if m.size and not np.isfinite(m).all():
                    errors.append(f"{d}/{fname}: non-finite embedding")
                if m.size:
                    norms = np.linalg.norm(m, axis=1, keepdims=True)
                    norms[norms == 0] = 1.0
                    assign = np.argmax((m / norms) @ C.T, axis=1)
                    bad = int((assign != lid).sum())
                    if bad:
                        errors.append(
                            f"{d}/{fname}: {bad} vectors not nearest to "
                            f"their list centroid")
    checks["list_partitions"] = n_parts
    checks["vectors"] = total
    if total != n_vectors:
        errors.append(f"manifest n_vectors {n_vectors} != stored {total}")
    if all_ids:
        ids = np.concatenate(all_ids)
        if len(np.unique(ids)) != len(ids):
            errors.append("duplicate vec_id across list files")

    return {"ok": not errors, "errors": errors, "checks": checks}
