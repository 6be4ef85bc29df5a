"""Incremental index maintenance: add / update / delete deltas + merge.

Reference semantics (SURVEY.md §2.6): an updated document's token-set diff
is applied as per-token ADD/REMOVE events against the shared tree
(ref: engine/src/main/java/org/search/engine/index/DocumentUpdateTask.java:40-83);
a removed document is purged everywhere
(ref: DocumentRemoveTask.java:40-58, tree removeByValue :270-280).

The batch equivalent replaces a doc's postings wholesale (a superset of the
token-set diff — same final state): given a delta snapshot of pages
(new + changed urls) and a tombstone url list,

1. run the normal clean stage on the delta pages (dedup within delta),
2. ``affected = delta doc_ids  ∪ tombstone doc_ids``,
3. rewrite ``docs_clean`` = old rows minus affected + delta rows
   (anti-join = broadcast the affected-id set, filter inside map_batches),
4. tokenize ONLY the delta docs (partitioned write, as in a full build),
5. recompute global stats from the merged docs_clean ``doc_len`` column,
6. per bucket: decode old postings, drop affected doc ids (vectorized
   ``np.isin``), append the bucket's delta token rows, re-sort, re-encode
   with the NEW avgdl. Buckets with no delta terms still get their
   block-max refreshed (avgdl changed), so the result is BYTE-IDENTICAL
   to a from-scratch build over the merged corpus
   (tests/test_incremental.py).

The delta build reuses the manifest machinery: the index's root manifest
gains a ``generations`` list recording each applied delta's lineage.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from search_engine_ray.build import (
    BuildConfig,
    _commit_dir,
    _count_rows,
    _expand_inputs,
)
from search_engine_ray.idhash import doc_ids_for_urls
from search_engine_ray.stages.clean import CleanBatch, dedup_group
from search_engine_ray.stages.tokenize import TokenizeBatch
from search_engine_ray.state.manifest import (
    atomic_write_json,
    config_hash,
    input_fingerprint,
    write_manifest,
)


_TOKEN_SHAPE = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("pos_vb", pa.large_binary()),
    ]
)


def _bin_col_bytes(col: pa.ChunkedArray) -> np.ndarray:
    """All cells of a single-chunk binary column concatenated, as a uint8
    view of the Arrow data buffer (no per-cell Python objects)."""
    ch = col.chunk(0)
    width = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
    bufs = ch.buffers()
    offs = np.frombuffer(bufs[1], dtype=width)[
        ch.offset:ch.offset + len(ch) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) \
        if bufs[2] is not None else np.empty(0, np.uint8)
    return data[int(offs[0]):int(offs[-1])]


def _explode_surviving(
    old: pa.Table,
    affected: np.ndarray,
    old_map: np.ndarray,
    new_map: np.ndarray,
    store_positions: bool,
) -> pa.Table:
    """Vectorized inverse of ``encode_token_table`` over one bucket's
    stored postings, minus the affected docs: returns a token-shaped table
    (term, doc_id NEW-ordinal, tf, pos_vb per-doc blob).

    One bulk varbyte decode per column — all terms' ``docs_vb`` streams
    concatenate into a single buffer that ``decode_positions`` re-absolutes
    per df-segment (each term's stream is independently delta-coded with
    an absolute head, the same property tokens v2 exploits), and
    ``tfs_vb`` decodes as one direct stream. Positions are NEVER decoded:
    per-doc blob boundaries fall out of the varbyte continuation bits
    (value ends = MSB bytes) + cumulative tfs, and surviving blobs are
    re-packed with one ragged fancy-gather. Membership against the sorted
    ``affected`` array is one searchsorted (the old per-term ``np.isin``
    re-sorted it once per term)."""
    from search_engine_ray.codec import decode_positions, varbyte_decode
    from search_engine_ray.state.ordinals import to_ordinals

    n_terms = old.num_rows
    if n_terms == 0:
        return _TOKEN_SHAPE.empty_table()
    old = old.combine_chunks()
    df = old.column("df").to_numpy()
    total = int(df.sum())
    old_ords = decode_positions(_bin_col_bytes(old.column("docs_vb"))
                                .tobytes(), df)
    tfs_flat = varbyte_decode(_bin_col_bytes(old.column("tfs_vb"))
                              .tobytes(), total).astype(np.int64)
    real = old_map[old_ords]
    if affected.size:
        p = np.minimum(np.searchsorted(affected, real), affected.size - 1)
        keep = affected[p] != real
    else:
        keep = np.ones(real.size, dtype=bool)
    kept = np.flatnonzero(keep)
    term_idx = np.repeat(np.arange(n_terms, dtype=np.int64), df)
    term_kept = old.column("term").take(pa.array(term_idx[kept]))
    di_kept = to_ordinals(real[kept], new_map)
    tf_kept = tfs_flat[kept]
    if store_positions and total:
        pos_b = _bin_col_bytes(old.column("pos_vb"))
        vends = np.flatnonzero(pos_b & 0x80)
        doc_ends = vends[np.cumsum(tfs_flat) - 1] + 1
        doc_starts = np.concatenate(([0], doc_ends[:-1]))
        bl = (doc_ends - doc_starts)[kept]
        st = doc_starts[kept]
        tot_b = int(bl.sum())
        if tot_b:
            # ragged gather: index = repeat(starts) + per-segment arange
            step = np.ones(tot_b, dtype=np.int64)
            step[0] = 0
            seg = np.cumsum(bl)[:-1]
            step[seg] -= bl[:-1]
            data = pos_b[np.repeat(st, bl) + np.cumsum(step)]
        else:
            data = np.empty(0, np.uint8)
        offsets = np.concatenate(([0], np.cumsum(bl))).astype(np.int64)
        pos_arr = pa.Array.from_buffers(
            pa.large_binary(), kept.size,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(data.tobytes())])
    else:
        pos_arr = pa.Array.from_buffers(
            pa.large_binary(), kept.size,
            [None, pa.py_buffer(np.zeros(kept.size + 1,
                                         np.int64).tobytes()),
             pa.py_buffer(b"")])
    return pa.table(
        {"term": term_kept, "doc_id": pa.array(di_kept, pa.int64()),
         "tf": pa.array(tf_kept, pa.int64()), "pos_vb": pos_arr},
        schema=_TOKEN_SHAPE)


def _merge_bucket(
    batch: pd.DataFrame,
    index_root: str,
    cfg_hash: str,
    avgdl: float,
    store_positions: bool,
    affected_ref,
    old_map_ref,
    new_map_ref,
    doclen_ref,
) -> pd.DataFrame:
    """Merge one bucket: old postings minus affected docs plus delta rows.

    Postings store ordinals (state/ordinals.py); the doc-id space changes
    with the delta, so surviving old entries are translated old-ordinal ->
    real doc_id -> new-ordinal (vectorized lookups against the two
    broadcast sorted-id arrays). The surviving rows are exploded
    vectorized (``_explode_surviving``), concatenated with the bucket's
    delta token rows, and re-encoded by the SAME kernel the full build
    uses (``encode_token_table``) — byte-identity with a from-scratch
    build holds by construction."""
    from search_engine_ray.stages.postings import (
        _write_bucket,
        encode_token_table,
    )

    affected = ray.get(affected_ref)  # sorted int64 ndarray (broadcast once)
    old_map = ray.get(old_map_ref)
    new_map = ray.get(new_map_ref)
    doclen_new = ray.get(doclen_ref)  # doc_len by NEW ordinal
    out = []
    for bucket, files in zip(batch["bucket"].astype(int).tolist(),
                             batch["files"].tolist()):
        t0 = time.monotonic()
        bdir = os.path.join(index_root, "buckets", f"bucket={bucket}")
        old = pq.read_table(os.path.join(bdir, "postings.parquet"),
                            columns=["term", "df", "docs_vb", "tfs_vb",
                                     "pos_vb"])
        parts = [_explode_surviving(old, affected, old_map, new_map,
                                    store_positions)]
        delta_files = list(files) if files is not None and len(files) else []
        if delta_files:
            import pyarrow.dataset as pds

            dt = pds.dataset(delta_files).to_table(
                columns=["term", "doc_id", "tf", "pos_vb"])
            parts.append(dt.cast(_TOKEN_SHAPE))
        tok = pa.concat_tables(parts)
        table, n_post = encode_token_table(tok, doclen_new, avgdl,
                                           store_positions)
        _write_bucket(index_root, bucket, table, cfg_hash, n_post, t0)
        out.append((bucket, table.num_rows, n_post))
    return pd.DataFrame(out, columns=["bucket", "n_terms", "n_postings"])


def apply_delta(
    index_root: str,
    delta_pages_path: str | list[str] | None,
    deleted_urls: list[str] | None = None,
    config: BuildConfig | None = None,
    deleted_ids: np.ndarray | None = None,
) -> dict:
    """Apply a delta snapshot (new/changed pages) + deletions to an index.

    Returns metrics. The resulting artifacts are byte-identical to a
    from-scratch ``build_index`` over the merged corpus.
    """
    with open(os.path.join(index_root, "_manifest.json")) as f:
        root_manifest = json.load(f)
    # The EFFECTIVE config is the one the index was built with (persisted in
    # the root manifest) — never the caller's: a mismatched
    # num_buckets/tokenizer would tokenize delta terms with the wrong bucket
    # modulus and merge only a subset of buckets while the ordinal map is
    # rewritten for all of them => silent corruption. A caller-supplied
    # config is only VALIDATED against the stored hash.
    from dataclasses import fields as _dc_fields

    stored_cfg = root_manifest.get("config") or {}
    known = {f.name for f in _dc_fields(BuildConfig)}
    cfg = BuildConfig(**{k: v for k, v in stored_cfg.items() if k in known})
    if config is not None:
        want = root_manifest.get("config_hash")
        got = config.to_config_hash()
        if want is not None and got != want:
            raise ValueError(
                "apply_delta: supplied BuildConfig (hash "
                f"{got}) does not match the index's stored config (hash "
                f"{want}); omit `config` to use the stored one"
            )
    t_start = time.monotonic()
    docs_clean = os.path.join(index_root, "docs_clean")
    metrics: dict = {}
    from search_engine_ray.state.ordinals import (
        doclens_by_ordinal,
        load_ordinals,
        write_ordinals,
    )

    old_sorted_ids = load_ordinals(index_root)

    # ---- 1. clean the delta pages ---------------------------------------
    delta_root = os.path.join(index_root, "_delta_tmp")
    shutil.rmtree(delta_root, ignore_errors=True)
    os.makedirs(delta_root, exist_ok=True)
    delta_clean = os.path.join(delta_root, "docs_clean")
    delta_ids = np.empty(0, dtype=np.int64)
    if delta_pages_path is not None:
        inputs = input_fingerprint(_expand_inputs(delta_pages_path))
        ds = rd.read_parquet(
            [f["path"] for f in inputs],
            columns=["url", "warc_ts", "html", "text", "lang"],
        )
        ds = ds.map_batches(CleanBatch(cfg.dedup_buckets, cfg.tokenizer),
                            batch_format="pyarrow", batch_size=cfg.batch_size)
        ds = ds.groupby("dedup_bucket").map_groups(dedup_group,
                                                   batch_format="pandas")
        ds.write_parquet(delta_clean)
        delta_ids = pq.read_table(delta_clean, columns=["doc_id"]) \
            .column("doc_id").to_numpy()
    else:
        inputs = []

    tomb_ids = (doc_ids_for_urls(deleted_urls)
                if deleted_urls else np.empty(0, dtype=np.int64))
    if deleted_ids is not None and len(deleted_ids):
        # id-level tombstones (sync_index computes the removed set as ids
        # from the diff exchange — no url round-trip at corpus scale)
        tomb_ids = np.union1d(tomb_ids,
                              np.asarray(deleted_ids, dtype=np.int64))
    affected = np.unique(np.concatenate((delta_ids, tomb_ids)))

    # ---- 2. rewrite docs_clean (old - affected + delta) ------------------
    aff_ref = ray.put(np.sort(affected))

    def drop_affected(t: pa.Table) -> pa.Table:
        aff = ray.get(aff_ref)
        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(~np.isin(ids, aff)))

    old_ds = rd.read_parquet(_expand_inputs(docs_clean))
    kept = old_ds.map_batches(drop_affected, batch_format="pyarrow")
    merged = kept.union(rd.read_parquet(_expand_inputs(delta_clean))) \
        if delta_pages_path is not None and os.path.exists(delta_clean) \
        else kept
    tmp = docs_clean + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write_parquet(tmp)
    _commit_dir(tmp, docs_clean)
    new_sorted_ids = write_ordinals(index_root, docs_clean)
    from search_engine_ray.state.docmap import write_docmap

    write_docmap(index_root, docs_clean)

    # ---- 3. stats over merged corpus ------------------------------------
    n_docs = _count_rows(docs_clean)
    total_tokens = rd.read_parquet(
        docs_clean, columns=["doc_len"]).sum("doc_len") or 0
    avgdl = (float(total_tokens) / n_docs) if n_docs else 0.0
    gen_id = len(root_manifest.get("generations", [])) + 1
    run_hash = config_hash({
        "base": root_manifest.get("config_hash"),
        "gen": gen_id, "inputs": inputs,
        "deleted": sorted(deleted_urls or []),
        "deleted_ids": sorted(int(i) for i in (deleted_ids
                                               if deleted_ids is not None
                                               else [])),
    })
    stats = {"n_docs": int(n_docs), "total_tokens": int(total_tokens),
             "avgdl": avgdl, "run_hash": run_hash}
    atomic_write_json(os.path.join(index_root, "global_stats.json"), stats)
    write_manifest(docs_clean, run_hash, inputs,
                   metrics={"n_docs": int(n_docs)})

    # ---- 4. tokenize the delta ------------------------------------------
    delta_tokens = os.path.join(delta_root, "tokens")
    if delta_pages_path is not None:
        ds = rd.read_parquet(_expand_inputs(delta_clean),
                             columns=["doc_id", "text"])
        new_map_ref_tok = ray.put(new_sorted_ids)
        ds = ds.map_batches(
            TokenizeBatch(tokenizer=cfg.tokenizer,
                          num_buckets=cfg.num_buckets, salt=cfg.salt,
                          store_positions=cfg.store_positions),
            batch_format="pyarrow", batch_size=cfg.batch_size,
            fn_kwargs={"ordinals_ref": new_map_ref_tok},
        )
        ds.write_parquet(delta_tokens, partition_cols=["bucket_part"])

    # ---- 5. merge every bucket ------------------------------------------
    items = []
    for b in range(cfg.num_buckets):
        d = os.path.join(delta_tokens, f"bucket_part={b}")
        files = _expand_inputs(d) if os.path.isdir(d) else []
        items.append({"bucket": b, "files": files})
    result = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        _merge_bucket, batch_format="pandas", batch_size=1,
        fn_kwargs=dict(index_root=index_root, cfg_hash=run_hash,
                       avgdl=avgdl, store_positions=cfg.store_positions,
                       affected_ref=aff_ref,
                       old_map_ref=ray.put(old_sorted_ids),
                       new_map_ref=ray.put(new_sorted_ids),
                       doclen_ref=ray.put(doclens_by_ordinal(docs_clean))),
    )
    built = result.to_pandas()
    shutil.rmtree(delta_root, ignore_errors=True)

    # ---- 6. root manifest generation record ------------------------------
    gens = root_manifest.get("generations", [])
    gens.append({"gen": gen_id, "run_hash": run_hash,
                 "delta_inputs": inputs,
                 "n_deleted": int(len(tomb_ids)),
                 "n_delta_docs": int(len(delta_ids))})
    root_manifest["generations"] = gens
    root_manifest["metrics"]["last_delta_seconds"] = round(
        time.monotonic() - t_start, 3)
    atomic_write_json(os.path.join(index_root, "_manifest.json"),
                      root_manifest)
    # M8 sidecar maintenance: ids this merge physically removed, never
    # had, or just re-upserted (a later add supersedes a pending delete)
    # leave the pending-deletes set — the sidecar tracks only the
    # UNMERGED backlog, so it stays O(deletes since last delta)
    from search_engine_ray.pending import prune_pending

    prune_pending(index_root, new_sorted_ids, processed_ids=affected)
    metrics.update({"n_docs": int(n_docs), "avgdl": avgdl,
                    "buckets_merged": int(len(built)),
                    "seconds": round(time.monotonic() - t_start, 3)})
    return metrics


def remove_urls(index_root: str, urls: list[str],
                config: BuildConfig | None = None) -> dict:
    """Delete documents by url (reference DocumentRemoveTask semantics)."""
    return apply_delta(index_root, None, deleted_urls=urls, config=config)


def _merge_two_buckets(
    batch: pd.DataFrame,
    root_a: str,
    root_b: str,
    out_root: str,
    cfg_hash: str,
    avgdl: float,
    store_positions: bool,
    aff_a_ref,
    aff_b_ref,
    map_a_ref,
    map_b_ref,
    new_map_ref,
    doclen_ref,
) -> pd.DataFrame:
    """Merge one term bucket from two source indexes into the output
    index: explode each side's stored postings (minus its losing side of
    any url collision) into token rows, concatenate, re-encode with the
    union corpus's avgdl. Bucket b of A merges with bucket b of B and
    nothing else — term_bucket is config-stable, so a segment merge is
    bucket-aligned and needs NO shuffle."""
    from search_engine_ray.stages.postings import (
        _write_bucket,
        encode_token_table,
    )

    aff_a = ray.get(aff_a_ref)
    aff_b = ray.get(aff_b_ref)
    map_a = ray.get(map_a_ref)
    map_b = ray.get(map_b_ref)
    new_map = ray.get(new_map_ref)
    doclen_new = ray.get(doclen_ref)
    out = []
    cols = ["term", "df", "docs_vb", "tfs_vb", "pos_vb"]
    for bucket in batch["bucket"].astype(int).tolist():
        t0 = time.monotonic()
        parts = []
        for root, aff, omap in ((root_a, aff_a, map_a),
                                (root_b, aff_b, map_b)):
            p = os.path.join(root, "buckets", f"bucket={bucket}",
                             "postings.parquet")
            parts.append(_explode_surviving(
                pq.read_table(p, columns=cols), aff, omap, new_map,
                store_positions))
        tok = pa.concat_tables(parts)
        table, n_post = encode_token_table(tok, doclen_new, avgdl,
                                           store_positions)
        _write_bucket(out_root, bucket, table, cfg_hash, n_post, t0)
        out.append((bucket, table.num_rows, n_post))
    return pd.DataFrame(out, columns=["bucket", "n_terms", "n_postings"])


def merge_indexes(root_a: str, root_b: str, out_root: str) -> dict:
    """Segment merge (the Lucene/LSM compaction analogue): combine two
    committed index snapshots into a new index at ``out_root`` WITHOUT
    re-tokenizing — each side's postings are decoded to token rows once,
    bucket-aligned (no shuffle: term_bucket depends only on the shared
    config), and re-encoded by the build's own kernel, so the result is
    byte-identical to a from-scratch build over A's pages followed by
    B's pages (tests/test_merge_indexes.py).

    Url collisions (the same url indexed in both snapshots) resolve by
    the clean stage's dedup rule — keep max ``(warc_ts, text)``, ties to
    B ("later snapshot wins", matching ``dedup_group``'s keep-last over
    an A-then-B input order). Distinct urls hashing to the same doc_id
    raise, exactly as the build does. Both indexes must share a
    config_hash (same tokenizer / buckets / positions): merging across
    configs would route terms to the wrong buckets.

    At 100 TB this is the maintenance path between incremental deltas
    and full rebuilds: N crawl snapshots index independently (each an
    embarrassingly parallel build over its own shard of pages) and
    pairwise merges compact them, moving every postings byte exactly
    once per merge level with zero re-tokenization and zero exchange.
    """
    t_start = time.monotonic()
    with open(os.path.join(root_a, "_manifest.json")) as f:
        man_a = json.load(f)
    with open(os.path.join(root_b, "_manifest.json")) as f:
        man_b = json.load(f)
    if man_a.get("config_hash") != man_b.get("config_hash"):
        raise ValueError(
            "merge_indexes: config_hash mismatch "
            f"({man_a.get('config_hash')} vs {man_b.get('config_hash')}); "
            "indexes must be built with identical BuildConfig")
    from dataclasses import fields as _dc_fields

    stored_cfg = man_a.get("config") or {}
    known = {f.name for f in _dc_fields(BuildConfig)}
    cfg = BuildConfig(**{k: v for k, v in stored_cfg.items() if k in known})

    from search_engine_ray.state.ordinals import (
        doclens_by_ordinal,
        load_ordinals,
        write_ordinals,
    )

    ids_a = load_ordinals(root_a)
    ids_b = load_ordinals(root_b)
    collide = np.intersect1d(ids_a, ids_b, assume_unique=True)

    # ---- url-collision resolution (usually empty/tiny) -------------------
    aff_a = np.empty(0, dtype=np.int64)  # ids whose A-side copy LOSES
    aff_b = np.empty(0, dtype=np.int64)
    if collide.size:
        import pyarrow.dataset as pds

        def rows_for(root):
            d = pds.dataset(_expand_inputs(
                os.path.join(root, "docs_clean")))
            import pyarrow.compute as pc

            t = d.to_table(columns=["doc_id", "url", "warc_ts", "text"],
                           filter=pc.field("doc_id").isin(collide))
            df = t.to_pandas().set_index("doc_id").sort_index()
            return df

        da, db = rows_for(root_a), rows_for(root_b)
        if not (da["url"] == db["url"]).all():
            bad = da.index[da["url"] != db["url"]][:4]
            raise ValueError(
                f"doc_id hash collision between distinct urls: {list(bad)}")
        # dedup_group keep-last over sort(warc_ts, text), A rows before B:
        # A wins only when strictly greater
        a_wins = (da["warc_ts"].values > db["warc_ts"].values) | (
            (da["warc_ts"].values == db["warc_ts"].values)
            & (da["text"].values > db["text"].values))
        aff_b = np.sort(da.index.values[a_wins])
        aff_a = np.sort(da.index.values[~a_wins])

    # ---- merged docs_clean ------------------------------------------------
    os.makedirs(out_root, exist_ok=True)
    docs_clean = os.path.join(out_root, "docs_clean")
    aff_a_ref = ray.put(aff_a)
    aff_b_ref = ray.put(aff_b)

    def drop(aff_ref):
        def fn(t: pa.Table) -> pa.Table:
            aff = ray.get(aff_ref)
            if not aff.size:
                return t
            ids = t.column("doc_id").to_numpy()
            return t.filter(pa.array(~np.isin(ids, aff)))
        return fn

    ds_a = rd.read_parquet(_expand_inputs(
        os.path.join(root_a, "docs_clean"))).map_batches(
        drop(aff_a_ref), batch_format="pyarrow")
    ds_b = rd.read_parquet(_expand_inputs(
        os.path.join(root_b, "docs_clean"))).map_batches(
        drop(aff_b_ref), batch_format="pyarrow")
    tmp = docs_clean + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds_a.union(ds_b).write_parquet(tmp)
    _commit_dir(tmp, docs_clean)
    new_map = write_ordinals(out_root, docs_clean)
    from search_engine_ray.state.docmap import write_docmap

    write_docmap(out_root, docs_clean)

    # ---- global stats -----------------------------------------------------
    n_docs = _count_rows(docs_clean)
    total_tokens = rd.read_parquet(
        docs_clean, columns=["doc_len"]).sum("doc_len") or 0
    avgdl = (float(total_tokens) / n_docs) if n_docs else 0.0
    run_hash = config_hash({
        "merge": [man_a.get("config_hash"),
                  man_a.get("metrics", {}).get("n_docs"),
                  man_b.get("metrics", {}).get("n_docs")],
    })
    stats = {"n_docs": int(n_docs), "total_tokens": int(total_tokens),
             "avgdl": avgdl, "run_hash": run_hash}
    atomic_write_json(os.path.join(out_root, "global_stats.json"), stats)
    write_manifest(docs_clean, run_hash, [],
                   metrics={"n_docs": int(n_docs)})

    # ---- bucket-aligned postings merge ------------------------------------
    items = [{"bucket": b} for b in range(cfg.num_buckets)]
    built = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        _merge_two_buckets, batch_format="pandas", batch_size=1,
        fn_kwargs=dict(root_a=root_a, root_b=root_b, out_root=out_root,
                       cfg_hash=run_hash, avgdl=avgdl,
                       store_positions=cfg.store_positions,
                       aff_a_ref=aff_a_ref, aff_b_ref=aff_b_ref,
                       map_a_ref=ray.put(ids_a), map_b_ref=ray.put(ids_b),
                       new_map_ref=ray.put(new_map),
                       doclen_ref=ray.put(doclens_by_ordinal(docs_clean))),
    ).to_pandas()

    metrics = {
        "n_docs": int(n_docs), "avgdl": avgdl,
        "n_collisions": int(collide.size),
        "n_terms": int(built["n_terms"].sum()),
        "n_postings": int(built["n_postings"].sum()),
        "seconds": round(time.monotonic() - t_start, 3),
    }
    atomic_write_json(
        os.path.join(out_root, "_manifest.json"),
        {"status": "committed", "config_hash": man_a.get("config_hash"),
         "config": stored_cfg, "input": [],
         "merged_from": [os.path.abspath(root_a), os.path.abspath(root_b)],
         "metrics": metrics},
    )
    return metrics


def sync_index(index_root: str, pages_path: str | list[str]) -> dict:
    """Reconcile a committed index with a NEW full page snapshot
    (reference U5 "startup diff" at corpus scale): clean the snapshot
    (same stage as a build), diff it against the index's docs_clean on
    ``(md5(text), warc_ts)`` per doc_id — a metadata-only tagged-union
    exchange (~40 B/doc, never text; the functions/dedup.corpus_diff
    shape), then apply exactly the changed slice via ``apply_delta``:
    added/changed docs as delta pages, vanished docs as id tombstones.
    Result: byte-identical to ``build_index(snapshot)`` (pinned); an
    unchanged snapshot touches NOTHING (no apply_delta call, artifacts
    bit-stable).

    At 100 TB this is the recrawl loop: each crawl snapshot syncs in
    O(changed docs) tokenize + the fixed per-bucket re-encode, instead
    of an O(corpus) rebuild."""
    from search_engine_ray.stages.agg import bucketed_group_agg

    t_start = time.monotonic()
    docs_clean = os.path.join(index_root, "docs_clean")
    sync_root = os.path.join(index_root, "_sync_tmp")
    shutil.rmtree(sync_root, ignore_errors=True)
    os.makedirs(sync_root)
    try:
        with open(os.path.join(index_root, "_manifest.json")) as f:
            root_manifest = json.load(f)
        from dataclasses import fields as _dc_fields

        stored_cfg = root_manifest.get("config") or {}
        known = {f.name for f in _dc_fields(BuildConfig)}
        cfg = BuildConfig(**{k: v for k, v in stored_cfg.items()
                             if k in known})

        # ---- 1. canonicalize the snapshot (the build's own clean stage:
        # extract + per-url winner) -----------------------------------
        clean_new = os.path.join(sync_root, "clean")
        inputs = input_fingerprint(_expand_inputs(pages_path))
        ds = rd.read_parquet(
            [f["path"] for f in inputs],
            columns=["url", "warc_ts", "html", "text", "lang"],
        )
        ds = ds.map_batches(CleanBatch(cfg.dedup_buckets, cfg.tokenizer),
                            batch_format="pyarrow",
                            batch_size=cfg.batch_size)
        ds = ds.groupby("dedup_bucket").map_groups(dedup_group,
                                                   batch_format="pandas")
        ds.write_parquet(clean_new)

        # ---- 2. metadata diff: (doc_id, md5, warc_ts) per side --------
        def project(side: int):
            def fn(batch: pa.Table) -> pa.Table:
                texts = batch.column("text").to_pylist()
                ts = batch.column("warc_ts").cast(pa.int64())
                import hashlib as _h

                return pa.table({
                    "doc_id": batch.column("doc_id"),
                    "md5": pa.array(
                        [_h.md5((t or "").encode()).hexdigest()
                         for t in texts], pa.string()),
                    "ts": ts,
                    "side": pa.array(
                        np.full(len(texts), side, dtype=np.int8)),
                })

            return fn

        cols = ["doc_id", "warc_ts", "text"]
        both = rd.read_parquet(_expand_inputs(docs_clean), columns=cols) \
            .map_batches(project(0), batch_format="pyarrow") \
            .union(rd.read_parquet(_expand_inputs(clean_new), columns=cols)
                   .map_batches(project(1), batch_format="pyarrow"))

        def compare(g: pd.DataFrame) -> pd.DataFrame:
            key = g["md5"] + "@" + g["ts"].astype(str)
            piv = pd.DataFrame({"doc_id": g["doc_id"], "side": g["side"],
                                "key": key}).pivot_table(
                index="doc_id", columns="side", values="key",
                aggfunc="first")
            old = piv[0] if 0 in piv.columns else pd.Series(
                index=piv.index, dtype=object)
            new = piv[1] if 1 in piv.columns else pd.Series(
                index=piv.index, dtype=object)
            status = np.where(
                old.isna(), "added",
                np.where(new.isna(), "removed",
                         np.where(old != new, "changed", "")))
            out = pd.DataFrame({"doc_id": piv.index.to_numpy(np.int64),
                                "status": status})
            return out[out["status"] != ""]

        diff = bucketed_group_agg(both, ["doc_id"], compare, 64) \
            .to_pandas()
        if diff.empty or "status" not in diff.columns:
            # an all-empty map_groups output loses its schema entirely
            diff = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "status": pd.Series(dtype=object)})
        added = diff.loc[diff.status == "added", "doc_id"].to_numpy()
        changed = diff.loc[diff.status == "changed", "doc_id"].to_numpy()
        removed = diff.loc[diff.status == "removed", "doc_id"].to_numpy()
        metrics = {"n_added": int(added.size),
                   "n_changed": int(changed.size),
                   "n_removed": int(removed.size)}
        if not (added.size or changed.size or removed.size):
            metrics["seconds"] = round(time.monotonic() - t_start, 3)
            metrics["applied"] = False
            return metrics  # bit-stable no-op: never touch the index

        if removed.size:
            # M8: vanished docs stop matching at the NEXT query, the
            # moment the diff knows them — the (slower) physical merge
            # below prunes the sidecar again when it commits. Searchers
            # serving this root during the sync never return dead docs.
            from search_engine_ray.pending import mark_deleted

            mark_deleted(index_root, doc_ids=removed)

        # ---- 3. delta pages = clean_new rows of added ∪ changed -------
        delta_dir = os.path.join(sync_root, "delta_pages")
        upd = np.sort(np.concatenate((added, changed)))
        upd_ref = ray.put(upd)

        def to_pages(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            u = ray.get(upd_ref)
            pos = np.minimum(np.searchsorted(u, ids), u.size - 1) \
                if u.size else np.zeros(len(ids), dtype=np.int64)
            keep = (u[pos] == ids) if u.size else np.zeros(len(ids),
                                                           dtype=bool)
            t = t.filter(pa.array(keep))
            n = t.num_rows
            return pa.table({
                "url": t.column("url"),
                "warc_ts": t.column("warc_ts"),
                "html": pa.array([b""] * n, pa.binary()),
                "text": t.column("text"),
                "lang": t.column("lang"),
            })

        rd.read_parquet(_expand_inputs(clean_new),
                        columns=["doc_id", "url", "warc_ts", "text",
                                 "lang"]) \
            .map_batches(to_pages, batch_format="pyarrow") \
            .write_parquet(delta_dir)

        m = apply_delta(index_root, delta_dir if upd.size else None,
                        deleted_ids=removed)
        metrics.update({k: v for k, v in m.items()
                        if k in ("n_docs", "avgdl", "buckets_merged")})
        metrics["applied"] = True
        metrics["seconds"] = round(time.monotonic() - t_start, 3)
        return metrics
    finally:
        shutil.rmtree(sync_root, ignore_errors=True)
