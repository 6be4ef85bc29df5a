"""Index-build pipeline — the engine's equivalent of ``indexFolder``.

Reference flow (ref: engine/src/main/java/org/search/engine/index/
DocumentIndexManager.java:69-121 and SURVEY.md §3.1): walk files -> per-file
reader threads -> bounded event queue -> ONE writer thread mutating a shared
radix tree -> FST snapshot. Our flow is a streaming Ray Data pipeline; the
single writer disappears because term buckets are independent writers:

    read_parquet(pages, pruned columns)
      -> map_batches(CleanBatch)                 # extract text, doc ids
      -> groupby(dedup_bucket).map_groups(dedup) # exact dedup by url
      -> write docs_clean/ (+ manifest)          # checkpoint 1
    read docs_clean
      -> map_batches(TokenizeBatch)              # explode to (term,doc,tf,..)
      -> write tokens/bucket=*/ (+ manifest)     # checkpoint 2 (= shuffle
                                                 #  map side, resume unit)
    stats: N docs, total tokens -> avgdl         # global_stats.json
    read tokens (only buckets not yet committed)
      -> groupby(bucket)[.map_groups(encode_run) -> groupby(bucket)]
      -> map_groups(build/merge -> write bucket) # checkpoint 3 (per bucket)
    docmap/ projection (+ manifest)

Every stage commits atomically with lineage + metrics manifests
(state/manifest.py); a re-run skips committed work (resume test:
tests/test_resume.py). All intermediate data stays in Parquet on shared
storage — no driver-side materialization of corpus-sized data.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass

import ray.data as rd

from search_engine_ray.codec import BLOCK_SIZE, BM25_B, BM25_K1
from search_engine_ray.extract import EXTRACTOR_VERSION
from search_engine_ray.stages.clean import (
    CleanBatch,
    dedup_filter,
    compute_dup_winners,
    dedup_group,
    filter_lang,
)
from search_engine_ray.stages.postings import (
    build_bucket_from_files,
    encode_run,
    merge_runs,
)
from search_engine_ray.stages.tokenize import TokenizeBatch
from search_engine_ray.state.ordinals import (
    ORDINALS_FILE,
    load_ordinals,
    write_ordinals,
)
from search_engine_ray.state.manifest import (
    atomic_write_json,
    config_hash,
    input_fingerprint,
    invalidate,
    is_fresh,
    read_manifest,
    write_manifest,
)

CODEC_VERSION = "delta+varbyte/v3"  # v3: dense doc ordinals in postings


@dataclass
class BuildConfig:
    tokenizer: str = "standard"
    num_buckets: int = 16
    salt: int = 1                      # >1 => two-phase salted build
    store_positions: bool = True
    dedup_buckets: int = 64
    lang_filter: list[str] | None = None
    batch_size: int = 1024             # rows per tokenize batch (wide text)
    # exact-dedup strategy: "auto"/"broadcast" = light (url, warc_ts) pass +
    # broadcast loser filter (no text shuffle); "shuffle" = full groupby on
    # the doc bucket (scale-proof for any dup volume). auto falls back to
    # shuffle on ties or oversized winner maps. NOT part of the config hash
    # (same output either way).
    dedup_mode: str = "auto"
    # tokenize map-task count (== files per token bucket). None (default):
    # 4x cluster CPUs — enough parallelism, no small-file explosion.
    token_write_blocks: int | None = None
    k1: float = BM25_K1
    b: float = BM25_B

    def to_config_hash(self) -> str:
        cfg = asdict(self)
        cfg.pop("dedup_mode", None)
        cfg.pop("token_write_blocks", None)  # layout knob, not semantics
        cfg["extractor"] = EXTRACTOR_VERSION
        cfg["codec"] = CODEC_VERSION
        cfg["block_size"] = BLOCK_SIZE
        # v2: tokens carry pre-encoded per-doc position blobs and no
        # doc_len column — a v1 tokens artifact cannot be resumed from
        cfg["tokens_format"] = 2
        return config_hash(cfg)


def _expand_inputs(input_path: str | list[str]) -> list[str]:
    paths = [input_path] if isinstance(input_path, str) else list(input_path)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                          recursive=True)))
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no parquet inputs under {input_path!r}")
    return files


def _commit_dir(tmp_dir: str, final_dir: str) -> None:
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)


def _count_rows(parquet_dir: str) -> int:
    """Row count from parquet footers — no data scan."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in _expand_inputs(parquet_dir))


def invalidate_index(index_root: str) -> None:
    """Delete all index artifacts (ref: SearchEngineInitializer.java:108-114,
    DocumentIndexManager.invalidateCache :221-226)."""
    if os.path.exists(index_root):
        shutil.rmtree(index_root)


def build_index(
    input_path: str | list[str],
    index_root: str,
    config: BuildConfig | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume building) the index. Returns build metrics."""
    cfg = config or BuildConfig()
    cfg_hash = cfg.to_config_hash()
    inputs = input_fingerprint(_expand_inputs(input_path))
    # run_hash chains config AND input lineage: any change to either
    # invalidates every downstream stage manifest, not just the first one.
    run_hash = config_hash({"cfg": cfg_hash, "inputs": inputs})
    os.makedirs(index_root, exist_ok=True)
    metrics: dict = {"config_hash": cfg_hash, "run_hash": run_hash,
                     "stages": {}}
    t_start = time.monotonic()

    docs_clean = os.path.join(index_root, "docs_clean")
    tokens_dir = os.path.join(index_root, "tokens")
    stats_path = os.path.join(index_root, "global_stats.json")
    # driver-side sections that only need the committed docs_clean (docmap
    # projection, global stats) run on this pool CONCURRENTLY with the Ray
    # stages instead of serializing between them (they are pure
    # pyarrow/file work — no Ray calls — so thread-safety is trivial)
    from concurrent.futures import ThreadPoolExecutor

    from search_engine_ray._compat import patch_http_fs_probe

    # the background sections may run Ray Data reads concurrently with
    # the main-thread stages — make the http-fs import probe thread-safe
    patch_http_fs_probe()
    bg = ThreadPoolExecutor(max_workers=2)
    docmap_fut = stats_fut = None

    # ---- stage 1: clean + exact dedup -----------------------------------
    if not (resume and is_fresh(docs_clean, run_hash, inputs)):
        t0 = time.monotonic()
        invalidate(docs_clean)
        ds = rd.read_parquet(
            [f["path"] for f in inputs],
            columns=["url", "warc_ts", "html", "text", "lang"],
        )
        if cfg.lang_filter:
            ds = ds.map_batches(
                filter_lang, batch_format="pyarrow",
                fn_kwargs={"langs": cfg.lang_filter},
            )
        ds = ds.map_batches(
            CleanBatch(cfg.dedup_buckets, cfg.tokenizer),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
        mode = cfg.dedup_mode
        winners = None
        if mode in ("auto", "broadcast"):
            # light pass over (url, warc_ts) only; falls back to the full
            # shuffle when ties make broadcast filtering non-deterministic
            # or the winner map is too large to broadcast
            winners, has_ties = compute_dup_winners(
                [f["path"] for f in inputs])
            if has_ties or (mode == "auto" and len(winners) > 5_000_000):
                winners = None
        if winners is not None:
            import numpy as np
            import ray as _ray

            # broadcast as two parallel sorted arrays (vectorized filter)
            win_ids = np.fromiter(sorted(winners), dtype=np.int64,
                                  count=len(winners))
            win_ts = np.array([winners[i] for i in win_ids],
                              dtype=np.int64)
            ref = _ray.put((win_ids, win_ts))
            ds = ds.map_batches(
                dedup_filter, batch_format="pyarrow",
                batch_size=cfg.batch_size,
                fn_kwargs={"winners_ref": ref},
            )
            ds = ds.drop_columns(["dedup_bucket"])
        else:
            ds = ds.groupby("dedup_bucket").map_groups(
                dedup_group, batch_format="pandas"
            )
        tmp = docs_clean + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        _commit_dir(tmp, docs_clean)
        write_ordinals(index_root, docs_clean)  # stage 2 needs this NOW
        from search_engine_ray.state.docmap import write_docmap

        docmap_fut = bg.submit(write_docmap, index_root, docs_clean)
        write_manifest(
            docs_clean, run_hash, inputs,
            metrics={"n_docs": _count_rows(docs_clean),
                     "seconds": round(time.monotonic() - t0, 3)},
        )
        metrics["stages"]["clean"] = {"seconds": round(time.monotonic() - t0, 3),
                                      "skipped": False}
    else:
        metrics["stages"]["clean"] = {"skipped": True}
        # a resumed build whose docs_clean is fresh may still be missing
        # the docmap artifact (e.g. the first run died in stage 2/3 before
        # the background docmap write landed) — without this, DocMap
        # silently serves from the O(corpus) docs_clean fallback forever
        from search_engine_ray.state.docmap import DOCMAP_DIR, write_docmap

        if not os.path.isdir(os.path.join(index_root, DOCMAP_DIR)):
            docmap_fut = bg.submit(write_docmap, index_root, docs_clean)

    # ---- global stats (N, avgdl): resolve from cache, else compute in the
    # background OVERLAPPING stage 2 (needs only docs_clean; joined before
    # stage 3, which is the first consumer of avgdl) -----------------------
    stats = None
    if resume and os.path.exists(stats_path):
        with open(stats_path) as f:
            stats = json.load(f)
        if stats.get("run_hash") != run_hash:
            stats = None

    def _compute_stats():
        t0 = time.monotonic()
        n_docs = _count_rows(docs_clean)  # parquet metadata, no scan
        # doc_len lives on docs_clean: one tiny int column scan, not a pass
        # over the exploded token table. Below ~2M docs a driver-side
        # columnar read (~MBs) beats a Ray job's fixed launch cost; above
        # it the distributed sum takes over (run inline on the main
        # thread, after stage 2 — not from this worker thread).
        if n_docs > 2_000_000:
            return None
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        total_tokens = sum(
            pc.sum(pq.read_table(f, columns=["doc_len"])
                   .column("doc_len")).as_py() or 0
            for f in _expand_inputs(docs_clean))
        s = {
            "n_docs": int(n_docs),
            "total_tokens": int(total_tokens),
            "avgdl": (float(total_tokens) / n_docs) if n_docs else 0.0,
            "run_hash": run_hash,
        }
        atomic_write_json(stats_path, s)
        metrics["stages"]["stats"] = {
            "seconds": round(time.monotonic() - t0, 3), "overlapped": True}
        return s

    if stats is None:
        stats_fut = bg.submit(_compute_stats)

    # ---- stage 2: tokenize + explode (shuffle map side) ------------------
    if not (resume and is_fresh(tokens_dir, run_hash)):
        t0 = time.monotonic()
        invalidate(tokens_dir)
        # bound map-task count: every tokenize task writes one file per
        # bucket it touches, so files-per-bucket == map tasks and the
        # partitioned write's per-file overhead scales with the count.
        # ONE wave of CPU-count tasks beats the old 2x-CPU sizing at
        # both measured scales on this box (interleaved A/B, 32 vs 64
        # maps at 32 cpus: 50k docs 1.36-2.05 s vs 1.69-3.01 s, 32 wins
        # every adjacent pair; 500k docs tokenize 7.7-8.6 s vs
        # 9.8-10.9 s) — the deeper wave's straggler overlap never pays
        # for doubling the file count. Tiny inputs cap further at
        # input_bytes/1MB (floor 16) so a few-hundred-doc build doesn't
        # fan out at all. The built index is byte-identical at any
        # count (reducers sort each bucket by (term, doc_id) regardless
        # of map-file layout).
        import ray as _ray

        from search_engine_ray.stages.agg import parquet_input_bytes

        _cap = max(16, int(_ray.cluster_resources().get("CPU", 8)))
        _in_bytes = parquet_input_bytes(docs_clean)
        n_blocks = cfg.token_write_blocks or (
            _cap if _in_bytes is None
            else max(16, min(_cap, -(-_in_bytes // (1 << 20)))))
        ds = rd.read_parquet(docs_clean, columns=["doc_id", "text"],
                             override_num_blocks=n_blocks)
        if not os.path.exists(os.path.join(index_root, ORDINALS_FILE)):
            write_ordinals(index_root, docs_clean)
        ord_ref = _ray.put(load_ordinals(index_root))
        ds = ds.map_batches(
            TokenizeBatch(
                tokenizer=cfg.tokenizer,
                num_buckets=cfg.num_buckets,
                salt=cfg.salt,
                store_positions=cfg.store_positions,
            ),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            fn_kwargs={"ordinals_ref": ord_ref},
        )
        tmp = tokens_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp, partition_cols=["bucket_part"])
        _commit_dir(tmp, tokens_dir)
        write_manifest(
            tokens_dir, run_hash,
            metrics={"seconds": round(time.monotonic() - t0, 3)},
        )
        metrics["stages"]["tokenize"] = {"seconds": round(time.monotonic() - t0, 3),
                                         "skipped": False}
    else:
        metrics["stages"]["tokenize"] = {"skipped": True}

    # ---- join the overlapped stats (compute inline for the >2M case) -----
    if stats is None:
        stats = stats_fut.result()
    if stats is None:
        t0 = time.monotonic()
        n_docs = _count_rows(docs_clean)
        total_tokens = rd.read_parquet(
            docs_clean, columns=["doc_len"]).sum("doc_len") or 0
        stats = {
            "n_docs": int(n_docs),
            "total_tokens": int(total_tokens),
            "avgdl": (float(total_tokens) / n_docs) if n_docs else 0.0,
            "run_hash": run_hash,
        }
        atomic_write_json(stats_path, stats)
        metrics["stages"]["stats"] = {"seconds": round(time.monotonic() - t0, 3)}

    # ---- stage 3: per-bucket postings build ------------------------------
    t0 = time.monotonic()
    pending = [
        b for b in range(cfg.num_buckets)
        if not (resume and is_fresh(
            os.path.join(index_root, "buckets", f"bucket={b}"), run_hash))
    ]
    built = []
    # per-bucket path pruning: only read token partitions still pending
    pending_items = []
    pending_files: list[str] = []
    for b in pending:
        d = os.path.join(tokens_dir, f"bucket_part={b}")
        if os.path.isdir(d):
            files = _expand_inputs(d)
            size = sum(os.path.getsize(f) for f in files)
            pending_items.append({"bucket": b, "files": files,
                                  "size": size})
            pending_files.extend(files)
    # LPT order: biggest (head-term) buckets start first so the straggler
    # overlaps the rest of the work instead of running after it
    pending_items.sort(key=lambda it: -it["size"])
    if pending_items:
        # ordinal->doc_len broadcast: fetched once per worker; replaces the
        # per-token doc_len column of tokens format v1 (8 B/doc, same scale
        # ceiling as the ordinal map — see state/ordinals.py)
        import ray as _ray

        from search_engine_ray.state.ordinals import doclens_by_ordinal

        doclen_ref = _ray.put(doclens_by_ordinal(docs_clean))
    common = dict(
        index_root=index_root,
        cfg_hash=run_hash,
        avgdl=stats["avgdl"],
        store_positions=cfg.store_positions,
    )
    if pending_items and cfg.salt > 1:
        # salted two-phase: per-(bucket, salt) sorted runs, then per-bucket
        # merge — bounds any single task's memory to a doc-id slice.
        ds = rd.read_parquet(pending_files)
        runs = ds.groupby(["bucket", "salt"]).map_groups(
            encode_run, batch_format="pandas",
            fn_kwargs={"store_positions": cfg.store_positions,
                       "doclen_ref": doclen_ref},
        )
        result = runs.groupby("bucket").map_groups(
            merge_runs, batch_format="pandas", fn_kwargs=common,
        )
        built = result.to_pandas().to_dict("records")
    elif pending_items:
        # direct path: tokens are already hash-partitioned on disk by the
        # tokenize stage's partitioned write (the map side of the shuffle);
        # each reducer task reads its own buckets' partitions — no
        # Ray-level sort/groupby exchange. Task count caps at ~2x CPUs:
        # one task per bucket schedules 128 ~20 ms tasks at bench scale
        # (half the stage wall was scheduling); a task processes its
        # buckets sequentially, so peak memory stays one bucket and the
        # per-bucket artifact commit (the resume unit) is unchanged.
        n_blocks = min(len(pending_items),
                       2 * int(_ray.cluster_resources().get("CPU", 8)))
        # round-robin over the LPT order so the biggest buckets spread
        # across tasks instead of stacking in the first block
        rr = [pending_items[j] for b in range(n_blocks)
              for j in range(b, len(pending_items), n_blocks)]
        ds = rd.from_items(rr, override_num_blocks=n_blocks)
        result = ds.map_batches(
            build_bucket_from_files, batch_format="pandas",
            fn_kwargs=dict(common, doclen_ref=doclen_ref),
        )
        built = result.to_pandas().to_dict("records")
    metrics["stages"]["postings"] = {
        "seconds": round(time.monotonic() - t0, 3),
        "buckets_built": len(built),
        "buckets_skipped": cfg.num_buckets - len(pending),
    }

    # empty buckets get an artifact too (query side expects all P manifests)
    for b in pending:
        bdir = os.path.join(index_root, "buckets", f"bucket={b}")
        if read_manifest(bdir) is None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            from search_engine_ray.stages.postings import POSTINGS_SCHEMA
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(POSTINGS_SCHEMA.empty_table(),
                           os.path.join(bdir, "postings.parquet"))
            write_manifest(bdir, run_hash, metrics={"n_terms": 0},
                           extra={"bucket": b})

    # docmap note: no separate artifact — docs_clean IS the docmap (parquet
    # is columnar, so reading only (doc_id, url, warc_ts, lang) skips the
    # text bytes entirely; a second projection write would only duplicate).

    # ---- join background sections + root manifest ------------------------
    if docmap_fut is not None:
        docmap_fut.result()
    bg.shutdown(wait=True)
    cfg_dict = asdict(cfg)
    cfg_dict["extractor"] = EXTRACTOR_VERSION
    cfg_dict["codec"] = CODEC_VERSION
    cfg_dict["block_size"] = BLOCK_SIZE
    metrics["total_seconds"] = round(time.monotonic() - t_start, 3)
    metrics["n_docs"] = stats["n_docs"]
    metrics["avgdl"] = stats["avgdl"]
    atomic_write_json(
        os.path.join(index_root, "_manifest.json"),
        {"status": "committed", "config_hash": cfg_hash, "config": cfg_dict,
         "input": inputs, "metrics": metrics},
    )
    return metrics

