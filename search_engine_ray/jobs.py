"""``ray job submit``-able entrypoints (north-rule requirement).

On a real cluster:

    ray job submit --working-dir . -- python -m search_engine_ray.jobs \
        build --input /data/pages --index /data/index --num-buckets 512

    ray job submit --working-dir . -- python -m search_engine_ray.jobs \
        query --index /data/index --terms mila --type exact -k 10

    ray job submit --working-dir . -- python -m search_engine_ray.jobs \
        delta --index /data/index --input /data/pages_delta \
        --delete-urls-file deleted.txt

    ray job submit --working-dir . -- python -m search_engine_ray.jobs \
        sharded-build --input /data/pages --root /data/sharded \
        --num-shards 64
    ray job submit --working-dir . -- python -m search_engine_ray.jobs \
        sharded-delta --root /data/sharded --input /data/pages_delta
    ray job submit --working-dir . -- python -m search_engine_ray.jobs \
        query --index /data/sharded --sharded --terms mila

In this sandbox the same module runs standalone (Ray Data auto-inits local).
Guarded ``ray.init`` so it also works when a driver initialised Ray first.
"""

from __future__ import annotations

import argparse
import json
import sys

from search_engine_ray.pool import actor_pool_size


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    from search_engine_ray.build import BuildConfig, build_index

    cfg = BuildConfig(
        tokenizer=args.tokenizer,
        num_buckets=args.num_buckets,
        salt=args.salt,
        store_positions=not args.no_positions,
    )
    m = build_index(args.input, args.index, cfg, resume=not args.no_resume)
    print(json.dumps(m))
    return 0


def cmd_query(args) -> int:
    """Every engine query type is reachable from the job surface
    (reference SearchType.java:3-5 + the conjunctive/phrase/suggestion
    extensions)."""
    from search_engine_ray.search import LocalSearcher

    where = _parse_where(getattr(args, "where", None))
    text = getattr(args, "text", None)
    if (text is None) == (args.terms is None):
        raise SystemExit("query: pass exactly one of --terms or --text")
    if text is not None:
        from search_engine_ray.querystring import search_text

        if args.sharded:
            from search_engine_ray.sharded import ShardedSearcher

            s = ShardedSearcher(args.index)
        else:
            s = LocalSearcher(args.index)
        res = search_text(s, text, k=args.k, scorer=args.scorer,
                          where=where)
        print(json.dumps(res.to_pylist()))
        return 0
    after = getattr(args, "after", None)
    if after is not None:
        after = (float(after[0]), int(after[1]))
    if args.sharded:
        from search_engine_ray.sharded import ShardedSearcher

        s = ShardedSearcher(args.index)
        # every query type routes to its sharded implementation — never
        # fall through to search(), whose _expand would treat an unknown
        # type as an OR query and silently return disjunctive results.
        if args.type == "phrase":
            res = s.phrase_search(args.terms, k=args.k, where=where)
        elif args.type == "near":
            res = s.near_search(args.terms, window=args.slop, k=args.k,
                                where=where)
        elif args.type == "bool":
            res = s.bool_search(" ".join(args.terms), k=args.k,
                                where=where)
        elif args.type == "synonym":
            # each --terms argument is one synonym group, members
            # pipe-separated: --type synonym --terms "car|auto" "fast"
            # (the sharded path injects global union-df idfs)
            res = s.synonym_search([t.split("|") for t in args.terms],
                                   k=args.k, where=where)
        elif args.type == "suggest":
            from search_engine_ray.suggest import SuggestionExpander

            res = SuggestionExpander(s).search_with_suggestions(
                args.terms[0], k=args.k)
        else:
            res = s.search(args.terms, args.type, k=args.k, where=where,
                           search_after=after, scorer=args.scorer)
        print(json.dumps(res.to_pylist()))
        return 0
    s = LocalSearcher(args.index)
    if args.type == "phrase":
        res = s.phrase_search(args.terms, k=args.k, where=where)
    elif args.type == "near":
        res = s.near_search(args.terms, window=args.slop, k=args.k,
                            where=where)
    elif args.type == "bool":
        # the expression is the space-joined terms: --terms "(a" OR "b)"
        # or a single quoted argument
        res = s.bool_search(" ".join(args.terms), k=args.k, where=where)
    elif args.type == "synonym":
        # each --terms argument is one synonym group, members
        # pipe-separated: --type synonym --terms "car|auto" "fast"
        res = s.synonym_search([t.split("|") for t in args.terms],
                               k=args.k, where=where)
    elif args.type == "suggest":
        from search_engine_ray.suggest import SuggestionExpander

        res = SuggestionExpander(s).search_with_suggestions(
            args.terms[0], k=args.k, scorer=args.scorer)
    elif getattr(args, "highlight", False):
        # app-flow parity: matched lines + char spans per hit (the Swing
        # preview pane's highlight data, highlight.py)
        from search_engine_ray.highlight import search_highlights

        res = search_highlights(s, args.terms, args.type, k=args.k,
                                scorer=args.scorer)
        print(json.dumps(res.to_pylist()))
        return 0
    else:
        res = s.search(args.terms, args.type, k=args.k, scorer=args.scorer,
                       where=where, search_after=after)
    print(json.dumps(res.to_pylist()))
    return 0


def _parse_where(pairs: list[str] | None) -> dict | None:
    """--where col=value [col=value ...] -> predicate dict (None if
    absent). ``col=lo..hi`` is an inclusive numeric range (either side
    may be empty for an open end, e.g. doc_len=100..); anything else is
    a string equality."""
    if not pairs:
        return None

    def num(s: str):
        if not s:
            return None
        return float(s) if "." in s else int(s)

    out: dict = {}
    for p in pairs:
        col, sep, val = p.partition("=")
        if not sep or not col:
            raise SystemExit(f"--where expects col=value, got {p!r}")
        if ".." in val:
            lo, _, hi = val.partition("..")
            out[col] = (num(lo), num(hi))
        else:
            out[col] = val
    return out


def cmd_complete(args) -> int:
    """df-ranked autocomplete over the index vocabulary."""
    if args.sharded:
        from search_engine_ray.sharded import ShardedSearcher

        s = ShardedSearcher(args.index)
    else:
        from search_engine_ray.search import LocalSearcher

        s = LocalSearcher(args.index)
    print(json.dumps(s.complete(args.prefix, k=args.k).to_pylist()))
    return 0


def cmd_facets(args) -> int:
    """Facet counts: distinct matching docs per attribute value."""
    if args.sharded:
        from search_engine_ray.sharded import ShardedSearcher

        s = ShardedSearcher(args.index)
    else:
        from search_engine_ray.search import LocalSearcher

        s = LocalSearcher(args.index)
    if getattr(args, "bins", None):
        edges = [float(x) for x in args.bins.split(",")]
        res = s.facet_histogram(args.terms, edges, args.type, by=args.by,
                                where=_parse_where(args.where))
    else:
        res = s.facet_counts(args.terms, args.type, by=args.by,
                             where=_parse_where(args.where))
    print(json.dumps(res.to_pylist()))
    return 0


def cmd_dsir(args) -> int:
    """DSIR data selection (Xie 2023): score every doc's hashed-n-gram
    importance weight against the holdout target slice, Gumbel-top-k
    resample, write the per-doc weight table (with the ``selected``
    flag) as parquet, print a summary."""
    import duckdb
    import ray.data as rd

    from search_engine_ray.functions.dsir import dsir_select

    ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
    out = dsir_select(ds, k=args.k, n_buckets=args.buckets,
                      eval_mod=args.eval_mod, eval_rem=args.eval_rem)
    out.write_parquet(args.out)
    rep = duckdb.sql(f"""
        SELECT count(*) FILTER (selected = 1) AS n_selected,
               round(avg(log_iw) FILTER (selected = 1), 6) AS mean_iw_sel,
               round(avg(log_iw) FILTER (selected = 0 AND is_target = 0),
                     6) AS mean_iw_rest
        FROM read_parquet('{args.out}/*.parquet')
    """).df().iloc[0]
    print(json.dumps({"n_selected": int(rep["n_selected"]),
                      "mean_iw_selected": float(rep["mean_iw_sel"]),
                      "mean_iw_rest": float(rep["mean_iw_rest"]),
                      "out": args.out}))
    return 0


def cmd_domains(args) -> int:
    """URL-level curation over a pages corpus (functions/urls.py):
    ``--stats`` writes the per-domain profile; ``--block FILE`` (one
    domain per line) drops blocklisted domains; ``--cap K`` keeps at
    most K newest pages per domain (RefinedWeb source cap). Block and
    cap compose (block first); the surviving corpus writes to --out."""
    import pyarrow.dataset as pds
    import ray.data as rd

    from search_engine_ray.functions.urls import (
        cap_per_domain,
        domain_stats,
        filter_domains,
    )

    def _rows(path: str) -> int:  # footer-only count
        return sum(f.count_rows() for f in pds.dataset(path)
                   .get_fragments())

    ds = rd.read_parquet(args.input)
    if args.stats:
        domain_stats(ds).write_parquet(args.out)
        print(json.dumps({"mode": "stats", "n_domains": _rows(args.out),
                          "out": args.out}))
        return 0
    if not args.block and not args.cap:
        print(json.dumps({"error": "need --stats, --block or --cap"}))
        return 1
    if args.block:
        with open(args.block) as f:
            blocked = [ln.strip() for ln in f if ln.strip()]
        ds = filter_domains(ds, blocked)
    if args.cap:
        ds = cap_per_domain(ds, cap=args.cap)
    ds.write_parquet(args.out)
    print(json.dumps({"mode": "curate", "n_kept": _rows(args.out),
                      "out": args.out}))
    return 0


def cmd_train_bpe(args) -> int:
    """Train a BPE subword tokenizer over a documents corpus (Sennrich
    2016): one corpus pass for word counts, then the tiered merge loop;
    writes the rank-ordered merge table to ``--out`` and prints a
    summary."""
    import pyarrow.parquet as pq_
    import ray.data as rd

    from search_engine_ray.functions.bpe import learn_bpe

    ds = rd.read_parquet(args.input, columns=["text"])
    merges = learn_bpe(ds, k_merges=args.k, min_count=args.min_count,
                       tier=args.tier)
    pq_.write_table(merges, args.out)
    print(json.dumps({
        "n_merges": merges.num_rows,
        "out": args.out,
        "top": merges.slice(0, 5).to_pylist(),
    }))
    return 0


def cmd_sync(args) -> int:
    """Reconcile an index with a new full page snapshot (diff + delta)."""
    from search_engine_ray.incremental import sync_index

    m = sync_index(args.index, args.input)
    print(json.dumps(m))
    return 0


def cmd_fsck(args) -> int:
    """Index integrity check; exit 1 on any violated invariant.
    Doc-sharded roots (a ``shard=0`` subdir) get the per-shard +
    sidecar-df-sum checks; IVF vector-index roots (a ``centroids.npy``)
    get the vector-assignment checks."""
    import os

    from search_engine_ray.fsck import (
        verify_index,
        verify_sharded,
        verify_vecindex,
    )

    if os.path.exists(os.path.join(args.index, "centroids.npy")):
        rep = verify_vecindex(args.index, deep=args.deep)
    elif os.path.isdir(os.path.join(args.index, "shard=0")):
        rep = verify_sharded(args.index, deep=args.deep)
    else:
        rep = verify_index(args.index, deep=args.deep)
    print(json.dumps(rep))
    return 0 if rep["ok"] else 1


def cmd_mlt(args) -> int:
    """More-like-this: find documents similar to a given url/doc_id."""
    from search_engine_ray.idhash import doc_id_for_url
    from search_engine_ray.search import LocalSearcher

    s = LocalSearcher(args.index)
    doc_id = doc_id_for_url(args.url) if args.url else args.doc_id
    res = s.more_like_this(doc_id, k=args.k, max_terms=args.max_terms)
    print(json.dumps(res.to_pylist()))
    return 0


def cmd_merge(args) -> int:
    """Segment-merge 2+ index snapshots. More than two inputs fold
    left-to-right through pairwise merges (the compaction ladder: each
    level moves every postings byte once); intermediate levels live
    under OUT/_merge_tmp and are removed on success."""
    import os
    import shutil

    from search_engine_ray.incremental import merge_indexes

    inputs = [args.index_a, args.index_b] + (args.more or [])
    tmp_root = os.path.join(args.out + "_merge_tmp")
    shutil.rmtree(tmp_root, ignore_errors=True)
    acc = inputs[0]
    m = {}
    for i, nxt in enumerate(inputs[1:]):
        dest = (args.out if i == len(inputs) - 2
                else os.path.join(tmp_root, f"level{i}"))
        m = merge_indexes(acc, nxt, dest)
        acc = dest
    shutil.rmtree(tmp_root, ignore_errors=True)
    m["n_inputs"] = len(inputs)
    print(json.dumps(m))
    return 0


def cmd_remove(args) -> int:
    """Delete documents by url (reference DocumentRemoveTask, U2+M8).

    Marking is instant and O(deleted): the urls land in the index's
    pending-deletes sidecar and stop matching at the NEXT query on every
    serving topology — no reload, no merge. ``--merge`` additionally
    runs the physical postings merge now (incremental.remove_urls),
    which also prunes the sidecar."""
    from search_engine_ray.pending import mark_deleted

    urls = list(args.urls or [])
    if args.urls_file:
        with open(args.urls_file) as f:
            urls += [ln.strip() for ln in f if ln.strip()]
    if not urls:
        print(json.dumps({"error": "no urls given"}))
        return 1
    out = {"marked": mark_deleted(args.index, urls=urls)}
    if args.merge:
        from search_engine_ray.pending import shard_roots

        if shard_roots(args.index):
            from search_engine_ray.sharded import apply_delta_sharded

            out["merge"] = apply_delta_sharded(args.index, None,
                                               deleted_urls=urls)
        else:
            from search_engine_ray.incremental import remove_urls

            out["merge"] = remove_urls(args.index, urls)
    print(json.dumps(out))
    return 0


def cmd_delta(args) -> int:
    from search_engine_ray.incremental import apply_delta

    deleted = []
    if args.delete_urls_file:
        with open(args.delete_urls_file) as f:
            deleted = [ln.strip() for ln in f if ln.strip()]
    # no config flags on purpose: the delta always uses the config persisted
    # in the index's root manifest (a mismatched config would corrupt the
    # bucket layout — incremental.apply_delta validates/loads it).
    m = apply_delta(args.index, args.input, deleted_urls=deleted)
    print(json.dumps(m))
    return 0


def cmd_sharded_build(args) -> int:
    from search_engine_ray.build import BuildConfig
    from search_engine_ray.sharded import build_sharded

    cfg = BuildConfig(
        tokenizer=args.tokenizer,
        num_buckets=args.num_buckets,
        store_positions=not args.no_positions,
    )
    m = build_sharded(args.input, args.root, args.num_shards, cfg,
                      resume=not args.no_resume)
    print(json.dumps(m))
    return 0


def cmd_sharded_delta(args) -> int:
    from search_engine_ray.sharded import apply_delta_sharded

    deleted = []
    if args.delete_urls_file:
        with open(args.delete_urls_file) as f:
            deleted = [ln.strip() for ln in f if ln.strip()]
    m = apply_delta_sharded(args.root, args.input, deleted_urls=deleted)
    print(json.dumps(m))
    return 0


def cmd_dedup(args) -> int:
    """Training-data dedup family as a submittable job: reads a
    ``documents``-shaped parquet (``doc_id:int64, text:string``; the
    ``embedding`` method reads ``vec_id, embedding``), streams the chosen
    pipeline, writes pairs/representatives as partitioned parquet."""
    import os

    import pyarrow.dataset as pds
    import ray.data as rd

    if args.method == "embedding":
        from search_engine_ray.functions.ann import (cosine_all_pairs_exact,
                                                     cosine_near_dup_pairs)

        ds = rd.read_parquet(args.input, columns=["vec_id", "embedding"])
        res = (cosine_all_pairs_exact(ds, threshold=args.threshold)
               if args.exact else
               cosine_near_dup_pairs(ds, threshold=args.threshold))
    elif args.method == "semantic":
        # SemDeDup: k-means clusters + within-cluster keep-first pruning;
        # writes the DROPPED rows (vec_id, keeper_id, cluster, cos) — the
        # kept corpus is the input minus these vec_ids
        from search_engine_ray.functions.ann import semantic_dedup

        ds = rd.read_parquet(args.input, columns=["vec_id", "embedding"])
        res = semantic_dedup(ds, n_clusters=args.n_clusters,
                             threshold=args.threshold)
    else:
        ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
        if args.method == "exact":
            from search_engine_ray.functions.dedup import exact_dedup

            res = exact_dedup(ds)
        elif args.method == "minhash":
            from search_engine_ray.functions.dedup import minhash_near_dups

            res = minhash_near_dups(ds, threshold=args.threshold)
        elif args.method == "simhash":
            from search_engine_ray.functions.dedup import simhash_near_dups

            res = simhash_near_dups(ds, max_hamming=args.max_hamming)
        elif args.method == "spans":
            # substring-level exact dedup: the span REPORT by default
            # (doc_id, span_start, span_end, span_len); --rewrite cuts
            # every duplicated occurrence but the global keeper and
            # writes the cleaned corpus (doc_id, clean_text, n_cut_tokens)
            from search_engine_ray.functions.dedup import (
                cut_duplicate_spans,
                duplicate_spans,
            )

            res = (cut_duplicate_spans(ds, window=args.window)
                   if getattr(args, "rewrite", False)
                   else duplicate_spans(ds, window=args.window))
        elif args.method == "line":
            # line-LEVEL dedup is a rewrite, not a pair list: writes the
            # deduplicated corpus (doc_id, clean_text, counts)
            from search_engine_ray.functions.webtext import line_dedup

            res = line_dedup(ds)
        else:  # ngram
            from search_engine_ray.functions.dedup import (
                ngram_jaccard_near_dups)

            res = ngram_jaccard_near_dups(ds, threshold=args.threshold)
    if getattr(args, "resolve", False) and args.method in (
            "minhash", "simhash", "ngram"):
        # pairs -> connected components -> keep-one-per-cluster corpus:
        # clusters.parquet (doc_id, cluster_rep) + kept.parquet (docs
        # minus non-representative cluster members)
        from search_engine_ray.functions.dedup import near_dup_clusters

        clusters = near_dup_clusters(res).materialize()
        clusters.write_parquet(os.path.join(args.out, "clusters"))
        # drop set = cluster-members-minus-reps. Bounded by the dup rate,
        # but kept fully distributed anyway: an ANTI-join of the corpus
        # against the drops (one exchange, per-bucket np.isin) — the same
        # plan as the mix keep stage, zero driver-side id state.
        import pyarrow.compute as pc_

        from search_engine_ray.functions.join import semi_join

        drops = clusters.map_batches(
            lambda b: b.filter(pc_.invert(pc_.equal(
                b.column("doc_id"), b.column("cluster_rep"))))
            .select(["doc_id"]),
            batch_format="pyarrow").materialize()
        n_drop = drops.count()
        kept = semi_join(ds, drops, on="doc_id", anti=True)
        kept.write_parquet(os.path.join(args.out, "kept"))
        n_kept = sum(f.count_rows() for f in pds.dataset(
            os.path.join(args.out, "kept"),
            format="parquet").get_fragments())
        print(json.dumps({"method": args.method, "out": args.out,
                          "resolved": True, "n_dropped": n_drop,
                          "rows": n_kept}))
        return 0
    os.makedirs(args.out, exist_ok=True)
    res.write_parquet(args.out)
    n = sum(f.count_rows() for f in
            pds.dataset(args.out, format="parquet").get_fragments())
    print(json.dumps({"method": args.method, "out": args.out, "rows": n}))
    return 0


def cmd_ann_build(args) -> int:
    """Build the persisted IVF vector index (vecindex.py): codebook +
    list-partitioned parquet, resumable via the manifest."""
    import ray.data as rd

    from search_engine_ray.vecindex import VecIndexConfig, build_ivf_index

    ds = rd.read_parquet(args.input, columns=["vec_id", "embedding"])
    m = build_ivf_index(
        ds, args.root,
        VecIndexConfig(n_centroids=args.n_centroids,
                       sample_size=args.sample_size, seed=args.seed),
        resume=not args.no_resume)
    print(json.dumps(m))
    return 0


def cmd_ingest(args) -> int:
    """Ingest a directory of JSONL / JSONL-gz crawl shards into the
    documents-parquet layout every pipeline consumes
    (sources/jsonl.read_jsonl): distributed per-file reads, shard-
    partitioned output (shard_id = doc_id %% n-shards) so a failed run
    resumes per shard and downstream jobs prune reads."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.sources.jsonl import read_jsonl

    ds = read_jsonl(args.input, text_key=args.text_key)
    n_shards = args.n_shards

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard_id", pa.array((ids % n_shards).astype(np.int64)))

    ds.map_batches(add_shard, batch_format="pyarrow").write_parquet(
        args.out, partition_cols=["shard_id"])
    import pyarrow.dataset as pds

    n = pds.dataset(args.out, format="parquet",
                    partitioning="hive").count_rows()
    print(json.dumps({"out": args.out, "n_docs": int(n),
                      "n_shards": n_shards}))
    return 0


def cmd_ingest_warc(args) -> int:
    """Ingest WARC crawl segments (the native Common-Crawl format) into
    shard-partitioned pages parquet — the index build's input layout
    (sources/warc.read_warc): distributed per-segment reads, shard_id =
    blake2b64(url) %% n-shards so a failed run resumes per shard."""
    import numpy as np
    import pyarrow as pa

    from search_engine_ray.idhash import doc_ids_for_urls
    from search_engine_ray.sources.warc import read_warc

    ds = read_warc(args.input)
    n_shards = args.n_shards

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = doc_ids_for_urls(batch.column("url").to_pylist())
        return batch.append_column(
            "shard_id", pa.array((ids % n_shards).astype(np.int64)))

    ds.map_batches(add_shard, batch_format="pyarrow").write_parquet(
        args.out, partition_cols=["shard_id"])
    import pyarrow.dataset as pds

    n = pds.dataset(args.out, format="parquet",
                    partitioning="hive").count_rows()
    print(json.dumps({"out": args.out, "n_pages": int(n),
                      "n_shards": n_shards}))
    return 0


def cmd_ann_delta(args) -> int:
    """Incremental maintenance of the persisted IVF index
    (vecindex.apply_ivf_delta): --add is a (vec_id, embedding) parquet
    appended under the stored codebook; --remove is a comma-separated
    vec_id list rewritten out of only the touched list files."""
    import ray.data as rd

    from search_engine_ray.vecindex import apply_ivf_delta

    adds = (rd.read_parquet(args.add, columns=["vec_id", "embedding"])
            if args.add else None)
    removes = ([int(x) for x in args.remove.split(",") if x]
               if args.remove else None)
    m = apply_ivf_delta(args.root, adds=adds, remove_ids=removes)
    print(json.dumps(m))
    return 0


def cmd_embed(args) -> int:
    """Generate embeddings from document TEXT (functions/embed.py:
    hashed n-gram + seeded random projection, model-in-actor-__init__
    pool). Output is (vec_id, embedding) parquet — vec_id == doc_id —
    directly consumable by ann-build / ann-query / knn-join."""
    import ray.data as rd

    from search_engine_ray.functions.embed import embed_documents

    ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
    out = embed_documents(ds, dim=args.dim, seed=args.seed)
    out = out.map_batches(
        lambda b: b.rename_columns(["vec_id", "embedding"]),
        batch_format="pyarrow")
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "dim": args.dim, "seed": args.seed}))
    return 0


def cmd_knn_join(args) -> int:
    """Exact cosine kNN join (left x right) -> partitioned parquet of
    (left_id, right_id, rank, cos); --self drops left_id == right_id
    (kNN graph over one corpus)."""
    import ray.data as rd

    from search_engine_ray.functions.ann import knn_join

    left = rd.read_parquet(args.left, columns=["vec_id", "embedding"])
    right = rd.read_parquet(args.right or args.left,
                            columns=["vec_id", "embedding"])
    res = knn_join(left, right, k=args.k,
                   exclude_self=args.self or args.right is None)
    res.write_parquet(args.out)
    print(json.dumps({"out": args.out, "k": args.k}))
    return 0


def cmd_ann_query(args) -> int:
    """Query the persisted IVF index: reads ONLY the probed list
    partitions. ``--queries`` is a (vec_id, embedding) parquet; results
    are ordered by that file's vec_id order."""
    import numpy as np
    import pyarrow.parquet as pq

    from search_engine_ray.vecindex import IvfSearcher

    t = pq.read_table(args.queries, columns=["vec_id", "embedding"])
    order = np.argsort(t.column("vec_id").to_numpy())
    vecs = t.column("embedding").to_pylist()
    q = np.asarray([vecs[i] for i in order], dtype=np.float64)
    res = IvfSearcher(args.root).search(q, k=args.k, n_probe=args.n_probe)
    print(json.dumps(res.to_dict(orient="records")))
    return 0


def cmd_mix(args) -> int:
    """Token-budgeted training-mix assembly as a job
    (functions/webtext.corpus_mix): writes the selection REPORT
    (``<out>/report``: doc_id, source, n_tokens, cum_tokens) and the
    mixed CORPUS (``<out>/corpus``: the selected docs' original rows).
    The kept-id side of a token-budget mix is O(corpus) — a constant
    fraction of the input — so the corpus rewrite is a distributed
    SEMI-JOIN of the input against the report (functions/join.semi_join:
    one tagged-union exchange, per-bucket np.isin), never a driver-side
    id set (VERDICT r4: the ``set(report.to_pandas())`` broadcast was
    the last O(corpus) driver materialization in the repo)."""
    import os

    import pyarrow.dataset as pds
    import ray.data as rd

    weights = {}
    for part in args.weights.split(","):
        k, v = part.split("=")
        weights[k.strip()] = float(v)
    from search_engine_ray.functions.webtext import corpus_mix

    merges = None
    if getattr(args, "bpe_merges", None):
        import pyarrow.parquet as pq_

        merges = pq_.read_table(args.bpe_merges)
    ds = rd.read_parquet(args.input, columns=["doc_id", "source", "text"])
    report = corpus_mix(ds, weights, args.budget,
                        bpe_merges=merges).materialize()
    report.write_parquet(os.path.join(args.out, "report"))
    from search_engine_ray.functions.join import semi_join

    semi_join(rd.read_parquet(args.input),
              rd.read_parquet(os.path.join(args.out, "report"),
                              columns=["doc_id"]),
              on="doc_id").write_parquet(os.path.join(args.out, "corpus"))
    n = sum(f.count_rows() for f in pds.dataset(
        os.path.join(args.out, "corpus"),
        format="parquet").get_fragments())
    tok = int(report.sum("n_tokens") or 0)
    print(json.dumps({"out": args.out, "rows": n, "tokens": tok,
                      "budget": args.budget}))
    return 0


def cmd_curate(args) -> int:
    """End-to-end webtext curation as a submittable job: annotate every
    document with the composite keep/reject decision (functions/webtext.
    CorpusFilterBatch — holdout/short/quality/repetition/contamination),
    write the corpus as parquet PARTITIONED BY keep (the training corpus
    is ``<out>/keep=1/``; rejects keep their ``reason`` for audit), and
    print per-reason counts. The report aggregate runs as a DuckDB
    pushdown over the written parquet — never a driver materialization."""
    import duckdb
    import ray
    import ray.data as rd

    from search_engine_ray.functions.webtext import (
        CorpusFilterBatch,
        eval_shingle_set,
    )

    kw = {"eval_mod": args.eval_mod, "eval_rem": args.eval_rem,
          "k": args.ngram, "min_tokens": args.min_tokens,
          "min_quality": args.min_quality, "max_dup3": args.max_dup3}
    sig_ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
    if args.normalize:
        # normalize BOTH the eval-shingle pass and the corpus pass —
        # contamination keys on n-gram hashes, which must agree
        from search_engine_ray.functions.webtext import unicode_normalize

        sig_ds = unicode_normalize(sig_ds, form=args.normalize)
    ev_ref = ray.put(eval_shingle_set(sig_ds, args.eval_mod, args.eval_rem,
                                      args.ngram))

    class _Annotate:
        def __init__(self):
            self._f = CorpusFilterBatch(ev_ref, **kw)

        def __call__(self, batch):
            res = self._f(batch.select(["doc_id", "text"]))
            return batch.append_column(
                "keep", res.column("keep")).append_column(
                "reason", res.column("reason"))

    ds = rd.read_parquet(args.input)  # all columns survive into the output
    if args.normalize:
        from search_engine_ray.functions.webtext import unicode_normalize

        ds = unicode_normalize(ds, form=args.normalize)
    ds.map_batches(_Annotate, batch_format="pyarrow", batch_size=1024,
                   concurrency=actor_pool_size()).write_parquet(
        args.out, partition_cols=["keep"])
    rep = duckdb.sql(
        f"SELECT coalesce(nullif(reason, ''), 'kept') AS reason, "
        f"count(*) AS n FROM read_parquet('{args.out}/**/*.parquet', "
        f"hive_partitioning=1) GROUP BY 1 ORDER BY n DESC").fetchall()
    print(json.dumps({"out": args.out, "kept_dir": f"{args.out}/keep=1",
                      "reasons": {r: int(n) for r, n in rep}}))
    return 0


def cmd_prepare(args) -> int:
    """THE training-data pipeline as one submittable job, composed from
    the streaming primitives: (1) composite corpus filter (holdout /
    short / quality / repetition / contamination) keeps survivors only,
    (2) corpus-GLOBAL line dedup rewrites their text, (3) the deduped
    corpus checkpoints to ``<out>/_stage_dedup/`` parquet (it feeds TWO
    consumers — re-reading a stage file beats re-running the pipeline —
    and commits marker-last, so a rerun resumes from a COMPLETE stage
    and rebuilds a partial one; ``--no-resume`` forces rebuild), (4) deterministic corpus shuffle
    assigns (shard_id, pos), joined back by the bucketed hash join, and
    (5) the final corpus writes parquet PARTITIONED BY shard_id with a
    dense within-shard training order."""
    import os
    import shutil

    import duckdb
    import ray
    import ray.data as rd

    from search_engine_ray.functions.join import bucketed_hash_join
    from search_engine_ray.functions.webtext import (
        CorpusFilterBatch,
        corpus_shuffle,
        eval_shingle_set,
        line_dedup,
    )

    sig_ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
    ev_ref = ray.put(eval_shingle_set(sig_ds))

    class _KeepOnly:
        def __init__(self):
            self._f = CorpusFilterBatch(ev_ref)

        def __call__(self, batch):
            keep = self._f(batch).column("keep")
            import pyarrow.compute as pc

            return batch.filter(pc.equal(keep, 1))

    kept = rd.read_parquet(args.input, columns=["doc_id", "text"]) \
        .map_batches(_KeepOnly, batch_format="pyarrow", batch_size=1024,
                     concurrency=actor_pool_size())

    stage = os.path.join(args.out, "_stage_dedup")
    # marker lives BESIDE the stage dir — parquet readers scan every
    # file inside it
    done_marker = stage + ".done"
    if os.path.exists(done_marker) and not args.no_resume:
        print(json.dumps({"resumed_stage": stage}), flush=True)
    else:
        shutil.rmtree(stage, ignore_errors=True)
        if os.path.exists(done_marker):
            os.unlink(done_marker)
        os.makedirs(stage, exist_ok=True)
        line_dedup(kept).write_parquet(stage)
        with open(done_marker, "w") as f:  # marker-last = atomic commit
            f.write("ok")

    import pyarrow.dataset as pds

    if pds.dataset(stage, format="parquet").count_rows() == 0:
        # the filter kept nothing — report instead of crashing on a
        # schemaless empty stage file
        print(json.dumps({"out": args.out, "n_shards": 0, "rows": 0,
                          "per_shard": {}, "dense_positions": True}))
        return 0

    if getattr(args, "dsir_k", None):
        # optional stage 3b: DSIR importance selection over the deduped
        # survivors. Models train on the PRE-filter input (the holdout
        # target slice was dropped by the corpus filter); only survivors
        # are scored/selected. Same marker-last checkpoint contract.
        stage2 = os.path.join(args.out, "_stage_dsir")
        marker2 = stage2 + ".done"
        if os.path.exists(marker2) and not args.no_resume:
            print(json.dumps({"resumed_stage": stage2}), flush=True)
        else:
            from search_engine_ray.functions.dsir import dsir_select

            shutil.rmtree(stage2, ignore_errors=True)
            if os.path.exists(marker2):
                os.unlink(marker2)
            os.makedirs(stage2, exist_ok=True)
            # the dedup stage's text column is the REWRITTEN clean_text
            sel = dsir_select(
                rd.read_parquet(stage, columns=["doc_id", "clean_text"])
                .map_batches(lambda b: b.rename_columns(
                    ["doc_id", "text"]), batch_format="pyarrow"),
                k=args.dsir_k, n_buckets=args.dsir_buckets,
                model_ds=rd.read_parquet(args.input,
                                         columns=["doc_id", "text"]))
            import pyarrow as pa_
            import pyarrow.compute as pc_

            # the selected-id set is bounded by --dsir-k, so broadcast
            # (zero shuffle) beats a semi-join here; the kept path is
            # fully vectorized (pc.is_in against the shared Arrow array,
            # no per-row Python membership loop — VERDICT r4 #2)
            id_tbls = [b for b in sel.map_batches(
                lambda b: b.filter(pc_.equal(b.column("selected"), 1))
                .select(["doc_id"]),
                batch_format="pyarrow").iter_batches(
                batch_format="pyarrow") if len(b)]
            sel_arr = (pa_.concat_tables(id_tbls).column("doc_id")
                       .to_numpy(zero_copy_only=False)
                       if id_tbls else [])
            ids_ref = ray.put(pa_.array(sel_arr, pa_.int64()))

            def keep_selected(b):
                return b.filter(pc_.is_in(
                    b.column("doc_id"), value_set=ray.get(ids_ref)))

            rd.read_parquet(stage).map_batches(
                keep_selected, batch_format="pyarrow").write_parquet(
                stage2)
            with open(marker2, "w") as f:
                f.write("ok")
        stage = stage2

    deduped = rd.read_parquet(stage)
    pos = corpus_shuffle(rd.read_parquet(
        stage, columns=["doc_id"]), n_shards=args.n_shards).map_batches(
        lambda df: df.rename(columns={"doc_id": "pos_doc_id"}),
        batch_format="pandas")
    final = bucketed_hash_join(deduped, pos,
                               left_on="doc_id", right_on="pos_doc_id") \
        .map_batches(lambda df: df.drop(columns=["pos_doc_id"]),
                     batch_format="pandas")
    # the final write is not file-idempotent (parquet sinks append new
    # files) — clear previous shard partitions so a rerun replaces them
    for name in os.listdir(args.out):
        if name.startswith("shard_id="):
            shutil.rmtree(os.path.join(args.out, name))
    final.write_parquet(args.out, partition_cols=["shard_id"])

    rep = duckdb.sql(
        f"SELECT shard_id, count(*) AS n, max(pos) + 1 AS dense_n "
        f"FROM read_parquet('{args.out}/shard_id=*/*.parquet', "
        f"hive_partitioning=1) GROUP BY 1 ORDER BY 1").fetchall()
    shards = {int(s): int(n) for s, n, dn in rep}
    dense = all(int(n) == int(dn) for _, n, dn in rep)
    print(json.dumps({"out": args.out, "n_shards": len(shards),
                      "rows": sum(shards.values()),
                      "per_shard": shards, "dense_positions": dense}))
    return 0


def cmd_profile(args) -> int:
    """Per-column dataset profile (functions/profile.py) as a job:
    prints one JSON line per column + an optional HLL approx-distinct
    comparison column."""
    import ray.data as rd

    from search_engine_ray.functions.profile import (
        approx_distinct,
        profile_table,
    )

    ds = rd.read_parquet(args.input)
    if args.heavy_hitters:
        from search_engine_ray.functions.profile import heavy_hitters

        hh = heavy_hitters(ds, args.heavy_hitters, k=args.k)
        for row in hh.to_dict("records"):
            print(json.dumps({"value": row["value"],
                              "est_count": int(row["est_count"])}))
        return 0
    out = profile_table(ds)
    if args.approx:
        out["n_distinct_hll"] = [
            int(round(approx_distinct(rd.read_parquet(args.input), c)))
            for c in out["column"]]
    for row in out.to_dict("records"):
        print(json.dumps({k: (None if pd_isna(v) else v)
                          for k, v in row.items()}))
    return 0


def pd_isna(v) -> bool:
    import pandas as pd

    return not isinstance(v, (str, bytes)) and pd.isna(v)


def _index_stats(root: str) -> dict:
    """One index root's statistics from manifests + parquet FOOTERS
    only — no posting bytes are read, so this is O(buckets) metadata
    I/O at any corpus size."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    with open(os.path.join(root, "global_stats.json")) as f:
        gs = json.load(f)
    col_bytes: dict[str, int] = {}
    n_terms = 0
    n_postings = 0
    file_bytes = 0
    for bdir in sorted(_glob.glob(os.path.join(root, "buckets",
                                               "bucket=*"))):
        if not os.path.isdir(bdir):  # glob also hits *.manifest.json
            continue
        p = os.path.join(bdir, "postings.parquet")
        md = _pq.ParquetFile(p).metadata
        n_terms += md.num_rows
        file_bytes += os.path.getsize(p)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                col_bytes[name] = (col_bytes.get(name, 0)
                                   + col.total_compressed_size)
        man = os.path.join(bdir + ".manifest.json")
        if os.path.exists(man):
            with open(man) as f:
                n_postings += json.load(f)["metrics"].get("n_postings", 0)
    docs_bytes = sum(
        os.path.getsize(p) for p in _glob.glob(
            os.path.join(root, "docs_clean", "*.parquet")))
    out = {
        "n_docs": gs.get("n_docs"),
        "avgdl": gs.get("avgdl"),
        "vocab": n_terms,
        "n_postings": n_postings,
        "postings_file_bytes": file_bytes,
        "docs_clean_bytes": docs_bytes,
        "column_bytes": dict(sorted(col_bytes.items())),
    }
    if n_postings:
        out["bytes_per_posting"] = round(file_bytes / n_postings, 3)
    return out


def cmd_stats(args) -> int:
    """Index statistics job: vocabulary size, posting count, bytes per
    parquet column (docs/tfs/positions/block-max), bytes/posting — the
    ops view of a build or a sharded root, footer-metadata only."""
    import glob as _glob
    import os

    shard_roots = [s for s in sorted(_glob.glob(
        os.path.join(args.index, "shard=*"))) if os.path.isdir(s)]
    if shard_roots:
        shards = [_index_stats(s) for s in shard_roots]
        with open(os.path.join(args.index, "global_stats.json")) as f:
            gs = json.load(f)
        agg = {
            "n_docs": gs.get("n_docs"),
            "avgdl": gs.get("avgdl"),
            "num_doc_shards": len(shards),
            "vocab_per_shard": [s["vocab"] for s in shards],
            "n_postings": sum(s["n_postings"] for s in shards),
            "postings_file_bytes": sum(s["postings_file_bytes"]
                                       for s in shards),
            "docs_clean_bytes": sum(s["docs_clean_bytes"] for s in shards),
        }
        if agg["n_postings"]:
            agg["bytes_per_posting"] = round(
                agg["postings_file_bytes"] / agg["n_postings"], 3)
        print(json.dumps(agg))
        return 0
    print(json.dumps(_index_stats(args.index)))
    return 0


def cmd_invalidate(args) -> int:
    from search_engine_ray.build import invalidate_index

    invalidate_index(args.index)
    print(json.dumps({"invalidated": args.index}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="search_engine_ray.jobs")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--tokenizer", default="standard")
    b.add_argument("--num-buckets", type=int, default=64)
    b.add_argument("--salt", type=int, default=1)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--terms", nargs="+")
    q.add_argument("--text",
                   help="one-string query syntax (querystring.py): "
                        'quoted phrases, "..."~N near, mil* prefix, '
                        "m?la globs, /regex/, term~1/~2 fuzzy, "
                        "AND/OR/NOT, car|auto synonym groups, "
                        "field:value / field:lo..hi filters. "
                        "Mutually exclusive with --terms/--type.")
    q.add_argument("--type", default="exact",
                   choices=["exact", "or", "and", "prefix", "contains",
                            "wildcard", "regex", "fuzzy", "fuzzy2",
                            "phrase", "near", "suggest", "bool",
                            "synonym"])
    q.add_argument("--slop", type=int, default=8,
                   help="near type: same-line column window "
                        "(max - min <= slop over one position per term)")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--scorer", default="taat",
                   choices=["taat", "bmw", "auto"],
                   help="auto = block-max past the measured ~1M-doc "
                        "crossover, TAAT below (bit-identical results)")
    q.add_argument("--highlight", action="store_true",
                   help="emit matched lines + char spans per hit "
                        "(exact/or/and/prefix/contains/wildcard/regex/"
                        "fuzzy; local index only)")
    q.add_argument("--sharded", action="store_true",
                   help="--index is a doc-sharded root (sharded-build)")
    q.add_argument("--where", nargs="+", default=None, metavar="COL=VAL",
                   help="attribute equality filter(s), ANDed — filtered "
                        "top-k over docs_clean metadata (e.g. lang=en)")
    q.add_argument("--after", nargs=2, default=None,
                   metavar=("SCORE", "DOC_ID"),
                   help="cursor pagination: (score, doc_id) of the last "
                        "hit of the previous page; returns the next k")
    q.set_defaults(fn=cmd_query)

    cp = sub.add_parser("complete", help="df-ranked autocomplete: top-k "
                        "vocabulary terms with a prefix")
    cp.add_argument("--index", required=True)
    cp.add_argument("--prefix", required=True)
    cp.add_argument("-k", type=int, default=10)
    cp.add_argument("--sharded", action="store_true")
    cp.set_defaults(fn=cmd_complete)

    fc = sub.add_parser("facets", help="facet counts: distinct matching "
                        "docs per value of an attribute column, over the "
                        "query's full match set")
    fc.add_argument("--index", required=True)
    fc.add_argument("--terms", nargs="+", required=True)
    fc.add_argument("--type", default="or",
                    choices=["exact", "or", "and", "prefix", "contains",
                             "wildcard", "regex", "fuzzy", "fuzzy2"])
    fc.add_argument("--by", default="lang")
    fc.add_argument("--where", nargs="+", default=None, metavar="COL=VAL")
    fc.add_argument("--bins", default=None, metavar="E0,E1,...",
                    help="ascending edges -> numeric range facets over "
                         "--by (half-open [lo, hi) bins)")
    fc.add_argument("--sharded", action="store_true")
    fc.set_defaults(fn=cmd_facets)

    rm = sub.add_parser("remove", help="delete documents by url: "
                        "instantly query-invisible via the M8 "
                        "pending-deletes sidecar; --merge also runs the "
                        "physical postings merge now")
    rm.add_argument("--index", required=True)
    rm.add_argument("--urls", nargs="*", default=None)
    rm.add_argument("--urls-file", default=None)
    rm.add_argument("--merge", action="store_true")
    rm.set_defaults(fn=cmd_remove)

    d = sub.add_parser("delta")
    d.add_argument("--input", default=None)
    d.add_argument("--index", required=True)
    d.add_argument("--delete-urls-file", default=None)
    d.set_defaults(fn=cmd_delta)

    dr = sub.add_parser("dsir", help="DSIR importance resampling: select "
                        "k raw docs whose hashed-n-gram distribution "
                        "matches the holdout target slice (Xie 2023)")
    dr.add_argument("--input", required=True)
    dr.add_argument("--out", required=True)
    dr.add_argument("-k", type=int, required=True)
    dr.add_argument("--buckets", type=int, default=4096)
    dr.add_argument("--eval-mod", type=int, default=10)
    dr.add_argument("--eval-rem", type=int, default=7)
    dr.set_defaults(fn=cmd_dsir)

    dm = sub.add_parser("domains", help="URL-level curation over a pages "
                        "corpus: per-domain stats, domain blocklist "
                        "filter, per-domain page cap (RefinedWeb-style)")
    dm.add_argument("--input", required=True)
    dm.add_argument("--out", required=True)
    dm.add_argument("--stats", action="store_true")
    dm.add_argument("--block", help="file with one blocked domain/line")
    dm.add_argument("--cap", type=int,
                    help="keep at most K newest pages per domain")
    dm.set_defaults(fn=cmd_domains)

    tb = sub.add_parser("train-bpe", help="train BPE subword merges over "
                        "a documents corpus (one corpus pass + tiered "
                        "merge loop); writes (rank, left, right, "
                        "pair_count) parquet")
    tb.add_argument("--input", required=True,
                    help="documents parquet (text column)")
    tb.add_argument("--out", required=True, help="merge-table parquet path")
    tb.add_argument("-k", type=int, default=50, help="number of merges")
    tb.add_argument("--min-count", type=int, default=2)
    tb.add_argument("--tier", default="auto",
                    choices=["auto", "local", "distributed"])
    tb.set_defaults(fn=cmd_train_bpe)

    sy = sub.add_parser("sync", help="reconcile an index with a NEW full "
                        "page snapshot: metadata diff, then apply only "
                        "the changed slice (O(changed) tokenize; "
                        "byte-identical to a scratch build of the "
                        "snapshot; unchanged snapshot = no-op)")
    sy.add_argument("--index", required=True)
    sy.add_argument("--input", required=True,
                    help="full pages snapshot (parquet dir/file)")
    sy.set_defaults(fn=cmd_sync)

    fs = sub.add_parser("fsck", help="verify index artifact integrity "
                        "(structural; --deep adds full postings-decode "
                        "invariants incl. per-doc tf sums == doc_len)")
    fs.add_argument("--index", required=True)
    fs.add_argument("--deep", action="store_true")
    fs.set_defaults(fn=cmd_fsck)

    ml = sub.add_parser("mlt", help="more-like-this: top tf*idf terms of "
                        "a document as a disjunctive BM25 query")
    ml.add_argument("--index", required=True)
    g = ml.add_mutually_exclusive_group(required=True)
    g.add_argument("--url")
    g.add_argument("--doc-id", type=int)
    ml.add_argument("-k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=10)
    ml.set_defaults(fn=cmd_mlt)

    mg = sub.add_parser("merge", help="segment-merge two index snapshots "
                        "into a new index (no re-tokenization; byte-"
                        "identical to a scratch build over A+B pages)")
    mg.add_argument("--index-a", required=True)
    mg.add_argument("--index-b", required=True)
    mg.add_argument("more", nargs="*",
                    help="additional index roots (folded pairwise)")
    mg.add_argument("--out", required=True)
    mg.set_defaults(fn=cmd_merge)

    sb = sub.add_parser("sharded-build")
    sb.add_argument("--input", required=True)
    sb.add_argument("--root", required=True)
    sb.add_argument("--num-shards", type=int, required=True)
    sb.add_argument("--tokenizer", default="standard")
    sb.add_argument("--num-buckets", type=int, default=64)
    sb.add_argument("--no-positions", action="store_true")
    sb.add_argument("--no-resume", action="store_true")
    sb.set_defaults(fn=cmd_sharded_build)

    sd = sub.add_parser("sharded-delta")
    sd.add_argument("--input", default=None)
    sd.add_argument("--root", required=True)
    sd.add_argument("--delete-urls-file", default=None)
    sd.set_defaults(fn=cmd_sharded_delta)

    dd = sub.add_parser("dedup")
    dd.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text); embeddings "
                         "parquet (vec_id, embedding) for --method embedding")
    dd.add_argument("--out", required=True)
    dd.add_argument("--method", default="exact",
                    choices=["exact", "minhash", "simhash", "ngram",
                             "embedding", "semantic", "line", "spans"])
    dd.add_argument("--threshold", type=float, default=0.5)
    dd.add_argument("--n-clusters", type=int, default=16,
                    help="semantic method: k-means cluster count "
                         "(size ~ n_vectors / 10k at scale)")
    dd.add_argument("--window", type=int, default=50,
                    help="spans method: duplicated-substring window "
                         "length in tokens")
    dd.add_argument("--rewrite", action="store_true",
                    help="spans method: write the span-cut corpus "
                         "(keep one occurrence globally) instead of "
                         "the span report")
    dd.add_argument("--max-hamming", type=int, default=3)
    dd.add_argument("--exact", action="store_true",
                    help="embedding method: exact blocked all-pairs "
                         "(quadratic anchor) instead of LSH")
    dd.add_argument("--resolve", action="store_true",
                    help="pair methods: resolve pairs into clusters and "
                         "write clusters/ + the keep-one-per-cluster "
                         "kept/ corpus")
    dd.set_defaults(fn=cmd_dedup)

    ab = sub.add_parser("ann-build")
    ab.add_argument("--input", required=True,
                    help="embeddings parquet (vec_id, embedding)")
    ab.add_argument("--root", required=True)
    ab.add_argument("--n-centroids", type=int, default=16)
    ab.add_argument("--sample-size", type=int, default=10_000)
    ab.add_argument("--seed", type=int, default=17)
    ab.add_argument("--no-resume", action="store_true")
    ab.set_defaults(fn=cmd_ann_build)

    aq = sub.add_parser("ann-query")
    aq.add_argument("--root", required=True)
    aq.add_argument("--queries", required=True,
                    help="parquet of query vectors (vec_id, embedding)")
    aq.add_argument("-k", type=int, default=10)
    aq.add_argument("--n-probe", type=int, default=4)
    aq.set_defaults(fn=cmd_ann_query)

    em = sub.add_parser("embed", help="generate embeddings from document "
                        "text (hashed-ngram random-projection model, "
                        "actor-pool inference); writes (vec_id, embedding)")
    em.add_argument("--input", required=True,
                    help="parquet of (doc_id, text)")
    em.add_argument("--out", required=True)
    em.add_argument("--dim", type=int, default=64)
    em.add_argument("--seed", type=int, default=0)
    em.set_defaults(fn=cmd_embed)

    kj = sub.add_parser("knn-join", help="exact cosine kNN join: each "
                        "left vector's top-k right neighbors")
    kj.add_argument("--left", required=True,
                    help="parquet of (vec_id, embedding)")
    kj.add_argument("--right", default=None,
                    help="right-side parquet (default: --left, i.e. a "
                         "self kNN graph with self-matches dropped)")
    kj.add_argument("--out", required=True)
    kj.add_argument("-k", type=int, default=10)
    kj.add_argument("--self", action="store_true",
                    help="drop left_id == right_id matches")
    kj.set_defaults(fn=cmd_knn_join)

    ad = sub.add_parser("ann-delta")
    ad.add_argument("--root", required=True)
    ad.add_argument("--add", default=None,
                    help="parquet of vectors to add (vec_id, embedding)")
    ad.add_argument("--remove", default=None,
                    help="comma-separated vec_ids to remove")
    ad.set_defaults(fn=cmd_ann_delta)

    ig = sub.add_parser("ingest")
    ig.add_argument("--input", required=True,
                    help="dir (or file) of .jsonl / .jsonl.gz shards")
    ig.add_argument("--out", required=True,
                    help="output documents parquet root")
    ig.add_argument("--text-key", default="text")
    ig.add_argument("--n-shards", type=int, default=16)
    ig.set_defaults(fn=cmd_ingest)

    iw = sub.add_parser("ingest-warc", help="WARC crawl segments -> "
                        "shard-partitioned pages parquet (the build's "
                        "input layout)")
    iw.add_argument("--input", required=True,
                    help="dir (or file) of .warc / .warc.gz segments")
    iw.add_argument("--out", required=True)
    iw.add_argument("--n-shards", type=int, default=16)
    iw.set_defaults(fn=cmd_ingest_warc)

    cu = sub.add_parser("curate")
    cu.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text, ...)")
    cu.add_argument("--out", required=True)
    cu.add_argument("--min-tokens", type=int, default=20)
    cu.add_argument("--min-quality", type=float, default=0.5)
    cu.add_argument("--max-dup3", type=float, default=0.6)
    cu.add_argument("--eval-mod", type=int, default=10)
    cu.add_argument("--eval-rem", type=int, default=7)
    cu.add_argument("--ngram", type=int, default=8)
    cu.add_argument("--normalize", choices=["NFC", "NFKC", "NFD", "NFKD"],
                    help="unicode-normalize text before the gates (the "
                         "CCNet pre-pass; output text is normalized)")
    cu.set_defaults(fn=cmd_curate)

    mx = sub.add_parser("mix")
    mx.add_argument("--input", required=True,
                    help="documents parquet (doc_id, source, text)")
    mx.add_argument("--out", required=True)
    mx.add_argument("--budget", type=int, required=True,
                    help="total token budget of the mixed corpus")
    mx.add_argument("--bpe-merges", default=None,
                    help="trained BPE merge table (train-bpe output): "
                         "budget counts tokenizer PIECES instead of "
                         "regex words")
    mx.add_argument("--weights", required=True,
                    help="source shares, e.g. src0=0.5,src1=0.3,src2=0.2")
    mx.set_defaults(fn=cmd_mix)

    pr = sub.add_parser("prepare")
    pr.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text)")
    pr.add_argument("--out", required=True)
    pr.add_argument("--n-shards", type=int, default=8)
    pr.add_argument("--dsir-k", type=int, default=None,
                    help="optional DSIR stage: keep only the k most "
                         "target-like deduped survivors (models train "
                         "on the pre-filter input)")
    pr.add_argument("--dsir-buckets", type=int, default=4096)
    pr.add_argument("--no-resume", action="store_true",
                    help="rebuild the _stage_dedup checkpoint even if "
                         "complete")
    pr.set_defaults(fn=cmd_prepare)

    pf = sub.add_parser("profile")
    pf.add_argument("--input", required=True, help="any parquet path")
    pf.add_argument("--approx", action="store_true",
                    help="also report the HLL approx distinct count")
    pf.add_argument("--heavy-hitters", default=None, metavar="COLUMN",
                    help="report the approximate top-k most frequent "
                         "values of COLUMN (Count-Min Sketch)")
    pf.add_argument("-k", type=int, default=20)
    pf.set_defaults(fn=cmd_profile)

    ix = sub.add_parser("stats")
    ix.add_argument("--index", required=True,
                    help="index root (or sharded root with shard=*/)")
    ix.set_defaults(fn=cmd_stats)

    i = sub.add_parser("invalidate")
    i.add_argument("--index", required=True)
    i.set_defaults(fn=cmd_invalidate)

    args = p.parse_args(argv)
    _ensure_ray()
    try:
        return args.fn(args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
