"""Benchmark harness (driver contract).

Headline: full-fidelity inverted-index build (positions on) over the
deterministic synthetic pages corpus + BM25 query latency, plus the
sf-dir pipelines (dedup, df, ANN, windows) as secondary timed queries.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-section sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "bm25_p50_ms": ..., "bm25_p95_ms": ...}

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default sf0.1),
BENCH_PAGES (default 20000 synthetic pages).

``--scaling``: runs the SAME benchmark in fresh processes at num_cpus=N and
num_cpus=4N (default 2 vs 8; BENCH_SCALE_LO/HI) on identical input and
reports both index-build throughputs and the scaling efficiency
(thr_hi/thr_lo)/4 — the sandbox substitution for the north rule's
two-cluster-size criterion (no real multi-node cluster here). N=2 vs 8 is
used because this VM's raw CPU scaling tops out at 3.88x for 2->8 but only
3.1x for 8->32 (SMT/steal) — the criterion measures the ENGINE's scaling,
so the pair with the cleanest hardware ceiling is the honest probe.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

# Route Ray Data worker logging through our config (silences the benign
# per-worker "Failed to hash the schemas" warning the pandas-metadata
# testdata schemas trigger — see search_engine_ray/ray_data_logging.yaml).
# Must be set before ray.init so raylet-spawned workers inherit it.
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "search_engine_ray", "ray_data_logging.yaml"))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "50000"))
# ~250 words/page (realistic web-page order of magnitude) so the benchmark
# is compute-dominated rather than scheduling-dominated
WORDS = (100, 400)
# bench working set lives on tmpfs: on a real cluster every node brings its
# own disks (storage bandwidth scales with N); a single box's one disk does
# not, so tmpfs emulates per-node storage for the scaling criterion
BENCH_DIR = os.environ.get("BENCH_DIR", "/dev/shm/graft_bench")
PAGES_DIR = f"{BENCH_DIR}/pages_{N_PAGES}_w{WORDS[0]}_{WORDS[1]}"
SCALE_LO = int(os.environ.get("BENCH_SCALE_LO", "2"))
SCALE_HI = int(os.environ.get("BENCH_SCALE_HI", "8"))


def _ensure_corpus() -> str:
    """Generate the corpus once (parallel ray tasks, deterministic: each
    chunk has its own seed + url namespace), cache in /tmp."""
    import ray

    marker = os.path.join(PAGES_DIR, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(PAGES_DIR, ignore_errors=True)
        os.makedirs(PAGES_DIR, exist_ok=True)

        @ray.remote
        def gen_chunk(i: int, n: int) -> str:
            import pyarrow.parquet as pq

            from search_engine_ray.corpus import generate_pages

            t = generate_pages(n, seed=42 + i, split=f"bench{i:03d}",
                               words_per_doc=WORDS, include_parity=(i == 0))
            path = os.path.join(PAGES_DIR, f"pages-{i:05d}.parquet")
            pq.write_table(t, path, row_group_size=4096)
            return path

        chunk = 5000
        n_chunks = (N_PAGES + chunk - 1) // chunk
        sizes = [min(chunk, N_PAGES - i * chunk) for i in range(n_chunks)]
        ray.get([gen_chunk.remote(i, s) for i, s in enumerate(sizes)])
        open(marker, "w").write("ok")
    # warm the page cache so both scaling runs measure compute, not disk
    for root, _, files in os.walk(PAGES_DIR):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass
    return PAGES_DIR


def _query_set(searcher, n_terms: int = 30):
    """Deterministic query mix: head/mid/rare exact, prefixes, ORs."""
    terms = []
    for b in range(searcher.num_buckets):
        bk = searcher.bucket(b)
        for i in range(0, len(bk.terms), max(1, len(bk.terms) // 4)):
            terms.append((bk.terms[i], int(bk.df[i])))
    terms.sort(key=lambda t: (-t[1], t[0]))
    heads = [t for t, _ in terms[:10]]
    mids = [t for t, _ in terms[len(terms) // 2:len(terms) // 2 + 10]]
    rare = [t for t, _ in terms[-10:]]
    qs = [([t], "exact") for t in (heads + mids + rare)[:n_terms]]
    qs += [(heads[:3], "or"), (mids[:4], "or")]
    qs += [([p[:3]], "prefix") for p in heads[:5]]
    return qs


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from search_engine_ray.build import BuildConfig, build_index
    from search_engine_ray.search import LocalSearcher

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # untimed warmup: spawn the worker pool and import the library in every
    # worker so the timed sections measure compute, not process cold-start
    import ray.data as rd

    from search_engine_ray.stages.tokenize import TokenizeBatch

    rd.range(NUM_CPUS * 2).map_batches(
        lambda b: __import__("search_engine_ray") and b,
        batch_size=1, num_cpus=1,
    ).count()
    TokenizeBatch()  # compile regexes on the driver too

    # scaling mode runs its own dedicated calibration subprocesses
    if not os.environ.get("BENCH_SKIP_SECONDARY"):
        extras["calib_tasks_per_sec"] = _stamp_clean_window(NUM_CPUS,
                                                            extras)

    pages = _ensure_corpus()
    index_root = f"{BENCH_DIR}/index_{NUM_CPUS}"

    # untimed warm build: page-fault / first-touch costs on this VM are
    # large and noisy; the timed runs below measure steady-state compute
    if os.environ.get("BENCH_WARM_BUILD", "1") == "1":
        shutil.rmtree(index_root, ignore_errors=True)
        build_index(pages, index_root,
                    BuildConfig(num_buckets=128, dedup_buckets=64,
                                batch_size=512))

    # --- headline: index build, best-of-N --------------------------------
    # hypervisor steal on this box is additive and bursty (identical runs
    # vary 2-3x within an hour); the MIN of N fresh builds measures the
    # engine, a single draw measures the host's mood
    build_reps = int(os.environ.get("BENCH_BUILD_REPS", "2"))
    t_build, m = None, None
    all_builds = []
    for _ in range(build_reps):
        shutil.rmtree(index_root, ignore_errors=True)
        t0 = time.monotonic()
        mi = build_index(
            pages, index_root,
            BuildConfig(num_buckets=128, dedup_buckets=64, batch_size=512),
        )
        dt = time.monotonic() - t0
        all_builds.append(round(dt, 3))
        if t_build is None or dt < t_build:
            t_build, m = dt, mi
    queries["index_build"] = round(t_build, 3)
    extras["index_build_all"] = all_builds
    extras["docs_per_sec"] = round(m["n_docs"] / t_build, 1)
    extras["n_docs"] = m["n_docs"]

    # --- BM25 query latency ----------------------------------------------
    # cold and warm are separate distributions (r2's pooled p95 mixed
    # first-touch bucket loads + VM steal into the warm tail): the first
    # pass is reported as bm25_cold_*, the steady state as per-query
    # MIN over 3 warm reps (additive-noise-robust, same best-of-N
    # methodology as BASELINE.md's build timings).
    s = LocalSearcher(index_root)
    qs = _query_set(s)
    cold = []
    for q, st in qs:  # first touch: bucket file loads happen here
        tq = time.monotonic()
        s.search(q, st, k=10, with_urls=False)
        cold.append((time.monotonic() - tq) * 1000)
    extras["bm25_cold_p50_ms"] = round(float(np.percentile(cold, 50)), 3)
    extras["bm25_cold_p95_ms"] = round(float(np.percentile(cold, 95)), 3)
    lat = np.full((3, len(qs)), np.inf)
    t0 = time.monotonic()
    for rep in range(3):
        for i, (q, st) in enumerate(qs):
            tq = time.monotonic()
            s.search(q, st, k=10, with_urls=False)
            lat[rep, i] = (time.monotonic() - tq) * 1000
    queries["bm25_queries"] = round(time.monotonic() - t0, 3)
    per_query = lat.min(axis=0)
    extras["bm25_p50_ms"] = round(float(np.percentile(per_query, 50)), 3)
    extras["bm25_p95_ms"] = round(float(np.percentile(per_query, 95)), 3)

    # --- session-3 query features: filtered / paged / facets / complete --
    # warm per-op latencies; the attrs column loads once (untimed, like
    # every other once-per-searcher artifact)
    head_q = qs[0][0]
    s.search(head_q, "or", k=10, where={"lang": "en"}, with_urls=False)
    _p1 = s.search(head_q, "or", k=10, with_urls=False)
    cursor = ((_p1.column("score")[-1].as_py(),
               _p1.column("doc_id")[-1].as_py())
              if _p1.num_rows else (0.0, 0))
    for name, fn in (
        ("bm25_filtered_p50_ms",
         lambda: s.search(head_q, "or", k=10, where={"lang": "en"},
                          with_urls=False)),
        ("bm25_range_p50_ms",
         lambda: s.search(head_q, "or", k=10,
                          where={"doc_len": (50, 400)}, with_urls=False)),
        ("facets_p50_ms", lambda: s.facet_counts(head_q, "or", by="lang")),
        ("search_after_p50_ms",
         lambda: s.search(head_q, "or", k=10,
                          search_after=cursor, with_urls=False)),
        ("complete_p50_ms", lambda: s.complete("c", k=10)),
    ):
        fn()  # warm
        flat = []
        for _ in range(9):
            tq = time.monotonic()
            fn()
            flat.append((time.monotonic() - tq) * 1000)
        extras[name] = round(float(np.percentile(flat, 50)), 3)

    # --- scorer comparison: TAAT (default) vs block-max WAND -------------
    # same disjunctive query subset under both scorers; documents WHY taat
    # is the default (see search.py docstring: in-memory postings favour
    # vectorized TAAT; BMW's block skips pay off on disk-resident postings)
    or_qs = [(q, st) for q, st in qs if st == "or"] or qs[:3]
    for scorer in ("taat", "bmw"):
        for q, st in or_qs:  # warm
            s.search(q, st, k=10, scorer=scorer, with_urls=False)
        slat = []
        for _ in range(3):
            for q, st in or_qs:
                tq = time.monotonic()
                s.search(q, st, k=10, scorer=scorer, with_urls=False)
                slat.append((time.monotonic() - tq) * 1000)
        extras[f"scorer_{scorer}_p50_ms"] = round(
            float(np.percentile(slat, 50)), 3)

    # --- concurrent serving throughput (QPS through the replica pool) ----
    # the in-process latencies above measure ONE searcher; a cluster
    # serves through serve.SearcherReplicaPool — pipeline 4x the query
    # set through R replicas and report aggregate QPS (warm, best-of-3)
    if not os.environ.get("BENCH_SKIP_SECONDARY"):
        from search_engine_ray.serve import SearcherReplicaPool

        n_rep = max(2, min(8, NUM_CPUS // 4))
        pool = SearcherReplicaPool(index_root, num_replicas=n_rep)
        serve_qs = [(q, st) for q, st in qs for _ in range(4)]
        pool.search(["warm"], "exact", 10)  # actor spin-up untimed
        refs = [pool.search_async(q, st, 10) for q, st in serve_qs]
        ray.get(refs)  # warm every replica's caches
        # serve_lb_*: completion-driven dispatch (search_stream, r5 —
        # bounded in-flight per replica, next request to the replica
        # that just freed = a closed-loop load balancer). Latency is
        # DISPATCH-to-completion (on_dispatch stamp), i.e. service +
        # bounded replica queue — the number a client behind this
        # balancer sees; yield_refs skips per-completion ray.get so the
        # dispatch loop keeps replicas saturated (the rr path below
        # never gets results either).
        def run_stream(reqs, window, drain):
            best = None
            lat_ms: list[float] = []
            for _ in range(3):
                disp: dict[int, float] = {}
                run = []
                t0 = time.monotonic()
                for ix, _ref in pool.search_stream(
                        reqs, k=10, yield_refs=True, window=window,
                        drain=drain,
                        on_dispatch=lambda i: disp.__setitem__(
                            i, time.monotonic())):
                    run.append((time.monotonic() - disp[ix]) * 1000)
                dt = time.monotonic() - t0
                if best is None or dt < best:
                    best, lat_ms = dt, run
            return best, lat_ms

        best, lat_ms = run_stream(serve_qs, window=4, drain=8)
        extras["serve_replicas"] = n_rep
        extras["serve_lb_qps"] = round(len(serve_qs) / best, 1)
        extras["serve_lb_p50_ms"] = round(
            float(np.percentile(lat_ms, 50)), 3)
        extras["serve_lb_p95_ms"] = round(
            float(np.percentile(lat_ms, 95)), 3)
        # homogeneous load isolates the SCHEDULER's tail (one mid-cost
        # OR query): the mixed-load p95/p50 above also carries genuine
        # per-type service variance (fuzzy/contains cost more than
        # exact), which no dispatcher can remove
        homog = [next(p for p in qs if p[1] == "or")] * len(serve_qs)
        hbest, hlat = run_stream(homog, window=4, drain=8)
        extras["serve_homog_p50_ms"] = round(
            float(np.percentile(hlat, 50)), 3)
        extras["serve_homog_p95_ms"] = round(
            float(np.percentile(hlat, 95)), 3)
        # serve_qps / serve_p50/p95: the r1-r4 round-robin burst, kept
        # under the SAME keys for round-over-round comparability.
        # NOTE latency semantics: these run from burst t0 and so include
        # the FULL depth-n actor queue — the burst's completion profile.
        # The serve_lb_* numbers above are per-request service latency
        # through the bounded dispatcher; compare p95s across rounds in
        # BASELINE with that caveat.
        rr_best = None
        rr_lat: list[float] = []
        for _ in range(3):
            t0 = time.monotonic()
            run = []
            pend = {pool.search_async(q, st, 10): t0 for q, st in serve_qs}
            refs = list(pend)
            while refs:
                done, refs = ray.wait(refs, num_returns=1)
                run.append((time.monotonic() - pend[done[0]]) * 1000)
            dt = time.monotonic() - t0
            if rr_best is None or dt < rr_best:
                rr_best, rr_lat = dt, run
        extras["serve_qps"] = round(len(serve_qs) / rr_best, 1)
        extras["serve_p50_ms"] = round(float(np.percentile(rr_lat, 50)), 3)
        extras["serve_p95_ms"] = round(float(np.percentile(rr_lat, 95)), 3)

    # --- secondary pipelines over the sf dir -----------------------------
    if os.environ.get("BENCH_SKIP_SECONDARY"):
        ray.shutdown()
        total = round(sum(queries.values()), 3)
        return {
            "metric": "index-build + BM25 query wall time",
            "value": total, "unit": "sec", "queries": queries,
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "num_cpus": NUM_CPUS, **extras,
        }
    from search_engine_ray.pipelines import documents as d
    from search_engine_ray.pipelines import embeddings as e
    from search_engine_ray.pipelines import events as ev

    sec_reps = int(os.environ.get("BENCH_SECONDARY_REPS", "2"))

    def timed(name, fn):
        # best-of-N, like the build: single draws on this VM swing 2-3x
        # under hypervisor steal and would read as pipeline regressions
        best = None
        for _ in range(sec_reps):
            t0 = time.monotonic()
            res = fn(SF_DIR)
            # consume (count) to force full execution of lazy datasets
            if hasattr(res, "count"):
                res.count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)

    timed("dedup_exact", d.dedup_exact_docs)
    timed("term_df_top100", d.term_df_top100)
    timed("minhash_pairs", d.minhash_pairs)
    timed("ngram_jaccard_pairs", d.ngram_jaccard_pairs)
    timed("ann_topk", e.ann_bruteforce_topk)
    timed("events_hourly", ev.events_hourly_user)
    timed("line_dedup", d.line_dedup_docs)          # 2-exchange transform
    timed("dup_spans", d.dup_spans_docs)            # substring-level dedup
    timed("orders_by_nation", __import__(
        "search_engine_ray.pipelines.relational",
        fromlist=["orders_by_nation"]).orders_by_nation)  # hash join

    # --- paired A/B: fused corpus_filter vs the pre-fusion composition ----
    # (r4: the composite gate reads 100% of the corpus; the fused pass
    # tokenizes each doc once instead of ~5x — bit-identical decisions)
    timed("corpus_filter", d.corpus_filter_docs)

    def composed_filter(sf):
        from search_engine_ray.functions.webtext import (
            CorpusFilterComposedBatch,
            eval_shingle_set,
        )
        from search_engine_ray.pipelines.documents import load_documents

        dset = load_documents(sf)
        ev_ref = ray.put(eval_shingle_set(dset))
        # same execution style as the fused path (warm-task cached
        # stage) so the pipeline A/B isolates kernel fusion, not actor
        # spawn cost
        from search_engine_ray.pool import cached_stage

        return dset.map_batches(
            cached_stage(CorpusFilterComposedBatch, ev_ref),
            batch_format="pyarrow", batch_size=1024)

    timed("corpus_filter_composed", composed_filter)

    # kernel-level A/B on ONE in-process batch (pipeline wall time at
    # sandbox scale is Ray fixed-cost-dominated; the fusion win is CPU)
    from search_engine_ray.functions.webtext import (
        CorpusFilterBatch,
        CorpusFilterComposedBatch as _CFC,
        eval_shingle_set,
    )
    from search_engine_ray.pipelines.documents import load_documents

    _docs = load_documents(SF_DIR)
    _ev = ray.put(eval_shingle_set(_docs))
    _fb = _docs.take_batch(2000, batch_format="pyarrow")
    for name, inst in (("corpus_filter_kernel_fused_s",
                        CorpusFilterBatch(_ev)),
                       ("corpus_filter_kernel_composed_s", _CFC(_ev))):
        inst(_fb)  # warm
        kbest = None
        for _ in range(3):
            t0 = time.monotonic()
            inst(_fb)
            kdt = time.monotonic() - t0
            kbest = kdt if kbest is None else min(kbest, kdt)
        extras[name] = round(kbest, 3)

    # --- paired A/B: dup-spans emit kernel, rolling vs per-window md5 -----
    # (r4: in-process on one deterministic ~300k-window batch — the
    # rolling polynomial fingerprint replaced r3's per-window Python md5)
    import pyarrow as _pa

    from search_engine_ray.functions.dedup import (
        RollingWindowHashBatch,
        WindowHashBatch,
    )

    rng = np.random.default_rng(1)
    vocab = [f"tok{i}" for i in range(5000)]
    ktexts = [" ".join(vocab[i] for i in rng.integers(0, 5000, size=300))
              for _ in range(1000)]
    kb = _pa.table({"doc_id": _pa.array(range(len(ktexts)), _pa.int64()),
                    "text": _pa.array(ktexts)})
    for name, cls in (("dup_spans_emit_md5_s", WindowHashBatch),
                      ("dup_spans_emit_rolling_s", RollingWindowHashBatch)):
        inst = cls(25, 64)
        inst(kb)  # warm: token-hash memo / power tables
        kbest = None
        for _ in range(3):
            t0 = time.monotonic()
            inst(kb)
            kdt = time.monotonic() - t0
            kbest = kdt if kbest is None else min(kbest, kdt)
        extras[name] = round(kbest, 3)

    # --- paired A/B: ngram pairgen kernel, 2-group-vectorized vs loop ----
    # (r5: size-2 prefix groups — the overwhelming case, random shingle
    # collisions — emit in ONE vectorized pass; the per-group Python
    # loop only touches cnt >= 3. Same partition shape the map_groups
    # stage sees; filters identical, pair set identical by test.)
    from search_engine_ray.functions.dedup import _prefix_bucket_pairs

    def _legacy_pairgen(g, threshold=0.5):  # pre-r5 per-group loop
        sub = (g[["px", "doc_id", "n_sh", "pos"]]
               .drop_duplicates(["px", "doc_id"]).sort_values(
                   ["px", "doc_id"]))
        gpx = sub["px"].to_numpy()
        docs = sub["doc_id"].to_numpy(np.int64)
        ns = sub["n_sh"].to_numpy(np.int64)
        ps = sub["pos"].to_numpy(np.int64)
        a, b = [], []
        if gpx.size:
            bounds = np.flatnonzero(np.r_[True, gpx[1:] != gpx[:-1], True])
            memo = {}
            for s, e in zip(bounds[:-1], bounds[1:]):
                cnt = e - s
                if cnt < 2:
                    continue
                if cnt not in memo:
                    memo[cnt] = np.triu_indices(cnt, k=1)
                ia, ib = memo[cnt]
                na, nb = ns[s:e][ia], ns[s:e][ib]
                keep = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
                pa_, pb_ = ps[s:e][ia], ps[s:e][ib]
                ub = 1 + np.minimum(na - pa_ - 1, nb - pb_ - 1)
                al = np.ceil(threshold * (na + nb) / (1.0 + threshold)
                             - 1e-9)
                keep &= ub >= al
                a.append(docs[s:e][ia[keep]])
                b.append(docs[s:e][ib[keep]])
        import pandas as _pd2
        av = np.concatenate(a) if a else np.empty(0, np.int64)
        bv = np.concatenate(b) if b else np.empty(0, np.int64)
        return _pd2.DataFrame({"doc_a": _pd2.Series(av, dtype="int64"),
                               "doc_b": _pd2.Series(bv, dtype="int64")})

    rng3 = np.random.default_rng(3)
    gsizes = rng3.choice([1, 2, 3, 5], size=100_000,
                         p=[0.55, 0.4, 0.04, 0.01])
    gpx = np.repeat(np.arange(100_000, dtype=np.int64), gsizes)
    import pandas as _pd3
    pg = _pd3.DataFrame({
        "px": gpx,
        "doc_id": rng3.integers(0, 1 << 60, gpx.size).astype("int64"),
        "n_sh": rng3.integers(40, 120, gpx.size).astype("int64"),
        "pos": rng3.integers(0, 40, gpx.size).astype("int64"),
    })
    for name, fn in (("ngram_pairgen_loop_s", _legacy_pairgen),
                     ("ngram_pairgen_vec_s", _prefix_bucket_pairs)):
        fn(pg, 0.5)  # warm
        kbest = None
        for _ in range(3):
            t0 = time.monotonic()
            fn(pg, 0.5)
            kdt = time.monotonic() - t0
            kbest = kdt if kbest is None else min(kbest, kdt)
        extras[name] = round(kbest, 3)

    # --- paired A/B: line_dedup reassembly kernel, vectorized vs r4 loop --
    # (r5, VERDICT r4 #3: compiled-regex split + flat-numpy flatten /
    # packed-key np.isin / bincount replaced the per-doc Python loop
    # probing a per-line set. Same in-process bucket shape the
    # map_groups stage sees: docs tagged line_no=-1 UNION
    # (doc_id, line_no) removal pairs.)
    import pandas as _pd

    from search_engine_ray.functions.webtext import (
        _LINE_SPLIT,
        _line_reassemble,
    )

    def _legacy_reassemble(g):  # r4 kernel, verbatim (fdf5a32)
        docs = g[g["line_no"] == -1]
        rem = g[g["line_no"] >= 0]
        rem_map = {d: set(v.tolist()) for d, v in
                   rem.groupby("doc_id")["line_no"]}
        rows = []
        for d, t in zip(docs["doc_id"], docs["text"]):
            lines = _LINE_SPLIT.split(t) if t else []
            drop = rem_map.get(d, ())
            kept = [ln for i, ln in enumerate(lines, start=1)
                    if i not in drop]
            rows.append((d, "\n".join(kept), len(kept),
                         len(lines) - len(kept)))
        return _pd.DataFrame(rows, columns=[
            "doc_id", "clean_text", "n_lines_kept", "n_lines_removed"])

    # deterministic bucket: 4000 docs x 30 lines, half the lines drawn
    # from a small shared pool (dup-heavy, like boilerplate), first
    # occurrence wins -> removal pairs for every later occurrence
    rng2 = np.random.default_rng(7)
    pool = [f"boilerplate line {i}" for i in range(500)]
    ldocs, lrem_d, lrem_n = [], [], []
    seen: dict = {}
    for did in range(4000):
        lines = []
        for ln_no in range(1, 31):
            if rng2.integers(0, 2):
                ln = pool[int(rng2.integers(0, 500))]
            else:
                ln = f"unique {did} {ln_no} {int(rng2.integers(0, 1 << 30))}"
            lines.append(ln)
            if ln in seen:
                lrem_d.append(did)
                lrem_n.append(ln_no)
            else:
                seen[ln] = (did, ln_no)
        ldocs.append("\n".join(lines))
    lg = _pd.concat([
        _pd.DataFrame({"doc_id": _pd.array(range(4000), dtype="int64"),
                       "line_no": -1, "text": ldocs}),
        _pd.DataFrame({"doc_id": _pd.array(lrem_d, dtype="int64"),
                       "line_no": _pd.array(lrem_n, dtype="int64"),
                       "text": ""}),
    ], ignore_index=True)
    for name, fn in (("line_dedup_kernel_loop_s", _legacy_reassemble),
                     ("line_dedup_kernel_vec_s", _line_reassemble)):
        fn(lg)  # warm
        kbest = None
        for _ in range(3):
            t0 = time.monotonic()
            fn(lg)
            kdt = time.monotonic() - t0
            kbest = kdt if kbest is None else min(kbest, kdt)
        extras[name] = round(kbest, 3)

    ray.shutdown()
    total = round(sum(queries.values()), 3)
    return {
        "metric": "index-build + BM25 query + data-pipeline wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": NUM_CPUS,
        **extras,
    }


def _calib_kernel(seed: int) -> int:
    """Mimics the build's work mix: Python-regex tokenization (the
    tokenize stage) + int64 lexsort/cumsum (the encode stage). A
    purely bandwidth-bound kernel would understate the ceiling and
    flatter the engine; a purely CPU-bound one would overstate it."""
    import re

    rng = np.random.default_rng(seed)
    words = ["w%04d" % w for w in rng.integers(0, 9999, size=150_000)]
    text = " ".join(words)
    pat = re.compile(r"[^ .,:;()\[\]/-]+")
    out = 0
    for _ in range(3):
        out ^= len(pat.findall(text))
    a = rng.integers(0, 1 << 40, size=2_000_000).astype(np.int64)
    b = rng.integers(0, 1000, size=2_000_000).astype(np.int64)
    for _ in range(2):
        order = np.lexsort((b, a))
        out ^= int(np.cumsum(a[order])[-1])
    return out


CALIB_FLOOR = float(os.environ.get("BENCH_CALIB_FLOOR", "6.1"))


def _stamp_clean_window(ncpu: int, extras: dict) -> float:
    """Clean-window discipline (r4): BENCH_r03 landed in a degraded host
    window (calib 5.13 tasks/s vs the 8.3-8.74 clean-window baseline in
    BASELINE.md), making every secondary read as regressed. When the
    in-session stamp is below ~70% of the session calibration max
    (floor 6.1, override BENCH_CALIB_FLOOR), pause and re-stamp up to
    BENCH_CALIB_RETRIES times so the timed sections start in a clean
    window; ALL stamps are recorded so a still-degraded run is visible,
    never silent."""
    stamps = [_host_stamp(ncpu)]
    retries = int(os.environ.get("BENCH_CALIB_RETRIES", "3"))
    wait_s = int(os.environ.get("BENCH_CALIB_WAIT_S", "45"))
    # the floor is calibrated for the 32-cpu driver shape; smaller
    # sessions have a lower natural ceiling, so only stamp there
    while (ncpu >= 16 and stamps[-1] < CALIB_FLOOR
           and len(stamps) <= retries):
        time.sleep(wait_s)
        stamps.append(_host_stamp(ncpu))
    extras["calib_stamps"] = stamps
    return stamps[-1]


def _host_stamp(ncpu: int) -> float:
    """In-session host-state stamp: tasks/sec of the no-engine calibration
    kernel in the CURRENT Ray session. Recorded in every bench JSON so a
    cross-round comparison can normalize out the VM's 2-3x hour-to-hour
    hypervisor-steal swings."""
    import ray

    kernel = ray.remote(_calib_kernel)
    ray.get([kernel.remote(i) for i in range(min(4, ncpu))])  # warm
    n_tasks = ncpu * 2
    t0 = time.monotonic()
    ray.get([kernel.remote(100 + i) for i in range(n_tasks)])
    return round(n_tasks / (time.monotonic() - t0), 2)


def run_calibration(ncpu: int) -> dict:
    """Raw VM task-throughput ceiling at ``ncpu``: identical CPU-bound
    numpy kernels (lexsort + cumsum — the engine's hot ops) as plain Ray
    tasks, NO engine code. The engine's scaling efficiency is then
    normalized by this hardware ceiling: on this VM SMT + hypervisor steal
    cap raw multiprocess scaling well below ideal before any engine code
    runs (8->32 raw ~3.1x, not 4x)."""
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    kernel = ray.remote(_calib_kernel)
    ray.get([kernel.remote(i) for i in range(min(4, ncpu))])  # warm
    n_tasks = ncpu * 4
    t0 = time.monotonic()
    ray.get([kernel.remote(100 + i) for i in range(n_tasks)])
    dt = time.monotonic() - t0
    ray.shutdown()
    return {"cpus": ncpu, "tasks": n_tasks,
            "tasks_per_sec": round(n_tasks / dt, 2)}


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=N vs 4N, identical input.

    Uses its own (larger) corpus size: the criterion needs the build to be
    compute-dominated at BOTH levels, so fixed per-stage costs (barriers,
    commits, metadata) don't masquerade as poor scaling."""
    scale_pages = int(os.environ.get("BENCH_SCALE_PAGES", "500000"))
    global N_PAGES, PAGES_DIR
    N_PAGES = scale_pages
    PAGES_DIR = f"{BENCH_DIR}/pages_{N_PAGES}_w{WORDS[0]}_{WORDS[1]}"
    # pre-generate the shared corpus at full parallelism so neither timed
    # subprocess pays the generation cost
    if not os.path.exists(os.path.join(PAGES_DIR, ".complete")):
        import ray

        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        _ensure_corpus()
        ray.shutdown()

    def one(ncpu: int, calibrate: bool = False) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENCH_PAGES=str(N_PAGES), BENCH_SKIP_SECONDARY="1",
                   # best-of-N happens at the invocation level here
                   BENCH_BUILD_REPS="1")
        args = [sys.executable, os.path.abspath(__file__)]
        if calibrate:
            args += ["--calibrate", str(ncpu)]
        out = subprocess.run(
            args, env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = SCALE_LO, SCALE_HI
    reps = int(os.environ.get("BENCH_SCALE_REPS", "2"))
    # best-of-N per level: hypervisor steal / page-cache noise on this VM is
    # strictly additive, so the min measures the machine's capability
    # (same rationale as timeit). Alternate levels to decorrelate drift.
    # INTERLEAVE engine and calibration runs (lo-engine, lo-calib,
    # hi-engine, hi-calib, repeat): the no-engine ceiling must sample the
    # SAME host windows as the engine it normalizes — a calibration block
    # run after all engine runs measures a different steal regime when
    # the host drifts mid-campaign (observed: ceiling off by 2x between
    # draws), which corrupts the normalized ratio in either direction.
    runs_lo, runs_hi, cals_lo, cals_hi = [], [], [], []
    for _ in range(reps):
        runs_lo.append(one(lo))
        cals_lo.append(one(lo, calibrate=True))
        runs_hi.append(one(hi))
        cals_hi.append(one(hi, calibrate=True))
    r_lo = min(runs_lo, key=lambda r: r["queries"]["index_build"])
    r_hi = min(runs_hi, key=lambda r: r["queries"]["index_build"])
    thr_lo = r_lo["docs_per_sec"]
    thr_hi = r_hi["docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    cal_lo = max(cals_lo, key=lambda c: c["tasks_per_sec"])
    cal_hi = max(cals_hi, key=lambda c: c["tasks_per_sec"])
    cal_speedup = cal_hi["tasks_per_sec"] / cal_lo["tasks_per_sec"]
    return {
        "metric": "index-build scaling efficiency (N vs 4N cpus)",
        "cpus_lo": lo, "cpus_hi": hi,
        "docs_per_sec_lo": thr_lo, "docs_per_sec_hi": thr_hi,
        "sec_lo": r_lo["queries"]["index_build"],
        "sec_hi": r_hi["queries"]["index_build"],
        "all_sec_lo": [r["queries"]["index_build"] for r in runs_lo],
        "all_sec_hi": [r["queries"]["index_build"] for r in runs_hi],
        "scaling_efficiency": round(eff, 3),
        "calib_tasks_per_sec_lo": cal_lo["tasks_per_sec"],
        "calib_tasks_per_sec_hi": cal_hi["tasks_per_sec"],
        "calib_speedup": round(cal_speedup, 3),
        "calib_ceiling_efficiency": round(cal_speedup / (hi / lo), 3),
        "scaling_efficiency_vs_ceiling": round(
            (thr_hi / thr_lo) / cal_speedup, 3),
        "n_docs": r_lo.get("n_docs"),
    }


if __name__ == "__main__":
    if "--calibrate" in sys.argv:
        n = int(sys.argv[sys.argv.index("--calibrate") + 1])
        print(json.dumps(run_calibration(n)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
