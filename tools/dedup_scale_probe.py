"""Dedup-family scale probe (VERDICT r4 #4).

Runs minhash_pairs / ngram_jaccard_pairs / dup_spans / line_dedup at
10x the benched corpus size (default 500k docs vs the sf0.1 bench's
50k-page build shape / 5k-doc documents table) to confirm the
candidate-generation caps hold with no combinatorial cliff — the
BUCKET_CAP / prefix-filter / broadcast-cap constants were only ever
validated at bench scale.

Corpus synthesis is DETERMINISTIC and distributed: ``ray.data.range(n)
-> map_batches(gen) -> write_parquet`` where the text is a pure
function of doc_id (seeded per doc), so planted structure needs no
cross-batch state:

- ~2% of docs (id % 50 == 1) are near-copies of doc id-1 — a shared
  >=30-token prefix (flags in dup_spans, window 25) plus a mutated
  tail (lands in the 0.5-Jaccard band for minhash/ngram verify);
- ~30% of docs append one boilerplate line from a 1,000-line pool
  (corpus-global line_dedup work, first occurrence wins);
- everything else is vocab-sampled noise with id-salted rare tokens
  so unrelated docs do NOT collide.

Cap-hit accounting: every truncation in the dedup kernels is a
``logger.warning`` in the worker (grep the probe's stderr for
"truncated" / "capped"); this tool also prints output-row counts so a
candidate explosion would be visible as a row blowup even if logs are
dropped.

Usage (32-cpu probe, results land in BASELINE.md):
    python tools/dedup_scale_probe.py --n-docs 500000 \
        2> >(grep -c truncated >&2)
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data vector join customer the a index shard block codec token term "
    "posting bucket actor plasma arrow".split()
)
BOILERPLATE_POOL = 1000
NEAR_DUP_EVERY = 50          # id % 50 == 1 -> near-copy of id-1
SHARED_PREFIX_TOKENS = 32    # > dup_spans window (25)
SEED = 0x5EED


def _doc_tokens(doc_id: int) -> list[str]:
    """Base text of a doc as tokens — pure function of doc_id."""
    rng = np.random.default_rng((doc_id * 2654435761 + SEED) & 0xFFFFFFFF)
    n = int(rng.integers(40, 101))
    ix = rng.integers(0, len(VOCAB), size=n)
    toks = [VOCAB[i] for i in ix]
    # id-salted rare tokens so unrelated docs don't shingle-collide
    for slot in rng.integers(0, n, size=4):
        toks[int(slot)] = f"rare{doc_id}x{int(slot)}"
    return toks


def _doc_text(doc_id: int) -> str:
    if doc_id % NEAR_DUP_EVERY == 1 and doc_id > 0:
        base = _doc_tokens(doc_id - 1)
        rng = np.random.default_rng((doc_id * 11400714819323 + 7) % (1 << 32))
        toks = list(base)
        # mutate ~6% of the tail (keeps shingle Jaccard near 0.55-0.7,
        # inside the 0.5 verify band); keep a >=32-token shared prefix
        for slot in rng.integers(SHARED_PREFIX_TOKENS, len(toks),
                                 size=max(2, (len(toks) * 6) // 100)):
            toks[int(slot)] = f"mut{doc_id}x{int(slot)}"
    else:
        toks = _doc_tokens(doc_id)
        rng = np.random.default_rng((doc_id * 97 + 13) % (1 << 32))
    # line structure: break every ~12 tokens
    lines, cur = [], []
    for t in toks:
        cur.append(t)
        if len(cur) >= 12:
            lines.append(" ".join(cur))
            cur = []
    if cur:
        lines.append(" ".join(cur))
    if rng.integers(0, 10) < 3:  # ~30%: one shared boilerplate line
        b = int(rng.integers(0, BOILERPLATE_POOL))
        lines.append(f"boilerplate footer variant {b} all rights reserved")
    return "\n".join(lines)


def _gen_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_pylist()
    texts = [_doc_text(i) for i in ids]
    langs = ["en", "zh", "es", "fr", "de"]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([langs[i % 5] for i in ids], pa.string()),
        "source": pa.array([f"src{i % 20}" for i in ids], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def synthesize(out_dir: str, n_docs: int) -> None:
    import ray.data as rd
    tgt = os.path.join(out_dir, "documents.parquet")
    shutil.rmtree(tgt, ignore_errors=True)
    (rd.range(n_docs)
       .map_batches(_gen_batch, batch_format="pyarrow", batch_size=8192)
       .write_parquet(tgt))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--out", default="/dev/shm/graft_bench/dedup_scale")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--pipelines",
                    default="minhash,ngram,spans,line")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    from search_engine_ray.pipelines import documents as d

    # host stamp: one single-threaded calibration kernel (same one
    # bench.py normalizes with) so a degraded hypervisor window is
    # visible in the record — on this VM identical runs swing 2-3x
    from bench import _calib_kernel
    t0 = time.monotonic()
    _calib_kernel(1)
    calib_s = time.monotonic() - t0

    os.makedirs(args.out, exist_ok=True)
    t0 = time.monotonic()
    synthesize(args.out, args.n_docs)
    gen_s = time.monotonic() - t0

    runs = {
        "minhash": d.minhash_pairs,
        "ngram": d.ngram_jaccard_pairs,
        "spans": d.dup_spans_docs,
        "line": d.line_dedup_docs,
        "simhash": d.simhash_pairs,
        "clusters": d.near_dup_clusters_docs,
    }
    out = {"n_docs": args.n_docs, "num_cpus": args.num_cpus,
           "gen_s": round(gen_s, 2), "calib_s": round(calib_s, 2),
           "pipelines": {}}
    for name in args.pipelines.split(","):
        fn = runs[name.strip()]
        t0 = time.monotonic()
        rows = fn(args.out).count()
        dt = time.monotonic() - t0
        out["pipelines"][name] = {
            "wall_s": round(dt, 2),
            "rows_out": int(rows),
            "docs_per_s": round(args.n_docs / dt, 1),
        }
        print(f"[{name}] {dt:.2f} s, {rows} rows out, "
              f"{args.n_docs / dt:,.0f} docs/s", flush=True)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
