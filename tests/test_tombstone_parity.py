"""Tombstone rank-identity sweep (M8 under the grand-parity lens).

The M8 existence filter masks dead docs BEFORE top-k selection while
leaving every score untouched (global stats are frozen until the
physical merge — pending.py docstring). The checkable contract is
therefore: for ANY query the engine's masked top-k equals the oracle's
FULL ranking of the live corpus-with-original-stats with dead docs
removed, then truncated — across search types, attribute filters, both
scorers, cursor pages, facets and histograms. A second mark_deleted
generation must take effect at the next query with NO searcher reload
(reference SimpleSearchManager.java:66 re-checks Files.exists per hit;
our sidecar stat is the per-query analogue)."""

from collections import Counter

import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages, vocabulary
from search_engine_ray.idhash import doc_ids_for_urls
from search_engine_ray.oracle import OracleIndex
from search_engine_ray.pending import mark_deleted
from search_engine_ray.search import LocalSearcher

HEAD = vocabulary(50)


def _masked_oracle_topk(o, qs, st, k, where, dead):
    full = o.search(qs, st, k=o.n_docs + len(dead) + 1, where=where)
    live = [(d, s) for d, s, _ in full if d not in dead]
    return live[:k]


@pytest.mark.parametrize("seed", [404])
def test_tombstone_parity_sweep(ray_session, tmp_path, seed):
    pages = generate_pages(250, seed=seed)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    idx = str(tmp_path / "index")
    build_index(str(pdir), idx, BuildConfig(num_buckets=8))
    s = LocalSearcher(idx)
    o = OracleIndex.build(pages)

    urls = pages.column("url").to_pylist()
    dead_urls = urls[::5]  # every 5th doc dies — hits head terms for sure
    mark_deleted(idx, urls=dead_urls)
    dead = set(doc_ids_for_urls(dead_urls).tolist())

    h0, h1, h2 = HEAD[0], HEAD[1], HEAD[2]
    types = [
        ("exact", [h0]), ("or", [h0, h1, h2]), ("and", [h0, h1]),
        ("prefix", [h0[:2]]), ("contains", [h0[1:3]]),
        ("wildcard", [h0[0] + "*" + h0[-1]]),
        ("fuzzy", [h0[:-1] + "x"]),
    ]
    wheres = [None, {"lang": "en"}, {"doc_len": (20, 300)}]
    n_checked = 0
    for st, qs in types:
        for where in wheres:
            want = _masked_oracle_topk(o, qs, st, 15, where, dead)
            for scorer in ("taat", "bmw"):
                if st == "and" and scorer == "bmw":
                    continue
                eng = s.search(qs, st, k=15, where=where, scorer=scorer)
                got = list(zip(eng.column("doc_id").to_pylist(),
                               eng.column("score").to_pylist()))
                assert got == want, (st, qs, where, scorer)
                assert not dead & {d for d, _ in got}
                n_checked += 1
            # page 2 through the mask: the cursor continuation must also
            # backfill with live docs only
            eng = s.search(qs, st, k=5, where=where)
            if eng.num_rows:
                cur = (eng.column("score")[-1].as_py(),
                       eng.column("doc_id")[-1].as_py())
                page2 = s.search(qs, st, k=5, where=where,
                                 search_after=cur)
                want10 = _masked_oracle_topk(o, qs, st, 10, where, dead)
                got10 = list(zip(
                    eng.column("doc_id").to_pylist()
                    + page2.column("doc_id").to_pylist(),
                    eng.column("score").to_pylist()
                    + page2.column("score").to_pylist()))
                assert got10 == want10, (st, qs, where, "page2")
                n_checked += 1
    assert n_checked > 25

    # facets + histogram exclude dead docs from the match set
    for st, qs in [("or", [h0, h2]), ("prefix", [h0[:2]])]:
        match = {d for d in o._match_docs(qs, st, None) if d not in dead}
        want_f = sorted(Counter(o.attr_of[d].get("lang", "")
                                for d in match).items(),
                        key=lambda kv: (-kv[1], kv[0]))
        t = s.facet_counts(qs, st, by="lang")
        assert list(zip(t.column("value").to_pylist(),
                        t.column("n_docs").to_pylist())) == want_f
        edges = [0, 100, 250, 500]
        h = s.facet_histogram(qs, edges, st, by="doc_len")
        vals = [o.attr_num[d].get("doc_len") for d in match]
        want_h = [(float(lo), float(hi),
                   sum(1 for v in vals if v is not None and lo <= v < hi))
                  for lo, hi in zip(edges, edges[1:])]
        assert list(zip(h.column("bin_lo").to_pylist(),
                        h.column("bin_hi").to_pylist(),
                        h.column("n_docs").to_pylist())) == want_h

    # a SECOND generation lands with no reload: kill the current top hit
    eng = s.search([h0], "exact", k=3)
    assert eng.num_rows
    top = eng.column("doc_id")[0].as_py()
    mark_deleted(idx, doc_ids=[top])
    dead.add(top)
    eng2 = s.search([h0], "exact", k=3)
    assert top not in eng2.column("doc_id").to_pylist()
    assert list(zip(eng2.column("doc_id").to_pylist(),
                    eng2.column("score").to_pylist())) == \
        _masked_oracle_topk(o, [h0], "exact", 3, None, dead)


def test_mark_deleted_routes_on_sharded_root(ray_session, tmp_path):
    """mark_deleted on a doc-SHARDED root routes each id to its owning
    shard's sidecar (doc_id % D — the build's own key) and the fan-out
    searcher sees the deletion at the next query; shards that own none
    of the ids keep no sidecar at all."""
    import os

    from search_engine_ray.pending import read_pending, shard_roots
    from search_engine_ray.sharded import ShardedSearcher, build_sharded

    pages = generate_pages(200, seed=505)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    root = str(tmp_path / "sharded")
    build_sharded(str(pdir), root, num_doc_shards=3,
                  config=BuildConfig(num_buckets=8))
    ss = ShardedSearcher(root)
    assert shard_roots(root) == [os.path.join(root, f"shard={s}")
                                 for s in range(3)]
    # an UNSHARDED root is not misdetected
    uidx = str(tmp_path / "plain")
    build_index(str(pdir), uidx, BuildConfig(num_buckets=8))
    assert shard_roots(uidx) is None

    r1 = ss.search([HEAD[0]], "exact", k=6)
    assert r1.num_rows == 6
    dead_urls = [r1.column("url")[0].as_py(), r1.column("url")[1].as_py()]
    out = mark_deleted(root, urls=dead_urls)
    assert out == {"sharded": 3, "pending": 2}

    dead_ids = set(doc_ids_for_urls(dead_urls).tolist())
    for s in range(3):
        ids, _ = read_pending(os.path.join(root, f"shard={s}"))
        assert all(i % 3 == s for i in ids)        # routed, not broadcast
        assert set(ids.tolist()) <= dead_ids
    assert sum(read_pending(os.path.join(root, f"shard={s}"))[0].size
               for s in range(3)) == 2

    r2 = ss.search([HEAD[0]], "exact", k=6)        # no reload
    got = r2.column("doc_id").to_pylist()
    assert not dead_ids & set(got)
    assert got[:4] == r1.column("doc_id").to_pylist()[2:6]

    # remove --merge on the sharded root routes through
    # apply_delta_sharded: postings physically pruned, sidecars emptied
    import json
    import subprocess
    import sys

    victim = r2.column("url")[0].as_py()
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "remove",
         "--index", root, "--urls", victim, "--merge"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["marked"]["sharded"] == 3
    assert rep["merge"]["n_docs"] == 200 - 1
    ss2 = ShardedSearcher(root)                    # fresh post-merge view
    hits = ss2.search([HEAD[0]], "exact", k=10_000)
    assert victim not in hits.column("url").to_pylist()
    assert not dead_ids & set(hits.column("doc_id").to_pylist())
    # only the victim's shard merged; the two earlier marks stay PENDING
    # (their docs were never physically removed — still masked above)
    victim_id = doc_ids_for_urls([victim])[0]
    left = set()
    for s in range(3):
        left |= set(read_pending(
            os.path.join(root, f"shard={s}"))[0].tolist())
    assert victim_id not in left                   # pruned by its merge
    assert left == dead_ids                        # untouched shards keep
