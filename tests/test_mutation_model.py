"""Multi-generation mutation model test.

The reference's long-running mode is an arbitrary interleaving of
index/update/remove events drained by the scheduler tick
(DocumentIndexManager.java + IndexationSchedulerTask.java). The existing
U3/M8 tests pin ONE drain; this file drives a seeded random SEQUENCE of
generations through ``writer.IndexWriter`` against a plain dict model
(url -> text) and checks, at every step:

* M8 visibility: between ``remove_document`` and the drain, the removed
  doc is already absent from every query (the vanished-file filter);
* post-drain queries return exactly the model's matching urls (set
  compare — BM25 order is pinned elsewhere by the rank-identity suites);
* after the final generation the index buckets + global stats are
  byte-identical to a scratch build over the model's end-state corpus —
  i.e. N interleaved generations leave zero history residue.
"""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.pending import read_pending
from search_engine_ray.search import LocalSearcher
from search_engine_ray.writer import PAGES_SCHEMA, IndexWriter

CFG = BuildConfig(num_buckets=8)
WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima").split()


def _text(rng: random.Random) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(5, 30)))


def _model_hits(model: dict[str, str], term: str,
                masked: set[str]) -> set[str]:
    return {u for u, t in model.items()
            if term in t.split() and u not in masked}


def _searcher_hits(s: LocalSearcher, term: str) -> set[str]:
    r = s.search([term], "exact", k=10_000)
    return set(r.column("url").to_pylist())


def _write_corpus(model: dict[str, str], path: str) -> None:
    os.makedirs(path)
    urls = sorted(model)
    t = pa.table({
        "url": urls,
        "warc_ts": pa.array([1704067200000000] * len(urls),
                            pa.timestamp("us")),
        "html": pa.array([None] * len(urls), pa.binary()),
        "text": [model[u] for u in urls],
        "lang": ["en"] * len(urls),
    }, schema=PAGES_SCHEMA)
    pq.write_table(t, os.path.join(path, "pages.parquet"))


@pytest.mark.parametrize("seed", [3, 17])
def test_random_generation_sequence(ray_session, tmp_path, seed):
    rng = random.Random(seed)
    model = {f"https://m/{i:03d}": _text(rng) for i in range(30)}

    pages0 = str(tmp_path / "pages0")
    _write_corpus(model, pages0)
    idx = str(tmp_path / "index")
    build_index(pages0, idx, CFG)
    w = IndexWriter(idx)
    next_id = len(model)
    indexed = dict(model)  # state as of the last drain

    for gen in range(5):
        # sidecar_masked: every url removed THIS generation — the M8
        # sidecar keeps masking it until the drain even if a re-add is
        # already queued (writer.py: the upsert supersedes at drain time)
        sidecar_masked: set[str] = set()
        masked: set[str] = set()
        # a random batch: removes of live urls, updates, brand-new adds,
        # and (sometimes) a remove-then-re-add of the same url in one
        # generation — the coalescing edge
        for _ in range(rng.randint(2, 6)):
            op = rng.random()
            if op < 0.3 and len(model) > 5:
                u = rng.choice(sorted(model))
                w.remove_document(u)
                del model[u]
                masked.add(u)
                sidecar_masked.add(u)
            elif op < 0.6 and model:
                u = rng.choice(sorted(model))
                model[u] = _text(rng)
                w.update_document(u, text=model[u])
            else:
                u = f"https://m/{next_id:03d}"
                next_id += 1
                model[u] = _text(rng)
                w.add_document(u, text=model[u])
        if rng.random() < 0.4 and masked:
            # re-add one removed url in the SAME generation
            u = sorted(masked)[0]
            model[u] = _text(rng)
            w.add_document(u, text=model[u])
            masked.discard(u)

        # M8: removed docs are gone from queries BEFORE the drain runs
        # (adds/updates are not yet visible — expect the LAST-DRAINED
        # corpus minus the masked set)
        s_pre = LocalSearcher(idx)
        probe = rng.choice(WORDS)
        assert _searcher_hits(s_pre, probe) == _model_hits(
            indexed, probe, sidecar_masked), \
            f"gen {gen}: pre-drain M8 mismatch"

        summary = w.drain()
        assert summary["applied"]
        indexed = dict(model)

        # post-drain: fresh searcher == model, sidecar only holds what
        # drain could not merge (nothing — every event was processed)
        ids, _ = read_pending(idx)
        assert ids.size == 0
        s = LocalSearcher(idx)
        for term in rng.sample(WORDS, 4):
            assert _searcher_hits(s, term) == _model_hits(
                model, term, set()), f"gen {gen} term {term}"

    # end state: byte-identical to a scratch build over the model corpus
    pagesN = str(tmp_path / "pagesN")
    _write_corpus(model, pagesN)
    scratch = str(tmp_path / "scratch")
    build_index(pagesN, scratch, CFG)
    for b in range(CFG.num_buckets):
        t1 = pq.read_table(os.path.join(idx, "buckets", f"bucket={b}",
                                        "postings.parquet"))
        t2 = pq.read_table(os.path.join(scratch, "buckets", f"bucket={b}",
                                        "postings.parquet"))
        assert t1.equals(t2), f"bucket {b} differs after {gen + 1} gens"
