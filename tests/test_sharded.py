"""Doc-sharded index == single-shard index, bit-exact (sharded.py)."""

import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig
from search_engine_ray.search import LocalSearcher
from search_engine_ray.sharded import ShardedSearcher, build_sharded


@pytest.fixture(scope="module")
def sharded_root(ray_session, small_pages, tmp_path_factory):
    root = tmp_path_factory.mktemp("sharded")
    pdir = root / "pages"
    pdir.mkdir()
    pq.write_table(small_pages, str(pdir / "p.parquet"))
    m = build_sharded(str(pdir), str(root / "idx"), num_doc_shards=3,
                      config=BuildConfig(num_buckets=4))
    assert len(m["shards"]) == 3
    return str(root / "idx")


QUERIES = [
    (["mila"], "exact"), (["mam"], "prefix"), (["bako", "kota"], "or"),
    (["mila", "mama"], "and"), (["zzz_none"], "exact"),
    (["sentinel00"], "prefix"), (["mil"], "prefix"),
    (["il"], "contains"), (["qqq_absent"], "contains"),
    (["m?la"], "wildcard"), (["mi*"], "wildcard"),
    (["*ako"], "wildcard"), (["qqq*absent"], "wildcard"),
    (["m.la"], "regex"), (["mil.*"], "regex"),
    ([".*ako"], "regex"), (["qqq.*absent"], "regex"),
    (["milo"], "fuzzy"), (["milo", "bako"], "fuzzy"),
    (["mlo"], "fuzzy2"),
    (["qqq_absent"], "fuzzy"),
]


@pytest.mark.parametrize("q,st", QUERIES)
def test_sharded_matches_unsharded(sharded_root, built_index, q, st):
    """Global stats injection + query-time global df => every score and
    doc id identical to the single-index build over the same corpus."""
    sharded = ShardedSearcher(sharded_root)
    single = LocalSearcher(built_index)
    a = sharded.search(q, st, k=30)
    b = single.search(q, st, k=30)
    assert a.equals(b), (q, st)


def test_term_stats_sidecar_exists_and_matches_fanout(sharded_root):
    """build_sharded writes the merged df sidecar; its values equal the
    query-time shard-sum, and the sidecar path is actually taken."""
    import os

    sharded = ShardedSearcher(sharded_root)
    assert sharded._has_sidecar
    assert os.path.isdir(os.path.join(sharded_root, "term_stats"))
    vocab = set()
    for sh in sharded.shards:
        for b in range(sh.num_buckets):
            vocab.update(sh.bucket(b).terms)
    for t in sorted(vocab):
        fanout_df = sum((sh._posting_for(t) or {"df": 0})["df"]
                        for sh in sharded.shards)
        assert sharded._sidecar_df(t) == fanout_df, t
    assert sharded._sidecar_df("zzz_not_a_term") == 0


@pytest.mark.parametrize("q,st", QUERIES)
def test_sharded_without_sidecar_still_matches(sharded_root, built_index,
                                               q, st, tmp_path):
    """Fallback path (older index without the sidecar) stays bit-exact."""
    sharded = ShardedSearcher(sharded_root)
    sharded._has_sidecar = False  # force the query-time shard-sum path
    single = LocalSearcher(built_index)
    assert sharded.search(q, st, k=30).equals(single.search(q, st, k=30))


@pytest.mark.parametrize("q,st", QUERIES)
def test_doc_shard_server_matches_local(sharded_root, built_index, q, st):
    """Actor-per-doc-shard serving == LocalSearcher, including urls."""
    from search_engine_ray.serve import DocShardServer

    srv = DocShardServer(sharded_root)
    try:
        got = srv.search(q, st, k=30)
        want = LocalSearcher(built_index).search(q, st, k=30)
        assert got.equals(want), (q, st)
    finally:
        srv.shutdown()


def test_doc_shard_server_phrase_matches_local(sharded_root, built_index):
    from search_engine_ray.serve import DocShardServer

    srv = DocShardServer(sharded_root)
    try:
        for terms in (["mama", "mila"], ["mila", "mama"],
                      ["zzz_missing", "mila"]):
            got = srv.phrase_search(terms, k=20)
            want = LocalSearcher(built_index).phrase_search(terms, k=20)
            assert got.equals(want), terms
    finally:
        srv.shutdown()


def test_sharded_phrase_matches_unsharded(sharded_root, built_index):
    """ShardedSearcher.phrase_search (global-idf injection + per-shard
    top-k merge) is rank- and score-identical to the single index."""
    sharded = ShardedSearcher(sharded_root)
    single = LocalSearcher(built_index)
    for terms in (["mama", "mila"], ["mila", "mama"],
                  ["zzz_missing", "mila"]):
        assert sharded.phrase_search(terms, k=20).equals(
            single.phrase_search(terms, k=20)), terms


def test_sharded_suggest_matches_unsharded(sharded_root, built_index):
    """SuggestionExpander over a ShardedSearcher (vocabulary from the
    term-stats sidecar) == over the LocalSearcher."""
    from search_engine_ray.suggest import SuggestionExpander

    sharded = ShardedSearcher(sharded_root)
    single = LocalSearcher(built_index)
    es, el = SuggestionExpander(sharded), SuggestionExpander(single)
    for word in ("mila", "mama", "zzzz"):
        assert es.suggest(word) == el.suggest(word), word
        assert es.search_with_suggestions(word, k=20).equals(
            el.search_with_suggestions(word, k=20)), word


def test_sharded_delta_matches_unsharded_scratch(ray_session, tmp_path):
    """apply_delta_sharded(route -> per-shard delta -> stats + sidecar
    rebuild) produces search results identical to an unsharded scratch
    build over the merged corpus."""
    import pyarrow as pa

    from search_engine_ray.build import build_index
    from search_engine_ray.corpus import PAGES_SCHEMA, generate_pages
    from search_engine_ray.sharded import apply_delta_sharded

    base = generate_pages(80, seed=5)
    rows = base.to_pylist()
    urls = sorted({r["url"] for r in rows})
    deleted = urls[7:9]
    new_rows = [{
        "url": f"https://example.org/sharddelta/{i:08d}",
        "warc_ts": rows[0]["warc_ts"].replace(year=2025),
        "html": b"", "text": f"sharded delta doc {i} deltaword{i} mila",
        "lang": "en",
    } for i in range(3)]
    delta = pa.Table.from_pylist(new_rows, schema=PAGES_SCHEMA)
    merged = pa.Table.from_pylist(
        [r for r in rows if r["url"] not in set(deleted)] + new_rows,
        schema=PAGES_SCHEMA)

    def wr(t, name):
        import pyarrow.parquet as pq

        d = tmp_path / name
        d.mkdir()
        pq.write_table(t, str(d / "p.parquet"))
        return str(d)

    cfg = BuildConfig(num_buckets=4)
    root = str(tmp_path / "sharded")
    build_sharded(wr(base, "base"), root, num_doc_shards=3, config=cfg)
    m = apply_delta_sharded(root, wr(delta, "delta"), deleted_urls=deleted)
    assert m["n_docs"] == 80 - 2 + 3
    scratch = str(tmp_path / "scratch")
    build_index(wr(merged, "merged"), scratch, cfg)
    sh = ShardedSearcher(root)
    single = LocalSearcher(scratch)
    for q, st in [(["mila"], "exact"), (["deltaword1"], "exact"),
                  (["delta"], "prefix"), (["sharded", "delta"], "and"),
                  (["mила" if False else "mil"], "prefix")]:
        assert sh.search(q, st, k=40).equals(single.search(q, st, k=40)), \
            (q, st)
    # deleted urls unfindable
    hits = sh.search(["mila"], "exact", k=80).column("url").to_pylist()
    assert not set(deleted) & set(hits)


def test_sharded_cli_build_and_query(ray_session, tmp_path):
    """ray-job surface for the sharded topology: sharded-build then
    query --sharded in subprocesses."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from search_engine_ray.corpus import generate_pages

    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(generate_pages(30, seed=8), str(pdir / "p.parquet"))
    root = str(tmp_path / "sharded")
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "sharded-build",
         "--input", str(pdir), "--root", root, "--num-shards", "2",
         "--num-buckets", "4"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert m["n_docs"] == 30 and len(m["shards"]) == 2
    out2 = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "query",
         "--index", root, "--sharded", "--terms", "mila"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr[-2000:]
    rows = json.loads(out2.stdout.strip().splitlines()[-1])
    assert len(rows) == 2
    # phrase routes to the sharded phrase kernel (ADVICE fix: it must NOT
    # fall through to the OR-expanding search())
    out3 = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "query",
         "--index", root, "--sharded", "--terms", "mila", "mama",
         "--type", "phrase"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out3.returncode == 0, out3.stderr[-2000:]
    prows = json.loads(out3.stdout.strip().splitlines()[-1])
    want = ShardedSearcher(root).phrase_search(["mila", "mama"],
                                               k=10).to_pylist()
    assert prows == want


def test_parallel_shard_builds_overlap(ray_session, tmp_path):
    """build_sharded runs shard builds concurrently: with D=4 shards and
    the default in-flight bound, at least one pair of per-shard wall
    intervals overlaps (the r2 serial loop stacked D stage-barrier sets
    end to end). Results stay identical to a serial build."""
    import pyarrow.parquet as pq

    from search_engine_ray.corpus import generate_pages

    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(generate_pages(120, seed=11), str(pdir / "p.parquet"))
    m_par = build_sharded(str(pdir), str(tmp_path / "par"), 4,
                          BuildConfig(num_buckets=4))
    spans = [(r["t_start"], r["t_end"]) for r in m_par["shards"]]
    overlaps = sum(
        1 for i in range(len(spans)) for j in range(i + 1, len(spans))
        if spans[i][0] < spans[j][1] and spans[j][0] < spans[i][1])
    assert overlaps >= 1, spans
    m_ser = build_sharded(str(pdir), str(tmp_path / "ser"), 4,
                          BuildConfig(num_buckets=4), shard_concurrency=1)
    a = ShardedSearcher(str(tmp_path / "par"))
    b = ShardedSearcher(str(tmp_path / "ser"))
    for q, st in [(["mila"], "exact"), (["mil"], "prefix")]:
        assert a.search(q, st, k=20).equals(b.search(q, st, k=20))
    assert m_par["n_docs"] == m_ser["n_docs"]


def test_shard_doc_counts_sum(sharded_root, built_index):
    sharded = ShardedSearcher(sharded_root)
    single = LocalSearcher(built_index)
    assert sharded.n_docs == single.n_docs
    assert sum(sh.stats["n_docs"] if False else
               len(sh.ords()) for sh in sharded.shards) == single.n_docs


def test_sharded_near_matches_unsharded(sharded_root, built_index):
    """near_search across doc shards (global-idf injection + merge) is
    rank- and score-identical to the single index, incl. DocShardServer."""
    from search_engine_ray.serve import DocShardServer

    sharded = ShardedSearcher(sharded_root)
    single = LocalSearcher(built_index)
    cases = [(["mama", "mila"], 1), (["mila", "doma"], 1),
             (["mama", "here"], 50), (["zzz_missing", "mila"], 8)]
    for terms, w in cases:
        assert sharded.near_search(terms, window=w, k=20).equals(
            single.near_search(terms, window=w, k=20)), (terms, w)
    srv = DocShardServer(sharded_root)
    try:
        for terms, w in cases:
            assert srv.near_search(terms, window=w, k=20).equals(
                single.near_search(terms, window=w, k=20)), (terms, w)
    finally:
        srv.shutdown()
