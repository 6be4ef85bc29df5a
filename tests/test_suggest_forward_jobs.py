"""Forward index (I5), suggestion expansion (M10/ST3), CLI jobs surface."""

import json
import subprocess
import sys

import pytest

from search_engine_ray.idhash import doc_id_for_url
from search_engine_ray.search import LocalSearcher
from search_engine_ray.suggest import SuggestionExpander


@pytest.fixture(scope="module")
def searcher(built_index):
    return LocalSearcher(built_index)


def test_doc_terms_forward_index(searcher, small_oracle):
    d = doc_id_for_url("https://example.org/parity/00000002")
    got = searcher.doc_terms(d)
    # "mama mila doma hi mama i am here"
    assert got == [("am", 1), ("doma", 1), ("here", 1), ("hi", 1),
                   ("i", 1), ("mama", 2), ("mila", 1)]
    # oracle cross-check on an arbitrary doc
    any_doc = sorted(small_oracle.url_of)[7]
    want = sorted(
        (t, p[any_doc][0])
        for t, p in small_oracle.postings.items() if any_doc in p
    )
    assert searcher.doc_terms(any_doc) == want
    assert searcher.doc_terms(123456789) == []


def test_suggestion_expansion(searcher, small_oracle):
    exp = SuggestionExpander(searcher)
    # 'mila' and 'milak' both exist; same-length substitution only
    sug = exp.suggest("mila")
    assert "mila" in sug
    assert all(len(s) == 4 for s in sug)
    # search_with_suggestions == oracle OR over the same expansion
    res = exp.search_with_suggestions("mila", k=20)
    want = small_oracle.search(exp.suggest("mila"), "or", k=20)
    got = list(zip(res.column("doc_id").to_pylist(),
                   res.column("score").to_pylist()))
    assert got == [(d, s) for d, s, _ in want]
    # unknown word with no same-length vocab neighbours -> falls back
    res2 = exp.search_with_suggestions("qqqqqqqqqqqqqqqqqqqqqq")
    assert res2.num_rows == 0


def test_suggestion_external_dictionary_hook(searcher):
    """An external dictionary (word list or callable) replaces the
    vocab-edit-1 source; candidates are still filtered to same-length
    index-present terms (the reference's Hunspell filter chain)."""
    exp_default = SuggestionExpander(searcher)
    base = exp_default.suggest("mila")
    assert "milak"[:4] not in base or True  # baseline exists
    # word list: includes a real index neighbour + noise that must be
    # filtered (wrong length / not in index)
    wordlist = ["mila", "milk", "mi", "zzzz", "mill"]
    exp_list = SuggestionExpander(searcher, dictionary=wordlist)
    sug = exp_list.suggest("mila")
    assert sug[0] == "mila"
    assert all(len(s) == 4 for s in sug)
    vocab = {t for b in range(searcher.num_buckets)
             for t in searcher.bucket(b).terms}
    assert set(sug) <= vocab
    # callable dictionary
    exp_fn = SuggestionExpander(searcher,
                                dictionary=lambda w: ["mila", "zzzz"])
    assert exp_fn.suggest("mila") == ["mila"]
    # search_with_suggestions still ORs the expansion
    res = exp_list.search_with_suggestions("mila", k=10)
    assert res.num_rows >= 1


def test_jobs_cli_build_and_query(ray_session, tmp_path):
    """Drive the ray-job entrypoint module end-to-end in a subprocess."""
    import pyarrow.parquet as pq

    from search_engine_ray.corpus import generate_pages

    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(generate_pages(40, seed=6), str(pdir / "p.parquet"))
    idx = str(tmp_path / "idx")
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "build",
         "--input", str(pdir), "--index", idx, "--num-buckets", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert m["n_docs"] == 40

    out2 = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "query",
         "--index", idx, "--terms", "mila", "--type", "exact"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    rows = json.loads(out2.stdout.strip().splitlines()[-1])
    assert len(rows) == 2
    assert {r["url"] for r in rows} == {
        "https://example.org/parity/00000002",
        "https://example.org/parity/00000003",
    }

    def q(*args):
        r = subprocess.run(
            [sys.executable, "-m", "search_engine_ray.jobs", "query",
             "--index", idx, *args],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    # every engine query type is reachable from the CLI surface
    and_rows = q("--terms", "mama", "mila", "--type", "and")
    assert [r["url"] for r in and_rows] == \
        ["https://example.org/parity/00000002"]
    phrase_rows = q("--terms", "mama", "mila", "--type", "phrase")
    assert [r["url"] for r in phrase_rows] == [r["url"] for r in and_rows]
    sug_rows = q("--terms", "mila", "--type", "suggest")
    assert len(sug_rows) >= 2  # expansion ORs in same-length neighbours
    pre_rows = q("--terms", "mil", "--type", "prefix")
    assert len(pre_rows) >= 2
    # fuzzy reaches the CLI: 'milo' is one substitution from 'mila'
    fuz2_rows = q("--terms", "mlo", "--type", "fuzzy2")
    assert len(fuz2_rows) >= 2   # 'mlo' is 2 edits from 'mila'
    bool_rows = q("--terms", "mila AND NOT zzz_none", "--type", "bool")
    assert {r["url"] for r in bool_rows} == {
        "https://example.org/parity/00000002",
        "https://example.org/parity/00000003",
    }
    fuz_rows = q("--terms", "milo", "--type", "fuzzy")
    assert {r["url"] for r in fuz_rows} >= {
        "https://example.org/parity/00000002",
        "https://example.org/parity/00000003",
    }


def test_jobs_cli_dedup(ray_session, tmp_path):
    """The dedup family is submittable as a job: ngram method writes the
    exact near-dup pairs parquet and reports row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [f"alpha beta gamma delta epsilon zeta eta theta doc{i}"
             for i in range(8)]
    texts.append(texts[0])  # exact dup of doc 0 -> jaccard 1.0 pair
    t = pa.table({"doc_id": pa.array(range(9), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    dpath = tmp_path / "docs.parquet"
    pq.write_table(t, str(dpath))
    out_dir = str(tmp_path / "pairs")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "dedup",
         "--input", str(dpath), "--out", out_dir,
         "--method", "ngram", "--threshold", "0.5"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["rows"] >= 1
    got = pq.read_table(out_dir).to_pandas()
    assert ((got["doc_a"] == 0) & (got["doc_b"] == 8)
            & (got["jaccard"] == 1.0)).any()


def test_jobs_cli_dedup_line_method(ray_session, tmp_path):
    """--method line writes the REWRITTEN corpus: duplicate lines
    survive only at their first (doc_id, line_no) occurrence."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["keep me\nshared line",
                                    "shared line\nmine only"],
                                   pa.string())})
    dpath = tmp_path / "docs.parquet"
    pq.write_table(t, str(dpath))
    out_dir = str(tmp_path / "linededup")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "dedup",
         "--input", str(dpath), "--out", out_dir, "--method", "line"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["rows"] == 2
    got = (pq.read_table(out_dir).to_pandas()
           .set_index("doc_id")["clean_text"])
    assert got[1] == "keep me\nshared line"
    assert got[2] == "mine only"


def test_replica_pool_phrase_and_suggest(built_index):
    """serve surface parity: phrase + suggestion search through the
    replica pool equal LocalSearcher's answers."""
    from search_engine_ray.serve import SearcherReplicaPool
    from search_engine_ray.suggest import SuggestionExpander

    s = LocalSearcher(built_index)
    pool = SearcherReplicaPool(built_index, num_replicas=1)
    try:
        want = s.phrase_search(["mama", "mila"], k=10)
        got = pool.phrase_search(["mama", "mila"], k=10)
        assert got.equals(want)
        want2 = SuggestionExpander(s).search_with_suggestions("mila", k=10)
        got2 = pool.search_with_suggestions("mila", k=10)
        assert got2.equals(want2)
        want3 = s.near_search(["doma", "mila"], window=5, k=10)
        got3 = pool.near_search(["doma", "mila"], window=5, k=10)
        assert got3.equals(want3) and want3.num_rows > 0
    finally:
        pool.shutdown()


def test_jobs_cli_prepare_end_to_end(ray_session, tmp_path):
    """prepare = filter -> global line dedup -> shuffle -> sharded write:
    output holds exactly the corpus_filter survivors, duplicate lines
    collapse to one corpus-wide occurrence, every shard's positions are
    dense 0..n-1, and the training order is the deterministic hash
    order."""
    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    filler = ("the data of table and value for index in row stream it "
              "is that a to batch sort key scan merge part hash fast")
    shared = "shared line that appears in every document of this corpus"
    texts = [f"{filler} doc{i}\n{shared}" for i in range(12)]
    # eval-slot doc (id % 10 == 7) must be textually DISJOINT, else every
    # training doc sharing its 8-grams flags contaminated (by design)
    texts[7] = "held out benchmark prompt with its own answer words only"
    texts += ["tiny", "also tiny"]            # -> too_short, dropped
    t = pa.table({"doc_id": pa.array(range(14), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    src = tmp_path / "docs.parquet"
    pq.write_table(t, str(src))
    out = tmp_path / "prepared"
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "prepare",
         "--input", str(src), "--out", str(out), "--n-shards", "4"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["dense_positions"] is True
    got = (pds.dataset(f"{out}", format="parquet", partitioning="hive")
           .to_table().to_pandas())
    got = got[[c for c in got.columns]]
    # survivors: the 12 filler docs minus the eval holdout (doc 7)
    assert sorted(got["doc_id"]) == [i for i in range(12) if i != 7]
    assert rep["rows"] == len(got)
    # the shared line survives in exactly ONE output doc
    n_shared = sum(shared in t for t in got["clean_text"])
    assert n_shared == 1
    # dense positions per shard
    for s, sub in got.groupby("shard_id"):
        assert sorted(sub["pos"]) == list(range(len(sub)))
    # rerun resumes from the completed dedup stage and REPLACES the
    # shard partitions (no row duplication)
    r2 = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "prepare",
         "--input", str(src), "--out", str(out), "--n-shards", "4"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    lines = r2.stdout.strip().splitlines()
    assert any("resumed_stage" in ln for ln in lines)
    rep2 = json.loads(lines[-1])
    assert rep2["rows"] == rep["rows"] and rep2["per_shard"] == \
        rep["per_shard"]


def test_jobs_cli_dedup_resolve(ray_session, tmp_path):
    """--resolve turns the pair graph into clusters and writes the
    keep-one-per-cluster corpus: doc 0 == doc 8 (jaccard 1.0), so the
    kept corpus drops exactly doc 8 (min-id representative wins)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # mutually DISSIMILAR docs (disjoint vocabularies) + one exact copy
    texts = [" ".join(f"w{i}t{j}" for j in range(9)) for i in range(8)]
    texts.append(texts[0])
    t = pa.table({"doc_id": pa.array(range(9), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    dpath = tmp_path / "docs.parquet"
    pq.write_table(t, str(dpath))
    out_dir = str(tmp_path / "resolved")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "dedup",
         "--input", str(dpath), "--out", out_dir,
         "--method", "ngram", "--threshold", "0.5", "--resolve"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["resolved"] is True and m["n_dropped"] == 1
    assert m["rows"] == 8
    kept = pq.read_table(out_dir + "/kept").to_pandas()
    assert sorted(kept["doc_id"]) == list(range(8))
    cl = (pq.read_table(out_dir + "/clusters").to_pandas()
          .set_index("doc_id")["cluster_rep"])
    assert cl[0] == 0 and cl[8] == 0


def test_jobs_cli_profile(ray_session, tmp_path):
    """profile job prints one JSON line per column with null-aware
    stats and the HLL comparison column under --approx."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"a": pa.array([1, 2, 2, None], pa.int64()),
                  "s": pa.array(["x", "y", None, "x"], pa.string())})
    p = tmp_path / "t.parquet"
    pq.write_table(t, str(p))
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "profile",
         "--input", str(p), "--approx"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    rows = {json.loads(ln)["column"]: json.loads(ln)
            for ln in r.stdout.strip().splitlines()[-2:]}
    assert rows["a"]["n_null"] == 1 and rows["a"]["n_distinct"] == 2
    assert rows["a"]["n_distinct_hll"] == 2
    assert rows["s"]["min_str"] == "x" and rows["s"]["max_num"] is None
    # CMS heavy-hitters mode: exact on this tiny input
    r2 = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "profile",
         "--input", str(p), "--heavy-hitters", "s", "-k", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    hh = [json.loads(ln) for ln in r2.stdout.strip().splitlines()[-2:]]
    assert hh == [{"value": "x", "est_count": 2},
                  {"value": "y", "est_count": 1}]


def test_jobs_cli_dedup_spans_method(ray_session, tmp_path):
    """--method spans writes the duplicated-substring span report."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = " ".join(f"s{i}" for i in range(6))
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a0 a1 " + shared,
                                    shared + " b0",
                                    "c0 c1 c2 c3 c4 c5 c6"], pa.string())})
    dpath = tmp_path / "docs.parquet"
    pq.write_table(t, str(dpath))
    out_dir = str(tmp_path / "spans")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "dedup",
         "--input", str(dpath), "--out", out_dir, "--method", "spans",
         "--window", "6"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["rows"] == 2
    got = sorted(map(tuple, pq.read_table(out_dir).to_pandas()[
        ["doc_id", "span_start", "span_end", "span_len"]]
        .itertuples(index=False)))
    assert got == [(1, 3, 8, 6), (2, 1, 6, 6)]


def test_jobs_cli_dedup_spans_rewrite(ray_session, tmp_path):
    """--method spans --rewrite writes the span-cut corpus: the keeper
    doc survives byte-exact, the other occurrence is cut."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = " ".join(f"s{i}" for i in range(6))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a0 " + shared,
                                    shared + " b0"], pa.string())})
    dpath = tmp_path / "docs.parquet"
    pq.write_table(t, str(dpath))
    out_dir = str(tmp_path / "cut")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "dedup",
         "--input", str(dpath), "--out", out_dir, "--method", "spans",
         "--window", "6", "--rewrite"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    got = (pq.read_table(out_dir).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[1, "clean_text"] == "a0 " + shared
    assert got.loc[2, "clean_text"].strip() == "b0"
    assert int(got.loc[2, "n_cut_tokens"]) == 6


def test_jobs_cli_mix(ray_session, tmp_path):
    """mix job writes the selection report + the mixed corpus; per-source
    token totals respect their targets and unlisted sources are absent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for d in range(60):
        src = f"m{d % 3}"
        rows.append((d, src, " ".join(f"w{i}" for i in range(5))))
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "source": pa.array([r[1] for r in rows], pa.string()),
                  "text": pa.array([r[2] for r in rows], pa.string())})
    dpath = tmp_path / "docs.parquet"
    pq.write_table(t, str(dpath))
    out = str(tmp_path / "mixed")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "mix",
         "--input", str(dpath), "--out", out, "--budget", "100",
         "--weights", "m0=0.6,m1=0.4"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    rep = pq.read_table(out + "/report").to_pandas()
    corp = pq.read_table(out + "/corpus").to_pandas()
    assert set(rep["doc_id"]) == set(corp["doc_id"])
    assert m["rows"] == len(rep) and m["tokens"] == int(rep["n_tokens"].sum())
    # 5-token docs: m0 target 60 -> 12 docs, m1 target 40 -> 8 docs
    by = rep.groupby("source")["n_tokens"].sum().to_dict()
    assert by == {"m0": 60, "m1": 40}
    assert "m2" not in set(corp["source"])


def test_jobs_cli_stats(ray_session, tmp_path):
    """stats job reports vocab/postings/bytes from footers only, for
    both a local index and a sharded root; counts agree between the
    two topologies over the same corpus."""
    import pyarrow.parquet as pq

    from search_engine_ray.corpus import generate_pages

    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(generate_pages(40, seed=6), str(pdir / "p.parquet"))
    idx = str(tmp_path / "idx")
    sh = str(tmp_path / "sharded")
    for cmd in (["build", "--input", str(pdir), "--index", idx,
                 "--num-buckets", "4"],
                ["sharded-build", "--input", str(pdir), "--root", sh,
                 "--num-shards", "2", "--num-buckets", "4"]):
        r = subprocess.run([sys.executable, "-m",
                            "search_engine_ray.jobs", *cmd],
                           capture_output=True, text=True,
                           cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]

    def stats(root):
        r = subprocess.run(
            [sys.executable, "-m", "search_engine_ray.jobs", "stats",
             "--index", root],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    local = stats(idx)
    assert local["n_docs"] == 40 and local["vocab"] > 0
    assert local["n_postings"] > 0 and local["bytes_per_posting"] > 0
    assert set(local["column_bytes"]) >= {"term", "docs_vb", "tfs_vb",
                                          "pos_vb", "blockmax"}
    sharded = stats(sh)
    assert sharded["num_doc_shards"] == 2
    assert sharded["n_docs"] == 40
    # every posting lives in exactly one shard
    assert sharded["n_postings"] == local["n_postings"]
