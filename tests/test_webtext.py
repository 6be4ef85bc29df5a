"""Semantics tests for the webtext curation family (functions/webtext):
handcrafted repetition fixtures, decontamination overlap behavior, the
unigram-LM model maths, and corpus_filter reason precedence. SQL parity
vs DuckDB is covered separately in test_entry_contract."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _tbl(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_repetition_stats_handcrafted():
    from search_engine_ray.functions.webtext import RepetitionStatsBatch

    out = RepetitionStatsBatch()(_tbl([
        "aa bb\naa bb\ncc dd",        # 3 lines, 1 dup pair
        "x y z w",                     # all unique
        "a a a a a",                   # one token repeated
        "",                            # empty
        "one\n\n\none",                # empty lines excluded, dup pair
    ])).to_pydict()
    # doc 0: lines [aa bb, aa bb, cc dd] -> 1 - 2/3; dup chars 10/15
    assert out["dup_line_frac"][0] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert out["dup_line_char_frac"][0] == pytest.approx(10 / 15, abs=1e-6)
    # doc 0 trigrams: (aa,bb,aa),(bb,aa,bb),(aa,bb,cc),(cc? ) -> tokens are
    # [aa,bb,aa,bb,cc,dd]: 4 trigrams, all distinct -> 0.0
    assert out["dup_3gram_frac"][0] == 0.0
    # doc 0 bigrams: (aa,bb)x2,(bb,aa),(bb,cc),(cc,dd) -> top 2/5
    assert out["top_2gram_frac"][0] == pytest.approx(0.4, abs=1e-6)
    assert out["dup_line_frac"][1] == 0.0
    assert out["top_2gram_frac"][1] == pytest.approx(1 / 3, abs=1e-6)
    # doc 2: trigrams (a,a,a)x3 -> 1 - 1/3
    assert out["dup_3gram_frac"][2] == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert out["top_2gram_frac"][2] == 1.0
    assert out["dup_line_frac"][3] == 0.0 and out["dup_3gram_frac"][3] == 0.0
    assert out["dup_line_frac"][4] == pytest.approx(0.5, abs=1e-6)


def test_unigram_surprisal_maths(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.webtext import unigram_surprisal

    # corpus: 'a' x3, 'b' x1 -> T=4, V=2; p(a)=(3+1)/6, p(b)=(1+1)/6
    ds = rd.from_arrow(_tbl(["a a a", "b"]))
    out = unigram_surprisal(ds).to_pandas().set_index("doc_id")
    denom = math.log(6.0)
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "mean_nll"] == pytest.approx(denom - math.log(4),
                                                   abs=1e-6)
    assert out.loc[1, "mean_nll"] == pytest.approx(denom - math.log(2),
                                                   abs=1e-6)
    # rarer token -> strictly higher surprisal
    assert out.loc[1, "mean_nll"] > out.loc[0, "mean_nll"]


def test_bigram_surprisal_maths(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.webtext import bigram_surprisal

    # corpus: doc0 'a b a b', doc1 'a a'. Unigram: c(a)=4, c(b)=2, V=2.
    # Bigrams (within docs): (a,b)x2, (b,a)x1, (a,a)x1.
    ds = rd.from_arrow(_tbl(["a b a b", "a a"]))
    out = bigram_surprisal(ds).to_pandas().set_index("doc_id")
    nll_ab = math.log(4 + 2) - math.log(2 + 1)
    nll_ba = math.log(2 + 2) - math.log(1 + 1)
    nll_aa = math.log(4 + 2) - math.log(1 + 1)
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "mean_bi_nll"] == pytest.approx(
        (2 * nll_ab + nll_ba) / 3, abs=1e-6)
    assert out.loc[1, "n_bigrams"] == 1
    assert out.loc[1, "mean_bi_nll"] == pytest.approx(nll_aa, abs=1e-6)
    # single-token / empty docs score 0 with n_bigrams 0
    out2 = bigram_surprisal(rd.from_arrow(_tbl(["solo", ""]))) \
        .to_pandas().set_index("doc_id")
    assert out2["n_bigrams"].tolist() == [0, 0]
    assert out2["mean_bi_nll"].tolist() == [0.0, 0.0]
    # min_count pruning: every bigram below the cut scores as unseen
    # (ln(c2+1) term drops to 0) -> strictly higher surprisal
    pruned = bigram_surprisal(rd.from_arrow(_tbl(["a b a b", "a a"])),
                              min_count=5).to_pandas().set_index("doc_id")
    assert pruned.loc[0, "mean_bi_nll"] > out.loc[0, "mean_bi_nll"]


def test_decontaminate_flags_only_real_overlap(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.webtext import decontaminate

    # doc 7 is the eval slice (doc_id % 10 == 7). doc 1 shares its full
    # 8-gram; doc 2 shares a 7-token prefix only (no 8-gram); doc 3 is
    # disjoint.
    eval_text = "e1 e2 e3 e4 e5 e6 e7 e8 tail1 tail2"
    ds = rd.from_arrow(_tbl(
        [
            "x0 e1 e2 e3 e4 e5 e6 e7 e8 x1",   # contains eval 8-gram
            "e1 e2 e3 e4 e5 e6 e7 zz",          # 7-token overlap only
            "u1 u2 u3 u4 u5 u6 u7 u8 u9",       # disjoint
            eval_text,
        ],
        ids=[1, 2, 3, 7],
    ))
    out = decontaminate(ds).to_pandas().set_index("doc_id")
    assert 7 not in out.index  # eval docs excluded from training output
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_hit"] == 1
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[3, "contaminated"] == 0
    assert out.loc[3, "n_grams"] == 2  # 9 tokens -> 2 distinct 8-grams


def test_corpus_filter_reason_precedence(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.webtext import corpus_filter

    filler = ("the data of table and value for index in row stream it "
              "is that a to batch sort key scan merge part hash fast")
    repetitive = " ".join(["loop the data of"] * 20)
    ds = rd.from_arrow(_tbl(
        [
            filler,                    # good -> keep
            "tiny doc",                # too_short
            repetitive,                # long + stopwords but 3-gram dups
            "held out benchmark prompt with its own answer words only",
            # ^ eval id -> eval_holdout (disjoint from training docs)
        ],
        ids=[0, 1, 2, 17],
    ))
    out = corpus_filter(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "keep"] == 1 and out.loc[0, "reason"] == ""
    assert out.loc[1, "reason"] == "too_short"
    assert out.loc[2, "reason"] == "repetitive"
    assert out.loc[17, "reason"] == "eval_holdout"
    assert (out["keep"] == (out["reason"] == "").astype(int)).all()


def test_source_stats_agg(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.webtext import source_stats

    t = pa.table({
        "text": pa.array(["dup", "dup", "uniq", "other"], pa.string()),
        "lang": pa.array(["en", "de", "en", "fr"], pa.string()),
        "source": pa.array(["s1", "s1", "s1", "s2"], pa.string()),
        "n_chars": pa.array([3, 3, 4, 5], pa.int64()),
    })
    out = (source_stats(rd.from_arrow(t)).to_pandas()
           .set_index("source").sort_index())
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "n_langs"] == 2
    assert out.loc["s1", "total_chars"] == 10
    assert out.loc["s1", "dup_text_frac"] == pytest.approx(1 - 2 / 3,
                                                           abs=1e-6)
    assert out.loc["s2", "dup_text_frac"] == 0.0
    assert out.loc["s2", "mean_chars"] == 5.0


def test_curate_job_partitions_and_matches_filter(ray_session, tmp_path):
    """The curate CLI writes keep-partitioned parquet whose decisions
    equal the corpus_filter pipeline's, with all input columns kept."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.functions.webtext import corpus_filter

    filler = ("the data of table and value for index in row stream it "
              "is that a to batch sort key scan merge part hash fast")
    texts = [f"{filler} doc{i}" for i in range(12)] + ["small", "tiny one"]
    texts[7] = "held out benchmark prompt with its own answer words only"
    t = pa.table({
        "doc_id": pa.array(range(14), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 14, pa.string()),
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(t, src)
    out = tmp_path / "curated"
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "curate",
         "--input", str(src), "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["reasons"].get("kept", 0) >= 1
    assert rep["reasons"].get("too_short", 0) == 2

    import pyarrow.dataset as pds

    got = (pds.dataset(str(out), format="parquet", partitioning="hive")
           .to_table().to_pandas().sort_values("doc_id"))
    want = (corpus_filter(rd.from_arrow(t)).to_pandas()
            .sort_values("doc_id"))
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert [int(k) for k in got["keep"]] == list(want["keep"])
    assert list(got["reason"]) == list(want["reason"])
    assert "lang" in got.columns  # extra input columns survive
    kept = pds.dataset(str(out / "keep=1"), format="parquet").to_table()
    assert kept.num_rows == int(want["keep"].sum())


def test_stratified_sample_determinism_and_rates(ray_session):
    import ray.data as rd

    from search_engine_ray.functions.webtext import (
        StratifiedSampleBatch,
        stratified_sample,
    )

    n = 4000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % 2}" for i in range(n)], pa.string()),
    })
    # explicit rates: s0 kept at ~30%, s1 dropped entirely
    out = stratified_sample(rd.from_arrow(t),
                            rates={"s0": 0.3}).to_pandas()
    assert set(out["source"]) == {"s0"}
    frac = len(out) / (n / 2)
    assert 0.25 < frac < 0.35
    # determinism: re-running yields the identical sample
    out2 = stratified_sample(rd.from_arrow(t),
                             rates={"s0": 0.3}).to_pandas()
    assert list(out["doc_id"]) == list(out2["doc_id"])
    # different seed yields a different (same-rate) sample
    out3 = stratified_sample(rd.from_arrow(t), seed=99,
                             rates={"s0": 0.3}).to_pandas()
    assert list(out["doc_id"]) != list(out3["doc_id"])
    # hash-derived demo rates stay in [1/8, 1/2]
    b = StratifiedSampleBatch()
    for s in ("s0", "s1", "anything"):
        assert 1 / 8 <= b.rate_of(s) <= 1 / 2


def test_line_clean_c4_rules():
    from search_engine_ray.functions.webtext import LineCleanBatch

    doc = ("This is a proper sentence with enough words.\n"
           "short line.\n"                         # < 3 words
           "no terminal punctuation here at all\n"  # no punct
           "Enable JavaScript to view this page.\n"  # blocklist
           "Another good sentence stays here!\n"
           "Is this a question with words?  ")       # trailing ws ok
    out = LineCleanBatch()(_tbl([doc, ""])).to_pydict()
    assert out["clean_text"][0] == (
        "This is a proper sentence with enough words.\n"
        "Another good sentence stays here!\n"
        "Is this a question with words?  ")
    assert out["n_lines_kept"][0] == 3
    assert out["n_lines_total"][0] == 6
    assert out["clean_text"][1] == "" and out["n_lines_total"][1] == 0


def test_sequence_pack_vs_cumsum_and_range_invariance(ray_session):
    """Packing equals the straight global cumsum rule and is invariant
    to the range partition size (the distributed-scan correctness
    property)."""
    import ray.data as rd

    from search_engine_ray.functions.textstats import token_regex
    from search_engine_ray.functions.webtext import sequence_pack

    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{int(x)}" for x in
                      rng.integers(0, 50, size=int(rng.integers(0, 60))))
             for _ in range(300)]
    # non-contiguous, shuffled doc ids — ranges must not assume density
    ids = (np.arange(300) * 7 + 13)
    rng.shuffle(ids)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    tok = token_regex()
    order = np.argsort(ids)
    nt = np.array([len(tok.findall(texts[i])) for i in order])
    before = np.cumsum(nt) - nt
    want = dict(zip(ids[order].tolist(), (before // 100).tolist()))
    for range_size in (37, 1000, 10**9):
        got = sequence_pack(rd.from_arrow(t), budget=100,
                            range_size=range_size).to_pandas()
        assert len(got) == 300
        for row in got.itertuples(index=False):
            assert row.pack_id == want[row.doc_id], (range_size, row)


def test_repetition_vs_bruteforce_random(ray_session):
    """Randomized cross-check of the vectorized-ish batch kernel against
    an independent per-doc brute force."""
    from collections import Counter

    from search_engine_ray.functions.textstats import token_regex
    from search_engine_ray.functions.webtext import RepetitionStatsBatch

    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(12)]
    texts = []
    for _ in range(60):
        n = int(rng.integers(0, 40))
        words = rng.choice(vocab, size=n).tolist()
        # random newlines
        s = " ".join(words)
        if n and rng.random() < 0.5:
            parts = s.split(" ")
            cut = int(rng.integers(1, max(2, n)))
            s = " ".join(parts[:cut]) + "\n" + " ".join(parts[cut:])
        texts.append(s)
    out = RepetitionStatsBatch()(_tbl(texts)).to_pydict()
    tok = token_regex()
    for i, t in enumerate(texts):
        toks = tok.findall(t)
        if len(toks) >= 3:
            tg = Counter(zip(toks, toks[1:], toks[2:]))
            want = 1 - len(tg) / (len(toks) - 2)
        else:
            want = 0.0
        assert out["dup_3gram_frac"][i] == pytest.approx(want, abs=1e-6), i


def test_redact_patterns_and_sequential_counts(ray_session):
    """Synthetic PII: emails and IPs redact with typed placeholders;
    counts are sequential (an email's host part must NOT later count as
    a deny-term hit because it was already rewritten)."""
    import ray.data as rd

    from search_engine_ray.functions.webtext import redact

    docs = rd.from_items([
        {"doc_id": 1,
         "text": "mail bob.smith+x@corp.example.org or 10.0.254.3 now"},
        {"doc_id": 2, "text": "no pii here javascript twice javascript"},
        {"doc_id": 3, "text": "edge 999.1.1.1 and a@b.co and x@y"},
        {"doc_id": 4, "text": None},
    ])
    out = {r["doc_id"]: r for r in
           redact(docs, deny_terms=("javascript",)).take_all()}
    assert out[1]["redacted_text"] == "mail <EMAIL> or <IP> now"
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_denied"]) == (1, 1, 0)
    assert out[2]["redacted_text"] == "no pii here <TERM> twice <TERM>"
    assert out[2]["n_denied"] == 2
    # 999.1.1.1 still matches the dotted-quad shape (no range check —
    # same in both engines); x@y has no TLD, so only a@b.co redacts
    assert out[3]["n_email"] == 1 and out[3]["n_ip"] == 1
    assert "x@y" in out[3]["redacted_text"]
    assert out[4]["redacted_text"] == ""


def test_line_dedup_global_first_occurrence_wins(ray_session):
    """Cross-doc and within-doc duplicate lines collapse to the single
    first occurrence (min doc_id, then min line_no); empty lines are
    structure and always survive; null text -> empty output."""
    import ray.data as rd

    from search_engine_ray.functions.webtext import line_dedup

    docs = rd.from_items([
        {"doc_id": 1, "text": "alpha\n\nbeta\nalpha"},
        {"doc_id": 2, "text": "beta\ngamma"},
        {"doc_id": 3, "text": None},
    ])
    out = {r["doc_id"]: r for r in line_dedup(docs).take_all()}
    assert out[1]["clean_text"] == "alpha\n\nbeta"
    assert (out[1]["n_lines_kept"], out[1]["n_lines_removed"]) == (3, 1)
    assert out[2]["clean_text"] == "gamma"
    assert (out[2]["n_lines_kept"], out[2]["n_lines_removed"]) == (1, 1)
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_lines_kept"], out[3]["n_lines_removed"]) == (0, 0)


def test_tfidf_topk_handcrafted(ray_session):
    """Hand-computed smoothed tf-idf; equal-score tie breaks term-asc."""
    import math

    import ray.data as rd

    from search_engine_ray.functions.webtext import tfidf_topk

    docs = rd.from_items([
        {"doc_id": 1, "text": "apple apple banana"},
        {"doc_id": 2, "text": "banana cherry"},
        {"doc_id": 3, "text": "cherry cherry cherry"},
    ])
    out = tfidf_topk(docs, k=3).to_pandas().sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    idf1 = math.log(4 / 2) + 1   # df=1
    idf2 = math.log(4 / 3) + 1   # df=2
    want = [
        (1, "apple", 2 * idf1, 1), (1, "banana", idf2, 2),
        (2, "banana", idf2, 1), (2, "cherry", idf2, 2),  # tie -> term asc
        (3, "cherry", 3 * idf2, 1),
    ]
    assert len(out) == len(want)
    for row, (d, term, s, r) in zip(out.itertuples(index=False), want):
        assert (row.doc_id, row.term, row.rank) == (d, term, r)
        assert abs(row.tfidf - round(s, 6)) < 2e-6


def test_length_quantiles_vs_numpy_sort(ray_session):
    """Random per-source lengths: the histogram-merge quantiles equal the
    value at 1-indexed position ceil(q*n) of a literal sort."""
    import math

    import numpy as np
    import ray.data as rd

    from search_engine_ray.functions.webtext import (
        QUANTILE_PCTS,
        length_quantiles,
    )

    rng = np.random.default_rng(11)
    items = []
    want = {}
    for s, n in [("a", 997), ("b", 100), ("c", 1)]:
        lens = rng.integers(0, 50, size=n)  # small domain -> heavy ties
        items += [{"source": s, "n_chars": int(x)} for x in lens]
        srt = np.sort(lens)
        want[s] = (n, [int(srt[math.ceil(p / 100 * n) - 1])
                       for p in QUANTILE_PCTS])
    out = length_quantiles(rd.from_items(items)).to_pandas()
    assert len(out) == 3
    for row in out.itertuples(index=False):
        n, qs = want[row.source]
        assert row.n_docs == n
        assert [row.p25, row.p50, row.p75, row.p90, row.p99] == qs


def test_chunk_docs_window_invariants(ray_session):
    """Chunk reconstruction invariants on random docs: stride spacing,
    full coverage (concatenation of de-overlapped chunks == token
    stream), no fully-redundant tail chunk, zero-token docs vanish."""
    import numpy as np
    import ray.data as rd

    from search_engine_ray.functions.webtext import chunk_docs

    rng = np.random.default_rng(5)
    docs = [{"doc_id": i,
             "text": " ".join(f"w{rng.integers(0, 9)}"
                              for _ in range(int(n)))}
            for i, n in enumerate(rng.integers(0, 120, size=40))]
    docs.append({"doc_id": 99, "text": ""})
    mx, ov = 32, 8
    stride = mx - ov
    out = chunk_docs(rd.from_items(docs), mx, ov).to_pandas()
    assert 99 not in set(out["doc_id"])
    for d in docs:
        toks = d["text"].split()
        sub = out[out["doc_id"] == d["doc_id"]].sort_values("chunk_id")
        if not toks:
            assert len(sub) == 0
            continue
        n = len(toks)
        want_nc = 1 if n <= mx else 1 + -(-(n - mx) // stride)
        assert len(sub) == want_nc
        rebuilt = []
        for cid, ctext, cn in zip(sub["chunk_id"], sub["chunk_text"],
                                  sub["n_tokens_chunk"]):
            ctoks = ctext.split()
            assert len(ctoks) == cn
            assert ctoks == toks[cid * stride: cid * stride + mx][:cn]
            rebuilt.extend(ctoks[ov:] if cid else ctoks)
        # chunks start on the stride grid, so dropping each non-first
        # chunk's ``ov`` overlap tokens rebuilds the exact stream
        assert rebuilt == toks


def test_corpus_shuffle_dense_rank_and_determinism(ray_session):
    """pos is a dense 0..n_s-1 rank per shard, equals the brute-force
    sort of the per-doc hashes, and reproduces exactly across runs
    (pure per-row hash keys — cluster-size/retry independent)."""
    import numpy as np
    import ray.data as rd

    from search_engine_ray.functions.webtext import _md5_low61, corpus_shuffle

    docs = [{"doc_id": i, "text": "x"} for i in range(777)]
    out = corpus_shuffle(rd.from_items(docs), n_shards=4,
                         n_ranges=8).to_pandas()
    out2 = corpus_shuffle(rd.from_items(docs), n_shards=4,
                          n_ranges=3).to_pandas()  # range count is
    # an internal partitioning knob — results must not depend on it
    key = {i: _md5_low61(f"{i}:shuf:13") for i in range(777)}
    assert len(out) == 777
    for s, sub in out.groupby("shard_id"):
        sub = sub.sort_values("pos")
        assert sub["pos"].tolist() == list(range(len(sub)))
        want = sorted(sub["doc_id"], key=lambda d: (key[d], d))
        assert sub["doc_id"].tolist() == want
        assert all(key[d] % 4 == s for d in sub["doc_id"])
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_line_dedup_tolerates_duplicate_doc_id_rows(ray_session):
    """Two input rows sharing one doc_id must not CRASH the vectorized
    reassembly (round-5 code review: pd.Index.get_indexer raises on a
    non-unique index; the fix factorizes to value codes). Semantics
    with duplicate ids match the r4 loop: removals key on the doc_id
    VALUE, so the twin rows' identical (doc_id, line_no) triplets mark
    each other as removals — both rows empty out (doc_id is the
    identity key; duplicates are contract-violating input, the
    guarantee is one output row per input row, no crash)."""
    import ray.data as rd

    from search_engine_ray.functions.webtext import line_dedup

    docs = [
        {"doc_id": 1, "text": "alpha\nshared line\nbeta"},
        {"doc_id": 1, "text": "alpha\nshared line\nbeta"},  # dup row
        {"doc_id": 2, "text": "shared line\ngamma"},
    ]
    out = line_dedup(rd.from_items(docs), num_buckets=2).to_pandas()
    assert len(out) == 3
    assert set(out[out.doc_id == 1].clean_text) == {""}
    two = out[out.doc_id == 2].iloc[0]
    assert two.clean_text == "gamma" and two.n_lines_removed == 1


def test_line_dedup_no_duplicates_is_identity(ray_session):
    """A corpus with zero duplicate lines must pass through unchanged
    (exercises the empty-removals side of the union: every line-hash
    bucket emits an empty frame)."""
    import ray.data as rd

    from search_engine_ray.functions.webtext import line_dedup

    docs = [{"doc_id": i, "text": f"unique line {i}\nsecond {i}"}
            for i in range(50)]
    out = {r["doc_id"]: r for r in
           line_dedup(rd.from_items(docs)).take_all()}
    assert len(out) == 50
    for d in docs:
        r = out[d["doc_id"]]
        assert r["clean_text"] == d["text"]
        assert r["n_lines_removed"] == 0 and r["n_lines_kept"] == 2


def test_quality_buckets_ntile_semantics(ray_session, tmp_path):
    """Per-source ntile: bucket sizes differ by at most one, the first
    (n mod k) buckets are the larger ones (SQL ntile), and lower
    mean_nll (more probable text) always lands in a lower-or-equal
    bucket."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.documents import quality_buckets_docs

    # 7 docs in source a (7 = 3*2+1 -> sizes 3,2,2), 2 docs in source b
    rows = []
    for i in range(7):
        rows.append((i, "word " * (i + 1) + f"uniq{i}", "a"))
    rows += [(100, "xx yy", "b"), (101, "zz " * 30, "b")]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = quality_buckets_docs(str(tmp_path)).to_pandas()
    a = out[out["source"] == "a"]
    sizes = a["bucket"].value_counts().sort_index().tolist()
    assert sizes == [3, 2, 2]
    b = out[out["source"] == "b"]
    assert sorted(b["bucket"]) == [1, 2]  # n < k -> one row per bucket
    # monotonicity vs the surprisal ordering
    from search_engine_ray.pipelines.documents import (
        unigram_surprisal_scores,
    )
    nll = (unigram_surprisal_scores(str(tmp_path)).to_pandas()
           .set_index("doc_id")["mean_nll"])
    a = a.assign(nll=[nll[d] for d in a["doc_id"]]).sort_values(
        ["nll", "doc_id"])
    assert list(a["bucket"]) == sorted(a["bucket"])


def test_corpus_mix_budget_and_order(ray_session):
    """corpus_mix == a literal pandas reimplementation (hash order,
    inclusive-cumsum cut per source), drops unlisted sources, and the
    cut truncates at the first doc that would overflow the target."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from search_engine_ray.functions.webtext import corpus_mix

    rng = np.random.default_rng(5)
    rows = []
    for d in range(120):
        src = f"s{d % 4}"
        n = int(rng.integers(1, 30))
        rows.append((d, src, " ".join(f"w{i}" for i in range(n))))
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    weights = {"s0": 0.5, "s1": 0.25, "s2": 0.25}  # s3 dropped
    budget = 400
    got = (corpus_mix(rd.from_pandas(df), weights, budget, n_ranges=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def key(d):
        return int.from_bytes(
            hashlib.md5(f"{d}:mix:13".encode()).digest()[8:],
            "little") % (1 << 61)

    want = []
    df["n"] = df["text"].str.split().str.len()
    for src, w in weights.items():
        g = df[df["source"] == src].copy()
        g["k"] = g["doc_id"].map(key)
        g = g.sort_values(["k", "doc_id"])
        cum = g["n"].cumsum()
        kept = g[cum <= int(w * budget)]
        for (_, r), c in zip(kept.iterrows(), cum[cum <= int(w * budget)]):
            want.append((r["doc_id"], src, r["n"], int(c)))
    want = sorted(want)
    assert list(map(tuple, got[["doc_id", "source", "n_tokens",
                                "cum_tokens"]].itertuples(index=False))) \
        == want
    assert set(got["source"]) <= set(weights)
    # per-source totals never exceed their targets
    tot = got.groupby("source")["n_tokens"].sum()
    for src, w in weights.items():
        assert tot.get(src, 0) <= int(w * budget)


def test_corpus_filter_fused_identical_to_composed(ray_session):
    """The fused single-tokenize CorpusFilterBatch must emit bit-identical
    (keep, reason) rows to the pre-fusion composition of the standalone
    signal stages, across every reason and threshold boundary."""
    import hashlib

    import ray
    import ray.data as rd

    from search_engine_ray.functions.webtext import (
        CorpusFilterBatch,
        CorpusFilterComposedBatch,
        eval_shingle_set,
    )

    # deterministic, varied corpus: short docs, low-quality (no stopwords,
    # low alpha), repetitive, contaminated (share eval 8-grams), eval-slice
    # docs, and healthy docs near the thresholds
    stop_filler = ("the data of table and value for index in row stream it "
                   "is that a to batch sort key scan merge part hash fast")
    eval_doc = "q1 q2 q3 q4 q5 q6 q7 q8 answer token stream with more words"
    texts, ids = [], []
    for i in range(120):
        h = int(hashlib.md5(f"cf:{i}".encode()).hexdigest(), 16)
        kind = h % 6
        if kind == 0:
            t = f"tiny {i}"
        elif kind == 1:
            t = " ".join(f"z{(h >> j) % 97}" for j in range(40))  # no stops
        elif kind == 2:
            t = " ".join([f"loop{i} the data of"] * (5 + h % 20))
        elif kind == 3:
            t = f"prefix {i} q1 q2 q3 q4 q5 q6 q7 q8 " + stop_filler
        elif kind == 4:
            t = stop_filler + f" extra{i} " + stop_filler[: h % 60]
        else:
            t = " ".join(stop_filler.split()[: 18 + h % 8]) + f" v{i}"
        texts.append(t)
        ids.append(10 * i)  # never % 10 == 7: only eval_doc is eval-slice
    ids[-1] = 1207  # one more eval id (% 10 == 7)
    texts[-1] = eval_doc
    ds = rd.from_arrow(_tbl(texts + [eval_doc], ids=ids + [7]))
    ev_ref = ray.put(eval_shingle_set(ds))
    batch = _tbl(texts + [eval_doc], ids=ids + [7])
    fused = CorpusFilterBatch(ev_ref).__call__(batch).to_pydict()
    composed = CorpusFilterComposedBatch(ev_ref).__call__(batch).to_pydict()
    assert fused == composed
    assert set(composed["reason"]) == {
        "", "eval_holdout", "too_short", "low_quality", "repetitive",
        "contaminated"}
