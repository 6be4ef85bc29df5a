"""BPE tokenizer training: tier identity (reference recount == local
incremental == distributed Ray loop), determinism, encoding round trip,
CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.functions.bpe import (
    END,
    BpeEncodeBatch,
    bpe_encode_stats,
    encode_word,
    learn_bpe,
    learn_bpe_local,
    merge_word,
    reference_learn_bpe,
)


def _random_word_counts(seed: int, n_words: int = 120) -> dict[str, int]:
    rng = np.random.default_rng(seed)
    alphabet = list("abcdef")
    out = {}
    for _ in range(n_words):
        w = "".join(rng.choice(alphabet,
                               size=int(rng.integers(1, 8))))
        out[w] = out.get(w, 0) + int(rng.integers(1, 50))
    return out


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_local_matches_reference_recount(seed):
    wc = _random_word_counts(seed)
    for k in (1, 5, 25):
        assert learn_bpe_local(wc, k, min_count=1) == \
            reference_learn_bpe(wc, k, min_count=1)
    # min_count stops the loop identically
    assert learn_bpe_local(wc, 50, min_count=30) == \
        reference_learn_bpe(wc, 50, min_count=30)


def test_merge_word_non_overlapping():
    assert merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert merge_word(("a", "b", "a", "b"), ("a", "b")) == ("ab", "ab")
    assert merge_word(("x",), ("a", "b")) == ("x",)


def test_tie_break_is_lexicographic():
    # both pairs occur exactly once; END pairs too — the smallest
    # (left, right) must win deterministically
    wc = {"xy": 1, "xz": 1}
    m = reference_learn_bpe(wc, 1, min_count=1)
    assert m == learn_bpe_local(wc, 1, min_count=1)
    # "x","y" vs "x","z" vs ("y",END) vs ("z",END): all count 1;
    # lexicographic min is ("x","y")... unless END ("<") sorts first
    cands = [("x", "y"), ("x", "z"), ("y", END), ("z", END)]
    assert m[0][:2] == min(cands)


@pytest.fixture(scope="module")
def docs_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    root = tmp_path_factory.mktemp("bpe")
    from search_engine_ray.corpus import generate_pages

    pages = generate_pages(150, seed=5)
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = pa.table({
        "doc_id": pa.array(range(pages.num_rows), pa.int64()),
        "text": pc.fill_null(pages.column("text"), ""),
    })
    pq.write_table(docs, str(root / "docs.parquet"))
    return str(root / "docs.parquet")


def test_distributed_tier_matches_local(docs_dir):
    import ray.data as rd

    k = 6
    loc = learn_bpe(rd.read_parquet(docs_dir), k_merges=k, tier="local")
    dist = learn_bpe(rd.read_parquet(docs_dir), k_merges=k,
                     tier="distributed")
    assert loc.equals(dist)
    assert loc.num_rows == k
    # merge counts are non-increasing? NOT guaranteed for BPE in general
    # (a merged symbol can participate in a more frequent new pair), but
    # ranks must be 0..k-1 in order
    assert loc.column("rank").to_pylist() == list(range(k))


def test_encode_round_trip_and_compression(docs_dir):
    import ray.data as rd

    merges_t = learn_bpe(rd.read_parquet(docs_dir), k_merges=30,
                         tier="local")
    merges = list(zip(merges_t.column("left").to_pylist(),
                      merges_t.column("right").to_pylist()))
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("baba", "koba", "riba", "zz", "q"):
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w + END  # lossless segmentation
    # a head zipf word should compress below char-level
    assert len(encode_word("baba", ranks)) < len("baba") + 1
    # k=0 merges -> pure char-level encoding
    assert encode_word("abc", {}) == ["a", "b", "c", END]


def test_bpe_encode_stats_dataset(docs_dir):
    import ray.data as rd

    ds = rd.read_parquet(docs_dir)
    merges_t = learn_bpe(ds, k_merges=20, tier="local")
    stats = bpe_encode_stats(rd.read_parquet(docs_dir), merges_t)
    t = stats.take_all()
    assert len(t) == pq.read_metadata(docs_dir).num_rows
    for r in t:
        # pieces per word lie in [1, len+1]; totals must respect that
        assert r["n_bpe_pieces"] >= r["n_words"]
    # encoding under MORE merges never increases the piece count
    merges_more = learn_bpe(rd.read_parquet(docs_dir), k_merges=40,
                            tier="local")
    t2 = {r["doc_id"]: r["n_bpe_pieces"] for r in
          bpe_encode_stats(rd.read_parquet(docs_dir),
                           merges_more).take_all()}
    for r in t:
        assert t2[r["doc_id"]] <= r["n_bpe_pieces"]


def test_cli_train_bpe(docs_dir, tmp_path):
    out = str(tmp_path / "merges.parquet")
    env = {**os.environ, "RAY_GRAFT_CPUS": "2"}
    res = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "train-bpe",
         "--input", docs_dir, "--out", out, "-k", "8", "--tier", "local"],
        capture_output=True, text=True, env=env, check=True)
    rep = json.loads(res.stdout.strip().splitlines()[-1])
    assert rep["n_merges"] == 8
    t = pq.read_table(out)
    assert t.column_names == ["rank", "left", "right", "pair_count"]
    assert t.num_rows == 8


def test_mix_and_pack_with_bpe_budget(ray_session, docs_dir):
    """corpus_mix / sequence_pack budgeted in trained-BPE pieces: the
    n_tokens column equals bpe_encode_stats per doc, budgets hold."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.functions.webtext import corpus_mix, sequence_pack

    merges = learn_bpe(rd.read_parquet(docs_dir), k_merges=15,
                       tier="local")
    pieces = {r["doc_id"]: r["n_bpe_pieces"] for r in
              bpe_encode_stats(rd.read_parquet(docs_dir),
                               merges).take_all()}

    def docs_with_source():
        t = pq.read_table(docs_dir)
        src = ["s0" if d % 2 == 0 else "s1"
               for d in t.column("doc_id").to_pylist()]
        return rd.from_arrow(t.append_column(
            "source", pa.array(src, pa.string())))

    budget = 30_000
    rep = corpus_mix(docs_with_source(), {"s0": 0.6, "s1": 0.4}, budget,
                     bpe_merges=merges).to_pandas()
    assert len(rep) > 0
    for _, r in rep.iterrows():
        assert r["n_tokens"] == pieces[r["doc_id"]]
    per_src = rep.groupby("source")["n_tokens"].sum()
    assert per_src.get("s0", 0) <= int(0.6 * budget)
    assert per_src.get("s1", 0) <= int(0.4 * budget)

    packed = sequence_pack(rd.read_parquet(docs_dir), budget=2048,
                           bpe_merges=merges).to_pandas()
    for _, r in packed.iterrows():
        assert r["n_tokens"] == pieces[r["doc_id"]]
    # default (regex-word) counting still differs from BPE counting
    packed_words = sequence_pack(rd.read_parquet(docs_dir),
                                 budget=2048).to_pandas()
    assert (packed.set_index("doc_id")["n_tokens"]
            != packed_words.set_index("doc_id")["n_tokens"]).any()
