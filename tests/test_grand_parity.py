"""Grand rank-identity sweep: random corpora x every search type x
filter/cursor combinations, engine vs the pure-Python oracle. One index
build per corpus; the sweep itself is warm-searcher work, so the matrix
stays wide without being slow."""

import os

import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages, vocabulary
from search_engine_ray.oracle import OracleIndex
from search_engine_ray.search import LocalSearcher

HEAD = vocabulary(50)


def _case_matrix():
    h0, h1, h2 = HEAD[0], HEAD[1], HEAD[2]
    types = [
        ("exact", [h0]), ("exact", ["zzznohit"]),
        ("or", [h0, h1, h2]), ("and", [h0, h1]),
        ("prefix", [h0[:2]]), ("contains", [h0[1:3]]),
        ("wildcard", [h0[0] + "*" + h0[-1]]),
        ("regex", [h0[0] + ".*" + h0[-1]]),
        ("regex", ["(" + h0 + "|" + h1 + ")"]),
        ("fuzzy", [h0[:-1] + "x"]), ("fuzzy2", [h0[:-2] + "xy"]),
    ]
    wheres = [None, {"lang": "en"}, {"lang": "de"},
              {"doc_len": (20, 300)}, {"lang": "en",
                                       "doc_len": (None, 250)}]
    return types, wheres


@pytest.mark.parametrize("seed", [101, 202])
def test_grand_parity_sweep(ray_session, tmp_path, seed):
    pages = generate_pages(250, seed=seed)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    idx = str(tmp_path / "index")
    build_index(str(pdir), idx, BuildConfig(num_buckets=8))
    s = LocalSearcher(idx)
    o = OracleIndex.build(pages)
    types, wheres = _case_matrix()
    n_checked = 0
    for st, qs in types:
        for where in wheres:
            for scorer in ("taat", "bmw"):
                if st == "and" and scorer == "bmw":
                    continue  # and routes to the intersection kernel
                eng = s.search(qs, st, k=15, where=where, scorer=scorer)
                orc = o.search(qs, st, k=15, where=where)
                assert eng.column("doc_id").to_pylist() == \
                    [d for d, _, _ in orc], (st, qs, where, scorer)
                assert eng.column("score").to_pylist() == \
                    [sc for _, sc, _ in orc], (st, qs, where, scorer)
                n_checked += 1
            # cursor continuation from the first page, both kernels
            eng = s.search(qs, st, k=7, where=where)
            if eng.num_rows:
                cur = (eng.column("score")[-1].as_py(),
                       eng.column("doc_id")[-1].as_py())
                page2 = s.search(qs, st, k=7, where=where,
                                 search_after=cur)
                full = o.search(qs, st, k=14, where=where)
                assert (eng.column("doc_id").to_pylist()
                        + page2.column("doc_id").to_pylist()
                        == [d for d, _, _ in full]), (st, qs, where)
                n_checked += 1
    assert n_checked > 60  # the sweep really ran wide


def test_grand_parity_facets_and_complete(ray_session, tmp_path):
    pages = generate_pages(200, seed=303)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    idx = str(tmp_path / "index")
    build_index(str(pdir), idx, BuildConfig(num_buckets=8))
    s = LocalSearcher(idx)
    o = OracleIndex.build(pages)
    for st, qs in [("or", [HEAD[0], HEAD[3]]), ("prefix", [HEAD[0][:2]]),
                   ("and", [HEAD[0]])]:
        for where in (None, {"lang": "en"}):
            t = s.facet_counts(qs, st, by="lang", where=where)
            assert list(zip(t.column("value").to_pylist(),
                            t.column("n_docs").to_pylist())) == \
                o.facet_counts(qs, st, by="lang", where=where)
            h = s.facet_histogram(qs, [0, 100, 250, 500], st,
                                  by="doc_len", where=where)
            assert list(zip(h.column("bin_lo").to_pylist(),
                            h.column("bin_hi").to_pylist(),
                            h.column("n_docs").to_pylist())) == \
                o.facet_histogram(qs, [0, 100, 250, 500], st,
                                  by="doc_len", where=where)
    for prefix in (HEAD[0][:1], HEAD[1][:2], "zz", ""):
        if not prefix:
            continue
        t = s.complete(prefix, k=12)
        assert list(zip(t.column("term").to_pylist(),
                        t.column("df").to_pylist())) == \
            o.complete(prefix, k=12)
