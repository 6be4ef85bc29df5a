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


def test_shard_doc_counts_sum(sharded_root, built_index):
    sharded = ShardedSearcher(sharded_root)
    single = LocalSearcher(built_index)
    assert sharded.n_docs == single.n_docs
    assert sum(sh.stats["n_docs"] if False else
               len(sh.ords()) for sh in sharded.shards) == single.n_docs
