"""Actor-based serving == LocalSearcher (both topologies)."""

import pytest

from search_engine_ray.search import LocalSearcher


@pytest.fixture(scope="module")
def served(ray_session, built_index):
    from search_engine_ray.serve import BucketShardServer, SearcherReplicaPool

    pool = SearcherReplicaPool(built_index, num_replicas=2)
    shards = BucketShardServer(built_index, num_shards=3)
    yield {"local": LocalSearcher(built_index), "pool": pool,
           "shards": shards}
    pool.shutdown()
    shards.shutdown()


QUERIES = [
    (["mila"], "exact"), (["mam"], "prefix"), (["bako", "kota"], "or"),
    (["zzz_none"], "exact"), (["sentinel00"], "prefix"),
    (["il"], "contains"),
    (["m?la"], "wildcard"), (["b*o"], "wildcard"),
    (["qqq*none"], "wildcard"),
    (["m.la"], "regex"), (["(bako|kota)"], "regex"),
    (["qqq.*none"], "regex"),
    (["milo"], "fuzzy"), (["milo", "bako"], "fuzzy"),
    (["mlo"], "fuzzy2"),
    (["mila", "mama"], "and"), (["mila", "zzz_missing"], "and"),
]


@pytest.mark.parametrize("q,st", QUERIES)
def test_replica_pool_matches_local(served, q, st):
    want = served["local"].search(q, st, k=20)
    got = served["pool"].search(q, st, k=20)
    assert got.equals(want)


@pytest.mark.parametrize("q,st", QUERIES)
def test_shard_server_matches_local(served, q, st):
    want = served["local"].search(q, st, k=20, with_urls=False)
    got = served["shards"].search(q, st, k=20)
    assert got.equals(want)


def test_pool_search_stream_matches_search(served):
    """search_stream (completion-driven dispatch) yields every request
    exactly once with results identical to the one-at-a-time path,
    regardless of completion order or window."""
    import ray

    reqs = QUERIES * 3
    want = [served["pool"].search(q, st, k=10) for q, st in reqs]
    for window, drain, refs in ((1, 1, False), (2, 4, False), (5, 8, True)):
        seen = {}
        dispatched = []
        for i, res in served["pool"].search_stream(
                reqs, k=10, window=window, drain=drain, yield_refs=refs,
                on_dispatch=dispatched.append):
            assert i not in seen
            seen[i] = ray.get(res) if refs else res
        assert sorted(seen) == list(range(len(reqs)))
        assert sorted(dispatched) == list(range(len(reqs)))
        for i, w in enumerate(want):
            assert seen[i].equals(w), (window, reqs[i])


def test_pool_search_stream_empty_and_short(served):
    assert list(served["pool"].search_stream([], k=5)) == []
    out = list(served["pool"].search_stream([(["mila"], "exact")], k=5))
    assert len(out) == 1 and out[0][0] == 0
    assert out[0][1].equals(served["pool"].search(["mila"], "exact", k=5))


def test_pool_concurrent_queries(served):
    import ray

    refs = [served["pool"].search_async(["mila"], "exact", 10, "taat")
            for _ in range(8)]
    results = ray.get(refs)
    first = results[0]
    assert all(r.equals(first) for r in results[1:])


def test_pool_cancel_inflight_query(served):
    """Q5: cancel() on an async search either cancels (TaskCancelledError)
    or the query already finished — never a hang, and the pool stays
    usable afterwards."""
    import ray

    ref = served["pool"].search_async(["mila"], "exact", 10, "taat")
    served["pool"].cancel(ref)
    try:
        ray.get(ref, timeout=30)
    except (ray.exceptions.TaskCancelledError, ray.exceptions.RayTaskError):
        pass  # cancelled before completion — the intended fast path
    # pool still serves queries after a cancellation
    after = served["pool"].search(["mila"], "exact", k=10)
    assert after.equals(served["local"].search(["mila"], "exact", k=10))
