"""pool.cached_stage semantics: per-worker instance reuse, per-wrapper
isolation, bounded cache, and end-to-end equivalence with the class
run as an actor pool."""

import numpy as np
import pyarrow as pa


class _CountingStage:
    """Test double: counts constructions (per process) and calls
    (per instance)."""

    constructions = 0

    def __init__(self, tag="t"):
        type(self).constructions += 1
        self.tag = tag
        self.calls = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.calls += 1
        return batch.append_column(
            "tag", pa.array([self.tag] * len(batch), pa.string()))


def test_cached_stage_reuses_one_instance_across_batches():
    from search_engine_ray.pool import cached_stage

    _CountingStage.constructions = 0
    fn = cached_stage(_CountingStage, tag="a")
    b = pa.table({"x": pa.array([1, 2], pa.int64())})
    out1, out2 = fn(b), fn(b)
    assert _CountingStage.constructions == 1  # built once, reused
    assert out1.column("tag").to_pylist() == ["a", "a"]
    assert out2.num_rows == 2


def test_cached_stage_wrappers_do_not_share_instances():
    from search_engine_ray.pool import cached_stage

    _CountingStage.constructions = 0
    fa = cached_stage(_CountingStage, tag="a")
    fb = cached_stage(_CountingStage, tag="b")
    b = pa.table({"x": pa.array([1], pa.int64())})
    assert fa(b).column("tag").to_pylist() == ["a"]
    assert fb(b).column("tag").to_pylist() == ["b"]
    assert _CountingStage.constructions == 2  # one per wrapper


def test_cached_stage_cache_is_bounded():
    from search_engine_ray import pool

    b = pa.table({"x": pa.array([1], pa.int64())})
    before = len(pool._STAGE_CACHE)
    for i in range(pool._STAGE_CACHE_MAX + 4):
        pool.cached_stage(_CountingStage, tag=str(i))(b)
    assert len(pool._STAGE_CACHE) <= pool._STAGE_CACHE_MAX
    assert before <= pool._STAGE_CACHE_MAX


def test_cached_stage_matches_actor_pool_end_to_end(ray_session):
    """The task-based twin must produce the same rows map_batches(Cls)
    produces — pinned on the deterministic embed stage."""
    import ray
    import ray.data as rd

    from search_engine_ray.functions.embed import EmbedBatch
    from search_engine_ray.pool import cached_stage

    t = pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array([f"doc number {i} with words" for i in range(50)],
                         pa.string()),
    })
    ds = rd.from_arrow(t)
    via_actors = ds.map_batches(
        EmbedBatch, fn_constructor_kwargs={"dim": 16, "seed": 3},
        batch_format="pyarrow", batch_size=16,
        concurrency=(1, 2)).to_pandas().sort_values("doc_id")
    via_tasks = rd.from_arrow(t).map_batches(
        cached_stage(EmbedBatch, dim=16, seed=3),
        batch_format="pyarrow", batch_size=16,
    ).to_pandas().sort_values("doc_id")
    assert list(via_actors.columns) == list(via_tasks.columns)
    for ca, ct in zip(via_actors["embedding"], via_tasks["embedding"]):
        assert np.allclose(np.asarray(ca), np.asarray(ct))
