"""Distributed join primitives vs literal pandas merges."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from search_engine_ray.functions.join import broadcast_join, bucketed_hash_join


def _mk(rng, n, key_lo, key_hi, key, val):
    return pd.DataFrame({
        key: rng.integers(key_lo, key_hi, size=n).astype("int64"),
        val: rng.integers(0, 1000, size=n).astype("int64"),
    })


@pytest.mark.parametrize("how", ["inner", "left"])
def test_bucketed_hash_join_vs_pandas(ray_session, how):
    """Random many-to-many keys (some left-only, some right-only): the
    one-exchange bucketed join equals a literal pandas merge."""
    rng = np.random.default_rng(17)
    lhs = _mk(rng, 800, 0, 120, "lk", "lv")     # keys 0..119
    rhs = _mk(rng, 500, 60, 180, "rk", "rv")    # keys 60..179
    got = (bucketed_hash_join(rd.from_pandas(lhs), rd.from_pandas(rhs),
                              left_on="lk", right_on="rk", how=how,
                              num_buckets=16)
           .to_pandas())
    want = lhs.merge(rhs, left_on="lk", right_on="rk", how=how)
    cols = ["lk", "lv", "rk", "rv"]
    assert sorted(got.columns) == sorted(want.columns)

    def canon(df):
        df = df[cols].copy()
        for c in cols:  # left-join nulls float both frames identically
            df[c] = df[c].astype("float64")
        return df.sort_values(cols, kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_bucketed_hash_join_rejects_column_collision(ray_session):
    a = rd.from_items([{"k": 1, "v": 2}])
    b = rd.from_items([{"k2": 1, "v": 3}])
    with pytest.raises(ValueError, match="collision"):
        bucketed_hash_join(a, b, left_on="k", right_on="k2")


def test_broadcast_join_vs_pandas(ray_session):
    rng = np.random.default_rng(3)
    big = _mk(rng, 1000, 0, 30, "k", "v")
    dim = pd.DataFrame({"dk": np.arange(0, 25, dtype="int64"),
                        "name": [f"n{i}" for i in range(25)]})
    got = (broadcast_join(rd.from_pandas(big), dim,
                          left_on="k", right_on="dk")
           .to_pandas()
           .sort_values(["k", "v"], kind="mergesort")
           .reset_index(drop=True))
    want = (big.merge(dim, left_on="k", right_on="dk")
            .sort_values(["k", "v"], kind="mergesort")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])


@pytest.mark.parametrize("anti", [False, True])
def test_semi_join_vs_pandas(ray_session, anti):
    """Semi/anti join == the literal isin filter; output columns are
    exactly the left's (incl. a string column), ints stay int64."""
    from search_engine_ray.functions.join import semi_join

    rng = np.random.default_rng(23)
    lhs = _mk(rng, 900, 0, 150, "doc_id", "v")
    lhs["label"] = [f"s{i % 7}" for i in range(len(lhs))]
    keys = pd.DataFrame({"doc_id": rng.integers(75, 220, size=300)
                        .astype("int64")})
    got = (semi_join(rd.from_pandas(lhs), rd.from_pandas(keys),
                     on="doc_id", anti=anti, num_buckets=8)
           .to_pandas())
    m = lhs["doc_id"].isin(set(keys["doc_id"]))
    want = lhs[~m if anti else m]
    assert list(got.columns) == list(lhs.columns)
    assert got["doc_id"].dtype.kind == "i" and got["v"].dtype.kind == "i"
    cols = ["doc_id", "v", "label"]
    pd.testing.assert_frame_equal(
        got.sort_values(cols, kind="mergesort").reset_index(drop=True),
        want.sort_values(cols, kind="mergesort").reset_index(drop=True))


def test_semi_join_keys_on_disjoint_name(ray_session):
    from search_engine_ray.functions.join import semi_join

    lhs = pd.DataFrame({"doc_id": np.arange(10, dtype="int64"),
                        "t": list("abcdefghij")})
    keys = pd.DataFrame({"kid": np.array([2, 5, 5, 99], dtype="int64")})
    got = semi_join(rd.from_pandas(lhs), rd.from_pandas(keys),
                    on="doc_id", keys_on="kid", num_buckets=4).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [2, 5]
    assert sorted(got.columns) == ["doc_id", "t"]


def test_semi_join_exact_above_2_53(ray_session):
    """61-bit keys (the repo's doc_id convention) survive the
    semi/anti join EXACTLY: the keys-side schema pad must not force
    the left's int columns through float64 (which silently rounds
    above 2^53 — caught by round-5 code review, repro'd live)."""
    from search_engine_ray.functions.join import semi_join

    base = 1 << 60
    left = pd.DataFrame({
        "doc_id": pd.array([base + 1, base + 3, base + 5, 7],
                           dtype="int64"),
        "payload": pd.array([base + 11, base + 13, base + 15, 17],
                            dtype="int64"),
    })
    keys = pd.DataFrame({"doc_id": pd.array([base + 1, 7, base + 9],
                                            dtype="int64")})
    got = semi_join(rd.from_pandas(left), rd.from_pandas(keys),
                    on="doc_id", num_buckets=4).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [7, base + 1]
    assert got["payload"].tolist() == [17, base + 11]
    assert got["doc_id"].dtype.kind == "i"
    anti = semi_join(rd.from_pandas(left), rd.from_pandas(keys),
                     on="doc_id", anti=True, num_buckets=4).to_pandas()
    assert sorted(anti["doc_id"]) == [base + 3, base + 5]


def test_bucketed_hash_join_exact_above_2_53(ray_session):
    """Same exactness claim for the full hash join: both sides' int64
    columns keep every bit through the tagged-union pad."""
    base = 1 << 60
    lhs = pd.DataFrame({"lk": pd.array([base + 1, base + 2, 3],
                                       dtype="int64"),
                        "lv": pd.array([base + 21, base + 22, 23],
                                       dtype="int64")})
    rhs = pd.DataFrame({"rk": pd.array([base + 1, 3], dtype="int64"),
                        "rv": pd.array([base + 31, 33], dtype="int64")})
    got = (bucketed_hash_join(rd.from_pandas(lhs), rd.from_pandas(rhs),
                              left_on="lk", right_on="rk",
                              num_buckets=4)
           .to_pandas().sort_values("lk").reset_index(drop=True))
    want = (lhs.merge(rhs, left_on="lk", right_on="rk")
            .sort_values("lk").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_semi_join_preserves_narrow_int_dtype(ray_session):
    """An int32 left column comes back int32 (schema contract:
    output columns == left's columns, types included)."""
    import pyarrow as pa

    from search_engine_ray.functions.join import semi_join

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "small": pa.array([10, 20, 30], pa.int32()),
    })
    keys = pa.table({"doc_id": pa.array([2, 3], pa.int64())})
    got = semi_join(rd.from_arrow(t), rd.from_arrow(keys),
                    on="doc_id", num_buckets=2)
    sch = got.take_batch(10, batch_format="pyarrow").schema
    assert sch.field("small").type == pa.int32()
