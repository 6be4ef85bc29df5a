"""Hypothesis property tests for the session-4 per-bucket kernels.

These target the KERNEL functions (pure pandas/numpy, no Ray session),
so hypothesis can run hundreds of examples cheaply; the distributed
plumbing around them is covered by the randomized Ray tests in
test_entry_contract / test_join."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.webtext import _line_removals
from search_engine_ray.pipelines.events import _asof_bucket

rows_strategy = st.lists(
    st.tuples(st.integers(0, 6),      # line_hash (tiny domain -> dups)
              st.integers(0, 4),      # doc_id
              st.integers(1, 5)),     # line_no
    min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(rows_strategy)
def test_line_removals_keeps_exactly_first_occurrence(rows):
    # physical invariant: a (doc_id, line_no) slot holds ONE line, hence
    # one hash — keep the first generated hash per slot
    slot = {}
    for h, d, ln in rows:
        slot.setdefault((d, ln), h)
    g = pd.DataFrame(
        [(h, d, ln) for (d, ln), h in slot.items()],
        columns=["line_hash", "doc_id", "line_no"])
    if g.empty:
        g = pd.DataFrame({"line_hash": pd.Series(dtype="int64"),
                          "doc_id": pd.Series(dtype="int64"),
                          "line_no": pd.Series(dtype="int64")})
    out = _line_removals(g[["line_hash", "doc_id", "line_no"]].copy())
    removed = set(zip(out["doc_id"], out["line_no"]))
    for h, grp in g.groupby("line_hash"):
        occ = sorted(zip(grp["doc_id"], grp["line_no"]))
        assert occ[0] not in removed          # winner survives
        assert all(o in removed for o in occ[1:])
    assert len(out) == len(g) - g["line_hash"].nunique()


events_strategy = st.lists(
    st.tuples(st.integers(0, 3),              # user_id
              st.integers(0, 20),             # ts (coarse -> ties)
              st.sampled_from(["l", "r"])),   # side
    min_size=0, max_size=50)


@settings(max_examples=200, deadline=None)
@given(events_strategy)
def test_asof_bucket_matches_quadratic_scan(events):
    g = pd.DataFrame({
        "event_id": np.arange(len(events), dtype="int64"),
        "user_id": np.array([e[0] for e in events], dtype="int64"),
        "ts_us": np.array([e[1] for e in events], dtype="int64"),
        "event_type": [e[2] for e in events],
    })
    out = _asof_bucket(g, "l", "r")
    want = {}
    for e in g.itertuples(index=False):
        if e.event_type != "l":
            continue
        cand = [(r.ts_us, r.event_id) for r in g.itertuples(index=False)
                if r.event_type == "r" and r.user_id == e.user_id
                and r.ts_us <= e.ts_us]
        if cand:
            ct, cid = max(cand)
            want[e.event_id] = (ct, cid, e.ts_us - ct)
    assert set(out["event_id"]) == set(want)
    for r in out.itertuples(index=False):
        assert want[r.event_id] == (r.match_ts_us, r.match_event_id,
                                    r.lag_us)


def test_funnel_bucket_vs_per_user_fold():
    """_funnel_bucket (vectorized chained min-joins) == a literal
    per-user greedy fold on randomized event streams, including users
    missing any step and window boundary hits."""
    import numpy as np
    import pandas as pd

    from search_engine_ray.pipelines.events import _funnel_bucket

    steps = ("view", "click", "purchase")
    rng = np.random.default_rng(11)
    types = np.array(["view", "click", "purchase", "error"])
    n = 600
    g = pd.DataFrame({
        "user_id": rng.integers(0, 25, size=n),
        "event_type": types[rng.integers(0, 4, size=n)],
        "ts_us": rng.integers(0, 1000, size=n).astype("int64"),
    })
    window = 300
    got = (_funnel_bucket(g, steps, window)
           .sort_values("user_id").reset_index(drop=True))

    def fold(user):
        ev = g[g["user_id"] == user]
        ts = []
        prev = None
        for s in steps:
            cand = ev[ev["event_type"] == s]["ts_us"]
            if prev is not None:
                cand = cand[cand >= prev]
            if not len(cand):
                break
            prev = int(cand.min())
            ts.append(prev)
        stage = 0
        for i, t in enumerate(ts):
            if i == 0 or t - ts[0] <= window:
                stage = i + 1
            else:
                break
        return ts, stage

    for _, row in got.iterrows():
        ts, stage = fold(row["user_id"])
        assert row["stage"] == stage, row["user_id"]
        for i in range(3):
            v = row[f"t{i + 1}"]
            if i < len(ts):
                assert v == ts[i], (row["user_id"], i)
            else:
                assert pd.isna(v), (row["user_id"], i)


# --- BPE merge kernels (session-3) ------------------------------------------

words_strategy = st.dictionaries(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=40),
    min_size=1, max_size=30)


@settings(max_examples=40, deadline=None)
@given(words_strategy, st.integers(min_value=1, max_value=12))
def test_bpe_incremental_equals_full_recount(wc, k):
    from search_engine_ray.functions.bpe import (
        learn_bpe_local,
        reference_learn_bpe,
    )

    assert learn_bpe_local(wc, k, min_count=1) == \
        reference_learn_bpe(wc, k, min_count=1)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from("ab"), min_size=1, max_size=12))
def test_merge_word_fixed_points_and_segmentation(symbols):
    from search_engine_ray.functions.bpe import merge_word

    sym = tuple(symbols)
    out = merge_word(sym, ("a", "b"))
    # merging never changes the underlying character string
    assert "".join(out) == "".join(sym)
    # result contains no adjacent ("a", "b") pair
    assert all(not (x == "a" and y == "b") for x, y in zip(out, out[1:]))
    # idempotent
    assert merge_word(out, ("a", "b")) == out


# --- cursor pagination predicate (session-3) --------------------------------

scores_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.sampled_from([1.0, 2.0, 2.5, 3.0])),
    min_size=1, max_size=40, unique_by=lambda t: t[0])


@settings(max_examples=60, deadline=None)
@given(scores_strategy, st.integers(min_value=1, max_value=7))
def test_after_filter_paginates_without_skips_or_repeats(rows, page):
    from search_engine_ray.search import _after_filter, _topk_indices

    ids = np.array([i for i, _ in rows], dtype=np.int64)
    scs = np.array([s for _, s in rows], dtype=np.float64)
    full_order = np.lexsort((ids, -scs))
    full = list(zip(ids[full_order].tolist(), scs[full_order].tolist()))
    got, after = [], None
    for _ in range(30):
        fids, fscs = _after_filter(ids, scs, after)
        top = _topk_indices(fids, fscs, page)
        if not len(top):
            break
        chunk = list(zip(fids[top].tolist(), fscs[top].tolist()))
        got.extend(chunk)
        last_id, last_sc = chunk[-1][0], chunk[-1][1]
        # the cursor contract: (score, first ordinal STRICTLY after id)
        after = (last_sc, last_id + 1)
    assert got == full


pairgen_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),        # px group
        st.integers(min_value=0, max_value=(1 << 61)), # doc_id (61-bit)
        st.integers(min_value=1, max_value=40),        # n_sh
    ),
    min_size=0, max_size=120,
)


@given(pairgen_strategy,
       st.sampled_from([0.3, 0.5, 0.8, 1.0]))
@settings(max_examples=60, deadline=None)
def test_prefix_pairgen_superset_of_filters_quadratic(rows, threshold):
    """_prefix_bucket_pairs == the literal quadratic pair generator with
    the same length+positional filters, for ANY partition shape —
    including the size-2 fast path, duplicate (px, doc_id) rows, and
    61-bit ids. pos is derived < n_sh as in PrefixEmitBatch."""
    import math

    import numpy as np
    import pandas as pd

    from search_engine_ray.functions.dedup import _prefix_bucket_pairs

    # pos must be a valid prefix rank: pos < plen <= n_sh
    data = [(px, d, n, (d + px) % n) for px, d, n in rows]
    g = pd.DataFrame(data, columns=["px", "doc_id", "n_sh", "pos"])
    got = _prefix_bucket_pairs(g, threshold)
    got_set = set(zip(got["doc_a"], got["doc_b"]))

    want = set()
    dd = g.drop_duplicates(["px", "doc_id"]).sort_values(["px", "doc_id"])
    for _, grp in dd.groupby("px"):
        rs = list(grp.itertuples(index=False))
        for i in range(len(rs)):
            for j in range(i + 1, len(rs)):
                na, nb = rs[i].n_sh, rs[j].n_sh
                if min(na, nb) < threshold * max(na, nb):
                    continue
                ub = 1 + min(na - rs[i].pos - 1, nb - rs[j].pos - 1)
                alpha = math.ceil(
                    threshold * (na + nb) / (1.0 + threshold) - 1e-9)
                if ub < alpha:
                    continue
                want.add((rs[i].doc_id, rs[j].doc_id))
    assert got_set == want


# --- URL domain kernel vs the stdlib parser -----------------------------

_scheme = st.sampled_from(["http", "https", "ftp", "HTTP", "wss"])
_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz"
                          "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
                 min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-"))
_host = st.lists(_label, min_size=1, max_size=4).map(".".join)
_user = st.one_of(st.none(), st.sampled_from(["bob", "a:secret%40x"]))
_port = st.one_of(st.none(), st.integers(1, 65535))
_path = st.sampled_from(["", "/", "/a/b", "/p?q=1&r=2", "/x#frag",
                         "/%7Euser", "/a;b"])


@settings(max_examples=300, deadline=None)
@given(_scheme, _user, _host, _port, _path)
def test_domain_kernel_matches_urlsplit(scheme, user, host, port, path):
    """domain_of_batch == urllib.parse.urlsplit().hostname (+ one
    leading www. strip) for every reg-name URL hypothesis can build.
    (IPv6 bracket hosts are out of the kernel's scope — web corpora key
    on registered names; urlsplit is the independent reference.)"""
    import pyarrow as pa
    from urllib.parse import urlsplit

    from search_engine_ray.functions.urls import domain_of_batch

    url = scheme + "://"
    if user is not None:
        url += user + "@"
    url += host
    if port is not None:
        url += f":{port}"
    url += path
    want = (urlsplit(url).hostname or "").lower()
    want = want.removeprefix("www.")
    got = domain_of_batch(pa.array([url], pa.string())).to_pylist()[0]
    assert got == want, url
