"""Property-based tests (the reference's own TODO: "use quickcheck",
test/Spec.lhs:5): KevinFrame combinator pipelines vs a pure-Python model
of the reference semantics, on randomized small frames."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kevinlang_spark.frame import KevinFrame, SortOrder

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key: few distinct → ties
        st.integers(min_value=-100, max_value=100),  # value
        st.sampled_from(["a", "b", "c"]),  # tag
    ),
    min_size=1,
    max_size=12,
)


def _mk(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v", "t"])
    return KevinFrame.from_df(df.coalesce(1))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS, n=st.integers(min_value=0, max_value=14))
def test_sort_take_drop_model(spark, rows, n):
    """sort asc is stable; desc is its exact reverse (Combinator.hs:229);
    take/drop slice the sorted view."""
    kf = _mk(spark, rows)

    model_asc = sorted(rows, key=lambda r: r[0])  # python sort is stable
    got_asc = [tuple(r) for r in kf.sort("k").collect()]
    assert got_asc == model_asc

    got_desc = [tuple(r) for r in kf.sort("k", SortOrder.DESCENDING).collect()]
    assert got_desc == model_asc[::-1]

    assert [tuple(r) for r in kf.sort("k").take(n).collect()] == model_asc[:n]
    assert [tuple(r) for r in kf.sort("k").drop(n).collect()] == model_asc[n:]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS, cut=st.integers(min_value=-100, max_value=100))
def test_filter_groupby_melt_model(spark, rows, cut):
    """filter preserves order; groupby+sum comes out ascending by key;
    melt is var-major in frame order."""
    kf = _mk(spark, rows)

    kept = [r for r in rows if r[1] > cut]
    got = [tuple(r) for r in kf.filter("v", lambda c: c > cut).collect()]
    assert got == kept

    sums: dict[int, int] = {}
    for k, v, _ in rows:
        sums[k] = sums.get(k, 0) + v
    agg = kf.groupby("k").aggregate("sum", "v").collect()
    assert [(r["k"], r["v"]) for r in agg] == sorted(sums.items())

    melted = kf.melt(["t"], ["k", "v"]).collect()
    model = [(t, "k", float(k)) for k, v, t in rows] + [
        (t, "v", float(v)) for k, v, t in rows
    ]
    assert [(r["t"], r["variable"], r["value"]) for r in melted] == model


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key: collisions likely
        st.integers(min_value=0, max_value=40),  # start
        st.integers(min_value=1, max_value=15),  # length
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(iv=INTERVALS)
def test_merge_intervals_model(spark, iv):
    """Islands are disjoint with gaps between them, cover every input
    interval, and count every input exactly once — checked against a
    pure-Python sweep."""
    from kevinlang_spark.operators.events import merge_intervals

    rows = [(k, s, s + ln) for k, s, ln in iv]
    df = spark.createDataFrame(rows, ["k", "start", "end"])
    got = sorted(
        (r.k, r.island_start, r.island_end, r.n_merged)
        for r in merge_intervals(df, key="k").collect()
    )

    want = []
    by_k: dict = {}
    for k, s, e in rows:
        by_k.setdefault(k, []).append((s, e))
    for k, ivs in by_k.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > cur_e:
                want.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e, n = max(cur_e, e), n + 1
        want.append((k, cur_s, cur_e, n))
    assert got == sorted(want)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    costs=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=120),
)
def test_budget_sample_model(spark, costs, budget):
    """The selected set is exactly the minimal hash-order prefix whose
    total reaches the budget (or everything, if the budget exceeds the
    group total)."""
    import hashlib

    from kevinlang_spark.operators.sampling import budget_sample

    rows = [(i, "g", c) for i, c in enumerate(costs)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "cost"])
    got = sorted(
        r.doc_id
        for r in budget_sample(df, {"g": budget}, "source", "cost").collect()
    )

    order = sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    want, cum = [], 0
    for i, _, c in order:
        if cum >= budget:
            break
        want.append(i)
        cum += c
    assert got == sorted(want)
