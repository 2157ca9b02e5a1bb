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
