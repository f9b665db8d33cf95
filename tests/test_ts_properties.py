"""Property tests for the interval algebra operator: the Spark
coalesce must agree with a pure-Python sweep-line model on arbitrary
generated interval sets (SURVEY §5 item 4 style — model-based laws,
not fixtures)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row

from monitoring_data_ingestion_spark.operators.intervals import coalesce_intervals


def _model_merge(intervals):
    """Reference model: sort by (start, id), sweep, merge transitively."""
    out = []
    for s, e, _ in sorted(intervals, key=lambda t: (t[0], t[2])):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return [(s, e, n) for s, e, n in out]


interval_lists = st.lists(
    st.tuples(st.integers(0, 500), st.integers(1, 80)),  # (start, length)
    min_size=1,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(a=interval_lists, b=interval_lists)
def test_coalesce_matches_sweepline_model(spark, a, b):
    rows = []
    for key, ivs in (("a", a), ("b", b)):
        for i, (s, ln) in enumerate(ivs):
            rows.append(Row(k=key, i=i, s=s, e=s + ln))
    df = spark.createDataFrame(rows)
    got = {
        (r["k"], r["island"], r["merged_start"], r["merged_end"], r["n_intervals"])
        for r in coalesce_intervals(
            df, keys=["k"], start_col="s", end_col="e", tiebreak_col="i"
        ).collect()
    }
    want = set()
    for key, ivs in (("a", a), ("b", b)):
        model = _model_merge([(s, s + ln, i) for i, (s, ln) in enumerate(ivs)])
        for island, (s, e, n) in enumerate(model, start=1):
            want.add((key, island, s, e, n))
    assert got == want


def test_coalesce_bridging_long_interval(spark):
    """A long interval must bridge a gap that its successors' starts alone
    would break (the transitive running-max rule, not prev-end)."""
    df = spark.createDataFrame(
        [Row(k="x", i=0, s=0, e=100), Row(k="x", i=1, s=10, e=20), Row(k="x", i=2, s=50, e=60)]
    )
    out = coalesce_intervals(
        df, keys=["k"], start_col="s", end_col="e", tiebreak_col="i"
    ).collect()
    assert len(out) == 1 and out[0]["n_intervals"] == 3
    assert out[0]["merged_start"] == 0 and out[0]["merged_end"] == 100
