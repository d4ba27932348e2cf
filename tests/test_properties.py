"""Property-based tests: the two latest-per-key physical strategies (window
rank vs max_by aggregation) must agree with a driver-side brute force on
ARBITRARY inputs — not just the fixture (SURVEY.md §5: the engine supplies
the test rigor the reference never had)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from weather_data_pipeline_spark.operators.flagship import (
    latest_per_key,
    latest_per_key_agg,
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (few → collisions)
        st.integers(min_value=0, max_value=50),  # order (ties likely)
        st.integers(min_value=0, max_value=10_000),  # tiebreak id
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[2],  # tiebreak id unique → total order
)


def brute_force(data):
    best = {}
    for key, order, tid, val in data:
        cur = best.get(key)
        if cur is None or (order, tid) > (cur[1], cur[2]):
            best[key] = (key, order, tid, val)
    return sorted(best.values())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows)
def test_latest_per_key_strategies_agree(spark, data):
    df = spark.createDataFrame(data, "key int, ord int, tid int, val double")
    expect = brute_force(data)
    w = sorted(
        tuple(r)
        for r in latest_per_key(df, "key", "ord", "tid")
        .select("key", "ord", "tid", "val")
        .collect()
    )
    a = sorted(
        tuple(r)
        for r in latest_per_key_agg(df, "key", "ord", "tid", ["val"])
        .select("key", "ord", "tid", "val")
        .collect()
    )
    assert w == expect
    assert a == expect
