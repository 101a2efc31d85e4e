"""Property-based tests (hypothesis): the as-of and range join operators
against brute-force Python reference implementations on random inputs —
catches boundary semantics (ties, exact-boundary values, empty groups) that
example-based tests miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=25
)


@SLOW
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    from big_data_player_analysis_spark.operators.joins import asof_join

    lrows = [(uid, t, i) for i, (uid, t) in enumerate(lrows)]
    # dedupe right on (uid, t) so the match is well-defined (same contract
    # the registry query establishes by pre-aggregating)
    rmap = {}
    for uid, t in rrows:
        rmap[(uid, t)] = max(rmap.get((uid, t), -1), uid * 1000 + t)
    rrows = [(uid, t, tag) for (uid, t), tag in rmap.items()]

    left = spark.createDataFrame(lrows, "uid long, t long, lid long").withColumn(
        "t", F.timestamp_seconds("t")
    )
    right = spark.createDataFrame(
        rrows or [(99, 0, 0)], "uid long, t long, tag long"
    ).withColumn("t", F.timestamp_seconds("t"))

    got = {
        r.lid: r.tag
        for r in asof_join(left, right, on="uid", left_ts="t", right_ts="t").collect()
    }
    want = {}
    for uid, t, lid in lrows:
        cands = [(rt, tag) for ruid, rt, tag in (rrows or [(99, 0, 0)]) if ruid == uid and rt <= t]
        want[lid] = max(cands)[1] if cands else None
    assert got == want


@SLOW
@given(
    vals=st.lists(st.floats(0, 100, allow_nan=False, width=32), min_size=1, max_size=25),
    ivals=st.lists(
        st.tuples(st.floats(0, 100, allow_nan=False, width=32), st.floats(0, 40, allow_nan=False, width=32)),
        min_size=1,
        max_size=8,
    ),
)
def test_range_join_matches_bruteforce(spark, vals, ivals):
    from big_data_player_analysis_spark.operators.joins import range_join

    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    intervals = spark.createDataFrame(
        [(b, float(lo), float(lo + w)) for b, (lo, w) in enumerate(ivals)],
        "band long, lo double, hi double",
    )
    got = {(r.id, r.band) for r in range_join(fact, intervals, "v", bucket_width=7.0).collect()}
    want = {
        (i, b)
        for i, v in enumerate(vals)
        for b, (lo, w) in enumerate(ivals)
        if lo <= v < lo + w
    }
    assert got == want
