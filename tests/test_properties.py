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


binning_values = st.lists(
    st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32),
    min_size=4,
    max_size=60,
)


@SLOW
@given(vals=binning_values)
def test_quantile_binning_matches_bruteforce(spark, vals):
    """quantile_binning at sample_fraction=1.0 (every row sampled, so the
    boundaries are the exact interpolated quartiles) against a pure-Python
    reference: completeness (every input row exactly once), bucket
    monotone in value, bucket = 1 + #boundaries strictly below the value
    — including ties ON a boundary, duplicates, and all-equal inputs."""
    from big_data_player_analysis_spark.operators.profiling import (
        quantile_binning,
    )

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v double")
    out = quantile_binning(df, "k", "v", sample_fraction=1.0)
    got = {r.k: r.bucket for r in out.collect()}
    assert set(got) == {k for k, _ in rows}  # every row, exactly once

    # exact interpolated quartiles (numpy's 'linear' == Spark percentile)
    import numpy as np

    bounds = np.quantile(sorted(v for _, v in rows), [0.25, 0.5, 0.75])
    for k, v in rows:
        expect = 1 + sum(1 for b in bounds if v > b + 1e-9 * max(1, abs(b)))
        strict = 1 + sum(1 for b in bounds if v > b)
        # float tolerance: Spark's compare uses exact doubles; accept
        # either side only when v sits within interpolation ULP of a bound
        assert got[k] in {expect, strict}, (k, v, bounds, got[k])


gap_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(-5, 5)),
    min_size=1,
    max_size=30,
)


@SLOW
@given(rows=gap_rows)
def test_gap_fill_matches_bruteforce(spark, rows):
    """gap_fill_daily against a pure-Python replay on random sparse
    (key, day-offset, value) events: per key, one row per calendar day
    between its first and last observed day, filled_value = most recent
    observed DAILY SUM, is_gap exactly on unobserved days."""
    import datetime as dt

    from big_data_player_analysis_spark.operators.timeseries import (
        gap_fill_daily,
    )

    base = dt.datetime(2024, 3, 1)
    ev = [
        (k, base + dt.timedelta(days=d, hours=(i * 7) % 24), float(v))
        for i, (k, d, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(ev, "user_id int, ts timestamp, value double")
    got = {
        (r.user_id, r.day.date()): (r.filled_value, r.is_gap)
        for r in gap_fill_daily(df, "user_id", "ts", "value").collect()
    }

    # brute force: daily sums, then walk each key's calendar range
    daily: dict[tuple[int, dt.date], float] = {}
    for k, ts, v in ev:
        daily[(k, ts.date())] = daily.get((k, ts.date()), 0.0) + v
    expect = {}
    for k in {k for k, _ in daily}:
        days = sorted(d for kk, d in daily if kk == k)
        cur = None
        d = days[0]
        while d <= days[-1]:
            if (k, d) in daily:
                cur = daily[(k, d)]
                expect[(k, d)] = (cur, 0)
            else:
                expect[(k, d)] = (cur, 1)
            d += dt.timedelta(days=1)
    assert got == expect


span_docs = st.lists(
    st.lists(st.integers(0, 5), min_size=0, max_size=18),  # token ids
    min_size=1,
    max_size=12,
)


@SLOW
@given(docs=span_docs, k=st.integers(2, 4))
def test_duplicate_span_profile_matches_bruteforce(spark, docs, k):
    """Random small corpora over a tiny vocab (dense window collisions)
    against a pure-Python reference: every overlapping k-window occurring
    >= 2 times corpus-wide marks its interval; intervals merge per doc."""
    from collections import Counter

    from big_data_player_analysis_spark.operators.repetition import (
        duplicate_span_profile,
    )

    rows = [(i, " ".join(f"t{x}" for x in toks)) for i, toks in enumerate(docs)]
    toks = {d: t.split() for d, t in rows}
    c = Counter(
        tuple(ts[p : p + k]) for ts in toks.values() for p in range(len(ts) - k + 1)
    )
    want = {}
    for d, ts in toks.items():
        spans = []
        for p in range(len(ts) - k + 1):
            if c[tuple(ts[p : p + k])] >= 2:
                if spans and p <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], p + k)
                else:
                    spans.append([p, p + k])
        # the operator counts NULL/empty text as one empty token
        want[d] = (max(len(ts), 1), sum(e - s for s, e in spans), len(spans))
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.n_spans)
        for r in duplicate_span_profile(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            window_tokens=k,
        ).collect()
    }
    assert got == want


hh_counts = st.dictionaries(
    st.integers(0, 30), st.integers(1, 40), min_size=1, max_size=25
)


@SLOW
@given(counts=hh_counts, parts=st.integers(1, 6), k=st.integers(2, 12))
def test_heavy_hitters_mg_exact_on_random_multisets(spark, counts, parts, k):
    """Random multisets + random partition counts + random (small) k: the
    MG candidate pass must never lose a true phi-heavy item and the verify
    pass must return exactly GROUP BY/HAVING — for every k with
    phi > 1/(k+1) the answer is EXACT by construction."""
    import math

    from big_data_player_analysis_spark.operators.profiling import (
        heavy_hitters_mg,
    )

    phi = 0.25
    if phi <= 1.0 / (k + 1):
        return  # contract would raise; covered by the unit test
    n = sum(counts.values())
    t = math.ceil(phi * n)
    want = {f"i{x}": c for x, c in counts.items() if c >= t}
    rows = [(f"i{x}",) for x, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "gram string").repartition(parts)
    got = {
        r.gram: r.n
        for r in heavy_hitters_mg(df, "gram", phi=phi, k=k).collect()
    }
    assert got == want
