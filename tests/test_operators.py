"""Unit tests for the operator library on tiny inline DataFrames
(SURVEY.md §5 strategy item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_player_analysis_spark.operators import (
    count_per_key,
    distinct_pairs,
    domain_completion,
    global_argmax,
    global_mean,
    having_count_distinct,
    key_universe,
    keyed_squared_difference,
    left_join_default,
    rank_vector_init,
    smoothed_avg,
    sum_affine,
    top_k,
    top_k_per_group,
)
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def duels(spark):
    # (challenger, challenged, score)
    rows = [
        (1, 2, 10),
        (1, 2, 20),
        (1, 3, 30),
        (2, 1, 40),
        (3, 4, 6),  # 4 never challenges
    ]
    return spark.createDataFrame(rows, "challenger long, challenged long, score long")


def test_count_per_key(duels):
    assert rows_set(count_per_key(duels, "challenger", alias="n")) == [
        (1, 3),
        (2, 1),
        (3, 1),
    ]


def test_smoothed_avg_matches_reference_formula(duels):
    # reference exercise_2.py:36: (sum+1)/(count+1)
    got = rows_set(smoothed_avg(duels, "challenger", "score", alias="s"))
    assert got == [
        (1, (60 + 1) / (3 + 1)),
        (2, (40 + 1) / (1 + 1)),
        (3, (6 + 1) / (1 + 1)),
    ]


def test_global_argmax_tie_breaks_on_id(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 1.0)], "id long, v double")
    assert rows_set(global_argmax(df, "id", "v")) == [(2, 5.0)]


def test_having_count_distinct(duels):
    got = rows_set(having_count_distinct(duels, "challenger", "challenged", 2, alias="n"))
    assert got == [(1, 2)]  # challenger 1 faced {2, 3}


def test_global_mean(duels):
    assert rows_set(global_mean(duels, "score", alias="m")) == [(106 / 5,)]


def test_sum_affine(duels):
    got = rows_set(sum_affine(duels, "challenger", "score", 0.1, 0.9, alias="hs"))
    assert got == [(1, 0.1 * 60 + 0.9), (2, 0.1 * 40 + 0.9), (3, 0.1 * 6 + 0.9)]


def test_distinct_pairs_and_reversal(duels):
    assert rows_set(distinct_pairs(duels, ["challenger", "challenged"])) == [
        (1, 2),
        (1, 3),
        (2, 1),
        (3, 4),
    ]
    assert rows_set(
        distinct_pairs(duels, ["challenger", "challenged"], reverse=True)
    ) == [(1, 2), (2, 1), (3, 1), (4, 3)]


def test_key_universe_and_rank_init(duels):
    got = rows_set(rank_vector_init(duels, ["challenger", "challenged"], "id", 1.0, "hs"))
    assert got == [(1, 1.0), (2, 1.0), (3, 1.0), (4, 1.0)]


def test_domain_completion(spark, duels):
    avg = smoothed_avg(duels, "challenger", "score", alias="s").withColumnRenamed(
        "challenger", "id"
    )
    universe = key_universe(duels, ["challenger", "challenged"], alias="id")
    out = domain_completion(avg, universe, "id", {"s": 1.0})
    got = dict((r.id, r.s) for r in out.collect())
    assert got[4] == 1.0  # player 4 never challenges -> prior
    assert got[1] == (60 + 1) / (3 + 1)
    assert len(got) == 4


def test_left_join_default(spark):
    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(1, 9.0)], "k long, v double")
    out = left_join_default(left, right, "k", {"v": 0.5})
    assert rows_set(out) == [(1, 9.0), (2, 0.5)]


def test_keyed_squared_difference(spark):
    a = spark.createDataFrame([(1, 3.0), (2, 1.0)], "k long, v double")
    b = spark.createDataFrame([(1, 1.0), (2, 1.0), (3, 7.0)], "k long, v double")
    # inner-join semantics: key 3 (missing in a) is dropped
    assert rows_set(keyed_squared_difference(a, b, "k", "v", alias="d")) == [
        (1, 4.0),
        (2, 0.0),
    ]


def test_top_k(spark):
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(50)], "id long, v double")
    got = top_k(df, [F.desc("v"), F.desc("id")], k=3).collect()
    assert [(r.id, r.v) for r in got] == [(48, 6.0), (41, 6.0), (34, 6.0)]


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("b", 4, 9.0)],
        "g string, id long, v double",
    )
    got = rows_set(top_k_per_group(df, ["g"], [F.desc("v"), F.asc("id")], k=2))
    assert got == [("a", 2, 2.0, 2), ("a", 3, 3.0, 1), ("b", 4, 9.0, 1)]


# ------------------------------------------------------- as-of / range joins


def test_asof_join_backward_semantics(spark):
    from big_data_player_analysis_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3"), (3, 10, "p4")],
        "uid long, t long, name string",
    ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 300, "c"), (2, 60, "d")],
        "uid long, t long, tag string",
    ).withColumn("t", F.timestamp_seconds("t"))
    got = {
        r.name: r.tag
        for r in asof_join(left, right, on="uid", left_ts="t", right_ts="t").collect()
    }
    # p1: right at exactly t=100 matches (<=); p2: latest <=205 is t=200;
    # p3: right t=60 > 50 -> no match; p4: uid 3 has no right rows
    assert got == {"p1": "a", "p2": "b", "p3": None, "p4": None}


def test_asof_join_tolerance(spark):
    from big_data_player_analysis_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 1000, "x")], "uid long, t long, name string"
        ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame([(1, 100, "old")], "uid long, t long, tag string"
        ).withColumn("t", F.timestamp_seconds("t"))
    with_tol = asof_join(left, right, on="uid", left_ts="t", right_ts="t",
                         tolerance_sec=60).first()
    without = asof_join(left, right, on="uid", left_ts="t", right_ts="t").first()
    assert with_tol.tag is None and without.tag == "old"


def test_range_join_matches_nonequi(spark):
    from big_data_player_analysis_spark.operators.joins import range_join

    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 12.5, 25.0, 49.9, 50.0, 99.9, 777.0])],
        "id long, v double",
    )
    # overlapping intervals and a gap: values in [25,50) match two bands
    ivals = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 25.0, 100.0)], "band long, lo double, hi double"
    )
    got = {(r.id, r.band) for r in range_join(fact, ivals, "v", bucket_width=10.0).collect()}
    want = {
        (i, b)
        for i, v in enumerate([0.0, 12.5, 25.0, 49.9, 50.0, 99.9, 777.0])
        for b, lo, hi in [(0, 0.0, 50.0), (1, 25.0, 100.0)]
        if lo <= v < hi
    }
    assert got == want


def test_salted_join_equals_plain_join(spark):
    from big_data_player_analysis_spark.operators.joins import salted_join

    big = spark.createDataFrame(
        [(k, i) for k in ("hot", "hot", "hot", "cold") for i in range(5)],
        "k string, payload long",
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2), ("unmatched", 3)], "k string, tag long")
    got = rows_set(salted_join(big, dim, on="k", num_salts=4))
    want = rows_set(big.join(dim, "k"))
    assert got == want


def test_hll_shard_merge_properties(spark, sf_small):
    """The rows-only entry's strong properties: the union of disjoint
    per-shard sketches is register-wise the whole-corpus sketch, so the
    merged estimate equals the single-pass estimate EXACTLY; both sit
    within the sketch's rated error of the exact distinct count."""
    from big_data_player_analysis_spark.operators.profiling import (
        hll_distinct_shard_merge,
    )

    from big_data_player_analysis_spark.catalog import load_table

    ev = load_table(spark, sf_small, "events")
    row = hll_distinct_shard_merge(ev, "user_id", "event_id").collect()[0]
    assert row.merged_estimate == row.single_pass_estimate
    rel_err = abs(row.merged_estimate - row.exact_distinct) / row.exact_distinct
    assert rel_err < 0.05


def test_distribution_ranks_matches_direct_window(spark):
    """The bucket-parallel ntile/percent_rank/cume_dist must equal the
    direct per-partition window bit-for-bit at every bucket count — on the
    real customer table AND on a synthetic frame whose groups are smaller
    than the tile count (the uneven-ntile edge: q=0, first-r-buckets)."""
    from pyspark.sql import Window

    from big_data_player_analysis_spark.catalog import load_table
    from big_data_player_analysis_spark.operators.topk import distribution_ranks

    def direct(df, part, val, tie):
        w = Window.partitionBy(part).orderBy(val, tie)
        return df.select(
            part,
            tie,
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cum_dist"),
        )

    cust = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    want = direct(cust, "c_nationkey", "c_acctbal", "c_custkey")
    for nb in (None, 1, 7):
        got = distribution_ranks(
            cust, "c_nationkey", "c_acctbal", "c_custkey", n_buckets=nb
        ).select("c_nationkey", "c_custkey", "quartile", "pct_rank", "cum_dist")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    tiny = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 2.0),  # value tie -> tiebreak
         ("b", 1, 5.0),                                 # n=1 group
         ("c", 1, 1.0), ("c", 2, 1.0), ("c", 3, 1.0), ("c", 4, 1.0),
         ("c", 5, 2.0), ("c", 6, 0.5),                  # n=6: uneven ntile
         ("a", 0, None), ("a", 4, float("nan")),        # null first, NaN last
         (None, 1, 3.0), (None, 2, 1.0), (None, 3, 2.0)],  # NULL partition
        "g string, k long, v double",
    )
    want2 = direct(tiny, "g", "v", "k")
    for nb in (None, 1, 3):
        got2 = distribution_ranks(tiny, "g", "v", "k", n_buckets=nb).select(
            "g", "k", "quartile", "pct_rank", "cum_dist"
        )
        assert got2.exceptAll(want2).count() == 0
        assert want2.exceptAll(got2).count() == 0


def test_key_skew_profile_planted(spark):
    """Histogram-interpolated exact percentiles on a planted distribution
    where the answers are known in closed form: 9 keys with 1 row each +
    one hot key with 91 rows -> n=10; p50 = 1.0; p90 interpolates rank
    8.1 between the last 1 and the 91: 1 + 0.1*90 = 10.0; p99 at rank
    8.91: 1 + 0.91*90 = 82.9."""
    from big_data_player_analysis_spark.operators.profiling import (
        key_skew_profile,
    )

    rows = [(k, i) for k in range(9) for i in range(1)] + [
        (99, i) for i in range(91)
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long")
    r = key_skew_profile(ev, "user_id").collect()[0]
    assert r.total_rows == 100
    assert r.distinct_keys == 10
    assert r.max_rows_per_key == 91
    assert abs(r.avg_rows_per_key - 10.0) < 1e-9
    assert r.p50_rows_per_key == 1.0
    assert abs(r.p90_rows_per_key - 10.0) < 1e-6
    assert abs(r.p99_rows_per_key - 82.9) < 1e-6
    assert abs(r.skew_factor - 9.1) < 1e-9
