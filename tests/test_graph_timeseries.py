"""Planted-answer tests for the graph / time-series / string-similarity
operators added in round 4: triangle_count (degree-oriented node
iterator), gap_fill_daily (gap-explode densification), and
title_hamming_pairs (segment-pigeonhole Hamming join).
"""

from __future__ import annotations

import datetime
import itertools
import random

from pyspark.sql import functions as F

from big_data_player_analysis_spark.operators.dedup import title_hamming_pairs
from big_data_player_analysis_spark.operators.graph import (
    canonical_edges,
    triangle_count,
)
from big_data_player_analysis_spark.operators.timeseries import gap_fill_daily

from tests.conftest import rows_set


# ------------------------------------------------------------- triangles


def test_triangle_count_k4_plus_star(spark):
    """K4 has exactly 4 triangles; a star hub adds edges but none."""
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    star = [(10, leaf) for leaf in range(11, 16)]
    edges = spark.createDataFrame(k4 + star, ["a", "b"])
    row = triangle_count(edges, "a", "b").first()
    assert row.n_triangles == 4
    assert row.n_edges == len(k4) + len(star)
    assert row.n_nodes == 4 + 6


def test_triangle_count_canonicalization(spark):
    """Self-loops, duplicates, and reversed directions collapse: the
    triangle 1-2-3 given as a directed multigraph still counts once."""
    raw = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3), (3, 2)]
    edges = spark.createDataFrame(raw, ["a", "b"])
    assert rows_set(canonical_edges(edges, "a", "b")) == [
        (1, 2),
        (1, 3),
        (2, 3),
    ]
    assert triangle_count(edges, "a", "b").first().n_triangles == 1


def test_triangle_count_matches_bruteforce_random(spark):
    """Random G(n, p) graph vs itertools brute force."""
    rng = random.Random(7)
    nodes = list(range(20))
    edges = [
        (u, v)
        for u, v in itertools.combinations(nodes, 2)
        if rng.random() < 0.3
    ]
    eset = set(edges)
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    df = spark.createDataFrame(edges, ["a", "b"])
    assert triangle_count(df, "a", "b").first().n_triangles == expected


# -------------------------------------------------------------- gap fill


def _ts(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, 12, 30)


def test_gap_fill_plants_and_carries(spark):
    """User 1 observes days 1, 4, 5 -> days 2, 3 are gaps carrying day
    1's value; user 2 has a single day -> single non-gap row."""
    events = spark.createDataFrame(
        [
            (1, _ts(1), 10.0),
            (1, _ts(1), 5.0),  # same day, summed
            (1, _ts(4), 7.0),
            (1, _ts(5), 1.0),
            (2, _ts(9), 2.0),
        ],
        ["user_id", "ts", "value"],
    )
    out = gap_fill_daily(events, "user_id", "ts", "value")
    day0 = datetime.datetime(2024, 1, 1)

    def d(n):
        return day0 + datetime.timedelta(days=n - 1)

    assert rows_set(out) == sorted(
        [
            (1, d(1), 15.0, 0),
            (1, d(2), 15.0, 1),
            (1, d(3), 15.0, 1),
            (1, d(4), 7.0, 0),
            (1, d(5), 1.0, 0),
            (2, d(9), 2.0, 0),
        ],
        key=repr,
    )


def test_gap_fill_no_join_two_shuffles(spark):
    """The plan is the gap-explode formulation: no join operator, and
    exactly two exchanges (daily agg + the lead() window)."""
    events = spark.createDataFrame(
        [(1, _ts(1), 1.0), (1, _ts(3), 2.0)], ["user_id", "ts", "value"]
    )
    plan = (
        gap_fill_daily(events, "user_id", "ts", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 2, plan


# ------------------------------------------------------- hamming pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )


def test_title_hamming_planted(spark):
    texts = [
        "Breaking news: 2024 edition here",  # 0
        "Breaking news: 2025 edition here",  # 1: dist 1 vs 0 (in 24 chars)
        "Breaking news! 2025 edition",  # 2: dist 1 vs 1, dist 2 vs 0
        "completely different text",  # 3
        "short",  # 4
        "Short",  # 5: case-normalized dup of 4 -> dist 0
    ]
    out = title_hamming_pairs(_docs(spark, texts), "doc_id", "text")
    assert rows_set(out) == [(0, 1, 1), (0, 2, 2), (1, 2, 1), (4, 5, 0)]


def test_title_hamming_blocking_complete_random(spark):
    """Pigeonhole blocking loses no pair: compare against brute force
    over random low-alphabet strings (high collision rate)."""
    rng = random.Random(3)
    texts = [
        "".join(rng.choice("ab") for _ in range(24)) for _ in range(60)
    ]
    out = rows_set(
        title_hamming_pairs(_docs(spark, texts), "doc_id", "text")
    )
    expected = sorted(
        [
            (i, j, sum(1 for x, y in zip(a, b) if x != y))
            for (i, a), (j, b) in itertools.combinations(
                enumerate(texts), 2
            )
            if sum(1 for x, y in zip(a, b) if x != y) <= 2
        ],
        key=repr,
    )
    assert out == expected


def test_triangle_count_plan_no_cartesian(spark):
    """The wedge stage must be an equi-join on src (with the dst_key
    ordering as a residual) and the closing-edge probe an equi-join on
    (b, c) — never a cartesian product, never a global sort."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["a", "b"]
    )
    plan = (
        triangle_count(edges, "a", "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    # the only BroadcastNestedLoopJoins allowed are the two 1-row scalar
    # combines at the very top (counts x tri)
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
