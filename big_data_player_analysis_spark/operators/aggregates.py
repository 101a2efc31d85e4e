"""Aggregation operators (reference ops Q1-Q4, Q8, Q13, Q15, SURVEY.md §2.2).

Every operator is a declarative groupBy/agg so Catalyst emits a partial
HashAggregate before the shuffle (the map-side combine the reference
hand-writes as `fComb`, reference emulator.py:320-326) and a final
HashAggregate after — the scalable plan at any data size: shuffle volume is
O(groups), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_per_key(df: DataFrame, key: str | list[str], alias: str = "n") -> DataFrame:
    """Count rows per key (reference Q1/Q2: challenges per challenger/challenged,
    reference exercise_1.py:9-52). Map-side partial count -> shuffle O(keys)."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def smoothed_avg(
    df: DataFrame, key: str, value: str | Column, alias: str = "smoothed_avg"
) -> DataFrame:
    """Add-one (Laplace) smoothed average per key: (sum(v)+1)/(count+1)
    (reference Q4, exercise_2.py:36 and exercise_4.py:30).

    Kept algebraically identical to the reference formula — NOT avg()-then-
    adjust — so results match any ANSI-SQL oracle bit-for-bit modulo float
    accumulation order.
    """
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(key).agg(
        ((F.sum(v) + F.lit(1.0)) / (F.count(F.lit(1)) + F.lit(1.0))).alias(alias)
    )


def global_argmax(df: DataFrame, id_col: str, val_col: str) -> DataFrame:
    """Global argmax with deterministic tie-break on the id (reference Q3,
    exercise_1.py:54-87: single-synthetic-key max tracking).

    orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    bounded heap merged on the driver, no single-reducer bottleneck at scale
    (unlike the reference's one-group trick).
    """
    return (
        df.select(F.col(id_col).alias("argmax_id"), F.col(val_col).alias("max_val"))
        .orderBy(F.desc("max_val"), F.desc("argmax_id"))
        .limit(1)
    )


def having_count_distinct(
    df: DataFrame, key: str, distinct_col: str, min_count: int, alias: str = "n_distinct"
) -> DataFrame:
    """COUNT(DISTINCT x) per key, keep groups with >= min_count (reference Q8
    composed with Q6, exercise_3.py:25-47 with H passed via job params).

    Catalyst expands count-distinct into a two-stage aggregate (expand +
    partial) — no per-group materialized sets on the driver.
    """
    return (
        df.groupBy(key)
        .agg(F.countDistinct(distinct_col).alias(alias))
        .filter(F.col(alias) >= F.lit(min_count))
    )


def global_mean(df: DataFrame, value: str | Column, alias: str = "mean_val") -> DataFrame:
    """Global scalar mean (reference Q15, exercise_4.py:212-236: map-to-one-key
    + (sum,count) combiner). In Spark a global agg is already a two-stage
    partial/final plan; result stays a 1-row DataFrame (use .first() in a
    driver loop instead of the reference's file read-back)."""
    v = F.col(value) if isinstance(value, str) else value
    return df.agg(F.avg(v).alias(alias))


def sum_affine(
    df: DataFrame,
    key: str,
    value: str | Column,
    scale: float,
    offset: float,
    alias: str = "score",
) -> DataFrame:
    """Per-key sum followed by an affine transform: scale*sum(v)+offset
    (reference Q13, the damped rank update hs' = a*sum(contrib) + (1-a),
    exercise_4.py:173-192)."""
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(key).agg(
        (F.lit(scale) * F.sum(v) + F.lit(offset)).alias(alias)
    )
