"""Join operators (reference ops Q5, Q9-Q11, Q14, SURVEY.md §2.2).

The reference implements every join as a reduce-side merge with key tagging
and custom sort comparators (reference exercise_4.py:64-165) — a MapReduce
artifact. Here joins are declarative: Catalyst chooses broadcast-hash for a
small build side (dimension tables) and sort-merge otherwise, and AQE can
switch strategy / split skewed partitions at runtime, which is the behavior
wanted at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Equi-join a fact table with a dimension (reference Q9/Q10 tagged
    reduce-side joins, exercise_4.py:64-123). broadcast_dim=True hints the
    planner when the caller knows the dim is small — at cluster scale this
    avoids shuffling the fact table entirely."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def left_join_default(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    defaults: dict[str, float | int | str],
) -> DataFrame:
    """Left join, filling missing right-side columns with defaults
    (reference Q11: join against heroic scores, missing score => 1.0,
    exercise_4.py:126-165 with the default at :152)."""
    out = left.join(right, on=on, how="left")
    for col_name, default in defaults.items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), F.lit(default)))
    return out


def domain_completion(
    df: DataFrame,
    universe: DataFrame,
    key: str,
    defaults: dict[str, float | int | str],
) -> DataFrame:
    """Complete a keyed table against a key universe, defaulting missing rows
    (reference Q5: players who never challenge still get a smoothed avg of
    1.0 via emitting zero-rows, exercise_4.py:14). Spark form: right join the
    universe + coalesce, so the universe drives the output domain."""
    out = universe.select(key).distinct().join(df, on=key, how="left")
    for col_name, default in defaults.items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), F.lit(default)))
    return out


def keyed_squared_difference(
    a: DataFrame,
    b: DataFrame,
    key: str,
    value: str,
    alias: str = "sq_diff",
) -> DataFrame:
    """Per-key squared difference of two score vectors (reference Q14,
    exercise_4.py:194-210 — implemented there by a union + sign-alternation
    trick assuming exactly two values per key; here an inner join, which has
    the same semantics when both sides are keyed uniquely)."""
    av = a.select(F.col(key), F.col(value).alias("_a"))
    bv = b.select(F.col(key), F.col(value).alias("_b"))
    return av.join(bv, on=key).select(
        F.col(key), F.pow(F.col("_a") - F.col("_b"), F.lit(2)).alias(alias)
    )
