"""Top-k operators (reference op Q17 + per-group generalization).

The reference forces all rows into ONE reduce group with a constant
comparator and takes the first 10 sorted values (reference
exercise_4.py:238-265) — a single-reducer bottleneck. The Spark plan is
TakeOrderedAndProject: each partition keeps a k-element heap, the driver
merges P*k candidates — O(rows) scan, O(P*k) merge, no bottleneck at any
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int = 10) -> DataFrame:
    """Global top-k. Pass fully deterministic order columns (include a
    tie-break key) so results are stable across partitionings."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Top-k within each group via row_number over a window — the general
    OLAP form the reference lacks (SURVEY.md §2.4). The window sort is
    per-group within the shuffle partition; no global sort."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= F.lit(k))
    )
