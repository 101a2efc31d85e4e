"""Dedup / set operators (reference ops Q6, Q7, Q18, SURVEY.md §2.2-2.4).

distinct/dropDuplicates compile to a hash aggregate on the key columns —
partial dedup before the shuffle, so shuffle volume is O(distinct), the
right behavior when 100 TB of rows hold few distinct pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_pairs(df: DataFrame, cols: list[str], reverse: bool = False) -> DataFrame:
    """Distinct projection of a column pair, optionally emitted reversed
    (reference Q6+Q7: dedup of (challenger, challenged) re-emitted as
    (challenged, challenger), exercise_3.py:10-22 and exercise_4.py:49-62)."""
    out = df.select(*cols).distinct()
    if reverse:
        out = out.select(*reversed([F.col(c) for c in cols]))
    return out


def key_universe(df: DataFrame, cols: list[str], alias: str = "id") -> DataFrame:
    """Distinct union of several key columns — the entity universe
    (reference Q18 first half: every player id seen on either side,
    exercise_4.py:36-47). ONE pass: a narrow explode of the column array
    instead of a UNION of per-column projections — the union form
    executed the input subtree once PER COLUMN, which doubles the whole
    events->duels derivation when the input is duel_edges (round-8 plan
    audit); explode keeps nulls as elements, so the output is identical
    to the union (both keep a null key if any column holds one)."""
    return df.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias(alias)
    ).distinct()


def rank_vector_init(
    df: DataFrame, cols: list[str], alias: str = "id", value: float = 1.0,
    value_alias: str = "score",
) -> DataFrame:
    """Initialize a rank vector to a constant over the key universe
    (reference Q18, exercise_4.py:36-47: every player starts at hs=1)."""
    return key_universe(df, cols, alias).withColumn(value_alias, F.lit(value))
