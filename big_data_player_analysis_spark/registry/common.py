"""Shared helpers for registry entries: table loading and the events->duels
derivation used to exercise the player-duel operators on the driver's
synthetic tables.

The duel analog: within each event_type stream ordered by (ts, event_id),
each event's user challenges the next event's user, with the event value as
the duel score. Deterministic (ts+event_id is a total order), windowed —
and expressible identically in ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_player_analysis_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def duel_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(challenger_id, challenged_id, score) derived from events."""
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("user_id").alias("challenger_id"),
            F.lead("user_id").over(w).alias("challenged_id"),
            F.col("value").alias("score"),
        )
        .filter(F.col("challenged_id").isNotNull())
    )


DUELS_CTE = """
duels AS (
  SELECT challenger_id, challenged_id, score FROM (
    SELECT user_id AS challenger_id,
           lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id)
             AS challenged_id,
           value AS score
    FROM events
  ) WHERE challenged_id IS NOT NULL
)
"""
