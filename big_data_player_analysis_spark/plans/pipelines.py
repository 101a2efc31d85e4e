"""Exercise 1-3 equivalents: each reference multi-job pipeline collapses to
one lazy DataFrame expression (whole-stage codegen fuses the chain; the
reference instead materializes text directories between jobs — SURVEY.md
§3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from big_data_player_analysis_spark.operators.aggregates import (
    count_per_key,
    global_argmax,
    having_count_distinct,
)
from big_data_player_analysis_spark.operators.setops import distinct_pairs


def challenges_per_challenger(duels: DataFrame) -> DataFrame:
    """Reference exercise_1.py:9-29 (Q1): duel count per challenger."""
    return count_per_key(duels, "challenger_id", alias="n_challenges")


def challenges_per_challenged(duels: DataFrame) -> DataFrame:
    """Reference exercise_1.py:31-52 (Q2): duel count per challenged."""
    return count_per_key(duels, "challenged_id", alias="n_challenges")


def most_challenging_player(duels: DataFrame) -> DataFrame:
    """Reference exercise_1.py:54-87 (Q3): the player challenged most often —
    global argmax over the Q2 counts."""
    return global_argmax(challenges_per_challenged(duels), "challenged_id", "n_challenges")


def distinct_duel_pairs(duels: DataFrame, reverse: bool = False) -> DataFrame:
    """Reference exercise_3.py:10-22 / exercise_4.py:49-62 (Q6+Q7)."""
    return distinct_pairs(duels, ["challenger_id", "challenged_id"], reverse=reverse)


def prolific_challengers(duels: DataFrame, min_opponents: int = 12) -> DataFrame:
    """Reference exercise_3.py (Q6 then Q8): challengers with at least
    ``min_opponents`` distinct opponents — COUNT(DISTINCT) + HAVING in one
    aggregate (the two chained reference jobs fuse into a single plan)."""
    return having_count_distinct(
        duels, "challenger_id", "challenged_id", min_opponents, alias="n_opponents"
    )
