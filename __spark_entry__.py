"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``big_data_player_analysis_spark``; this module
just adapts the query registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_player_analysis_spark.registry import all_queries  # noqa: E402
from big_data_player_analysis_spark.workspace import clean_scratch  # noqa: E402

# Reclaim scratch left behind by any KILLED previous run before this one
# starts queueing disk writes (the round-4 driver lost 6 correctness rows
# to accumulated /tmp leftovers). spark_local=False: the driver may import
# this module after its own JVM is already up.
clean_scratch(spark_local=False)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the iterative heroic-score engine (reference exercise_4)
    over events-derived duels at sf0.001 — converge the damped rank, return
    the top-10 players (reference exercise_4.py:267-283)."""
    from pyspark.sql import functions as F

    from big_data_player_analysis_spark.plans.heroic import heroic_score
    from big_data_player_analysis_spark.registry.common import duel_edges

    result = heroic_score(duel_edges(spark, SMOKE_SF_DIR), alpha=0.1, tol=0.1, max_iter=10)
    return result.scores.orderBy(F.desc("hs"), F.desc("player_id")).limit(10)


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS entry's tracked persists before building the
    next one: operators persist self-join intermediates that must outlive
    their (lazy) build, so the earliest safe unpersist point in the
    driver's run-compare-run loop is the start of the next entry. Keeps a
    142-entry sweep on one JVM at <= one entry's cached blocks (round-5
    verdict defect #1).

    CONTRACT for external driver authors: registry results may be backed
    by lazy localCheckpoints (lineage truncated), not just persists.
    Released persists recompute on demand, but a released checkpoint's
    blocks are GONE — re-reading a prior entry's DataFrame after
    requesting the next one hard-fails instead of recomputing slowly.
    Fully consume (collect/write) each entry's result before building the
    next entry."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from big_data_player_analysis_spark.caching import release_tracked

        release_tracked()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _released(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (omitted entries are
    non-SQL-expressible and take the driver's rows-only check)."""
    return {
        name: spec.sql for name, spec in all_queries().items() if spec.sql is not None
    }
