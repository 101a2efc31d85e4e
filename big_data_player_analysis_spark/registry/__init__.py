"""Query registry: every implemented operator exposed as a named
(spark_fn, oracle_sql) pair for the driver contract (__spark_entry__.py).

Each entry's Spark side is built from the operator/function library; the
oracle side is ANSI SQL runnable by DuckDB on the same parquet views.
Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing). Entries without SQL (sql=None) are
genuinely non-SQL-expressible (iterative convergence, hash-seeded LSH) and
get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under ``name``."""

    def deco(fn):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import for side effects: each module registers its queries
    from big_data_player_analysis_spark.registry import (  # noqa: F401
        llm_ops,
        olap,
        reference_surface,
        streaming_ops,
    )

    return dict(_REGISTRY)
