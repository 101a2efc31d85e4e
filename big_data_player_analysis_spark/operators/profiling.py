"""Single-pass table profiling — the data-quality/observability sweep a
100 TB lake runs before (and after) every pipeline stage: per-column row
count, null count, exact distinct count, and min/max, computed in one
scan.

Scale shape: one `select` with every aggregate fused into a single
hash-aggregate pair (partial on the scan side, final after one 1-row
exchange). Exact `count(distinct)` columns are rewritten by Catalyst into
an Expand + two-level aggregate — the row is replicated once per distinct
aggregate, so profile a bounded column LIST, not "all 600 columns", and
prefer approx_distinct for very wide sweeps (the `approx` flag switches
every distinct to HLL++, which keeps the plan a plain partial/final pair
with no Expand).

The output is long-form (one row per profiled column) so downstream
quality gates can join/filter on it without schema surgery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str], approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per profiled
    column; min/max are cast to string so heterogeneous column types share
    one schema. ``approx=True`` uses HLL++ distinct (no Expand in the
    plan) for wide sweeps where +-2% error is acceptable."""
    if not columns:
        raise ValueError("columns must not be empty")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    aggs = []
    for c in columns:
        col = F.col(c)
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(col)
        )
        aggs.append(
            F.struct(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(col.isNull().cast("long")).alias("n_nulls"),
                distinct.cast("long").alias("n_distinct"),
                F.min(col).cast("string").alias("min_val"),
                F.max(col).cast("string").alias("max_val"),
            ).alias(c)
        )
    one = df.agg(*aggs)
    # unpivot the single profile row to long form: one row per column
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"), F.col(c).alias("p")
                    )
                    for c in columns
                ]
            )
        ).alias("e")
    )
    return stacked.select(
        F.col("e.column").alias("column"),
        F.col("e.p.n_rows").alias("n_rows"),
        F.col("e.p.n_nulls").alias("n_nulls"),
        F.col("e.p.n_distinct").alias("n_distinct"),
        F.col("e.p.min_val").alias("min_val"),
        F.col("e.p.max_val").alias("max_val"),
    )
