"""CDC upsert (MERGE INTO semantics) as a stock DataFrame operation.

The lakehouse maintenance primitive: apply a change batch (insert / update
/ delete ops keyed on the snapshot's primary key) to a snapshot and
produce the next snapshot. Delta/Iceberg express this as MERGE INTO; on
plain parquet the same semantics are one keyed outer join:

  * matched + op='D'      -> row dropped
  * matched + op='U'      -> row with updated columns, others carried
  * unmatched + op='I'    -> row inserted (non-update columns NULL)
  * snapshot row, no op   -> carried unchanged
  * unmatched + op='U'/'D' -> no-op (the key does not exist)

Scale shape: ONE shuffle (or none — a change batch is usually tiny next
to the snapshot, so AQE broadcasts it and the snapshot never moves; with
both sides bucketed on the key even the shuffle disappears). Conflicting
ops for one key and inserts for existing keys are rejected up front —
silently picking an interpretation is how upserts corrupt snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    update_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Next snapshot after applying ``changes`` (op in {'I','U','D'};
    update/insert values in ``update_cols``; every other snapshot column
    carried through on updates, NULL on inserts)."""
    # contract validation: three cheap aggregates over the (small) change
    # batch, surfaced before any snapshot row moves
    if changes.filter(~F.col(op_col).isin("I", "U", "D")).limit(1).count() > 0:
        raise ValueError(f"unknown {op_col} value in change batch")
    if (
        changes.groupBy(key_col).count().filter(F.col("count") > 1).limit(1).count()
        > 0
    ):
        raise ValueError("conflicting change ops for one key")
    if (
        changes.filter(F.col(op_col) == "I")
        .join(snapshot.select(key_col), key_col, "left_semi")
        .limit(1)
        .count()
        > 0
    ):
        raise ValueError("insert op for a key already in the snapshot")

    snap = snapshot.withColumn("_in_snap", F.lit(True))
    ch = changes.select(
        F.col(key_col),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_new_{c}") for c in update_cols],
    )
    joined = snap.join(ch, key_col, "full_outer")
    keep = (
        F.col("_op").isNull()  # untouched snapshot row
        | ((F.col("_op") == "U") & F.col("_in_snap").isNotNull())
        | ((F.col("_op") == "I") & F.col("_in_snap").isNull())
    )
    carried = [c for c in snapshot.columns if c != key_col]
    out_cols = [F.col(key_col)] + [
        (
            F.when(F.col("_op").isin("U", "I"), F.col(f"_new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            if c in update_cols
            else F.col(c).alias(c)
        )
        for c in carried
    ]
    return joined.filter(keep).select(*out_cols)
