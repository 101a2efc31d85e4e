"""CDC upsert (MERGE INTO semantics) as a stock DataFrame operation.

The lakehouse maintenance primitive: apply a change batch (insert / update
/ delete ops keyed on the snapshot's primary key) to a snapshot and
produce the next snapshot. Delta/Iceberg express this as MERGE INTO; the
semantics here:

  * matched + op='D'      -> row dropped
  * matched + op='U'      -> row with updated columns, others carried
  * unmatched + op='I'    -> row inserted (non-update columns NULL)
  * snapshot row, no op   -> carried unchanged
  * unmatched + op='U'/'D' -> no-op (the key does not exist)

Scale shape: a naive FULL OUTER JOIN formulation would be a scale trap —
Spark cannot broadcast a full outer join, so the 100 TB snapshot would
shuffle on every change batch regardless of batch size. Instead the merge
decomposes into (a) snapshot LEFT JOIN changes — broadcastable, the
snapshot never moves — and (b) a UNION of the validated insert rows,
which is a zero-shuffle append. Conflicting ops for one key and inserts
for existing keys are rejected up front — silently picking an
interpretation is how upserts corrupt snapshots (and it is exactly that
validation which makes the insert union equivalent to the outer-join
form). Plan pinned in tests/test_plans.py: BroadcastHashJoin, no
SortMergeJoin, no Exchange on the snapshot side.
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

    ch = changes.select(
        F.col(key_col),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_new_{c}") for c in update_cols],
    )
    carried = [c for c in snapshot.columns if c != key_col]
    # (a) updates/deletes: LEFT join keeps the snapshot un-shuffled (the
    # change batch is the broadcastable side); unmatched U/D are no-ops
    # by the join itself
    updated = (
        snapshot.join(ch.filter(F.col("_op") != "I"), key_col, "left")
        .filter((F.col("_op").isNull()) | (F.col("_op") == "U"))
        .select(
            F.col(key_col),
            *[
                (
                    F.when(F.col("_op") == "U", F.col(f"_new_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                    if c in update_cols
                    else F.col(c).alias(c)
                )
                for c in carried
            ],
        )
    )
    # (b) inserts: validated key-disjoint above, so a plain zero-shuffle
    # union replaces the outer join's unmatched-right branch
    inserts = changes.filter(F.col(op_col) == "I").select(
        F.col(key_col),
        *[
            (F.col(c) if c in update_cols else F.lit(None)).cast(
                dict(snapshot.dtypes)[c]
            ).alias(c)
            for c in carried
        ],
    )
    return updated.unionByName(inserts)
