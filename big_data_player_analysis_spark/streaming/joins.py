"""Stream-stream joins with event-time constraints.

A watermarked interval join is the canonical stream-stream pattern: match
each left event to right events of the same key within a bounded lookback.
The time bound is what makes it runnable forever — Spark derives the state
retention for each side from the watermark plus the interval, so join state
is O(events inside the lookback window), not O(history).

The reference has no streaming at all (SURVEY.md §2.4); batch execution of
the same expression is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join left events to right events with the same `on` key whose
    timestamp falls in [left.ts - lookback, left.ts]. Works on two
    streaming inputs (both get watermarks; Spark bounds the join state
    from watermark + interval) and on batch inputs identically. All
    non-key columns are prefixed to keep the output unambiguous.

    how="leftOuter" emits every left event: matches eagerly, and an
    unmatched left row with NULL right columns once the GLOBAL watermark
    (min across both streams of max-seen-ts minus the delay) passes the
    point where a future right row could still satisfy r_ts <= l_ts —
    i.e. once watermark > l_ts. The tail of the stream younger than the
    final watermark therefore never emits its NULL rows before an
    availableNow query stops; a batch twin must replicate that cutoff
    (see registry/streaming_ops.py:stream_outer_interval_join)."""
    if left.isStreaming:
        left = left.withWatermark("ts", watermark)
    if right.isStreaming:
        right = right.withWatermark("ts", watermark)
    l = left.select(
        F.col(on), *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c != on]
    )
    r = right.select(
        F.col(on).alias("_rk"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != on],
    )
    lts, rts = F.col(f"{left_prefix}ts"), F.col(f"{right_prefix}ts")
    cond = (
        (F.col(on) == F.col("_rk"))
        & (rts <= lts)
        & (rts >= lts - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, how).drop("_rk")
