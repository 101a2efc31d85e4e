"""Event-time window operators: tumbling, sliding, session.

Each function is a pure DataFrame transformation valid on batch AND
streaming inputs — `withWatermark` is attached only when the input is
streaming. Watermarks bound the state store (a window's state is dropped
once the watermark passes its end), which is what keeps these runnable
forever on an unbounded stream: state size is O(active windows), not
O(history).

The reference has no streaming and no window functions at all
(SURVEY.md §2.4); the closest analog is its secondary sort + top-k
(reference emulator.py:108-129, exercise_4.py:238-265).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 hour"


def _with_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    if events.isStreaming and watermark is not None:
        return events.withWatermark("ts", watermark)
    return events


def _flatten_window(df: DataFrame, *extra_cols: str) -> DataFrame:
    return df.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *extra_cols,
    )


def tumbling_event_stats(
    events: DataFrame,
    width: str = "10 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per (tumbling window, event_type): event count + value sum/avg.
    Windows are epoch-aligned half-open [start, end) — identical semantics
    batch and streaming, so one implementation serves both."""
    e = _with_watermark(events, watermark)
    agg = e.groupBy(
        F.window("ts", width).alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.avg("value").alias("avg_value"),
    )
    return _flatten_window(agg, "event_type", "n_events", "sum_value", "avg_value")


def sliding_value_avg(
    events: DataFrame,
    width: str = "30 minutes",
    slide: str = "10 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per sliding window: global event count and value average. Each event
    lands in width/slide windows; Spark expands them map-side (explode of
    the window list), so the shuffle carries the fan-out but the aggregate
    still gets a partial combine."""
    e = _with_watermark(events, watermark)
    agg = e.groupBy(F.window("ts", width, slide).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("value").alias("avg_value"),
    )
    return _flatten_window(agg, "n_events", "avg_value")


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per (user, session): session bounds and event count, where a session
    closes after `gap` of user inactivity. session_window merges adjacent
    windows in the state store (streaming) or via a sort within the group
    (batch); end = last event + gap by definition."""
    e = _with_watermark(events, watermark)
    agg = e.groupBy(
        F.session_window("ts", gap).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return _flatten_window(agg, "user_id", "n_events").withColumnsRenamed(
        {"window_start": "session_start", "window_end": "session_end"}
    )
