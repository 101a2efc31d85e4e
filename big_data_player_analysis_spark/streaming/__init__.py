"""Structured Streaming tier: the reference is batch-only (SURVEY.md §2.4
"Streaming: absent"), so this whole package is extension surface mandated by
the north star — event-time windowed aggregation with watermarks, streaming
dedup, and a custom stateful operator over the `events` table.

Design stance: every window/session transformation is a pure column
expression usable on BOTH batch and streaming DataFrames (the streaming
variant only adds `withWatermark`). Batch runs give the DuckDB-oracle
parity; streaming runs (file source, availableNow trigger, memory sink)
assert batch==stream equivalence in tests.
"""

from big_data_player_analysis_spark.streaming.events import (
    events_stream,
    run_stream_to_table,
)
from big_data_player_analysis_spark.streaming.windows import (
    session_window_stats,
    sliding_value_avg,
    tumbling_event_stats,
)
from big_data_player_analysis_spark.streaming.stateful import (
    dedup_stream_by_id,
    user_running_stats,
)
from big_data_player_analysis_spark.streaming.joins import interval_join
from big_data_player_analysis_spark.streaming.mv import stream_incremental_mv

__all__ = [
    "events_stream",
    "run_stream_to_table",
    "tumbling_event_stats",
    "sliding_value_avg",
    "session_window_stats",
    "dedup_stream_by_id",
    "user_running_stats",
    "interval_join",
    "stream_incremental_mv",
]
