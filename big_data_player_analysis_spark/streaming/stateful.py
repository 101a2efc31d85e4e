"""Stateful streaming operators: exactly-once dedup and a custom
applyInPandasWithState per-key accumulator.

Scale notes: streaming dedup state is one entry per key inside the
watermark horizon — unbounded keys need the watermark so old keys age out.
The applyInPandasWithState operator keeps O(1) state per user (count, sum,
max-ts triple), the canonical shape for running per-entity aggregates at
100 TB: state lives in the state store partitioned by the grouping key, and
each micro-batch touches only the keys present in that batch.

Environment gate: Spark 4's successor API, transformWithStateInPandas
(typed Value/Map/List state, timers, TTL), is NOT used here because its
state-server protocol imports google.protobuf, which this sandbox lacks
(verified: the pre-init driver worker crashes with ImportError in
pyspark/sql/streaming/proto/StateMessage_pb2.py). applyInPandasWithState
carries no such dependency and expresses the same per-key-state semantics;
swapping to transformWithState where protobuf exists is a mechanical port
of _update_user_stats into a StatefulProcessor.handleInputRows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_WATERMARK = "1 hour"

USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("last_us", T.LongType()),  # max event time, epoch micros
    ]
)


def dedup_stream_by_id(events: DataFrame, watermark: str = DEDUP_WATERMARK) -> DataFrame:
    """First-arrival dedup on event_id with BOUNDED state.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``): with a
    plain ``dropDuplicates(["event_id"])`` the state store never evicts —
    eviction only happens when the event-time column is part of the dedup
    key subset, so a dedup keyed on id alone grows one state row per
    distinct id forever, an OOM on an unbounded stream. The
    WithinWatermark variant keys state on id alone but expires each entry
    once the watermark passes its event time: duplicates arriving within
    the horizon are dropped, ids are forgotten after it — the standard
    bounded-state/exactly-once tradeoff, with state O(ids per horizon)
    instead of O(ids ever seen)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        # pandas datetime64[us/ns] -> epoch micros, robust to unit
        batch_max = int(pd.Timestamp(pdf["ts"].max()).value // 1000)
        last_us = max(last_us, batch_max)
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, value sum, last event time), emitted once
    per micro-batch that touches the user. Update output mode: downstream
    (or the memory-sink test) sees one upsert row per (batch, user); the
    latest row per user is the current truth."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
