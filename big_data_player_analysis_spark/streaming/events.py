"""Streaming source + sink helpers for the `events` table.

The file source treats a parquet path as an append-only directory: at 100 TB
the same code points at a landing bucket and each new file becomes a
micro-batch (bounded by maxFilesPerTrigger for backpressure). Locally the
driver's single events.parquet is one micro-batch; tests split it into
several files to exercise cross-batch state.

Timestamp precision is generator-dependent (catalog.py handles the same
variants for batch): pandas-ns parquet carries TIMESTAMP(NANOS), which
Spark's reader rejects — `ts` is then read as int64 nanos
(spark.sql.legacy.parquet.nanosAsLong) and truncated to microseconds;
timestamp[us]-without-zone parquet reads as TIMESTAMP_NTZ and is cast to
the session-zone (UTC) TIMESTAMP. A streaming source needs its schema
declared up front, so the file footer is probed with a cheap batch
schema-only read first.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _events_raw_schema(spark: SparkSession, path: str) -> T.StructType:
    """Probe the parquet footer (schema-only batch read — no data scan)
    for the physical type of `ts`; every other column is fixed."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type: T.DataType = T.LongType()
    for f in spark.read.parquet(path).schema.fields:
        if f.name == "ts":
            ts_type = f.dataType
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame over an events parquet file/directory with `ts`
    converted to a proper event-time timestamp column."""
    schema = _events_raw_schema(spark, path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if path.endswith(".parquet"):
        # Single-file "table": FileStreamSource force-sets basePath to the
        # path itself for non-glob paths and then rejects it (basePath must
        # be a directory). Rewriting the last char as a one-char glob class
        # makes isGlobPath true, which disables that override while still
        # matching exactly this file.
        path = f"{path[:-1]}[{path[-1]}]"
    sdf = reader.parquet(path)
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):  # int64 nanos
        return sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def run_stream_to_table(
    sdf: DataFrame,
    output_mode: str,
    query_name: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the sink table as a batch DataFrame.

    availableNow processes everything currently in the source and stops —
    the streaming analog of a batch run, which is what makes stream==batch
    parity assertable. The memory sink is test/driver plumbing only; a real
    deployment writes the same sdf to parquet/Kafka with a checkpoint dir.
    """
    name = query_name or f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    return sdf.sparkSession.table(name)
