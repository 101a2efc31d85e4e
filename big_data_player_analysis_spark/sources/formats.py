"""Generic format-agnostic table IO: parquet (primary), ORC, CSV, JSON.

The reference supports exactly one format — tab-separated text in a
directory (reference emulator.py:165-186); SURVEY.md §2.4 mandates
parquet/CSV/JSON for the engine (ORC added: the other columnar format a
Spark lake commonly holds, native reader, same pushdown/pruning
machinery). All readers take an EXPLICIT schema:
schema inference costs an extra pass over the data (fatal at 100 TB) and
silently drifts types between runs; a declared StructType keeps the scan
single-pass and the downstream plan stable.

Timestamps round-trip through CSV/JSON as ISO-8601 strings (Spark's
default timestampFormat); parquet keeps native types and is what the
engine materializes itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json")

# Spark's stock CSV/JSON timestampFormat keeps milliseconds only; micros
# matter (the events table is microsecond-grained)
_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}
_TEXT_DEFAULTS = {"csv": {"header": "true", **_TS_OPTS}, "json": _TS_OPTS}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a table in any supported format. CSV defaults to a header row
    (written by write_table) and explicit schema; JSON is line-delimited
    (the only splittable JSON layout — one record per line lets Spark
    parallelize the scan by byte ranges)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    options = {**_TEXT_DEFAULTS.get(fmt, {}), **options}
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write a table in any supported format. partition_by produces
    hive-style directory partitioning — the layout that gives downstream
    scans partition pruning on the partition columns."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode)
    options = {**_TEXT_DEFAULTS.get(fmt, {}), **options}
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).format(fmt).save(path)
