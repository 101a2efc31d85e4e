"""Catalog: named parquet tables -> DataFrames / temp views.

The reference treats a directory of text files as a table
(reference emulator.py:165-186); here a table is a parquet file/dir with a
fixed schema, read through the DataSource V2 parquet scan so Catalyst gets
column pruning + predicate pushdown for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = _read_parquet_nanos_safe(spark, table_path(sf_dir, name))
    return _normalize_nanos_timestamps(df)


def _read_parquet_nanos_safe(spark: SparkSession, path: str):
    """Parquet TIMESTAMP(NANOS) columns (written by e.g. pandas with ns
    precision) are unsupported by Spark's reader; read them as raw int64
    nanos instead and convert below. The conf is a session SQL conf (only
    affects TIMESTAMP(NANOS) parquet fields), safe to set at runtime before
    the scan is planned."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def _normalize_nanos_timestamps(df: DataFrame) -> DataFrame:
    """Normalize the `ts` column to a session-zone TIMESTAMP regardless of
    the parquet physical type the generator used:
      * int64 TIMESTAMP(NANOS) (pandas ns precision + nanosAsLong conf) ->
        microsecond timestamps (truncating, which matches how DuckDB/Arrow
        narrow ns to us for positive epochs);
      * timestamp[us] without timezone -> Spark reads TIMESTAMP_NTZ, which
        time functions like unix_micros reject; the session zone is pinned
        UTC (session.py), so the NTZ->TIMESTAMP cast maps wall-clock
        identically to what DuckDB reads from the same file."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL entry points)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
