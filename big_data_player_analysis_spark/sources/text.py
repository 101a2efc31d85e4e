"""Tab-separated text source/sink (reference ops F1/F2).

The reference scans a directory of text files, one record per line, split on
the first tab (reference emulator.py:165-186), and writes
``str(k)\\tstr(v)\\n`` lines back (reference emulator.py:235-251). Here the
same data shape is schema-on-read: an explicit StructType applied by the
native CSV reader, so the downstream plan gets typed columns, and the engine
defaults to parquet for anything it materializes itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Schema of the reference's origin table: one duel per line,
# challenger_id \t challenged_id \t score \t duration  (FIXTURES.md §A1).
DUELS_SCHEMA = T.StructType(
    [
        T.StructField("challenger_id", T.LongType(), False),
        T.StructField("challenged_id", T.LongType(), False),
        T.StructField("score", T.LongType(), False),
        T.StructField("duration", T.LongType(), False),
    ]
)


def read_duels_text(spark: SparkSession, path: str) -> DataFrame:
    """Read origin-format duels (directory-as-table works natively: Spark's
    CSV source scans every file under ``path``). Latin-1 to match the
    reference reader's encoding (reference emulator.py:168)."""
    return (
        spark.read.schema(DUELS_SCHEMA)
        .options(sep="\t", encoding="ISO-8859-1")
        .csv(path)
    )


def write_tab_text(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write a DataFrame as tab-separated text (reference sink F2,
    emulator.py:235-251). single_file=True mimics the reference's one
    output.txt — only sane for small results; large results keep one file
    per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").options(sep="\t").csv(path)
