"""Z-order (Morton curve) layout for multi-dimensional data skipping.

At 100 TB, a table range-partitioned/sorted on ONE column prunes scans only
on that column: parquet row-group min/max stats on the second dimension
span the whole domain, so a box query (x BETWEEN .. AND y BETWEEN ..) still
reads everything. Interleaving the bits of the quantized dimensions into a
single Morton key and laying the files out in key order keeps rows that are
close in EVERY dimension close on disk — each row group covers a small
hyper-rectangle, and min/max stats prune on all interleaved columns at
once. This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
expressed here with stock Spark primitives: a pure-JVM unrolled
bit-interleave expression, repartitionByRange on the key, and
sortWithinPartitions — no UDF, no custom writer.

tests/test_layout.py pins the property with REAL parquet metadata: under a
z-order layout a box predicate overlaps a small fraction of row groups
(both dimensions prune), while under a single-column sort the second
dimension prunes nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton code of the given already-quantized non-negative integer
    columns: bit i of column j lands at interleaved position
    i * n_cols + j. Unrolled at plan-build time into a fixed OR/shift
    expression tree (bits * n_cols terms) — whole-stage-codegen'd JVM
    arithmetic, no variable-shift construct and no Python at runtime.

    ``bits`` is the per-dimension quantization width; n_cols * bits must
    fit a signed long. Inputs are masked to ``bits`` bits (callers
    quantize with pmod/width_bucket-style expressions first)."""
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if n * bits > 62:
        raise ValueError("interleaved key would overflow a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            col = F.col(c) if isinstance(c, str) else c
            bit = F.shiftright(col.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_key_sql(cols: list[str], bits: int = 8) -> str:
    """The identical interleave as an ANSI-SQL expression string (DuckDB
    uses >>/<<-style operators via bit functions; plain arithmetic —
    (x // 2^i) % 2 * 2^(i*n+j) — is engine-portable and exact for the
    masked ranges)."""
    terms = [
        f"(({c} // {1 << i}) % 2) * {1 << (i * len(cols) + j)}"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    cols: list[Column | str],
    bits: int = 8,
    n_files: int = 8,
    key_name: str = "zvalue",
) -> DataFrame:
    """The write-side layout: attach the Morton key, range-partition on it
    (one contiguous key range per output file — this is the one shuffle,
    same cost class as any OPTIMIZE/CLUSTER BY rewrite), and sort within
    partitions so parquet row groups inside each file cover disjoint key
    ranges. Write the result with .write.parquet(...); subsequent scans
    prune row groups on every interleaved dimension via min/max stats."""
    return (
        df.withColumn(key_name, zorder_key(cols, bits))
        .repartitionByRange(n_files, key_name)
        .sortWithinPartitions(key_name)
    )


def compact_small_files(
    spark,
    path: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction — the maintenance operation every streaming /
    incremental sink eventually needs (each micro-batch or CDC merge
    leaves one-file-per-partition crumbs; at 100 TB a table of millions
    of tiny files is bottlenecked on file-open/footer-read overhead and
    NameNode/object-store metadata, not on data bytes).

    Rewrites the table at ``path`` into ``dest`` with file count chosen
    from the table's ACTUAL on-disk size (sum of data file sizes /
    ``target_file_bytes``) — measured from the filesystem, not guessed —
    using a round-robin ``repartition(n)`` so output files are uniformly
    sized regardless of input skew. Content is preserved exactly
    (row-identical, schema-identical); only the physical layout changes.

    Returns ``{"files_before", "files_after", "bytes", "target_files"}``.
    At cluster scale the same operator runs per partition-directory so
    compaction parallelizes across partitions and never rewrites the
    whole table at once.
    """
    import os

    df = spark.read.format(fmt).load(path)
    data_files = [
        os.path.join(dp, f)
        for dp, _dn, fns in os.walk(path)
        for f in fns
        if not f.startswith(("_", "."))
    ]
    total = sum(os.path.getsize(f) for f in data_files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df.repartition(n_out).write.format(fmt).mode("overwrite").save(dest)
    out_files = [
        os.path.join(dp, f)
        for dp, _dn, fns in os.walk(dest)
        for f in fns
        if not f.startswith(("_", ".")) and not f.endswith(".crc")
    ]
    return {
        "files_before": len(data_files),
        "files_after": len(out_files),
        "bytes": total,
        "target_files": n_out,
    }
