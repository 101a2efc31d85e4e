"""Z-order layout (operators/layout.py): key correctness and the actual
data-skipping property, measured on real parquet row-group min/max stats."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from big_data_player_analysis_spark.operators.layout import (
    zorder_key,
    zorder_key_sql,
    zorder_layout,
)


def _morton2(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 2, 9, 200, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key(["x", "y"], 8).alias("z")).collect()
    for r in got:
        assert r.z == _morton2(r.x, r.y), (r.x, r.y)


def test_zorder_sql_form_matches_spark_form(spark):
    """The oracle's arithmetic interleave must equal the shift/OR tree on
    the full corner set."""
    rows = [(x, y) for x in (0, 3, 170, 255) for y in (0, 85, 254)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        zorder_key(["x", "y"], 8).alias("z"),
        F.expr(zorder_key_sql(["x", "y"], 8).replace("//", "div")).alias("z_sql"),
    ).collect()
    assert all(r.z == r.z_sql for r in got)


def test_zorder_key_rejects_overflow():
    with pytest.raises(ValueError, match="overflow"):
        zorder_key(["a", "b", "c", "d"], 16)


def _rowgroup_overlap_fraction(path_glob: str, box: dict[str, tuple[int, int]]) -> float:
    """Fraction of parquet row groups whose min/max stats overlap the box —
    exactly what a stats-based reader must scan."""
    import pyarrow.parquet as pq

    total = hit = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            overlap = True
            for col, (lo, hi) in box.items():
                st = md.row_group(rg).column(idx[col]).statistics
                if st.min > hi or st.max < lo:
                    overlap = False
                    break
            if overlap:
                hit += 1
    assert total > 0
    return hit / total


def test_zorder_layout_skips_row_groups_on_both_dimensions(spark, tmp_path):
    """The whole point of the layout: under z-order clustering a small box
    predicate overlaps FEW row groups (both dimensions prune via min/max
    stats), while under a single-column sort the second dimension prunes
    nothing — its per-row-group ranges span the whole domain. Small row
    groups force many groups per file so the fractions are meaningful."""
    n = 200_000
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(256)).cast("long").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256)).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    rg = {"parquet.block.size": str(64 * 1024)}
    zorder_layout(df, ["x", "y"], bits=8, n_files=4).write.options(**rg).parquet(zpath)
    (
        df.repartitionByRange(4, "x")
        .sortWithinPartitions("x")
        .write.options(**rg)
        .parquet(xpath)
    )

    box = {"x": (32, 63), "y": (96, 127)}  # 1/8 x 1/8 of the domain
    z_frac = _rowgroup_overlap_fraction(f"{zpath}/*.parquet", box)
    x_frac = _rowgroup_overlap_fraction(f"{xpath}/*.parquet", box)
    # single-column sort: x prunes to ~1/8, y prunes nothing
    assert x_frac > 0.08
    # z-order: both dimensions prune; must beat the x-sort layout clearly
    assert z_frac < x_frac / 2, (z_frac, x_frac)
    # and the layout must not have changed the data
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.filter(
        (F.col("x") != F.pmod(F.xxhash64("event_id"), F.lit(256)))
    ).count() == 0


def test_compact_small_files_preserves_content(spark, tmp_path):
    """A fragmented table (64 one-row-group files) compacts to the
    size-derived file count with row-identical content."""
    from big_data_player_analysis_spark.operators.layout import (
        compact_small_files,
    )

    src = str(tmp_path / "fragmented")
    dest = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    )
    df.repartition(64).write.parquet(src)

    stats = compact_small_files(
        spark, src, dest, target_file_bytes=1 * 1024 * 1024
    )
    assert stats["files_before"] == 64
    # ~0.5 MB of data at a 1 MB target -> exactly one output file
    assert stats["target_files"] == stats["files_after"]
    assert stats["files_after"] < stats["files_before"]

    back = spark.read.parquet(dest)
    orig = spark.read.parquet(src)
    assert back.count() == 10_000
    assert back.schema == orig.schema
    # content equality: anti-joins empty both ways
    assert back.join(orig, ["id", "payload"], "left_anti").count() == 0
    assert orig.join(back, ["id", "payload"], "left_anti").count() == 0
