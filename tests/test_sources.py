"""Tab-text source/sink round trip (reference ops F1/F2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_player_analysis_spark.sources.text import (
    read_duels_text,
    write_tab_text,
)


def test_tab_text_roundtrip(spark, tmp_path):
    path = tmp_path / "duels"
    path.mkdir()
    (path / "part1.txt").write_text("1\t2\t100\t50\n3\t4\t200\t60\n")
    (path / "part2.txt").write_text("5\t6\t300\t70\n")

    df = read_duels_text(spark, str(path))
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(1, 2, 100, 50), (3, 4, 200, 60), (5, 6, 300, 70)]

    out = tmp_path / "out"
    write_tab_text(df, str(out), single_file=True)
    df2 = read_duels_text(spark, str(out))
    assert sorted(tuple(r) for r in df2.collect()) == rows


def test_format_roundtrips(spark, tmp_path):
    """parquet/CSV/JSON round-trip with explicit schemas (sources/formats)."""
    from big_data_player_analysis_spark.catalog import load_table
    from big_data_player_analysis_spark.sources.formats import read_table, write_table
    from tests.conftest import rows_set

    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(200)
    for fmt in ("parquet", "orc", "csv", "json"):
        p = str(tmp_path / f"ev_{fmt}")
        write_table(ev, p, fmt=fmt)
        back = read_table(spark, p, fmt=fmt, schema=ev.schema)
        assert rows_set(back) == rows_set(ev), fmt


def test_partitioned_write_prunes(spark, tmp_path):
    """partition_by layout gives partition pruning: the pruned scan lists
    only the matching directory."""
    import contextlib
    import io

    from big_data_player_analysis_spark.catalog import load_table
    from big_data_player_analysis_spark.sources.formats import read_table, write_table
    from pyspark.sql import functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    p = str(tmp_path / "ev_part")
    write_table(ev, p, fmt="parquet", partition_by=["event_type"])
    back = read_table(spark, p, fmt="parquet").filter(F.col("event_type") == "click")
    assert back.count() == ev.filter(F.col("event_type") == "click").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    assert "PartitionFilters: [isnotnull(event_type" in buf.getvalue()


def test_partitioned_layout_materializes_once(spark, tmp_path):
    """ensure_partitioned_layout writes the layout on first call and
    reuses it (same path, no rewrite) afterwards — repeated queries must
    not pay the write again."""
    import os
    from pathlib import Path

    from big_data_player_analysis_spark.sources.formats import (
        ensure_partitioned_layout,
    )

    root = str(tmp_path / "layout_root")
    p1 = ensure_partitioned_layout(
        spark, "/root/testdata/sf0.001", "events", ["event_type"], root=root
    )
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))
    mtime = Path(p1, "_SUCCESS").stat().st_mtime_ns
    p2 = ensure_partitioned_layout(
        spark, "/root/testdata/sf0.001", "events", ["event_type"], root=root
    )
    assert p2 == p1
    assert Path(p1, "_SUCCESS").stat().st_mtime_ns == mtime  # untouched


def test_partitioned_layout_invalidates_on_source_change(spark, tmp_path):
    """The layout path is keyed on a source fingerprint: regenerating the
    source table must produce a NEW layout serving the new rows, never the
    stale cached copy (round-3 ADVICE)."""
    import os
    import time

    from big_data_player_analysis_spark.sources.formats import (
        ensure_partitioned_layout,
    )

    src = tmp_path / "sfx"
    src.mkdir()
    root = str(tmp_path / "layout_root")

    def write_events(values):
        spark.createDataFrame(
            [(i, i, v, float(i)) for i, v in enumerate(values)],
            "event_id long, user_id long, event_type string, value double",
        ).toPandas().to_parquet(str(src / "events.parquet"))

    write_events(["click", "view", "click"])
    p1 = ensure_partitioned_layout(spark, str(src), "events", ["event_type"], root=root)
    assert spark.read.parquet(p1).count() == 3

    time.sleep(0.01)  # ensure a distinct mtime_ns on the rewrite
    write_events(["click", "view", "click", "purchase", "purchase"])
    p2 = ensure_partitioned_layout(spark, str(src), "events", ["event_type"], root=root)
    assert p2 != p1  # new fingerprint, new layout
    assert spark.read.parquet(p2).count() == 5
    assert os.path.exists(os.path.join(p2, "_SUCCESS"))


def test_json_permissive_captures_corrupt_records(spark, tmp_path):
    """Dirty-lake ingestion contract: PERMISSIVE mode (Spark's default)
    must land malformed JSONL lines in the declared _corrupt_record column
    with every typed column NULL, never abort the scan or silently drop
    rows — the audit-then-quarantine pattern a 100 TB ingest needs."""
    from big_data_player_analysis_spark.sources.formats import read_table

    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.5}\n'
        "this is not json at all\n"
        '{"id": 2, "v": 20.0}\n'
        '{"id": 3, "v": }\n'
    )
    schema = "id long, v double, _corrupt_record string"
    df = read_table(
        spark, str(p), fmt="json", schema=schema, mode="PERMISSIVE"
    ).cache()  # Spark disallows a _corrupt_record-only projection unless cached
    assert df.count() == 4
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 2
    assert {r.id for r in df.filter(F.col("_corrupt_record").isNull()).collect()} == {1, 2}
    # quarantine split: good rows keep full fidelity
    good = df.filter(F.col("_corrupt_record").isNull()).select("id", "v")
    assert {(r.id, r.v) for r in good.collect()} == {(1, 10.5), (2, 20.0)}
    df.unpersist()


def test_csv_dropmalformed_and_failfast_modes(spark, tmp_path):
    """DROPMALFORMED silently keeps only parseable rows (the lossy knob —
    callers opt in); FAILFAST surfaces the first bad row as an error
    instead of producing partial data."""
    import pytest

    from big_data_player_analysis_spark.sources.formats import read_table

    p = tmp_path / "dirty.csv"
    p.write_text("id,v\n1,10.5\n2,not_a_number\n3,30.0\n")
    schema = "id long, v double"
    dropped = read_table(
        spark, str(p), fmt="csv", schema=schema, mode="DROPMALFORMED"
    )
    assert {(r.id, r.v) for r in dropped.collect()} == {(1, 10.5), (3, 30.0)}
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_table(
            spark, str(p), fmt="csv", schema=schema, mode="FAILFAST"
        ).collect()
