"""Tab-text source/sink round trip (reference ops F1/F2)."""

from __future__ import annotations

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
