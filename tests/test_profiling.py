"""profile_table unit tests: null/distinct accounting, approx mode, and
input validation."""

from __future__ import annotations

import pytest

from big_data_player_analysis_spark.operators.profiling import profile_table


def test_hand_computed(spark):
    rows = [(1, "a"), (2, "a"), (3, None), (None, "b")]
    df = spark.createDataFrame(rows, "k long, s string")
    out = {r.column: r for r in profile_table(df, ["k", "s"]).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 1
    assert out["k"].n_distinct == 3
    assert (out["k"].min_val, out["k"].max_val) == ("1", "3")
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert (out["s"].min_val, out["s"].max_val) == ("a", "b")


def test_approx_mode_close(spark):
    df = spark.range(0, 5000).selectExpr("id", "id % 37 AS m")
    out = {r.column: r for r in profile_table(df, ["id", "m"], approx=True).collect()}
    # default HLL++ rsd is 0.05 at ONE sigma; allow 3 sigma
    assert abs(out["id"].n_distinct - 5000) / 5000 < 0.15
    assert abs(out["m"].n_distinct - 37) <= 4


def test_validation(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="must not be empty"):
        profile_table(df, [])
