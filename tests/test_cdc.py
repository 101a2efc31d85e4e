"""CDC upsert (operators/cdc.py): MERGE semantics row-by-row, plus the
three contract rejections (unknown op, conflicting ops, insert-on-existing)."""

from __future__ import annotations

import pytest

from big_data_player_analysis_spark.operators.cdc import cdc_upsert


def _snap(spark):
    return spark.createDataFrame(
        [(1, "ann", 10.0), (2, "bob", 20.0), (3, "cid", 30.0)],
        "k long, name string, bal double",
    )


def test_cdc_upsert_semantics(spark):
    changes = spark.createDataFrame(
        [
            (2, "U", 99.0),   # matched update
            (3, "D", None),   # matched delete
            (7, "I", 70.0),   # unmatched insert
            (8, "U", 1.0),    # unmatched update -> no-op
            (9, "D", None),   # unmatched delete -> no-op
        ],
        "k long, op string, bal double",
    )
    out = {r.k: (r.name, r.bal) for r in
           cdc_upsert(_snap(spark), changes, "k", ["bal"]).collect()}
    assert out == {
        1: ("ann", 10.0),   # untouched
        2: ("bob", 99.0),   # updated, name carried
        7: (None, 70.0),    # inserted, non-update column NULL
    }


def test_cdc_upsert_rejects_bad_batches(spark):
    snap = _snap(spark)
    with pytest.raises(ValueError, match="unknown op"):
        cdc_upsert(
            snap,
            spark.createDataFrame([(1, "X", 0.0)], "k long, op string, bal double"),
            "k", ["bal"],
        )
    with pytest.raises(ValueError, match="conflicting"):
        cdc_upsert(
            snap,
            spark.createDataFrame(
                [(1, "U", 0.0), (1, "D", None)], "k long, op string, bal double"
            ),
            "k", ["bal"],
        )
    with pytest.raises(ValueError, match="already in the snapshot"):
        cdc_upsert(
            snap,
            spark.createDataFrame([(2, "I", 5.0)], "k long, op string, bal double"),
            "k", ["bal"],
        )
