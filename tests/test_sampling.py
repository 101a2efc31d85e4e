"""Deterministic sampling operators (operators/sampling.py): the
properties a training-data pipeline depends on — reproducibility,
partition-invariance, disjoint/exhaustive splits, per-stratum rates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_player_analysis_spark.operators.sampling import (
    deterministic_sample,
    hash_threshold,
    stratified_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 4000).withColumn(
        "stratum", F.concat(F.lit("s"), (F.col("id") % 4).cast("string"))
    )


def test_hash_threshold_endpoints():
    assert hash_threshold(0.0) == "0000"
    assert hash_threshold(1.0) == "zzzz"  # above hex range: keeps every row
    assert hash_threshold(0.5) == "8000"
    with pytest.raises(ValueError):
        hash_threshold(1.5)


def test_sample_fraction_and_determinism(ids):
    s1 = deterministic_sample(ids, "id", 0.2)
    n1 = s1.count()
    # uniform md5 ⇒ tight concentration around 20% of 4000
    assert 650 <= n1 <= 950
    # identical selection on a re-read and under different partitioning
    assert sorted(r.id for r in s1.collect()) == sorted(
        r.id for r in deterministic_sample(ids.repartition(13), "id", 0.2).collect()
    )


def test_split_disjoint_exhaustive_stable(ids):
    split = train_test_split(ids, "id", 0.75)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["train"] + counts["test"] == 4000
    assert 2800 <= counts["train"] <= 3200
    # the train set IS the 75% deterministic sample (same threshold rule)
    train_ids = {r.id for r in split.filter(F.col("split") == "train").collect()}
    sample_ids = {r.id for r in deterministic_sample(ids, "id", 0.75).collect()}
    assert train_ids == sample_ids


def test_stratified_rates(ids):
    out = stratified_sample(ids, "id", "stratum", {"s0": 1.0, "s1": 0.5, "s2": 0.0})
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["s0"] == 1000  # fraction 1.0 keeps every row
    assert 400 <= counts.get("s1", 0) <= 600
    assert "s2" not in counts  # fraction 0.0 drops the stratum
    assert "s3" not in counts  # absent from fractions ⇒ dropped


def test_stratified_empty_fractions_raises(ids):
    with pytest.raises(ValueError):
        stratified_sample(ids, "id", "stratum", {})
