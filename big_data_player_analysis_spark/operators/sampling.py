"""Deterministic sampling operators for the training-data pipeline tier.

A 100 TB corpus pipeline needs samples that are (a) reproducible across
runs and engines, (b) stable under repartitioning, and (c) cheap. Spark's
``df.sample`` is none of these (seed interacts with partitioning). These
operators key every decision off the md5 hex digest of a stable id column:
a row is selected iff the first 4 hex chars compare below a threshold
string. String comparison over hex digits is portable to any SQL engine
(the DuckDB oracle runs the identical predicate), and md5(id) is uniform,
so the realized fraction concentrates tightly around the target.

All three are narrow transformations — a filter / projection with no
shuffle; the predicate is codegen'd and pushes past joins like any other
filter.

The reference has no sampling surface (its corpus is 518 rows,
reference origin/origin.txt); this module is part of the mandated
LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Resolution of the hash bucket space: first 4 md5 hex chars = 65536 buckets.
_BUCKETS = 16**4


def hash_threshold(fraction: float) -> str:
    """Hex-string threshold such that P[md5_prefix < threshold] ~= fraction.
    fraction 1.0 returns a string above the hex range ('zzzz') so the
    predicate keeps every row, including prefix 'ffff'."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    buckets = int(round(fraction * _BUCKETS))
    return "zzzz" if buckets >= _BUCKETS else format(buckets, "04x")


def hash_prefix(key: Column) -> Column:
    """First 4 hex chars of md5(key) — the portable sampling bucket."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Reproducible ~``fraction`` sample keyed on ``key_col``. Same rows
    selected regardless of partitioning, engine, or run."""
    return df.filter(hash_prefix(F.col(key_col)) < F.lit(hash_threshold(fraction)))


def train_test_split(df: DataFrame, key_col: str, train_fraction: float) -> DataFrame:
    """Adds a ``split`` column ('train' | 'test') with a deterministic
    ~``train_fraction`` train share. Every row lands in exactly one split,
    stable across runs — the property a training pipeline actually needs
    (no leakage when the corpus is re-read or re-partitioned)."""
    thr = hash_threshold(train_fraction)
    return df.withColumn(
        "split",
        F.when(hash_prefix(F.col(key_col)) < F.lit(thr), F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample web crawl, keep
    books): stratum -> fraction; strata absent from ``fractions`` are
    dropped. One codegen'd CASE predicate — no shuffle, no per-stratum
    scans (unlike a loop of filters + union)."""
    prefix = hash_prefix(F.col(key_col))
    cond = None
    for stratum, frac in fractions.items():
        c = (F.col(strata_col) == F.lit(stratum)) & (
            prefix < F.lit(hash_threshold(frac))
        )
        cond = c if cond is None else (cond | c)
    if cond is None:
        raise ValueError("fractions must not be empty")
    return df.filter(cond)
