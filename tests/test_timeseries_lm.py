"""Semantic tests for the timeseries compositions and the bigram LM
scorer — properties the DuckDB oracle twin cannot express: a planted
spike IS flagged, a shuffled document DOES score worse than its natural
counterpart, equi-depth buckets ARE balanced."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_player_analysis_spark.operators.lm import bigram_surprisal
from big_data_player_analysis_spark.operators.profiling import quantile_binning
from big_data_player_analysis_spark.operators.timeseries import (
    anomaly_zscore_daily,
    rolling_average_daily,
)


def _daily_events(spark, values, key=1):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (key, base + dt.timedelta(days=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, value double")


def test_anomaly_zscore_flags_planted_spike(spark):
    # 10 flat days, then a 100x spike on day 11
    ev = _daily_events(spark, [10.0] * 10 + [1000.0])
    out = anomaly_zscore_daily(ev, "user_id", "ts", "value").collect()
    flagged = {r.day.day for r in out if r.is_anomaly == 1}
    assert flagged == {11}
    # constant baseline: sd = 0 -> z undefined everywhere, but the spike
    # is still flagged as a deviation from the constant prior
    assert all(r.z is None for r in out)


def test_anomaly_zscore_spike_does_not_suppress_itself(spark):
    # jittered baseline (sd > 0) so z is defined, then the spike: with the
    # current row EXCLUDED from the frame, day 9's baseline is days 2-8
    ev = _daily_events(spark, [10, 11, 10, 11, 10, 11, 10, 11, 500])
    out = {r.day.day: r for r in
           anomaly_zscore_daily(ev, "user_id", "ts", "value").collect()}
    assert out[9].is_anomaly == 1
    assert out[9].z > 100  # (500-10.57)/0.53 — the spike never enters mu/sd


def test_rolling_average_counts_calendar_days_not_observations(spark):
    # observations on day 1 and day 8 only: the gap-filled axis makes the
    # 7-day frame on day 8 cover days 2..8 (six carried 10.0s + one 80.0)
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, base, 10.0), (1, base + dt.timedelta(days=7), 80.0)],
        "user_id int, ts timestamp, value double",
    )
    out = {r.day.day: r.avg_7d for r in
           rolling_average_daily(ev, "user_id", "ts", "value").collect()}
    assert len(out) == 8  # densified: every calendar day present
    assert out[8] == pytest.approx((6 * 10.0 + 80.0) / 7)
    # on the RAW series a 7-row frame would have averaged (10+80)/2 = 45


def test_quantile_binning_buckets_are_balanced_and_ordered(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    out = quantile_binning(df, "k", "v", sample_fraction=0.5)
    counts = {r.bucket: r.n for r in
              out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {1, 2, 3, 4}
    # equi-depth up to sampling error: no bucket further than 15% from 25%
    for n in counts.values():
        assert abs(n - 1000) < 600
    # bucket is monotone in v
    rows = sorted(out.collect(), key=lambda r: r.v)
    buckets = [r.bucket for r in rows]
    assert buckets == sorted(buckets)


def test_bigram_surprisal_prefers_natural_word_order(spark):
    sent = "the cat sat on the mat and the dog sat on the rug"
    words = sent.split()
    # deterministic derangement: reverse produces the same unigram bag
    shuffled = " ".join(reversed(words))
    corpus = [(i, sent) for i in range(20)] + [(100, shuffled)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r.doc_id: r for r in
           bigram_surprisal(docs, "doc_id", "text").collect()}
    # identical unigram distribution, so only word ORDER separates them
    assert out[100].n_bigrams == out[0].n_bigrams
    assert out[100].avg_bigram_surprisal > out[0].avg_bigram_surprisal + 1.0


def test_bigram_surprisal_skips_sub_two_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "..."), (3, "hello world")],
        "doc_id long, text string",
    )
    out = bigram_surprisal(docs, "doc_id", "text").collect()
    assert {r.doc_id for r in out} == {3}
    assert out[0].n_bigrams == 1
