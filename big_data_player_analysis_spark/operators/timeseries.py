"""Time-series regularization operators: densify an irregular keyed series
onto a regular calendar spine and carry observations forward.

Gap filling is the OLAP/feature-engineering primitive the reference's
player-event domain needs constantly (daily activity series with silent
days) and that naive SQL gets wrong by simply GROUP BY-ing observed days —
the missing days vanish instead of appearing as explicit rows, so every
downstream rolling window / retention curve is computed over a
silently-compacted axis.

Scale design — gap-explode instead of spine-join:
* The observed daily aggregate is one partial-agged shuffle on
  ``(key, day)`` — O(active key-days), never O(events) post-shuffle.
* Each observed day looks at its successor with ``lead()`` and EMITS its
  own gap run directly: ``explode(sequence(day, next_day - 1))`` with the
  observed value attached. One window pass, then a narrow fan-out
  proportional to the OUTPUT. The textbook formulation (generate a spine,
  left-join observations back, forward-fill with
  ``last(ignorenulls)`` — the shape the oracle SQL uses) costs two more
  exchanges: the spine join on ``(key, day)`` plus a re-partition for the
  fill window; this plan produces identical rows with two shuffles total
  and NO join.
* There is no driver-side calendar and no |keys| x |calendar| cross join
  (which would materialize then discard most rows for short-lived keys).
  Per-key output is bounded by the key's own lifetime — exactly the
  output contract — so skew is what the output itself implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gap_fill_daily(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
) -> DataFrame:
    """Per-key daily sum series densified over each key's active range,
    forward-filling missing days.

    Returns ``(key, day, filled_value, is_gap)`` — one row per calendar
    day between the key's first and last observed day; ``is_gap`` = 1 on
    days with no observation, whose ``filled_value`` carries the most
    recent observed day's value (never null: every run starts at an
    observation). ``day`` stays a midnight TIMESTAMP rather than DATE so
    both engines — and pandas on the comparison path — agree on the
    column family.
    """
    daily = events.groupBy(
        F.col(key), F.date_trunc("day", F.col(ts)).alias("day")
    ).agg(F.sum(value).alias("day_value"))
    w = Window.partitionBy(key).orderBy("day")
    runs = daily.withColumn("next_day", F.lead("day").over(w))
    run_days = F.when(
        F.col("next_day").isNull(), F.array(F.col("day"))
    ).otherwise(
        F.sequence(
            F.col("day"),
            F.col("next_day") - F.expr("interval 1 day"),
            F.expr("interval 1 day"),
        )
    )
    return runs.select(
        key,
        F.col("day").alias("obs_day"),
        "day_value",
        F.explode(run_days).alias("day"),
    ).select(
        key,
        "day",
        F.col("day_value").alias("filled_value"),
        (F.col("day") != F.col("obs_day")).cast("long").alias("is_gap"),
    )


def rolling_average_daily(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    days: int = 7,
) -> DataFrame:
    """Trailing ``days``-day average per key over the GAP-FILLED daily
    series. A ``ROWS BETWEEN n PRECEDING`` frame only means "a calendar
    week" because the axis is regular — on the raw sparse series it
    silently averages the last n OBSERVATIONS, spanning arbitrary time.
    The window re-sorts within partitions but adds NO exchange: the
    gap fill's explode preserves the partitioning on ``key``.
    """
    filled = gap_fill_daily(events, key, ts, value)
    w = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(-(days - 1), Window.currentRow)
    )
    return filled.select(
        key, "day", F.avg("filled_value").over(w).alias(f"avg_{days}d")
    )


def anomaly_zscore_daily(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    baseline_days: int = 7,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly flags on the gap-filled daily
    series: each day is scored against the mean/stddev of its OWN key's
    previous ``baseline_days`` days (frame excludes the current row so a
    spike cannot suppress its own score); ``|z| > threshold`` flags it.
    A CONSTANT baseline (sd = 0, the sharpest possible prior) leaves z
    undefined (NULL) but still flags any deviation from it — sd = 0 is
    exact there, never a float artifact, because a zero sample stddev
    means every baseline value was identical. Too-short baselines
    (sd NULL) are never flagged. Same single-exchange shape as the
    rolling average: both window aggregates share one frame spec on the
    gap fill's partitioning.
    """
    filled = gap_fill_daily(events, key, ts, value)
    base = (
        Window.partitionBy(key).orderBy("day").rowsBetween(-baseline_days, -1)
    )
    mu = F.avg("filled_value").over(base)
    sd = F.stddev_samp("filled_value").over(base)
    z = F.when(sd > 0, (F.col("filled_value") - mu) / sd)
    return filled.select(
        key,
        "day",
        "filled_value",
        F.round(z, 6).alias("z"),
        F.when(F.abs(z) > threshold, F.lit(1))
        .when((sd == 0) & (F.col("filled_value") != mu), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_anomaly"),
    )
